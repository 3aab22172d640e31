package graft.airline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's KPI workload (reference: src/main/scala/Consumer.scala)
  * rebuilt on native expressions over the typed airline schema.
  *
  * Divergences, all deliberate and documented:
  *  - UDFs `satisfactionToNumeric`/`loyalToNumeric` (Consumer.scala:116-124)
  *    → native `when/otherwise`: keeps whole-stage codegen, lets Catalyst
  *    prune/push the conditional.
  *  - KPI A7's 14-way union loop (Consumer.scala:368-401) → one `unpivot` +
  *    one grouped aggregation: 1 scan + 1 shuffle instead of 14.
  *  - A7's `decimal(2,2)` cast (Consumer.scala:394) overflows to NULL for a
  *    mean of exactly 1.0 — fixed as `decimal(3,2)`.
  *  - The broken space-bearing identifiers of the dead KPI K8
  *    (Consumer.scala:313-317) → aliased snake_case columns.
  */
object AirlineKpis {

  /** The 14 service-rating feature columns (Consumer.scala:371-386). */
  val featureCols: Seq[String] = Seq(
    "Inflight wifi service", "Departure/Arrival time convenient",
    "Ease of Online booking", "Gate location", "Food and drink",
    "Online boarding", "Seat comfort", "Inflight entertainment",
    "On-board service", "Leg room service", "Baggage handling",
    "Checkin service", "Inflight service", "Cleanliness")

  private def satisfied = when(col("satisfaction") === "satisfied", 1).otherwise(0)
  private def loyal     = when(col("Customer Type") === "Loyal Customer", 1).otherwise(0)

  /** A1 (Consumer.scala:129). */
  def genderCounts(df: DataFrame): DataFrame =
    df.groupBy(col("Gender")).agg(count(lit(1)).as("Count"))

  /** A2 (Consumer.scala:131). */
  def satisfactionCounts(df: DataFrame): DataFrame =
    df.groupBy(col("satisfaction")).agg(count(lit(1)).as("Count"))

  /** A3 (Consumer.scala:133). */
  def satisfactionByClass(df: DataFrame): DataFrame =
    df.groupBy(col("Class"), col("satisfaction")).agg(count(lit(1)).as("count"))

  /** A4 (Consumer.scala:135). */
  def typeTravelCounts(df: DataFrame): DataFrame =
    df.groupBy(col("Type of Travel").as("Type_of_Travel")).agg(count(lit(1)).as("Count"))

  /** A5 (Consumer.scala:137). */
  def ageDistribution(df: DataFrame): DataFrame =
    df.groupBy(col("Age")).agg(count(lit(1)).as("Count"))

  /** A6 (Consumer.scala:139-145): loyal = Σ flag; disloyal = count(non-null
    * `Customer Type`) − Σ flag — the reference's null semantics kept. */
  def loyaltyByAge(df: DataFrame): DataFrame =
    df.groupBy(col("Age")).agg(
      sum(loyal).cast("int").as("Loyal_Customer_Count"),
      (count(col("Customer Type")) - sum(loyal)).cast("int").as("Disloyal_Customer_Count"))

  /** Dead KPI K8 (Consumer.scala:306-333), resurrected with valid
    * identifiers: mean satisfaction per flight distance. */
  def flightDistanceImpact(df: DataFrame): DataFrame =
    df.groupBy(col("Flight Distance").as("flight_distance"))
      .agg((sum(satisfied).cast("double") / count(lit(1))).as("mean_satisfaction"))

  /** K8 in ADDITIVE-COMPONENT form for the streaming path (same
    * pattern as [[meanSatisfactionComponents]]): a mean is not additive
    * across micro-batches, so the store carries (Σ satisfied, count)
    * per flight distance and the mean is derived at read time via
    * [[deriveFlightDistanceImpact]]. */
  def flightDistanceComponents(df: DataFrame): DataFrame =
    df.groupBy(col("Flight Distance").as("flight_distance"))
      .agg(sum(satisfied).cast("long").as("sat_sum"), count(lit(1)).as("cnt"))

  /** Read-side view over the merged K8 components — matches
    * [[flightDistanceImpact]] on the same input. */
  def deriveFlightDistanceImpact(components: DataFrame): DataFrame =
    components.select(
      col("flight_distance"),
      (col("sat_sum").cast("double") / col("cnt")).as("mean_satisfaction"))

  /** A7 (Consumer.scala:368-401) as unpivot + single aggregation;
    * decimal(3,2) so a mean of exactly 1.00 is representable. */
  def meanSatisfactionByFeature(df: DataFrame): DataFrame = {
    val flagged = df.withColumn("_sat", satisfied.cast("long"))
    flagged
      .unpivot(
        ids = Array(col("_sat")),
        values = featureCols.map(col).toArray,
        variableColumnName = "feature_name",
        valueColumnName = "feature_value")
      .groupBy(col("feature_name"), col("feature_value"))
      .agg((sum(col("_sat")).cast("double") / count(lit(1)))
        .cast("decimal(3,2)").as("mean_satisfaction"))
  }

  /** A7 in ADDITIVE-COMPONENT form for the streaming path: a mean is not
    * additive across micro-batches, so the store carries (Σ flag, count)
    * per (feature, value) — both sum-mergeable — and the mean is derived
    * at read time via [[deriveMeanSatisfaction]]. */
  def meanSatisfactionComponents(df: DataFrame): DataFrame = {
    val flagged = df.withColumn("_sat", satisfied.cast("long"))
    flagged
      .unpivot(
        ids = Array(col("_sat")),
        values = featureCols.map(col).toArray,
        variableColumnName = "feature_name",
        valueColumnName = "feature_value")
      .groupBy(col("feature_name"), col("feature_value"))
      .agg(sum(col("_sat")).as("sat_sum"), count(lit(1)).as("cnt"))
  }

  /** Read-side view over the merged components. */
  def deriveMeanSatisfaction(components: DataFrame): DataFrame =
    components.select(
      col("feature_name"), col("feature_value"),
      (col("sat_sum").cast("double") / col("cnt"))
        .cast("decimal(3,2)").as("mean_satisfaction"))

  /** KPI registry: name → (transform, upsert key columns) — drives the
    * single-scan streaming fan-out (KpiStream) and the batch oracle.
    * Every transform emits only sum-mergeable components. */
  val all: Seq[(String, DataFrame => DataFrame, Seq[String])] = Seq(
    ("gender_counts", genderCounts _, Seq("Gender")),
    ("satisfaction_counts", satisfactionCounts _, Seq("satisfaction")),
    ("satisfaction_by_class", satisfactionByClass _, Seq("Class", "satisfaction")),
    ("type_travel_counts", typeTravelCounts _, Seq("Type_of_Travel")),
    ("age_distribution", ageDistribution _, Seq("Age")),
    ("loyalty_by_age", loyaltyByAge _, Seq("Age")),
    ("flight_distance_impact", flightDistanceComponents _, Seq("flight_distance")),
    ("mean_satisfaction_by_feature", meanSatisfactionComponents _,
      Seq("feature_name", "feature_value")))
}
