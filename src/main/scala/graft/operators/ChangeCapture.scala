package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: turn an append-only change log into
  * queryable version history. A 100 TB training pipeline carries these
  * for its METADATA plane — document provenance, license flags, source
  * quality tiers all arrive as change events, and the pipeline needs
  * both "what was true at time T" (join against [[scd2]] intervals via
  * [[TemporalJoin.rangeJoinBucketed]] or as-of via
  * [[TemporalJoin.asofJoin]]) and "what is true now"
  * ([[latestSnapshot]]).
  *
  * Both are single-shuffle: one hash Exchange on the entity key, then a
  * per-key sort (scd2) or a max_by aggregate (latestSnapshot —
  * partial-combinable map-side, so the exchange carries keys, not
  * history). Neither holds state beyond a window frame of 1, so skewed
  * entities cost what any window costs.
  *
  * Reference scope: the reference (Yahia-Ferchouli/SparkStreaming) has
  * no versioned-metadata surface; this is extension API driven by the
  * upsert sinks' "latest value wins" semantics (reference
  * Consumer.scala's MySQL upserts), generalized to full history.
  */
object ChangeCapture {

  /** SCD-type-2 intervals from a change log: one row per change,
    * carrying `[valid_from, valid_to)` and `is_current`. `valid_to` of
    * the latest change per key is null (open interval). Ties on
    * `timeCol` are ordered by `tieBreakers` (pass a unique id — with
    * none, equal-time changes order nondeterministically and the
    * produced history is undefined between them).
    *
    * Cost: one Exchange on `keys` + one per-key sort; the window frame
    * is a single following row (`lead`), so state is O(1) per task. */
  def scd2(
      changes: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2: at least one entity key")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    require(changes.columns.toSeq.intersect(reserved).isEmpty,
      s"scd2: ${reserved.mkString("/")} are output column names — rename them in the input")
    val order: Seq[Column] = (timeCol +: tieBreakers).map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Current-state snapshot: the latest change per key (the batch twin
    * of the streaming upsert sinks' merged state). `max_by` over a
    * struct of (time, tieBreakers) keeps ordering total when times tie.
    *
    * Cost: ONE partial-combinable aggregate — each map task reduces its
    * slice to one row per local key before the shuffle, so the exchange
    * carries keys, not history. (Struct-valued max_by plans as
    * SortAggregate — a per-partition sort on the GROUP KEY, not a
    * history shuffle; the map-side partial is what matters.) At 100 TB
    * this is the reason to prefer it over a row_number()=1 window,
    * which shuffles and sorts the full history. */
  def latestSnapshot(
      changes: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "latestSnapshot: at least one entity key")
    val valueCols = changes.columns.toSeq.diff(keys)
    val ord = struct((timeCol +: tieBreakers).map(col): _*)
    changes.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), ord).as("_latest"))
      .select(keys.map(col) ++ valueCols.map(c => col("_latest").getField(c).as(c)): _*)
  }

  // --------------------------------------------------------------------
  // Incremental aggregate maintenance (additive components)
  // --------------------------------------------------------------------

  /** Keyed additive components (Σ value, count) — the commutative
    * monoid every incrementally-maintainable aggregate reduces to
    * (mean = Σ/n read-side; the same design the streaming KPI sinks use
    * per batch, here as the BATCH surface). At 100 TB this is the
    * difference between "re-scan the corpus nightly" and "aggregate
    * yesterday's delta and merge": component frames are key-cardinality
    * small, so maintenance cost tracks the DELTA, not the corpus.
    * Sums stay in exact DECIMAL/long arithmetic — merging never
    * accumulates float error, so a maintained aggregate is bit-equal
    * to a from-scratch recompute (the x13 oracle). */
  def additiveComponents(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("sum_v"), count(col(valueCol)).as("n_v"))

  /** Merge two component frames — associative and commutative (one
    * union + one re-aggregation over key-cardinality rows), so deltas
    * can arrive in any order and any grouping. */
  def mergeComponents(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("sum_v")).as("sum_v"), sum(col("n_v")).as("n_v"))

  /** Retraction form: negated components subtract a delta (CDC deletes
    * / corrections) through the same merge path. Keys whose count
    * reaches zero remain as (0, 0) rows — filter `n_v =!= 0` when a
    * fully-retracted key should disappear. */
  def negateComponents(components: DataFrame): DataFrame =
    components
      .withColumn("sum_v", -col("sum_v"))
      .withColumn("n_v", -col("n_v"))

  /** Corpus snapshot diff — the incremental-pipeline primitive: given
    * two versions of a keyed corpus, classify every key as `added`
    * (new only), `removed` (old only), `changed` (both, different
    * payload), or `unchanged`. The downstream consumer re-processes
    * exactly the added ∪ changed slice instead of the whole corpus —
    * at 100 TB the difference between a nightly delta job and a
    * nightly full rebuild.
    *
    * Payloads are compared by md5 fingerprint computed BEFORE the
    * join, so the full-outer shuffle carries (key, 16-byte hash) —
    * never document bodies. One Exchange per side on the key; with
    * both snapshots bucketed on `idCol` (the [[graft.sources.Tables]]
    * bucketing path) even that Exchange disappears. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      payloadCol: String): DataFrame = {
    // presence flags (not hash-nullness) mark row existence, so a null
    // payload is an ordinary comparable value, and the null-safe <=>
    // makes null-vs-value read as a change, never a crash or a miss
    val o = oldDf.select(col(idCol),
      md5(col(payloadCol).cast("binary")).as("_ho"), lit(true).as("_po"))
    val n = newDf.select(col(idCol),
      md5(col(payloadCol).cast("binary")).as("_hn"), lit(true).as("_pn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_po").isNull, lit("added"))
          .when(col("_pn").isNull, lit("removed"))
          .when(!(col("_ho") <=> col("_hn")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
