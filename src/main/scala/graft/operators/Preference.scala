package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise-preference strength estimation — the Bradley–Terry model
  * (Bradley & Terry 1952; Hunter 2004's MM algorithm) that underlies
  * preference-data curation for RLHF/DPO pipelines: given "A beat B"
  * comparisons, fit a strength `s_i` per item so that
  * P(i beats j) = s_i / (s_i + s_j).
  *
  * Architecture for 100 TB of comparisons: the expensive part — turning
  * an event log into a wins matrix — is fully distributed (one per-key
  * lag window + one groupBy on the item-pair key). The MM fixed-point
  * iteration then runs driver-side over the collected matrix, which is
  * bounded by the ITEM-DOMAIN size squared (the k-means-centroid /
  * IVF-codebook class of bounded metadata — item domains in preference
  * tuning are model variants or content categories, not users). The
  * per-iteration cost is O(|items|²), independent of corpus size.
  *
  * Engine-exactness discipline (the x38-pagerank school): every MM
  * iteration quantizes each intermediate to a BIGINT —
  *   t_q(i,j) = ⌊n_ij · 2⁴⁸ / (s_q(i)+s_q(j))⌋,
  *   denom_q(i) = Σ_j t_q(i,j)              (integer sum, order-free),
  *   s'(i)  = W_i · 2²⁴ / denom_q(i)        (one IEEE division),
  *   tot_q  = Σ_i ⌊s'(i) · 2²⁴⌋             (integer sum, order-free),
  *   s_q(i) = max(1, ⌊s'(i) · (m·2²⁴) / tot_q · 2²⁴⌋)  (normalized so
  *            strengths sum to ≈ m; the max(1,·) floor keeps a
  *            never-winning item's denominators finite).
  * Every double op is correctly rounded per IEEE 754 and the DAG is
  * fixed, so an independent engine replaying the same unrolled
  * iterations reproduces s_q bit-for-bit — no transcendentals anywhere
  * (this is why MM, not the logistic-regression formulation).
  */
object Preference {

  /** Comparisons from an event log: per `keyCol` (user), order events by
    * (`tsCol`, `idCol`) and emit each consecutive pair with DIFFERENT
    * `itemCol` values as one comparison; the higher `valueCol` wins,
    * exact value ties go to the lexicographically smaller item.
    * Distributed: one lag window per key, no shuffle beyond it. */
  def comparisonsFromLog(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      itemCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_pitem", lag(col(itemCol), 1).over(w))
      .withColumn("_pval", lag(col(valueCol), 1).over(w))
      .filter(col("_pitem").isNotNull && col("_pitem") =!= col(itemCol))
      .select(
        when(col(valueCol) > col("_pval"), col(itemCol))
          .when(col(valueCol) < col("_pval"), col("_pitem"))
          .otherwise(least(col(itemCol), col("_pitem"))).as("winner"),
        when(col(valueCol) > col("_pval"), col("_pitem"))
          .when(col(valueCol) < col("_pval"), col(itemCol))
          .otherwise(greatest(col(itemCol), col("_pitem"))).as("loser"))
  }

  private val Q24 = 16777216.0           // 2^24
  private val Q48 = 281474976710656.0    // 2^48

  /** Fit Bradley–Terry strengths over a `(winner, loser)` comparison
    * frame with `iters` quantized MM iterations (see object doc).
    * Returns one row per item: `item, wins, games, strength_q, rk`
    * (strength_q = ⌊s·2²⁴⌋ after normalization to Σs ≈ m; rank by
    * strength desc, item asc). */
  def bradleyTerry(
      comparisons: DataFrame,
      iters: Int = 8,
      maxItems: Int = 4096): DataFrame = {
    val spark = comparisons.sparkSession
    import spark.implicits._
    // Distributed reduction to the bounded wins matrix; everything
    // after the collect is O(|items|²) driver-side metadata.
    val wins = comparisons.groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("w"))
      .collect()                       // bounded: item-domain² rows
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val items = wins.keysIterator.flatMap { case (a, b) => Iterator(a, b) }
      .toSeq.distinct.sorted
    require(items.size <= maxItems,
      s"item domain ${items.size} exceeds maxItems=$maxItems — " +
        "Bradley-Terry's dense MM iteration is for bounded item domains")
    val m = items.size
    val winTotal = items.map(i =>
      i -> items.iterator.map(j => wins.getOrElse((i, j), 0L)).sum).toMap
    val games = items.map(i =>
      i -> items.iterator.map(j =>
        wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L)).sum).toMap
    val nPair = (for {
      i <- items; j <- items if i != j
      n = wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L)
      if n > 0
    } yield (i, j) -> n).toMap
    val mScale = m.toDouble * Q24
    var sq: Map[String, Long] = items.map(_ -> Q24.toLong).toMap
    for (_ <- 0 until iters) {
      val denomQ = items.map { i =>
        i -> items.iterator.filter(j => nPair.contains((i, j))).map { j =>
          math.floor(nPair((i, j)).toDouble * Q48 /
            (sq(i) + sq(j)).toDouble).toLong
        }.sum                          // integer sum — order-free
      }.toMap
      val rawS = items.map { i =>
        i -> winTotal(i).toDouble * Q24 / denomQ(i).toDouble
      }.toMap
      val totQ = items.iterator.map(i => math.floor(rawS(i) * Q24).toLong).sum
      sq = items.map { i =>
        i -> math.max(1L,
          math.floor(rawS(i) * mScale / totQ.toDouble * Q24).toLong)
      }.toMap
    }
    val ranked = items
      .map(i => (i, winTotal(i), games(i), sq(i)))
      .sortBy { case (i, _, _, s) => (-s, i) }
      .zipWithIndex
      .map { case ((i, w, g, s), idx) => (i, w, g, s, idx + 1) }
    ranked.toDF("item", "wins", "games", "strength_q", "rk")
  }
}
