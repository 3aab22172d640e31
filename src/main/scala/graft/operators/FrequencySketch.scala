package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Frequency estimation under fixed memory — the count-min-sketch
  * heavy-hitters shape a 100 TB token/URL/domain frequency pass uses
  * when the exact per-item aggregate is affordable only for the
  * CANDIDATE set, not the full key space.
  *
  * Architecture (one corpus pass + one candidate pass):
  *  1. `count_min_sketch` aggregate — each partition folds its rows
  *     into a fixed-size counter grid and the shuffle carries ONE grid
  *     per partition (counter-wise sums are order- and
  *     partitioning-independent, so the merged sketch is identical to a
  *     single-threaded build — spec-asserted).
  *  2. Candidate items (here the exact top-k, so the driver gate can
  *     cross-check both sides; in production any shortlist works) are
  *     point-queried against the broadcast sketch via
  *     [[graft.functions.CmsEstimate]].
  *
  * CMS error contract: estimates NEVER undercount (counters only sum),
  * and overcount by more than eps·N with probability at most
  * 1 − confidence per query. Both sides are emitted as a checkable
  * boolean next to the exact count (the a13 invariant-oracle pattern:
  * the sketch VALUE is engine-local, the BOUND is engine-independent). */
object FrequencySketch {

  /** Exact top-`k` items of `itemCol` (string) with their true counts
    * and the CMS bound verdict: `est_ok` ⇔
    * true ≤ estimate ≤ true + ⌈eps·N⌉, N = total item count.
    *
    * Driver materialization: ONE row (sketch bytes + N) — bounded
    * metadata, the same class as the bloom-filter collect. Sketch size
    * is ⌈2/eps⌉ × ⌈ln(1/(1−confidence))⌉ longs, independent of N. */
  def heavyHittersVerified(
      df: DataFrame,
      itemCol: String,
      k: Int,
      eps: Double = 0.001,
      confidence: Double = 0.9999,
      seed: Int = 42): DataFrame = {
    require(k > 0 && eps > 0 && eps < 1 && confidence > 0 && confidence < 1)
    val row = df.agg(
      count_min_sketch(col(itemCol), lit(eps), lit(confidence), lit(seed)).as("sk"),
      count(col(itemCol)).as("n")).collect()(0)
    val bytes = row.getAs[Array[Byte]](0)
    val n = row.getLong(1)
    val slack = math.ceil(eps * n).toLong
    val top = df.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("item").asc)
      .limit(k)
    top
      .withColumn("_est", GraftSqlBridge.column(graft.functions.CmsEstimate(
        GraftSqlBridge.expression(col("item")), bytes)))
      .withColumn("est_ok",
        col("_est") >= col("true_cnt") && col("_est") <= col("true_cnt") + lit(slack))
      .drop("_est")
  }

  /** ROW-FORM count-min sketch: the counter grid as a keyed additive
    * TABLE — one row per touched (depth-row `d`, md5-bucket `cell`)
    * with its exact count — instead of a19's opaque engine-local
    * sketch bytes. Two properties the byte form cannot offer:
    * (1) every cell is replayable on any engine with md5 (the
    * [[Importance.bucketOf]] hex-bucket construction, salt `"{salt}{d}"`
    * per depth row), so the whole sketch — not just its error bound —
    * is oracle-exact; (2) cells are a decomposable (key, count)
    * aggregate, so the sketch merges through the SAME additive
    * machinery as any KPI table (counter addition commutes — the
    * [[graft.streaming.StreamingDistinct]] commutative-state argument;
    * [[graft.streaming.StreamingFrequency]] folds per-batch cell
    * deltas into a store with no retraction path). ≤ depth × 16^hex
    * rows regardless of corpus size.
    *
    * Scale shape: one narrow posexplode (depth rows per item
    * occurrence) into a map-side-combined aggregate; the shuffle
    * carries ≤ depth × 16^hex rows PER MAPPER, never the item
    * stream. */
  def cmsCells(
      df: DataFrame,
      itemCol: String,
      depth: Int = 4,
      hexChars: Int = 3,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars must be in [1,4] (16..65536 cells/row), got $hexChars")
    val cells = (0 until depth).map(d =>
      Importance.bucketOf(col(itemCol), hexChars, s"$salt$d"))
    df.select(posexplode(array(cells: _*)).as(Seq("d", "cell")))
      .groupBy(col("d"), col("cell")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-query `items` (any frame with `itemCol`; other columns ride
    * along) against a [[cmsCells]] table built with the SAME
    * (depth, hexChars, salt): est = min over depth rows of the item's
    * cell count. NEVER undercounts an item the cells table has seen
    * (counters only sum); a missing cell means a provably-unseen item
    * (est 0). The items frame is expected candidate-sized (the a19
    * shortlist contract) — it explodes by `depth` and equi-joins the
    * bounded cells table. */
  def cmsEstimate(
      cells: DataFrame,
      items: DataFrame,
      itemCol: String,
      depth: Int = 4,
      hexChars: Int = 3,
      salt: String = "cms"): DataFrame = {
    val keep = items.columns.map(col)
    val probes = (0 until depth).map(d =>
      Importance.bucketOf(col(itemCol), hexChars, s"$salt$d"))
    items
      .select(keep :+ posexplode(array(probes: _*)).as(Seq("d", "cell")): _*)
      .join(cells, Seq("d", "cell"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
