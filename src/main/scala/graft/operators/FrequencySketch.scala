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
}
