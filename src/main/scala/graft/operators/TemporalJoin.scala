package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, built from
  * shuffle-bounded primitives — no range cross product, no
  * BroadcastNestedLoop, ever.
  *
  *  - [[asofJoin]]: point-in-time ("as-of") join — each left row picks
  *    up the most recent right row at-or-before its timestamp per key.
  *    The classic implementations are a per-key merge (single-node) or
  *    a range-partitioned interleave; the Spark-first shape is UNION +
  *    one window: tag both sides, shuffle ONCE by key, sort by
  *    (time, side) within, and carry the last non-null right attributes
  *    forward onto left rows with `last(ignoreNulls)`. Cost = one
  *    Exchange + per-partition sort — identical to any sessionization
  *    pass, independent of how far back matches reach.
  *  - [[rangeJoinBucketed]]: interval-containment join (points into
  *    [start, end) intervals) — the no-equi-key case where Spark's
  *    planner falls back to BroadcastNestedLoopJoin and dies at scale.
  *    Buckets of width `bucketWidth` turn it into an equi-join:
  *    intervals explode to every bucket they overlap, points map to
  *    exactly one bucket, candidates equi-join on the bucket id and the
  *    exact containment predicate filters within. A (point, interval)
  *    pair can only meet in the point's bucket, so no dedup pass is
  *    needed. Candidate volume is bucket co-occupancy — tune
  *    `bucketWidth` toward the typical interval length so each interval
  *    explodes to O(1) buckets (the same volume-vs-selectivity knob as
  *    LSH banding).
  */
object TemporalJoin {

  /** As-of join: for every left row, the latest right row with
    * `right(rightTime) <= left(leftTime)` and equal `keys`; left rows
    * without a prior right row keep null carried columns (left-join
    * semantics). Right rows at exactly the left timestamp DO match.
    *
    * Contract: `right`'s non-key, non-time columns (the carried values)
    * must not collide with left column names — pre-rename them (they
    * arrive on the output as-is). If several right rows share one
    * (key, time), pre-aggregate to one (e.g. `max_by`) — the carry
    * order between them is undefined. Null VALUES inside a right row
    * are treated as missing (the carry reaches further back for that
    * column only).
    *
    * 100 TB: one hash Exchange on `keys` + one sort — time-skewed keys
    * cost what any per-key window costs; there is no index build and no
    * state, so the plan composes with AQE like a plain window query. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val valueCols = right.columns.toSeq.diff(keys :+ rightTime)
    require(valueCols.nonEmpty, "asofJoin: right side carries no value columns")
    val collisions = left.columns.toSeq.intersect(valueCols)
    require(collisions.isEmpty,
      s"asofJoin: rename right value columns colliding with left: $collisions")
    val reserved = Seq("_t", "_side")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoin: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    val lv = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rv = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++ valueCols.map(col): _*)
    // equal timestamps sort right-before-left so an exact match is
    // visible to the left row (<= semantics, same as DuckDB ASOF)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lv.unionByName(rv, allowMissingColumns = true)
      .select(
        (left.columns.toSeq.map(col) :+ col("_side")) ++
          valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_side") === 1)
      .select(left.columns.toSeq.map(col) ++ valueCols.map(col): _*)
  }

  /** Bucketed interval-containment join: rows of `points` matched to
    * rows of `intervals` with `start <= point < end` (half-open, the
    * time-window convention). Columns must be disjoint across the two
    * inputs; numeric (long) domains must be non-negative (epoch micros,
    * day numbers, ...). Empty intervals (end <= start) match nothing.
    * Output: one row per (point, interval) containment, all columns. */
  def rangeJoinBucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(overlap.isEmpty, s"rangeJoinBucketed: rename overlapping columns: $overlap")
    require(!(points.columns ++ intervals.columns).contains("_b"),
      "rangeJoinBucketed: _b is the internal bucket column — rename it in the inputs")
    val p = points.withColumn("_b", expr(s"`$pointCol` div ${bucketWidth}L"))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(
        expr(s"`$startCol` div ${bucketWidth}L"),
        expr(s"(`$endCol` - 1) div ${bucketWidth}L"))))
    p.join(iv, Seq("_b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_b")
  }
}
