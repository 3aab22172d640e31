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
    * order between them is undefined. All carried columns come from the
    * SINGLE matched right row — a null value inside that row arrives as
    * null (DuckDB ASOF semantics), never back-filled from an older row.
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
    val reserved = Seq("_t", "_side", "_vals")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoin: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    val lv = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    // one struct per right row, carried atomically: per-column
    // last(ignoreNulls) would blend attributes from DIFFERENT versions
    // whenever a version holds a null in one column
    val rv = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(keys.map(col) :+ col("_t") :+ col("_side")
        :+ struct(valueCols.map(col): _*).as("_vals"): _*)
    // equal timestamps sort right-before-left so an exact match is
    // visible to the left row (<= semantics, same as DuckDB ASOF)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lv.unionByName(rv, allowMissingColumns = true)
      .select(left.columns.toSeq.map(col) :+ col("_side")
        :+ last(col("_vals"), ignoreNulls = true).over(w).as("_vals"): _*)
      .filter(col("_side") === 1)
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => col("_vals").getField(c).as(c)): _*)
  }

  /** Forward as-of join — the time-mirror of [[asofJoin]]: for every
    * left row, the EARLIEST right row with `right(rightTime) >=
    * left(leftTime)` and equal `keys` (the "next quote" / "next
    * calibration reading" lookup). Right rows at exactly the left
    * timestamp DO match. Same carried-struct contract, same single
    * Exchange; the forward carry sorts DESCENDING on `(_t, _side)` and
    * reuses the incremental running frame (unbounded preceding →
    * current row, `last(ignoreNulls)`). A literal forward frame
    * (current row → unbounded following) would hit Spark's
    * UnboundedFollowingWindowFunctionFrame, which re-aggregates the
    * whole remaining partition for every row — O(n²) in key depth,
    * exactly the hot-key failure mode the deep probe measures; the
    * descending running frame gives the same answer at sort cost. At
    * equal `_t` the right row sorts before the left row in descending
    * `_side` order, so an exact-time match sits inside the left row's
    * frame.
    *
    * Identity with the backward form: forward-as-of on `t` ≡
    * [[asofJoin]] on negated time — pinned by TemporalJoinSpec. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val valueCols = right.columns.toSeq.diff(keys :+ rightTime)
    require(valueCols.nonEmpty, "asofJoinForward: right side carries no value columns")
    val collisions = left.columns.toSeq.intersect(valueCols)
    require(collisions.isEmpty,
      s"asofJoinForward: rename right value columns colliding with left: $collisions")
    val reserved = Seq("_t", "_side", "_vals")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoinForward: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    val lv = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0))
    val rv = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(1))
      .select(keys.map(col) :+ col("_t") :+ col("_side")
        :+ struct(valueCols.map(col): _*).as("_vals"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lv.unionByName(rv, allowMissingColumns = true)
      .select(left.columns.toSeq.map(col) :+ col("_side")
        :+ last(col("_vals"), ignoreNulls = true).over(w).as("_vals"): _*)
      .filter(col("_side") === 0)
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => col("_vals").getField(c).as(c)): _*)
  }

  /** Bounded-staleness as-of join — [[asofJoin]] with a freshness
    * contract: the latest right row at-or-before only counts if it is
    * no older than `maxStaleness` time units ("latest quote, but never
    * one older than 5 minutes" — the staleness window every sensor /
    * feature-store lookup actually ships with). A match older than the
    * bound yields nulls, exactly like no match at all.
    *
    * Same union + one-Exchange window shape as [[asofJoin]]; the right
    * version rides as one struct carrying its own timestamp, so the
    * staleness check reads the matched version's time directly and all
    * carried columns stay atomic. */
  def asofJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      maxStaleness: Long): DataFrame = {
    require(maxStaleness > 0, "asofJoinWithin: maxStaleness must be positive")
    val valueCols = right.columns.toSeq.diff(keys :+ rightTime)
    require(valueCols.nonEmpty, "asofJoinWithin: right side carries no value columns")
    val collisions = left.columns.toSeq.intersect(valueCols)
    require(collisions.isEmpty,
      s"asofJoinWithin: rename right value columns colliding with left: $collisions")
    val reserved = Seq("_t", "_side", "_tv", "_m")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoinWithin: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    val lv = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rv = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(keys.map(col) :+ col("_t") :+ col("_side")
        :+ struct(col("_t").as("_rt"),
             struct(valueCols.map(col): _*).as("_vv")).as("_tv"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lv.unionByName(rv, allowMissingColumns = true)
      .select(left.columns.toSeq.map(col) :+ col("_t") :+ col("_side")
        :+ last(col("_tv"), ignoreNulls = true).over(w).as("_m"): _*)
      .filter(col("_side") === 1)
      // a too-stale match degrades to null — when() without otherwise
      .withColumn("_m",
        when(col("_m._rt") >= col("_t") - lit(maxStaleness), col("_m")))
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => col("_m._vv").getField(c).as(c)): _*)
  }

  /** Nearest as-of join — for every left row, the right row with equal
    * `keys` whose `rightTime` is CLOSEST to `leftTime` in either
    * direction (sensor alignment, "closest reading to the event");
    * equidistant candidates resolve to the earlier (backward) match,
    * and an exact-time match always wins at distance zero. Completes
    * the family: [[asofJoin]] (last at-or-before), [[asofJoinForward]]
    * (first at-or-after), this (closest of the two).
    *
    * Times must support subtraction and ordering (epoch micros — the
    * same numeric-time discipline the other as-of forms use in the
    * registry). One union + ONE key-partitioned Exchange evaluates both
    * window frames; the backward carry sorts ascending and the forward
    * carry DESCENDING (two in-partition sorts, no second shuffle) so
    * both run as incremental running frames — a literal forward frame
    * would re-aggregate the remaining partition per row, O(n²) in key
    * depth. The right row rides as one struct, so all carried columns
    * come from the single matched version (never blended across
    * versions). */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val valueCols = right.columns.toSeq.diff(keys :+ rightTime)
    require(valueCols.nonEmpty, "asofJoinNearest: right side carries no value columns")
    val collisions = left.columns.toSeq.intersect(valueCols)
    require(collisions.isEmpty,
      s"asofJoinNearest: rename right value columns colliding with left: $collisions")
    val reserved = Seq("_t", "_side", "_tv", "_b", "_f", "_n")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoinNearest: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    val lv = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val rv = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(keys.map(col) :+ col("_t") :+ col("_side")
        :+ struct(col("_t").as("_rt"),
             struct(valueCols.map(col): _*).as("_vv")).as("_tv"): _*)
    // right sorts before left at equal _t, so the backward frame sees
    // exact-time matches; the forward frame misses them, but backward
    // wins any distance-zero comparison, so the result is unaffected.
    // The forward carry runs over the DESCENDING order with an
    // incremental running frame — a literal currentRow→unboundedFollowing
    // frame re-aggregates the remaining partition per row (O(n²) in key
    // depth); in the descending order left (_side=1) sorts before right
    // (_side=0) at equal _t, preserving the exclude-exact-match tie rule.
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
    val ordRev = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ordRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chosen = when(col("_b").isNull, col("_f"))
      .when(col("_f").isNull, col("_b"))
      .when(col("_t") - col("_b._rt") <= col("_f._rt") - col("_t"), col("_b"))
      .otherwise(col("_f"))
    lv.unionByName(rv, allowMissingColumns = true)
      .select(left.columns.toSeq.map(col) :+ col("_t") :+ col("_side")
        :+ last(col("_tv"), ignoreNulls = true).over(wb).as("_b")
        :+ last(col("_tv"), ignoreNulls = true).over(wf).as("_f"): _*)
      .filter(col("_side") === 1)
      .withColumn("_n", chosen)
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => col("_n._vv").getField(c).as(c)): _*)
  }

  /** Skew-resistant as-of join — identical contract and output to
    * [[asofJoin]], for inputs where a single key holds a pathological
    * share of the rows (one user with 10⁸ events). [[asofJoin]]'s
    * window partitions by key alone, so the hot key's entire history
    * serializes into ONE task's sort; here time is split into ranges of
    * `bucketWidth` and the heavy window partitions by (key, range), so
    * a hot key fans out across min(ranges, partitions) tasks.
    *
    * Two passes: (1) the same union+window carry as [[asofJoin]] but
    * per (key, range) — finds matches within the left row's own range;
    * (2) a per-(key, range) summary of the LAST right version in each
    * range (one hash aggregate), carried forward across ranges by a
    * window over the per-key RANGE LIST (rows = occupied ranges per
    * key — data-volume-independent, bounded by timespan/bucketWidth)
    * and joined back on (key, range) to fill left rows whose match
    * lies in an earlier range. Extra cost vs [[asofJoin]]: one hash
    * aggregate + one bucket-keyed join — both on the split key, so no
    * single-task stage remains anywhere in the plan.
    *
    * Choose `bucketWidth` so a hot key's densest range fits one task
    * comfortably (e.g. a day of a key that logs 10⁶ events/day);
    * uniform keys pay only the small summary join.
    *
    * WHEN to use this instead of [[asofJoin]] — the measured crossover
    * (local[32], synthetic single-hot-key fixture, full-output
    * materialization; BENCH `asof_deep_sec_plain`/`asof_deep_sec_split`):
    * the split's fixed overhead (one extra hash aggregate + range-list
    * window + bucket join, ~0.5–1 s at any size) loses below ~10⁶ rows
    * on the hottest key, and wins above — at 1.6M rows/key the plain
    * window's single-task sort already costs ~2× the split, at 3.2M
    * ~2.3×, and the gap widens linearly with depth while the split stays
    * flat until its per-range depth approaches the crossover again.
    * Rule of thumb: switch when `max rows on one key ≳ 10⁶`, with
    * `bucketWidth ≈ hot key's time span / ceil(hotRows / 250k)` so each
    * range holds ~250k rows. [[asofJoinAdaptive]] measures and applies
    * exactly this rule. */
  def asofJoinSkew(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val valueCols = right.columns.toSeq.diff(keys :+ rightTime)
    require(valueCols.nonEmpty, "asofJoinSkew: right side carries no value columns")
    val collisions = left.columns.toSeq.intersect(valueCols)
    require(collisions.isEmpty,
      s"asofJoinSkew: rename right value columns colliding with left: $collisions")
    val reserved = Seq("_t", "_side", "_vals", "_rng", "_carry")
    require((left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"asofJoinSkew: ${reserved.mkString("/")} are internal column names — rename them in the inputs")
    // floor division in exact long arithmetic (same rationale as
    // rangeJoinBucketed): time columns must be integral (epoch micros,
    // day numbers, ...)
    val rngExpr = s"(_t - pmod(_t, ${bucketWidth}L)) div ${bucketWidth}L"
    val lv = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_side", lit(1))
      .withColumn("_rng", expr(rngExpr))
    val rv = right
      .withColumn("_t", col(rightTime).cast("long"))
      .withColumn("_side", lit(0))
      .withColumn("_vals", struct(valueCols.map(col): _*))
      .withColumn("_rng", expr(rngExpr))
      .select(keys.map(col) ++ Seq(col("_t"), col("_side"), col("_vals"), col("_rng")): _*)
    val splitKeys = keys.map(col) :+ col("_rng")
    // pass 1: within-range carry — the hot key's rows spread across its
    // occupied ranges instead of one task
    val w = Window.partitionBy(splitKeys: _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = lv.unionByName(rv, allowMissingColumns = true)
      .select(left.columns.toSeq.map(col) ++ Seq(col("_side"), col("_rng"),
        last(col("_vals"), ignoreNulls = true).over(w).as("_vals")): _*)
      .filter(col("_side") === 1)
    // pass 2: per-range final right version, carried across the per-key
    // range list (ranges occupied by EITHER side — a left-only range
    // must still receive the carry from earlier right-bearing ranges)
    val rangeList = lv.select(splitKeys: _*).distinct()
      .unionByName(rv.select(splitKeys: _*).distinct()).distinct()
    val rangeLast = rv.groupBy(splitKeys: _*)
      .agg(max_by(col("_vals"), col("_t")).as("_vals"))
    val cw = Window.partitionBy(keys.map(col): _*).orderBy(col("_rng").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = rangeList.join(rangeLast, keys :+ "_rng", "left")
      .select(splitKeys :+ last(col("_vals"), ignoreNulls = true).over(cw).as("_carry"): _*)
    within.join(carryIn, keys :+ "_rng")
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => coalesce(col("_vals"), col("_carry")).getField(c).as(c)): _*)
  }

  /** [[asofJoinSkew]]'s bucket-width rule as a pure function, unit-
    * testable without a session: given the hottest key's row count and
    * time span, returns the width that puts ~`rowsPerTask` rows in each
    * range — or None when the key is shallow enough (below
    * `switchDepth`) that [[asofJoin]]'s single sort wins anyway.
    * Defaults encode the measured local[32] crossover (~10⁶ rows/key;
    * see [[asofJoinSkew]]) with ranges of ~250k rows so a hot key fans
    * out to ≥4 tasks at the switch point. */
  def pickBucketWidth(
      hotRows: Long,
      tMin: Long,
      tMax: Long,
      switchDepth: Long = 1000000L,
      rowsPerTask: Long = 250000L): Option[Long] = {
    require(switchDepth > 0 && rowsPerTask > 0,
      "pickBucketWidth: thresholds must be positive")
    if (hotRows < switchDepth || tMax <= tMin) None
    else {
      val ranges = (hotRows + rowsPerTask - 1) / rowsPerTask
      Some(math.max(1L, (tMax - tMin + 1) / ranges))
    }
  }

  /** Skew-adaptive as-of join — [[asofJoin]]'s contract with the
    * plain-vs-split decision made from the data: one aggregate pass
    * over both sides' keys finds the hottest key's row count and time
    * span, [[pickBucketWidth]] applies the measured crossover rule, and
    * the join runs as plain [[asofJoin]] (shallow keys) or
    * [[asofJoinSkew]] at the chosen width (deep keys). The extra cost
    * is one count-shaped hash aggregate + a single-row collect —
    * O(distinct keys) shuffle payload, nothing per-row — which is the
    * right trade exactly when you cannot bound key depth a priori (the
    * 100 TB default). Time columns must be integral (epoch micros, day
    * numbers), as in [[asofJoinSkew]]. */
  def asofJoinAdaptive(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      switchDepth: Long = 1000000L,
      rowsPerTask: Long = 250000L): DataFrame = {
    val lk = left.select(keys.map(col) :+ col(leftTime).cast("long").as("_t"): _*)
    val rk = right.select(keys.map(col) :+ col(rightTime).cast("long").as("_t"): _*)
    // hottest key by UNION depth — the window sorts both sides together,
    // so the depth that serializes is the combined one
    val hot = lk.unionByName(rk)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), min(col("_t")).as("_lo"), max(col("_t")).as("_hi"))
      .sort(col("_n").desc)
      .limit(1).collect()
    val width = hot.headOption.flatMap { r =>
      pickBucketWidth(r.getAs[Long]("_n"), r.getAs[Long]("_lo"),
        r.getAs[Long]("_hi"), switchDepth, rowsPerTask)
    }
    width match {
      case Some(w) => asofJoinSkew(left, right, keys, leftTime, rightTime, w)
      case None    => asofJoin(left, right, keys, leftTime, rightTime)
    }
  }

  /** Bucketed interval-containment join: rows of `points` matched to
    * rows of `intervals` with `start <= point < end` (half-open, the
    * time-window convention). Columns must be disjoint across the two
    * inputs; long domains may be negative (pre-1970 epochs) — bucket
    * ids use floor division, so a point and its covering interval land
    * in the same bucket on both sides of zero. Empty intervals
    * (end <= start) match nothing.
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
    // floor division in exact long arithmetic: `div` truncates toward
    // zero, which (being monotone) never drops a containment but folds
    // -w+1..w-1 into one double-width bucket 0 — uneven candidate
    // volume exactly where pre/post-1970 data concentrates. pmod's
    // non-negative remainder makes (x - pmod(x, w)) an exact multiple
    // of w at floor(x/w)·w, with no double-precision detour.
    def fdiv(x: String): String =
      s"(($x) - pmod($x, ${bucketWidth}L)) div ${bucketWidth}L"
    val p = points.withColumn("_b", expr(fdiv(s"`$pointCol`")))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_b", explode(sequence(
        expr(fdiv(s"`$startCol`")),
        expr(fdiv(s"`$endCol` - 1")))))
    p.join(iv, Seq("_b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_b")
  }

  /** Bucketed interval-overlap join — the symmetric sibling of
    * [[rangeJoinBucketed]]: one row per (left, right) pair whose
    * half-open intervals intersect, `ls < re && rs < le`. Both sides
    * explode to every bucket they cover and candidates equi-join on the
    * bucket id; a pair can meet in MANY buckets, so each surviving pair
    * is claimed by exactly one — the bucket holding the overlap's start
    * `max(ls, rs)` (covered by both intervals whenever the overlap is
    * non-empty) — which replaces a `distinct` over the wide pair output
    * with a cheap scalar filter. Empty intervals (end <= start) match
    * nothing. Long domains may be negative — floor division via pmod,
    * same rationale as [[rangeJoinBucketed]].
    *
    * 100 TB: candidate volume is bucket co-occupancy; tune
    * `bucketWidth` toward the typical interval length so each interval
    * explodes to O(1) buckets. The join is a plain shuffled equi-join —
    * the planner's alternative for this predicate is
    * BroadcastNestedLoopJoin, which is quadratic and single-stage. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lsCol: String, leCol: String,
      rsCol: String, reCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSeq.intersect(right.columns.toSeq)
    require(overlap.isEmpty, s"intervalOverlapJoin: rename overlapping columns: $overlap")
    require(!(left.columns ++ right.columns).contains("_b"),
      "intervalOverlapJoin: _b is the internal bucket column — rename it in the inputs")
    def fdiv(x: String): String =
      s"(($x) - pmod($x, ${bucketWidth}L)) div ${bucketWidth}L"
    val lv = left
      .filter(col(leCol) > col(lsCol))
      .withColumn("_b", explode(sequence(
        expr(fdiv(s"`$lsCol`")),
        expr(fdiv(s"`$leCol` - 1")))))
    val rv = right
      .filter(col(reCol) > col(rsCol))
      .withColumn("_b", explode(sequence(
        expr(fdiv(s"`$rsCol`")),
        expr(fdiv(s"`$reCol` - 1")))))
    lv.join(rv, Seq("_b"))
      .filter(col(lsCol) < col(reCol) && col(rsCol) < col(leCol))
      .filter(col("_b") === expr(fdiv(s"greatest(`$lsCol`, `$rsCol`)")))
      .drop("_b")
  }
}
