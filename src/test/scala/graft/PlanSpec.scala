package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions — the 100 TB design contract. A query that is
  * correct but scans all columns, skips pushdown, or cross-joins would
  * pass value checks and still be wrong at scale; these tests pin the
  * plan shape. Fixture: sf0.001 (~6k lineitem rows). */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("range filter is pushed into the parquet scan (P1)") {
    val q = SparkEntry.queries("p1_range_slice")(spark, dir)
    val f = formatted(q)
    assert(f.contains("PushedFilters:"), f)
    assert(f.contains("GreaterThanOrEqual(l_quantity,10.0)") ||
      f.contains("GreaterThanOrEqual(l_quantity"), s"filter not pushed:\n$f")
  }

  test("projection prunes the scan schema to referenced columns (A1)") {
    val q = SparkEntry.queries("a1_group_count_segment")(spark, dir)
    val f = formatted(q)
    // ReadSchema must contain only the grouping column, not all 5
    val read = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("c_mktsegment"))
    assert(!read.contains("c_acctbal"), s"scan reads unneeded columns: $read")
  }

  test("dimension joins broadcast the small side, no shuffle of dims (J1)") {
    val q = SparkEntry.queries("j1_broadcast_dim")(spark, dir)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3-shaped 3-table join: every filter reaches its scan, dim broadcasts (J5)") {
    val q = SparkEntry.queries("j5_q3_shape")(spark, dir)
    val f = formatted(q)
    // selectivity must apply BEFORE the joins: each filter pushed into
    // its own parquet scan
    assert(f.contains("EqualTo(c_mktsegment,BUILDING)"), s"segment filter not pushed:\n$f")
    assert(f.contains("LessThan(o_orderdate"), s"order-date filter not pushed:\n$f")
    assert(f.contains("GreaterThan(l_shipdate"), s"ship-date filter not pushed:\n$f")
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), s"filtered customer dim must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must not global-sort:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort (W2)") {
    val q = SparkEntry.queries("w2_topk")(spark, dir)
    assert(plan(q).contains("TakeOrderedAndProject"), plan(q))
  }

  test("running distinct: both windows share ONE user_id hash Exchange (E12)") {
    val q = SparkEntry.queries("e12_running_distinct")(spark, dir)
    val p = plan(q)
    // the (user, item) window's clustering requirement is satisfied by
    // the user_id partitioning (subset clustering) — a second hash
    // Exchange here means the carefully-shared partitioning broke
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected ONE hash Exchange shared by both windows, got $hashExchanges:\n$p")
  }

  test("co-occurrence: distinct and both join sides share ONE fact shuffle (J17)") {
    val q = SparkEntry.queries("j17_cooccurrence")(spark, dir)
    val p = plan(q)
    // the forced user_id partitioning serves the (user, item) distinct
    // AND both self-join sides, and the distinct frame is cached — so
    // the fact-side user_id Exchange must be ONE physical node (the
    // cached plan prints under both InMemoryTableScans; distinct
    // plan_ids see through the textual duplication)
    val factIds = "Exchange hashpartitioning\\(user_id[^\\n]*plan_id=(\\d+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(factIds.size <= 1, s"fact must shuffle once on user_id, got $factIds:\n$p")
    assert("InMemoryTableScan".r.findAllIn(p).size == 2,
      s"both join sides must read the staged distinct frame:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("per-group top-k rides WindowGroupLimit below the shuffle (W14)") {
    val q = SparkEntry.queries("w14_topk_per_group")(spark, dir)
    val p = plan(q)
    // the rank<=k filter must be recognized: partial per-group limits
    // run below the Exchange, so the shuffle carries <= k rows per
    // (group, partition), not the whole fact
    assert(p.contains("WindowGroupLimit"), s"rank filter not pushed to WindowGroupLimit:\n$p")
  }

  test("zipf top-64 rides WindowGroupLimit, never a full-vocab sort (t34)") {
    val q = SparkEntry.queries("t34_zipf_slope")(spark, dir)
    val p = plan(q)
    assert(p.contains("WindowGroupLimit"),
      s"rank<=64 not pushed to WindowGroupLimit:\n$p")
  }

  test("unpivot-mean runs ONE aggregation, not 14 unions (A7)") {
    val q = SparkEntry.queries("a7_unpivot_mean")(spark, dir)
    val p = plan(q)
    assert(!p.contains("Union"), s"A7 must not plan a union:\n$p")
    // exactly one partial+final agg pair over the unpivoted stream
    assert("HashAggregate".r.findAllIn(p).size <= 4, p)
  }

  test("whole-stage codegen covers the aggregation pipeline (no UDF opacity)") {
    val q = SparkEntry.queries("a6_conditional_pair")(spark, dir)
    q.collect() // materialize so AQE finalizes the physical plan
    val p = plan(q)
    // codegen spans render as "*(n) Operator" in the simple plan string
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"), p)
  }

  test("exact dedup aggregates instead of self-joining") {
    val q = SparkEntry.queries("d1_exact_dedup")(spark, dir)
    val p = plan(q)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("cosine top-k broadcasts probes; corpus is never shuffled") {
    val q = SparkEntry.queries("s1_cosine_topk")(spark, dir)
    val p = plan(q)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ivfAssign is a narrow map: no Exchange/Window between scan and list id") {
    import spark.implicits._
    val df = (0 until 64)
      .map(i => (i.toLong, Array.tabulate(8)(d => (i * 31 + d).toFloat % 7f)))
      .toDF("vec_id", "embedding")
    val cents = operators.Similarity.ivfCentroids(df, "vec_id", "embedding", 4)
    val assigned = operators.Similarity.ivfAssign(df, cents, "vec_id", "embedding")
    val p = plan(assigned)
    assert(!p.contains("Exchange"), s"ivfAssign must not shuffle:\n$p")
    assert(!p.contains("Window"), s"ivfAssign must not plan a window:\n$p")
    assert(!p.contains("Join"), s"ivfAssign must not join:\n$p")
  }

  test("sessionization plans ONE exchange: all window functions share the user partitioning") {
    // e7 computes session_seq AND in-session position from a single
    // (user_id)-partitioned window spec; a row_number over
    // (user, session_seq) would add a second hash Exchange on the
    // widened key — this pins the one-shuffle shape
    val q = SparkEntry.queries("e7_sessionize")(spark, dir)
    val p = plan(q)
    val windowExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(windowExchanges == 1,
      s"expected exactly one user_id hash exchange, found $windowExchanges:\n$p")
  }

  test("funnel plans ONE exchange: the three chained min-windows share the user partitioning") {
    // w10's sequential milestones (t2 depends on t1, t3 on t2) are three
    // Window ops over the SAME (user_id) partition — the final groupBy
    // rides that partitioning too, so the whole funnel is one shuffle;
    // the naive per-step join form is k scans + k shuffles
    val q = SparkEntry.queries("w10_funnel")(spark, dir)
    val p = plan(q)
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(userExchanges == 1,
      s"expected exactly one user_id hash exchange, found $userExchanges:\n$p")
  }

  test("EVERY registry query: no CartesianProduct, no unbounded-following frame, no nondeterministic expressions") {
    // A cartesian product in any query is an instant scale-killer; an
    // unboundedfollowing$ window frame re-aggregates the remaining
    // partition for EVERY row (Spark's
    // UnboundedFollowingWindowFunctionFrame — O(n²) in partition depth;
    // cost e10 27.6 s vs 1.3 s at sf0.1 before it was rewritten as a
    // descending running frame); a nondeterministic expression (rand
    // etc.) breaks retry/replay semantics AND the oracle contract.
    // Sweep the whole registry.
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
      // whole-partition frames (unboundedpreceding → unboundedfollowing)
      // are fine: evaluated once per partition. Only a MOVING lower
      // bound combined with unboundedfollowing re-aggregates per row.
      val movingLower = p
        .replace("unboundedpreceding$(), unboundedfollowing$()", "")
        .contains("unboundedfollowing")
      assert(!movingLower,
        s"$name plans an O(n²) unbounded-following window frame:\n$p")
      val nondet = df.queryExecution.analyzed.collect {
        case plan0 => plan0.expressions.filter(e => !e.deterministic)
      }.flatten
      assert(nondet.isEmpty, s"$name has nondeterministic expressions: $nondet")
    }
  }

  test("entry flagship runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Q21 shape decorrelates to semi + anti joins, dims broadcast (J28)") {
    val q = SparkEntry.queries("j28_q21_shape")(spark, dir)
    val p = plan(q)
    // the correlated EXISTS/NOT EXISTS must become join operators —
    // LeftSemi for "another supplier exists", LeftAnti for "no other
    // late supplier" — with the <> residual riding the equi-join,
    // never a nested-loop/cartesian fallback
    assert(p.contains("LeftSemi"), s"no semi join in Q21 plan:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join in Q21 plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier dim must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
    CachePool.releaseAll()
  }

  test("capPerKey rides the existing user partitioning: ONE exchange in j17 (no cap shuffle)") {
    val q = SparkEntry.queries("j17_cooccurrence")(spark, dir)
    val p = plan(q)
    // the guard's count-over-window must reuse the explicit user_id
    // repartition — a second user-keyed exchange would mean the cap
    // broke the e12 one-shuffle discipline. Count DISTINCT plan ids:
    // the one cached exchange prints once per join side consuming it.
    val exchangeIds =
      """Exchange hashpartitioning\(user_id[^\n]*plan_id=(\d+)""".r
        .findAllMatchIn(p).map(_.group(1)).toSet
    assert(exchangeIds.size <= 1,
      s"j17 shuffles the fact on user_id ${exchangeIds.size} distinct times:\n$p")
    CachePool.releaseAll()
  }

  test("Q6 shape: all three range predicates reach the parquet scan (J37)") {
    val q = SparkEntry.queries("j37_q6_shape")(spark, dir)
    val f = formatted(q)
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c predicate not pushed:\n$pushed")
    val read = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"Q6 scan reads unneeded columns:\n$read")
  }

  test("Q17 shape: per-part gate is ONE aggregate joined back, all joins broadcast (J30)") {
    val q = SparkEntry.queries("j30_q17_shape")(spark, dir)
    val p = plan(q)
    assert(!p.contains("SortMergeJoin"),
      s"Q17's brand-shrunk joins must all broadcast:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    // the semi-filtered fact is persisted once for its two consumers
    assert(p.contains("InMemoryTableScan"),
      s"fact not staged for the stats+gate reuse:\n$p")
    CachePool.releaseAll()
  }

  test("Q4 shape: EXISTS decorrelates to LEFT SEMI with the quarter filter pushed (J36)") {
    val q = SparkEntry.queries("j36_q4_shape")(spark, dir)
    val p = plan(q)
    assert(p.contains("LeftSemi"), s"no semi join in Q4 plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val f = formatted(q)
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("o_orderdate"), s"quarter filter not pushed:\n$pushed")
  }

  test("skyline: every window is bucket-scoped, never corpus-ordered (X40)") {
    for (name <- Seq("x40_skyline")) {
      val p = plan(SparkEntry.queries(name)(spark, dir))
      // the two-level prefix discipline: every Window's partition/order
      // spec involves the bucket id — a Window line WITHOUT _bk would
      // be a corpus-width total order in one task
      val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
      assert(windows.nonEmpty, s"$name lost its prefix windows:\n$p")
      windows.foreach(w =>
        assert(w.contains("_bk"), s"$name has a non-bucketed window: $w"))
      CachePool.releaseAll()
    }
  }

  test("shift-selection family: every window is group-partitioned and metadata-width, never corpus-ordered") {
    // r12: a47/a44/a46 moved off the two-level prefix (sorted-index)
    // plan onto the groupedMedianShift/groupedQuantilesShift family,
    // whose windows are partitioned by the GROUP (and quantile index)
    // and bounded by the shift contract (coarse pass ≤ span>>12 bucket
    // rows per group, refine pass ≤ 2^12 distinct values) — so the pin
    // here is "every Window has a partition spec leading with _g", the
    // guard against the corpus-width single-task total order
    // r13: a41/a48 joined (their cents domains are bounded-span too —
    // the r12 verdict's item 2: a41's one sorted-index median cost more
    // than a47's two shift medians)
    // r14: a47 moved onto the FUSED groupedMedianMadShift, whose
    // coarse/refine crossings run on bounded driver meta — its result
    // plan is a metadata-width LocalTableScan with no windows AT ALL
    // (the corpus touches are map-side-combined aggregate jobs), which
    // satisfies the pin's actual guard (no corpus-width single-task
    // sort) vacuously; the pin for it is "local result, zero windows".
    for (name <- Seq("a44_exact_deciles", "a46_winsorized_mean",
        "a41_weighted_median", "a48_levene")) {
      val p = plan(SparkEntry.queries(name)(spark, dir))
      val windows = p.linesIterator.filter(_.contains("Window ")).toSeq
      assert(windows.nonEmpty, s"$name lost its selection windows:\n$p")
      windows.foreach(w =>
        assert(w.contains("windowspecdefinition(_g#"),
          s"$name has a window not partitioned by the group: $w"))
      CachePool.releaseAll()
    }
    val a47Plan = plan(SparkEntry.queries("a47_mad")(spark, dir))
    assert(!a47Plan.contains("Window "),
      s"a47_mad's fused driver tier must emit a window-free plan:\n$a47Plan")
    assert(a47Plan.contains("LocalTableScan"),
      s"a47_mad's result must be the metadata-width local frame:\n$a47Plan")
    CachePool.releaseAll()
  }

  test("per-type gap machinery is day-sliced: no window sorts a whole type's history in one task (E27)") {
    // r13 (verdict item 4): the per-TYPE lag moved onto slicedGaps — a
    // raw-width window partitioned by a LOW-CARDINALITY key alone
    // would put an event type's entire 100 TB history into one task's
    // sort. Pin: every window spec in this plan carries the slice
    // column (raw lag + boundary stitch) or the median machinery's
    // bucket id — never a bare type over raw rows. (e14's per-USER lag
    // keeps the plain window: user_id is high-cardinality, the e7/w9
    // family shape.)
    for (name <- Seq("e27_interarrival_median")) {
      val p = plan(SparkEntry.queries(name)(spark, dir))
      val windows = p.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
      assert(windows.nonEmpty, s"$name lost its gap windows:\n$p")
      windows.foreach(w =>
        assert(w.contains("_slice") || w.contains("_bk"),
          s"$name has a bare-key window (whole-key single-task sort): $w"))
      CachePool.releaseAll()
    }
  }

  test("pagerank: the decorated edge list is persisted and reused across iterations (X38)") {
    val q = SparkEntry.queries("x38_pagerank")(spark, dir)
    val p = plan(q)
    // 5 iterations must consume the SAME in-memory edge relation, not
    // re-derive the co-engagement self-join per round
    val scans = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans >= 5, s"expected the edge cache under every iteration, saw $scans:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    CachePool.releaseAll()
  }

  test("context-fit panel prunes the documents scan to the text column (X45)") {
    val q = SparkEntry.queries("x45_context_fit")(spark, dir)
    val read = formatted(q).linesIterator
      .filter(_.contains("ReadSchema")).mkString
    // one token-count pass needs text and NOTHING else — a scan
    // dragging the metadata columns through the explode is 100 TB waste
    assert(read.contains("text"), s"text column missing from scan: $read")
    for (c <- Seq("source", "lang", "n_chars", "doc_id"))
      assert(!read.contains(c), s"x45 scan reads unneeded column $c: $read")
  }

  test("funnel time-to-convert shares ONE user_id exchange across its chained windows (W28)") {
    val q = SparkEntry.queries("w28_funnel_time")(spark, dir)
    val p = plan(q)
    // w10's three chained min-windows are all PARTITION BY user_id:
    // Spark must plan them over a single hashpartitioning(user_id)
    // exchange SUBTREE (window chaining preserves the child
    // distribution, and the three consuming branches — stage gaps,
    // n_users, median join — reuse it at execution). The printed
    // pre-AQE tree repeats the subtree per branch, so the pin is on
    // DISTINCT plan_ids: more than one means a second corpus shuffle
    // on the same key actually exists
    val userExchangeIds =
      """Exchange hashpartitioning\(user_id[^\n]*plan_id=(\d+)""".r
        .findAllMatchIn(p).map(_.group(1)).toSet
    assert(userExchangeIds.size <= 1,
      s"expected ONE user_id exchange subtree, saw ids $userExchangeIds:\n$p")
    // events scan: user_id/ts/event_type only
    val read = formatted(q).linesIterator
      .filter(_.contains("ReadSchema")).mkString
    for (c <- Seq("value", "event_id"))
      assert(!read.contains(c), s"w28 scan reads unneeded column $c: $read")
    CachePool.releaseAll()
  }

  test("token-fertility panel prunes the documents scan to doc_id and text (T38)") {
    val q = SparkEntry.queries("t38_token_fertility")(spark, dir)
    val reads = formatted(q).linesIterator
      .filter(_.contains("ReadSchema")).mkString
    // the train collect + encode + script ladder all ride (doc_id,
    // text); metadata columns must stay out of every scan
    for (c <- Seq("source", "lang", "n_chars"))
      assert(!reads.contains(c), s"t38 scans read unneeded column $c: $reads")
    assert(!plan(q).contains("CartesianProduct"))
    CachePool.releaseAll()
  }

  test("Q2 shape: ONE fact aggregate, dims broadcast after the argmin, fact joined once (J25)") {
    // j25 is the round-16/17 timing watch item (0.64 -> 0.90-1.14 s
    // across contexts); the dedicated re-measure called it host/JIT
    // band, and this pin makes the OTHER explanation — a silent plan
    // drift — impossible to miss: the argmin must stay one map-side-
    // combined aggregate over the fact, and every decoration join must
    // broadcast against the |parts|-sized argmin result, never join
    // or shuffle the fact itself
    val q = SparkEntry.queries("j25_q2_shape")(spark, dir)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no shuffle join anywhere in the Q2 shape:\n$p")
    // exactly one aggregation pair (partial + final) over the fact:
    // a second hashpartitioning exchange on l_partkey would mean the
    // fact is shuffled beyond the single argmin
    val factExchanges =
      """Exchange hashpartitioning\(l_partkey""".r.findAllMatchIn(p).size
    assert(factExchanges <= 1, s"fact must shuffle at most once (argmin):\n$p")
    // the lineitem scan carries only the three argmin columns
    val read = formatted(q).linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("l_partkey")).mkString
    for (c <- Seq("l_quantity", "l_shipdate", "l_orderkey", "l_discount"))
      assert(!read.contains(c), s"j25 fact scan reads unneeded column $c: $read")
    CachePool.releaseAll()
  }
}
