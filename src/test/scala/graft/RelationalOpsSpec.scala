package graft

import graft.operators.{RelationalOps, Segmentation}
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("groupCount matches manual counts (A1-A5 shape)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("a", 4), ("b", 5)).toDF("k", "v")
    val got = RelationalOps.groupCount(df, Seq("k")).orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L), ("b", 2L)))
  }

  test("conditionalPair keeps the reference's count(non-null) semantics (A6)") {
    val df = Seq(
      ("x", Some("Loyal")), ("x", Some("Other")), ("x", None),
      ("y", Some("Loyal"))).toDF("k", "ct")
    val got = RelationalOps
      .conditionalPair(df, "k", col("ct") === "Loyal", "ct", "pos", "neg")
      .orderBy("k").collect()
    // null ct rows count into NEITHER side (count(ct) skips nulls)
    assert(got.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq(("x", 1, 1), ("y", 1, 0)))
  }

  test("unpivotMean = per-feature-value mean of the flag (A7)") {
    val df = Seq((1, 10, "R"), (1, 20, "N"), (2, 10, "R")).toDF("f1", "f2", "flag")
    val got = RelationalOps
      .unpivotMean(df, col("flag") === "R", Seq("f1", "f2"), "m")
      .orderBy("feature_name", "feature_value")
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).doubleValue(), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("f1", 1.0, 0.5), ("f1", 2.0, 1.0), ("f2", 10.0, 1.0), ("f2", 20.0, 0.0)))
  }

  test("rangeSlice is inclusive and drops columns (P1/P2)") {
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val got = RelationalOps.rangeSlice(df, "id", 3, 5, Seq("v"))
    assert(got.columns.toSeq == Seq("id"))
    assert(got.as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L))
  }

  test("topK returns k rows in total order (W3)") {
    val df = Seq(5, 3, 9, 1, 9, 7).toDF("x")
    val got = RelationalOps.topK(df, 3, Seq(col("x").desc)).as[Int].collect().toSeq
    assert(got == Seq(9, 9, 7))
  }

  test("withRowIndex is contiguous 0-based in the requested order") {
    val df = Seq(30, 10, 20, 50, 40).toDF("x")
    val got = RelationalOps.withRowIndex(df, "idx", Seq(col("x")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._2)
    assert(got.toSeq == Seq((10, 0L), (20, 1L), (30, 2L), (40, 3L), (50, 4L)))
  }

  test("segmentation is an exact cover: no loss, no dup, even sizes (G1)") {
    val df = (0 until 2500).map(i => (i * 7 % 2500, s"r$i")).toDF("k", "v")
    val seg = Segmentation.segmented(df, 1000, Seq("k"))
    val sizes = seg.groupBy("segment").count().orderBy("segment")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // fixed off-by-one: exactly 1000 per segment, last takes remainder
    assert(sizes.toSeq == Seq((0L, 1000L), (1L, 1000L), (2L, 500L)))
    assert(seg.select("k").distinct().count() == 2500)
  }

  test("unionAll unions by name") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")
    val got = RelationalOps.unionAll(Seq(a, b)).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "x"), (2, "y")))
  }

  test("approx_count_distinct stays within its rsd envelope of the exact count (a13)") {
    val dir = "/root/testdata/sf0.001"
    // the registry query emits the 5% error-bound BOOLEAN (that is what
    // the oracle hash-compares); it must hold for every group
    val bounds = SparkEntry.queries("a13_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(bounds.nonEmpty && bounds.values.forall(identity),
      s"sketch exceeded its 5% bound: $bounds")
    // independent envelope check on the raw sketch values vs exact a9
    val exact = SparkEntry.queries("a9_distinct_count")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(org.apache.spark.sql.functions.col("l_returnflag"))
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(org.apache.spark.sql.functions.col("l_orderkey"), 0.02)
        .as("approx_nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      // rsd 0.02; allow 5 sigma
      assert(math.abs(a - e) / e <= 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("approx equi-depth boundaries sit between the exact rank-slack values (a24/a25)") {
    val dir = "/root/testdata/sf0.001"
    // the registry queries emit the sketch-contract booleans the oracle
    // hash-compares; every row must satisfy all of them
    val a24 = SparkEntry.queries("a24_approx_equidepth")(spark, dir).collect()
    assert(a24.map(_.getInt(0)).toSeq == (1 to 8),
      "all 8 equi-depth buckets must be present")
    assert(a24.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      s"a24 sketch contract violated: ${a24.mkString(", ")}")
    val a25 = SparkEntry.queries("a25_approx_iqr")(spark, dir).collect()
    assert(a25.nonEmpty && a25.forall(r =>
        r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
      s"a25 sketch contract violated: ${a25.mkString(", ")}")
    // independent check against the EXACT order statistics: boundary i
    // must lie between the exact values at ranks (i/8 ∓ eps)·n
    import org.apache.spark.sql.functions.{col, lit, percentile_approx, typedLit}
    val vs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = vs.length
    val bs = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(percentile_approx(col("l_extendedprice").cast("double"),
        typedLit((1 until 8).map(_.toDouble / 8)), lit(1000)).as("bs"))
      .collect()(0).getSeq[Double](0)
    val eps = 0.005
    bs.zipWithIndex.foreach { case (b, i) =>
      val target = (i + 1).toDouble / 8
      val loIdx = math.max(0, math.floor((target - eps) * n).toInt - 1)
      val hiIdx = math.min(n - 1, math.ceil((target + eps) * n).toInt)
      assert(vs(loIdx) <= b && b <= vs(hiIdx),
        f"boundary ${i + 1} = $b%.2f outside exact rank slack [${vs(loIdx)}%.2f, ${vs(hiIdx)}%.2f]")
    }
  }

  test("percentile_approx rank error is bounded per group (a15)") {
    val dir = "/root/testdata/sf0.001"
    // the registry query emits the two-sided rank-bracket BOOLEANS the
    // oracle hash-compares; every group must satisfy both
    val rows = SparkEntry.queries("a15_approx_percentiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, medOk, p90Ok) =>
      assert(medOk && p90Ok, s"group $g: rank bracket violated (med=$medOk p90=$p90Ok)")
    }
    // independent check: the sketch value is an ACTUAL data value whose
    // exact-percentile distance is small (integer quantities, so the
    // approx median must land within one integer step of the exact one)
    import org.apache.spark.sql.functions.{col, expr}
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact_med"),
        expr("percentile_approx(l_quantity, 0.5, 1000)").as("appx_med"))
      .collect()
    both.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(e - a) <= 1.0, s"${r.getString(0)}: approx med $a vs exact $e")
    }
  }

  test("exactMoments: matches closed-form variance/correlation on a known set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // x = 1..4, y = 2x exactly: var_pop_x = 1.25, corr = 1.0 exactly
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .map { case (x, y) => ("g", x, y) }.toDF("k", "x", "y")
    val r = RelationalOps.exactMoments(df, Seq("k"), "x", 0, "y", 2).collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("var_pop_x") == 1.25)
    assert(r.getAs[Double]("var_pop_y") == 5.0)
    assert(r.getAs[Double]("corr_xy") == 1.0)
    // anti-correlated pair
    val df2 = Seq(("g", 1.0, 8.0), ("g", 2.0, 6.0), ("g", 3.0, 4.0), ("g", 4.0, 2.0))
      .toDF("k", "x", "y")
    val r2 = RelationalOps.exactMoments(df2, Seq("k"), "x", 0, "y", 2).collect()(0)
    assert(r2.getAs[Double]("corr_xy") == -1.0)
  }

  test("exactMoments is bit-identical across partition layouts (float agg is not)") {
    import org.apache.spark.sql.functions.col
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def run(parts: Int): Map[String, (Double, Double)] =
      RelationalOps.exactMoments(li.repartition(parts, col("l_orderkey")),
          Seq("l_returnflag"), "l_quantity", 0, "l_extendedprice", 2)
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Double]("var_pop_y"), r.getAs[Double]("corr_xy")))
        .toMap
    val a = run(2)
    val b = run(7)
    // == on doubles: BIT-equality is the whole contract here
    assert(a == b, s"moments drifted across partitionings:\n$a\n$b")
  }

  test("chiSquareGrid: zero cells included with expected mass, exact marginals, hand-math chi2") {
    // 2 sources x 2 langs, one combination absent: src1 never pairs
    // with 'fr' — that cell must still appear, carrying expected mass
    val docs = Seq(
      ("src0", "en"), ("src0", "en"), ("src0", "fr"),
      ("src1", "en"))
      .toDF("source", "lang")
    val got = graft.operators.RelationalOps.chiSquareGrid(docs, "source", "lang")
      .orderBy("source", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.size == 4, s"grid must be the full 2x2: ${got.keySet}")
    // N=4; row totals src0=3, src1=1; col totals en=3, fr=1
    assert(got(("src0", "en")) == ((2L, 3L, 3L, 2.25, (2.0 - 2.25) * (2.0 - 2.25) / 2.25)))
    assert(got(("src0", "fr")) == ((1L, 3L, 1L, 0.75, (1.0 - 0.75) * (1.0 - 0.75) / 0.75)))
    assert(got(("src1", "en")) == ((1L, 1L, 3L, 0.75, (1.0 - 0.75) * (1.0 - 0.75) / 0.75)))
    // the absent cell: obs 0, expected 1*1/4, chi2 = 0.25
    assert(got(("src1", "fr")) == ((0L, 1L, 1L, 0.25, 0.25)))
    // expected mass sums to each row marginal
    val expBySrc = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._4).sum).toMap
    assert(expBySrc("src0") == 3.0 && expBySrc("src1") == 1.0)
  }

  test("keyDistribution: hand-computed skew profile (counts 4,2,1,1)") {
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = RelationalOps.keyDistribution(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("max_cnt") == 4L)
    // sorted counts [1,1,2,4]: p50 at idx 1.5 → 1.5; p90 at idx 2.7 →
    // 2 + 0.7·(4−2) = 3.4; p99 at idx 2.97 → 3.94 (a10 interpolation)
    assert(r.getAs[Double]("p50_cnt") == 1.5)
    assert(math.abs(r.getAs[Double]("p90_cnt") - 3.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("p99_cnt") - 3.94) < 1e-12)
    assert(r.getAs[Double]("mean_cnt") == 2.0)
    assert(r.getAs[Double]("skew_ratio") == 2.0, "max 4 over fair share 2")
  }

  test("profileColumns: exact nulls/distinct/min/max per column in one long-form pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 20),
      (3L, Some("b"), 10),
      (4L, Some("a"), 30)
    ).toDF("id", "tag", "v")
    val got = RelationalOps.profileColumns(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("id", "tag", "v"))
    val tag = got("tag")
    assert(tag.getAs[Long]("n_rows") == 4L)
    assert(tag.getAs[Long]("n_nulls") == 1L)
    assert(tag.getAs[Long]("n_distinct") == 2L, "null is not a distinct value")
    assert(tag.getAs[String]("min_value") == "a" && tag.getAs[String]("max_value") == "b")
    val v = got("v")
    assert(v.getAs[Long]("n_nulls") == 0L && v.getAs[Long]("n_distinct") == 3L)
    assert(v.getAs[String]("min_value") == "10" && v.getAs[String]("max_value") == "30")
  }

  /** Sequential O(n²) dominance model — the independent algorithm the
    * two-level prefix-max implementation must agree with exactly. */
  private def skyModel(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet

  private def skyRun(pts: Seq[(Long, Long, Long)],
      bucketSize: Long): Set[(Long, Long, Long)] =
    RelationalOps.skyline2D(pts.toDF("id", "x", "y"), "x", "y", bucketSize)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("x"),
        r.getAs[Long]("y"))).toSet

  test("skyline2D matches the O(n²) dominance model; ties and equal-x handled") {
    val pts = Seq(
      (1L, 10L, 1L), (2L, 8L, 5L), (3L, 8L, 3L),  // equal x: only max-y survives
      (4L, 6L, 5L),                               // dominated by (8,5)
      (5L, 4L, 9L), (6L, 4L, 9L),                 // exact duplicates: BOTH survive
      (7L, 2L, 9L),                               // dominated by (4,9)
      (8L, 1L, 12L))
    val want = skyModel(pts)
    assert(want.map(p => (p._2, p._3)) ==
      Set((10L, 1L), (8L, 5L), (4L, 9L), (1L, 12L)))
    assert(skyRun(pts, 1 << 20) == want)
    // bucketSize 2 forces multiple buckets through the two-level
    // prefix max — the cross-bucket offset path must agree too
    assert(skyRun(pts, 2L) == want)
    assert(skyRun(pts, 1L) == want)
  }

  test("skyline2D: randomized parity with the dominance model across bucket sizes") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 120L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val want = skyModel(pts)
    for (bs <- Seq(1L, 3L, 64L)) assert(skyRun(pts, bs) == want, s"bucket=$bs")
  }

  test("skyline2D: single point and fully-dominated chains") {
    assert(skyRun(Seq((1L, 5L, 5L)), 4L) == Set((1L, 5L, 5L)))
    // a monotone staircase is ALL frontier; a reversed chain is one point
    val stairs = Seq((1L, 1L, 9L), (2L, 2L, 8L), (3L, 3L, 7L))
    assert(skyRun(stairs, 2L) == stairs.toSet)
    val chain = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L))
    assert(skyRun(chain, 2L) == Set((3L, 3L, 3L)))
  }

  /** Sequential lower-weighted-median reference: smallest v with
    * 2·cumWeight(≤v) ≥ total. */
  private def wmModel(pts: Seq[(String, Long, Long)]): Map[String, Long] =
    pts.groupBy(_._1).map { case (g, rows) =>
      val total = rows.map(_._3).sum
      val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      g -> byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= total } => v
      }.get
    }

  private def wmRun(pts: Seq[(String, Long, Long)], bs: Long): Map[String, Long] =
    RelationalOps.weightedMedianLower(
      pts.toDF("g", "v", "w"), "g", "v", "w", bs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("weightedMedianLower matches the sequential model; half-boundary picks the lower value") {
    // group a: weights 1,1,2 over values 10,20,30 -> cum(20)=2, tot=4,
    // 2*2>=4 EXACTLY -> lower median 20 (the cross-multiplied boundary)
    val pts = Seq(
      ("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 2L),
      ("b", 5L, 9L), ("b", 100L, 1L),     // heavy low value dominates
      ("c", 7L, 3L))                      // single value group
    val want = Map("a" -> 20L, "b" -> 5L, "c" -> 7L)
    assert(wmModel(pts) == want)
    assert(wmRun(pts, 1L << 20) == want)
    assert(wmRun(pts, 2L) == want, "cross-bucket offsets must agree")
    assert(wmRun(pts, 1L) == want)
  }

  test("weightedMedianLower: randomized parity across bucket sizes and group layouts") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toLong, 1L + rnd.nextInt(9))
    }
    val want = wmModel(pts)
    for (bs <- Seq(1L, 7L, 64L)) assert(wmRun(pts, bs) == want, s"bucket=$bs")
  }

  private def radixRun(pts: Seq[(String, Long, Long)], buckets: Int): Map[String, Long] =
    RelationalOps.groupedMedianRadix(
      pts.toDF("g", "v", "w"), "g", "v", "w", buckets)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("groupedMedianRadix: hand-math boundaries, negative values, single-value group") {
    val pts = Seq(
      ("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 2L), // 2·cum(20)=4=tot → 20
      ("b", -50L, 9L), ("b", 100L, 1L),               // heavy negative value
      ("c", 7L, 3L))                                  // span 0 → zero rounds narrow it
    val want = Map("a" -> 20L, "b" -> -50L, "c" -> 7L)
    assert(wmModel(pts) == want)
    // buckets=2 forces the max round count (pure bisection); 2^16 is
    // the production default (all spans here resolve in one round)
    for (b <- Seq(2, 3, 16, 1 << 16)) assert(radixRun(pts, b) == want, s"buckets=$b")
  }

  test("groupedMedianRadix: randomized parity with weightedMedianLower incl. wide sparse domains") {
    val rnd = new scala.util.Random(47)
    // mixed-span groups: g0/g1 dense small domain (ties, duplicate
    // weights), g2/g3 sparse wide domain (near-unique — the a47 shape
    // the radix path exists for), plus negative values
    val pts = (1 to 400).map { i =>
      val g = rnd.nextInt(4)
      val v = if (g < 2) rnd.nextInt(30).toLong - 10L
      else rnd.nextLong() % 1000000000L
      (s"g$g", v, 1L + rnd.nextInt(9))
    }
    val want = wmModel(pts)
    assert(wmRun(pts, 1L << 20) == want, "sorted-index reference disagrees with the model")
    for (b <- Seq(2, 7, 256, 1 << 16)) assert(radixRun(pts, b) == want, s"buckets=$b")
  }

  test("groupedMedianRadix: intervals hugging Long.MaxValue stay exact; over-long spans fail LOUDLY (r12 advice)") {
    // span ≈ Long.MaxValue but still a valid long: the hi-update's
    // naive `lo + (bk+1)·bw − 1` would overflow here — the guarded
    // subtraction form must not (median lower of {5, M−3, M} = M−3)
    val m = Long.MaxValue
    val pts = Seq(("a", 5L, 1L), ("a", m - 3L, 1L), ("a", m, 1L))
    assert(wmModel(pts) == Map("a" -> (m - 3L)))
    // buckets=2 would mean 63 bisection rounds (63 Spark jobs) — test
    // the production-ish sizes (7 and 4 rounds) instead
    for (b <- Seq(1 << 10, 1 << 16)) assert(radixRun(pts, b) == Map("a" -> (m - 3L)), s"buckets=$b")
    // a group spanning MORE than Long.MaxValue (both extremes at once)
    // previously overflowed the span negative and silently returned the
    // group MIN — it must now be rejected with the sign-split hint
    val bad = Seq(("a", Long.MinValue, 1L), ("a", Long.MaxValue, 2L))
    val e = intercept[IllegalArgumentException] { radixRun(bad, 1 << 16) }
    assert(e.getMessage.contains("span"), e.getMessage)
  }

  private def shiftRun(pts: Seq[(String, Long, Long)], shift: Int): Map[String, Long] =
    RelationalOps.groupedMedianShift(
      pts.toDF("g", "v", "w"), "g", "v", "w", shift)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("groupedMedianShift: hand-math boundaries, negatives across bucket edges, single-value group") {
    val pts = Seq(
      ("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 2L), // 2·cum(20)=4=tot → 20
      ("b", -50L, 9L), ("b", 100L, 1L),               // negative floor-div bucketing
      ("c", 7L, 3L))
    val want = Map("a" -> 20L, "b" -> -50L, "c" -> 7L)
    assert(wmModel(pts) == want)
    // shift=1 puts every value in its own-ish bucket (coarse pass does
    // the work); shift=12 is the production default (refine pass does)
    for (sh <- Seq(1, 3, 12, 20)) assert(shiftRun(pts, sh) == want, s"shift=$sh")
  }

  test("groupedMedianShift: randomized parity with the model and both median siblings") {
    val rnd = new scala.util.Random(83)
    val pts = (1 to 400).map { _ =>
      val g = rnd.nextInt(4)
      // dense ties and sparse near-unique values, signed
      val v = if (g < 2) rnd.nextInt(50).toLong - 25L
      else rnd.nextInt(1 << 24).toLong - (1 << 23)
      (s"g$g", v, 1L + rnd.nextInt(9))
    }
    val want = wmModel(pts)
    assert(wmRun(pts, 1L << 20) == want)
    assert(radixRun(pts, 1 << 16) == want)
    for (sh <- Seq(1, 5, 12)) assert(shiftRun(pts, sh) == want, s"shift=$sh")
  }

  test("groupedMedianMadShift: fused driver tier and distributed fallback both equal the two-selection model") {
    val rnd = new scala.util.Random(4711)
    val pts = (1 to 500).map { _ =>
      val g = rnd.nextInt(4)
      // dense ties, sparse near-unique, signed — the shift-family fixture
      val v = if (g < 2) rnd.nextInt(50).toLong - 25L
      else rnd.nextInt(1 << 24).toLong - (1 << 23)
      (s"g$g", v, 1L + rnd.nextInt(9))
    }
    val med = wmModel(pts)
    val mad = wmModel(pts.map { case (g, v, w) => (g, math.abs(v - med(g)), w) })
    def run(shift: Int, maxMeta: Int): Map[String, (Long, Long)] =
      RelationalOps.groupedMedianMadShift(
        pts.toDF("g", "v", "w"), "g", "v", "w", shift, maxMeta)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = med.map { case (g, m) => g -> ((m, mad(g))) }
    for (sh <- Seq(1, 5, 12)) {
      assert(run(sh, 1 << 20) == want, s"driver tier diverged at shift=$sh")
      assert(run(sh, 0) == want, s"distributed fallback diverged at shift=$sh")
    }
    // overflow gate: a maxMeta smaller than the coarse histogram must
    // take the fallback (same answer), never a partial driver meta
    assert(run(12, 3) == want, "overflowed meta must fall back, not truncate")
    // group-count gate (r14): the driver tier plants |groups|-branch
    // literal predicates/CASE ladders — past maxGroups it must take
    // the distributed fallback (same answer), never a giant plan
    def runG(maxGroups: Int): Map[String, (Long, Long)] =
      RelationalOps.groupedMedianMadShift(
        pts.toDF("g", "v", "w"), "g", "v", "w", 12, 1 << 20, maxGroups)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(runG(2) == want, "over-maxGroups input must fall back, not blow the plan")
    assert(runG(0) == want, "maxGroups=0 must force the distributed twin")
    // single-group single-value edge
    assert(RelationalOps.groupedMedianMadShift(
      Seq(("a", 7L, 3L)).toDF("g", "v", "w"), "g", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("a", 7L, 0L)))
  }

  test("slicedGaps equals the plain per-key lag pair multiset across slice widths (empty slices, ties, negatives)") {
    val rnd = new scala.util.Random(7)
    // clustered timestamps with long dead stretches (many empty slices
    // between bursts), duplicate timestamps (tie column decides), and
    // negative values (slice ids stay monotone under integral div)
    val rows = (1 to 400).map { i =>
      val k = s"k${rnd.nextInt(3)}"
      val burst = rnd.nextInt(4).toLong * 100000L - 150000L
      (k, burst + rnd.nextInt(30), i.toLong)
    }
    val df = rows.toDF("k", "ts", "id")
    val model = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      rs.sortBy(r => (r._2, r._3)).toList.sliding(2)
        .collect { case List(a, b) => (k, a._2, b._2, b._2 - a._2) }
    }.sorted
    for (width <- Seq(1L, 7L, 997L, 100000L, 10000000L)) {
      val got = RelationalOps.slicedGaps(df, "k", "ts", "id", width)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      assert(got == model, s"width=$width: got ${got.size} pairs, want ${model.size}")
    }
  }

  private def qModel(pts: Seq[(String, Long, Long)], q: Int): Map[(String, Int), Long] =
    pts.groupBy(_._1).flatMap { case (g, rows) =>
      val agg = rows.groupBy(_._2).map { case (v, rs) => (v, rs.map(_._3).sum) }
        .toSeq.sortBy(_._1)
      val tot = agg.map(_._2).sum
      (1 until q).map { k =>
        var cum = 0L
        var ans = Option.empty[Long]
        for ((v, w) <- agg if ans.isEmpty) {
          cum += w
          if (q.toLong * cum >= k.toLong * tot) ans = Some(v)
        }
        (g, k) -> ans.get
      }
    }.toMap

  private def qRun(pts: Seq[(String, Long, Long)], q: Int, bs: Long) =
    RelationalOps.groupedExactQuantiles(
      pts.toDF("g", "v", "w"), "g", "v", "w", q, bs)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("groupedExactQuantiles: hand-math deciles, weighted skew, single-value group") {
    // uniform 1..4: k=1,2 -> 1; k=3,4,5 -> 2; k=6,7 -> 3; k=8,9 -> 4
    // skew b: w(10)=1, w(20)=9 over tot 10: k=1 -> 10, k>=2 -> 20
    val pts = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("b", 10L, 1L), ("b", 20L, 9L),
      ("c", 7L, 5L))
    val want = qModel(pts, 10)
    assert(want(("a", 5)) == 2L && want(("b", 1)) == 10L && want(("b", 2)) == 20L)
    assert((1 to 9).forall(k => want(("c", k)) == 7L))
    for (bs <- Seq(1L, 2L, 1L << 20)) assert(qRun(pts, 10, bs) == want, s"bucket=$bs")
  }

  test("groupedExactQuantiles: k=q/2 equals weightedMedianLower, randomized parity") {
    val rnd = new scala.util.Random(23)
    val pts = (1 to 300).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(30).toLong, 1L + rnd.nextInt(9))
    }
    val deciles = qRun(pts, 10, 64L)
    assert(qModel(pts, 10) == deciles)
    val medians = wmRun(pts, 1L << 20)
    for ((g, m) <- medians) assert(deciles((g, 5)) == m, s"median mismatch for $g")
  }

  private def qShiftRun(pts: Seq[(String, Long, Long)], q: Int, shift: Int) =
    RelationalOps.groupedQuantilesShift(
      pts.toDF("g", "v", "w"), "g", "v", "w", q, shift)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("groupedQuantilesShift: parity with the model and the sorted-index form, negatives, mixed spans") {
    val rnd = new scala.util.Random(59)
    // dense-tie and sparse near-unique groups, signed values across
    // shift-bucket edges — the a46 vigintile shape
    val pts = (1 to 400).map { _ =>
      val g = rnd.nextInt(4)
      val v = if (g < 2) rnd.nextInt(40).toLong - 20L
      else rnd.nextInt(1 << 22).toLong - (1 << 21)
      (s"g$g", v, 1L + rnd.nextInt(9))
    }
    for (q <- Seq(4, 10, 20)) {
      val want = qModel(pts, q)
      assert(qRun(pts, q, 64L) == want, s"sorted-index form diverged at q=$q")
      for (sh <- Seq(1, 5, 12)) assert(qShiftRun(pts, q, sh) == want,
        s"shift form diverged at q=$q shift=$sh")
    }
  }
}
