package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin: latest right at-or-before per key, exact ties match, no-prior is null") {
    val left = Seq(
      (1L, "a", 10L), // before any right row for a
      (2L, "a", 20L), // exactly at a right row -> matches it
      (3L, "a", 35L), // between rights -> latest earlier
      (4L, "b", 50L), // other key
      (5L, "c", 10L)  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, 200.0),
      ("a", 30L, 300.0),
      ("b", 49L, 490.0),
      ("b", 51L, 510.0)
    ).toDF("k", "rt", "rv")
      .withColumn("r_t", col("rt"))

    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(got == Seq(
      (1L, None, None),
      (2L, Some(20L), Some(200.0)),
      (3L, Some(30L), Some(300.0)),
      (4L, Some(49L), Some(490.0)),
      (5L, None, None)))
  }

  test("asofJoinForward: earliest right at-or-after per key; mirror identity with asofJoin on negated time") {
    val left = Seq(
      (1L, "a", 10L), // before both rights -> earliest following (20)
      (2L, "a", 20L), // exactly at a right row -> matches it
      (3L, "a", 35L), // after all rights for a -> null
      (4L, "b", 50L), // between b's rights -> 51
      (5L, "c", 10L)  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, 200.0),
      ("a", 30L, 300.0),
      ("b", 49L, 490.0),
      ("b", 51L, 510.0)
    ).toDF("k", "rt", "rv")
      .withColumn("r_t", col("rt"))

    val got = TemporalJoin.asofJoinForward(left, right, Seq("k"), "t", "rt")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(got == Seq(
      (1L, Some(20L), Some(200.0)),
      (2L, Some(20L), Some(200.0)),
      (3L, None, None),
      (4L, Some(51L), Some(510.0)),
      (5L, None, None)))

    // forward-as-of on t must equal backward-as-of on -t, row for row
    val mirrored = TemporalJoin.asofJoin(
        left.withColumn("t", -col("t")),
        right.withColumn("rt", -col("rt")),
        Seq("k"), "t", "rt")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(mirrored == got, "forward as-of diverges from backward as-of on negated time")
  }

  test("asofJoinWithin: stale matches degrade to null, fresh and exact-time matches carry") {
    val left = Seq(
      (1L, "a", 100L), // latest right is 95, age 5 <= 10 -> match
      (2L, "a", 200L), // latest right is 95, age 105 > 10 -> null
      (3L, "a", 95L),  // exact-time match, age 0
      (4L, "c", 50L)   // no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 90L, 900.0),
      ("a", 95L, 950.0)
    ).toDF("k", "rt", "rv")
      .withColumn("r_t", col("rt"))
    val got = TemporalJoin.asofJoinWithin(left, right, Seq("k"), "t", "rt",
        maxStaleness = 10L)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(got == Seq(
      (1L, Some(95L), Some(950.0)),
      (2L, None, None),
      (3L, Some(95L), Some(950.0)),
      (4L, None, None)))
    // a bound wider than the data's whole span must reproduce plain
    // asofJoin row for row (MaxValue would overflow _t - bound in ANSI)
    val unbounded = TemporalJoin.asofJoinWithin(left, right, Seq("k"), "t", "rt",
        maxStaleness = 1000000L)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    val plain = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(unbounded == plain, "maxStaleness=MaxValue must degrade to plain asofJoin")
  }

  test("asofJoinNearest: closest either direction, ties go backward, single-sided fallbacks") {
    val left = Seq(
      (1L, "a", 10L), // only forward candidates -> 20
      (2L, "a", 24L), // 20 at distance 4 beats 30 at 6
      (3L, "a", 25L), // equidistant -> the earlier (backward) match
      (4L, "a", 26L), // 30 closer
      (5L, "a", 30L), // exact-time match wins at distance zero
      (6L, "a", 99L), // only backward candidates -> 30
      (7L, "c", 10L)  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, 200.0),
      ("a", 30L, 300.0)
    ).toDF("k", "rt", "rv")
      .withColumn("r_t", col("rt"))

    val got = TemporalJoin.asofJoinNearest(left, right, Seq("k"), "t", "rt")
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("r_t")), Option(r.getAs[Any]("rv"))))
      .toSeq
    assert(got == Seq(
      (1L, Some(20L), Some(200.0)),
      (2L, Some(20L), Some(200.0)),
      (3L, Some(20L), Some(200.0)),
      (4L, Some(30L), Some(300.0)),
      (5L, Some(30L), Some(300.0)),
      (6L, Some(30L), Some(300.0)),
      (7L, None, None)))
  }

  test("asofJoinNearest: matched version carries atomically; one Exchange, running frames only") {
    // nearest is the rv=null version — a per-column carry would blend
    // in 200.0 from the farther version
    val left = Seq((1L, "a", 29L)).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, Some(200.0), "far"),
      ("a", 30L, None, "near")
    ).toDF("k", "rt", "rv", "tag")
    val joined = TemporalJoin.asofJoinNearest(left, right, Seq("k"), "t", "rt")
    val got = joined.collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("rv")), r.getAs[String]("tag")))
    assert(got.toSeq == Seq((1L, None, "near")))
    // two Window ops (asc backward carry, desc forward carry) over ONE
    // key Exchange — and no unboundedfollowing$ frame anywhere: that
    // frame re-aggregates the remaining partition per row (O(n²) in key
    // depth). String-level because WindowExec hides inside AQE stages.
    val s = joined.queryExecution.executedPlan.toString
    val finalSection = s.split("== Initial Plan ==")(0)
    assert("Window \\[".r.findAllIn(finalSection).size == 2,
      s"backward+forward carries must plan as two running-frame Windows:\n$finalSection")
    assert("Exchange hashpartitioning".r.findAllIn(finalSection).size == 1,
      s"both carries must reuse one key Exchange:\n$finalSection")
    assert(!finalSection.contains("unboundedfollowing"),
      s"no O(n²) unbounded-following frame allowed:\n$finalSection")
    assert(!s.contains("BroadcastNestedLoop") && !s.contains("Cartesian"),
      s"nearest as-of must never nest-loop:\n$s")
  }

  test("asofJoin: null values inside the matched version are carried as nulls, never blended") {
    // the matched (latest) version holds rv=null: a per-column carry
    // would back-fill rv=200.0 from the OLDER version and emit a row
    // mixing attributes of two versions; the struct carry must not
    val left = Seq((1L, "a", 40L)).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, Some(200.0), "old"),
      ("a", 30L, None, "new")
    ).toDF("k", "rt", "rv", "tag")
    val got = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("rv")), r.getAs[String]("tag")))
    assert(got.toSeq == Seq((1L, None, "new")))
  }

  test("asofJoin plan: one key Exchange, no nested-loop or cartesian join") {
    // parquet-backed to keep the plan honest
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("rt"),
        col("value").as("rv"))
      .groupBy(col("user_id"), col("rt")).agg(max(col("rv")).as("rv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val joined = TemporalJoin.asofJoin(purchases, clicks, Seq("user_id"), "t", "rt")
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"asof must never nest-loop:\n$plan")
    assert(plan.contains("Window"), "carry must run as a window, not a join")
  }

  test("asofJoinSkew agrees with asofJoin across bucket widths, incl. a 50%-hot key") {
    // one key holds half of all rows (the pathological shape the split
    // exists for); widths cover many-ranges, boundary-aligned, and
    // one-range (degenerates to the plain shape) regimes
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(6)}"
      (i.toLong, k, rnd.nextInt(1000).toLong)
    }.toDF("id", "k", "t")
    val right = (0 until 300).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(8)}"
      (k, rnd.nextInt(1100).toLong, rnd.nextDouble())
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // one per (key, time): op contract
      .toDF("k", "rt", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("rv")))).toSet
    val plain = rows(TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt"))
    for (w <- Seq(7L, 100L, 4096L)) {
      val split = rows(TemporalJoin.asofJoinSkew(left, right, Seq("k"), "t", "rt", w))
      assert(split == plain, s"bucketWidth=$w diverges from asofJoin")
    }
  }

  test("asofJoinSkew: null values in the matched version carry as nulls; no-prior stays null") {
    val left = Seq((1L, "a", 40L), (2L, "a", 5L)).toDF("id", "k", "t")
    val right = Seq(
      ("a", 20L, Some(200.0), "old"),
      ("a", 30L, None, "new")
    ).toDF("k", "rt", "rv", "tag")
    val got = TemporalJoin.asofJoinSkew(left, right, Seq("k"), "t", "rt", bucketWidth = 8L)
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("rv")),
        Option(r.getAs[Any]("tag")))).toSet
    assert(got == Set((1L, None, Some("new")), (2L, None, None)))
  }

  test("asofJoinSkew plan: heavy window partitions by (key, range), no nested loop") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("rt"), col("value").as("rv"))
      .groupBy(col("user_id"), col("rt")).agg(max(col("rv")).as("rv"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    val joined = TemporalJoin.asofJoinSkew(
      purchases, clicks, Seq("user_id"), "t", "rt", bucketWidth = 3600L * 1000000L)
    val plain = TemporalJoin.asofJoin(purchases, clicks, Seq("user_id"), "t", "rt")
    assert(joined.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"skew as-of must never nest-loop:\n$plan")
    assert(plan.contains("_rng"), "the window must partition on the split range key")
  }

  test("pickBucketWidth: shallow keys decline, deep keys get ~rowsPerTask-sized ranges") {
    // below the switch depth the plain sort wins — no width
    assert(TemporalJoin.pickBucketWidth(999999L, 0L, 100000000L).isEmpty)
    // zero/inverted span cannot be ranged
    assert(TemporalJoin.pickBucketWidth(5000000L, 100L, 100L).isEmpty)
    // 3M rows at 250k/task -> 12 ranges over span 1.2e7 -> width 1e6
    assert(TemporalJoin.pickBucketWidth(3000000L, 0L, 11999999L)
      .contains(1000000L))
    // width never collapses below 1 even for absurd depth on a tiny span
    assert(TemporalJoin.pickBucketWidth(100000000L, 0L, 9L, switchDepth = 10L)
      .contains(1L))
    // custom thresholds are honored
    assert(TemporalJoin.pickBucketWidth(100L, 0L, 99L,
      switchDepth = 50L, rowsPerTask = 25L).contains(25L))
  }

  test("asofJoinAdaptive matches asofJoin on both shallow and deep-hot-key inputs") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(5)}"
      (i.toLong, k, rnd.nextInt(1000).toLong)
    }.toDF("id", "k", "t")
    val right = (0 until 250).map { i =>
      val k = if (i % 2 == 0) "hot" else s"k${rnd.nextInt(7)}"
      (k, rnd.nextInt(1100).toLong, rnd.nextDouble())
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "rt", "rv")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("rv")))).toSet
    val plain = rows(TemporalJoin.asofJoin(left, right, Seq("k"), "t", "rt"))
    // shallow regime: hottest key ~150+125 rows, far below any real
    // switch depth — adaptive must pick the plain path and agree
    assert(rows(TemporalJoin.asofJoinAdaptive(
      left, right, Seq("k"), "t", "rt")) == plain)
    // deep regime: force the switch with a tiny threshold so the split
    // path runs on the same fixture — output must be identical
    assert(rows(TemporalJoin.asofJoinAdaptive(
      left, right, Seq("k"), "t", "rt",
      switchDepth = 50L, rowsPerTask = 40L)) == plain)
  }

  test("rangeJoinBucketed: half-open containment, boundary points, multi-bucket intervals") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 95L), (6L, 34L))
      .toDF("pid", "p")
    // intervals: [10,20) spans two width-8 buckets; [90,100) far away;
    // [30,30) is empty and must match nothing
    val intervals = Seq((100L, 10L, 20L), (200L, 90L, 100L), (300L, 30L, 30L))
      .toDF("iid", "s", "e")
    val got = TemporalJoin.rangeJoinBucketed(points, intervals, "p", "s", "e", bucketWidth = 8L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p=10 and p=19 inside [10,20); p=20 excluded (half-open); p=95 in [90,100)
    assert(got == Set((2L, 100L), (3L, 100L), (5L, 200L)))
  }

  test("rangeJoinBucketed: each containment appears exactly once (no cross-bucket dups)") {
    val points = (0L until 50L).map(i => (i, i * 3L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 150L)).toDF("iid", "s", "e") // spans many width-7 buckets
    val rows = TemporalJoin.rangeJoinBucketed(points, intervals, "p", "s", "e", bucketWidth = 7L)
      .select(col("pid")).collect().map(_.getLong(0)).toSeq
    assert(rows.length == rows.distinct.length, "a pair met in more than one bucket")
    assert(rows.length == 50, "all points lie inside the interval")
  }

  test("rangeJoinBucketed: negative domains bucket by floor division (pre-1970 epochs)") {
    // boundary points on both sides of zero: half-open containment must
    // hold exactly and each pair appear once, with uniform-width buckets
    val points = Seq((1L, -3L), (2L, -10L), (3L, -1L), (4L, 0L), (5L, -11L))
      .toDF("pid", "p")
    val intervals = Seq((100L, -10L, -1L), (200L, -2L, 3L)).toDF("iid", "s", "e")
    val got = TemporalJoin.rangeJoinBucketed(points, intervals, "p", "s", "e", bucketWidth = 8L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L)))
  }

  test("rangeJoinBucketed plan: equi-join on the bucket id, no nested loop") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("p"), col("event_id").as("pid"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iid"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(600000000L)).as("e"))
    val joined = TemporalJoin.rangeJoinBucketed(clicks, errors, "p", "s", "e", 600000000L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"bucketed range join must stay an equi-join:\n$plan")
  }

  test("intervalOverlapJoin matches the naive overlap join, one row per pair") {
    // spans crossing many buckets, touching intervals (no overlap under
    // half-open semantics), empty intervals, negative domains
    val left = Seq(
      (1L, 0L, 10L),    // overlaps r1, r2
      (2L, 10L, 20L),   // touches r1 at 10 -> NO match with [5,10)
      (3L, -25L, -5L),  // negative domain
      (4L, 30L, 30L),   // empty -> matches nothing
      (5L, 0L, 100L)    // long span across many buckets
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (101L, 5L, 10L),
      (102L, 9L, 12L),
      (103L, -10L, -8L),
      (104L, 29L, 31L),
      (105L, 99L, 200L)
    ).toDF("rid", "rs", "re")
    val naive = left.as("a").join(right.as("b"),
        col("ls") < col("re") && col("rs") < col("le") && col("le") > col("ls") && col("re") > col("rs"))
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    for (w <- Seq(3L, 7L, 64L)) {
      val rows = TemporalJoin.intervalOverlapJoin(left, right, "ls", "le", "rs", "re", w)
        .select(col("lid"), col("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(rows == rows.distinct, s"width $w: a pair met in more than one bucket")
      assert(rows == naive, s"width $w: got $rows want $naive")
    }
  }

  test("intervalOverlapJoin plan: equi-join on the bucket id, no nested loop") {
    val left = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val right = Seq((2L, 5L, 15L)).toDF("rid", "rs", "re")
    val joined = TemporalJoin.intervalOverlapJoin(left, right, "ls", "le", "rs", "re", 8L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"bucketed overlap join must stay an equi-join:\n$plan")
  }
}
