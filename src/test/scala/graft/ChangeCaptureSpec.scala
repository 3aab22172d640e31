package graft

import graft.operators.ChangeCapture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChangeCaptureSpec extends SparkTestBase {
  import spark.implicits._

  private def changes = Seq(
    (1L, 10L, 100L, "a"),
    (1L, 20L, 101L, "b"),
    (1L, 20L, 102L, "b2"), // tie on time, broken by event id
    (2L, 5L, 103L, "x"),
    (3L, 7L, 104L, "only")
  ).toDF("k", "t", "eid", "v")

  test("scd2 intervals tile each key's timeline with one open current row") {
    val out = ChangeCapture.scd2(changes, Seq("k"), "t", tieBreakers = Seq("eid"))
    // exactly one is_current per key, and it is the max-(t, eid) change
    val current = out.filter(col("is_current")).orderBy("k").collect()
    assert(current.map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq ==
      Seq((1L, "b2"), (2L, "x"), (3L, "only")))
    // intervals chain: valid_to of row i == valid_from of row i+1 per key
    val w = Window.partitionBy("k").orderBy(col("valid_from"), col("eid"))
    val broken = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(!col("is_current") && (col("valid_to") =!= col("next_from")))
      .count()
    assert(broken == 0, "closed intervals must chain to the next version")
    assert(out.count() == changes.count(), "one interval per change, none dropped")
  }

  test("scd2 refuses output-column collisions") {
    val bad = changes.withColumnRenamed("v", "valid_to")
    val e = intercept[IllegalArgumentException] {
      ChangeCapture.scd2(bad, Seq("k"), "t")
    }
    assert(e.getMessage.contains("valid_to"))
  }

  test("latestSnapshot equals the row_number-window formulation") {
    val got = ChangeCapture.latestSnapshot(changes, Seq("k"), "t", tieBreakers = Seq("eid"))
      .orderBy("k").collect().map(r =>
        (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[Long]("eid"), r.getAs[String]("v")))
    val w = Window.partitionBy("k").orderBy(col("t").desc, col("eid").desc)
    val want = changes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("k").collect().map(r =>
        (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[Long]("eid"), r.getAs[String]("v")))
    assert(got.toSeq == want.toSeq)
  }

  test("latestSnapshot combines map-side — partial_max_by below the exchange, no window") {
    val plan = ChangeCapture.latestSnapshot(changes, Seq("k"), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"snapshot must not window full history:\n$plan")
    // struct-valued max_by plans as SortAggregate (per-partition sort on
    // the GROUP KEY only); the load-bearing property is the partial
    // aggregate BELOW the exchange — each map task reduces its slice to
    // one row per local key, so the shuffle carries keys, not history
    val exchangeAt = plan.indexOf("Exchange")
    val partialAt = plan.indexOf("partial_max_by")
    assert(exchangeAt >= 0 && partialAt > exchangeAt,
      s"expected partial_max_by on the map side (below Exchange):\n$plan")
  }

  private def componentRows(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Long)] =
    df.collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

  test("additive components: merge of splits equals from-scratch, in any association order") {
    val data = (0 until 900).map(i => (s"k${i % 3}", (i % 47).toDouble))
      .toDF("k", "v")
    val full = componentRows(ChangeCapture.additiveComponents(data, Seq("k"), "v"))
    val Seq(a, b, c) = Seq(data.limit(300),
      data.offset(300).limit(300), data.offset(600))
      .map(ChangeCapture.additiveComponents(_, Seq("k"), "v"))
    val leftAssoc = componentRows(ChangeCapture.mergeComponents(
      ChangeCapture.mergeComponents(a, b, Seq("k")), c, Seq("k")))
    val rightAssoc = componentRows(ChangeCapture.mergeComponents(
      a, ChangeCapture.mergeComponents(b, c, Seq("k")), Seq("k")))
    assert(leftAssoc == full, "maintained != recomputed")
    assert(rightAssoc == full, "merge must be associative")
  }

  test("retraction: merging a negated delta restores the base components") {
    val base = (0 until 200).map(i => (s"k${i % 2}", i.toDouble)).toDF("k", "v")
    val delta = (0 until 60).map(i => (s"k${i % 2}", (i * 3).toDouble)).toDF("k", "v")
    val cBase = ChangeCapture.additiveComponents(base, Seq("k"), "v")
    val cDelta = ChangeCapture.additiveComponents(delta, Seq("k"), "v")
    val applied = ChangeCapture.mergeComponents(cBase, cDelta, Seq("k"))
    val retracted = ChangeCapture.mergeComponents(
      applied, ChangeCapture.negateComponents(cDelta), Seq("k"))
    assert(componentRows(retracted) == componentRows(cBase),
      "negate + merge must subtract the delta exactly")
  }

  test("snapshotDiff: added/removed/changed/unchanged; null payloads compare null-safely") {
    val oldSnap = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (5L, Option.empty[String]), (6L, Option.empty[String]))
      .toDF("id", "payload")
    val newSnap = Seq(
      (1L, Option("a")), (2L, Option("B")), (4L, Option("d")),
      (5L, Option("now set")), (6L, Option.empty[String]))
      .toDF("id", "payload")
    val got = ChangeCapture.snapshotDiff(oldSnap, newSnap, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "changed",   // null → value is a CHANGE, not an add or a crash
      6L -> "unchanged"  // null → null is no change
    ), s"got $got")
  }
}
