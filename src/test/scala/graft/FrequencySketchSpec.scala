package graft

import graft.functions.CmsEstimate
import graft.operators.FrequencySketch
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

class FrequencySketchSpec extends SparkTestBase {
  import spark.implicits._

  test("planted heavy hitter surfaces with exact count and the CMS bound intact") {
    val items = (Seq.fill(500)("hot") ++ (0 until 2000).map(i => s"tail${i % 400}"))
      .zipWithIndex.map(_.swap)
    val df = items.toDF("id", "item")
    val rows = FrequencySketch.heavyHittersVerified(df, "item", k = 10,
      eps = 0.01, confidence = 0.999).collect()
    assert(rows.head.getString(0) == "hot" && rows.head.getLong(1) == 500)
    assert(rows.forall(_.getBoolean(2)), "CMS bound violated on the shortlist")
  }

  test("estimates never undercount: est >= true for EVERY distinct item") {
    val df = (0 until 3000).map(i => (i, s"k${i % 97}")).toDF("id", "item")
    val sk = df.agg(count_min_sketch(col("item"), lit(0.01), lit(0.99), lit(42)))
      .collect()(0).getAs[Array[Byte]](0)
    val bad = df.groupBy(col("item")).agg(count(lit(1)).as("true_cnt"))
      .withColumn("est", GraftSqlBridge.column(CmsEstimate(
        GraftSqlBridge.expression(col("item")), sk)))
      .filter(col("est") < col("true_cnt"))
      .count()
    assert(bad == 0, "count-min counters only sum — an undercount means the read path hashes differently from the build path")
  }

  test("sketch is partitioning-invariant: counter sums commute across layouts") {
    val df = (0 until 3000).map(i => (i, s"k${i % 97}")).toDF("id", "item")
    def estimatesAt(parts: Int): Seq[(String, Long)] = {
      val sk = df.repartition(parts)
        .agg(count_min_sketch(col("item"), lit(0.01), lit(0.99), lit(42)))
        .collect()(0).getAs[Array[Byte]](0)
      df.select(col("item")).distinct()
        .withColumn("est", GraftSqlBridge.column(CmsEstimate(
          GraftSqlBridge.expression(col("item")), sk)))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    }
    assert(estimatesAt(1) == estimatesAt(13),
      "merging per-partition grids must equal the single-partition build")
  }

  test("row-form CMS: each depth row partitions the stream; estimates never undercount; unseen items read 0") {
    val df = (0 until 3000).map(i => (i, s"k${i % 97}")).toDF("id", "item")
    val cells = FrequencySketch.cmsCells(df, "item", depth = 4, hexChars = 2)
    // every depth row is a complete partition of the item stream
    val perD = cells.groupBy(col("d")).agg(sum(col("cnt")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perD == (0 until 4).map(_ -> 3000L).toMap, s"got $perD")
    // never-undercount over EVERY distinct item
    val truth = df.groupBy(col("item")).agg(count(lit(1)).as("true_cnt"))
    val bad = FrequencySketch.cmsEstimate(cells, truth, "item", depth = 4, hexChars = 2)
      .filter(col("est") < col("true_cnt")).count()
    assert(bad == 0, "row-form counters only sum")
    // an item the grid never saw estimates 0 only if ALL its cells are
    // untouched; with a near-full 256-cell grid that is not guaranteed,
    // so pin the semantics on an empty grid instead
    val empty = FrequencySketch.cmsCells(df.filter(lit(false)), "item", depth = 4, hexChars = 2)
    val unseen = FrequencySketch.cmsEstimate(
      empty, Seq(("ghost", 0L)).toDF("item", "true_cnt"), "item", depth = 4, hexChars = 2)
      .collect().head.getAs[Long]("est")
    assert(unseen == 0L, "missing cells coalesce to 0 — a provably-unseen item")
  }

  test("row-form CMS cells are partitioning-invariant (the additive-merge precondition)") {
    val df = (0 until 3000).map(i => (i, s"k${i % 97}")).toDF("id", "item")
    def cellsAt(parts: Int): Set[(Int, String, Long)] =
      FrequencySketch.cmsCells(df.repartition(parts), "item", depth = 3, hexChars = 2)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(cellsAt(1) == cellsAt(13),
      "cell counts are a decomposable aggregate — layout cannot change them")
  }
}
