package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  private def writeEvents(maxRecords: Long): String = {
    val out = tmpDir("layout") + "/events"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("tus", unix_micros(col("ts")))
    Layout.writeClustered(ev, out,
      partitionCols = Seq("event_type"), sortCols = Seq("tus"),
      maxRecordsPerFile = maxRecords)
    out
  }

  test("partition layout: equality filter prunes to PartitionFilters, only matching dirs read") {
    val out = writeEvents(0)
    val scan = spark.read.parquet(out).filter(col("event_type") === "click")
    val n = scan.count()
    assert(n > 0)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"equality on the partition column must prune directories:\n$plan")
    // execution-level evidence: every row came from the pruned directory
    val files = scan.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_type=click")))
    // round trip is lossless
    assert(spark.read.parquet(out).count() ==
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("sorted layout: per-file min/max ranges are disjoint, so range predicates skip files") {
    val out = writeEvents(200) // force several files per partition
    val ranges = spark.read.parquet(out)
      .filter(col("event_type") === "click")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("tus")).as("lo"), max(col("tus")).as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length >= 2, "maxRecordsPerFile must have split the partition")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $ranges — sort order lost across the split")
      case _ =>
    }
    // and the range predicate reaches the scan as a pushed filter
    val q = spark.read.parquet(out)
      .filter(col("event_type") === "click" && col("tus") < ranges.head._2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"range predicate must push to the parquet scan:\n$plan")
  }

  test("z-ordered layout bounds per-file spans on BOTH dimensions; linear sort only on one") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    // per-file normalized span of a dimension: mean over files of
    // (max - min) / global_range — 1.0 means every file spans everything
    def meanSpan(path: String, dim: String): Double = {
      val global = li.agg(
        (max(col(dim)) - min(col(dim))).cast("double")).head().getDouble(0)
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col(dim)) - min(col(dim))).cast("double") / global).as("s"))
        .agg(avg(col("s"))).head().getDouble(0)
      spans
    }
    val zPath = tmpDir("layout") + "/z"
    Layout.writeZOrdered(li, zPath, "l_partkey", "l_suppkey", numFiles = 16)
    val linPath = tmpDir("layout") + "/lin"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(linPath)
    assert(spark.read.parquet(zPath).count() == li.count(), "z-write is lossless")
    val (zA, zB) = (meanSpan(zPath, "l_partkey"), meanSpan(zPath, "l_suppkey"))
    val (lA, lB) = (meanSpan(linPath, "l_partkey"), meanSpan(linPath, "l_suppkey"))
    // the linear layout serves only its sort column: the second
    // dimension degenerates to (near-)full-range files
    assert(lA < 0.2, s"linear sort should bound its own column (got $lA)")
    assert(lB > 0.8, s"fixture sanity: suppkey should be unclustered under partkey sort (got $lB)")
    // the curve bounds BOTH: each dimension's mean span must be well
    // under the linear layout's unserved dimension
    assert(zA < 0.5 && zB < 0.5,
      s"z-order must bound both dims: partkey $zA, suppkey $zB vs linear ($lA, $lB)")
  }
}
