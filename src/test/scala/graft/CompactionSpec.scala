package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction collapses a small-files directory, content preserved exactly") {
    val in = tmpDir("graft-compact-in")
    val out = tmpDir("graft-compact-out") + "/c"
    (0 until 5000).map(i => (i.toLong, s"row $i"))
      .toDF("id", "v").repartition(60)
      .write.mode("overwrite").parquet(in)
    val (_, nInFiles) = Compaction.dirStats(spark, in)
    assert(nInFiles >= 60)

    val (nIn, nOut) = Compaction.compactParquet(spark, in, out, targetFileBytes = 64L * 1024 * 1024)
    assert(nIn == nInFiles)
    assert(nOut <= 2, s"expected ~1 file, got $nOut")

    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("coalesce mode plans no exchange; repartition mode rebalances") {
    val in = tmpDir("graft-compact-in2")
    (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(16)
      .write.mode("overwrite").parquet(in)
    val df = spark.read.parquet(in)
    val noShuffle = df.coalesce(2).queryExecution.executedPlan.toString
    assert(!noShuffle.contains("Exchange"), noShuffle)
    val withShuffle = df.repartition(2).queryExecution.executedPlan.toString
    assert(withShuffle.contains("Exchange"), withShuffle)
    // both modes produce the requested file count
    val outA = tmpDir("graft-compact-outA") + "/c"
    val outB = tmpDir("graft-compact-outB") + "/c"
    assert(Compaction.compactParquet(spark, in, outA, 1L << 30, shuffle = false)._2 == 1)
    assert(Compaction.compactParquet(spark, in, outB, 1L << 30, shuffle = true)._2 == 1)
  }

  test("targetFileBytes controls output file count from actual input bytes") {
    val in = tmpDir("graft-compact-in3")
    (0 until 20000).map(i => (i.toLong, ("x" * 100) + i)).toDF("id", "v").repartition(40)
      .write.mode("overwrite").parquet(in)
    val (bytes, _) = Compaction.dirStats(spark, in)
    val target = bytes / 4 // ask for ~4 output files
    val out = tmpDir("graft-compact-out3") + "/c"
    val (_, nOut) = Compaction.compactParquet(spark, in, out, target)
    assert(nOut >= 3 && nOut <= 6, s"expected ~4-5 files, got $nOut")
  }
}
