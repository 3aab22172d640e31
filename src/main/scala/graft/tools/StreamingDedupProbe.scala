package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisection probe for the round-9 streaming-dedup throughput question:
  * times [[graft.Bench.benchStreamingDedup]] (and optionally the
  * index-growth probe) in a FRESH JVM, with an optional heavy prelude
  * that replays the bench-process state the full run accumulates
  * (registry queries + scale probes) before the streaming section.
  *
  * Usage: runMain graft.tools.StreamingDedupProbe [prelude] [growth]
  *   prelude — first run a heap/JIT-heavy slice of the registry twice
  *             (mimics the full bench's JVM state at the point the
  *             streaming sections execute)
  *   growth  — also run the 1x/5x/25x index-growth probe
  *
  * Fresh-JVM vs prelude numbers on the same build separate "the
  * operator got slower" from "the bench process got slower around it".
  */
object StreamingDedupProbe {
  def main(args: Array[String]): Unit = {
    val flags = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    if (flags("prelude")) {
      // heaviest registry families, min-of-2 like the real bench loop
      val names = Seq("x14_curate", "d9_neardup_groups_logstar", "m6_phash",
        "a13_approx_distinct", "d15_boilerplate", "x21_dsir_score", "s12_ivf_pq",
        "e10_interpolate", "t12_tfidf", "d3_lsh_buckets")
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        (1 to 2).foreach { _ =>
          try graft.Bench.fullCount(fn(spark, sfDir))
          finally graft.CachePool.releaseAll()
        }
      }
      println(s"[probe] prelude done (${names.size} queries x2)")
    }
    if (flags("ann")) {
      println("[probe] ann: " + graft.Bench.benchAnnQuality(spark))
      spark.stop()
      return
    }
    val nSeg = sys.env.getOrElse("SPARK_GRAFT_PROBE_SEGMENTS", "8").toInt
    (1 to 3).foreach { i =>
      val out = graft.Bench.benchStreamingDedup(spark, sfDir, nSegments = nSeg)
      println(s"[probe] streaming_dedup run$i: $out")
    }
    if (flags("growth"))
      println("[probe] growth: " + graft.Bench.benchStreamingDedupGrowth(spark, sfDir))
    spark.stop()
  }
}
