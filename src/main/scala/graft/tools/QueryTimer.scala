package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, CachePool, GraftSession, SparkEntry}

/** Targeted per-query timer for perf iteration — the same discipline as
  * [[graft.Bench]] (full-output materialization via
  * `queryExecution.toRdd.count()`, min of 2 cache-dropped runs, GC
  * between queries) on just the named registry queries, so a single
  * query's before/after can be measured without paying the full
  * 140-query bench.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.QueryTimer
  * e10_interpolate j14_nearest_asof"`.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "QueryTimer: pass registry query names as args")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"QueryTimer: unknown queries: ${unknown.mkString(", ")}")
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
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      System.gc()
      def run(): Double = {
        try {
          val t0 = System.nanoTime()
          Bench.fullCount(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } finally CachePool.releaseAll()
      }
      val sec = math.min(run(), run())
      println(f"[timer] $name%-28s $sec%.3f s")
    }
    spark.stop()
  }
}
