package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Bench, GraftSession}

/** Runs ONLY [[Bench.benchScale]] — the iterate-on-the-scale-section
  * loop (the full `graft.Bench` pays the whole registry first).
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ScaleProbe"` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    println("SCALE>>> " + Bench.benchScale(spark, sfDir))
    spark.stop()
  }
}
