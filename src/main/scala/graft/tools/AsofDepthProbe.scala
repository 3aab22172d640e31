package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: plain asofJoin vs asofJoinSkew wall time as a function
  * of hot-key DEPTH (rows on one key) — finds the crossover where the
  * plain window's single-task sort starts losing to the ranged split. */
object AsofDepthProbe {
  def main(args: Array[String]): Unit = {
    val depths = if (args.nonEmpty) args(0).split(',').map(_.toLong).toSeq
      else Seq(100000L, 400000L, 1600000L, 4000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- depths) {
      val clicks = spark.range(n).select(
        lit(-1L).as("user_id"), (col("id") * 4L).as("tus"),
        (col("id") % 1000L).cast("double").as("last_click_value")).persist()
      val purchases = spark.range(n / 4).select(
        col("id").as("event_id"), lit(-1L).as("user_id"),
        (col("id") * 16L + 1L).as("tus")).persist()
      clicks.count(); purchases.count()
      def time(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val span = n * 4L
      val width = math.max(1L, span / 128)
      // toRdd.count forces EVERY output column (count() lets Catalyst
      // prune the window carry and even the union's right branch)
      def plain() = graft.operators.TemporalJoin
        .asofJoin(purchases, clicks, Seq("user_id"), "tus", "tus")
        .queryExecution.toRdd.count()
      def split() = graft.operators.TemporalJoin
        .asofJoinSkew(purchases, clicks, Seq("user_id"), "tus", "tus", width)
        .queryExecution.toRdd.count()
      plain(); split()
      val tp = math.min(time(plain()), time(plain()))
      val ts = math.min(time(split()), time(split()))
      println(f"DEPTH $n%9d  plain=$tp%7.3f s  split=$ts%7.3f s  width=$width")
      clicks.unpersist(); purchases.unpersist()
    }
    spark.stop()
  }
}
