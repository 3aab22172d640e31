package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for d21_containment (r12 verdict item 6): replays
  * [[graft.operators.Dedup.containmentPairs]]'s stages with a timer and
  * a materialization barrier around each, twice (run 2 = steady state),
  * so the 3 s at sf0.1 decomposes into staging / dfreq / candidate
  * self-join / bound filter / exact recount instead of being argued
  * about. Usage: runMain graft.tools.ContainmentProbe
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val (k, threshold, maxShingleDf) = (3, 0.6, 64)
    (1 to 2).foreach { round =>
      println(s"[d21] ---- round $round")
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[d21] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val sh = graft.operators.Dedup.stagedShingles(docs, "doc_id", "text", k)
        .select(col("doc_id"), explode(col("_sh")).as("_g"))
        .select(col("doc_id"), xxhash64(col("_g")).as("_h"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("stage_sh (shingle+distinct)") { sh.count() }
      val dfreq = sh.groupBy(col("_h")).agg(count(lit(1)).as("_df"))
      val rare = sh.join(dfreq.filter(col("_df") <= maxShingleDf), Seq("_h"))
        .select(col("doc_id"), col("_h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("stage_rare (dfreq+cap join)") { rare.count() }
      val stats = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("_na"))
        .join(rare.groupBy(col("doc_id")).agg(count(lit(1)).as("_nr")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("_na"),
          (col("_na") - coalesce(col("_nr"), lit(0L))).as("_nu"))
        .persist()
      time("stage_stats") { stats.count() }
      val interRare = rare.select(col("_h"), col("doc_id").as("id_a"))
        .join(rare.select(col("_h"), col("doc_id").as("id_b")), Seq("_h"))
        .filter(col("id_a") =!= col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("_ir"))
        .persist()
      time("stage_interRare (rare self-join + count)") { interRare.count() }
      val survivors = interRare
        .join(stats.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
        .filter((col("_ir") + col("_nu")).cast("double") / col("_na").cast("double")
          >= threshold)
        .select(col("id_a"), col("id_b"), col("_na"))
        .persist()
      time("stage_survivors (bound filter)") { survivors.count() }
      time("stage_recount (exact verify)") {
        survivors
          .join(sh.select(col("doc_id").as("id_a"), col("_h")), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("_h")), Seq("id_b", "_h"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("_inter"), max(col("_na")).as("_na"))
          .withColumn("containment",
            col("_inter").cast("double") / col("_na").cast("double"))
          .filter(col("containment") >= threshold)
          .count()
      }
      sh.unpersist(); rare.unpersist(); stats.unpersist()
      interRare.unpersist(); survivors.unpersist()
      graft.CachePool.releaseAll()
    }
    spark.stop()
  }
}
