package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for d24_prefix_pairs (registry cost #1 at r13):
  * replays [[graft.operators.Dedup.prefixFilterPairs]]'s stages with a
  * materialization barrier each, twice (run 2 = steady state).
  * Usage: runMain graft.tools.PrefixPairsProbe
  */
object PrefixPairsProbe {
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
    import org.apache.spark.sql.expressions.Window
    val (tNum, tDen, k) = (1, 2, 3)
    (1 to 2).foreach { round =>
      println(s"[d24] ---- round $round")
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[d24] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val staged = graft.operators.Dedup.stagedShingles(docs, "doc_id", "text", k)
      val ig = staged.select(col("doc_id"), explode(array_distinct(col("_sh"))).as("_g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("stage_ig (shingle explode)") { ig.count() }
      val dfreq = ig.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
      val sizes = ig.groupBy(col("doc_id")).agg(count(lit(1)).as("_n"))
      val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("_df"), col("_g"))
      val prefixes = ig
        .join(dfreq, Seq("_g"))
        .join(sizes, Seq("doc_id"))
        .withColumn("_r", row_number().over(byRarity))
        .filter(col("_r") <=
          col("_n") - expr(s"(_n * $tNum + ${tDen - 1}) div $tDen") + 1)
        .select(col("doc_id"), col("_n"), col("_g"))
        .persist()
      time("stage_prefixes (dfreq+sizes joins + rank window)") { prefixes.count() }
      val cands = prefixes
        .select(col("doc_id").as("id_a"), col("_n").as("_na"), col("_g"))
        .join(prefixes.select(col("doc_id").as("id_b"), col("_n").as("_nb"), col("_g")),
          Seq("_g"))
        .filter(col("id_a") < col("id_b") &&
          col("_na") * tDen >= col("_nb") * tNum &&
          col("_nb") * tDen >= col("_na") * tNum)
        .select(col("id_a"), col("id_b"))
        .distinct()
        .persist()
      time("stage_cands (prefix self-join + distinct)") { cands.count() }
      time("stage_verify (exact jaccard on survivors)") {
        graft.operators.Dedup.verifyStagedPairs(cands, staged, staged, "doc_id",
          tNum.toDouble / tDen.toDouble).count()
      }
      ig.unpersist(); prefixes.unpersist(); cands.unpersist()
      graft.CachePool.releaseAll()
    }
    spark.stop()
  }
}
