package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage attribution for x14_curate (r13 verdict item 6): replays the
  * registry query's four-stage composition — admission gate → LSH
  * near-dup pairs + exact verify → connected components → canonical
  * keep — with a timer and a materialization barrier around each,
  * twice (run 2 = steady state), so the ~3.5 s at sf0.1 decomposes
  * into stages instead of being argued about. Compare each stage to
  * its STANDALONE registry sibling (t11 / d6 / d8 / d12): a stage that
  * costs far more here than standalone is a composition bug (lost
  * cache, re-derived scan); a stage matching its sibling means the
  * composition is just the honest sum.
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.CurateProbe
  */
object CurateProbe {
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
    (1 to 2).foreach { round =>
      println(s"[x14] ---- round $round")
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[x14] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // stage 1 — admission (standalone sibling: t11_admission)
      val admitted = graft.operators.TextAnalysis.admissionGate(docs)
        .filter(col("admit"))
        .select(col("doc_id"), col("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("stage_admit (gate+filter, persisted)") { admitted.count() }
      // stage 2 — LSH pair generation + exact verify (sibling: d6)
      val pairs = graft.operators.Dedup.nearDupPairs(admitted, "doc_id", "text",
          threshold = 0.5, k = 3, numHashes = 32, bands = 8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("stage_pairs (LSH+verify)") { pairs.count() }
      // stage 3 — connected components (sibling: d8)
      val comps = graft.operators.Dedup.nearDupComponents(admitted, "doc_id", pairs)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("stage_comps (connected components)") { comps.count() }
      // stage 4 — canonical keep + ordered output (sibling: d12)
      time("stage_keep (canonical+order)") {
        graft.operators.Dedup.keepCanonical(admitted, "doc_id", comps)
          .select(col("doc_id")).orderBy(col("doc_id")).count()
      }
      admitted.unpersist(); pairs.unpersist(); comps.unpersist()
      graft.CachePool.releaseAll()
    }
    spark.stop()
  }
}
