package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Latency attribution for t30_bpe_train (registry cost #2 at r13):
  * times the initial vocabulary aggregate separately from the 10
  * argmax-and-rewrite rounds, twice (run 2 = steady state), to show
  * whether the cost is data or per-round job-scheduling floor.
  * Usage: runMain graft.tools.BpeTrainProbe
  */
object BpeTrainProbe {
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
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      var t0 = System.nanoTime()
      val table = graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = 10)
      val n = table.count()
      val total = (System.nanoTime() - t0) / 1e9
      // vocab staging alone, for the subtraction
      t0 = System.nanoTime()
      val v = graft.operators.TextAnalysis
        .withTokens(docs.select(col("text")), "text")
        .select(explode(col("_toks")).as("_w0"))
        .filter(col("_w0") =!= "")
        .groupBy(col("_w0")).agg(count(lit(1)).as("f"))
      val vocabN = v.count()
      val vocabSec = (System.nanoTime() - t0) / 1e9
      println(f"[t30] run$round: total=$total%.2f s ($n rules), vocab_agg=$vocabSec%.2f s " +
        f"($vocabN words), rounds=${total - vocabSec}%.2f s (~${(total - vocabSec) / 10}%.3f s/round)")
      graft.CachePool.releaseAll()
    }
    spark.stop()
  }
}
