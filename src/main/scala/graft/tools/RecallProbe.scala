package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: LSH near-dup pair count at a given sf dir under several
  * banding configs — validates the d6 recall-1.0 precondition on larger
  * fixtures than the driver gate runs. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    for ((nh, b) <- Seq((32, 8), (64, 16), (96, 24))) {
      val n = graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text", 0.5, 3, nh, b).count()
      println(s"CONFIG numHashes=$nh bands=$b -> pairs=$n")
    }
    spark.stop()
  }
}
