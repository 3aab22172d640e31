package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Cross-batch streaming near-duplicate detection: each micro-batch of
  * documents is checked against the ACCUMULATED corpus via the banded
  * MinHash-LSH index, then its own buckets are appended to the index —
  * history is never reprocessed.
  *
  * Index layout: an append-only parquet table of (doc_id, band, bucket,
  * _sh) rows, PARTITIONED by `_bp = pmod(xxhash64(band, bucket),
  * indexParts)` — the bucket-hash-range layout a huge accumulated
  * index needs, as code rather than a comment (the r9 growth probe's
  * scaladoc promised it). Per batch the work is:
  *   new-docs buckets (one narrow signature pass)
  *   → distinct `_bp` set of the batch (≤ indexParts ints, driver-side)
  *   ⋈ index on (band, bucket), scan pruned to those partitions
  *   → Jaccard verify on the bounded candidate set
  *   → append this batch's bucket rows under their partitions.
  * A batch touching few partitions reads a FRACTION of the index
  * (StreamingSpec pins the PartitionFilters in the plan); a batch
  * covering every partition degrades gracefully to the full scan.
  * Batch cost scales with batch size × bucket occupancy, independent
  * of corpus length.
  *
  * `indexParts` DEFAULTS TO 1 (single partition ≡ the flat layout):
  * partition pruning pays when the accumulated index dwarfs per-batch
  * bucket coverage — the 100 TB regime, where hundreds of partitions
  * against small batches cut the scan by orders of magnitude. At the
  * local bench scale it strictly costs: 16-way partitioning measured
  * ~35% throughput loss on the sf0.1 8-batch drain (16× the files per
  * append, footer/listing overhead, zero pruning because a 5000-doc
  * batch's 8 bands hash into every partition). Size it like shuffle
  * partitions: target batch-bucket coverage ≪ indexParts ≪ file-count
  * budget.
  *
  * Exactly-once: batchId-named marker files make the append idempotent
  * under micro-batch replay (same contract as ParquetKpiStore). */
class StreamingLshDedup(
    indexDir: String,
    matchesDir: String,
    k: Int = 3,
    numHashes: Int = 32,
    bands: Int = 8,
    threshold: Double = 0.5,
    indexParts: Int = 1)
    extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(batchId: Long) = new Path(s"$indexDir/_applied_$batchId")

  /** Buckets + shingles for a document batch (one pass), tagged with
    * the index partition each bucket row lands in. */
  private[graft] def bucketed(docs: DataFrame): DataFrame = {
    val staged = TextAnalysis.withShingles(
      docs.select(col("doc_id"), col("text")), "text", k)
      .withColumn("_sig", Dedup.minhashSignatureFromShingles(col("_sh"), numHashes))
    staged
      .select(col("doc_id"), col("_sh"),
        explode(Dedup.bandHashes(col("_sig"), numHashes, bands)).as("bh"))
      .select(col("doc_id"), col("_sh"),
        col("bh.band").as("band"), col("bh.bucket").as("bucket"))
      .withColumn("_bp", pmod(xxhash64(col("band"), col("bucket")), lit(indexParts)).cast("int"))
  }

  /** The accumulated index read PRUNED to the partitions `newBuckets`
    * can possibly join into — `_bp` is a partition column and the IN
    * list is literal, so the cut happens at file-listing time
    * (PartitionFilters on the scan), never as a post-scan filter. */
  private[graft] def prunedIndex(
      spark: SparkSession, newBuckets: DataFrame): DataFrame = {
    // single-partition layout: the distinct-collect prune job would be
    // a per-batch no-op costing a Spark job — skip it (measured ~10%
    // of drain wall at the bench scale)
    if (indexParts <= 1) return spark.read.parquet(s"$indexDir/data")
    val parts = newBuckets.select(col("_bp")).distinct()
      .collect().map(_.getInt(0)) // bounded: ≤ indexParts values
    spark.read.parquet(s"$indexDir/data")
      .filter(col("_bp").isin(parts.toSeq: _*))
  }

  /** Process one micro-batch: emit (new_doc_id, dup_of_doc_id, jaccard)
    * matches against the accumulated index, then append the batch. */
  def processBatch(spark: SparkSession, docs: DataFrame, batchId: Long): Unit = {
    val f = fs(spark)
    if (f.exists(marker(batchId))) return // replay after recovery: no-op
    val newBuckets = bucketed(docs).persist()
    try {
      val indexExists = f.exists(new Path(s"$indexDir/data"))
      if (indexExists) {
        val index = prunedIndex(spark, newBuckets)
        val cands = newBuckets.as("n")
          .join(index.as("o"),
            col("n.band") === col("o.band") && col("n.bucket") === col("o.bucket") &&
              col("n.doc_id") =!= col("o.doc_id"))
          .select(col("n.doc_id").as("new_id"), col("n._sh").as("_sn"),
            col("o.doc_id").as("old_id"), col("o._sh").as("_so"))
          .distinct()
        val matches = cands
          .withColumn("jaccard", Dedup.jaccardFromShingles(col("_sn"), col("_so")))
          .filter(col("jaccard") >= threshold)
          .select(col("new_id"), col("old_id"), col("jaccard"))
        matches.write.mode(SaveMode.Append).parquet(matchesDir)
      } else {
        // first batch: still dedup within the batch itself
        val cands = newBuckets.as("a")
          .join(newBuckets.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("b.doc_id").as("new_id"), col("b._sh").as("_sn"),
            col("a.doc_id").as("old_id"), col("a._sh").as("_so"))
          .distinct()
        cands
          .withColumn("jaccard", Dedup.jaccardFromShingles(col("_sn"), col("_so")))
          .filter(col("jaccard") >= threshold)
          .select(col("new_id"), col("old_id"), col("jaccard"))
          .write.mode(SaveMode.Append).parquet(matchesDir)
      }
      // index rows carry the shingle array for the verify join; the
      // 100 TB variant stores only the minhash signature (estimated
      // jaccard) or joins back to a document store for exact verify
      newBuckets.write.mode(SaveMode.Append)
        .partitionBy("_bp").parquet(s"$indexDir/data")
      f.create(marker(batchId), true).close()
    } finally newBuckets.unpersist()
  }

  /** Hook a text-document stream (columns doc_id, text) into the
    * incremental dedup. */
  def start(
      spark: SparkSession,
      docStream: DataFrame,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val w = docStream.writeStream
      .queryName("graft_stream_dedup")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId)
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow())
     else w.trigger(Trigger.ProcessingTime("1 second"))).start()
  }
}
