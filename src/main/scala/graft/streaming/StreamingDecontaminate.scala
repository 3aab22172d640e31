package graft.streaming

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming decontamination: every arriving micro-batch of documents is
  * checked against a STATIC eval/benchmark set before it is admitted to
  * the training corpus — the ingest-time form of
  * [[graft.operators.Dedup.crossNearDupPairs]].
  *
  * The eval set is fixed and small relative to the stream; [[start]]
  * caches it so each batch re-derives its buckets from memory rather
  * than storage. Per-batch cost is one signature pass over the batch
  * plus a bucket-local join against the eval buckets — independent of
  * how much stream history has gone by (nothing is accumulated;
  * contrast with [[StreamingLshDedup]], which grows an index of the
  * stream itself).
  *
  * Exactly-once: batchId marker files make the flagged-pairs append
  * idempotent under micro-batch replay. */
class StreamingDecontaminate(
    flaggedDir: String,
    k: Int = 3,
    numHashes: Int = 32,
    bands: Int = 8,
    threshold: Double = 0.5)
    extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(flaggedDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(batchId: Long) = new Path(s"$flaggedDir/_applied_$batchId")

  /** Flag batch docs leaking eval content; append (id_a = eval doc,
    * id_b = stream doc, jaccard) to `flaggedDir`. */
  def processBatch(spark: SparkSession, evalSet: DataFrame, batch: DataFrame, batchId: Long): Unit = {
    val f = fs(spark)
    if (f.exists(marker(batchId))) return // replay after recovery: no-op
    // persistStaged = false: a micro-batch is a fresh plan every trigger,
    // so CacheManager could never dedupe the staged frames — persisting
    // here would leak one cached shingle frame per batch for the
    // query's lifetime (see the staging note in crossNearDupPairs);
    // recomputing a small batch's shingles per consumer is the cheaper
    // side of the trade
    Dedup.crossNearDupPairs(
        corpus = batch, probes = evalSet, "doc_id", "text",
        threshold, k, numHashes, bands, persistStaged = false)
      .write.mode(SaveMode.Append).parquet(s"$flaggedDir/data")
    f.create(marker(batchId), true).close()
  }

  /** Hook a document stream (columns doc_id, text) to be screened
    * against `evalSet`. */
  def start(
      spark: SparkSession,
      evalSet: DataFrame,
      docStream: DataFrame,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val cachedEval = evalSet.persist()
    val w = docStream.writeStream
      .queryName("graft_stream_decontaminate")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, cachedEval, batch, batchId)
        ()
      }
    val query = (if (availableNow) w.trigger(Trigger.AvailableNow())
     else w.trigger(Trigger.ProcessingTime("1 second"))).start()
    // lifecycle: the eval cache lives exactly as long as the query
    val release = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          cachedEval.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(release)
    query
  }
}
