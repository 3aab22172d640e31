package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming per-user distinct-item count — batch `e12`'s END STATE
  * ("unique items to date", final row per user), maintained
  * incrementally. The deliberately instructive contrast to
  * [[StreamingTransitions]] and [[StreamingRetention]]: those
  * aggregates are ORDER-SENSITIVE, so late data forces exact
  * retraction machinery (multiset diffs, revision cascades). A
  * distinct count's state is a grow-only set — union COMMUTES — so
  * ANY arrival order converges to the same state with no retraction,
  * no watermark compaction, no revision path at all. When a pipeline
  * gets to choose its state representation, choosing a commutative
  * one buys this entire class of machinery for free (the CRDT
  * G-Set argument, applied to stream aggregation).
  *
  * State per user is bounded by the per-user distinct-item domain
  * (the item vocabulary, NOT the event count); emission is one
  * current-count row per touched user per batch, folded through the
  * last-write-wins store merge ([[ParquetKpiStore.mergeReplace]] —
  * a monotone count is a revision, not an addition). Exactly-once
  * via the per-(table, batchId) idempotence watermark, as every sink
  * here. */
object StreamingDistinct {

  /** Per-user state: the distinct items seen (sorted for a stable
    * encoder round-trip; semantics are the SET). */
  case class UserItems(items: Seq[Int])

  /** Current distinct count for a user whose set grew this batch. */
  case class DCount(userId: Long, nDistinct: Long)

  private[graft] def processUser(
      userId: Long,
      rows: Iterator[(Long, Int)],
      state: GroupState[UserItems]): Iterator[DCount] = {
    val incoming = rows.map(_._2).toSet
    val s0 = if (state.exists) state.get.items.toSet else Set.empty[Int]
    val fresh = incoming -- s0
    if (fresh.isEmpty) Iterator.empty
    else {
      val all = s0 ++ fresh
      state.update(UserItems(all.toSeq.sorted))
      Iterator(DCount(userId, all.size.toLong))
    }
  }

  /** Delta stream over an events frame (user_id, props JSON carrying
    * the item id at $.k — the j17/e12 item convention). */
  def deltaStream(events: DataFrame): Dataset[DCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(processUser)
  }

  private val table = "distinct_counts"

  private def applyBatch(store: ParquetKpiStore)(
      batch: Dataset[DCount], batchId: Long): Unit = {
    val spark = batch.sparkSession
    store.mergeReplace(spark, table, Seq("user_id"),
      batch.groupBy(col("userId").as("user_id"))
        .agg(max(col("nDistinct")).as("n_distinct")),
      batchId)
  }

  def start(
      spark: SparkSession,
      events: DataFrame,
      store: ParquetKpiStore,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val w = deltaStream(events).writeStream
      .queryName("graft_stream_distinct")
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch(store) _)
    (if (availableNow) w.trigger(Trigger.AvailableNow())
     else w.trigger(Trigger.ProcessingTime("1 second"))).start()
  }

  /** (user_id, n_distinct), the final curve point per user. */
  def distinctTable(spark: SparkSession, store: ParquetKpiStore): DataFrame =
    store.read(spark, table)
      .getOrElse(spark.emptyDataFrame)
      .orderBy(col("user_id"))
}
