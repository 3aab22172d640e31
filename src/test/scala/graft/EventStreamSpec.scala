package graft

import graft.sources.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Event-time streaming semantics over the real events fixture
  * (sf0.001): watermarked windows, streaming dedup, stream-static
  * enrichment. */
class EventStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Streaming file sources need a directory: stage the fixture file
    * into a temp dir once for the suite. */
  private lazy val glob: String = {
    val d = tmpDir("events-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  test("source() on an empty glob starts a stream instead of failing schema inference") {
    // legitimate streaming startup state: the input directory exists
    // but no segment has arrived yet (round-9 advice — the footer
    // probe used to throw 'unable to infer schema' here)
    val empty = tmpDir("events-empty-src")
    val src = EventStream.source(spark, empty)
    assert(src.isStreaming, "empty-glob source must still be a streaming frame")
    // fallback branch = legacy nanos-as-long decode → session-zoned ts
    assert(src.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // and it drains as a (zero-batch) stream without error
    val q = src.writeStream.format("noop")
      .option("checkpointLocation", tmpDir("events-empty-cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("watermarked tumbling windows: append emits exactly the finalized windows") {
    val out = tmpDir("evw-out"); val cp = tmpDir("evw-cp")
    EventStream.runWindowedToParquet(spark, glob, "10 minutes", "1 hour", out, cp)
    val got = spark.read.parquet(out)
      .orderBy("window_start", "event_type").collect()

    // batch oracle: same agg, restricted to windows closed by the final
    // watermark (max ts - 1 hour; a window is emitted iff end <= watermark)
    val batch = Tables.events(spark, dir)
    val maxTs = batch.agg(max("ts")).head().getTimestamp(0)
    val watermark = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000L)
    val want = batch
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .filter(col("window.end") <= lit(watermark))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("window_start", "event_type").collect()

    assert(got.length == want.length,
      s"emitted ${got.length} windows, batch-finalized ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Any]("window_start") == w.getAs[Any]("window_start"))
      assert(g.getAs[String]("event_type") == w.getAs[String]("event_type"))
      assert(g.getAs[Long]("cnt") == w.getAs[Long]("cnt"))
    }
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicate keys") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    mem.addData((1L, t(0), "a"), (2L, t(1), "b"), (1L, t(2), "a-dup"), (3L, t(3), "c"))
    val deduped = EventStream.dedupWithinWatermark(
      mem.toDF().toDF("event_id", "ts", "payload"), "1 hour", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_test").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("session-window state rows stay bounded under watermark advance (RocksDB)") {
    // the §2.9 state contract, observed rather than assumed: with a
    // watermark, the store holds only OPEN sessions — closed ones are
    // evicted as the watermark passes their end, so state is O(open
    // sessions), not O(sessions ever created). 40 sessions stream
    // through; the store must never hold more than ~2 batches' worth
    // (eviction lags one batch: a session becomes evictable only once
    // a LATER batch advances the watermark past its end).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def t(min: Int) = new java.sql.Timestamp(base + min * 60000L)
      val users = 0L until 5L
      val sessions = mem.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "2 minutes")
        .groupBy(session_window(col("ts"), "1 minute"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("cnt"))
      val q = sessions.writeStream.format("memory").queryName("sess_state")
        .outputMode("append").start()
      val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
      (0 until 8).foreach { b =>
        // one new session per user per batch, 10 min apart — far beyond
        // the 1 min gap, so every batch closes the previous sessions
        mem.addData(users.map(u => (u, t(10 * b))): _*)
        q.processAllAvailable()
        q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
          .foreach(p => stateRows += p.stateOperators(0).numRowsTotal)
      }
      q.stop()
      assert(stateRows.nonEmpty, "no state-operator progress observed")
      assert(stateRows.max <= 3L * users.size,
        s"state not evicted under watermark advance: $stateRows")
      // and the evicted sessions were EMITTED, not lost: all but the
      // last un-finalized batches appear in the sink
      val emitted = spark.table("sess_state").count()
      assert(emitted >= 5L * 6, s"only $emitted sessions emitted")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming session windows with watermark match the batch session query") {
    val out = tmpDir("sess-out"); val cp = tmpDir("sess-cp")
    val sessions = EventStream.source(spark, glob)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("cnt"))
    val q = sessions.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .select("user_id", "session_start", "cnt")
      .orderBy("user_id", "session_start").collect()

    val batch = Tables.events(spark, dir)
    val maxTs = batch.agg(max("ts")).head().getTimestamp(0)
    val watermark = new java.sql.Timestamp(maxTs.getTime - 3600 * 1000L)
    val want = batch
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("session_window.end") <= lit(watermark))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("cnt"))
      .orderBy("user_id", "session_start").collect()

    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(2) == w.getLong(2))
    }
  }

  test("stream-stream join within time bound matches the batch range join") {
    val src = EventStream.source(spark, glob)
    val joined = EventStream.streamStreamJoin(
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "purchase"),
      "user_id", "1 hour", withinSeconds = 1800)
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj_test")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = Tables.events(spark, dir)
    val want = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_event_id"))
      .join(batch.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_event_id")),
        expr("l_user = r_user AND r_ts > l_ts AND r_ts <= l_ts + interval 1800 seconds"))
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // append emits only watermark-finalized matches: subset of batch,
    // and everything well inside the watermark horizon must be present
    assert(got.subsetOf(want), s"stream emitted ${got.size} pairs not all in batch ${want.size}")
    assert(got.nonEmpty)
    val missing = want -- got
    // only pairs whose finalization the final watermark never reached may be missing
    assert(missing.size < want.size, "stream emitted nothing from the interior")
  }

  test("stream-stream LEFT OUTER join: matches agree with batch, null rows are provably matchless") {
    val src = EventStream.source(spark, glob)
    val joined = EventStream.streamStreamLeftOuterJoin(
      src.filter(col("event_type") === "click"),
      src.filter(col("event_type") === "purchase"),
      "user_id", "1 hour", withinSeconds = 1800)
    val q = joined.writeStream.format("memory").queryName("ssloj_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("ssloj_test")
      .select(col("l_event_id"), col("r_event_id")).collect()
    val matched = rows.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val nullLeft = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet

    val batch = Tables.events(spark, dir)
    val want = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_event_id"))
      .join(batch.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_event_id")),
        expr("l_user = r_user AND r_ts > l_ts AND r_ts <= l_ts + interval 1800 seconds"))
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchMatchedLeft = want.map(_._1)

    // matched output is exactly inner-join semantics (subset: append
    // only emits watermark-finalized rows)
    assert(matched.subsetOf(want), "stream emitted a pair batch does not have")
    assert(matched.nonEmpty)
    // a NULL row is a POSITIVE claim — the watermark passed the window
    // and no match existed; it must never contradict the batch join
    assert((nullLeft & batchMatchedLeft).isEmpty,
      s"${(nullLeft & batchMatchedLeft).size} events emitted as matchless but matched in batch")
    assert(nullLeft.nonEmpty,
      "fixture should contain clicks with no purchase in-window — null path unexercised")
    // no event appears both matched and null (the state machine decides once)
    assert((nullLeft & matched.map(_._1)).isEmpty)
  }

  test("mapGroupsWithState running counts converge to batch group counts") {
    val counts = EventStream.statefulUserCounts(EventStream.source(spark, glob))
    val q = counts.toDF("user_id", "cnt")
      .writeStream.format("memory").queryName("mgws_test")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last update per user is the final running count
    val got = spark.table("mgws_test").groupBy("user_id")
      .agg(max("cnt").as("cnt")).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Tables.events(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt")).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("stream-static enrichment joins without shuffling the stream side") {
    import spark.implicits._
    val events = EventStream.source(spark, glob)
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("scroll", 4), ("hover", 5))
      .toDF("event_type", "type_code")
    val enriched = EventStream.enrich(events, dim, "event_type")
    val q = enriched.groupBy("type_code").count()
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("enrich_test")
    val total = got.agg(sum("count")).head().getLong(0)
    assert(total == Tables.events(spark, dir).count())
  }
}
