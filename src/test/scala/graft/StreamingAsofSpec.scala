package graft

import graft.streaming.StreamingAsofEnrich
import graft.streaming.StreamingAsofEnrich.{AsofInput, AsofOutput}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAsofSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming as-of enrichment: point-in-time matches across micro-batches, exact ties, no-match nulls") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[AsofInput]
    val q = StreamingAsofEnrich.enrich(mem.toDS())
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      // batch 0: versions for two keys + two lookups (one before any version)
      mem.addData(
        AsofInput(1L, 10L, Some(100.0)), AsofInput(1L, 20L, Some(200.0)),
        AsofInput(2L, 5L, Some(50.0)),
        AsofInput(1L, 15L, None), // between versions -> 10/100
        AsofInput(1L, 9L, None))  // before all versions -> null
      q.processAllAvailable()
      // batch 1: a newer version, an exact-tie lookup, cross-key lookup
      mem.addData(
        AsofInput(1L, 30L, Some(300.0)),
        AsofInput(1L, 30L, None), // exact timestamp -> matches 30/300
        AsofInput(1L, 25L, None), // -> 20/200 (NOT the newer 30)
        AsofInput(2L, 6L, None))  // other key -> 5/50
      q.processAllAvailable()
      val got = spark.table("asof_out").as[AsofOutput].collect()
        .map(o => (o.key, o.t) -> ((o.asofT, o.asofValue))).toMap
      assert(got == Map(
        (1L, 15L) -> ((Some(10L), Some(100.0))),
        (1L, 9L) -> ((None, None)),
        (1L, 30L) -> ((Some(30L), Some(300.0))),
        (1L, 25L) -> ((Some(20L), Some(200.0))),
        (2L, 6L) -> ((Some(5L), Some(50.0)))))
    } finally q.stop()
  }

  test("streaming enrichment agrees with the batch asofJoin when nothing is late") {
    // one interleaved event set, processed in batch mode by BOTH paths:
    // the Dataset form of enrich() runs the same state code
    val rnd = new scala.util.Random(5)
    val versions = for (k <- 1L to 4L; i <- 0 until 6)
      yield AsofInput(k, rnd.nextInt(1000).toLong, Some(rnd.nextDouble()))
    val deduped = versions.groupBy(v => (v.key, v.t)).map(_._2.head).toSeq
    val lookups = for (k <- 1L to 4L; _ <- 0 until 10)
      yield AsofInput(k, rnd.nextInt(1200).toLong, None)
    val all = (deduped ++ lookups).toDS()

    val streaming = StreamingAsofEnrich.enrich(all, maxVersions = 100)
      .collect().map(o => (o.key, o.t) -> ((o.asofT, o.asofValue))).toMap

    val left = lookups.toDF("key", "t", "ignored").drop("ignored")
      .dropDuplicates("key", "t")
    val right = deduped.map(v => (v.key, v.t, v.right.get))
      .toDF("key", "rt", "asof_value")
      .withColumn("asof_t", col("rt"))
    val batch = graft.operators.TemporalJoin
      .asofJoin(left, right, Seq("key"), "t", "rt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.getAs[Any]("asof_t")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("asof_value")).map(_.asInstanceOf[Double])))).toMap
    // streaming emits one row per lookup EVENT; compare on distinct keys
    assert(streaming.keySet == batch.keySet)
    batch.foreach { case (k, want) =>
      assert(streaming(k) == want, s"mismatch at $k")
    }
  }

  test("state survives checkpoint restart: versions from before the restart still serve lookups") {
    val base = tmpDir("asof-restart")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "key BIGINT, t BIGINT, right DOUBLE")
    def stream = spark.readStream.schema(schema).parquet(s"$base/in").as[AsofInput]
    def run(): Unit = {
      val q = StreamingAsofEnrich.enrich(stream)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/cp")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: only versions arrive; state is built, nothing emitted
    Seq(AsofInput(1L, 10L, Some(100.0)), AsofInput(2L, 20L, Some(200.0)))
      .toDS().coalesce(1).write.mode("append").parquet(s"$base/in")
    run()
    // run 2 (fresh query from the checkpoint): lookups arrive — they can
    // only be enriched if run 1's versions were recovered from state
    Seq(AsofInput(1L, 15L, None), AsofInput(2L, 25L, None))
      .toDS().coalesce(1).write.mode("append").parquet(s"$base/in")
    run()
    val got = spark.read.parquet(s"$base/out").as[AsofOutput].collect()
      .map(o => o.key -> ((o.asofT, o.asofValue))).toMap
    assert(got == Map(
      1L -> ((Some(10L), Some(100.0))),
      2L -> ((Some(20L), Some(200.0)))))
  }

  test("version retention: maxVersions evicts oldest, late lookups degrade as documented") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[AsofInput]
    val q = StreamingAsofEnrich.enrich(mem.toDS(), maxVersions = 2)
      .writeStream.format("memory").queryName("asof_cap").outputMode("append").start()
    try {
      // batch 0: three versions — cap 2 retains only (20, 30)
      mem.addData(
        AsofInput(7L, 10L, Some(1.0)),
        AsofInput(7L, 20L, Some(2.0)),
        AsofInput(7L, 30L, Some(3.0)))
      q.processAllAvailable()
      // batch 1: a lookup older than the oldest retained version finds
      // nothing (the documented retention bound); a covered one matches
      mem.addData(AsofInput(7L, 15L, None), AsofInput(7L, 21L, None))
      q.processAllAvailable()
      val got = spark.table("asof_cap").as[AsofOutput].collect()
        .map(o => o.t -> o.asofValue).toMap
      assert(got == Map(15L -> None, 21L -> Some(2.0)))
    } finally q.stop()
  }
}
