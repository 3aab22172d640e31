package graft

import graft.streaming.QuotaStream

class QuotaStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("per-source quota admits lowest ids first, carries state across batches, caps exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = QuotaStream.admit(mem.toDS().toDF("source", "doc_id"), "source", "doc_id", quota = 3)
    val q = out.toDF("source", "doc_id", "admit_rank")
      .writeStream.format("memory").queryName("quota_test")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("quota_ckpt"))
      .start()
    try {
      // batch 1: unsorted arrival — admission must pick the LOWEST ids
      mem.addData(("a", 9L), ("a", 2L), ("a", 5L), ("b", 1L))
      q.processAllAvailable()
      // batch 2: a has 3/3 used → room 0; b continues its running rank
      mem.addData(("a", 1L), ("b", 7L), ("b", 3L), ("b", 8L), ("b", 9L))
      q.processAllAvailable()
      val got = spark.table("quota_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        ("a", 2L, 1L), ("a", 5L, 2L), ("a", 9L, 3L), // batch-1 fill, sorted
        ("b", 1L, 1L),                                // batch-1 partial
        ("b", 3L, 2L), ("b", 7L, 3L)),                // batch-2 tops up to 3
        s"got $got")
    } finally q.stop()
  }

  test("quota 0 admits nothing and keeps no state rows growing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = QuotaStream.admit(mem.toDS().toDF("source", "doc_id"), "source", "doc_id", quota = 0)
    val q = out.toDF("source", "doc_id", "admit_rank")
      .writeStream.format("memory").queryName("quota_zero")
      .outputMode("update")
      .option("checkpointLocation", tmpDir("quota_ckpt0"))
      .start()
    try {
      mem.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      assert(spark.table("quota_zero").isEmpty)
    } finally q.stop()
  }
}
