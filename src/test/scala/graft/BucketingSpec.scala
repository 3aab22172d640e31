package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the no-shuffle join path for
  * repeatedly-joined fact tables at scale: both sides pre-bucketed on
  * the join key land in aligned buckets, so the sort-merge join needs
  * NO exchange at query time. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero exchanges") {
    val wh = tmpDir("bucket-wh")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '$wh'")
    spark.sql("USE bspec")
    try {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(plan.contains("Bucketed: true"), plan)
        // aligned buckets: neither join key is ever hash-exchanged
        // (the exchange above the join on the GROUP BY key is expected)
        assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
        assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)

        // and the result matches the plain (shuffling) join
        val plain = spark.read.parquet(s"$dir/lineitem.parquet")
          .join(spark.read.parquet(s"$dir/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
        assert(joined.orderBy("o_orderpriority").collect().toSeq ==
          plain.orderBy("o_orderpriority").collect().toSeq)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.sql("USE default")
    }
  }

  test("streaming dedup runs on the RocksDB state store provider") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
      mem.addData((1L, t(0)), (2L, t(1)), (1L, t(2)), (3L, t(3)), (2L, t(4)))
      val deduped = graft.streaming.EventStream.dedupWithinWatermark(
        mem.toDF().toDF("event_id", "ts"), "1 hour", Seq("event_id"))
      val q = deduped.writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocksdb_dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
