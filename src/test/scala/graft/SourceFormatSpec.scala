package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet/CSV: ORC and JSON
  * round-trips preserve values and schema; format choice is orthogonal
  * to every operator in the engine. */
class SourceFormatSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves schema and values") {
    val out = tmpDir("orc-rt")
    val src = spark.read.parquet(s"$dir/nation.parquet")
    src.write.mode("overwrite").orc(s"$out/nation.orc")
    val back = spark.read.orc(s"$out/nation.orc")
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON lines round-trip with explicit schema preserves values") {
    val out = tmpDir("json-rt")
    val src = spark.read.parquet(s"$dir/customer.parquet")
    src.write.mode("overwrite").json(s"$out/customer.json")
    // JSON is schemaless on disk: read back with the source schema
    val back = spark.read.schema(src.schema).json(s"$out/customer.json")
    assert(back.orderBy("c_custkey").collect().toSeq ==
      src.orderBy("c_custkey").collect().toSeq)
  }

  test("partitioned writes enable partition pruning at the scan") {
    val out = tmpDir("part-prune")
    graft.sources.Tables.events(spark, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/events")
    val q = spark.read.parquet(s"$out/events")
      .filter(col("event_type") === "click")
      .groupBy("user_id").count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // pruning means the click partition only: row count matches the filter
    val want = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "click").count()
    assert(q.agg(sum("count")).head().getLong(0) == want)
  }

  test("malformed CSV rows: PERMISSIVE keeps them as nulls, DROPMALFORMED drops them") {
    val d = tmpDir("bad-csv")
    val w = new java.io.PrintWriter(s"$d/data.csv")
    w.println("id,qty"); w.println("1,10"); w.println("2,not_a_number"); w.println("3,30")
    w.close()
    val schema = "id INT, qty INT"
    val permissive = spark.read.option("header", "true").schema(schema)
      .option("mode", "PERMISSIVE").csv(d)
    assert(permissive.count() == 3)
    assert(permissive.filter(col("qty").isNull).count() == 1)
    val dropped = spark.read.option("header", "true").schema(schema)
      .option("mode", "DROPMALFORMED").csv(d)
    // collect, not count: CSV count() short-circuits parsing entirely,
    // so malformed rows are only dropped when columns are materialized
    assert(dropped.collect().length == 2)
  }

  test("operators compose over any source format (groupCount on ORC)") {
    val out = tmpDir("orc-op")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").orc(s"$out/orders.orc")
    val got = graft.operators.RelationalOps
      .groupCount(spark.read.orc(s"$out/orders.orc"), Seq("o_orderstatus"))
      .orderBy("o_orderstatus").collect().toSeq
    val want = graft.operators.RelationalOps
      .groupCount(spark.read.parquet(s"$dir/orders.parquet"), Seq("o_orderstatus"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(got == want)
  }
}
