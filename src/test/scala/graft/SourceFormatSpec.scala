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
