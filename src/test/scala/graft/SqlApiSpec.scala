package graft

import org.apache.spark.sql.functions._

/** SQL-surface parity: the engine's tables and functions are usable
  * from `spark.sql` — temp views over the fixture tables plus the
  * registered native vector functions. */
class SqlApiSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("SQL and DataFrame forms of a join-aggregate agree") {
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("li")
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("ord")
    val sql = spark.sql(
      """SELECT o_orderpriority, count(*) AS cnt, sum(l_quantity) AS q
         FROM li JOIN ord ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""").collect().toSeq
    val df = spark.table("li")
      .join(spark.table("ord"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(sql == df)
  }

  test("registered native functions work over SQL on real embeddings") {
    graft.functions.VectorOps.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT e1.vec_id AS a, e2.vec_id AS b,
                cosine_sim(e1.embedding, e2.embedding) AS c
         FROM emb e1 JOIN emb e2 ON e1.vec_id < e2.vec_id
         WHERE e1.vec_id < 3
         ORDER BY c DESC LIMIT 5""").collect()
    assert(top.length == 5)
    assert(top.forall(r => r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0))
  }
}
