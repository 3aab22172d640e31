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

  test("SQL twins match the Scala API row-for-row across operator families") {
    GraftSqlApi.init(spark, dir)
    GraftSqlApi.sqlTwins.foreach { case (name, sql) =>
      val viaSql = spark.sql(sql).collect().toSeq
      val viaScala = SparkEntry.queries(name)(spark, dir).collect().toSeq
      assert(viaSql.nonEmpty, s"$name: twin returned no rows")
      assert(viaSql == viaScala, s"$name: SQL and Scala results differ")
    }
  }

  test("SQL-registered shingles/minhash are the same native expressions as the Scala API") {
    GraftSqlApi.init(spark, dir)
    val viaSql = spark.sql(
      """SELECT doc_id,
           minhash_signature(ngram_shingles(split(trim(graft_normalize(text)), '\\s+'), 3), 8) AS sig
         FROM documents ORDER BY doc_id LIMIT 20""").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val viaScala = graft.operators.TextAnalysis.withShingles(docs, "text", 3)
      .select(col("doc_id"),
        graft.operators.Dedup.minhashSignatureFromShingles(col("_sh"), 8).as("sig"))
      .orderBy("doc_id").limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaScala)
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
