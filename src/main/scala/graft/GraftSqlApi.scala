package graft

import graft.sources.Tables
import org.apache.spark.sql.{GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower, RegExpReplace}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine: a user arriving with `spark.sql` (instead
  * of the Scala operator API) registers the fixture tables as temp views
  * and the native expressions as SQL functions, then reaches every
  * operator family through plain SQL. [[sqlTwins]] carries SQL
  * equivalents for a representative query per family; SqlApiSpec asserts
  * they match the Scala-API results row-for-row.
  *
  * The registered functions resolve to the SAME Catalyst expressions the
  * Scala API constructs (no UDF wrappers), so plans — and therefore
  * codegen, pushdown, and partial aggregation — are identical from both
  * surfaces.
  */
object GraftSqlApi {

  /** Register all fixture tables under their oracle names. `events` goes
    * through the nanos-aware loader so `ts` is a proper timestamp. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
      .foreach(n => Tables.load(spark, dir, n).createOrReplaceTempView(n))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an INT literal, got $other")
  }

  /** Register the engine's native expressions as SQL functions:
    *  - cosine_sim(a, b), vec_dot(a, b)         — vector scalar math
    *  - vec_sum(v)                               — vector-sum aggregate
    *  - ngram_shingles(tokens, k)                — word k-shingles
    *  - minhash_signature(shingles, numHashes)   — MinHash sketch
    *  - graft_normalize(text)                    — F1 normalize semantics
    */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.VectorOps.register(spark)
    GraftSqlBridge.registerFunction(spark, "ngram_shingles",
      es => graft.functions.NGramShingles(es.head, intLit(es(1), "ngram_shingles", 1)))
    GraftSqlBridge.registerFunction(spark, "minhash_signature",
      es => graft.functions.MinHashSignature(es.head, intLit(es(1), "minhash_signature", 1)))
    GraftSqlBridge.registerFunction(spark, "graft_normalize",
      es => Lower(RegExpReplace(es.head, Literal("[^a-zA-Z0-9\\s]"), Literal(""))))
    GraftSqlBridge.registerFunction(spark, "nfc_normalize",
      es => graft.functions.NfcNormalize(es.head))
  }

  /** Both registrations in one call. */
  def init(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerFunctions(spark)
  }

  /** `spark.sql` twins of a representative query per operator family
    * (aggregation, broadcast join, similarity search, text, window,
    * dedup). Keys match `SparkEntry.queries`; results must be
    * row-identical to the Scala form — asserted in SqlApiSpec. */
  val sqlTwins: Map[String, String] = Map(
    "a9_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS nd_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "j1_broadcast_dim" ->
      """SELECT /*+ BROADCAST(nation), BROADCAST(region) */
         r_name, count(*) AS cnt,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "s1_cosine_topk" ->
      """SELECT probe_id, neighbor_id, rank FROM (
           SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id
               ORDER BY cosine_sim(p.embedding, c.embedding) DESC,
                        c.vec_id ASC) AS INT) AS rank
           FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
           WHERE p.vec_id < 5
         ) WHERE rank <= 5 ORDER BY probe_id, rank""",
    "t1_normalize" ->
      """SELECT doc_id, graft_normalize(text) AS norm_text
         FROM documents ORDER BY doc_id""",
    "w3_window_rank" ->
      """SELECT c_nationkey, c_custkey, rk FROM (
           SELECT c_nationkey, c_custkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rk
           FROM customer
         ) WHERE rk <= 3 ORDER BY c_nationkey, rk""",
    "d1_exact_dedup" ->
      """SELECT text, MIN(doc_id) AS doc_id FROM documents
         GROUP BY text ORDER BY doc_id""",
    "a1_group_count_segment" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "a6_conditional_pair" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS INT) AS finished_cnt,
         CAST(COUNT(o_orderstatus) - SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS INT) AS other_cnt
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "w2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "p2_derived_flag" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END AS high_value,
         CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS status_label
         FROM orders ORDER BY o_orderkey""",
    "t5_fingerprint" ->
      """SELECT doc_id, md5(CAST(graft_normalize(text) AS BINARY)) AS fp
         FROM documents ORDER BY doc_id""",
    "e1_json_extract" ->
      """SELECT get_json_object(props, '$.k') AS k, count(*) AS cnt
         FROM events GROUP BY k ORDER BY k""",
    "x1_hash_split" ->
      """SELECT doc_id,
         CASE WHEN substring(md5(cast(concat('split:', cast(doc_id AS STRING)) AS BINARY)), 1, 8) < 'cccccccc' THEN 'train'
              WHEN substring(md5(cast(concat('split:', cast(doc_id AS STRING)) AS BINARY)), 1, 8) < 'e6666666' THEN 'val'
              ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "x2_hash_sample" ->
      """SELECT doc_id FROM documents
         WHERE substring(md5(cast(concat('sample:', cast(doc_id AS STRING)) AS BINARY)), 1, 8) < '33333333'
         ORDER BY doc_id""",
    // the as-of join is pure SQL from this surface too: the same
    // union + running-window carry the Scala operator plans (Spark SQL
    // has no ASOF keyword; this IS the idiomatic formulation)
    "j6_asof_join" ->
      """WITH r AS (
           SELECT user_id, unix_micros(ts) AS tus,
                  max_by(value, event_id) AS last_click_value
           FROM events WHERE event_type = 'click' GROUP BY 1, 2
         ), l AS (
           SELECT event_id, user_id, unix_micros(ts) AS tus
           FROM events WHERE event_type = 'purchase'
         ), u AS (
           SELECT event_id, user_id, tus, 1 AS side,
                  CAST(NULL AS BIGINT) AS v_tus, CAST(NULL AS DOUBLE) AS v_val
           FROM l
           UNION ALL
           SELECT CAST(NULL AS BIGINT), user_id, tus, 0 AS side,
                  tus AS v_tus, last_click_value AS v_val
           FROM r
         )
         SELECT event_id, last_click_tus, last_click_value FROM (
           SELECT event_id, side,
             LAST(v_tus, TRUE) OVER (PARTITION BY user_id ORDER BY tus, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_tus,
             LAST(v_val, TRUE) OVER (PARTITION BY user_id ORDER BY tus, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value
           FROM u
         ) WHERE side = 1 ORDER BY event_id""",
  )
}
