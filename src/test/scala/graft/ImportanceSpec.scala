package graft

import org.apache.spark.sql.functions._

import graft.operators.Importance

/** DSIR importance weighting ([[graft.operators.Importance]]):
  * feature semantics, score direction, determinism, the floor-boundary
  * margin that underwrites the cross-engine ln claim, and the plan
  * shape (broadcast ratio join, no corpus self-join). */
class ImportanceSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("feature set is filtered unigrams + space-joined bigrams; empty docs drop") {
    val docs = Seq(
      (1L, "Alpha beta gamma"),
      (2L, "solo"),
      (3L, ""),
      (4L, "  Punct,!  only?  ")
    ).toDF("doc_id", "text")
    val feats = Importance.featureBuckets(docs, "text")
    // doc 1: 3 unigrams + 2 bigrams; doc 2: 1 unigram; doc 3: none;
    // doc 4: "punct only" -> 2 unigrams + 1 bigram
    val counts = feats.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 5L, 2L -> 1L, 4L -> 3L))
  }

  test("scores point toward the target distribution and replay deterministically") {
    // target speaks "alpha beta"; raw adds docs that speak "gamma delta"
    val target = Seq.tabulate(8)(i => (100L + i, "alpha beta alpha beta")).toDF("doc_id", "text")
    val raw = (Seq.tabulate(8)(i => (i.toLong, "alpha beta alpha beta")) ++
      Seq.tabulate(8)(i => (50L + i, "gamma delta gamma delta"))).toDF("doc_id", "text")
    val ratios = Importance.logRatioTable(target, raw, "text")
    val scored = Importance.importanceScores(raw, "doc_id", "text", ratios)
    val byDoc = scored.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val targetLike = byDoc(0L)
    val offTarget = byDoc(50L)
    assert(targetLike > offTarget,
      s"target-like doc must outscore off-target doc: $targetLike <= $offTarget")
    assert(offTarget < 0, s"never-in-target features must score negative: $offTarget")
    // identical second evaluation — no nondeterminism anywhere
    val again = Importance.importanceScores(raw, "doc_id", "text",
      Importance.logRatioTable(target, raw, "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == byDoc)
  }

  test("selectTopK: highest scores win, doc_id breaks ties, plans as TakeOrdered") {
    val scored = Seq(
      (1L, 10L, 5L), (2L, 10L, 9L), (3L, 10L, 9L), (4L, 10L, 1L)
    ).toDF("doc_id", "n_feats", "score_q")
    val top = Importance.selectTopK(scored, "doc_id", 2)
    assert(top.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, not a global sort:\n$plan")
  }

  test("fixture ratio table: every bucket's Q*ln(r) sits >=1e-6 from an integer") {
    // the one cross-engine float hazard is ln landing within an ulp of
    // a floor boundary; with this margin, engines agreeing on ln to
    // ~1e-8 relative cannot disagree on any ratio_q. Checked on the
    // real fixture-derived table (the one the oracle replays).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ratios = Importance.logRatioTable(
      docs.filter(col("source") === "src0"), docs, "text")
    val rows = ratios.select(
      col("bucket"), col("tc"), col("rc"),
      (col("tc") + lit(1L)).cast("double") / (col("rc") + lit(1L)).cast("double")).collect()
    assert(rows.nonEmpty && rows.length <= 256)
    val totals = ratios.agg(sum(col("tc")), sum(col("rc"))).head()
    val (nt, nr) = (totals.getLong(0), totals.getLong(1))
    rows.foreach { r =>
      val ratio = r.getDouble(3) * ((nr + 256).toDouble / (nt + 256).toDouble)
      val arg = 65536.0 * math.log(ratio)
      val dist = math.abs(arg - math.rint(arg))
      assert(dist >= 1e-6,
        f"bucket ${r.getString(0)}: 65536*ln(r)=$arg%.9f is $dist%.2e from an integer " +
          "— floor could flip across engines; change the salt or bucket width")
    }
  }

  test("scoreAgainstTarget matches the two-step composition (single-staging path parity)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val composed = Importance.scoreAgainstTarget(
        docs, "doc_id", "text", col("source") === "src0")
      .orderBy("doc_id").collect().toSeq
    CachePool.releaseAll()
    val twoStep = Importance.importanceScores(docs, "doc_id", "text",
        Importance.logRatioTable(docs.filter(col("source") === "src0"), docs, "text"))
      .orderBy("doc_id").collect().toSeq
    assert(composed == twoStep)
  }

  test("plan: ratio table broadcasts, corpus aggregates once per side, no cartesian on data") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ratios = Importance.logRatioTable(
      docs.filter(col("source") === "src0"), docs, "text")
    val scored = Importance.importanceScores(docs, "doc_id", "text", ratios)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket ratio join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"nothing here may shuffle-join the corpus:\n$plan")
  }
}
