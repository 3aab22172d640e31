package graft

import graft.functions.NGramShingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Pins the shingle-staging contract of the near-dup pipelines: the
  * normalize+tokenize+shingle work is the dominant CPU cost of dedup at
  * corpus scale, so the bucket index and the Jaccard verify join must
  * consume ONE persisted staged frame per side — not re-derive shingles
  * per consumer (the round-3 formulation paid that cost 3×). */
class DedupPlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** All physical nodes, descending through the leaf wrappers that hide
    * subtrees (AQE root, materialized query stages). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case n => Seq(n)
    }

  private def shingleEvals(p: SparkPlan): Int =
    flatten(p)
      .map(_.expressions.map(_.collect { case _: NGramShingles => 1 }.sum).sum)
      .sum

  /** Cache-build plans feeding the query, deduplicated by cache builder:
    * many scans of one cached relation evaluate its build plan once. */
  private def cachedBuildPlans(p: SparkPlan): Seq[SparkPlan] =
    flatten(p)
      .collect { case s: InMemoryTableScanExec => s.relation.cacheBuilder }
      .distinctBy(System.identityHashCode(_))
      .map(_.cachedPlan)

  /** (shingle evals outside any cache, shingle evals across distinct
    * cache-build plans). */
  private def stagingProfile(df: DataFrame): (Int, Int) = {
    val p = df.queryExecution.executedPlan
    (shingleEvals(p), cachedBuildPlans(p).map(shingleEvals).sum)
  }

  test("d6 near-dup pipeline evaluates the shingle expression exactly once") {
    val q = SparkEntry.queries("d6_neardup_pairs")(spark, dir)
    val (outside, cached) = stagingProfile(q)
    assert(outside == 0,
      s"shingles must only be computed in the persisted staged frame; found $outside uncached evals")
    assert(cached == 1, s"expected ONE cached shingle eval, got $cached")
  }

  test("d7 decontamination evaluates shingles once per side") {
    val q = SparkEntry.queries("d7_decontaminate")(spark, dir)
    val (outside, cached) = stagingProfile(q)
    assert(outside == 0,
      s"shingles must only be computed in the persisted staged frames; found $outside uncached evals")
    assert(cached == 2, s"expected one cached shingle eval per side, got $cached")
  }

  test("shingle arrays do not ride through the bucket-explode shuffle") {
    // the LSH index table carries (id, band, bucket) only — a shingle or
    // signature array in the exchange payload would blow up shuffle bytes
    // (raw operator form; the registry's d3 wraps it in invariant checks)
    val q = graft.operators.Dedup.lshBuckets(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")),
      "doc_id", "text")
    assert(q.schema.fieldNames.toSeq == Seq("doc_id", "band", "bucket"))
    val exchanges = flatten(q.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName.contains("ShuffleExchange"))
    exchanges.foreach { ex =>
      val carried = ex.output.map(_.name)
      assert(!carried.contains("_sh") && !carried.contains("_sig"),
        s"array payload rides the shuffle: $carried")
    }
  }
}
