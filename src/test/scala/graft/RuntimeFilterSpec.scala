package graft

import graft.operators.RuntimeFilter
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = {
    val big = (0 until 10000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "payload")
    val small = (0 until 25).map(i => (i.toLong * 7, s"dim$i")).toDF("sk", "attr")
    (big, small)
  }

  test("bloom-pruned join equals the plain join row-for-row (no false negatives)") {
    val (big, small) = fixture
    val plain = big.join(small, col("k") === col("sk"))
      .collect().map(_.toSeq).toSet
    val pruned = RuntimeFilter.bloomPrunedJoin(big, small, "k", "sk")
      .collect().map(_.toSeq).toSet
    assert(pruned == plain, "the runtime filter must be invisible in the result")
    assert(plain.nonEmpty)
  }

  test("pruning drops most non-matching rows before the join, bounded by fpp") {
    val (big, small) = fixture
    val bloom = RuntimeFilter.buildKeyBloom(small, "sk", fpp = 0.01)
    val surviving = RuntimeFilter.pruneByBloom(big, "k", bloom).count()
    val matching = big.join(small, col("k") === col("sk")).count()
    assert(surviving >= matching, "a false negative would lose join rows")
    // 500 distinct big keys, 25 build keys (overlap ≤ 25) → ~5% true
    // rate; 1% fpp on the rest keeps survivors far below the corpus
    assert(surviving < big.count() / 5,
      s"filter barely pruned: $surviving of ${big.count()} rows survived")
  }

  test("the bloom predicate sits in the big side's plan before the join") {
    // parquet-backed input: Seq-backed frames constant-fold the filter
    // into the LocalTableScan during optimization (verify-skill gotcha)
    val dir = java.nio.file.Files.createTempDirectory("rfplan").toString
    val (big, small) = fixture
    big.write.mode("overwrite").parquet(s"$dir/big")
    small.write.mode("overwrite").parquet(s"$dir/small")
    val bigP = spark.read.parquet(s"$dir/big")
    val smallP = spark.read.parquet(s"$dir/small")
    val joined = RuntimeFilter.bloomPrunedJoin(bigP, smallP, "k", "sk")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_any_contain"),
      s"runtime filter missing from the executed plan:\n$plan")
    // the predicate must be on the probe side BELOW the join: the scan
    // stage that carries it must not be the one broadcasting the dim
    val filterIdx = plan.indexOf("bloom_any_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "filter should appear inside the join's probe-side subtree")
  }

  test("oversized build side fails loudly instead of shipping a giant filter") {
    val (big, small) = fixture
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrunedJoin(big, small, "k", "sk", maxBuildKeys = 10)
    }
    assert(e.getMessage.contains("maxBuildKeys"))
  }
}
