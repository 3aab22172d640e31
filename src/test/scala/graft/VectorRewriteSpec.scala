package graft

import graft.functions.VectorOps
import graft.plans.VectorDotRewrite
import org.apache.spark.sql.functions._

class VectorRewriteSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed (a local Seq would be constant-folded to a
  // LocalRelation before the rule could be observed)
  private def hofDf = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("a"),
      reverse(col("embedding")).as("b"))

  test("HOF dot-product formulation is rewritten to the native vec_dot expression") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VectorDotRewrite
    try {
      val df = hofDf.select(col("id"), VectorOps.dotHof(col("a"), col("b")).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_dot"), s"rewrite did not fire:\n$optimized")
      assert(!optimized.contains("aggregate("), s"HOF survived:\n$optimized")
      // values identical to the un-rewritten evaluation
      val expected = hofDf.select(col("id"), VectorOps.dot(col("a"), col("b")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      df.collect().foreach(r => assert(r.getDouble(1) == expected(r.getLong(0))))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VectorDotRewrite)
    }
  }

  test("rule leaves non-dot aggregates untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VectorDotRewrite
    try {
      // max-fold, not a dot product: must NOT be rewritten
      val df = hofDf.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
          lit(0.0), (acc, v) => greatest(acc, v)).as("m"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("vec_dot"), optimized)
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == VectorDotRewrite)
    }
  }
}
