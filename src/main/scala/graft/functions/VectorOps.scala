package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API over the native vector expressions, plus the
  * higher-order-function reference formulations (kept for tests: the HOF
  * path and the native path must agree bit-for-bit, both fold in array
  * order with double accumulators). */
object VectorOps {

  /** Native cosine similarity (double result, deterministic). */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Native dot product. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** HOF reference implementation of dot (allocates zip_with array). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** HOF reference implementation of cosine. */
  def cosineSimHof(a: Column, b: Column): Column = {
    val d  = dotHof(a, b)
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
    when(na === 0d || nb === 0d, 0d).otherwise(d / (na * nb))
  }

  /** L2-normalize a vector to unit length (double components); zero
    * vectors pass through unchanged. Normalizing once at ingest turns
    * every downstream cosine into a plain dot product — the standard
    * pre-ANN step. Pure narrow map. */
  def l2Normalize(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(norm === 0d, transform(v, x => x.cast("double")))
      .otherwise(transform(v, x => x.cast("double") / norm))
  }

  /** Per-vector int8 scalar-quantization scale: max |x_i| / 127 — the
    * 4× storage/IO reduction tier for an embedding corpus (store
    * array<int8> + one scale instead of array<float>). Max is
    * order-independent and the division is one IEEE op, so any engine
    * reproduces the scale bit-exactly. */
  def int8Scale(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Quantize to int8 codes: clamp(floor(x/scale + 0.5), ±127). Zero
    * vectors (scale 0) quantize to zeros. Explicit floor(+0.5) instead
    * of round() — engines disagree on round-half ties, floor they
    * don't. STAGE `scale` as a column first (it is captured by the
    * per-element lambda; see the TextAnalysis staging contract). */
  def quantizeInt8(v: Column, scale: Column): Column =
    when(scale === 0d, transform(v, _ => lit(0)))
      .otherwise(transform(v, x =>
        least(greatest(floor(x.cast("double") / scale + 0.5).cast("double"), lit(-127.0)),
          lit(127.0)).cast("int")))

  /** Reconstruct approximate components: q_i × scale (array<double>) —
    * feeds the same native cosine/dot expressions as full-precision
    * vectors. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Native element-wise vector-sum aggregate (array<double> result);
    * partial-aggregates map-side, so a groupBy shuffles one array per
    * (group, partition) instead of dim-exploded rows. */
  def vecSum(c: Column): Column =
    GraftSqlBridge.column(
      VectorSumAggregate(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Register `cosine_sim` / `vec_dot` / `vec_sum` as SQL functions. */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "cosine_sim",
      es => CosineSimilarity(es.head, es(1)))
    GraftSqlBridge.registerFunction(spark, "vec_dot",
      es => DotProduct(es.head, es(1)))
    GraftSqlBridge.registerFunction(spark, "vec_sum",
      es => VectorSumAggregate(es.head))
  }
}
