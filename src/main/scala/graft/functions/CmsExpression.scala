package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query estimate against a serialized count-min sketch
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 2005) — the
  * read side of Spark's `count_min_sketch` aggregate, which Spark
  * exposes no SQL function for.
  *
  * The item is hashed exactly as the aggregate's update path hashes
  * string columns (UTF-8 bytes through the binary-item path), so
  * estimates are bit-consistent with the sketch build.
  *
  * The serialized sketch rides the expression tree like
  * [[BloomAnyContain]]'s filter: shipped once per executor inside the
  * task binary, deserialized lazily per JVM. CodegenFallback is fine
  * here — the expression evaluates on candidate rows (top-k
  * shortlists), never on the corpus-wide hot path. */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  require(sketchBytes.nonEmpty, "empty count-min sketch payload")

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
