package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-shingles over an `array<string>` token column: output
  * element i is tokens[i..i+k-1] joined with a single space; fewer than
  * k tokens collapse to one shingle of the whole array (matching the
  * declarative zip_with-over-shifted-slices form bit-for-bit — asserted
  * in TextDedupSpec).
  *
  * One pass, no lambda interpretation, no intermediate slice arrays:
  * the shingle stage feeds every dedup signature (MinHash, Jaccard,
  * n-gram counts), so at corpus scale this sits directly on the dedup
  * critical path next to [[MinHashSignature]]. */
case class NGramShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "ngram_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (n < k) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
    } else {
      val out = new Array[Any](n - k + 1)
      var s = 0
      while (s <= n - k) {
        val window = new Array[UTF8String](k)
        System.arraycopy(toks, s, window, 0, k)
        out(s) = UTF8String.concatWs(space, window: _*)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
