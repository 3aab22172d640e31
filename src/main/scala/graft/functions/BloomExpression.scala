package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** "Any element in the Bloom filter" membership test over an
  * `array<long>` of key hashes — the broadcast-side primitive of the
  * decontamination pre-filter ([[graft.operators.Dedup.bloomPrefilterFlags]]).
  *
  * Semantics: true iff ANY non-null element might be in the filter.
  * Bloom filters have NO false negatives, so `false` is definitive —
  * a doc none of whose shingle hashes hit the filter provably shares
  * no shingle with the probe set and can skip the exact join.
  *
  * The serialized filter rides the expression tree: Spark broadcasts
  * each stage's task binary once per executor (TorrentBroadcast), so
  * the bytes ship O(executors), not O(tasks). Sized by
  * [[graft.operators.Dedup.bloomPrefilterFlags]]'s `maxProbeShingles`
  * guard to stay a few MB. Deserialization is per-JVM-instance lazy. */
case class BloomAnyContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  require(bloomBytes.nonEmpty, "empty Bloom filter payload")

  override def prettyName: String = "bloom_any_contain"
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var hit = false
    while (i < n && !hit) {
      if (!arr.isNullAt(i)) hit = bloom.mightContainLong(arr.getLong(i))
      i += 1
    }
    hit
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
