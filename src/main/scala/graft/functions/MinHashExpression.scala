package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: for each seed s in [0, numHashes), the
  * minimum of xxhash64(shingle, s) over an `array<string>` shingle
  * column — ONE pass over the array with a primitive mins buffer.
  *
  * The declarative form,
  * `array((0 until n).map(i => array_min(transform(sh, x => xxhash64(x, i)))))`,
  * traverses the shingle array n times through interpreted HOF lambdas
  * and allocates n intermediate arrays per row; at corpus scale the
  * signature pass dominates dedup cost, which makes this the single
  * hottest expression in the pipeline.
  *
  * Hash identity: Spark's `xxhash64(s, lit(i))` FOLDS its arguments —
  * bytes of s hashed with the default seed 42, and the result used as
  * the seed for hashing the long i. Reproducing that fold exactly keeps
  * signatures bit-interchangeable with the declarative form (asserted
  * in TextDedupSpec) AND means the per-shingle byte hash is computed
  * once, with only a cheap hashLong per seed on top. Null shingle
  * elements are skipped (shingle arrays never contain nulls in
  * practice). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes > 0, "numHashes must be positive")

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        // one byte-level hash per shingle (xxhash64's default seed 42)…
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var seed = 0
        while (seed < numHashes) {
          // …then the fold step of xxhash64(s, lit(seed)) for an int
          // literal seed: hashInt(seed, base)
          val h = XXH64.hashInt(seed, base)
          if (h < mins(seed)) mins(seed) = h
          seed += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
