package graft.operators

import graft.functions.BloomAnyContain
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Runtime join-key filtering — the shuffle-volume lever for selective
  * joins at 100 TB: when the build side's key set is small, shipping a
  * Bloom filter of those keys to the probe side's SCAN removes
  * non-matching rows BEFORE they pay the exchange, turning a
  * "shuffle 100 TB to drop 99% in the join" plan into "drop 99% at the
  * scan, shuffle 1%". Spark's own InjectRuntimeFilter does this only
  * under AQE-specific conditions; this operator makes the decision
  * explicit and testable.
  *
  * Correctness is unconditional: Bloom filters have NO false
  * negatives, so the pruned join equals the plain join row-for-row
  * (the j12 oracle is the PLAIN SQL join); false positives only cost
  * shuffle bytes, bounded by `fpp`. */
object RuntimeFilter {

  /** Inner join `big ⋈ small` on `bigKey = smallKey`, with the big side
    * pre-filtered by a Bloom filter built over the small side's
    * distinct key hashes. Keys are hashed with xxhash64 on BOTH sides
    * (the d13 convention) so any key type joins the same way.
    *
    * The build is one distinct + one filter-aggregation job, guarded by
    * `maxBuildKeys` — past that the filter bytes stop being
    * task-binary-sized and the plain join's shuffle is the better
    * trade. */
  def bloomPrunedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      fpp: Double = 0.01,
      maxBuildKeys: Long = 10L * 1000 * 1000): DataFrame =
    pruneByBloom(big, bigKey, buildKeyBloom(small, smallKey, fpp, maxBuildKeys))
      .join(small, col(bigKey) === col(smallKey))

  /** Serialized Bloom filter over the distinct xxhash64 of `keyCol` —
    * the build side of the runtime filter, exposed so specs (and
    * callers composing their own join shapes) can measure pruning
    * selectivity directly. */
  def buildKeyBloom(
      small: DataFrame,
      keyCol: String,
      fpp: Double = 0.01,
      maxBuildKeys: Long = 10L * 1000 * 1000): Array[Byte] = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val keys = small.select(xxhash64(col(keyCol)).as("_h")).distinct()
    val n = keys.count() // bounded build-side metadata job
    require(n <= maxBuildKeys,
      s"buildKeyBloom: $n distinct build keys exceed maxBuildKeys=$maxBuildKeys " +
        "— at that size the runtime filter costs more than the shuffle it saves; " +
        "use the plain join (or shard the build side)")
    val bloom = keys.stat.bloomFilter("_h", math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** The probe side: rows of `big` whose key MIGHT be in the filter —
    * a narrow scan-level predicate, evaluated before any exchange. */
  def pruneByBloom(big: DataFrame, bigKey: String, bloomBytes: Array[Byte]): DataFrame =
    big.filter(GraftSqlBridge.column(BloomAnyContain(
      GraftSqlBridge.expression(array(xxhash64(col(bigKey)))), bloomBytes)))
}
