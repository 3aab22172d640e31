package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual FALLBACK, not the
  * default. The default skew remedy is AQE's runtime skew-join
  * splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  * GraftSession): it detects oversized partitions from real shuffle
  * statistics and splits them with no replication cost. Reach for this
  * operator only where AQE cannot act — streaming joins (no finished
  * map stage to measure), stats-less or first-run sources, or a known
  * permanent hot key where paying the deterministic saltFactor×
  * replication up front beats a runtime re-plan.
  *
  * Mechanics: the big (skewed) side gets a deterministic salt in
  * [0, saltFactor) derived by hashing its whole row; the small side is
  * replicated saltFactor times. The join key becomes (key, salt), so a
  * hot key's rows spread over saltFactor shuffle partitions instead of
  * one straggler. Cost: small side shuffles saltFactor× its size — pick
  * saltFactor ≈ (hot-key rows / target partition rows).
  *
  * Row-hash salting (not rand()) keeps the operator deterministic and
  * retry-safe: a recomputed task re-derives identical salts, so no
  * duplicate/lost rows under speculative execution — rand() salting
  * breaks exactly this way at scale.
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltedBig = big.withColumn(
      "_salt_b",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor.toLong)))
    val replicatedSmall = small.withColumn(
      "_salt_s",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }
}
