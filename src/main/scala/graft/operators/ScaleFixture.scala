package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus up-scaling for scale micro-benchmarks: N
  * perturbed replicas of a fixture table, where the perturbation
  * destroys cross-replica similarity but preserves each replica's
  * internal near-dup structure. This lets growth assertions distinguish
  * near-linear candidate volume (healthy bucketing) from quadratic
  * blow-up: if replica i were similar to replica j, planted near-dup
  * clusters would multiply quadratically with the replica count and no
  * bucketed algorithm could stay linear.
  */
object ScaleFixture {

  private val letters = "abcdefghijklmnopqrstuvwxyz"
  private val digits = "0123456789"

  /** Replica id-space stride — far above any fixture id. */
  val idStride = 10000000L

  /** Replica r of a text: the full lowercase alphabet rotated by r and
    * digits rotated by r (replica 0 is the identity). Rotating ONLY a
    * subset (e.g. vowels) would leave vowel-free/numeric tokens
    * byte-identical across replicas and quietly reintroduce cross-
    * replica J=1.0 pairs; a whole-alphanumeric bijection changes every
    * token containing any letter or digit while exactly preserving the
    * within-replica Jaccard structure. */
  private def perturbText(text: org.apache.spark.sql.Column, r: Int) = {
    val lr = r % letters.length match { case 0 => 1; case k => k }
    val dr = r % digits.length match { case 0 => 1; case k => k }
    if (r == 0) text
    else translate(text,
      letters + digits,
      (letters.drop(lr) + letters.take(lr)) + (digits.drop(dr) + digits.take(dr)))
  }

  /** `replicas` copies of (doc_id, text), ids offset by [[idStride]]. */
  def scaleDocuments(docs: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { r =>
      docs.select(
        (col("doc_id") + lit(r * idStride)).as("doc_id"),
        perturbText(col("text"), r).as("text"))
    }.reduce(_.unionByName(_))

  /** `replicas` copies of an event table keyed by `user_id`: replica r
    * offsets user ids by [[idStride]] (disjoint key spaces) and event
    * ids likewise; times are preserved. Models key-space growth — the
    * axis a per-key operator (as-of join, sessionization) scales on. */
  def scaleEvents(events: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { r =>
      events
        .withColumn("user_id", col("user_id") + lit(r * idStride))
        .withColumn("event_id", col("event_id") + lit(r * idStride))
    }.reduce(_.unionByName(_))

  /** Deterministic mixture-of-Gaussians embedding corpus — the ANN
    * evaluation fixture the tiny (≤2k-row) driver fixtures can't be:
    * `n` vectors of dimension `dim` in `clusters` isotropic Gaussian
    * clusters, the shape real embedding corpora have and the shape
    * IVF lists / PQ codewords are designed for (standard synthetic
    * construction — e.g. the clustered setting of Jégou et al. 2011
    * §V; nothing here derives from any non-public source).
    *
    * Determinism, twice over:
    *  - cluster CENTERS are unit-norm Gaussian draws from a seeded
    *    `java.util.Random` (its LCG + nextGaussian are pinned by the
    *    Java spec, so the corpus is bit-stable across JVMs); driver
    *    cost is clusters × dim doubles — broadcast as ONE map literal.
    *  - per-coordinate NOISE is Box-Muller over two xxhash64-derived
    *    uniforms keyed by (vec_id, coordinate) — a pure column
    *    expression, so the corpus is independent of partitioning and
    *    identical on every executor layout (`rand(seed)` is not).
    *
    * `spread` is the EXPECTED NOISE NORM (per-coordinate sd =
    * spread/√dim): centers are unit vectors, so spread=0.5 gives
    * within-cluster cosines ≈ 0.9 while random 64-d centers sit near
    * cos ≈ 0 ± 1/√dim — tight, well-separated clusters. Cluster id is
    * `vec_id mod clusters` (balanced lists by construction). */
  def mixtureOfGaussians(
      spark: org.apache.spark.sql.SparkSession,
      n: Long,
      dim: Int,
      clusters: Int,
      spread: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(n > 0 && dim > 0 && clusters > 0 && clusters <= n,
      s"need 0 < clusters=$clusters <= n=$n and dim=$dim > 0")
    val rnd = new java.util.Random(seed)
    val centers: Seq[(Long, Seq[Double])] = (0 until clusters).map { c =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      c.toLong -> v.map(_ / norm).toSeq
    }
    val centMap = typedLit(centers.toMap)
    val sd = spread / math.sqrt(dim.toDouble)
    // uniform in (0,1): low 30 bits of the hash, offset half a step —
    // never exactly 0, so log() below is total. The hash keys on
    // (tag, seed, vec_id, i) only — NOT dim/clusters/spread — so two
    // corpora differing only in those parameters draw CORRELATED noise
    // fields (round-8 advice). Fine for this bench fixture (one
    // parameterization per run); fold dim/spread into the tag before
    // using it for paired A/B corpora that must be independent.
    def unif(tag: String, i: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(tag), lit(seed), col("vec_id"), i), lit(1L << 30))
        .cast("double") + lit(0.5)) / lit((1L << 30).toDouble)
    val noise = transform(sequence(lit(0), lit(dim - 1)), i =>
      sqrt(lit(-2.0) * log(unif("mog-u1", i))) *
        cos(lit(2.0 * math.Pi) * unif("mog-u2", i)) * lit(sd))
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("_cid", pmod(col("vec_id"), lit(clusters.toLong)))
      .select(col("vec_id"),
        zip_with(element_at(centMap, col("_cid")), noise,
          (c, nz) => (c + nz).cast("float")).as("embedding"))
  }

  /** `replicas` copies of (vec_id, embedding); replica r circularly
    * rotates coordinates by 7·r and flips the sign of every other
    * element. A coordinate permutation (+ sign pattern) preserves norms
    * and the replica's internal geometry exactly, while cross-replica
    * cosines fall to noise — unlike an additive shift, which aligns all
    * replicas along the shift direction and collapses them into one IVF
    * list. */
  def scaleEmbeddings(embs: DataFrame, replicas: Int): DataFrame =
    (0 until replicas).map { r =>
      val v = col("embedding")
      val shifted =
        if (r == 0) v
        else {
          val n = size(v)
          val k = lit(7 * r) % n
          val rotated = concat(slice(v, k + 1, n - k), slice(v, lit(1), k))
          transform(rotated,
            (x, i) => when(i % 2 === 0, x).otherwise(-x).cast("float"))
        }
      embs.select(
        (col("vec_id") + lit(r * idStride)).as("vec_id"),
        shifted.as("embedding"))
    }.reduce(_.unionByName(_))
}
