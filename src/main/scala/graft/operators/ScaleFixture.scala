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
