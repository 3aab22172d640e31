package graft

import graft.operators.{Dedup, ScaleFixture, Similarity}
import org.apache.spark.sql.functions._

/** Growth assertions behind the 100 TB design claims: candidate volume
  * of the bucketed dedup/ANN paths must grow near-linearly with corpus
  * size. A quadratic path (all-pairs, or degenerate buckets) multiplies
  * by ~replicas² and fails these bounds immediately. Fixture: sf0.001
  * scaled 1x → 5x with cross-replica similarity destroyed
  * (ScaleFixture), so the truthful growth factor is ~5.
  */
class ScaleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("LSH near-dup candidate volume grows near-linearly, pairs stay exact") {
    val docs1 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs5 = ScaleFixture.scaleDocuments(docs1, 5)
    assert(docs5.count() == 5 * docs1.count())

    val cand1 = Dedup.lshCandidatePairs(docs1, "doc_id", "text").count()
    val cand5 = Dedup.lshCandidatePairs(docs5, "doc_id", "text").count()
    assert(cand1 > 0, "fixture must produce candidates")
    // near-linear: ≤ 7x for 5x data (cross-replica collisions are rare);
    // a quadratic path would show ~25x
    assert(cand5 <= 7 * cand1, s"candidate growth $cand1 -> $cand5 is super-linear")
    assert(cand5 >= 4 * cand1, s"replicas must contribute candidates ($cand1 -> $cand5)")

    // verified pair set: each replica reproduces the 1x pairs (the
    // perturbation is a bijection, Jaccard is preserved within replicas)
    val pairs1 = Dedup.nearDupPairs(docs1, "doc_id", "text", 0.5).count()
    val pairs5 = Dedup.nearDupPairs(docs5, "doc_id", "text", 0.5).count()
    assert(pairs5 == 5 * pairs1, s"expected ${5 * pairs1} pairs, got $pairs5")
  }

  test("sign-LSH bucket candidate volume stays far below all-pairs at 5x") {
    val embs5 = ScaleFixture.scaleEmbeddings(
      spark.read.parquet(s"$dir/embeddings.parquet"), 5)
    val n = embs5.count()
    val sumSq = Similarity.bucketStats(embs5, "embedding", 64, 8)
      .agg(sum(col("bucket_size") * col("bucket_size")))
      .head().getLong(0)
    // Σ|bucket|² is the compared-pair volume; must be well under n²
    assert(sumSq < n * n / 10, s"bucketing degenerate: sumSq=$sumSq vs n²=${n * n}")
  }

  test("IVF occupancy: list count fixed, per-list mass grows ~linearly") {
    val embs1 = spark.read.parquet(s"$dir/embeddings.parquet")
    val embs5 = ScaleFixture.scaleEmbeddings(embs1, 5)
    def occupancy(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 16)
      val occ = Similarity.ivfAssign(df, cents, "vec_id", "embedding")
        .groupBy(col("list_id")).count()
      (occ.count(), occ.agg(max(col("count"))).head().getLong(0).toDouble)
    }
    val (lists1, max1) = occupancy(embs1)
    val (lists5, max5) = occupancy(embs5)
    assert(lists1 <= 16 && lists5 <= 16)
    // probed-candidate volume per probe is bounded by list occupancy:
    // the largest list must grow ~5x (linear), not ~25x
    assert(max5 <= 7 * max1, s"max list occupancy $max1 -> $max5 super-linear")
  }

  test("repeated n-gram span volume grows ~linearly: perturbed replicas share no shingles") {
    import graft.operators.{Dedup, ScaleFixture}
    val docs1 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs5 = ScaleFixture.scaleDocuments(docs1, 5)
    try {
      val n1 = Dedup.repeatedNgramSpans(docs1, "doc_id", "text").count()
      val n5 = Dedup.repeatedNgramSpans(docs5, "doc_id", "text").count()
      assert(n1 > 0, "fixture must contain shared shingles (planted dups)")
      // cross-replica sharing would multiply repeated spans
      // super-linearly; the alphabet rotation must prevent that
      assert(n5 <= 6 * n1, s"repeated spans $n1 -> $n5 super-linear at 5x")
      assert(n5 >= 4 * n1, s"repeated spans $n1 -> $n5 lost replicas")
    } finally graft.CachePool.releaseAll()
  }
}
