package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via deletion neighborhoods (the FastSS
  * family — Bocek et al., "Fast Similarity Search in Large Dictionaries",
  * 2007): the fuzzy-key join a pipeline reaches for when near-identical
  * keys (typos, OCR noise, re-crawled titles) must be linked without a
  * quadratic comparison.
  *
  * Completeness argument for distance ≤ 1: let sig(s) = {s} ∪ {s with
  * one character deleted}. If lev(x, y) ≤ 1 then sig(x) ∩ sig(y) ≠ ∅ —
  * a substitution at position i meets at both sides' deletion of i, an
  * insertion/deletion meets at the shorter string itself (which is a
  * deletion member of the longer side's set and the self member of its
  * own), and equality meets at the self member. The neighborhood is
  * therefore a COMPLETE signature scheme: candidate generation is an
  * equi-join on the signature, exact `levenshtein` verification filters
  * false candidates (two different deletions can collide, e.g. "abc" /
  * "bcd" share "bc" at distance 2) and can never miss a true pair.
  *
  * Scale shape: (len+1) signature rows per string — LINEAR inflation, a
  * narrow map — then one shuffle on the signature and a bucket
  * self-join. No cross product anywhere; the planner's alternative for
  * a `levenshtein(a, b) <= 1` predicate is a BroadcastNestedLoopJoin
  * over all pairs. Degenerate buckets (a signature shared by a huge
  * near-duplicate cluster) are capped like the LSH path
  * ([[Dedup]] `maxBucketSize`) — the cap drops pairs, loudly documented,
  * and defaults high enough that healthy key spaces never hit it.
  */
object FuzzyJoin {

  /** All (id1, id2, dist) pairs with `levenshtein ≤ 1`, `id1 < id2`,
    * over `df`'s `strCol`. Ids must be distinct per row (a key column).
    * Signature buckets larger than `maxBucketSize` are dropped before
    * the self-join (quadratic-blowup guard; a bucket of b strings is
    * b(b−1)/2 candidate pairs). */
  def editDistance1Join(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxBucketSize: Int = 10000): DataFrame = {
    require(maxBucketSize >= 2, s"maxBucketSize must allow pairs, got $maxBucketSize")
    // self + every single-character deletion; array_union dedups repeated
    // variants (deleting either 'a' of "aa" yields the same string).
    // CASE guards the empty string: sequence(1, 0) would DESCEND in
    // Spark, emitting phantom variants.
    val sigSql =
      s"""CASE WHEN length(`$strCol`) = 0 THEN array(`$strCol`)
          ELSE array_union(
            array(`$strCol`),
            transform(sequence(1, length(`$strCol`)),
              i -> concat(substr(`$strCol`, 1, i - 1), substr(`$strCol`, i + 1))))
          END"""
    val sigs = df
      .select(col(idCol), col(strCol))
      .withColumn("_sig", explode(expr(sigSql)))
      .withColumn("_bsize", count(lit(1)).over(Window.partitionBy(col("_sig"))))
      .filter(col("_bsize") <= maxBucketSize)
      .drop("_bsize")
    val a = sigs.select(col("_sig"), col(idCol).as("id1"), col(strCol).as("s1"))
    val b = sigs.select(col("_sig"), col(idCol).as("id2"), col(strCol).as("s2"))
    a.join(b, Seq("_sig"))
      .filter(col("id1") < col("id2"))
      // a pair can share several signatures (e.g. equal strings share
      // every deletion) — dedup on ids BEFORE the verify so levenshtein
      // runs once per pair; strings are functionally dependent on ids
      .select(col("id1"), col("id2"), col("s1"), col("s2"))
      .distinct()
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= 1)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995, the
    * merge/purge method) — the OTHER classic record-linkage candidate
    * generator beside the deletion-neighborhood join: sort the corpus
    * by a blocking key and compare each row only to its `window − 1`
    * successors. Where [[edit1Join]] is complete for distance ≤ 1,
    * sorted-neighborhood trades bounded recall for a key-agnostic
    * distance: ANY similarity measure can verify the candidates, and
    * the candidate volume is exactly n·(window−1) — the knob a 100 TB
    * entity-resolution pass tunes instead of a quadratic blow-up.
    *
    * Shape: the global sort position comes from the range-partitioned
    * distributed row index ([[RelationalOps.withRowIndex]] — no
    * single-task window); each row then emits `window − 1` probe
    * positions (a narrow literal explode) and ONE equi-join on the
    * index pairs neighbors up. Adjacency only depends on order, so
    * the index base cancels out of the result. Emits both ids and
    * keys; callers verify with their measure of choice. */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val indexed = RelationalOps.withRowIndex(
      df.select(col(idCol), col(keyCol)), "_pos", Seq(col(keyCol), col(idCol)))
    indexed
      .select(col(idCol).as("id_a"), col(keyCol).as("key_a"), col("_pos"),
        explode(typedLit(List.range(1, window))).as("_off"))
      .withColumn("_ppos", col("_pos") + col("_off"))
      .join(indexed.select(col(idCol).as("id_b"), col(keyCol).as("key_b"),
        col("_pos").as("_ppos")), "_ppos")
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"))
  }
}
