package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting — "which raw documents look like the
  * target corpus?", the data-selection step of an LLM training recipe
  * (public method: Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023 — hashed n-gram bag-of-words
  * features, bucketed multinomial likelihood ratio). No analogue in the
  * reference (capability extension, like the rest of the curation
  * suite).
  *
  * Per-document importance log-weight: features are unigrams + word
  * bigrams of the normalized text, hashed into `16^hexChars` buckets;
  * two bucket multinomials are fit with add-1 smoothing (target
  * distribution p̂_t from a "looks like what we want" sample, raw
  * distribution p̂_r from the corpus being selected from); a document's
  * weight is Σ_features log(p̂_t[b]/p̂_r[b]). High scores = looks like
  * target; resampling/top-k selection by this weight shifts the
  * selected corpus toward the target distribution.
  *
  * Exactness discipline (the repo-wide log-free rule, adapted): every
  * count is an exact long; the ONLY float steps are four correctly-
  * rounded long→double divisions/multiplies and one `ln` per BUCKET
  * (≤ 16^hexChars rows — never per document), and the result is
  * immediately quantized to an integer `ratio_q = ⌊Q·ln(r)⌋`
  * (Q = [[DefaultQuantization]] = 2^16 → ~15 µnat resolution, far
  * below any selection-relevant signal). Per-document scores are then
  * EXACT INTEGER sums of `ratio_q` — summation-order-independent, so
  * the DuckDB oracle replays them hash-identically. The single
  * cross-engine float hazard left is `ln` landing within an ulp of a
  * floor boundary; ImportanceSpec asserts every fixture bucket's
  * Q·ln(r) sits ≥ 1e-6 from an integer, so engines agreeing on `ln`
  * to ~1e-8 relative (all of them) cannot flip a floor.
  *
  * Scale shape: feature extraction is a narrow per-row pass (staged
  * token array → filtered array → bigram transform — the
  * materialized-array contract of [[TextAnalysis]]); bucket counting
  * is one map-side-combined aggregate whose shuffle carries ≤ B rows
  * per mapper; the ratio table (≤ B rows) broadcasts; scoring is one
  * doc-keyed aggregate. The corpus is never joined to itself and no
  * driver materialization exceeds B rows. Smoothed factors are
  * computed as (tc+1)/(rc+1) · (Nr+B)/(Nt+B) — two independent
  * divisions, so nothing overflows at any corpus size (the naive
  * cross-multiplied form (tc+1)(Nr+B) overflows long near 10^13
  * occurrences). */
object Importance {

  /** Log-ratio quantization denominator: ratio_q = ⌊Q·ln(r)⌋. */
  val DefaultQuantization: Int = 65536

  /** Hash bucket of one feature: first `hexChars` hex chars of
    * md5(salt:feature) — the [[Sampling.uniformHex]] construction, kept
    * as a STRING key so any engine with md5 replays it exactly. */
  def bucketOf(feat: Column, hexChars: Int, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), feat).cast("binary")), 1, hexChars)

  /** Stage the feature array: normalized whitespace tokens (empties
    * filtered) ++ word bigrams joined by one space. Single-token and
    * empty documents contribute no bigrams (the `size ≥ 2` guard —
    * [[graft.functions.NGramShingles]] would collapse a short array to
    * one whole-array shingle, which is the SHINGLE convention, not the
    * bigram one); an empty document has NO features and therefore no
    * score row (explode drops it — the DuckDB unnest twin drops it
    * identically).
    *
    * Bigrams ride the native single-pass [[TextAnalysis
    * .shinglesFromTokens]] expression, not zip_with-ed shifted slices:
    * the declarative slice form re-evaluated the tokenize+filter chain
    * once per REFERENCE (4 refs) and built two intermediate slice
    * copies per row — measured 4.9 s vs 0.6 s per corpus pass at
    * sf0.1, a 7× stage cost for identical output (bit-for-bit: both
    * join windows of 2 with one space). */
  private def withFeatures(df: DataFrame, textCol: String, out: String): DataFrame = {
    val f = filter(TextAnalysis.tokens(col(textCol)), t => t =!= "")
    val bigrams = when(size(f) >= 2, TextAnalysis.shinglesFromTokens(f, 2))
      .otherwise(array().cast("array<string>"))
    df.withColumn(out, concat(f, bigrams))
  }

  /** One row per feature OCCURRENCE: all input columns except the text,
    * plus the occurrence's hash `bucket`. */
  def featureBuckets(
      df: DataFrame,
      textCol: String,
      hexChars: Int = 2,
      salt: String = "dsir"): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars must be in [1,4] (16..65536 buckets), got $hexChars")
    withFeatures(df, textCol, "_imp_feats")
      .withColumn("_imp_feat", explode(col("_imp_feats")))
      .withColumn("bucket", bucketOf(col("_imp_feat"), hexChars, salt))
      .drop("_imp_feats", "_imp_feat", textCol)
  }

  /** Quantized per-bucket log-likelihood ratios: (bucket, tc, rc,
    * ratio_q) with ratio_q = ⌊Q · ln((tc+1)/(rc+1) · (Nr+B)/(Nt+B))⌋,
    * B = 16^hexChars buckets, add-1 smoothing. The table is keyed by
    * RAW buckets (left-joined target counts smooth to 0): the scoring
    * precondition is raw ⊇ scored documents, so every scoreable
    * feature occurs in raw and the table is total for scoring. ≤ B
    * rows — broadcastable at any corpus size. */
  def logRatioTable(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      hexChars: Int = 2,
      salt: String = "dsir",
      quantization: Int = DefaultQuantization): DataFrame = {
    require(quantization > 0, s"quantization must be positive, got $quantization")
    val b = math.pow(16, hexChars).toLong
    val tc = featureBuckets(target.select(col(textCol)), textCol, hexChars, salt)
      .groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
    val rc = featureBuckets(raw.select(col(textCol)), textCol, hexChars, salt)
      .groupBy(col("bucket")).agg(count(lit(1)).as("rc"))
    val joined = rc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("tc"), lit(0L)).as("tc"), col("rc"))
    // scalar totals ride a broadcast nested-loop against the ≤B-row
    // table (the a24/chi-square idiom — never a global window)
    val totals = joined.agg(sum(col("tc")).as("nt"), sum(col("rc")).as("nr"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("tc"), col("rc"),
        floor(lit(quantization.toDouble) * log(
          (col("tc") + lit(1L)).cast("double") / (col("rc") + lit(1L)).cast("double")
            * ((col("nr") + lit(b)).cast("double") / (col("nt") + lit(b)).cast("double"))))
          .as("ratio_q"))
  }

  /** Per-document importance scores against a [[logRatioTable]]:
    * (idCol, n_feats, score_q) where score_q = Σ_occurrences ratio_q —
    * an exact integer (long: |ratio_q| ≤ Q·|ln r| ≲ 2^21, so overflow
    * needs ~2^42 features in ONE document). Inner join on the bucket:
    * total under the raw ⊇ docs precondition (see [[logRatioTable]]);
    * documents with no features (empty text) yield no row. */
  def importanceScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ratios: DataFrame,
      hexChars: Int = 2,
      salt: String = "dsir"): DataFrame =
    featureBuckets(docs.select(col(idCol), col(textCol)), textCol, hexChars, salt)
      .join(broadcast(ratios.select(col("bucket"), col("ratio_q"))), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio_q")).as("score_q"))

  /** Top-k selection by importance (the paper's top-k variant of
    * importance resampling): highest score_q first, id ascending as
    * the deterministic tiebreak. Plans as TakeOrderedAndProject —
    * never a global sort of the corpus. */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    scored.orderBy(col("score_q").desc, col(idCol).asc).limit(k)
  }

  /** Composed scoring of a corpus against a target sample drawn FROM
    * it — the common pipeline shape (raw = the corpus being selected
    * from, target = a filter of it). The corpus occurrence frame is
    * staged ONCE ([[graft.CachePool]]-registered persist — the caller
    * releases at the pipeline boundary) and feeds BOTH the raw bucket
    * counts and the per-doc scoring, halving the corpus tokenization
    * passes vs composing [[logRatioTable]] + [[importanceScores]] by
    * hand.
    *
    * Measured NON-optimization, kept as a warning: pre-aggregating the
    * staged frame to (doc, bucket, n) before scoring — score-neutral
    * by integer arithmetic — LOST ~2× end-to-end at sf0.1 (3.4 s →
    * 9.0 s). At hexChars = 2 a typical document touches most of the
    * 256 buckets, so the "compression" was 536k → 320k rows (1.7×)
    * while adding a full (doc, hex-string-bucket)-keyed hash-aggregate
    * exchange ahead of the cache. The occurrence frame stays
    * unaggregated; the one shuffle that exists is the final doc-keyed
    * scoring aggregate, whose map-side partials already compress to
    * one row per (doc, partition). */
  def scoreAgainstTarget(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetFilter: Column,
      hexChars: Int = 2,
      salt: String = "dsir",
      quantization: Int = DefaultQuantization): DataFrame = {
    val b = math.pow(16, hexChars).toLong
    val occ = graft.CachePool.register(
      featureBuckets(docs.select(col(idCol), docs(textCol),
          targetFilter.as("_imp_tgt")), textCol, hexChars, salt)
        .persist())
    val tc = occ.filter(col("_imp_tgt"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
    val rc = occ.groupBy(col("bucket")).agg(count(lit(1)).as("rc"))
    val joined = rc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("tc"), lit(0L)).as("tc"), col("rc"))
    // scalar totals ride a broadcast nested-loop against the ≤B-row
    // table (the a24/chi-square idiom — never a global window)
    val totals = joined.agg(sum(col("tc")).as("nt"), sum(col("rc")).as("nr"))
    val ratios = joined.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(lit(quantization.toDouble) * log(
          (col("tc") + lit(1L)).cast("double") / (col("rc") + lit(1L)).cast("double")
            * ((col("nr") + lit(b)).cast("double") / (col("nt") + lit(b)).cast("double"))))
          .as("ratio_q"))
    occ.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio_q")).as("score_q"))
  }
}
