package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed model-evaluation metrics for filter/classifier tuning —
  * the feedback loop of a data pipeline: a quality classifier's scores
  * only earn their admission threshold through ranking metrics over the
  * labeled corpus, and at corpus scale those metrics must themselves be
  * distributed (a `collect()`-and-sklearn step dies at 10⁹ rows).
  */
object Evaluation {

  /** ROC-AUC via the tie-corrected Mann-Whitney rank sum — with NO
    * global per-row ranking. Rows first collapse to one row per
    * DISTINCT score (a map-side-combined hash aggregate carrying
    * `(pos, total)` counts), and the rank prefix sums run over the
    * distinct-score frame through the same TWO-LEVEL distributed
    * prefix sum as [[Sampling.tokenBudgetSelect]]: a range-partitioned
    * distributed row index fixes the score order, scores bucket by
    * position, per-bucket subtotals roll up through one tiny window
    * over the bucket list (metadata-scale), and each score's
    * strictly-below count is its bucket offset plus a within-bucket
    * running sum under a (bucket)-PARTITIONED window. No stage ever
    * serializes the distinct-score set into one task.
    *
    * Exactness: with `c` rows tied at a score and `cumBefore` rows
    * strictly below, the tied rows' average rank is
    * `cumBefore + (c+1)/2`, so `2·R_pos = Σ pos·(2·cumBefore + c + 1)`
    * stays in BIGINT; `AUC = (2·R_pos − n_pos·(n_pos+1)) / (2·n_pos·n_neg)`
    * is ONE terminal IEEE division of exact integers — bit-identical on
    * any engine (ties contribute the standard ½ credit).
    *
    * Cardinality contract: the shuffled frame is |distinct scores|
    * rows. For continuous scores quantize upstream (bin width = the
    * resolution the threshold sweep needs); integer/low-cardinality
    * scores pass through unchanged.
    *
    * Output: one row — `n_pos`, `n_neg`, `numer2` (= 2·(R_pos −
    * n_pos(n_pos+1)/2), exact), `auc` (null when a class is empty). */
  def rocAuc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bucketSize: Long = 1 << 20): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val byScore = df
      .groupBy(col(scoreCol).as("_s"))
      .agg(
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("_pos"),
        count(lit(1)).as("_c"))
    val indexed = RelationalOps.withRowIndex(byScore, "_sp", Seq(col("_s")))
      .withColumn("_bk", expr(s"_sp div ${bucketSize}L"))
    val bw = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = indexed.groupBy(col("_bk"))
      .agg(sum(col("_c")).as("_bsum"))
      .select(col("_bk"),
        coalesce(sum(col("_bsum")).over(bw), lit(0L)).as("_boff"))
    val ww = Window.partitionBy(col("_bk")).orderBy(col("_sp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = indexed
      .join(broadcast(offsets), "_bk")
      .withColumn("_below", col("_boff") + coalesce(sum(col("_c")).over(ww), lit(0L)))
    ranked
      .agg(
        sum(col("_pos") * (lit(2L) * col("_below") + col("_c") + lit(1L))).as("_two_rpos"),
        sum(col("_pos")).as("n_pos"),
        sum(col("_c") - col("_pos")).as("n_neg"))
      .select(
        col("n_pos"), col("n_neg"),
        (col("_two_rpos") - col("n_pos") * (col("n_pos") + lit(1L))).as("numer2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("_two_rpos") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }

  /** Calibration (reliability-diagram) bins — AUC's companion metric:
    * AUC says the classifier RANKS well; calibration says its scores
    * MEAN what they claim (a quality filter admitting "p ≥ 0.9" docs
    * needs bin 9's observed rate to actually be ~0.9). Scores arrive
    * as INTEGERS in [0, scale] (quantize upstream — same contract as
    * [[rocAuc]]'s cardinality note, and the reason every aggregate
    * here is exact): bin b = min(score·bins div scale, bins−1), one
    * map-side-combined hash aggregate of `bins` output rows carrying
    * exact BIGINT (count, positives, score-sum), then per-bin
    * `mean_pred` and `obs_rate` as ONE terminal IEEE division each of
    * exact integers — bit-identical on any engine. Empty bins emit no
    * row (no 0/0).
    *
    * Scale shape: ONE aggregate over the corpus, `bins` rows out —
    * nothing downstream of the map-side combine depends on corpus
    * size. */
  def calibrationBins(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int = 10,
      scale: Long = 1000L): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(scale > 0, s"scale must be positive, got $scale")
    val bin = least(
      expr(s"(`$scoreCol` * ${bins}L) div ${scale}L"), lit(bins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol)).as("sum_s"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_s"),
        (col("sum_s").cast("double") /
          (lit(scale.toDouble) * col("n").cast("double"))).as("mean_pred"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("obs_rate"))
  }

  /** Cohen's kappa between two binary gates — the filter-redundancy
    * audit (AUC ranks one gate, calibration checks its honesty, kappa
    * asks whether two gates are SAYING THE SAME THING): chance-corrected
    * agreement from the 2×2 contingency counts. κ ≈ 1 means the second
    * filter is redundant compute at 100 TB; κ ≈ 0 means it screens an
    * independent failure mode and earns its scan.
    *
    * ONE map-side-combined aggregate over the fact scan → a single row
    * of exact BIGINT cell counts; po/pe/kappa are a fixed IEEE
    * expression DAG over those integers (log-free — kappa needs no
    * transcendental, unlike PSI/KL drift scores; [[psiDriftBins]]
    * commits PSI too by paying for its one ln per BIN with the DSIR
    * quantization discipline). */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol)
    val b = col(bCol)
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(when(a && b, 1L).otherwise(0L)).as("n11"),
      sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
      sum(when(!a && b, 1L).otherwise(0L)).as("n01"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("n00"))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")) / n
    val pa = (col("n11") + col("n10")) / n
    val pb = (col("n11") + col("n01")) / n
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    agg.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      po.as("po"), pe.as("pe"),
      ((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the third leg of the
    * drift family: a23's chi-square needs categorical cells, x30's PSI
    * needs binning (and pays one quantized ln per bin); KS compares
    * the FULL empirical CDFs of a numeric column with no bins and no
    * transcendental at all — D = max_v |F_ref(v) − F_cur(v)|, the
    * statistic behind "did this column's distribution move?" tests.
    *
    * Exactness: rows collapse to one row per DISTINCT value carrying
    * exact (n_ref, n_cur) counts; inclusive cumulative counts run
    * through the SAME two-level distributed prefix sum as [[rocAuc]]
    * (range-partitioned row index → bucket offsets through one
    * metadata-scale window → bucket-partitioned running sums — no
    * stage serializes the distinct-value set into one task). The max
    * is taken over the exact integer cross-difference
    * `d_num = |cum_ref·N_cur − cum_cur·N_ref|` (argmax under a total
    * order: d_num desc, value asc — a TakeOrderedAndProject, never a
    * global sort), and `ks_stat = d_num / (N_ref·N_cur)` is ONE
    * terminal IEEE division of exact integers. BIGINT bound:
    * cum·N < 2^63 holds through ~3×10⁹ rows per snapshot; past that,
    * lift d_num to decimal (the x20 numer2 contract).
    *
    * Output: one row — n_ref, n_cur, d_num, at_value (where the CDFs
    * diverge most), ks_stat. */
  def ksStatistic(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      bucketSize: Long = 1 << 20): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val v = col(valueCol)
    val byVal = ref.select(v.as("_v"), lit(1L).as("_r"), lit(0L).as("_c"))
      .unionByName(cur.select(v.as("_v"), lit(0L).as("_r"), lit(1L).as("_c")))
      .groupBy(col("_v")).agg(sum(col("_r")).as("_nr"), sum(col("_c")).as("_nc"))
    val indexed = RelationalOps.withRowIndex(byVal, "_sp", Seq(col("_v")))
      .withColumn("_bk", expr(s"_sp div ${bucketSize}L"))
    val bw = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = indexed.groupBy(col("_bk"))
      .agg(sum(col("_nr")).as("_bsr"), sum(col("_nc")).as("_bsc"))
      .select(col("_bk"),
        coalesce(sum(col("_bsr")).over(bw), lit(0L)).as("_or"),
        coalesce(sum(col("_bsc")).over(bw), lit(0L)).as("_oc"))
    val ww = Window.partitionBy(col("_bk")).orderBy(col("_sp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = indexed
      .join(broadcast(offsets), "_bk")
      .withColumn("_cr", col("_or") + sum(col("_nr")).over(ww))
      .withColumn("_cc", col("_oc") + sum(col("_nc")).over(ww))
    val totals = byVal.agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    cums.crossJoin(broadcast(totals))
      .select(col("_v"), col("_tr"), col("_tc"),
        abs(col("_cr") * col("_tc") - col("_cc") * col("_tr")).as("_dn"))
      .orderBy(col("_dn").desc, col("_v").asc).limit(1)
      .select(col("_tr").as("n_ref"), col("_tc").as("n_cur"),
        col("_dn").as("d_num"), col("_v").as("at_value"),
        (col("_dn").cast("double") /
          (col("_tr").cast("double") * col("_tc").cast("double"))).as("ks_stat"))
  }

  /** Population Stability Index drift bins — the distribution-drift
    * monitor a production corpus pipeline runs between snapshots
    * ("has this month's crawl shifted against last month's?"). PSI =
    * Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref) over bins fixed from the
    * REFERENCE deciles (the standard recipe: bin edges frozen on ref,
    * both snapshots counted into them; rule of thumb: < 0.1 stable,
    * > 0.25 shifted).
    *
    * Exactness (the [[Importance]] discipline applied to the one
    * transcendental): bin bounds are `bins−1` exact interpolated
    * percentiles of ref (the a10/x29 quantile_cont agreement,
    * `percentile_approx` swap at 100 TB exactly as a10 → a15); bin
    * membership is the x29 cleared-bounds comparison fold; per-bin
    * counts are exact longs over a FULL 0..bins−1 spine (empty bins
    * carry smoothing mass, the a23 zero-cell rule). The likelihood
    * ratio gets add-1 smoothing — r = ((n_cur+1)/(N_cur+bins)) /
    * ((n_ref+1)/(N_ref+bins)), three correctly-rounded divisions —
    * and ONE ln per bin, immediately quantized to the integer
    * `ratio_q = ⌊Q·ln r⌋` (Q = 2^16; the floor-boundary margin is
    * spec-asserted as in ImportanceSpec). `psi_contrib` is then a
    * fixed IEEE DAG of exact integers and ratio_q — smoothed
    * (p_cur − p_ref) · ratio_q/Q, where /Q is an exact power-of-two
    * scale — bit-identical on any engine. Per-bin rows ARE the
    * committed report (a x24-style diagnostic table); the scalar PSI
    * is the user's order-free sum of `psi_contrib`.
    *
    * Scale shape: one percentile aggregate over ref + one counting
    * aggregate per snapshot, all map-side combined; everything past
    * those combines is `bins` rows. The snapshots are never joined
    * row-to-row. */
  def psiDriftBins(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      bins: Int = 10,
      quantization: Int = 65536): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = ref.sparkSession
    val v = col(valueCol)
    val bounds = ref.agg(
      percentile(v, typedLit((1 until bins).map(_.toDouble / bins))).as("_b"))
    def binCounts(df: DataFrame, out: String): DataFrame =
      df.select(v).crossJoin(broadcast(bounds))
        .select(psiBinOf(v, col("_b")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    val grid = spine
      .join(binCounts(ref, "_nr"), Seq("bin"), "left")
      .join(binCounts(cur, "_nc"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("_nr"), lit(0L)).as("n_ref"),
        coalesce(col("_nc"), lit(0L)).as("n_cur"))
    psiReport(grid, bins, quantization)
  }

  /** Bin of `v` against a bounds ARRAY column — the x29 cleared-bounds
    * comparison fold shared by the batch and streaming PSI paths (the
    * expression shape IS the cross-engine/batch-parity contract). */
  def psiBinOf(v: Column, boundsArr: Column): Column =
    aggregate(boundsArr, lit(0),
      (acc, b) => acc + when(v > b, 1).otherwise(0)).cast("int")

  /** [[psiBinOf]] for PLAN-TIME literal bounds — the identical
    * comparison fold unrolled into a codegen'd when-chain sum. The
    * array-HOF form is CodegenFallback (interpreted per element per
    * row — the a35 audit found it carrying ~60% of a 100×-replicate
    * explode's cost); with literal bounds the unroll is free and
    * value-identical: same `v > bound` compares, same integer sum.
    * Keep the HOF form for DATA-carried bounds arrays (streaming
    * drift's per-batch reference bounds). */
  def psiBinOfLiteral(v: Column, bounds: Seq[Double]): Column = {
    require(bounds.nonEmpty, "psiBinOfLiteral needs at least one bound")
    bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .reduceLeft(_ + _).cast("int")
  }

  /** Gini concentration index per group — the inequality statistic a
    * corpus curator reads to answer "is this language's token mass
    * concentrated in a few giant documents?" (high Gini → a handful of
    * docs dominate the training mix; the x11 mixture weights then
    * over-sample boilerplate). G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over ascending ranks i = 1..n within the group.
    *
    * Exactness and scale ride the SAME collapse: rows are first
    * reduced to (group, value) → count (map-side combined — the only
    * corpus-width shuffle), and the DOUBLED rank-weighted sum over a
    * run of `c` equal values x starting at rank r₀ is the closed form
    * 2·Σᵢ i·x = x·(2·c·r₀ + c·(c−1)) — products only, never a
    * division, so the window ranks DISTINCT values per group
    * (cardinality ≪ rows; the KS run-collapse), every term is an
    * exact DECIMAL(38,0), and `gini` is ONE terminal IEEE division
    * of exact integer numerator/denominator (the x20/a29 contract).
    * Values must be non-negative integers (doc lengths, token counts);
    * groups with Σx = 0 return null.
    *
    * Output: group, n (rows), gini. */
  def giniIndex(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    val byVal = df.select(g, v.cast("long").as("_v"))
      .groupBy(g, col("_v")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(g).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val ranked = byVal
      .withColumn("_r0", sum(col("_c")).over(w) - col("_c") + 1L)
      .select(g,
        col("_c"),
        (col("_v").cast(dec) * col("_c").cast(dec)).as("_sx"),
        (col("_v").cast(dec) *
          (lit(2).cast(dec) * col("_c").cast(dec) * col("_r0").cast(dec) +
            col("_c").cast(dec) * (col("_c") - 1L).cast(dec))).as("_six2"))
    val sums = ranked.groupBy(g).agg(
      sum(col("_c")).as("_n"),
      sum(col("_sx")).cast(dec).as("_tsx"),
      sum(col("_six2")).cast(dec).as("_tsix2"))
    sums.select(g, col("_n").as("n"),
      when(col("_tsx") > 0,
        (col("_tsix2") - (col("_n") + 1L).cast(dec) * col("_tsx"))
          .cast("double") /
          (col("_n").cast(dec) * col("_tsx")).cast("double"))
        .as("gini"))
  }

  /** The PSI report DAG over a COMPLETE (bin, n_ref, n_cur) grid —
    * see [[psiDriftBins]] for the exactness argument. Shared verbatim
    * by [[graft.streaming.StreamingDrift]] so the streaming read-back
    * is bit-identical to the batch report by construction. */
  def psiReport(grid: DataFrame, bins: Int, quantization: Int): DataFrame = {
    require(quantization > 0, s"quantization must be positive, got $quantization")
    val totals = grid.agg(
      sum(col("n_ref")).as("_tr"), sum(col("n_cur")).as("_tc"))
    val pr = (col("n_ref") + 1L).cast("double") /
      (col("_tr") + bins.toLong).cast("double")
    val pc = (col("n_cur") + 1L).cast("double") /
      (col("_tc") + bins.toLong).cast("double")
    val ratioQ = floor(lit(quantization.toDouble) * log(pc / pr)).cast("long")
    grid.crossJoin(broadcast(totals))
      .withColumn("ratio_q", ratioQ)
      .select(col("bin"), col("n_ref"), col("n_cur"), col("ratio_q"),
        ((pc - pr) * (col("ratio_q").cast("double") / lit(quantization.toDouble)))
          .as("psi_contrib"))
  }
}
