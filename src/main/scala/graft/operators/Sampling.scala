package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and split assignment — the
  * training-data-pipeline primitives for carving corpora.
  *
  * Scale rationale: `rand()`-based sampling is not retry-safe (a
  * recomputed task draws different rows — duplicates/losses under
  * speculative execution) and not reproducible across runs. Hashing a
  * stable key is both, and is a pure narrow map: no shuffle, no state,
  * trivially parallel at any corpus size. Different `salt`s give
  * independent samples from the same keys (e.g. a 1% eval carve-out
  * independent of the train/val/test split).
  *
  * Mechanics: the first 8 hex chars of md5(salt:key) are a uniform
  * 32-bit value; thresholds are compared as zero-padded lowercase hex
  * STRINGS, which any engine with md5 reproduces exactly (the DuckDB
  * oracles use the same construction — no float rounding anywhere).
  */
object Sampling {

  /** Uniform [0, 2^32) draw for a key, as an 8-char lowercase hex
    * string. Lexicographic comparison == numeric comparison. */
  def uniformHex(key: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), key.cast("string")).cast("binary")), 1, 8)

  /** 8-hex-char threshold for cumulative probability `p` — public so
    * oracle SQL can be generated from the identical constant. p ≥ 1
    * returns "g", which sorts after every hex string, so a rate-1.0
    * sample keeps ALL keys (a clamped "ffffffff" under the strict `<`
    * compare would drop keys hashing to exactly 0xffffffff). */
  def hexThreshold(p: Double): String =
    if (p >= 1.0) "g" else f"${(p * 4294967296.0).toLong}%08x"

  /** Keep each key with probability `rate`, deterministically. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double, salt: String = "sample"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(uniformHex(col(keyCol), salt) < lit(hexThreshold(rate)))
  }

  /** `CASE WHEN c1 THEN v1 WHEN c2 THEN v2 … ELSE default END` from a
    * (condition, value) list — shared by the split/stratified builders. */
  private def whenChain(cases: Seq[(Column, Column)], default: Column): Column =
    cases.foldLeft(Option.empty[Column]) { case (acc, (cond, v)) =>
      Some(acc.fold(when(cond, v))(_.when(cond, v)))
    }.fold(default)(_.otherwise(default))

  /** Cap each group (source/domain/language) at `quota` rows — the
    * training-mix balancing primitive ("at most N docs per domain").
    * Selection within a group is by hash order (deterministic,
    * unbiased), so reruns and retries keep the identical subset.
    *
    * Scale note: one shuffle on the group key (inherent — a per-group
    * quota needs per-group coordination); for groups ≫ quota, pre-filter
    * with [[hashSample]] at a safe multiple of quota/|group| first so
    * the window sees a bounded candidate set. */
  def groupQuota(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      quota: Int,
      salt: String = "quota"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(uniformHex(col(keyCol), salt), col(keyCol))
    df.withColumn("_qrk", row_number().over(w))
      .filter(col("_qrk") <= quota)
      .drop("_qrk")
  }

  /** Hash-bucket-probed negative sampling — the UNBOUNDED-universe
    * scale path the x35 exact sampler's scaladoc promises: x35 ranks
    * the FULL complement users × broadcast(items) (right at a bounded
    * item universe, impossible when items are an unbounded corpus).
    * Here each user deterministically probes `trials` hash buckets of
    * the item universe (bucket = first hex char of md5 — 16 buckets,
    * the engine-portable discipline of [[uniformHex]]), pulls only
    * those buckets' items through a bucket-keyed equi-join, anti-joins
    * its own interactions, and keeps the k smallest-md5 survivors
    * under the SAME `md5(neg:user:item)` rank x35 uses.
    *
    * Scale shape: no crossJoin, no full-universe broadcast — shuffle
    * volume is |users|·trials probe rows + one pass of the item table,
    * candidate volume |users|·trials·|items|/16 (the knob: more
    * trials, more candidates). Fully deterministic (retry/rerun-safe,
    * oracle-replayable). Contract: a user engaging a whole probed
    * bucket can come up short of k — the shortfall is deterministic
    * and visible (fewer than k rows for that user), the standard
    * accept of probed (vs exhaustive) sampling. */
  def negativeSampleHashProbe(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int,
      trials: Int = 3,
      salt: String = "xneg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && trials > 0, s"k and trials must be positive, got k=$k trials=$trials")
    val ui = interactions.select(col(userCol), col(itemCol)).distinct()
    val items = ui.select(col(itemCol)).distinct()
      .withColumn("_ib", substring(
        md5(concat_ws(":", lit(s"$salt-ibkt"), col(itemCol)).cast("binary")), 1, 1))
    val probes = ui.select(col(userCol)).distinct()
      .select(col(userCol), explode(sequence(lit(0), lit(trials - 1))).as("_t"))
      .select(col(userCol), substring(
        md5(concat_ws(":", lit(s"$salt-probe"), col(userCol), col("_t"))
          .cast("binary")), 1, 1).as("_ib"))
      .distinct() // two trials landing in one bucket probe it once
    val cand = probes.join(items, "_ib")
      .join(ui, Seq(userCol, itemCol), "left_anti")
    val w = Window.partitionBy(col(userCol)).orderBy(
      md5(concat_ws(":", lit("neg"), col(userCol), col(itemCol)).cast("binary")).asc,
      col(itemCol).asc)
    cand.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(userCol), col(itemCol), col("rank"))
  }

  /** Exact weighted budget apportionment: split an integer row `budget`
    * across the groups of `groupCol` proportionally to INTEGER weights
    * (largest-remainder / Hamilton method), then keep each group's
    * allocation by hash order. The training-curation primitive
    * "exactly 100k docs, weighted 7:5:3:1 across sources" —
    * [[stratifiedSample]] gives per-group RATES (binomial counts),
    * [[groupQuota]] a flat CAP; this gives exact proportional COUNTS.
    *
    * Integer weights are the portability contract: floor shares and
    * remainders are pure integer arithmetic (`budget·w / W`,
    * `budget·w mod W`), so any engine replays the allocation
    * bit-for-bit — no float summation order anywhere (the reason
    * weights are `Long`, not `Double`). Groups absent from `weights`
    * use `defaultWeight`; a group allocated more rows than it has
    * simply yields all of them (no reallocation pass — document the
    * shortfall upstream if budgets must be exact-total).
    *
    * Scale: one bounded driver materialization of the group list (loud
    * guard — group keys are source/domain/language-cardinality
    * metadata) + one shuffle on the group key for the per-group rank,
    * identical cost shape to [[groupQuota]]. */
  def apportionSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weights: Map[String, Long],
      defaultWeight: Long,
      budget: Long,
      salt: String = "apportion",
      maxGroups: Int = 100000): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0, s"weights must be non-negative, got $w"))
    val groups = df.select(col(groupCol).cast("string"))
      .distinct().limit(maxGroups + 1).collect().map(_.getString(0))
    require(groups.length <= maxGroups,
      s"apportionSample: more than $maxGroups groups — the allocation table " +
        "must stay driver-small; bucket the group key first")
    val w: Map[String, Long] = groups.map(g => g -> weights.getOrElse(g, defaultWeight)).toMap
    val totalW = w.values.sum
    require(totalW > 0, "apportionSample: all weights are zero")
    val shares = w.map { case (g, wt) => g -> (budget * wt / totalW, budget * wt % totalW) }
    val leftover = budget - shares.values.map(_._1).sum
    val bonus = shares.toSeq
      .sortBy { case (g, (_, rem)) => (-rem, g) }
      .take(leftover.toInt).map(_._1).toSet
    val alloc = shares.map { case (g, (fl, _)) => g -> (fl + (if (bonus(g)) 1L else 0L)) }
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col(groupCol))
      .orderBy(uniformHex(col(keyCol), salt), col(keyCol))
    val allocCol = whenChain(
      alloc.toSeq.sortBy(_._1).map { case (g, n) => (col(groupCol) === g) -> lit(n) },
      lit(0L))
    df.withColumn("_ark", row_number().over(rk))
      .filter(col("_ark") <= allocCol)
      .drop("_ark")
  }

  /** Temperature-scaled source mixing at τ = 1/2 — the multilingual /
    * multi-source rebalancing recipe (multilingual BERT's exponent-
    * smoothed sampling; the same idea weights the Pile/ROOTS mixes):
    * a proportional mix lets the biggest source drown the tail, a
    * uniform mix starves the head, and w_g ∝ n_g^τ sits between.
    * τ = 1/2 is THE committed point because sqrt is the one power
    * IEEE 754 requires correctly rounded — `pow(x, τ)` for any other
    * τ is libm-dependent and would break the oracle-exactness
    * contract (the t12 ln argument, applied to pow).
    *
    * Weights are quantized to exact integers w_g = ⌊Q·√n_g⌋
    * (Q = 2^16 — the [[Importance]] discipline; Q·√n is a power-of-
    * two scale of a correctly-rounded value, so every engine computes
    * the identical long), then the entire allocation + selection is
    * [[apportionSample]]'s integer largest-remainder replay — nothing
    * new to trust downstream of the quantization. A √n of ~2^26
    * saturates long at Q = 2^16 only past n ≈ 2^52 rows per group —
    * unreachable.
    *
    * Scale shape: one map-side-combined (group, count) aggregate
    * (bounded by the loud maxGroups guard) + apportionSample's one
    * group-keyed rank shuffle. */
  def temperatureMix(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      budget: Long,
      salt: String = "tmix",
      quantization: Long = 65536L,
      maxGroups: Int = 100000): DataFrame = {
    require(quantization > 0, s"quantization must be positive, got $quantization")
    val counts = df.groupBy(col(groupCol).cast("string").as("_g"))
      .agg(count(lit(1)).as("_n"))
      .limit(maxGroups + 1).collect()
    require(counts.length <= maxGroups,
      s"temperatureMix: more than $maxGroups groups — the weight table " +
        "must stay driver-small; bucket the group key first")
    val weights: Map[String, Long] = counts.map { r =>
      r.getString(0) ->
        math.floor(quantization.toDouble * math.sqrt(r.getLong(1).toDouble)).toLong
    }.toMap
    apportionSample(df, groupCol, keyCol, weights,
      defaultWeight = 0L, budget = budget, salt = salt, maxGroups = maxGroups)
  }

  /** Token-budget selection: rank docs by a caller-supplied ORDER
    * (quality/diversity score descending, id tiebreak) and keep the
    * prefix whose cumulative token count stays within `tokenBudget` —
    * "the best data that fits the budget", the selection step between
    * scoring and packing in a data recipe. A doc is kept iff the
    * running total INCLUDING it is within budget (first-fit prefix;
    * docs after the first overflow are dropped even if a smaller later
    * doc would fit — prefix semantics keep the cut order-stable and
    * engine-replayable, unlike best-fit knapsack).
    *
    * The global running sum is a TWO-LEVEL distributed prefix sum, not
    * an unpartitioned window (which serializes the corpus into one
    * task — the scale-killer the segmentation path documents): the
    * distributed row index fixes the total order, rows bucket by
    * position, per-bucket subtotals roll up through one tiny window
    * over the bucket list (rows = positions/bucketSize — metadata-
    * scale), and each row's cumulative is its bucket's offset plus a
    * within-bucket running sum under a (bucket)-PARTITIONED window.
    * All integer arithmetic — any engine replays the cut exactly. */
  def tokenBudgetSelect(
      df: DataFrame,
      tokenCol: String,
      orderKeys: Seq[Column],
      tokenBudget: Long,
      bucketSize: Long = 1 << 20): DataFrame = {
    require(tokenBudget >= 0, "tokenBudget must be non-negative")
    require(bucketSize > 0, "bucketSize must be positive")
    require(!df.columns.exists(Seq("_pos", "_bk", "_cum", "_boff").contains),
      "tokenBudgetSelect: _pos/_bk/_cum/_boff are internal column names")
    import org.apache.spark.sql.expressions.Window
    val indexed = RelationalOps.withRowIndex(df, "_pos", orderKeys)
      // `div` = exact integral division (positions are non-negative);
      // `/` on longs is DOUBLE division and drifts past 2^52 positions
      .withColumn("_bk", expr(s"_pos div ${bucketSize}L"))
    val bw = Window.orderBy(col("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = indexed.groupBy(col("_bk"))
      .agg(sum(col(tokenCol)).as("_bsum"))
      .select(col("_bk"),
        coalesce(sum(col("_bsum")).over(bw), lit(0L)).as("_boff"))
    val ww = Window.partitionBy(col("_bk")).orderBy(col("_pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    indexed
      .join(broadcast(offsets), "_bk")
      .withColumn("_cum", col("_boff") + sum(col(tokenCol)).over(ww))
      .filter(col("_cum") <= tokenBudget)
      .drop("_pos", "_bk", "_boff", "_cum")
  }

  /** Per-group sampling rates (e.g. up-weight rare domains, down-weight
    * boilerplate-heavy ones) — deterministic, one narrow pass. Groups
    * absent from `rates` use `defaultRate`. */
  def stratifiedSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "strat"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rates must be in [0,1], got $r"))
    val u = uniformHex(col(keyCol), salt)
    val threshold = whenChain(
      rates.toSeq.sortBy(_._1).map { case (g, r) =>
        (col(groupCol) === g) -> lit(hexThreshold(r))
      },
      lit(hexThreshold(defaultRate)))
    df.filter(u < threshold)
  }

  /** Per-group quantile admission gate — "keep documents at or above
    * their language's Nth-percentile quality": absolute thresholds
    * misfire across heterogeneous groups (a short German doc is not a
    * short English doc), so the cut is RELATIVE to each group's own
    * score distribution.
    *
    * Shape: one grouped percentile aggregate (exact, sort-based — the
    * a10 cost class; at corpus scale swap `percentile` for
    * `percentile_approx`, the a15-documented twin — the gate only moves
    * by the sketch's rank-error bound), a BROADCAST of the per-group
    * thresholds (cardinality = |groups|), one narrow flag pass. The
    * corpus itself is never shuffled.
    *
    * Output: input columns plus `<out>_thresh` (the group's threshold)
    * and `<out>` (metric ≥ threshold). */
  def quantileGate(
      df: DataFrame,
      groupCol: String,
      metricCol: String,
      q: Double,
      out: String = "admit"): DataFrame = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val thresholds = df.groupBy(col(groupCol))
      .agg(percentile(col(metricCol), lit(q)).as(s"${out}_thresh"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .withColumn(out, col(metricCol).cast("double") >= col(s"${out}_thresh"))
  }

  /** Deterministic epoch shuffle: a dense 0-based training ORDER over
    * the keys, re-drawn per epoch (the salt carries the epoch number),
    * key as tiebreaker — reproducible across runs and engines, unlike
    * `orderBy(rand())`. The index rides the engine's distributed row
    * index (range-partitioned sort + AQE-pinned zipWithIndex), NOT a
    * global `row_number()` window — a no-partition window collapses to
    * one task, the exact scale-killer the segmentation path documents.
    * The materialized position is what makes resumable data loaders
    * (skip to step N) possible; consumers that only need the ORDER can
    * sort by [[uniformHex]] directly and skip the index. */
  def epochOrder(
      df: DataFrame,
      keyCol: String,
      epoch: Int,
      outCol: String = "position"): DataFrame =
    RelationalOps.withRowIndex(df, outCol,
      Seq(uniformHex(col(keyCol), s"epoch$epoch"), col(keyCol)))

  /** Epoch-weighted source mixture — the training-mix primitive
    * "2.5 epochs of src0, 0.5 of src1, 1.0 of everything else"
    * (how LLM data recipes up-weight scarce high-quality sources and
    * down-weight boilerplate). Weight `w` yields ⌈w⌉ passes: epochs
    * 0..⌊w⌋−1 keep the whole group, the final partial epoch keeps a
    * frac(w)-rate hash sample. Each output row is tagged with its
    * `epochCol` number; the salt carries the epoch, so partial epochs
    * draw INDEPENDENT subsets (re-reading the same rows every epoch
    * would defeat the mixing). Pure narrow maps + a union — no
    * shuffle, retry-safe, reproducible across runs and engines. */
  def mixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      salt: String = "mix",
      epochCol: String = "epoch"): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0, s"mixture weights must be non-negative, got $w"))
    val epochs = math.ceil((weights.values.toSeq :+ defaultWeight).max).toInt
    require(epochs >= 1, "mixture: all weights are zero — empty mixture")
    val copies = (0 until epochs).map { e =>
      def rate(w: Double): Double = math.min(1.0, math.max(0.0, w - e))
      val u = uniformHex(col(keyCol), s"$salt$e")
      val threshold = whenChain(
        weights.toSeq.sortBy(_._1).map { case (g, w) =>
          (col(groupCol) === g) -> lit(hexThreshold(rate(w)))
        },
        lit(hexThreshold(rate(defaultWeight))))
      df.filter(u < threshold).withColumn(epochCol, lit(e))
    }
    copies.reduce(_.unionByName(_))
  }

  /** Assign every key to one of the named splits with the given weights
    * (must sum to ≤ 1; any remainder falls into the last split). The
    * assignment column is appended; rows never move or duplicate. */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      weights: Seq[(String, Double)],
      salt: String = "split",
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    weights.foreach { case (n, w) => require(w >= 0 && w <= 1, s"weight $n=$w out of [0,1]") }
    require(weights.map(_._2).sum <= 1.0 + 1e-9,
      s"split weights sum to ${weights.map(_._2).sum} > 1")
    val u = uniformHex(col(keyCol), salt)
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val assigned = whenChain(
      weights.zip(cum).dropRight(1).map { case ((name, _), c) =>
        (u < lit(hexThreshold(c))) -> lit(name)
      },
      lit(weights.last._1))
    df.withColumn(outCol, assigned)
  }
}
