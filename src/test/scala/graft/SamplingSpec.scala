package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def keys(n: Int) = (0 until n).map(_.toLong).toDF("k")

  test("hashSample is deterministic, rate-accurate, and salt-independent") {
    val df = keys(10000)
    val a = Sampling.hashSample(df, "k", 0.2).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "k", 0.2).collect().map(_.getLong(0)).toSet
    assert(a == b) // deterministic
    assert(math.abs(a.size / 10000.0 - 0.2) < 0.02, s"rate off: ${a.size}")
    val c = Sampling.hashSample(df, "k", 0.2, salt = "other").collect()
      .map(_.getLong(0)).toSet
    // independent draws: overlap ≈ rate² (4%), far from identical
    val overlap = (a & c).size / 10000.0
    assert(overlap > 0.01 && overlap < 0.1, s"salts not independent: $overlap")
    // rate monotonicity: a 0.2 sample is a subset of a 0.5 sample
    val wide = Sampling.hashSample(df, "k", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wide))
  }

  test("assignSplit covers every row exactly once with ~correct weights") {
    val df = keys(10000)
    val got = Sampling.assignSplit(df, "k",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))).collect()
    assert(got.length == 10000) // no row moved or duplicated
    val byName = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") / 10000.0 - 0.8) < 0.02)
    assert(math.abs(byName("val") / 10000.0 - 0.1) < 0.01)
    assert(math.abs(byName("test") / 10000.0 - 0.1) < 0.01)
  }

  test("groupQuota caps each group, deterministic subset, unbiased by key order") {
    val df = (0 until 1000).map(i => (i.toLong, s"g${i % 4}")).toDF("k", "g")
    val got = Sampling.groupQuota(df, "g", "k", quota = 50).collect()
    val byG = got.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byG.values.forall(_.size == 50))
    // deterministic
    val again = Sampling.groupQuota(df, "g", "k", quota = 50).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byG == again)
    // hash-ordered, not key-ordered: must not just take the 50 smallest keys
    assert(byG("g0") != (0 until 200 by 4).take(50).map(_.toLong).toSet)
    // a smaller quota selects a prefix of the larger quota's hash order
    val q20 = Sampling.groupQuota(df, "g", "k", quota = 20).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    q20.foreach { case (g, s) => assert(s.subsetOf(byG(g))) }
  }

  test("stratifiedSample applies per-group rates") {
    val df = (0 until 9000).map(i => (i.toLong, s"g${i % 3}")).toDF("k", "g")
    val got = Sampling.stratifiedSample(df, "g", "k",
      rates = Map("g0" -> 0.5, "g1" -> 0.2), defaultRate = 0.05).collect()
    val byG = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(math.abs(byG("g0") / 3000.0 - 0.5) < 0.04, byG)
    assert(math.abs(byG("g1") / 3000.0 - 0.2) < 0.03, byG)
    assert(math.abs(byG.getOrElse("g2", 0) / 3000.0 - 0.05) < 0.02, byG)
  }

  test("repetitionSignals: constructed docs with known ratios") {
    val docs = Seq(
      (1L, "a a a a"),            // n=4, distinct=1, top=4
      (2L, "a b c d"),            // n=4, distinct=4, top=1
      (3L, "x x y y y z"),        // n=6, distinct=3, top=3
      (4L, "")                    // n=1 ([""]), distinct=1, top=1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "text")
      .select("doc_id", "n_tokens", "distinct_ratio", "top_share")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4, 0.25, 1.0)))
    assert(got(2L) == ((4, 1.0, 0.25)))
    assert(got(3L) == ((6, 0.5, 0.5)))
    assert(got(4L) == ((1, 1.0, 1.0)))
  }

  test("admissionGate: fixed-order reasons on constructed docs") {
    val enOk = "the cat and the dog walked to the market with a basket of fresh apples today"
    val docs = Seq(
      (1L, enOk),                                        // ok
      (2L, "short"),                                     // low_quality (too short)
      (3L, ("spam " * 40).trim),                         // repetitive (1 distinct token)
      (4L, "der hund und die katze sind mit der frau und der mann in das haus") // language (de)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.admissionGate(docs)
      .select("doc_id", "admit", "reject_reason")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L) == ((true, "ok")))
    assert(got(2L) == ((false, "low_quality")))
    assert(got(3L) == ((false, "repetitive")))
    assert(got(4L) == ((false, "language")))
  }

  test("repetitionSignals plans narrow: no shuffle introduced per doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = TextAnalysis.repetitionSignals(docs, "text")
      .select("doc_id", "n_tokens", "distinct_ratio", "top_share")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"repetition signals must not shuffle:\n$p")
    assert(!p.contains("Generate"), s"repetition signals must not explode:\n$p")
  }

  test("epochOrder: dense permutation, deterministic per epoch, distinct across epochs") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 300L).toDF("doc_id")
    def order(epoch: Int): Seq[Long] =
      Sampling.epochOrder(df, "doc_id", epoch)
        .collect().map(r => (r.getLong(1), r.getLong(0)))
        .sortBy(_._1).map(_._2).toSeq
    val e1 = order(1)
    assert(e1.sorted == (1L to 300L), "positions must cover every key exactly once")
    assert(order(1) == e1, "same epoch must reproduce the same order")
    val e2 = order(2)
    assert(e2.sorted == (1L to 300L))
    assert(e1 != e2, "different epochs must draw different orders")
    // the index path must be the distributed row index, not a global window
    val plan = Sampling.epochOrder(df, "doc_id", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"epochOrder must not use a global window:\n$plan")
  }

  test("chunkSpans: overlap arithmetic, short docs, empty docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 100 tokens at chunk 64 / stride 48 -> ceil(100/48)=3 chunks:
    // [0,64), [48,112)->len 52, [96,160)->len 4
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, "just five little tokens here"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkSpans(df, "doc_id", "text", chunkTokens = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0, 0, 64), (1L, 1, 48, 52), (1L, 2, 96, 4),
      (2L, 0, 0, 5),
      (3L, 0, 0, 0)))
  }

  test("mixture: integer weights give exact full copies, fractional epochs sample") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 1000L).map(i => (i, if (i <= 200) "hot" else if (i <= 400) "cold" else "base"))
      .toDF("id", "src")
    val mixed = Sampling.mixture(df, "src", "id",
      Map("hot" -> 2.5, "cold" -> 0.5), defaultWeight = 1.0)
    val byEpoch = mixed.groupBy("src", "epoch").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // full epochs are exact copies
    assert(byEpoch(("hot", 0)) == 200 && byEpoch(("hot", 1)) == 200)
    assert(byEpoch(("base", 0)) == 600)
    assert(!byEpoch.contains(("base", 1)) && !byEpoch.contains(("cold", 1)))
    // partial epochs land near the rate (md5-uniform, 200 draws)
    assert(math.abs(byEpoch(("hot", 2)) - 100.0) < 40, byEpoch(("hot", 2)))
    assert(math.abs(byEpoch(("cold", 0)) - 100.0) < 40, byEpoch(("cold", 0)))
    // partial epochs draw INDEPENDENT subsets: epoch 2 of hot is not a
    // prefix/subset of epoch 0 (same keys, different salt)
    val e2 = mixed.filter($"src" === "hot" && $"epoch" === 2).select("id")
    assert(e2.count() > 0)
    // deterministic: re-running yields the identical multiset
    val again = Sampling.mixture(df, "src", "id",
      Map("hot" -> 2.5, "cold" -> 0.5), defaultWeight = 1.0)
    assert(mixed.exceptAll(again).count() == 0 && again.exceptAll(mixed).count() == 0)
  }

  test("mixture: zero weight drops a group entirely") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = Seq((1L, "junk"), (2L, "keep")).toDF("id", "src")
    val mixed = Sampling.mixture(df, "src", "id", Map("junk" -> 0.0), defaultWeight = 1.0)
    assert(mixed.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("tokenBudgetSelect: exact prefix cut, invariant across bucket granularities") {
    val df = (1 to 100).map(i => (i.toLong, 10L)).toDF("id", "ntok")
    def ids(bucketSize: Long) = Sampling.tokenBudgetSelect(
        df, "ntok", Seq(col("id").asc), tokenBudget = 255, bucketSize = bucketSize)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // 10 tokens each: 25 docs = 250 <= 255, the 26th would hit 260
    assert(ids(1 << 20) == (1L to 25L), "single-bucket prefix cut wrong")
    // tiny buckets force the cross-bucket offset path — same answer
    assert(ids(7) == (1L to 25L), "bucket-boundary offsets broke the running sum")
    assert(ids(1) == (1L to 25L), "degenerate one-row buckets must still work")
    // edge budgets
    assert(Sampling.tokenBudgetSelect(df, "ntok", Seq(col("id").asc), 0).count() == 0)
    assert(Sampling.tokenBudgetSelect(df, "ntok", Seq(col("id").asc), 1000000).count() == 100)
  }

  test("apportionSample: Hamilton counts exact, total equals budget, deterministic") {
    // 4 groups × 50 rows; weights 7:5:3:1 over budget 100, W = 16 —
    // floor shares (43, 31, 18, 6) = 98, remainders (12, 4, 12, 4):
    // two leftovers go to the largest remainders (a first by name, c)
    val df = (0 until 200).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
    val got = Sampling.apportionSample(df, "grp", "id",
      weights = Map("g0" -> 7L, "g1" -> 5L, "g2" -> 3L, "g3" -> 1L),
      defaultWeight = 1L, budget = 100L)
    val counts = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 44L, "g1" -> 31L, "g2" -> 19L, "g3" -> 6L),
      s"allocation off: $counts")
    assert(counts.values.sum == 100L)
    val again = Sampling.apportionSample(df.repartition(7), "grp", "id",
      weights = Map("g0" -> 7L, "g1" -> 5L, "g2" -> 3L, "g3" -> 1L),
      defaultWeight = 1L, budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet,
      "selection must be partitioning-independent")
  }

  test("temperatureMix: sqrt weighting flattens the head vs proportional, exact integer allocation") {
    // 900 vs 100 rows: proportional gives the head 90%; tau=1/2 gives
    // sqrt(900):sqrt(100) = 30:10 = 75%. Quantized weights are exactly
    // floor(65536*30)=1966080 and 655360, shares divide without
    // remainder -> A=30, B=10 of budget 40, no bonus pass involved
    val df = ((0 until 900).map(i => (i.toLong, "head")) ++
      (1000 until 1100).map(i => (i.toLong, "tail"))).toDF("id", "grp")
    val counts = Sampling.temperatureMix(df, "grp", "id", budget = 40L)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("head" -> 30L, "tail" -> 10L), s"got $counts")
  }

  test("quantileGate: per-group median gate admits exactly the upper half, thresholds exact") {
    val df = (Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L)) ++
      Seq((4L, "b", 100L), (5L, "b", 200L))).toDF("id", "grp", "len")
    val got = Sampling.quantileGate(df, "grp", "len", q = 0.5)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("admit_thresh"), r.getAs[Boolean]("admit"))).toMap
    assert(got(1L) == (20.0, false) && got(2L) == (20.0, true) && got(3L) == (20.0, true))
    assert(got(4L) == (150.0, false) && got(5L) == (150.0, true),
      "interpolated even-count median; the boundary row at the threshold admits")
  }

  test("apportionSample: a group smaller than its share yields all its rows, no reallocation") {
    val df = ((0 until 5).map(i => (i.toLong, "tiny")) ++
      (100 until 200).map(i => (i.toLong, "big"))).toDF("id", "grp")
    val got = Sampling.apportionSample(df, "grp", "id",
      weights = Map("tiny" -> 1L, "big" -> 1L), defaultWeight = 1L, budget = 40L)
    val counts = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("tiny") == 5L, "undersized group keeps everything it has")
    assert(counts("big") == 20L, "other groups keep their own share (documented: no reallocation)")
  }

  test("cluster-balanced sampling: per-cluster cap holds, kept set is a deterministic subset") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroidsMd5(emb, "vec_id", "embedding",
      nlist = 4, salt = "cbal")
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("list_id"))
    val kept = Sampling.groupQuota(assigned, "list_id", "vec_id", quota = 10)
    val perList = kept.groupBy("list_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perList.values.forall(_ <= 10), s"quota violated: $perList")
    // kept rows carry their true assignment (subset, not a re-derive)
    val joined = kept.join(assigned.withColumnRenamed("list_id", "l2"), "vec_id")
    assert(joined.filter(col("list_id") =!= col("l2")).isEmpty)
    val again = Sampling.groupQuota(assigned, "list_id", "vec_id", quota = 10)
      .collect().map(r => r.getLong(0)).sorted.toSeq
    assert(again == kept.collect().map(r => r.getLong(0)).sorted.toSeq,
      "selection must be deterministic across evaluations")
  }
}
