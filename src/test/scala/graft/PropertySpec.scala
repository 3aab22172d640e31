package graft

import graft.operators.{Dedup, RelationalOps, Segmentation, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: ScalaCheck generators with a fixed seed feed a
  * single DataFrame per property, so each property is one Spark job over
  * all generated cases (per-case jobs would be prohibitively slow). */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val genText: Gen[String] = Gen.listOfN(
    60,
    Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('!', '.', ',', '?', ';', ':', '#', '@', 'Ä', 'ß'),
      1 -> Gen.const('\t'))).map(_.mkString)

  private lazy val texts: Seq[String] =
    sample(Gen.listOfN(300, genText), 42L) :+ "" :+ "   " :+ "a" :+ "ÄÖÜ!!!"

  test("normalize is idempotent and its output alphabet is [a-z0-9 \\s]") {
    val df = texts.toDF("t")
      .select(
        TextAnalysis.normalize(col("t")).as("n1"),
        TextAnalysis.normalize(TextAnalysis.normalize(col("t"))).as("n2"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent: ${r.getString(0)}")
      assert(r.getString(0).forall(c => c.isDigit || ('a' to 'z').contains(c) || c.isWhitespace),
        s"bad char in: ${r.getString(0)}")
    }
  }

  test("shingle count is max(1, tokens - k + 1) for every k in 1..4") {
    val df = TextAnalysis.withTokens(texts.toDF("t"), "t")
    (1 to 4).foreach { k =>
      val got = df.select(
        size(col("_toks")).as("n"),
        size(TextAnalysis.shinglesFromTokens(col("_toks"), k)).as("s"))
        .collect()
      got.foreach { r =>
        val n = r.getInt(0); val s = r.getInt(1)
        assert(s == math.max(1, n - k + 1), s"k=$k n=$n s=$s")
      }
    }
  }

  test("jaccard is 1 on self, symmetric, and within [0,1]") {
    val pairs = texts.zip(texts.reverse).toDF("a", "b")
    val got = pairs.select(
      Dedup.jaccard(col("a"), col("a"), 2).as("self"),
      Dedup.jaccard(col("a"), col("b"), 2).as("ab"),
      Dedup.jaccard(col("b"), col("a"), 2).as("ba"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == r.getDouble(2))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("segmentation is a lossless, duplicate-free, exact-size cover for random shapes") {
    val shapes = sample(Gen.listOfN(4, Gen.zip(
      Gen.chooseNum(1, 3000), Gen.chooseNum(1, 500))), 7L)
    shapes.foreach { case (rows, per) =>
      val df = (0 until rows).map(i => (i * 31 % rows, i)).toDF("k", "ord")
      val seg = Segmentation.segmented(df, per.toLong, Seq("ord"))
      val sizes = seg.groupBy("segment").count()
        .orderBy("segment").collect().map(r => (r.getLong(0), r.getLong(1)))
      val expSegs = (rows + per - 1) / per
      assert(sizes.length == expSegs, s"rows=$rows per=$per got=${sizes.length}")
      sizes.zipWithIndex.foreach { case ((segId, cnt), i) =>
        assert(segId == i)
        val expected = if (i < expSegs - 1) per.toLong else (rows - per.toLong * (expSegs - 1))
        assert(cnt == expected, s"rows=$rows per=$per seg=$i cnt=$cnt")
      }
      assert(seg.select("ord").distinct().count() == rows)
    }
  }

  test("hash sampling is monotone in rate and split assignment is key-pure") {
    import graft.operators.Sampling
    val keys = sample(Gen.listOfN(2000, Gen.chooseNum(0L, Long.MaxValue / 2)), 13L)
      .distinct.toDF("k")
    // monotone: sample(r1) ⊆ sample(r2) for every r1 < r2
    val rates = Seq(0.05, 0.2, 0.5, 0.9)
    val samples = rates.map(r =>
      Sampling.hashSample(keys, "k", r).collect().map(_.getLong(0)).toSet)
    samples.sliding(2).foreach { case Seq(s1, s2) => assert(s1.subsetOf(s2)) }
    // key-purity: the split of a key never depends on other columns
    val withPayload = keys.withColumn("payload", concat(lit("p"), col("k")))
    val s1 = Sampling.assignSplit(keys, "k", Seq(("a", 0.5), ("b", 0.5)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.assignSplit(withPayload, "k", Seq(("a", 0.5), ("b", 0.5)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2)
  }

  test("repetition signals satisfy pigeonhole bounds on random texts") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.repetitionSignals(texts.toDF("text"), "text")
      .select("n_tokens", "distinct_ratio", "top_share").collect()
    got.foreach { r =>
      val n = r.getInt(0); val dr = r.getDouble(1); val ts = r.getDouble(2)
      assert(n >= 1)
      assert(dr > 0 && dr <= 1.0, s"distinct_ratio $dr out of range")
      assert(ts > 0 && ts <= 1.0, s"top_share $ts out of range")
      // pigeonhole: max frequency ≥ n / distinct ⇒ ts * dr * n ≥ 1
      assert(ts * dr * n >= 1.0 - 1e-9, s"pigeonhole violated: n=$n dr=$dr ts=$ts")
    }
  }

  test("withRowIndex is a bijection onto 0..n-1 respecting the order") {
    val df = sample(Gen.listOfN(500, Gen.chooseNum(-1000000, 1000000)), 11L)
      .distinct.toDF("x")
    val n = df.count()
    val idx = RelationalOps.withRowIndex(df, "i", Seq(col("x")))
    val rows = idx.collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq == (0L until n))
    assert(rows.sortBy(_._2).map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("asofJoin matches a naive per-key scan on random keyed event sets") {
    import graft.operators.TemporalJoin
    val genLeft = Gen.listOfN(400, for {
      k <- Gen.chooseNum(0L, 7L); t <- Gen.chooseNum(0L, 200L)
    } yield (k, t))
    val genRight = Gen.listOfN(150, for {
      k <- Gen.chooseNum(0L, 9L); t <- Gen.chooseNum(0L, 220L)
      v <- Gen.chooseNum(1L, 1000L)
    } yield (k, t, v))
    val leftRows = sample(genLeft, 17L).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    // one value per (key, time): the operator contract (carry order
    // between equal-time right rows is undefined)
    val rightRows = sample(genRight, 23L)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

    val got = TemporalJoin.asofJoin(
        leftRows.toDF("id", "k", "t"),
        rightRows.toDF("k", "rt", "rv").withColumn("r_t", col("rt")),
        Seq("k"), "t", "rt")
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getAs[Any]("r_t")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Long])))).toMap

    val byKey = rightRows.groupBy(_._1)
    leftRows.foreach { case (id, k, t) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(_._2)
        .lastOption
      assert(got(id) == ((want.map(_._2), want.map(_._3))),
        s"id=$id key=$k t=$t: got ${got(id)}, want $want")
    }
    assert(got.size == leftRows.size, "every left row must appear exactly once")
  }

  test("snapshotDiff matches a reference Scala diff on random keyed payloads") {
    import graft.operators.ChangeCapture
    val genKV: Gen[(Long, Option[String])] = for {
      k <- Gen.choose(0L, 40L) // small key space forces overlap
      v <- Gen.option(Gen.oneOf("a", "b", "c", "dd"))
    } yield (k, v)
    def snap(seed: Long): Map[Long, Option[String]] =
      sample(Gen.listOfN(60, genKV), seed).toMap // last-wins dedup by key
    val o = snap(7L); val n = snap(8L)
    val got = ChangeCapture.snapshotDiff(
        o.toSeq.toDF("id", "payload"), n.toSeq.toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (o.keySet ++ n.keySet).map { k =>
      k -> ((o.get(k), n.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    assert(got == want)
  }

  test("topKPerGroup: per-group size <= k and contents match sorted reference") {
    val rows = sample(Gen.listOfN(300, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 50)
      id <- Gen.choose(0L, 100000L)
    } yield (g, v, id)), 11L).distinctBy(_._3)
    val got = RelationalOps.topKPerGroup(rows.toDF("g", "v", "id"), "g", 5,
        Seq(col("v").desc, col("id").asc))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (g, members) =>
      val want = members.sortBy(t => (-t._2, t._3)).take(5)
        .zipWithIndex.map { case ((_, v, id), i) => (g, v, id, i + 1) }
      assert(got.filter(_._1 == g).sortBy(_._4).toSeq == want, s"group $g")
    }
  }

  test("keyDistribution: totals and max are exact on random key multisets") {
    val keys = sample(Gen.listOfN(400, Gen.choose(0, 25)), 13L)
    val r = RelationalOps.keyDistribution(keys.toDF("k"), "k").collect().head
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(r.getAs[Long]("n_rows") == keys.size.toLong)
    assert(r.getAs[Long]("n_keys") == counts.size.toLong)
    assert(r.getAs[Long]("max_cnt") == counts.values.max)
    assert(r.getAs[Double]("skew_ratio") >= 1.0, "max is at least the fair share")
  }

  test("cohenKappa is symmetric in its gates and bounded in [-1, 1]") {
    import graft.operators.Evaluation
    val gates = sample(Gen.listOfN(200, Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))), 17L)
    val df = gates.toDF("a", "b")
    val kab = Evaluation.cohenKappa(df, "a", "b").collect().head.getAs[Double]("kappa")
    val kba = Evaluation.cohenKappa(df, "b", "a").collect().head.getAs[Double]("kappa")
    assert(kab == kba, s"kappa must be symmetric: $kab vs $kba")
    assert(kab >= -1.0 && kab <= 1.0, s"kappa out of range: $kab")
  }

  test("scriptMix: per-class counts never exceed the character count; counts are class-disjoint") {
    val mixed = texts ++ Seq("Привет мир", "中文 and latin", "مرحبا hey", "αβγ")
    val got = TextAnalysis.scriptMix(mixed.toDF("text"))
      .select(length(col("text")).cast("long").as("n"),
        col("n_latin"), col("n_cyrillic"), col("n_cjk"), col("n_arabic"))
      .collect()
    got.foreach { r =>
      val n = r.getLong(0)
      val parts = Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(parts.forall(p => p >= 0 && p <= n), s"count out of range: $r")
      // the four ranges are disjoint code-point sets, so their counts
      // can never sum past the text length
      assert(parts.sum <= n, s"disjoint classes overcounted: $r")
    }
  }

  test("ksStatistic: symmetric in its arguments, bounded in [0,1], zero iff identical multisets") {
    import graft.operators.Evaluation
    val gen = Gen.listOfN(60, Gen.chooseNum(0L, 25L))
    val samples = Seq(
      (gen.apply(Gen.Parameters.default, Seed(1)).get, gen.apply(Gen.Parameters.default, Seed(2)).get),
      (gen.apply(Gen.Parameters.default, Seed(3)).get, gen.apply(Gen.Parameters.default, Seed(4)).get),
      (List(1L, 2L, 3L), List(1L, 2L, 3L)))
    samples.foreach { case (a, b) =>
      val ab = Evaluation.ksStatistic(a.toDF("v"), b.toDF("v"), "v").collect().head
      val ba = Evaluation.ksStatistic(b.toDF("v"), a.toDF("v"), "v").collect().head
      // |F1 - F2| is symmetric: same sup, same location, mirrored totals
      assert(ab.getAs[Long]("d_num") == ba.getAs[Long]("d_num"))
      assert(ab.getAs[Long]("at_value") == ba.getAs[Long]("at_value"))
      assert(ab.getAs[Double]("ks_stat") == ba.getAs[Double]("ks_stat"))
      val ks = ab.getAs[Double]("ks_stat")
      assert(ks >= 0.0 && ks <= 1.0)
      if (a.sorted == b.sorted) assert(ks == 0.0, "identical multisets must read 0 drift")
      else assert(ab.getAs[Long]("d_num") > 0L,
        "different multisets of equal size must separate somewhere")
    }
  }

  test("e20 Theil-Sen: EVEN pair count averages the two middle slopes (the integer-div pick)") {
    // 4 days -> 6 pairwise slopes (EVEN): the sf fixtures all land on
    // odd pair counts, so the lo/hi median pick's even path is pinned
    // here. Counts by day: 1, 4, 2, 7 -> slopes sorted:
    // (2-4)/1=-2, (2-1)/2=0.5, (4-1)/1=3, ... full set:
    // d1->d2: 3, d1->d3: 0.5, d1->d4: 2, d2->d3: -2, d2->d4: 1.5, d3->d4: 5
    // sorted: -2, 0.5, 1.5, 2, 3, 5 -> median = (1.5 + 2)/2 = 1.75
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("theilsen")
    val perDay = Seq(0 -> 1, 1 -> 4, 2 -> 2, 3 -> 7)
    val rows = for {
      (day, n) <- perDay; i <- 0 until n
    } yield (day.toLong * 100 + i, // event_id
      day.toLong * 86400000000L + i, // micros
      1L, "click", 1.0, """{"k":1}""")
    rows.toDF("event_id", "_tus", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("_tus"))).drop("_tus")
      .write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("e20_theil_sen")(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_pairs") == 6L)
    assert(got(0).getAs[Double]("theil_sen_slope") == 1.75,
      s"even-count median must average the middle slopes: ${got(0)}")
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import org.apache.spark.sql.functions._
    rows.toDF("event_id", "_tus", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("_tus"))).drop("_tus")
      .write.parquet(s"$dir/events.parquet")
  }

  test("w20 attribution: last prior click wins, no-click purchases land in -1, lag is exact") {
    val dir = tmpDir("attr")
    val h = 3600000000L // 1h in micros
    writeEvents(dir, Seq(
      // user 1: purchase BEFORE any click -> unattributed
      (1L, 1 * h, 1L, "purchase", 1.0, "{}"),
      // user 1: click, click, purchase -> attributed to the SECOND click, lag 1h
      (2L, 2 * h, 1L, "click", 1.0, "{}"),
      (3L, 3 * h, 1L, "click", 1.0, "{}"),
      (4L, 4 * h, 1L, "purchase", 1.0, "{}"),
      // user 2's click must never attribute user 1's purchase
      (5L, 5 * h, 2L, "click", 1.0, "{}"),
      (6L, 6 * h, 2L, "purchase", 1.0, "{}"),
      // a view between click and purchase does not steal credit
      (7L, 7 * h, 3L, "click", 1.0, "{}"),
      (8L, 8 * h, 3L, "view", 1.0, "{}"),
      (9L, 9 * h, 3L, "purchase", 1.0, "{}")))
    val got = SparkEntry.queries("w20_attribution")(spark, dir).collect()
    val byDay = got.map(r => r.getAs[Long]("click_day") -> r).toMap
    assert(byDay(-1L).getAs[Long]("purchases") == 1L)
    assert(byDay(-1L).isNullAt(byDay(-1L).fieldIndex("mean_lag_us")),
      "unattributed bucket must have null mean lag")
    assert(byDay(0L).getAs[Long]("purchases") == 3L)
    assert(byDay(0L).getAs[Long]("users") == 3L)
    // lags: 1h (user 1), 1h (user 2), 2h (user 3) -> mean = 4h/3
    assert(byDay(0L).getAs[Double]("mean_lag_us") == (4 * h).toDouble / 3.0)
  }

  test("a36 Kendall tau-b: +1 on concordant series, tie cells counted on both axes") {
    val dir = tmpDir("kendall")
    val day = 86400000000L
    // daily counts over 3 days: type a -> 1,2,3 ; type b -> 2,3,4
    // (perfectly concordant); type c -> 1,1,2 (one tied a-pair... c<->a:
    // pairs (d1,d2): a rises, c ties -> tx; (d1,d3),(d2,d3): concordant)
    def burst(t: String, d: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i, d * day + i * 1000L, 1L, t, 1.0, "{}"))
    writeEvents(dir,
      burst("a", 0, 1, 100) ++ burst("a", 1, 2, 200) ++ burst("a", 2, 3, 300) ++
      burst("b", 0, 2, 400) ++ burst("b", 1, 3, 500) ++ burst("b", 2, 4, 600) ++
      burst("c", 0, 1, 700) ++ burst("c", 1, 1, 800) ++ burst("c", 2, 2, 900))
    val got = SparkEntry.queries("a36_kendall_tau")(spark, dir).collect()
    val byPair = got.map(r =>
      (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    val ab = byPair(("a", "b"))
    assert(ab.getAs[Long]("n_pairs") == 3L && ab.getAs[Long]("concordant") == 3L)
    assert(ab.getAs[Double]("tau_b") == 1.0)
    val ac = byPair(("a", "c"))
    assert(ac.getAs[Long]("concordant") == 2L && ac.getAs[Long]("discordant") == 0L)
    // tau_b = (2-0)/sqrt((3-0)*(3-1)) = 2/sqrt(6)
    assert(ac.getAs[Double]("tau_b") == 2.0 / math.sqrt(3.0 * 2.0))
  }

  test("e22 VWAP: hand-math volume weighting, decimal-exact at 2dp") {
    val dir = tmpDir("vwap")
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "click", 10.50, """{"k": 2}"""),
      (2L, 2000L, 1L, "click", 20.25, """{"k": 4}"""),
      (3L, 3000L, 1L, "view", 99.99, """{"k": 1}""")))
    val got = SparkEntry.queries("e22_vwap")(spark, dir).collect()
    val click = got.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("trades") == 2L && click.getAs[Long]("volume") == 6L)
    // (10.50*2 + 20.25*4) / 6 = 102.00 / 6 = 17.0 exactly
    assert(click.getAs[Double]("vwap") == 17.0)
    val view = got.find(_.getAs[String]("event_type") == "view").get
    assert(view.getAs[Double]("vwap") == 99.99)
  }

  test("a37 Welch t: zero on identical cells, hand-math on a known pair, antisymmetric sign") {
    val dir = tmpDir("welch")
    // type a: 1.00, 2.00, 3.00 ; type b: identical -> t = 0
    // type c: 11.00, 12.00, 13.00 -> mean 12, var 1; vs a (mean 2, var 1):
    // t = (2 - 12)/sqrt(1/3 + 1/3) = -10/sqrt(2/3)
    val rows = for {
      (ty, base) <- Seq(("a", 1.0), ("b", 1.0), ("c", 11.0)); i <- 0 until 3
    } yield ((ty + i).hashCode.toLong.abs, i * 1000L, 1L, ty, base + i, "{}")
    writeEvents(dir, rows)
    val got = SparkEntry.queries("a37_welch_t")(spark, dir).collect()
    val byPair = got.map(r =>
      (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(byPair(("a", "b")).getAs[Double]("t_stat") == 0.0)
    val ac = byPair(("a", "c"))
    assert(ac.getAs[Double]("mean_a") == 2.0 && ac.getAs[Double]("mean_b") == 12.0)
    assert(ac.getAs[Double]("t_stat") == -10.0 / math.sqrt(1.0 / 3.0 + 1.0 / 3.0))
    // b vs c must mirror a vs c exactly (identical cells)
    assert(byPair(("b", "c")).getAs[Double]("t_stat") == ac.getAs[Double]("t_stat"))
  }

  test("j24 association rules: hand-math support/confidence/lift, support floor cuts") {
    val dir = tmpDir("assoc")
    // users 1..5 engage items {1, 2}; user 6 engages {1} only; user 7
    // engages {3, 4} (below the n_ab >= 5 floor -> cut)
    val rows = (for (u <- 1L to 5L; it <- Seq(1, 2)) yield (u * 10 + it, u * 1000L, u, "view", 1.0, s"""{"k": $it}""")) ++
      Seq((61L, 6000L, 6L, "view", 1.0, """{"k": 1}"""),
        (73L, 7000L, 7L, "view", 1.0, """{"k": 3}"""),
        (74L, 7100L, 7L, "view", 1.0, """{"k": 4}"""))
    writeEvents(dir, rows)
    val got = SparkEntry.queries("j24_assoc_rules")(spark, dir).collect()
    assert(got.length == 2, s"only the (1,2) pair clears the floor: ${got.toSeq}")
    val fwd = got.find(_.getAs[Int]("antecedent") == 1).get
    // N = 7 users, c_1 = 6, c_2 = 5, n_12 = 5
    assert(fwd.getAs[Long]("n_ab") == 5L)
    assert(fwd.getAs[Double]("support") == 5.0 / 7.0)
    assert(fwd.getAs[Double]("confidence") == 5.0 / 6.0)
    assert(fwd.getAs[Double]("lift") == 35.0 / 30.0)
    val bwd = got.find(_.getAs[Int]("antecedent") == 2).get
    assert(bwd.getAs[Double]("confidence") == 5.0 / 5.0)
    assert(bwd.getAs[Double]("lift") == 35.0 / 30.0)
  }

  test("w21 growth accounting: hand classification and the growth identity hold") {
    val dir = tmpDir("growth")
    val day = 86400000000L
    // user 1 active days 0,1,4 ; user 2 active days 1,2 ; user 3 active day 4
    val rows = Seq((1L, 0), (1L, 1), (1L, 4), (2L, 1), (2L, 2), (3L, 4))
      .zipWithIndex.map { case ((u, dy), i) =>
        (i.toLong, dy * day + 1000L * u, u, "view", 1.0, "{}")
      }
    writeEvents(dir, rows)
    val got = SparkEntry.queries("w21_growth_accounting")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("new_users"), r.getAs[Long]("retained"),
          r.getAs[Long]("resurrected"), r.getAs[Long]("churned"))).toMap
    // day 0: u1 new | day 1: u1 retained, u2 new | day 2: u2 retained,
    // u1 churns (next=4) | day 3: u2 churns (no next, 3 <= horizon) |
    // day 4: u1 resurrected, u3 new; churn at 5 > horizon -> dropped
    assert(got(0L) == (1L, 1L, 0L, 0L, 0L), s"day0: ${got(0L)}")
    assert(got(1L) == (2L, 1L, 1L, 0L, 0L), s"day1: ${got(1L)}")
    assert(got(2L) == (1L, 0L, 1L, 0L, 1L), s"day2: ${got(2L)}")
    assert(got(3L) == (0L, 0L, 0L, 0L, 1L), s"day3: ${got(3L)}")
    assert(got(4L) == (2L, 1L, 0L, 1L, 0L), s"day4: ${got(4L)}")
    assert(!got.contains(5L), "churn past the corpus horizon must be capped")
    // the growth identity on every day: dau = new + retained + resurrected,
    // and dau(t) - dau(t-1) = new + resurrected - churned
    got.foreach { case (d2, (dau, nw, re, rs, _)) =>
      assert(dau == nw + re + rs, s"day $d2 decomposition broke")
    }
    got.keys.filter(d2 => got.contains(d2 - 1)).foreach { d2 =>
      val (dau, nw, _, rs, ch) = got(d2)
      assert(dau - got(d2 - 1)._1 == nw + rs - ch, s"day $d2 delta identity broke")
    }
  }

  test("e24 Holt: hand-stepped level/trend fold, two-day series returns its init") {
    val dir = tmpDir("holt")
    val day = 86400000000L
    def burst(t: String, d2: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i, d2 * day + i * 1000L, 1L, t, 1.0, "{}"))
    // type a: daily counts 2, 4, 8 -> init l=4, b=2;
    // step: l=8*.5+(4+2)*.5=7, b=(7-4)*.25+2*.75=2.25, forecast 9.25
    // type b: two days 5, 9 -> init l=9, b=4 returned untouched
    writeEvents(dir,
      burst("a", 0, 2, 100) ++ burst("a", 1, 4, 200) ++ burst("a", 2, 8, 300) ++
      burst("b", 0, 5, 400) ++ burst("b", 1, 9, 500))
    val got = SparkEntry.queries("e24_holt")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_days") == 3L)
    assert(a.getAs[Double]("level") == 7.0 && a.getAs[Double]("trend") == 2.25)
    assert(a.getAs[Double]("forecast_1") == 9.25)
    val b = got("b")
    assert(b.getAs[Double]("level") == 9.0 && b.getAs[Double]("trend") == 4.0)
  }

  test("a38 Mann-Whitney: hand-math doubled ranks under ties, exact U and z") {
    val dir = tmpDir("mw")
    // A = {1.00, 2.00}, B = {2.00, 3.00}: pooled avg ranks 1, 2.5, 2.5, 4
    // R_A = 3.5 -> 2U = 2*3.5 - 2*3 = 1; T = 2^3-2 = 6; n = 4
    // 4sigma^2 = 4*(5*4*3 - 6)/(3*4*3) = 6 -> z = (1-4)/sqrt(6)
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 1.00, "{}"), (2L, 2000L, 1L, "a", 2.00, "{}"),
      (3L, 3000L, 1L, "b", 2.00, "{}"), (4L, 4000L, 1L, "b", 3.00, "{}")))
    val got = SparkEntry.queries("a38_mann_whitney")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2") == 1L, s"2U wrong: $r")
    assert(r.getAs[Double]("z_stat") == -3.0 / math.sqrt(6.0), s"z wrong: $r")
  }

  test("a42 Kruskal-Wallis: hand-math doubled ranks under ties, exact H") {
    val dir = tmpDir("kw")
    // a = {1, 2}, b = {2, 3}, c = {3}: pooled avg ranks 1, 2.5, 2.5, 4.5, 4.5
    // 2avg per distinct value: 1->2, 2->5, 3->9
    // 2R: a = 2+5 = 7, b = 5+9 = 14, c = 9 (sum of R = 15 = N(N+1)/2 ok)
    // S4 = 1*4 + 2*25 + 2*81 = 216; N(N+1)^2 = 5*36 = 180
    // fold = 0 + 49/2 + 196/2 + 81/1 = 203.5 (exact halves, no rounding)
    // H = (N-1)*(203.5 - 180)/(216 - 180) = 4*23.5/36 = 2.6111...
    // cross-check vs the textbook form: 12/30*50.875 - 18 = 2.35,
    // tie factor 1 - 12/120 = 0.9 -> 2.35/0.9 = same
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 1.00, "{}"), (2L, 2000L, 1L, "a", 2.00, "{}"),
      (3L, 3000L, 1L, "b", 2.00, "{}"), (4L, 4000L, 1L, "b", 3.00, "{}"),
      (5L, 5000L, 1L, "c", 3.00, "{}")))
    val got = SparkEntry.queries("a42_kruskal_wallis")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.size == 3)
    assert(got("a").getAs[Long]("n_t") == 2L && got("a").getAs[Long]("rank_sum2") == 7L)
    assert(got("b").getAs[Long]("n_t") == 2L && got("b").getAs[Long]("rank_sum2") == 14L)
    assert(got("c").getAs[Long]("n_t") == 1L && got("c").getAs[Long]("rank_sum2") == 9L)
    val h = 4.0 * (203.5 - 180.0) / 36.0
    for (r <- got.values) assert(r.getAs[Double]("h_stat") == h, s"H wrong: $r")
  }

  test("a43 ANOVA: hand-math power-sum cells, exact F DAG") {
    val dir = tmpDir("anova")
    // a = {1, 2}, b = {2, 3}, c = {3}: n = 2,2,1; S1 = 3,5,3; S2 = 5,13,9
    // fold = 0 + 9/2 + 25/2 + 9/1 = 26; gterm = 121/5 = 24.2
    // SSB = 26 - 24.2 = 1.8 (check: 2*.49 + 2*.09 + .64); SSW = 27 - 26 = 1
    // F = (SSB/2)/(SSW/2) = 1.8
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 1.00, "{}"), (2L, 2000L, 1L, "a", 2.00, "{}"),
      (3L, 3000L, 1L, "b", 2.00, "{}"), (4L, 4000L, 1L, "b", 3.00, "{}"),
      (5L, 5000L, 1L, "c", 3.00, "{}")))
    val got = SparkEntry.queries("a43_anova")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.size == 3)
    assert(got("a").getAs[Long]("n_t") == 2L && got("a").getAs[Double]("mean_v") == 1.5)
    assert(got("b").getAs[Double]("mean_v") == 2.5)
    assert(got("c").getAs[Long]("n_t") == 1L && got("c").getAs[Double]("mean_v") == 3.0)
    val fold = 0.0 + 9.0 / 2.0 + 25.0 / 2.0 + 9.0 / 1.0
    val f = ((fold - 121.0 / 5.0) / 2.0) / ((27.0 - fold) / 2.0)
    for (r <- got.values) assert(r.getAs[Double]("f_stat") == f, s"F wrong: $r")
  }

  test("t34 Zipf slope: quantized-ln OLS over hand-ranked terms, single-term guard") {
    val dir = tmpDir("zipf")
    val txt = "aa aa aa aa bb bb cc" // freqs 4, 2, 1 -> ranks 1, 2, 3
    Seq(
      (1L, txt, "en", "s", txt.length.toLong),
      (2L, "zz", "en", "t", 2L)) // one distinct term: denominator 0 -> null
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t34_zipf_slope")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    def q(v: Double) = math.floor(65536.0 * math.log(v))
    val (x, y) = (Seq(1.0, 2.0, 3.0).map(q), Seq(4.0, 2.0, 1.0).map(q))
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = (3.0 * sxy - sx * sy) / (3.0 * sxx - sx * sx)
    val sRow = got("s")
    assert(sRow.getAs[Long]("n_terms") == 3L)
    assert(sRow.getAs[Double]("zipf_slope") == slope, s"slope: $sRow vs $slope")
    assert(slope < -0.5 && slope > -1.5, s"sanity: $slope")
    val tRow = got("t")
    assert(tRow.getAs[Long]("n_terms") == 1L && tRow.isNullAt(tRow.fieldIndex("zipf_slope")))
  }

  test("w25 changepoint: hand-math argmax split, single-day type absent") {
    val dir = tmpDir("chgpt")
    val day = 86400000000L
    // type a: daily counts 2, 2, 8 over days 0, 1, 2
    //   i=1: 4/1 + 100/2 = 54; i=2: 16/2 + 64/1 = 72 -> split day 1
    //   between_ss = 72 - 144/3 = 24 (= 2*(2-4)^2 + 1*(8-4)^2)
    // type b: one observed day -> no valid split, absent
    val rows =
      (0 until 2).map(i => (100L + i, 0 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 2).map(i => (200L + i, 1 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 8).map(i => (300L + i, 2 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      Seq((400L, 0L, 1L, "b", 1.0, "{}"))
    writeEvents(dir, rows)
    val got = SparkEntry.queries("w25_changepoint")(spark, dir).collect()
    assert(got.length == 1, s"single-day type must be absent: ${got.mkString}")
    val r = got(0)
    assert(r.getAs[String]("event_type") == "a")
    assert(r.getAs[Long]("split_day") == 1L)
    assert(r.getAs[Long]("n_left") == 2L && r.getAs[Long]("n_right") == 1L)
    assert(r.getAs[Double]("mean_left") == 2.0 && r.getAs[Double]("mean_right") == 8.0)
    assert(r.getAs[Double]("between_ss") == (16.0 / 2.0 + 64.0 / 1.0) - 144.0 / 3.0)
  }

  test("x42 MMR: diversity beats raw similarity, exhaustion stops the loop") {
    val dir = tmpDir("mmr")
    def v(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    // q at 0 deg; candidates at 10, 20, -60 deg. Raw top-k order is
    // 1, 2, 3 (cos 10 > cos 20 > cos 60). MMR: after picking 1, vec 2
    // scores 0.5*cos20 - 0.5*cos10 < 0 while vec 3 scores
    // 0.5*cos60 - 0.5*cos70 > 0 -> diversity reorders to 1, 3, 2.
    Seq((0L, v(0), 0), (1L, v(10), 0), (2L, v(20), 0), (3L, v(-60), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("x42_mmr_diversify")(spark, dir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("pick_id"))).toSeq
    assert(got == Seq((1, 1L), (2, 3L), (3, 2L)), s"picks: $got")
  }

  test("e26 burstiness: hand-math Fano cells, degenerate single-day type") {
    val dir = tmpDir("fano")
    val day = 86400000000L
    // type a: daily counts 2, 2, 8 -> S=12, Q=72, D=3
    //   fano = (3*72 - 144)/(3*12) = 72/36 = 2.0; mean = 4.0
    // type b: one day, one event -> fano 0, mean 1
    val rows =
      (0 until 2).map(i => (100L + i, 0 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 2).map(i => (200L + i, 1 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 8).map(i => (300L + i, 2 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      Seq((400L, 0L, 1L, "b", 1.0, "{}"))
    writeEvents(dir, rows)
    val got = SparkEntry.queries("e26_burstiness")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("a").getAs[Long]("n_days") == 3L)
    assert(got("a").getAs[Double]("mean_daily") == 4.0)
    assert(got("a").getAs[Double]("fano") == 2.0)
    assert(got("b").getAs[Double]("fano") == 0.0 &&
      got("b").getAs[Double]("mean_daily") == 1.0)
  }

  test("x43 mix diversity: hand-math HHI, effective sources, top share") {
    val dir = tmpDir("mixdiv")
    // en: sources A=3 docs, B=1 -> HHI = (9+1)/16, effective = 1.6, top = .75
    // fr: one source -> HHI = 1, effective = 1, top = 1
    Seq(
      (1L, "x", "en", "A", 1L), (2L, "y", "en", "A", 1L), (3L, "z", "en", "A", 1L),
      (4L, "w", "en", "B", 1L),
      (5L, "u", "fr", "C", 1L), (6L, "v", "fr", "C", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x43_mix_diversity")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = got("en")
    assert(en.getAs[Long]("n_docs") == 4L && en.getAs[Long]("n_sources") == 2L)
    assert(en.getAs[Double]("hhi") == 10.0 / 16.0)
    assert(en.getAs[Double]("effective_sources") == 16.0 / 10.0)
    assert(en.getAs[Double]("top_share") == 0.75)
    val fr = got("fr")
    assert(fr.getAs[Double]("hhi") == 1.0 && fr.getAs[Double]("effective_sources") == 1.0)
    assert(fr.getAs[Double]("top_share") == 1.0)
  }

  test("d25 keep-best: longest cluster member survives, singleton keeps itself") {
    val dir = tmpDir("keepbest")
    val long1 = ("alpha beta gamma delta epsilon zeta eta theta " * 8).trim
    val long2 = long1 + " extrastuff" // near-dup, longer -> it wins
    val uniq = ("one two three four five six seven eight " * 8).trim
    Seq(
      (1L, long1, "en", "srcA", long1.length.toLong),
      (2L, long2, "en", "srcA", long2.length.toLong),
      (3L, uniq, "en", "srcA", uniq.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("d25_keep_best")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("keep_id"), r.getAs[Int]("kept"))).toSeq
    assert(got == Seq((1L, 2L, 0), (2L, 2L, 1), (3L, 3L, 1)), s"got: $got")
  }

  test("a45 outlier day: integer argmax picks the burst day, zero-variance null") {
    val dir = tmpDir("outday")
    val day = 86400000000L
    // type a: daily 2, 2, 8 -> dev = D*c - S = -6, -6, 12 -> day 2;
    //   z = 12 / sqrt(3*72 - 144) = 12/sqrt(72)
    // type b: one day -> zero variance -> null z
    val rows =
      (0 until 2).map(i => (100L + i, 0 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 2).map(i => (200L + i, 1 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      (0 until 8).map(i => (300L + i, 2 * day + i * 1000L, 1L, "a", 1.0, "{}")) ++
      Seq((400L, 0L, 1L, "b", 1.0, "{}"))
    writeEvents(dir, rows)
    val got = SparkEntry.queries("a45_outlier_day")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("outlier_day") == 2L && a.getAs[Long]("n_days") == 3L)
    assert(a.getAs[Double]("z_peak") == 12.0 / math.sqrt(72.0), s"z: $a")
    val b = got("b")
    assert(b.getAs[Long]("outlier_day") == 0L && b.isNullAt(b.fieldIndex("z_peak")))
  }

  test("a46 winsorized mean: exact vigintile clamp bounds, hand-math mean") {
    val dir = tmpDir("winsor")
    // prices 0.01..0.20 (cents 1..20, one row each): p05 = 1 (20*1 >= 20),
    // p95 = 19 (20*19 >= 380); clamp sends only 20 -> 19:
    // sum = 190 + 19 = 209, mean = 209/20
    (1 to 20).map(c => (c.toLong, 100L, 1L, 1, 1.0, c / 100.0, 0.0, 0.0,
        "A", "O", new java.sql.Timestamp(0L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("a46_winsorized_mean")(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_rows") == 20L)
    assert(r.getAs[Long]("p05_cents") == 1L && r.getAs[Long]("p95_cents") == 19L)
    assert(r.getAs[Double]("winsorized_mean_cents") == 209.0 / 20.0, s"mean: $r")
  }

  test("e27 inter-arrival median: exact lower-median gap, tie order by event_id") {
    val dir = tmpDir("gapmed")
    // type a at micros 0, 10, 30, 100 -> gaps 10, 20, 70:
    //   cum(10)=1, tot=3 -> 2*1 < 3; cum(20)=2 -> 4 >= 3 -> median 20
    // type b: single event -> no gaps, absent
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "a", 1.0, "{}"), (2L, 10L, 1L, "a", 1.0, "{}"),
      (3L, 30L, 1L, "a", 1.0, "{}"), (4L, 100L, 1L, "a", 1.0, "{}"),
      (5L, 0L, 1L, "b", 1.0, "{}")))
    val got = SparkEntry.queries("e27_interarrival_median")(spark, dir).collect()
    assert(got.length == 1, s"gap-less type must be absent: ${got.mkString}")
    val r = got(0)
    assert(r.getAs[String]("event_type") == "a" && r.getAs[Long]("n_gaps") == 3L)
    assert(r.getAs[Long]("median_gap_us") == 20L, s"median: $r")
  }

  test("a47 MAD: two exact median passes, hand-math cents") {
    val dir = tmpDir("mad")
    // cents 1..5: median 3 (cum 3 >= 2.5); |v-3| = 2,1,0,1,2 -> MAD 1
    (1 to 5).map(c => (c.toLong, 100L, 1L, 1, 1.0, c / 100.0, 0.0, 0.0,
        "A", "O", new java.sql.Timestamp(0L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("a47_mad")(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("median_cents") == 3L)
    assert(got(0).getAs[Long]("mad_cents") == 1L)
  }

  test("t35 KL divergence: hand-math quantized cells over a tiny two-source corpus") {
    val dir = tmpDir("klsrc")
    // A = "x x y", B = "y z": corpus x:2 y:2 z:1, Ng=5
    Seq((1L, "x x y", "en", "A", 5L), (2L, "y z", "en", "B", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def q(num: Double, den: Double) = math.floor(65536.0 * math.log(num / den))
    val klA = 2.0 * q(2.0 * 5, 2.0 * 3) + 1.0 * q(1.0 * 5, 2.0 * 3)
    val klB = 1.0 * q(1.0 * 5, 2.0 * 2) + 1.0 * q(1.0 * 5, 1.0 * 2)
    val got = SparkEntry.queries("t35_kl_divergence")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("A").getAs[Long]("n_tokens") == 3L)
    assert(got("A").getAs[Double]("kl_nats") == klA / 65536.0 / 3.0, s"A: ${got("A")}")
    assert(got("B").getAs[Long]("n_tokens") == 2L)
    assert(got("B").getAs[Double]("kl_nats") == klB / 65536.0 / 2.0, s"B: ${got("B")}")
    assert(got("B").getAs[Double]("kl_nats") > 0.0, "B diverges from the mix")
  }

  test("t36 term burstiness: clumping term scores above uniform ones") {
    val dir = tmpDir("burstterm")
    Seq((1L, "the the cat", "en", "A", 11L), (2L, "the dog", "en", "A", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t36_term_burstiness")(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("ctot"),
        r.getAs[Long]("df"), r.getAs[Double]("burstiness"))).toSeq
    assert(got == Seq(("cat", 1L, 1L, 1.0), ("dog", 1L, 1L, 1.0),
      ("the", 3L, 2L, 1.5)), s"got: $got")
  }

  test("x44 EB shrink: small perfect source pulled toward the prior, exact DAG") {
    val dir = tmpDir("ebshrink")
    val longTxt = "x" * 250
    // A: 2 docs, both quality (raw 1.0); B: 8 docs, 2 quality (raw .25)
    // prior = 4/10; shrunk_A = (2 + 50*prior)/52, shrunk_B = (2 + 50*prior)/58
    val rows =
      (1 to 2).map(i => (i.toLong, longTxt, "en", "A", 250L)) ++
      (3 to 4).map(i => (i.toLong, longTxt, "en", "B", 250L)) ++
      (5 to 10).map(i => (i.toLong, "tiny", "en", "B", 4L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x44_eb_shrink")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val prior = 4.0 / 10.0
    val a = got("A")
    assert(a.getAs[Double]("raw_rate") == 1.0)
    assert(a.getAs[Double]("shrunk_rate") == (2.0 + 50.0 * prior) / (2.0 + 50.0))
    assert(a.getAs[Double]("shrunk_rate") < 0.5, "tiny perfect source must collapse toward prior")
    val b = got("B")
    assert(b.getAs[Double]("raw_rate") == 0.25)
    assert(b.getAs[Double]("shrunk_rate") == (2.0 + 50.0 * prior) / (8.0 + 50.0))
  }

  test("e28 Holt-Winters: periodic series is a fixed point; short series absent") {
    val dir = tmpDir("hw")
    val day = 86400000000L
    // type a: 21 days, count on day d = (d%7)+1 — two identical init
    // seasons make b0 = 0, l0 = mean = 4, s_i = p_i - 4, and the
    // recurrence is then a FIXED POINT (v - mean = sPrev at every
    // step), all values exact dyadics:
    //   level = 4, trend = 0, next slot = (21%7)+1 = 1 ->
    //   seasonal_next = 1 - 4 = -3, forecast_1 = 1
    // type b: 5 days < 15 -> absent
    var eid = 1000L
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, Double, String)]
    for (d0 <- 0 until 21; i <- 0 until (d0 % 7) + 1) {
      rows += ((eid, d0 * day + i * 1000L, 1L, "a", 1.0, "{}")); eid += 1
    }
    for (d0 <- 0 until 5) { rows += ((eid, d0 * day, 1L, "b", 1.0, "{}")); eid += 1 }
    writeEvents(dir, rows.toSeq)
    val got = SparkEntry.queries("e28_holt_winters")(spark, dir).collect()
    assert(got.length == 1, s"short series must be absent: ${got.mkString}")
    val r = got(0)
    assert(r.getAs[String]("event_type") == "a" && r.getAs[Long]("n_days") == 21L)
    assert(r.getAs[Double]("level") == 4.0 && r.getAs[Double]("trend") == 0.0, s"$r")
    assert(r.getAs[Double]("seasonal_next") == -3.0 && r.getAs[Double]("forecast_1") == 1.0, s"$r")
  }

  test("w27 Kaplan-Meier: hand-math censoring, exact prefix products") {
    val dir = tmpDir("km")
    val day = 86400000000L
    // u1 t=2 event, u2 t=2 event, u3 t=4 event,
    // u4 last=10=horizon -> t=4 censored, u5 t=0 censored
    // cells: t0 (d0,c1), t2 (d2,c2), t4 (d1,c2); n: t0->5, t2->4, t4->2
    // S(2) = 1 - 2/4 = .5; S(4) = .5 * (1 - 1/2) = .25
    def ev(id: Long, u: Long, d0: Long) = (id, d0 * day, u, "a", 1.0, "{}")
    writeEvents(dir, Seq(
      ev(1, 1, 0), ev(2, 1, 2),
      ev(3, 2, 1), ev(4, 2, 3),
      ev(5, 3, 0), ev(6, 3, 4),
      ev(7, 4, 6), ev(8, 4, 10),
      ev(9, 5, 10)))
    val got = SparkEntry.queries("w27_survival_km")(spark, dir).collect()
      .map(r => (r.getAs[Long]("lifetime_days"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Double]("survival"))).toSeq
    assert(got == Seq((2L, 4L, 2L, 0.5), (4L, 2L, 1L, 0.25)), s"got: $got")
  }

  test("w26 period-over-period: calendar alignment nulls across gaps") {
    val dir = tmpDir("pop")
    val day = 86400000000L
    // type a: days 0 (n=2), 1 (n=3), 3 (n=6), 8 (n=9):
    //   day1 dod = (3-2)/2 = .5; day3 dod null (day2 absent);
    //   day8 dod null, wow = (9-3)/3 = 2.0 (day1 present)
    val rows =
      (0 until 2).map(i => (100L + i, 0 * day + i, 1L, "a", 1.0, "{}")) ++
      (0 until 3).map(i => (200L + i, 1 * day + i, 1L, "a", 1.0, "{}")) ++
      (0 until 6).map(i => (300L + i, 3 * day + i, 1L, "a", 1.0, "{}")) ++
      (0 until 9).map(i => (400L + i, 8 * day + i, 1L, "a", 1.0, "{}"))
    writeEvents(dir, rows)
    val got = SparkEntry.queries("w26_period_over_period")(spark, dir).collect()
      .map(r => r.getAs[Long]("day_idx") -> r).toMap
    assert(got(0L).isNullAt(got(0L).fieldIndex("dod_pct")))
    assert(got(1L).getAs[Double]("dod_pct") == 0.5)
    assert(got(3L).isNullAt(got(3L).fieldIndex("dod_pct")), "gap day must null dod")
    assert(got(8L).isNullAt(got(8L).fieldIndex("dod_pct")))
    assert(got(8L).getAs[Double]("wow_pct") == 2.0)
  }

  test("a48 Levene: hand-math median-centered cells, exact W DAG") {
    val dir = tmpDir("levene")
    // a = {1, 2}, b = {2, 3}, c = {3} (cents 100x): lower medians
    // 100, 200, 300 -> z cells: a s1=100 s2=1e4; b same; c zeros
    // fold = 5000 + 5000 + 0; gterm = 200^2/5 = 8000
    // W = ((10000-8000)/2) / ((20000-10000)/2) = 0.2
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 1.00, "{}"), (2L, 2000L, 1L, "a", 2.00, "{}"),
      (3L, 3000L, 1L, "b", 2.00, "{}"), (4L, 4000L, 1L, "b", 3.00, "{}"),
      (5L, 5000L, 1L, "c", 3.00, "{}")))
    val got = SparkEntry.queries("a48_levene")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.size == 3)
    assert(got("a").getAs[Double]("mean_absdev") == 0.5)
    assert(got("c").getAs[Double]("mean_absdev") == 0.0)
    val fold = 0.0 + 10000.0 / 2.0 + 10000.0 / 2.0 + 0.0 / 1.0
    val w = ((fold - 40000.0 / 5.0) / 2.0) / ((20000.0 - fold) / 2.0)
    for (r <- got.values) assert(r.getAs[Double]("w_stat") == w, s"W wrong: $r")
  }

  test("a49 Tukey posthoc: hand-math MSW and pairwise q, exact DAG") {
    val dir = tmpDir("tukey")
    // a = {1, 2}, b = {2, 3}, c = {3}: means 1.5, 2.5, 3.0;
    // SSW = 27 - 26 = 1, msw = 1/2 = .5
    // q_ab = -1 / sqrt(.5*.5*1) = -2; q_ac = -1.5/sqrt(.375); q_bc = -.5/sqrt(.375)
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 1.00, "{}"), (2L, 2000L, 1L, "a", 2.00, "{}"),
      (3L, 3000L, 1L, "b", 2.00, "{}"), (4L, 4000L, 1L, "b", 3.00, "{}"),
      (5L, 5000L, 1L, "c", 3.00, "{}")))
    val got = SparkEntry.queries("a49_tukey_posthoc")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) -> r).toMap
    assert(got.size == 3)
    val ab = got(("a", "b"))
    assert(ab.getAs[Double]("mean_diff") == -1.0 && ab.getAs[Double]("q_stat") == -2.0)
    val se2 = math.sqrt(0.5 * 0.5 * (1.0 / 2.0 + 1.0 / 1.0))
    assert(got(("a", "c")).getAs[Double]("q_stat") == -1.5 / se2)
    assert(got(("b", "c")).getAs[Double]("q_stat") == -0.5 / se2)
  }

  test("t37 lang confusion: misclassified and und cells land in the right rows") {
    val dir = tmpDir("langconf")
    Seq(
      (1L, "the and of", "en", "A", 10L),  // correctly en
      (2L, "the and of", "fr", "A", 10L),  // labeled fr, reads en
      (3L, "zzz qqq", "fr", "A", 7L))      // no stopwords -> und
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t37_lang_confusion")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_true"), r.getAs[String]("lang_pred"),
        r.getAs[Long]("n"), r.getAs[Double]("row_share"))).toSeq
    assert(got == Seq(("en", "en", 1L, 1.0),
      ("fr", "en", 1L, 0.5), ("fr", "und", 1L, 0.5)), s"got: $got")
  }

  test("x36 effective tokens: duplicate cluster mass splits, gate cuts, fold is exact") {
    val dir = tmpDir("efftok")
    val long1 = ("alpha beta gamma delta epsilon zeta eta theta " * 8).trim // 64 tokens
    val long2 = long1 // exact dup: the tightest near-dup cluster
    val uniq = ("one two three four five six seven eight " * 8).trim
    val short = "tiny doc" // fails the n_chars >= 200 gate
    Seq(
      (1L, long1, "en", "srcA", long1.length.toLong),
      (2L, long2, "en", "srcA", long2.length.toLong),
      (3L, uniq, "en", "srcA", uniq.length.toLong),
      (4L, short, "en", "srcB", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x36_effective_tokens")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = got("srcA")
    assert(a.getAs[Long]("n_docs") == 3L && a.getAs[Long]("n_admitted") == 3L)
    assert(a.getAs[Long]("admitted_tokens") == 192L)
    // docs 1+2 form one cluster of 2 (128 tokens -> 64 effective);
    // doc 3 is its own cluster (64) -> fold: 0 + 64.0 + 128/2
    assert(a.getAs[Double]("effective_tokens") == 0.0 + 64.0 + 128.0 / 2.0,
      s"srcA fold: $a")
    val b = got("srcB")
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[Long]("n_admitted") == 0L)
    assert(b.getAs[Double]("effective_tokens") == 0.0)
  }

  test("j25 Q2 shape: argmin picks the cheapest offer with supplier tie-break") {
    val dir = tmpDir("q2")
    Seq((10L, 100L, 1L, 1, 1.0, 5.00, 0.0, 0.0, "N", "O", 0L),
      (10L, 100L, 2L, 2, 1.0, 3.00, 0.0, 0.0, "N", "O", 0L),
      (10L, 100L, 3L, 3, 1.0, 3.00, 0.0, 0.0, "N", "O", 0L), // tie -> supplier 2 wins
      (11L, 200L, 3L, 1, 1.0, 9.00, 0.0, 0.0, "N", "O", 0L))
      .map { case (ok, pk, sk, ln, q, ep, di, tx, rf, ls, sd) =>
        (ok, pk, sk, ln, q, ep, di, tx, rf, ls, new java.sql.Timestamp(sd)) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((100L, "p100", "Brand#1", "SMALL", 5, 1.0), (200L, "p200", "Brand#2", "LARGE", 50, 2.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((2L, "SupTwo", 7, 1.0), (3L, "SupThree", 7, 1.0), (1L, "SupOne", 7, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((7, "WONDERLAND", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    val got = SparkEntry.queries("j25_q2_shape")(spark, dir).collect()
    // part 200 (size 50) filtered out; part 100 argmin = 3.00 tie -> supplier 2
    assert(got.length == 1, s"got ${got.toSeq}")
    assert(got(0).getAs[Long]("s_suppkey") == 2L)
    assert(got(0).getAs[Double]("best_price") == 3.0)
    assert(got(0).getAs[String]("s_name") == "SupTwo")
    assert(got(0).getAs[String]("n_name") == "WONDERLAND")
  }

  test("w23 stickiness: trailing-28-day distinct users, hand grid") {
    val dir = tmpDir("stick")
    val day = 86400000000L
    // user 1 active days 0 and 30; user 2 active days 0, 1, 30
    writeEvents(dir, Seq(
      (1L, 0 * day + 1L, 1L, "view", 1.0, "{}"),
      (2L, 30 * day + 1L, 1L, "view", 1.0, "{}"),
      (3L, 0 * day + 2L, 2L, "view", 1.0, "{}"),
      (4L, 1 * day + 2L, 2L, "view", 1.0, "{}"),
      (5L, 30 * day + 2L, 2L, "view", 1.0, "{}")))
    val got = SparkEntry.queries("w23_stickiness")(spark, dir)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau"), r.getAs[Double]("stickiness"))).toMap
    assert(got(0L) == (2L, 2L, 1.0))
    assert(got(1L) == (1L, 2L, 0.5))
    // day 30's window is (2, 30]: both users' day-0 activity AND user
    // 2's day-1 activity have aged out — mau=2 comes from the two
    // users' day-30 events alone
    assert(got(30L) == (2L, 2L, 1.0), s"day30: ${got(30L)}")
  }

  test("j26 Q14: promo share over the month slice is decimal-exact") {
    val dir = tmpDir("q14")
    def ts(s2: String) = java.sql.Timestamp.valueOf(s2 + " 00:00:00")
    Seq(
      (1L, 100L, 1L, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", ts("1996-01-05")), // promo: 90.00
      (2L, 200L, 1L, 1, 1.0, 50.00, 0.00, 0.0, "N", "O", ts("1996-01-20")), // standard: 50.00
      (3L, 100L, 1L, 1, 1.0, 999.00, 0.00, 0.0, "N", "O", ts("1996-03-01"))) // outside the month
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((100L, "p", "Brand#1", "PROMO", 1, 1.0), (200L, "p", "Brand#2", "STANDARD", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    val r = SparkEntry.queries("j26_q14_shape")(spark, dir).collect()(0)
    assert(r.getAs[Double]("promo_revenue") == 90.0)
    assert(r.getAs[Double]("total_revenue") == 140.0)
    assert(r.getAs[Double]("promo_revenue_pct") == 100.0 * 90.0 / 140.0)
  }

  test("t28 hapax: corpus-level type/token/hapax cells are exact") {
    val dir = tmpDir("hapax")
    Seq(
      (1L, "the cat sat", "en", "srcA", 11L),
      (2L, "the dog", "en", "srcA", 7L),
      (3L, "unique words only here", "en", "srcB", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t28_hapax")(spark, dir).collect()
    val a = got.find(_.getAs[String]("source") == "srcA").get
    // srcA tokens: the,cat,sat,the,dog -> 5 tokens, 4 types, hapax 3 (cat,sat,dog)
    assert(a.getAs[Long]("n_tokens") == 5L && a.getAs[Long]("n_types") == 4L)
    assert(a.getAs[Long]("n_hapax") == 3L)
    assert(a.getAs[Double]("hapax_ratio") == 3.0 / 4.0)
    assert(a.getAs[Double]("type_token_ratio") == 4.0 / 5.0)
    val b = got.find(_.getAs[String]("source") == "srcB").get
    assert(b.getAs[Long]("n_hapax") == 4L && b.getAs[Double]("hapax_ratio") == 1.0)
  }

  test("hyperactive-key cap: planted power user is dropped whole and observably; others are exact") {
    val dir = tmpDir("hyperkey")
    // five normal users sharing basket {1, 2}; user 99 with 12 items —
    // past the planted cap of 10, under which C(12,2) = 66 pairs would
    // ride one task at scale
    val normals = (1L to 5L).flatMap { u =>
      Seq((u * 10L, u * 1000L, u, "view", u.toDouble, """{"k": 1}"""),
        (u * 10L + 1L, u * 1000L + 1L, u, "view", u.toDouble + 1.0, """{"k": 2}"""))
    }
    val power = (0 until 12).map { i =>
      (100L + i, 100000L + i, 99L, "view", i.toDouble, s"""{"k": ${10 + i}}""")
    }
    writeEvents(dir, normals ++ power)

    // j17: only the shared (1,2) pair survives — none of the power
    // user's 66 within-basket pairs
    val co = SparkEntry.cooccurrencePairs(spark, dir, maxItemsPerUser = 10)
      .collect().map(r => (r.getAs[Int]("item_a"), r.getAs[Int]("item_b"),
        r.getAs[Long]("n_users")))
    assert(co.toSeq == Seq((1, 2, 5L)), s"j17 capped: ${co.toSeq}")

    // j24: denominators use the CAPPED universe — support 5/5 = 1
    val rules = SparkEntry.assocRules(spark, dir, maxItemsPerUser = 10)
      .collect().map(r => (r.getAs[Int]("antecedent"), r.getAs[Int]("consequent"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(rules.toSet == Set((1, 2, 5L, 1.0, 1.0, 1.0), (2, 1, 5L, 1.0, 1.0, 1.0)),
      s"j24 capped: ${rules.toSeq}")

    // w17: the power user's trend row is gone; a normal user's exact
    // S over its 1 pair (values u, u+1 ascending) is +1
    val mk = SparkEntry.mannKendall(spark, dir, maxEventsPerUser = 10)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("s_stat"), r.getAs[Long]("n_pairs"))).toMap
    assert(!mk.contains(99L), s"power user leaked through the cap: $mk")
    assert(mk(1L) == (1L, 1L) && mk.size == 5, s"w17 capped: $mk")

    // observability: the dropped key is reported with its size
    val staged = Tables.events(spark, dir)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull).distinct()
    val dropped = RelationalOps.droppedHyperactiveKeys(staged, "user_id", 10)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_rows"))
    assert(dropped.toSeq == Seq(99L -> 12L), s"dropped: ${dropped.toSeq}")
    // and with the cap at-or-above the busiest key, capPerKey is the identity
    assert(RelationalOps.capPerKey(staged, "user_id", 12).count() == staged.count())
  }

  test("w24 Theil-Sen: hand-computed lower-median slope; hyperactive type capped whole") {
    val dir = tmpDir("theilsen")
    val day = 86400000000L
    def burstRows(tpe: String, base: Long, countsByDay: Seq[Int]) =
      countsByDay.zipWithIndex.flatMap { case (k, t) =>
        (0 until k).map(i =>
          (base + t * 100L + i, t * day + i, 7L, tpe, 1.0, "{}"))
      }
    writeEvents(dir,
      // steady: 1,2,3 events on days 0,1,2 -> slopes {1/1, 1/1, 2/2}; lower
      // median element under the (q, dy, dx) order is (dy=1, dx=1) -> 1.0
      burstRows("steady", 1000L, Seq(1, 2, 3)) ++
        // burst: 1,1,10 -> slopes {0/1, 9/2, 9/1}; median (9, 2) -> 4.5
        burstRows("burst", 2000L, Seq(1, 1, 10)) ++
        // noisy: 12 active days, past the planted cap of 10 -> dropped whole
        burstRows("noisy", 3000L, Seq.fill(12)(1)))
    val got = SparkEntry.theilSen(spark, dir, maxDaysPerKey = 10)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("med_dy"), r.getAs[Long]("med_dx"),
          r.getAs[Double]("slope_per_day")))).toMap
    assert(!got.contains("noisy"), s"hyperactive type leaked: $got")
    assert(got("steady") == ((3L, 3L, 1L, 1L, 1.0)), s"steady: $got")
    assert(got("burst") == ((3L, 3L, 9L, 2L, 4.5)), s"burst: $got")
  }
}
