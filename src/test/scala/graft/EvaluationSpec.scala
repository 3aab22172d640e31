package graft

import graft.operators.Evaluation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class EvaluationSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)], bucketSize: Long = 1 << 20): Row =
    Evaluation.rocAuc(rows.toDF("s", "y"), "s", "y", bucketSize).collect()(0)

  test("rocAuc: perfect separation is 1.0, inverted is 0.0") {
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
    assert(auc(sep).getAs[Double]("auc") == 1.0)
    val inv = sep.map { case (s, y) => (s, !y) }
    assert(auc(inv).getAs[Double]("auc") == 0.0)
  }

  test("rocAuc: tie-corrected hand value (ties earn half credit)") {
    // neg at 1, pos+neg tied at 2 (avg rank 2.5), pos at 3 (rank 4):
    // R_pos = 2.5 + 4 = 6.5, AUC = (6.5 - 3) / (2*2) = 0.875
    val rows = Seq((1.0, false), (2.0, true), (2.0, false), (3.0, true))
    val r = auc(rows)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("numer2") == 7L) // 2*(R_pos - n_pos(n_pos+1)/2) = 2*3.5
    assert(r.getAs[Double]("auc") == 0.875)
  }

  test("rocAuc: all-ties degenerate distribution scores exactly 0.5") {
    val r = auc(Seq((5.0, true), (5.0, false), (5.0, true), (5.0, false)))
    assert(r.getAs[Double]("auc") == 0.5)
  }

  test("rocAuc: single-class input yields null auc, exact counts") {
    val r = auc(Seq((1.0, true), (2.0, true)))
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rocAuc: bucketSize=1 (every distinct score its own bucket) matches the single-bucket result") {
    // forces the two-level prefix sum through the multi-bucket path —
    // bucket offsets must compose exactly with within-bucket sums
    val rows = Seq((1.0, false), (1.0, true), (2.0, false), (3.0, true),
      (3.0, false), (4.0, true), (5.0, false), (6.0, true))
    val one = auc(rows, bucketSize = 1L)
    val big = auc(rows)
    assert(one == big, s"bucketed $one != unbucketed $big")
  }

  test("cohenKappa: hand-computed cells and kappa; perfect and inverse agreement") {
    import spark.implicits._
    // a=[T,T,F], b=[T,F,F]: po=2/3, pa=2/3, pb=1/3, pe=4/9, k=0.4
    val r = Evaluation.cohenKappa(
      Seq((true, true), (true, false), (false, false)).toDF("a", "b"), "a", "b")
      .collect().head
    assert((r.getAs[Long]("n"), r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")) == ((3L, 1L, 1L, 0L, 1L)))
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-15)
    // identical gates, both classes present: kappa exactly 1
    val perfect = Evaluation.cohenKappa(
      Seq((true, true), (false, false)).toDF("a", "b"), "a", "b")
      .collect().head.getAs[Double]("kappa")
    assert(perfect == 1.0)
    // complementary gates: kappa -1 (systematic disagreement)
    val inverse = Evaluation.cohenKappa(
      Seq((true, false), (false, true)).toDF("a", "b"), "a", "b")
      .collect().head.getAs[Double]("kappa")
    assert(inverse == -1.0)
  }

  test("psiDriftBins: identical snapshots give exactly zero drift in every bin") {
    val df = (1 to 200).map(i => i.toLong * 7 % 101).toDF("v")
    val rows = Evaluation.psiDriftBins(df, df, "v").collect()
    assert(rows.length == 10, "full spine: one row per bin")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ref") == r.getAs[Long]("n_cur"))
      // N_ref == N_cur makes the smoothed ratio exactly 1.0; ln -> 0.0,
      // floor -> 0, contrib 0.0 — not approximately, exactly
      assert(r.getAs[Long]("ratio_q") == 0L)
      assert(r.getAs[Double]("psi_contrib") == 0.0)
    }
  }

  test("psiDriftBins: per-bin counts partition each snapshot; contribs are non-negative; shift is detected") {
    // cur shifts mass upward vs ref
    val ref = (1 to 300).map(_.toLong % 100).toDF("v")
    val cur = (1 to 300).map(i => (i.toLong % 100) + 40L).toDF("v")
    val rows = Evaluation.psiDriftBins(ref, cur, "v").collect()
    assert(rows.map(_.getAs[Long]("n_ref")).sum == 300L)
    assert(rows.map(_.getAs[Long]("n_cur")).sum == 300L)
    // quantized-ln contributions keep PSI's sign law: (pc-pr) and
    // floor(Q ln(pc/pr)) always agree in sign (floor only pushes the
    // negative side further down), so every bin's contrib is >= 0
    rows.foreach(r => assert(r.getAs[Double]("psi_contrib") >= 0.0,
      s"bin ${r.getAs[Int]("bin")} contrib negative"))
    val psi = rows.map(_.getAs[Double]("psi_contrib")).sum
    assert(psi > 0.25, s"a 40% shift must read as 'shifted' (PSI > 0.25), got $psi")
  }

  test("ksStatistic: hand-computed sup-norm, exact integer numerator, argmax tie-break") {
    // ref=[1,2,3], cur=[3,4]: cum_ref=(1,2,3,3), cum_cur=(0,0,1,2),
    // d_num = |cr*2 - cc*3| = (2,4,3,0) -> max 4 at v=2; ks = 4/6
    val r = Evaluation.ksStatistic(
      Seq(1L, 2L, 3L).toDF("v"), Seq(3L, 4L).toDF("v"), "v").collect().head
    assert((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
      r.getAs[Long]("d_num"), r.getAs[Long]("at_value")) == ((3L, 2L, 4L, 2L)))
    assert(r.getAs[Double]("ks_stat") == 4.0 / 6.0)
    // identical samples: D exactly 0, argmax ties to the smallest value
    val z = Evaluation.ksStatistic(
      Seq(5L, 6L).toDF("v"), Seq(5L, 6L).toDF("v"), "v").collect().head
    assert(z.getAs[Long]("d_num") == 0L && z.getAs[Long]("at_value") == 5L)
    assert(z.getAs[Double]("ks_stat") == 0.0)
    // disjoint supports: D exactly 1 at the reference's upper edge
    val d = Evaluation.ksStatistic(
      Seq(1L, 2L).toDF("v"), Seq(10L, 11L).toDF("v"), "v").collect().head
    assert(d.getAs[Double]("ks_stat") == 1.0 && d.getAs[Long]("at_value") == 2L)
  }

  test("x30 fixture: every bin's Q*ln(r) sits >=1e-6 from an integer (the cross-engine floor guard)") {
    // the exact frame the oracle replays at sf0.01 and the smoke runs
    // at sf0.001 — engines agreeing on ln to ~1e-8 relative cannot
    // disagree on any floor with this margin
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
      val rows = Evaluation.psiDriftBins(
        docs.filter(col("doc_id") % 7 =!= 3),
        docs.filter(col("doc_id") % 7 =!= 5),
        "n_chars").collect()
      val tr = rows.map(_.getAs[Long]("n_ref")).sum
      val tc = rows.map(_.getAs[Long]("n_cur")).sum
      rows.foreach { r =>
        val pc = (r.getAs[Long]("n_cur") + 1L).toDouble / (tc + 10L).toDouble
        val pr = (r.getAs[Long]("n_ref") + 1L).toDouble / (tr + 10L).toDouble
        val q = 65536.0 * math.log(pc / pr)
        val dist = math.abs(q - math.rint(q))
        assert(dist >= 1e-6,
          s"$dir bin ${r.getAs[Int]("bin")}: Q*ln(r)=$q sits $dist from an integer")
        assert(math.floor(q).toLong == r.getAs[Long]("ratio_q"))
      }
    }
  }

  private def gini(rows: Seq[(String, Long)]): Map[String, (Long, Option[Double])] =
    Evaluation.giniIndex(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("giniIndex: uniform is 0, hand value 0.25 on 1..4, max concentration (n-1)/n") {
    val rows = Seq("u" -> 5L, "u" -> 5L, "u" -> 5L,
      "h" -> 1L, "h" -> 2L, "h" -> 3L, "h" -> 4L,
      "c" -> 0L, "c" -> 0L, "c" -> 0L, "c" -> 10L)
    val g = gini(rows)
    assert(g("u") == ((3L, Some(0.0))))
    // 1..4: (2*(1+4+9+16) - 5*10) / (4*10) = 10/40
    assert(g("h") == ((4L, Some(0.25))))
    // all mass on one of 4: (n-1)/n = 0.75
    assert(g("c") == ((4L, Some(0.75))))
  }

  test("giniIndex: tied values collapse to one ranked run with identical result") {
    // [2,2,6]: ranks 1,2,3 -> (2*(2+4+18) - 4*10)/(3*10) = 8/30
    val g = gini(Seq("t" -> 2L, "t" -> 2L, "t" -> 6L))
    assert(g("t")._1 == 3L)
    assert(math.abs(g("t")._2.get - 8.0 / 30.0) < 1e-15)
  }

  test("giniIndex: zero-sum group yields null, count still exact") {
    val g = gini(Seq("z" -> 0L, "z" -> 0L))
    assert(g("z") == ((2L, None)))
  }

  test("psiBinOfLiteral equals the HOF fold on and around every bound") {
    import org.apache.spark.sql.functions.typedLit
    val bounds = Seq(0.1, 0.25, 0.5, 0.9)
    // probe exactly AT each bound (strict > must not count it), just
    // above, just below, and outside both ends
    val vs = bounds.flatMap(b => Seq(b, b + 1e-9, b - 1e-9)) ++ Seq(-1.0, 0.0, 2.0)
    val df = vs.map(Tuple1(_)).toDF("v")
    val got = df.select(col("v"),
        Evaluation.psiBinOf(col("v"), typedLit(bounds)).as("hof"),
        Evaluation.psiBinOfLiteral(col("v"), bounds).as("lit"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"fold forms diverged at v=${r.getDouble(0)}: hof=${r.getInt(1)} lit=${r.getInt(2)}"))
    // and the fold itself is the cleared-bounds count
    val byV = got.map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(byV(-1.0) == 0 && byV(0.0) == 0 && byV(2.0) == 4)
    assert(byV(0.5) == 2, "a value equal to a bound does not clear it")
  }
}
