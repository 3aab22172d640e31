package graft

import graft.operators.Evaluation
import org.apache.spark.sql.Row

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
}
