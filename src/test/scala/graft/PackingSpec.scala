package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Int)], budget: Int): Seq[(Long, String, Int, Long)] =
    Packing.packGreedy(rows.toDF("doc_id", "source", "n_tokens"),
        "source", "doc_id", "n_tokens", budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("greedy packing: budget respected, bins dense per group, oversized docs isolated") {
    // group a walk at budget 256: [100,100]=bin0, 100 spills to bin1,
    // 300 overflows bin1 into its own bin2 (oversized), 10 can't join
    // the oversized bin (300+10 > 256) -> bin3.
    // group b: 256 is an exact fit, 1 spills.
    val rows = Seq(
      (1L, "a", 100), (2L, "a", 100), (3L, "a", 100),
      (4L, "a", 300), (5L, "a", 10),
      (6L, "b", 256), (7L, "b", 1))
    val got = pack(rows, 256)
    assert(got == Seq(
      (1L, "a", 100, 0L), (2L, "a", 100, 0L), (3L, "a", 100, 1L),
      (4L, "a", 300, 2L), (5L, "a", 10, 3L),
      (6L, "b", 256, 0L), (7L, "b", 1, 1L)))
  }

  test("invariants on random sizes: no bin over budget unless single-doc, bins contiguous, deterministic") {
    val rnd = new scala.util.Random(31)
    val rows = (1L to 400L).map(i =>
      (i, s"g${i % 7}", 1 + rnd.nextInt(200)))
    val budget = 300
    val got = pack(rows, budget)
    assert(got.map(_._1) == rows.map(_._1).sorted, "one output row per doc")
    got.groupBy(r => (r._2, r._4)).foreach { case ((g, bin), docs) =>
      val total = docs.map(_._3).sum
      assert(total <= budget || docs.length == 1, s"bin ($g, $bin) holds $total > $budget")
    }
    got.groupBy(_._2).foreach { case (g, docs) =>
      val bins = docs.map(_._4).distinct.sorted
      assert(bins == (0L until bins.length), s"group $g bins not dense: $bins")
    }
    assert(pack(rows, budget) == got, "packing must be deterministic across runs")
    // and it matches a sequential reference walk per group
    rows.groupBy(_._2).foreach { case (g, docs) =>
      var bin = 0L; var fill = 0L
      val want = docs.sortBy(_._1).map { case (id, _, n) =>
        if (fill > 0 && fill + n > budget) { bin += 1; fill = 0 }
        fill += n
        id -> bin
      }.toMap
      got.filter(_._2 == g).foreach { case (id, _, _, b) =>
        assert(b == want(id), s"doc $id in group $g: got bin $b, want ${want(id)}")
      }
    }
  }
}
