package graft

import graft.operators.Preference
import java.sql.Timestamp

class PreferenceSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("comparisonsFromLog: consecutive different-item pairs, higher value wins, tie to smaller item") {
    val events = Seq(
      // user 1: A(1.0) -> B(2.0): B wins; B(2.0) -> B(3.0): skipped (same item);
      // B(3.0) -> C(3.0): exact tie -> lexicographically smaller (B) wins
      (1L, ts(10), 100L, "A", 1.0),
      (1L, ts(20), 101L, "B", 2.0),
      (1L, ts(30), 102L, "B", 3.0),
      (1L, ts(40), 103L, "C", 3.0),
      // user 2: D(5.0) -> A(1.0): D wins (prev value higher)
      (2L, ts(10), 200L, "D", 5.0),
      (2L, ts(20), 201L, "A", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Preference
      .comparisonsFromLog(events, "user_id", "ts", "event_id", "event_type", "value")
      .as[(String, String)].collect().toSet
    assert(got == Set(("B", "A"), ("B", "C"), ("D", "A")))
  }

  test("comparisonsFromLog: same-timestamp events ordered by event_id") {
    val events = Seq(
      (1L, ts(10), 2L, "X", 9.0), // second by event_id
      (1L, ts(10), 1L, "Y", 1.0)  // first by event_id
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Preference
      .comparisonsFromLog(events, "user_id", "ts", "event_id", "event_type", "value")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("X", "Y"))) // Y then X; X's value is higher
  }

  test("bradleyTerry: planted dominance A > B > C recovered; wins/games exact") {
    val cmp = (
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A"))
    ).toDF("winner", "loser")
    val rows = Preference.bradleyTerry(cmp).orderBy("rk")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(rows.map(_._1) == Seq("A", "B", "C"))
    assert(rows.map(_._2) == Seq(18L, 10L, 2L))     // wins
    assert(rows.map(_._3) == Seq(20L, 20L, 20L))    // games
    val s = rows.map(_._4)
    assert(s(0) > s(1) && s(1) > s(2) && s(2) >= 1L)
    assert(rows.map(_._5) == Seq(1, 2, 3))
  }

  test("bradleyTerry: perfectly balanced pair gets identical quantized strength, item tiebreak") {
    val cmp = (Seq.fill(5)(("A", "B")) ++ Seq.fill(5)(("B", "A")))
      .toDF("winner", "loser")
    val rows = Preference.bradleyTerry(cmp).orderBy("rk")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(rows.map(_._1) == Seq("A", "B")) // equal strength -> item asc
    assert(rows(0)._4 == rows(1)._4)
    // normalization: strengths sum to ~ m (= 2) in 2^24 units
    val tot = rows.map(_._4).sum.toDouble / 16777216.0
    assert(math.abs(tot - 2.0) < 0.01)
  }

  test("bradleyTerry: never-winning item is floored at strength_q = 1, ranked last") {
    val cmp = Seq.fill(4)(("A", "Z")).toDF("winner", "loser")
    val rows = Preference.bradleyTerry(cmp).orderBy("rk")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    assert(rows.map(_._1) == Seq("A", "Z"))
    assert(rows(1)._4 == 1L)
  }

  test("bradleyTerry: item domain above maxItems fails loudly") {
    val cmp = (0 until 10).map(i => (s"i$i", s"i${(i + 1) % 10}"))
      .toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(cmp, maxItems = 5)
    }
    assert(e.getMessage.contains("maxItems"))
  }
}
