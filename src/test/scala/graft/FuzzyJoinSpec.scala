package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && lev(s1, s2) <= 1
    } yield (i1, i2, lev(s1, s2))).toSet
  }

  test("editDistance1Join finds exactly the brute-force ED<=1 pairs (adversarial cases)") {
    // substitutions, insertions, deletions, duplicates, empty string,
    // repeated-char strings whose deletion variants collapse, and the
    // classic false-candidate shape abc/bcd (shared "bc" at distance 2)
    val rows = Seq(
      1L -> "abc", 2L -> "abd", 3L -> "ab", 4L -> "abcd", 5L -> "bcd",
      6L -> "xyz", 7L -> "xyz", 8L -> "", 9L -> "a", 10L -> "aa",
      11L -> "aab", 12L -> "baa", 13L -> "cabc")
    val got = FuzzyJoin.editDistance1Join(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteForce(rows))
  }

  test("editDistance1Join is complete on a random corpus vs brute force") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc" // tiny alphabet -> dense ED-1 neighborhoods
    val rows = (1L to 120L).map { i =>
      i -> (0 until (2 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString
    }
    val got = FuzzyJoin.editDistance1Join(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = bruteForce(rows)
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("maxBucketSize drops degenerate signature buckets instead of going quadratic") {
    // 50 identical strings: the self-signature bucket alone is 50 rows ->
    // 1225 pairs; capped at 10 the bucket is dropped entirely and no
    // pair survives (every shared signature sits in an over-cap bucket)
    val rows = (1L to 50L).map(i => i -> "same").toDF("id", "s")
    val capped = FuzzyJoin.editDistance1Join(rows, "id", "s", maxBucketSize = 10)
    assert(capped.count() == 0)
    val uncapped = FuzzyJoin.editDistance1Join(rows, "id", "s")
    assert(uncapped.count() == 50L * 49 / 2)
  }

  test("plan: signature equi-join, no cartesian product, no BNL") {
    val rows = (1L to 30L).map(i => i -> s"str$i").toDF("id", "s")
    val plan = FuzzyJoin.editDistance1Join(rows, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("sortedNeighborhoodPairs: exact successor pairs under the (key, id) order; volume is n(w-1) minus the tail") {
    val df = Seq(
      (10L, "apple pie"),
      (11L, "apple pia"),   // sorts before "apple pie"
      (12L, "apple pip"),
      (40L, "zebra")
    ).toDF("id", "k")
    // order: (11 apple pia) (10 apple pie) (12 apple pip) (40 zebra)
    val w2 = FuzzyJoin.sortedNeighborhoodPairs(df, "id", "k", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w2 == Set((11L, 10L), (10L, 12L), (12L, 40L)), s"got $w2")
    val w3 = FuzzyJoin.sortedNeighborhoodPairs(df, "id", "k", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w3 == w2 ++ Set((11L, 12L), (10L, 40L)),
      "window 3 adds exactly the distance-2 neighbors")
    // keys ride along for the caller's verify measure
    val keys = FuzzyJoin.sortedNeighborhoodPairs(df, "id", "k", window = 2)
      .filter(col("id_a") === 11L).collect().head
    assert(keys.getAs[String]("key_a") == "apple pia" &&
      keys.getAs[String]("key_b") == "apple pie")
  }

  test("sortedNeighborhoodPairs: partitioning-independent (the distributed row index is the order contract)") {
    val df = (0 until 500).map(i => (i.toLong, f"key${(i * 37) % 250}%03d")).toDF("id", "k")
    def at(parts: Int): Set[(Long, Long)] =
      FuzzyJoin.sortedNeighborhoodPairs(df.repartition(parts), "id", "k", window = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = at(1)
    assert(p1 == at(11), "adjacency must not depend on layout")
    assert(p1.size == 499 + 498, "n-1 + n-2 successor pairs")
  }
}
