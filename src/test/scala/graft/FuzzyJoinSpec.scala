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
}
