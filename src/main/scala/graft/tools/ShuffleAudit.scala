package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CachePool, GraftSession, SparkEntry}

/** Registry-wide shuffle audit — hunts the e12/j17 smell: a plan with
  * two hash Exchanges whose key sets are subset-related re-shuffles
  * data that was ALREADY clustered finely enough (HashPartitioning on
  * keys K satisfies any clustering requirement ⊇ K, but
  * EnsureRequirements never under-partitions on its own, so only an
  * explicit `repartition` can share the Exchange). Each flagged query
  * deserves a look: some are genuine (the second shuffle runs on
  * aggregated/shrunk data, where re-shuffling the raw fact would cost
  * more), some are the double-shuffle bug e12 had.
  *
  * Usage: `sbt "runMain graft.tools.ShuffleAudit"` (sf0.001). Prints
  * one line per flagged query: the distinct hash-Exchange key sets.
  */
object ShuffleAudit {

  private val exchangeRe =
    "Exchange hashpartitioning\\(([^)]*)\\)[^\\n]*plan_id=(\\d+)".r

  /** (distinct hash-Exchange count, canonical key sets) of one
    * physical-plan string — plan_id-deduped (cached subtrees print
    * under every consumer), key sets with column ids stripped and
    * members sorted so the profile is stable across runs. Feeds both
    * the subset-pair hunter below and the committed
    * `SHUFFLEAUDIT.txt` golden (r17): the scan golden catches I/O
    * width creep, this one catches SHUFFLE creep — a new exchange in
    * an untouched query is the next e12 double-shuffle, visible as a
    * one-line golden diff instead of a per-query spot-check.
    *
    * NOTE: this profiles the printed PRE-AQE tree — iterative queries
    * whose staged frames are consumed by several branches repeat the
    * staging subtree per consumer (x33 prints 61 exchange nodes where
    * execution reuses/caches most of them), so the number is a DRIFT
    * detector for the plan shape, not a runtime shuffle count. */
  private[graft] def exchangeProfile(physicalPlan: String): (Int, Seq[String]) = {
    val byId = exchangeRe.findAllMatchIn(physicalPlan)
      .map(m => m.group(2) -> m.group(1)).toMap
    val keySets = byId.values.toSeq.map { keys =>
      keys.split(",").map(_.trim.takeWhile(_ != '#'))
        .filter(k => k.nonEmpty && !k.forall(_.isDigit))
        .toSeq.sorted.mkString("(", ",", ")")
    }.sorted
    (keySets.size, keySets)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val exRe = "Exchange hashpartitioning\\(([^)]*)\\)[^\\n]*plan_id=(\\d+)".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        // one entry per physical node (cached subtrees print twice
        // under both consumers — dedup by plan_id)
        val byId = exRe.findAllMatchIn(p)
          .map(m => m.group(2) -> m.group(1)).toMap
        val keySets = byId.values.toSeq.map { keys =>
          keys.split(",").map(_.trim.takeWhile(_ != '#'))
            .filter(k => k.nonEmpty && !k.forall(_.isDigit)).toSet
        }
        val subsetPairs = for {
          i <- keySets.indices
          j <- keySets.indices
          if i != j && keySets(i).subsetOf(keySets(j))
        } yield s"${keySets(i).mkString("(", ",", ")")} subsetOf ${keySets(j).mkString("(", ",", ")")}"
        if (subsetPairs.nonEmpty)
          println(s"$name: ${subsetPairs.distinct.mkString("; ")}")
      } catch {
        case e: Throwable => println(s"$name: AUDIT ERROR ${e.getMessage}")
      }
      CachePool.releaseAll()
    }
    spark.stop()
  }
}
