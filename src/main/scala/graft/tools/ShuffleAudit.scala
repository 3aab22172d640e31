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

  /** One key set per distinct hash Exchange of a physical-plan string
    * — plan_id-deduped (cached subtrees print under every consumer),
    * key expressions canonicalized by stripping expression ids
    * (`#5`/`#5L`). The key list is extracted by PAREN BALANCING from
    * `Exchange hashpartitioning(` to its matching close and split at
    * depth-0 commas (r17 review finding: the regex `([^)]*)` form
    * truncated at the first NESTED ')' — e.g. float keys print as
    * `knownfloatingpointnormalized(normalizenanandzero(score#5))` —
    * the same nesting bug class ScanAudit's r16 ADVICE fixed on the
    * scan side). The trailing partition count is dropped. ONE parse
    * shared by the subset-pair hunter in [[main]] and the golden
    * profile in [[exchangeProfile]], so a parser fix can never land
    * in one consumer and drift from the other. */
  private[graft] def exchangeKeySets(physicalPlan: String): Seq[Seq[String]] = {
    val marker = "Exchange hashpartitioning("
    val found = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    var anon = 0
    var i = physicalPlan.indexOf(marker)
    while (i >= 0) {
      val open = i + marker.length - 1
      var depth = 0
      var j = open
      var end = -1
      while (end < 0 && j < physicalPlan.length) {
        physicalPlan.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = j
          case _ =>
        }
        j += 1
      }
      if (end > open) {
        val body = physicalPlan.substring(open + 1, end)
        // depth-0 comma split, then strip expression ids
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        val sb = new StringBuilder
        var d = 0
        body.foreach { c =>
          if (c == ',' && d == 0) { parts += sb.toString; sb.clear() }
          else {
            if (c == '(' || c == '[') d += 1
            else if (c == ')' || c == ']') d -= 1
            sb += c
          }
        }
        if (sb.nonEmpty) parts += sb.toString
        val keys = parts.toSeq.map(_.trim.replaceAll("#\\d+L?", ""))
          .filter(k => k.nonEmpty && !k.forall(_.isDigit))
        // dedup by plan_id on the node's own line (cached subtrees
        // print under every consumer with the SAME id); a node whose
        // line carries no id gets a unique synthetic key
        val lineEnd = physicalPlan.indexOf('\n', end) match {
          case -1 => physicalPlan.length
          case n => n
        }
        val id = "plan_id=(\\d+)".r
          .findFirstMatchIn(physicalPlan.substring(end, lineEnd))
          .map(_.group(1))
          .getOrElse { anon += 1; s"anon$anon" }
        found.getOrElseUpdate(id, keys)
      }
      i = physicalPlan.indexOf(marker, i + marker.length)
    }
    found.values.toSeq
  }

  /** (distinct hash-Exchange count, canonical key sets) of one
    * physical-plan string — [[exchangeKeySets]] with members sorted
    * and rendered, the stable form behind the committed
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
    val keySets = exchangeKeySets(physicalPlan)
      .map(_.sorted.mkString("(", ",", ")")).sorted
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
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val keySets = exchangeKeySets(p).map(_.toSet)
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
