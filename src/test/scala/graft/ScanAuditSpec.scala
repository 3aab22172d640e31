package graft

import graft.tools.ScanAudit

/** The scan-width audit as a GATE (r16 verdict item 4: the committed
  * r16 sweep said zero full-width documents scans, but nothing stopped
  * r17 adding one — "the audit ran once; make it a gate"). The whole
  * registry's (query, table, ReadSchema) lines are regenerated on the
  * test session every suite run and diffed against the committed
  * golden `SCANAUDIT.txt`: a widened scan fails the suite, and
  * widening one deliberately means re-running with
  * `SPARK_GRAFT_REGEN_SCANAUDIT=1` and reviewing/committing the diff —
  * the same discipline as a budget re-baseline.
  *
  * The golden file is the TEST session's output (local[4], no
  * GraftSession.tune): scan blocks don't depend on parallelism, but
  * pinning the producer removes any doubt about which environment the
  * committed lines mean. */
class ScanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val goldenPath = java.nio.file.Paths.get("SCANAUDIT.txt")
  private val shuffleGoldenPath = java.nio.file.Paths.get("SHUFFLEAUDIT.txt")

  /** Both sweeps off ONE plan-construction pass over the registry —
    * shared by the two golden tests below. */
  private lazy val audits: (Seq[String], Seq[String]) =
    ScanAudit.auditAll(spark, dir)

  private def diffGolden(
      lines: Seq[String], path: java.nio.file.Path, what: String): Unit = {
    if (sys.env.contains("SPARK_GRAFT_REGEN_SCANAUDIT")) {
      java.nio.file.Files.writeString(path, lines.mkString("", "\n", "\n"))
      System.err.println(s"[scan-audit] regenerated $path " +
        s"(${lines.size} lines) — review the diff before committing")
    } else {
      assert(java.nio.file.Files.exists(path),
        s"$path missing — regenerate with SPARK_GRAFT_REGEN_SCANAUDIT=1 and commit it")
      val golden = java.nio.file.Files.readString(path)
        .linesIterator.filter(_.nonEmpty).toSeq
      // MULTISET comparison (r17 review finding: a set diff is blind
      // to multiplicity, and the goldens legitimately carry duplicate
      // lines — a22 scans customer twice — so an ADDED identical scan,
      // exactly the wasted-I/O regression this gate exists for, would
      // pass a set-based check silently)
      def counts(ls: Seq[String]): Map[String, Int] =
        ls.groupBy(identity).map { case (k, v) => k -> v.size }
      val fresh = counts(lines)
      val gold = counts(golden)
      def delta(a: Map[String, Int], b: Map[String, Int]): Seq[String] =
        a.collect { case (l, n) if n > b.getOrElse(l, 0) =>
          s"$l  [x$n vs x${b.getOrElse(l, 0)}]"
        }.toSeq.sorted
      val widened = delta(fresh, gold)
      val gone = delta(gold, fresh)
      assert(widened.isEmpty && gone.isEmpty,
        s"$what drift vs committed $path — review each line, fix the " +
          "query or deliberately regenerate with SPARK_GRAFT_REGEN_SCANAUDIT=1:\n" +
          s"new/changed:\n${widened.mkString("\n")}\n" +
          s"missing vs golden:\n${gone.mkString("\n")}")
    }
  }

  test("ReadSchema parser: nesting-tolerant columns, per-block table pairing") {
    // depth-aware top-level split — the r16 ADVICE case: the old
    // non-greedy [^>]* truncated at the first inner '>' of a nested
    // struct and then misaligned every later (table, schema) pair
    assert(ScanAudit.topLevelCols("a:int,b:string") == Seq("a", "b"))
    assert(ScanAudit.topLevelCols("a:struct<b:int,c:array<int>>,d:int")
      == Seq("a", "d"))
    assert(ScanAudit.topLevelCols("v:array<struct<x:int,y:int>>") == Seq("v"))
    assert(ScanAudit.topLevelCols("a:decimal(15,2),b:int") == Seq("a", "b"))
    assert(ScanAudit.topLevelCols("") == Seq.empty)
    val formatted =
      """== Physical Plan ==
        |* HashAggregate (3)
        |+- Scan parquet  (1)
        |
        |(1) Scan parquet
        |Output [1]: [doc_id#1L]
        |Location: InMemoryFileIndex [file:/tmp/sf/documents.parquet]
        |ReadSchema: struct<doc_id:bigint,meta:struct<w:int,h:int>>
        |
        |(2) Scan parquet
        |Output: []
        |ReadSchema: struct<>
        |
        |(3) HashAggregate
        |Keys: []
        |""".stripMargin
    val scans = ScanAudit.scanBlocks(formatted)
    // nested struct keeps ONE top-level column; the location-less
    // zero-column scan reports ("?", 0 cols) for ITSELF without
    // shifting the first block's pairing
    assert(scans == Seq(("documents", Seq("doc_id", "meta")), ("?", Seq.empty)))
  }

  test("exchange parser: paren-balanced keys survive nesting, plan_id dedup, count dropped") {
    // r17 review finding: the regex `([^)]*)` form truncated float
    // keys (knownfloatingpointnormalized(normalizenanandzero(x#5)))
    // at the FIRST nested ')' — the parser now balances parens and
    // splits keys at depth 0 only
    val plan =
      "+- Exchange hashpartitioning(knownfloatingpointnormalized(normalizenanandzero(score#5)), xxhash64(_g#7, 42), 4), ENSURE_REQUIREMENTS, [plan_id=12]\n" +
        "   +- Exchange hashpartitioning(user_id#3L, 4), REPARTITION_BY_COL, [plan_id=13]\n" +
        // a cached subtree prints its node again under a second
        // consumer with the SAME plan_id — must not double-count
        "+- Exchange hashpartitioning(knownfloatingpointnormalized(normalizenanandzero(score#5)), xxhash64(_g#7, 42), 4), ENSURE_REQUIREMENTS, [plan_id=12]\n"
    val ks = graft.tools.ShuffleAudit.exchangeKeySets(plan)
    assert(ks == Seq(
      Seq("knownfloatingpointnormalized(normalizenanandzero(score))", "xxhash64(_g, 42)"),
      Seq("user_id")), s"$ks")
    val (n, canonical) = graft.tools.ShuffleAudit.exchangeProfile(plan)
    assert(n == 2 && canonical ==
      Seq("(knownfloatingpointnormalized(normalizenanandzero(score)),xxhash64(_g, 42))",
        "(user_id)"), s"$n $canonical")
  }

  test("registry scan widths match the committed SCANAUDIT.txt golden") {
    val lines = audits._1
    // construction failures must surface here, not vanish from the audit
    val errs = lines.filter(_.contains("\tERROR\t"))
    assert(errs.isEmpty, s"queries failed to construct:\n${errs.mkString("\n")}")
    // every registry query must appear (a query with zero parquet scans
    // would be a registry anomaly worth failing on too)
    val audited = lines.map(_.takeWhile(_ != '\t')).toSet
    assert(audited == SparkEntry.queries.keySet,
      s"audit coverage mismatch; missing=${(SparkEntry.queries.keySet -- audited).toSeq.sorted}, " +
        s"extra=${(audited -- SparkEntry.queries.keySet).toSeq.sorted}")
    // the r16 finding's hard backstop, independent of the golden: NO
    // query may scan the documents table full-width (the t31/t38 class
    // — a mapPartitions boundary upstream of the result blocking
    // pruning and dragging all columns through a narrow output)
    val docWidth = spark.read.parquet(s"$dir/documents.parquet").schema.size
    val fullWidth = lines.filter { l =>
      val p = l.split('\t'); p(1) == "documents" && p(2).toInt >= docWidth
    }
    assert(fullWidth.isEmpty,
      s"full-width documents scans (all $docWidth cols):\n${fullWidth.mkString("\n")}")
    diffGolden(lines, goldenPath, "scan-width (wasted I/O at 100 TB)")
  }

  test("registry shuffle profiles match the committed SHUFFLEAUDIT.txt golden") {
    // the scan golden's twin for the other scale axis: every query's
    // distinct hash-Exchange count + canonical key sets are committed,
    // so a NEW shuffle in an untouched query (the e12 double-shuffle
    // class — a lost exchange reuse, a repartition creeping in, a join
    // falling off its co-partitioning) fails the suite as a one-line
    // diff instead of waiting for a bench-level timing drift
    val lines = audits._2
    val errs = lines.filter(_.contains("\tERROR"))
    assert(errs.isEmpty, s"queries failed to plan:\n${errs.mkString("\n")}")
    val audited = lines.map(_.takeWhile(_ != '\t')).toSet
    assert(audited == SparkEntry.queries.keySet,
      s"shuffle-audit coverage mismatch; missing=${(SparkEntry.queries.keySet -- audited).toSeq.sorted}")
    diffGolden(lines, shuffleGoldenPath, "shuffle-profile (exchange creep)")
  }
}
