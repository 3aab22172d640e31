package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scan-width audit: explains every registry query and prints each
  * parquet scan's table plus its ReadSchema column list, one line per
  * (query, scan). The 100 TB review loop this serves: a scan reading
  * columns the query's output provably doesn't need is wasted I/O at
  * any scale, and the one systematic way to find the next t31/t38
  * (whose mapPartitions encode blocked pruning and dragged all five
  * documents columns through a two-column result — r16 finding) is to
  * read every scan, not to spot-check the slow ones.
  *
  * Since r17 the audit is a GATE, not a one-shot: `ScanAuditSpec`
  * regenerates the lines on the test session and diffs them against
  * the committed `SCANAUDIT.txt`, so a scan-width regression fails the
  * suite and widening a scan is a deliberate golden-file recommit.
  *
  * Parsing is PER SCAN BLOCK of the formatted explain (r16 ADVICE:
  * the old positional zipAll over two independent regex sweeps
  * misaligned every (table, schema) pair after a block missing either
  * match, and its non-greedy `[^>]*` schema capture truncated nested
  * structs at the first inner '>'). Each `(n) NodeName` block is
  * parsed alone: the table comes from the block's own Location line
  * (or "?" if it doesn't match — never borrowed from a neighbor), the
  * schema from the block's full ReadSchema line with depth-aware
  * top-level column splitting.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "runMain
  * graft.tools.ScanAudit [minCols]"` — prints only scans with at
  * least `minCols` columns (default 0 = everything, including
  * zero-column count-only scans); pipe to sort for the per-table
  * view. Plan-only (explain, no execution), though bounded
  * model-staging collects (BPE tables, centroids) still run at
  * DataFrame construction. */
object ScanAudit {

  /** Top-level column names of a ReadSchema struct body — splits on
    * commas at nesting depth 0 only, so `a:struct<b:int,c:int>,d:int`
    * yields (a, d)-style tops, never the inner fields. */
  private[graft] def topLevelCols(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    body.foreach { c =>
      if (c == ',' && depth == 0) { out += sb.toString; sb.clear() }
      else {
        if (c == '<' || c == '(') depth += 1
        else if (c == '>' || c == ')') depth -= 1
        sb += c
      }
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq.map(_.takeWhile(_ != ':').trim).filter(_.nonEmpty)
  }

  /** (table, top-level columns) per parquet scan block of a formatted
    * explain. A block is any `(n) NodeName` section containing a
    * ReadSchema line; its Location is read from the SAME block so a
    * missing/odd location yields "?" for that one scan instead of
    * shifting every later pair. */
  private[graft] def scanBlocks(formatted: String): Seq[(String, Seq[String])] = {
    val locRe = """Location:[^\n\[]*\[[^\]]*?/([A-Za-z0-9_]+)\.parquet[^\]]*\]""".r
    formatted.split("""\n\(\d+\) """).toSeq.flatMap { block =>
      block.linesIterator.find(_.trim.startsWith("ReadSchema:")).map { line =>
        val t = line.trim.stripPrefix("ReadSchema:").trim
        // full-line capture, nesting-tolerant: everything between the
        // outer struct< and the line's final >
        val body =
          if (t.startsWith("struct<") && t.endsWith(">"))
            t.stripPrefix("struct<").dropRight(1)
          else t
        val table = locRe.findFirstMatchIn(block).map(_.group(1)).getOrElse("?")
        (table, topLevelCols(body))
      }
    }
  }

  /** One line per (query, scan): `query\ttable\tncols\tcols`, queries
    * in name order, scans within a query sorted (plan-order is
    * deterministic, but sorting makes the golden diff insensitive to
    * cosmetic block reordering across Spark point releases). Queries
    * that fail to CONSTRUCT are reported as an ERROR line rather than
    * dropped — a silently-vanished query must not read as audited —
    * and a query whose own explain shows NO ReadSchema at all (its
    * input arrives through a CachePool-staged frame, so the parquet
    * scan lives in the staging query's plan) gets an explicit
    * `(no-scan)` marker line, so the golden records that shape too. */
  private[graft] def auditLines(
      spark: SparkSession, sfDir: String, minCols: Int = 0): Seq[String] =
    auditAll(spark, sfDir, minCols)._1

  /** One pass over the registry producing BOTH committed goldens:
    * the scan-width lines ([[auditLines]] format) and the shuffle
    * profile (`query\t<n hash exchanges>\t<canonical key sets>`, via
    * [[ShuffleAudit.exchangeProfile]]) — each query's DataFrame is
    * constructed and planned ONCE and feeds both sweeps. The shuffle
    * golden is the scan golden's twin for the other 100 TB axis: a
    * new Exchange in an untouched query (the e12 double-shuffle
    * class) fails the suite as a one-line diff. */
  private[graft] def auditAll(
      spark: SparkSession, sfDir: String,
      minCols: Int = 0): (Seq[String], Seq[String]) = {
    val both = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val out = new java.io.ByteArrayOutputStream()
        val df = fn(spark, sfDir)
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        val scans = scanBlocks(out.toString)
        val scanLines =
          if (scans.isEmpty) Seq(s"$name\t(no-scan)\t0\t")
          else scans.collect {
            case (t, cols) if cols.length >= minCols =>
              s"$name\t$t\t${cols.length}\t${cols.mkString(",")}"
          }.sorted
        val (nEx, keySets) =
          ShuffleAudit.exchangeProfile(df.queryExecution.executedPlan.toString)
        (scanLines, s"$name\t$nEx\t${keySets.mkString(";")}")
      } catch {
        case e: Throwable =>
          (Seq(s"$name\tERROR\t-\t${e.getMessage}"), s"$name\tERROR\t${e.getMessage}")
      } finally graft.CachePool.releaseAll()
    }
    (both.flatMap(_._1), both.map(_._2))
  }

  def main(args: Array[String]): Unit = {
    val minCols = args.headOption.map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    auditLines(spark, sfDir, minCols).foreach(println)
    spark.stop()
  }
}
