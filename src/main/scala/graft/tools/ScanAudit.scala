package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scan-width audit: explains every registry query and prints each
  * parquet scan's file plus its ReadSchema column list, one line per
  * (query, scan). The 100 TB review loop this serves: a scan reading
  * columns the query's output provably doesn't need is wasted I/O at
  * any scale, and the one systematic way to find the next t31/t38
  * (whose mapPartitions encode blocked pruning and dragged all five
  * documents columns through a two-column result — r16 finding) is to
  * read every scan, not to spot-check the slow ones.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "runMain
  * graft.tools.ScanAudit [minCols]"` — prints only scans with at
  * least `minCols` columns (default 1 = everything); pipe to sort for
  * the per-table view. Plan-only (explain, no execution), though
  * bounded model-staging collects (BPE tables, centroids) still run
  * at DataFrame construction. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val minCols = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val fileRe = """file:[^\s\]]*?/([a-z_]+)\.parquet""".r
    val schemaRe = """ReadSchema: struct<([^>]*)>""".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val out = new java.io.ByteArrayOutputStream()
        val df = fn(spark, sfDir)
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        val f = out.toString
        // formatted explain lists scans as numbered blocks: pair each
        // Location's table with the ReadSchema that follows it
        val tables = fileRe.findAllMatchIn(f).map(_.group(1)).toList
        val schemas = schemaRe.findAllMatchIn(f).map(_.group(1)).toList
        tables.zipAll(schemas, "?", "?").foreach { case (t, s) =>
          val cols = s.split(",").map(_.takeWhile(_ != ':')).filter(_.nonEmpty)
          if (cols.length >= minCols)
            println(s"$name\t$t\t${cols.length}\t${cols.mkString(",")}")
        }
      } catch {
        case e: Throwable => println(s"$name\tERROR\t-\t${e.getMessage}")
      } finally graft.CachePool.releaseAll()
    }
    spark.stop()
  }
}
