package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CachePool, GraftSession, SparkEntry}

/** Degenerate-fixture oracle cross-check (r16 verdict item 5): the r16
  * fixture tests pin the t38 / x45 / w28 degenerate semantics against
  * HAND-COMPUTED expectations, but the oracle CTEs were only argued
  * equivalent in comments — this probe runs the SAME degenerate
  * fixtures through the real driver-shaped gate (engine result parquet
  * + `oracle_sql.json` in `tools/compare_oracle.py`'s layout), so
  * DuckDB itself executes the multi-script/null-class, null/empty-text
  * and zero-converter paths and the comparison is value-for-value.
  *
  * Fixtures (identical rows to the TextDedupSpec pins):
  *   dirA/documents.parquet — t38's 4-script + all-null 'other' class
  *   dirA/events.parquet    — w28's no-purchase funnel with one
  *                            pre-view click (ordering guard)
  *   dirB/documents.parquet — x45's real + NULL + empty-text trio
  *
  * Usage:
  * {{{
  *   sbt "runMain graft.tools.DegenerateOracleProbe /tmp/degprobe"
  *   python3 tools/compare_oracle.py /tmp/degprobe/fix_a /tmp/degprobe/out_a
  *   python3 tools/compare_oracle.py /tmp/degprobe/fix_b /tmp/degprobe/out_b
  * }}}
  * Expect ALL GREEN on both. The r17 run's numbers are quoted in the
  * TextDedupSpec tests this probe backs. */
object DegenerateOracleProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/degprobe")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fixA = s"$root/fix_a"
    val fixB = s"$root/fix_b"
    // the sf fixtures are single parquet FILES (and DuckDB's view
    // pattern expects files) — flatten Spark's directory output
    def writeSingleFile(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
      val tmp = path + ".tmpdir"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
    // t38: four script classes + an all-null 'other' class — the
    // LEFT-JOIN coalesce path no sf fixture exercises
    writeSingleFile(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "hello world hello world hello"),
      (3L, "привет мир привет"),
      (4L, "你好 世界 你好"),
      (5L, null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"), s"$fixA/documents.parquet")
    // w28: two converting users, zero purchases anywhere, and one user
    // whose click PRECEDES their first view (must not convert)
    val base = 1700000000000000L
    writeSingleFile(Seq(
      (1L, base, "view", 10L), (1L, base + 10000000L, "click", 11L),
      (2L, base, "view", 20L), (2L, base + 5000000L, "click", 21L),
      (3L, base, "click", 30L), (3L, base + 1000000L, "view", 31L))
      .toDF("user_id", "tus", "event_type", "event_id")
      .select(col("user_id"), timestamp_micros(col("tus")).as("ts"),
        col("event_type"), col("event_id")), s"$fixA/events.parquet")
    // x45: real + NULL-text + empty-text (NULL counts in n_docs but
    // neither fits nor chunks; empty fits every window with 0 chunks)
    writeSingleFile(
      Seq((1L, "one two three"), (2L, null.asInstanceOf[String]), (3L, ""))
        .toDF("doc_id", "text"), s"$fixB/documents.parquet")

    def dump(fixDir: String, outDir: String, names: Seq[String]): Unit = {
      new java.io.File(outDir).mkdirs()
      names.foreach { name =>
        SparkEntry.queries(name)(spark, fixDir)
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
        CachePool.releaseAll()
        println(s"[deg-probe] wrote $outDir/$name")
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    dump(fixA, s"$root/out_a", Seq("t38_token_fertility", "w28_funnel_time"))
    dump(fixB, s"$root/out_b", Seq("x45_context_fit"))
    println(s"[deg-probe] now run: python3 tools/compare_oracle.py $fixA $root/out_a" +
      s" && python3 tools/compare_oracle.py $fixB $root/out_b")
    spark.stop()
  }
}
