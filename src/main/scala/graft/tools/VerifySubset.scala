package graft.tools

import graft.{CachePool, GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev-loop twin of [[graft.Verify]] restricted to named queries —
  * dumps each result to parquet plus its oracle SQL to
  * `<out>/oracle_sql_subset.json`, so a new query can be
  * DuckDB-checked in seconds instead of replaying all of the registry.
  * Usage: runMain graft.tools.VerifySubset <sfDir> <outDir> <q1,q2,…> */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: graft.tools.VerifySubset <sfDir> <outDir> <q1,q2,...>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = wanted.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      CachePool.releaseAll()
      println(s"[verify-subset] wrote $name")
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
    val json = SparkEntry.oracleSql.filter(kv => wanted.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql_subset.json"), json)
    spark.stop()
  }
}
