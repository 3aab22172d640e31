package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-simulation replay harness — the engine's replacement for the
  * reference's Producer (reference: src/main/scala/Producer.scala:20-53),
  * which re-scanned the whole source once per segment (O(segments×rows))
  * and had an off-by-one that made segment 0 span 1001 rows
  * (Producer.scala:31-37).
  *
  * Here segmentation is ONE pass: a distributed contiguous row index
  * (RelationalOps.withRowIndex — no single-partition window), a
  * `floor(idx / n)` segment id, and a single partitioned write that emits
  * every segment directory at once. Replay cadence is then a cheap
  * driver-side move of pre-materialized directories — rate limiting never
  * touches the data again.
  */
object Segmentation {

  /** Assign exact `rowsPerSegment`-sized segments (last gets remainder)
    * in the total order given by `orderCols`. */
  def segmented(df: DataFrame, rowsPerSegment: Long, orderCols: Seq[String]): DataFrame = {
    val indexed = RelationalOps.withRowIndex(df, "_row_idx", orderCols.map(col))
    RelationalOps.withSegment(indexed, "_row_idx", rowsPerSegment)
  }

  /** Materialize all segments in one job: `partitionBy(segment)` writes
    * `segment=<i>/` directories in a single pass over the input. */
  def writeSegments(
      df: DataFrame,
      rowsPerSegment: Long,
      orderCols: Seq[String],
      outDir: String,
      format: String = "csv"): Unit =
    segmented(df, rowsPerSegment, orderCols)
      .drop("_row_idx")
      .write.mode("overwrite")
      .option("header", "true")
      .partitionBy("segment")
      .format(format)
      .save(outDir)

  /** Replay pre-materialized segments into a live directory at a fixed
    * cadence (the reference slept 1 s between segment writes,
    * Producer.scala:46) — driver-side renames only, no recompute. */
  def replay(
      spark: SparkSession,
      stagedDir: String,
      liveDir: String,
      delayMillis: Long): Int = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(stagedDir).getFileSystem(hadoopConf)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(stagedDir))
      .filter(_.isDirectory)
      .map(_.getPath)
      .sortBy(p => "segment=(\\d+)".r.findFirstMatchIn(p.getName).map(_.group(1).toInt).getOrElse(Int.MaxValue))
    fs.mkdirs(new org.apache.hadoop.fs.Path(liveDir))
    segs.zipWithIndex.foreach { case (p, i) =>
      if (i > 0 && delayMillis > 0) Thread.sleep(delayMillis)
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
        new org.apache.hadoop.fs.Path(s"$liveDir/${p.getName}"), false, hadoopConf)
    }
    segs.length
  }
}
