package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan pruning — at 100 TB the cheapest
  * query is the one that never reads the bytes:
  *
  *  - hive-style PARTITION directories on low-cardinality columns turn
  *    equality/IN filters into directory skips (Catalyst partition
  *    pruning — `PartitionFilters` in the scan node, no file I/O at
  *    all for pruned values);
  *  - SORTING within files on the query's range column tightens parquet
  *    row-group min/max statistics, so range predicates skip row groups
  *    inside the files that do get read (predicate pushdown —
  *    `PushedFilters` — only helps when the stats are tight; random
  *    layout makes every row group's [min, max] span everything).
  *
  * The write is ONE shuffle (repartition on the partition columns, so
  * each output directory is written by one task and produces few,
  * well-sized files) + a per-task sort. For heavily skewed partition
  * values, append a salt column to `partitionCols` in the repartition
  * via a pre-derived column and keep `maxRecordsPerFile` set — the
  * directory layout is unchanged, the skewed writer task is split.
  * LayoutSpec pins both pruning effects on the written output. */
object Layout {

  /** Write `df` to `path` partitioned by `partitionCols`, sorted within
    * files by `sortCols`; `maxRecordsPerFile > 0` bounds file size (and
    * keeps per-file min/max ranges disjoint, since the sort order is
    * preserved across the split). */
  def writeClustered(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty || sortCols.nonEmpty, "nothing to lay out")
    val arranged =
      (if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*) else df)
        .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = arranged.write.mode(SaveMode.Overwrite)
    val sized =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    (if (partitionCols.nonEmpty) sized.partitionBy(partitionCols: _*) else sized)
      .parquet(path)
  }
}
