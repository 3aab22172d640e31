package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
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

  /** Bit-spread of a 16-bit value into even bit positions (0, 2, 4, …)
    * — the standard 4-step magic-mask dilation, branch-free and
    * codegen-friendly (pure bitwise Column arithmetic, no UDF). */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (Z-order) value interleaving the low 16 bits of two
    * non-negative dimensions — a space-filling curve that keeps rows
    * close in BOTH dimensions close in the one-dimensional sort order.
    * Sorting files by z-value bounds each file's min/max span on every
    * interleaved dimension (a plain sort bounds only its leading
    * column), so parquet row-group stats prune range predicates on
    * either dimension. Callers quantize first (e.g. `pmod(c, 65536)` or
    * a range-rank bucket) — the curve needs bounded ints. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Write `df` z-ordered on `(dimA, dimB)`: min/max-scale each
    * dimension to the full 16-bit range (raw values would let the
    * wider-ranged dimension's high bits dominate the curve and leave
    * the narrow one unclustered), interleave, range-partition by
    * z-value into `numFiles` tasks, sort within each by z, drop the
    * helper column. Cost: one 4-scalar stats aggregate (metadata-class
    * driver job) + ONE range-exchange (sampling pass + shuffle) — the
    * same as any global sort-write, but the clustering serves range
    * filters on both dimensions instead of one. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      numFiles: Int,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    require(!df.columns.contains("_z"),
      "writeZOrdered: _z is the internal curve column — rename it in the input")
    val stats = df.agg(
      min(col(dimA)).cast("double"), max(col(dimA)).cast("double"),
      min(col(dimB)).cast("double"), max(col(dimB)).cast("double")).head()
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(65535L),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * 65535.0).cast("long"))
    val arranged = df
      .withColumn("_z", zValue(
        quant(col(dimA), stats.getDouble(0), stats.getDouble(1)),
        quant(col(dimB), stats.getDouble(2), stats.getDouble(3))))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    val writer = arranged.write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(path)
  }
}
