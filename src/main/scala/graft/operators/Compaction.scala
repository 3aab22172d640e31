package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the operational companion to every streaming
  * sink and over-parallelized batch write. At 100 TB the small-files
  * problem is a first-order cost: each file is a scan task, a parquet
  * footer read, and a namenode/listing op; a directory with 10^6 tiny
  * files can cost more to PLAN than to read. Compaction rewrites a
  * directory into ~`targetFileBytes` files sized from the ACTUAL input
  * bytes (not a guessed partition count).
  *
  * `shuffle = true` (default) uses `repartition` — one exchange, evenly
  * sized outputs (the right choice when file sizes are skewed);
  * `shuffle = false` uses `coalesce` — zero exchange, but output sizes
  * inherit input skew. Rewrites to a NEW directory: compact-then-swap
  * keeps readers of the old layout alive (same pointer discipline as
  * ParquetKpiStore's versioned dirs).
  */
object Compaction {

  /** Total bytes and file count of the data files under `dir`,
    * RECURSIVE — partitioned layouts keep their data files in
    * subdirectories, and a non-recursive count would report 0 bytes
    * (and size the rewrite to a single file). */
  def dirStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var bytes = 0L
    var n = 0
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Rewrite `inDir` (parquet) into `outDir` with ~`targetFileBytes`
    * per file. Returns (input files, output files). For a partitioned
    * layout pass `partitionBy` so the output keeps the directory
    * structure (each partition gets its share of the sized file count);
    * omitting it flattens partition columns into the data files. */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = true,
      partitionBy: Seq[String] = Nil): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (bytes, nIn) = dirStats(spark, inDir)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val sized =
      if (partitionBy.nonEmpty)
        // co-locate rows of a partition so each partition dir gets few
        // whole files rather than nOut slivers
        df.repartition(nOut, partitionBy.map(org.apache.spark.sql.functions.col): _*)
      else if (shuffle) df.repartition(nOut)
      else df.coalesce(nOut)
    val writer = sized.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(outDir)
    (nIn, dirStats(spark, outDir)._2)
  }
}
