package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisection probe for the round-9 streaming-dedup throughput question:
  * times [[graft.Bench.benchStreamingDedup]] (and optionally the
  * index-growth probe) in a FRESH JVM, with an optional heavy prelude
  * that replays the bench-process state the full run accumulates
  * (registry queries + scale probes) before the streaming section.
  *
  * Usage: runMain graft.tools.StreamingDedupProbe [prelude] [growth]
  *   prelude — first run a heap/JIT-heavy slice of the registry twice
  *             (mimics the full bench's JVM state at the point the
  *             streaming sections execute)
  *   growth  — also run the 1x/5x/25x index-growth probe
  *
  * Fresh-JVM vs prelude numbers on the same build separate "the
  * operator got slower" from "the bench process got slower around it".
  */
object StreamingDedupProbe {
  def main(args: Array[String]): Unit = {
    val flags = args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    if (flags("prelude")) {
      // heaviest registry families, min-of-2 like the real bench loop
      val names = Seq("x14_curate", "d9_neardup_groups_logstar", "m6_phash",
        "a13_approx_distinct", "d15_boilerplate", "x21_dsir_score", "s12_ivf_pq",
        "e10_interpolate", "t12_tfidf", "d3_lsh_buckets")
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        (1 to 2).foreach { _ =>
          try graft.Bench.fullCount(fn(spark, sfDir))
          finally graft.CachePool.releaseAll()
        }
      }
      println(s"[probe] prelude done (${names.size} queries x2)")
    }
    if (flags("ann")) {
      println("[probe] ann: " + graft.Bench.benchAnnQuality(spark))
      spark.stop()
      return
    }
    if (flags("split")) {
      // cost attribution per batch stage (r12 verdict item 5): replay
      // the bench's 8-segment drain calling the SAME private pieces
      // processBatch composes, a timer around each — separates
      // signature-build / index-scan+join / jaccard-verify /
      // match-write / index-append / marker+engine overhead
      import org.apache.spark.sql.functions.{col, floor}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val rows = docs.count()
      val nSegs = 8
      val base = java.nio.file.Files.createTempDirectory("graft-sdedup-split").toString
      docs.withColumn("_seg",
          floor(col("doc_id") * nSegs / (rows + 1)).cast("int"))
        .repartition(1)
        .write.partitionBy("_seg").parquet(s"$base/in")
      val dedup = new graft.streaming.StreamingLshDedup(s"$base/index", s"$base/matches")
      var tSig = 0.0; var tJoin = 0.0; var tVerify = 0.0
      var tWriteM = 0.0; var tWriteI = 0.0; var tWriteD = 0.0
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val total0 = System.nanoTime()
      (0 until nSegs).foreach { seg =>
        val batch = spark.read.parquet(s"$base/in/_seg=$seg")
        var staged: org.apache.spark.sql.DataFrame = null
        var nb: org.apache.spark.sql.DataFrame = null
        var cands: org.apache.spark.sql.DataFrame = null
        var matches: org.apache.spark.sql.DataFrame = null
        tSig += time {
          staged = dedup.stagedDocs(batch).persist()
          nb = dedup.bucketRows(staged)
          staged.count()
        }
        tJoin += time {
          cands = (if (seg == 0)
            nb.as("n").join(nb.as("o"),
              col("n.band") === col("o.band") && col("n.bucket") === col("o.bucket") &&
                col("n.doc_id") < col("o.doc_id"))
          else
            nb.as("n").join(dedup.prunedIndex(spark, nb).as("o"),
              col("n.band") === col("o.band") && col("n.bucket") === col("o.bucket") &&
                col("n.doc_id") =!= col("o.doc_id")))
            .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
            .distinct()
            .persist()
          cands.count()
        }
        tVerify += time {
          val oldSh =
            if (seg == 0) staged.select(col("doc_id"), col("_sh"))
            else spark.read.parquet(s"$base/index/docs")
          matches = cands
            .join(staged.select(col("doc_id").as("new_id"), col("_sh").as("_sn")),
              Seq("new_id"))
            .join(oldSh.select(col("doc_id").as("old_id"), col("_sh").as("_so")),
              Seq("old_id"))
            .withColumn("jaccard",
              graft.operators.Dedup.jaccardFromShingles(col("_sn"), col("_so")))
            .filter(col("jaccard") >= 0.5)
            .select(col("new_id"), col("old_id"), col("jaccard"))
            .persist()
          matches.count()
        }
        tWriteM += time {
          matches.write.mode("append").parquet(s"$base/matches")
        }
        tWriteI += time {
          nb.write.mode("append").partitionBy("_bp").parquet(s"$base/index/data")
        }
        tWriteD += time {
          staged.select(col("doc_id"), col("_sh"))
            .write.mode("append").parquet(s"$base/index/docs")
        }
        staged.unpersist(); cands.unpersist(); matches.unpersist()
      }
      val total = (System.nanoTime() - total0) / 1e9
      println(f"[probe] split: rows=$rows segs=$nSegs total=$total%.2f " +
        f"sig=$tSig%.2f join=$tJoin%.2f verify=$tVerify%.2f " +
        f"write_matches=$tWriteM%.2f write_index=$tWriteI%.2f " +
        f"write_docs=$tWriteD%.2f " +
        f"other=${total - tSig - tJoin - tVerify - tWriteM - tWriteI - tWriteD}%.2f")
      spark.stop()
      return
    }
    val nSeg = sys.env.getOrElse("SPARK_GRAFT_PROBE_SEGMENTS", "8").toInt
    (1 to 3).foreach { i =>
      val out = graft.Bench.benchStreamingDedup(spark, sfDir, nSegments = nSeg)
      println(s"[probe] streaming_dedup run$i: $out")
    }
    if (flags("growth"))
      println("[probe] growth: " + graft.Bench.benchStreamingDedupGrowth(spark, sfDir))
    spark.stop()
  }
}
