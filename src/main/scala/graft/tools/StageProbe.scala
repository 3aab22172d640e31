package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{Bench, CachePool, GraftSession, SparkEntry}

/** Where does a registry query's wall-clock go at bench scale? Runs the
  * named queries under the Bench discipline while a SparkListener
  * tallies, for the STEADY-STATE (second) run: job count, stage count,
  * task count, executor CPU vs run time, shuffle bytes, and per-stage
  * wall time — the local-mode stand-in for the Spark UI's stage page
  * (guide §1.1/§7.1; the UI is disabled in the bench harness).
  *
  * Also splits plan-time from execution: `df.queryExecution
  * .executedPlan` is forced separately so analysis+optimization cost is
  * visible (tiny-sf queries can spend a large fraction there — that
  * cost is REAL for the bench but irrelevant at 100 TB, so knowing it
  * prevents optimizing the wrong thing).
  *
  * Usage: `sbt "runMain graft.tools.StageProbe d21_containment ..."`.
  * Not part of the driver contract.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "StageProbe: pass registry query names")
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"StageProbe: unknown queries: ${unknown.mkString(", ")}")
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
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    @volatile var collecting = false
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Int, Long, Long, Long, Long)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collecting) jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          stages += ((si.stageId, si.name.take(60),
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
            tm.shuffleReadMetrics.totalBytesRead, tm.shuffleWriteMetrics.bytesWritten))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // run 1: warmup (codegen/JIT) — not collected
      try { Bench.fullCount(fn(spark, sfDir)) } finally CachePool.releaseAll()
      System.gc()
      // run 2: steady state, collected
      val tBuild0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild1 = System.nanoTime()
      val _ = df.queryExecution.executedPlan // force analysis+optimization+planning
      val tPlan = System.nanoTime()
      jobs.set(0); stages.clear(); collecting = true
      val tExec0 = System.nanoTime()
      Bench.fullCount(df)
      val tExec1 = System.nanoTime()
      collecting = false
      CachePool.releaseAll()
      // listener bus is async; let stage events drain
      Thread.sleep(300)
      val wall = (tExec1 - tExec0) / 1e9
      println(f"===== $name build=${(tBuild1 - tBuild0) / 1e9}%.3f plan=${(tPlan - tBuild1) / 1e9}%.3f exec=$wall%.3f s jobs=${jobs.get} stages=${stages.size} tasks=${stages.map(_._4).sum}")
      val totalStageWall = stages.map(_._3).sum
      println(f"  stage-wall-sum=${totalStageWall / 1e3}%.3f s  execRun=${stages.map(_._5).sum / 1e3}%.3f s  execCpu=${stages.map(_._6).sum / 1e3}%.3f s  shufR=${stages.map(_._7).sum / 1024}%d KiB  shufW=${stages.map(_._8).sum / 1024}%d KiB")
      stages.sortBy(-_._3).take(12).foreach { case (id, nm, ms, nt, run, cpu, sr, sw) =>
        println(f"  stage $id%4d wall=${ms / 1e3}%.3f s tasks=$nt%3d run=${run / 1e3}%.3f cpu=${cpu / 1e3}%.3f shufR=${sr / 1024}%dK shufW=${sw / 1024}%dK  $nm")
      }
    }
    spark.stop()
  }
}
