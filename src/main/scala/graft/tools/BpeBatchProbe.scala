package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the r17 batched-exact distributed BPE rounds
  * ([[graft.operators.TextAnalysis.bpeTrain]]'s `mergeBatchProbe`)
  * against the r12 one-merge-per-round loop on the production-shaped
  * morphology corpus TextDedupSpec's vocabCap pin uses (root+suffix
  * compositions, Zipf(α≈1), ~1M token instances over 20k types) —
  * the corpus class the exact distributed tier exists for. Reports
  * scheduling rounds (CachePool registrations minus the two staging
  * frames), average batch size, and wall seconds, for the scaladoc's
  * committed numbers. Usage: runMain graft.tools.BpeBatchProbe
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val merges = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(1009L)
    val alphabet = "abcdefghijklmnop"
    val roots = (0 until 4000).map { _ =>
      val len = 4 + rnd.nextInt(5)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val suffixes = Seq("", "s", "ing", "ed", "er", "ly", "tion", "ness")
    val words = roots.flatMap(r => suffixes.map(r + _)).distinct.take(20000)
    val freqs = words.zipWithIndex.map { case (w, i) =>
      w -> math.max(1L, 100000L / (i + 1L)) }
    val instances = freqs.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    val df = rnd.shuffle(instances).grouped(100)
      .map(ws => Tuple1(ws.mkString(" "))).toSeq.toDF("text").cache()
    df.count()
    // steady-state pass per probe setting (run 2 of 2 reported too —
    // the first pays tokenize/JIT warmup both settings share)
    Seq(64, 1).foreach { probe =>
      (1 to 2).foreach { run =>
        val before = graft.CachePool.trackedCount
        val t0 = System.nanoTime()
        val n = graft.operators.TextAnalysis.bpeTrain(df, "text",
          merges = merges, maxDriverVocab = 0, mergeBatchProbe = probe)
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        val rounds = graft.CachePool.trackedCount - before - 2
        println(f"[bpe-batch] probe=$probe run$run: $n rules in $rounds rounds " +
          f"(avg batch ${n.toDouble / rounds}%.2f), $sec%.2f s")
        graft.CachePool.releaseAll() // pool frames only; df's own cache survives
      }
    }
    df.unpersist()
    spark.stop()
  }
}
