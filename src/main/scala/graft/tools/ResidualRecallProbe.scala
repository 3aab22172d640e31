package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: raw-PQ vs residual-IVF-PQ recall@5 on the real
  * embeddings fixture at the bench operating point (dim 64, m=4,
  * ksub=16, nlist=16, exhaustive probes — identical index bytes). */
object ResidualRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val synthetic = args.contains("--synthetic")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    import spark.implicits._
    val embs =
      if (synthetic) {
        // the SimilaritySpec clustered shape at 64 dims: 16 centers,
        // 85% center + 15% noise
        val rnd = new scala.util.Random(42)
        val cs = Seq.fill(16)(Seq.fill(64)(rnd.nextFloat() * 2 - 1))
        (0 until 400).map { i =>
          val c = cs(i % 16)
          (i.toLong, c.map(x => (x * 0.85f + (rnd.nextFloat() * 2 - 1) * 0.15f)))
        }.toDF("vec_id", "embedding")
      } else spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("probe_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(embs, "vec_id", "embedding", col("vec_id") < 5, 5))
    def rec(s: Set[(Long, Long)]) = (s & exact).size.toDouble / exact.size
    for (rr <- Seq(0, 15)) {
      val raw = rec(pairs(Similarity.pqTopK(embs, "vec_id", "embedding",
        col("vec_id") < 5, 5, dim = 64, m = 4, ksub = 16, rerank = rr)))
      val res = rec(pairs(Similarity.ivfTopKPqResidual(embs, "vec_id", "embedding",
        col("vec_id") < 5, 5, dim = 64, nlist = 16, nprobe = 16, m = 4, ksub = 16, rerank = rr)))
      println(f"RERANK $rr%3d  raw_pq=$raw%.3f  residual=$res%.3f")
    }
    // distortion comparison at equal bytes: mean cosine(v, v̂) for raw
    // PQ reconstruction vs residual (centroid + r̂) reconstruction
    val rawCb = Similarity.pqSampledCodebooks(embs, "vec_id", "embedding", 64, 4, 16)
    val rawRecon = Similarity.pqEncode(embs, "embedding", 64, rawCb)
      .select(avg(graft.functions.VectorOps.cosineSim(col("embedding"),
        Similarity.pqReconstruct(col("_codes"), rawCb))))
      .collect()(0).getDouble(0)
    println(f"RAW_RECON_COS=$rawRecon%.4f")
    for (nlist <- if (synthetic) Seq(25, 50, 100) else Seq(64, 256, 2048)) {
      val res = rec(pairs(Similarity.ivfTopKPqResidual(embs, "vec_id", "embedding",
        col("vec_id") < 5, 5, dim = 64, nlist = nlist, nprobe = nlist, m = 4, ksub = 16)))
      // reconstruction quality: mean cosine(original, centroid + r̂)
      val cents = Similarity.collectCentroids(
        Similarity.ivfCentroidsMd5(embs, "vec_id", "embedding", nlist))
      val centMap = typedLit(cents.map { case (id, v) => id -> v.map(_.toDouble) }.toMap)
      val assigned = Similarity.ivfAssignCollected(embs, cents, "vec_id", "embedding")
        .withColumn("_res", zip_with(col("embedding"), element_at(centMap, col("list_id")),
          (v, c) => v.cast("double") - c))
      val cb = Similarity.pqSampledCodebooks(assigned, "vec_id", "_res", 64, 4, 16, salt = "pqr")
      val mc = Similarity.pqEncode(assigned, "_res", 64, cb)
        .select(avg(graft.functions.VectorOps.cosineSim(col("embedding"),
          zip_with(element_at(centMap, col("list_id")),
            Similarity.pqReconstruct(col("_codes"), cb), (c, r) => c + r))))
        .collect()(0).getDouble(0)
      println(f"NLIST $nlist%4d  residual=$res%.3f  mean_recon_cos=$mc%.4f")
    }
    // clustered fixture (the Bench shape: 85% center + 15% self, 16
    // centers) — ADC-only comparison, where residual coding should shine
    val centers = embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("_cid"), col("embedding").as("_cv"))
    val clustered = embs.withColumn("_cid", pmod(col("vec_id"), lit(16)))
      .join(centers, "_cid")
      .select(col("vec_id"),
        zip_with(col("_cv"), col("embedding"),
          (c, v) => (c * lit(0.85d) + v * lit(0.15d)).cast("float")).as("embedding"))
      .persist()
    clustered.count()
    val cExact = pairs(Similarity.cosineTopK(clustered, "vec_id", "embedding", col("vec_id") < 5, 5))
    def crec(s: Set[(Long, Long)]) = (s & cExact).size.toDouble / cExact.size
    val cRaw = crec(pairs(Similarity.pqTopK(clustered, "vec_id", "embedding",
      col("vec_id") < 5, 5, dim = 64, m = 4, ksub = 16)))
    val cRes = crec(pairs(Similarity.ivfTopKPqResidual(clustered, "vec_id", "embedding",
      col("vec_id") < 5, 5, dim = 64, nlist = 16, nprobe = 16, m = 4, ksub = 16)))
    val cRes64 = crec(pairs(Similarity.ivfTopKPqResidual(clustered, "vec_id", "embedding",
      col("vec_id") < 5, 5, dim = 64, nlist = 64, nprobe = 64, m = 4, ksub = 16)))
    println(f"CLUSTERED adc-only raw=$cRaw%.3f residual16=$cRes%.3f residual64=$cRes64%.3f")
    clustered.unpersist()
    spark.stop()
  }
}
