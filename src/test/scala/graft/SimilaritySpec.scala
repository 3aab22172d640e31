package graft

import graft.functions.VectorOps
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("native dot/cosine agree with the HOF reference formulation") {
    val df = vecs(50, 16).toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b")).limit(200)
      .select(
        VectorOps.dot(col("a.v"), col("b.v")).as("dn"),
        VectorOps.dotHof(col("a.v"), col("b.v")).as("dh"),
        VectorOps.cosineSim(col("a.v"), col("b.v")).as("cn"),
        VectorOps.cosineSimHof(col("a.v"), col("b.v")).as("ch"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12)
    }
  }

  test("cosine of a vector with itself is 1, zero vector is 0") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)), (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f)))
      .toDF("a", "b")
    val got = df.select(VectorOps.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
  }

  test("cosineTopK: exact neighbors, self excluded, rank contiguous") {
    val df = vecs(80, 8).toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 3, 5)
    val rows = got.collect()
    assert(rows.length == 15) // 3 probes x 5
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 5))
      assert(!rs.map(_.getLong(1)).contains(p))
    }
    // brute-force check for probe 0
    val all = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      d / (na * nb)
    }
    val expect = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(all(0L), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val gotN = byProbe(0L).sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    assert(gotN == expect)
  }

  test("knnJoinBucketed: neighbors stay in-bucket, ranks match brute force per bucket") {
    val df = vecs(60, 8).toDF("vec_id", "embedding")
    val got = Similarity.knnJoinBucketed(df, "vec_id", "embedding", k = 3, dim = 8, h = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.nonEmpty)
    // replay the signature model: bit i = sign(v . plane_i)
    val all = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val planes = Similarity.planeComponents(dim = 8, h = 2)
    def sig(v: Seq[Float]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        val d = v.zip(p).map { case (x, w) => x.toDouble * w }.sum
        if (d >= 0) 1L << i else 0L
      }.sum
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val bySig = all.keys.groupBy(id => sig(all(id)))
    val expect = bySig.values.flatMap { ids =>
      ids.flatMap { p =>
        ids.filter(_ != p).toSeq
          .map(c => (c, cos(all(p), all(c))))
          .sortBy { case (id, cv) => (-cv, id) }.take(3).zipWithIndex
          .map { case ((c, _), i) => (p, c, i + 1) }
      }
    }.toSet
    assert(got.toSet == expect, s"got ${got.length} rows, expect ${expect.size}")
  }

  test("knnJoinBucketed: oversize buckets drop under the cap, small ones survive") {
    // three copies of (1,0) share a bucket; (-1,0) pair shares the
    // complementary bucket. cap=2 kills the triple, keeps the pair.
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0f)),
      (4L, Seq(-1f, 0f)), (5L, Seq(-1f, -0.1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.knnJoinBucketed(
      df, "vec_id", "embedding", k = 3, dim = 2, h = 2, maxBucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((4L, 5L), (5L, 4L)), s"got: $got")
  }

  test("mipsTopK ranks by inner product — diverges from cosine exactly where norms differ") {
    // probe (1,0): item 1 = (3,4) has ip 3 but cosine 0.6; item 2 =
    // (1,0) has ip 1 but cosine 1.0 — MIPS and cosine must order them
    // oppositely on the same corpus
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(3.0f, 4.0f)),
      (2L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def order(got: org.apache.spark.sql.DataFrame): Seq[Long] =
      got.filter(col("probe_id") === 0L).orderBy(col("rank"))
        .collect().map(_.getLong(1)).toSeq
    val mips = order(Similarity.mipsTopK(df, "vec_id", "embedding", col("vec_id") === 0L, 2))
    val cos = order(Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 0L, 2))
    assert(mips == Seq(1L, 2L), s"MIPS must rank the large-norm item first: $mips")
    assert(cos == Seq(2L, 1L), s"cosine must rank the aligned unit item first: $cos")
    // on an L2-normalized corpus the two retrievals agree (the classic
    // MIPS->cosine reduction)
    val normed = df.withColumn("embedding",
      graft.functions.VectorOps.l2Normalize(col("embedding")))
    val m2 = order(Similarity.mipsTopK(normed, "vec_id", "embedding", col("vec_id") === 0L, 2))
    val c2 = order(Similarity.cosineTopK(normed, "vec_id", "embedding", col("vec_id") === 0L, 2))
    assert(m2 == c2, s"normalized corpus: MIPS $m2 must equal cosine $c2")
  }

  test("signLshTopK achieves reasonable recall vs exact at few hyperplanes") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.signLshTopK(df, "vec_id", "embedding", col("vec_id") < 10,
      5, dim = 16, hyperplanes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low even for 2 hyperplanes")
  }

  test("multi-probe sign-LSH: recall climbs with probes and clears the floor") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(probes: Int): Double = {
      val approx = Similarity.signLshTopK(df, "vec_id", "embedding", col("vec_id") < 10,
        5, dim = 16, hyperplanes = 4, probes = probes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r5 = recall(5)   // base + all single-bit flips
    val r11 = recall(11) // + all two-bit flips (maxSignProbes(4))
    assert(r5 >= r1, s"multi-probe must not lose recall: $r5 < $r1")
    assert(r11 >= r5, s"deeper probing must not lose recall: $r11 < $r5")
    assert(r11 >= 0.5, s"Hamming-2 multi-probe recall $r11 below floor")
  }

  test("multi-probe candidates: distinct per (probe, neighbor), volume grows with probes") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    def cands(probes: Int) = Similarity.signLshCandidates(
      df, "vec_id", "embedding", col("vec_id") < 10, dim = 16, hyperplanes = 4,
      probes = probes)
    // a corpus row has one signature and probed buckets are pairwise
    // distinct, so no (probe, neighbor) pair may surface twice
    val dupes = cands(5).groupBy(col("probe_id"), col("neighbor_id"))
      .count().filter(col("count") > 1).count()
    assert(dupes == 0, s"$dupes duplicate candidate pairs")
    val c1 = cands(1).count()
    val c5 = cands(5).count()
    assert(c5 >= c1, s"probes=5 candidates $c5 < probes=1 candidates $c1")
    val e = intercept[IllegalArgumentException] {
      cands(Similarity.maxSignProbes(4) + 1).count()
    }
    assert(e.getMessage.contains("probes"))
  }

  test("ivfTopK with nprobe == nlist reproduces exact brute force") {
    val df = vecs(150, 8).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted.toSeq
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 5,
      5, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted.toSeq
    assert(ivf == exact)
  }

  test("ivfTopK with partial probes keeps decent recall at a fraction of the cost") {
    val df = vecs(300, 8).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 10,
      5, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall below floor at nprobe=nlist/2")
  }

  test("kmeansRefine keeps nlist centroids and exhaustive IVF stays exact") {
    val df = vecs(150, 8).toDF("vec_id", "embedding")
    val refined = Similarity.kmeansRefine(
      df, Similarity.ivfCentroids(df, "vec_id", "embedding", 8),
      "vec_id", "embedding", iters = 2)
    assert(refined.count() == 8)
    assert(refined.select("centroid_id").distinct().count() == 8)
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted.toSeq
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 5,
      5, nlist = 8, nprobe = 8, refineIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted.toSeq
    assert(ivf == exact)
    // structural pin (r17): refined centroids must come back driver-
    // materialized — the chained-frame form re-ran every prior round's
    // corpus aggregation per collect (O(iters²) corpus passes); a
    // LocalRelation plan proves the rounds ran eagerly, once each
    val plan = refined.queryExecution.optimizedPlan
    assert(plan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"kmeansRefine must return a LocalRelation, got:\n$plan")
  }

  test("ivfAssign: every vector lands in exactly one list") {
    val df = vecs(100, 8).toDF("vec_id", "embedding")
    val centroids = Similarity.ivfCentroids(df, "vec_id", "embedding", 8)
    assert(centroids.count() == 8)
    val assigned = Similarity.ivfAssign(df, centroids, "vec_id", "embedding")
    assert(assigned.count() == 100)
    assert(assigned.select("vec_id").distinct().count() == 100)
  }

  test("vecSum aggregate equals the posexplode formulation; refine plans no Generate") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
      .withColumn("g", (col("vec_id") % 4).cast("int"))
    val native = df.groupBy("g")
      .agg(VectorOps.vecSum(col("embedding")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val exploded = df
      .select(col("g"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(sum(col("v").cast("double")).as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rs) => g -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    native.foreach { case (g, s) =>
      s.zip(exploded(g)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
    // the k-means mean step must not dim-explode. kmeansRefine now
    // executes its rounds eagerly and returns a LocalRelation, so no
    // lazily inspectable plan survives to assert on (the old
    // no-Generate plan pin went vacuous — r17 review) — pin at the
    // source level instead, the CacheLifecycleSpec sweep idiom: the
    // refine body must keep the native vector-sum aggregate and never
    // reintroduce the posexplode formulation this test's numeric half
    // compares against
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Similarity.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val body = src.substring(src.indexOf("def kmeansRefine"), src.indexOf("def ivfAssign"))
    assert(!body.contains("posexplode"),
      "kmeansRefine regressed to a dim-exploding mean formulation")
    assert(body.contains("vecSum"),
      "kmeansRefine must keep the native vector-sum aggregate")
  }

  test("brute-force tiers fail loudly when the probe side is unbounded") {
    val df = vecs(100, 8).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(df, "vec_id", "embedding", lit(true), 5, maxProbes = 10)
        .count()
    }
    assert(e1.getMessage.contains("maxProbes"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.embeddingNearDupExact(
        df, "vec_id", "embedding", lit(true), 0.5, maxProbes = 10).count()
    }
    assert(e2.getMessage.contains("maxProbes"))
    // a bounded probe side passes the guard unchanged
    assert(Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 3, 5)
      .count() == 15)
  }

  test("int8 quantization: codes in range, error <= scale/2, ranking stays close") {
    val staged = vecs(100, 16).toDF("vec_id", "embedding")
      .withColumn("_qs", VectorOps.int8Scale(col("embedding")))
      .withColumn("_q", VectorOps.quantizeInt8(col("embedding"), col("_qs")))
      .withColumn("_dq", VectorOps.dequantizeInt8(col("_q"), col("_qs")))
    staged.select("embedding", "_qs", "_q", "_dq").collect().foreach { r =>
      val v = r.getSeq[Float](0)
      val qs = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val dq = r.getSeq[Double](3)
      assert(q.forall(c => c >= -127 && c <= 127))
      v.zip(dq).foreach { case (x, y) =>
        assert(math.abs(x.toDouble - y) <= qs / 2 + 1e-12, s"$x vs $y at scale $qs")
      }
    }
    // zero vector: scale 0, codes all zero (no division)
    val z = Seq((0L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
      .withColumn("_qs", VectorOps.int8Scale(col("embedding")))
      .select(VectorOps.quantizeInt8(col("embedding"), col("_qs")))
      .collect().head.getSeq[Int](0)
    assert(z == Seq.fill(8)(0))
    // retrieval over dequantized vectors stays close to full precision
    val exact = Similarity.cosineTopK(staged, "vec_id", "embedding", col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.cosineTopK(staged, "vec_id", "_dq", col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall below floor")
  }

  test("bucketStats: sum of bucket sizes equals corpus size") {
    val df = vecs(100, 8).toDF("vec_id", "embedding")
    val stats = Similarity.bucketStats(df, "embedding", 8, 4)
    assert(stats.agg(sum("bucket_size")).as[Long].head() == 100L)
  }

  test("randomProject: bit-exact vs a driver-side plane fold; sign-LSH is its 1-bit form") {
    val data = vecs(30, 16)
    val planes = Similarity.planeComponents(dim = 16, h = 8)
    val got = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.randomProject(col("embedding"), 16, 8).as("p"),
        Similarity.signSignature(col("embedding"), 16, 8).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    val byId = data.toMap
    got.foreach { case (id, proj, sig) =>
      val v = byId(id)
      val want = planes.map { p =>
        var acc = 0.0
        v.zip(p).foreach { case (x, w) => acc += x.toDouble * w }
        acc / math.sqrt(8.0)
      }
      assert(proj == want.toSeq, s"projection mismatch for $id")
      // sign-LSH bit i is exactly sign(projection_i): positive scaling
      // (1/sqrt(outDim)) cannot move a dot across zero
      (0 until 8).foreach { i =>
        assert((((sig >> i) & 1L) == 1L) == (proj(i) >= 0d), s"bit $i of $id")
      }
    }
  }

  test("single-probe sign-LSH takes the fast path: no flip staging in the plan") {
    // parquet-backed (a local Seq would constant-fold the projection away)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val one = Similarity.signLshCandidates(
      embs, "vec_id", "embedding", col("vec_id") < 5, dim = 64, hyperplanes = 4, probes = 1)
    val planOne = one.queryExecution.optimizedPlan.toString
    assert(!planOne.contains("array_sort"),
      "probes=1 must not pay the multi-probe flip staging (round-4 s2 regression)")
    val five = Similarity.signLshCandidates(
      embs, "vec_id", "embedding", col("vec_id") < 5, dim = 64, hyperplanes = 4, probes = 5)
    assert(five.queryExecution.optimizedPlan.toString.contains("array_sort"),
      "multi-probe still stages the margin-ordered flips")
    // and the fast path is a pure plan change: same candidate set as the
    // mask-0-only multi-probe formulation restricted to the base bucket
    val oneSet = one.select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fiveSet = five.select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oneSet.subsetOf(fiveSet))
  }

  /** Driver-side replica of the engine's exact IEEE quantization +
    * asymmetric scoring arithmetic (sequential double accumulation in
    * array order — the determinism contract both the oracle and these
    * expectations rely on). */
  private def adcExpected(
      all: Seq[(Long, Seq[Float])], probeIds: Seq[Long], k: Int): Map[Long, Seq[Long]] = {
    def quantDequant(v: Seq[Float]): Seq[Double] = {
      var m = 0.0
      v.foreach(x => m = math.max(m, math.abs(x.toDouble)))
      val qs = m / 127.0
      if (qs == 0d) v.map(_ => 0.0)
      else v.map { x =>
        val c = math.min(math.max(math.floor(x.toDouble / qs + 0.5), -127.0), 127.0)
        c * qs
      }
    }
    val dq = all.map { case (id, v) => id -> quantDequant(v) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d
      a.zip(b).foreach { case (x, y) => dot += x * y; na += x * x; nb += y * y }
      if (na == 0d || nb == 0d) 0d else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = all.toMap
    probeIds.map { p =>
      val pv = byId(p).map(_.toDouble)
      p -> all.filter(_._1 != p)
        .map { case (id, _) => (id, cos(pv, dq(id))) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
    }.toMap
  }

  test("quantized IVF at nprobe == nlist is exhaustive ADC: matches the IEEE-exact expectation") {
    val data = vecs(100, 16)
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.ivfTopKQuantized(
        df, "vec_id", "embedding", col("vec_id") < 5, k = 5, nlist = 8, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    val want = adcExpected(data, (0L until 5L).toSeq, 5)
    assert(got == want)
  }

  test("quantized IVF composes with k-means refine: exhaustive ADC is centroid-invariant") {
    // refine moves every centroid (and so every list assignment), but
    // with nprobe == nlist the quantized scoring is still exhaustive —
    // the same invariant that oracles s6 for the full-precision tier
    val data = vecs(100, 16)
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.ivfTopKQuantized(
        df, "vec_id", "embedding", col("vec_id") < 5, k = 5, nlist = 8, nprobe = 8,
        refineIters = 2)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    assert(got == adcExpected(data, (0L until 5L).toSeq, 5))
  }

  test("quantized IVF with full-depth re-rank reproduces exact brute force") {
    val df = vecs(100, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val reranked = Similarity.ivfTopKQuantized(
        df, "vec_id", "embedding", col("vec_id") < 5, k = 5, nlist = 8, nprobe = 8,
        rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(reranked == exact,
      "re-ranking every candidate at full precision must equal cosineTopK")
  }

  test("quantized IVF prunes with nprobe < nlist and re-rank only improves recall") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rerank: Int): Double = {
      val got = Similarity.ivfTopKQuantized(
          df, "vec_id", "embedding", col("vec_id") < 5, k = 5, nlist = 16, nprobe = 16,
          rerank = rerank)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    // at full probe depth the only error source is quantized ordering;
    // a 3k-deep exact re-rank must recover at least as much as none
    assert(recallOf(15) >= recallOf(0))
    assert(recallOf(0) >= 0.6, "ADC ordering should stay close to exact")
  }

  test("banded sign-LSH: bands=1 equals the single-table candidate set; volume and recall grow with bands") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val single = Similarity.signLshCandidates(
        df, "vec_id", "embedding", col("vec_id") < 5, dim = 16, hyperplanes = 6, probes = 1)
      .select(col("probe_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def bandedPairs(bands: Int) = Similarity.bandedSignCandidates(
        df, "vec_id", "embedding", col("vec_id") < 5, dim = 16,
        bands = bands, bitsPerBand = 6)
      .select(col("probe_id"), col("neighbor_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = bandedPairs(1)
    assert(b1 == single, "band 0 uses the base seed — bands=1 must degenerate to the single table")
    val b4 = bandedPairs(4)
    assert(b1.subsetOf(b4) && b4.size > b1.size,
      "OR-amplification can only add candidates")

    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(bands: Int): Double = {
      val got = Similarity.bandedSignTopK(
          df, "vec_id", "embedding", col("vec_id") < 5, k = 5, dim = 16,
          bands = bands, bitsPerBand = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    assert(recallOf(4) >= recallOf(1))
    // multi-band collisions dedup: ranks stay contiguous per probe
    val rows = Similarity.bandedSignTopK(
        df, "vec_id", "embedding", col("vec_id") < 5, k = 5, dim = 16,
        bands = 4, bitsPerBand = 6)
      .collect().groupBy(_.getLong(0))
    rows.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
  }

  test("PQ: codes bounded, encode deterministic, reconstruction spans full dim") {
    val df = vecs(120, 16).toDF("vec_id", "embedding")
    val cb = Similarity.pqSampledCodebooks(df, "vec_id", "embedding", dim = 16, m = 4, ksub = 8)
    assert(cb.length == 4 && cb.forall(_.length == 8) && cb.forall(_.forall(_.length == 4)))
    val coded = Similarity.pqEncode(df, "embedding", 16, cb)
      .select(col("vec_id"), col("_codes"),
        Similarity.pqReconstruct(col("_codes"), cb).as("_rv"))
    val rows = coded.collect()
    assert(rows.length == 120)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4 && codes.forall(c => c >= 0 && c < 8))
      assert(r.getSeq[Double](2).length == 16)
    }
    // sampled codebooks are a pure function of the md5 order — re-derived
    // codebooks must encode every row identically
    val cb2 = Similarity.pqSampledCodebooks(df, "vec_id", "embedding", dim = 16, m = 4, ksub = 8)
    val again = Similarity.pqEncode(df, "embedding", 16, cb2)
      .select(col("vec_id"), col("_codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getSeq[Int](1)))
  }

  test("PQ with corpus-deep re-rank reproduces exact brute force") {
    val df = vecs(150, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = Similarity.pqTopK(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, m = 4, ksub = 8, rerank = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pq == exact, "rerank >= |corpus| must be exact — ADC only shapes the shortlist")
  }

  /** Clustered fixture: real embedding corpora are clustered (that is
    * what PQ codewords exploit); uniform-random vectors are PQ's
    * worst case and make refine-vs-sample comparisons meaningless —
    * k-means then minimizes L2 distortion toward the origin, which is
    * orthogonal to cosine ORDER. */
  private def clusteredVecs(n: Int, dim: Int, centers: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val cs = Seq.fill(centers)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    (0 until n).map { i =>
      val c = cs(i % centers)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
  }

  test("PQ ADC recall: floor on uniform data, refinement helps on clustered data") {
    def recallOf(data: Seq[(Long, Seq[Float])], refineIters: Int, rerank: Int): Double = {
      val df = data.toDF("vec_id", "embedding")
      val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.pqTopK(df, "vec_id", "embedding", col("vec_id") < 5,
          k = 5, dim = 16, m = 4, ksub = 8, refineIters = refineIters, rerank = rerank)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val uniform = vecs(200, 16)
    val sampled = recallOf(uniform, 0, 0)
    assert(sampled >= 0.2, s"sampled-codebook ADC recall $sampled below floor (uniform worst case)")
    // a shortlist re-rank must recover at least the ADC-only recall
    assert(recallOf(uniform, 0, 40) >= sampled)
    val clustered = clusteredVecs(200, 16, 12)
    val cSampled = recallOf(clustered, 0, 0)
    val cRefined = recallOf(clustered, 2, 0)
    assert(cRefined >= cSampled,
      s"refined recall $cRefined below sampled $cSampled on clustered data " +
        "— Lloyd codewords should track the cluster structure")
    // ADC-only recall on tight clusters is bounded by within-cluster
    // ambiguity (cluster-mates share a reconstruction); the production
    // shape is ADC shortlist + exact re-rank, which must resolve it
    assert(recallOf(clustered, 2, 40) >= 0.8,
      "ADC shortlist + exact re-rank should resolve within-cluster order")
  }

  test("IVF-PQ: exhaustive probes equal brute-force PQ; pruning keeps recall; re-rank recovers") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val pqExhaustive = Similarity.pqTopK(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivfpqFull = Similarity.ivfTopKPq(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, nlist = 8, nprobe = 8, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivfpqFull == pqExhaustive,
      "nprobe == nlist makes the candidate set total — IVF-PQ must equal brute-force ADC")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(nprobe: Int, rerank: Int): Double = {
      val got = Similarity.ivfTopKPq(df, "vec_id", "embedding", col("vec_id") < 5,
          k = 5, dim = 16, nlist = 8, nprobe = nprobe, m = 4, ksub = 8, rerank = rerank)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    // pruning loses candidates, quantization blurs order; both bounded
    assert(recallOf(4, 0) > 0.0, "half-depth IVF-PQ should find something")
    assert(recallOf(8, 40) >= recallOf(8, 0), "fp32 re-rank can only help at fixed candidates")
  }

  test("residual IVF-PQ: deep re-rank exact; residual coding lifts raw-data recall over raw PQ") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // anchor: rerank >= |corpus| must reproduce exact brute force —
    // residual ADC only shapes the shortlist
    val deep = Similarity.ivfTopKPqResidual(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, nlist = 8, nprobe = 8, m = 4, ksub = 8, rerank = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(deep == exact, "corpus-deep re-rank must be exact")
    val exactIds = exact.map(t => (t._1, t._2))
    def recallOf(got: Set[(Long, Long)]): Double =
      (got & exactIds).size.toDouble / exactIds.size
    // pruned probes still retrieve and re-rank can only help
    val pruned = recallOf(Similarity.ivfTopKPqResidual(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, nlist = 8, nprobe = 4, m = 4, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val prunedRr = recallOf(Similarity.ivfTopKPqResidual(df, "vec_id", "embedding", col("vec_id") < 5,
        k = 5, dim = 16, nlist = 8, nprobe = 4, m = 4, ksub = 8, rerank = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(pruned > 0.0, "half-depth residual IVF-PQ should find something")
    assert(prunedRr >= pruned, "fp32 re-rank can only help at fixed candidates")
  }

  test("residual coding strictly lowers quantization distortion at equal code bytes") {
    // the Jégou §III-C claim on the metric it is actually about —
    // reconstruction distortion (recall@5 over a handful of probes has
    // 0.04-per-pair granularity and cannot carry it). 64-d clustered
    // fixture (16 centers, 85/15 blend, seed 42 — the shape real
    // embedding corpora have); measured: raw ~0.82, residual ~0.90 at
    // nlist = N/16. Deterministic: md5 sampling, fixed seed.
    val rnd = new scala.util.Random(42)
    val cs = Seq.fill(16)(Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = (0 until 400).map { i =>
      val c = cs(i % 16)
      (i.toLong, c.map(x => x * 0.85f + (rnd.nextFloat() * 2 - 1) * 0.15f))
    }.toDF("vec_id", "embedding")
    val rawCb = Similarity.pqSampledCodebooks(df, "vec_id", "embedding", 64, 4, 16)
    val raw = Similarity.pqEncode(df, "embedding", 64, rawCb)
      .select(avg(VectorOps.cosineSim(col("embedding"),
        Similarity.pqReconstruct(col("_codes"), rawCb))))
      .collect()(0).getDouble(0)
    val cents = Similarity.collectCentroids(
      Similarity.ivfCentroidsMd5(df, "vec_id", "embedding", 25))
    val centMap = typedLit(cents.map { case (id, v) => id -> v.map(_.toDouble) }.toMap)
    val assigned = Similarity.ivfAssignCollected(df, cents, "vec_id", "embedding")
      .withColumn("_res", zip_with(col("embedding"), element_at(centMap, col("list_id")),
        (v, c) => v.cast("double") - c))
    val resCb = Similarity.pqSampledCodebooks(assigned, "vec_id", "_res", 64, 4, 16, salt = "pqr")
    val res = Similarity.pqEncode(assigned, "_res", 64, resCb)
      .select(avg(VectorOps.cosineSim(col("embedding"),
        zip_with(element_at(centMap, col("list_id")),
          Similarity.pqReconstruct(col("_codes"), resCb), (c, r) => c + r))))
      .collect()(0).getDouble(0)
    assert(res > raw + 0.02,
      f"residual recon cos $res%.4f should clear raw $raw%.4f by a real margin")
  }

  test("clusteredness diagnostic separates uniform from clustered; auto steers the PQ encoding") {
    // the round-7 verdict's item: the "residual wins on clustered,
    // nothing wins on uniform" scaladoc warnings become a measured
    // branch — meanAssignmentCosine must land in disjoint bands on the
    // two fixture shapes, and ivfTopKPqAuto must reproduce the tier it
    // claims to choose (same md5 centroid set both ways, so the steer
    // changes only the encoding)
    val uniform = vecs(300, 64).toDF("vec_id", "embedding")
    val rnd = new scala.util.Random(42)
    val cs = Seq.fill(16)(Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    val clustered = (0 until 300).map { i =>
      val c = cs(i % 16)
      (i.toLong, c.map(x => x * 0.85f + (rnd.nextFloat() * 2 - 1) * 0.15f))
    }.toDF("vec_id", "embedding")
    val uDiag = Similarity.meanAssignmentCosine(uniform, "vec_id", "embedding", nlist = 16)
    val cDiag = Similarity.meanAssignmentCosine(clustered, "vec_id", "embedding", nlist = 16)
    assert(uDiag < 0.6, f"uniform diagnostic $uDiag%.3f should sit below the 0.6 threshold")
    assert(cDiag >= 0.6, f"clustered diagnostic $cDiag%.3f should clear the 0.6 threshold")
    assert(cDiag > uDiag + 0.2,
      f"bands should be well separated: clustered $cDiag%.3f vs uniform $uDiag%.3f")
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // clustered corpus -> the residual tier, bit-for-bit
    val autoClustered = ids(Similarity.ivfTopKPqAuto(clustered, "vec_id", "embedding",
      col("vec_id") < 5, k = 5, dim = 64, nlist = 16, nprobe = 16))
    val directResidual = ids(Similarity.ivfTopKPqResidual(clustered, "vec_id", "embedding",
      col("vec_id") < 5, k = 5, dim = 64, nlist = 16, nprobe = 16))
    assert(autoClustered == directResidual,
      "auto on a clustered corpus must equal the residual tier exactly")
    // uniform corpus -> raw PQ on the same md5 centroids, bit-for-bit
    val autoUniform = ids(Similarity.ivfTopKPqAuto(uniform, "vec_id", "embedding",
      col("vec_id") < 5, k = 5, dim = 64, nlist = 16, nprobe = 16, rerank = 40))
    val directRaw = ids(Similarity.ivfTopKPq(uniform, "vec_id", "embedding",
      col("vec_id") < 5, k = 5, dim = 64, nlist = 16, nprobe = 16, rerank = 40,
      centroidSaltMd5 = Some("ivfr")))
    assert(autoUniform == directRaw,
      "auto on a uniform corpus must equal the raw-PQ tier (md5 centroids) exactly")
  }

  test("pqRefineCodebooks: shape preserved, refinement reduces mean reconstruction error") {
    val df = vecs(200, 16).toDF("vec_id", "embedding")
    val cb0 = Similarity.pqSampledCodebooks(df, "vec_id", "embedding", dim = 16, m = 4, ksub = 8)
    val cb1 = Similarity.pqRefineCodebooks(df, "embedding", 16, cb0, iters = 2)
    assert(cb1.length == 4 && cb1.forall(_.length == 8) && cb1.forall(_.forall(_.length == 4)))
    def mse(cb: Array[Array[Array[Double]]]): Double = {
      val err = Similarity.pqEncode(df, "embedding", 16, cb)
        .select(VectorOps.cosineSim(col("embedding"),
          Similarity.pqReconstruct(col("_codes"), cb)).as("c"))
        .agg(avg(lit(1.0) - col("c"))).as[Double].collect().head
      err
    }
    // Lloyd steps monotonically reduce within-cell distortion; cosine
    // alignment of reconstructions must not get worse than sampled
    assert(mse(cb1) <= mse(cb0) + 1e-9,
      s"refined reconstruction error ${mse(cb1)} worse than sampled ${mse(cb0)}")
  }
}
