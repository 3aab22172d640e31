package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("attachFakeMedia: binary payload + typed metadata struct") {
    val df = Multimodal.attachFakeMedia(Seq((1L, "hello")).toDF("id", "text"), "text")
    val r = df.select("media", "media_meta.mime", "media_meta.n_bytes").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "hello")
    assert(r.getString(1) == "application/x-graft-fake")
    assert(r.getLong(2) == 5L)
  }

  test("decodeFeatures: fixed-dim features, schema contract, deterministic") {
    val docs = (1 to 600).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
    val media = Multimodal.attachFakeMedia(docs, "text")
    val out = Multimodal.decodeFeatures(media, "media", dim = 4, batchSize = 128)
    assert(out.schema("features").dataType.typeName == "array")
    val rows = out.select("id", "features").collect()
    assert(rows.length == 600)
    assert(rows.forall(_.getSeq[Float](1).length == 4))
    // deterministic: same payload -> same features
    val again = Multimodal.decodeFeatures(media, "media", dim = 4, batchSize = 7)
      .select("id", "features").collect()
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap ==
      again.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap)
  }

  test("FakeDecoder: md5-seeded golden values, exact 24-bit dyadic floats") {
    val f = Multimodal.FakeDecoder.decode("hello world".getBytes("UTF-8"), 4)
    // golden mix values from an independent (python) evaluation of the
    // published recurrence — pins the oracle-reproducible contract
    assert(f.toSeq == Seq(7683609, 10563423, 6719775, 2013280).map(_ / 16777216.0f))
    // every feature must be an exact dyadic rational k/2^24 in [0,1)
    val many = Multimodal.FakeDecoder.decode("café ünïcode".getBytes("UTF-8"), 64)
    assert(many.forall(x => x >= 0f && x < 1f && (x * 16777216.0f) % 1.0f == 0f))
  }

  test("resizeStub rewrites payload + metadata deterministically per (payload, dims)") {
    val df = Multimodal.attachFakeMedia(Seq((1L, "img-a"), (2L, "img-b")).toDF("id", "text"), "text")
    val r1 = Multimodal.resizeStub(df, "media", 224, 224)
    val r2 = Multimodal.resizeStub(df, "media", 224, 224)
    val r3 = Multimodal.resizeStub(df, "media", 64, 64)
    val p1 = r1.select("id", "media").collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val p2 = r2.select("id", "media").collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val p3 = r3.select("id", "media").collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(p1 == p2)           // deterministic
    assert(p1(1L) != p3(1L))   // dims affect output
    assert(r1.select("media_meta.mime").head().getString(0).endsWith("resized"))
    assert(r1.select("resize_dims.w").head().getInt(0) == 224)
  }

  test("resizeImage: hand-computed 4x4->2x2 area averages per RGB channel, PNG round-trip, meta + upscale + loud garbage") {
    // 4x4 PNG with per-channel gradients: pixel (x,y) = RGB(16(y*4+x),
    // 8(y*4+x), y*4+x) — each 2x2 output pixel must be the exact
    // integer mean of its source block, channel by channel
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) {
      val i = y * 4 + x
      img.setRGB(x, y, ((16 * i) << 16) | ((8 * i) << 8) | i)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val out = Multimodal.resizeImage(
      Seq((1L, png)).toDF("id", "media"), "media", 2, 2)
    assert(out.select("media_meta.mime").head().getString(0) == "image/png")
    assert(out.select("resize_dims.w").head().getInt(0) == 2)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.select("media").head().getAs[Array[Byte]](0)))
    assert(resized.getWidth == 2 && resized.getHeight == 2)
    for (cy <- 0 until 2; cx <- 0 until 2) {
      // source block {(2cx+dx, 2cy+dy)}: indices i = (2cy+dy)*4 + 2cx+dx
      val idx = for (dy <- 0 to 1; dx <- 0 to 1) yield (2 * cy + dy) * 4 + 2 * cx + dx
      val (wr, wg, wb) = (16 * idx.sum / 4, 8 * idx.sum / 4, idx.sum / 4)
      val rgb = resized.getRGB(cx, cy)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) == ((wr, wg, wb)),
        s"cell ($cx,$cy): got ${(rgb >> 16) & 0xff},${(rgb >> 8) & 0xff},${rgb & 0xff} want $wr,$wg,$wb")
    }
    // upscale clamps to >= 1 source pixel: 4x4 -> 8x8 replicates
    // nearest pixels (corner (0,0) keeps source (0,0)'s exact color)
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(Seq((1L, png)).toDF("id", "media"), "media", 8, 8)
        .select("media").head().getAs[Array[Byte]](0)))
    assert(up.getWidth == 8 && (up.getRGB(0, 0) & 0xffffff) == (img.getRGB(0, 0) & 0xffffff))
    // undecodable payloads fail loudly, not as silent pseudo-pixels
    val err = intercept[Exception] {
      Multimodal.resizeImage(
        Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "media"), "media", 2, 2)
        .select("media").collect()
    }
    val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("decodable")), msgs.mkString(" | "))
  }

  test("frameSampleStub explodes to nFrames rows per input with distinct payloads") {
    val df = Multimodal.attachFakeMedia(Seq((1L, "vid")).toDF("id", "text"), "text")
    val frames = Multimodal.frameSampleStub(df, "media", 5)
    assert(frames.count() == 5)
    assert(frames.select("frame_idx").as[Int].collect().sorted.toSeq == (0 until 5))
    assert(frames.select("frame_payload").distinct().count() == 5)
  }

  test("decode is a narrow op: partition count preserved") {
    val docs = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("id", "text").repartition(5)
    val out = Multimodal.decodeFeatures(
      Multimodal.attachFakeMedia(docs, "text"), "media", dim = 2)
    assert(out.rdd.getNumPartitions == 5)
  }

  test("sniffMime: real magic bytes detected, truncated/absent magic falls through, lies flagged") {
    def payload(magic: Array[Byte], body: String): Array[Byte] =
      magic ++ body.getBytes("UTF-8")
    val jpeg = Multimodal.magicBytes.toMap.apply("image/jpeg")
    val png = Multimodal.magicBytes.toMap.apply("image/png")
    // RIFF is a CONTAINER signature: the form type at bytes 8-11
    // decides WAV vs AVI (bytes 4-7 are the chunk size — arbitrary)
    def riff(form: String): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4) ++
        form.getBytes("US-ASCII")
    val rows = Seq(
      (1L, payload(jpeg, "pic"), "image/jpeg"),
      (2L, payload(png, "pic"), "image/png"),
      (3L, payload(riff("WAVE"), "aud"), "audio/wav"),
      (4L, payload(Array.empty[Byte], "plain text"), "application/octet-stream"),
      (5L, payload(jpeg.take(2), "truncated magic"), "application/octet-stream"),
      (6L, payload(riff("WAVE"), "lied about"), "image/jpeg"), // declared jpeg, is RIFF
      (7L, payload(riff("AVI "), "vid"), "video/avi"),
      (8L, payload(riff("XFIL"), "other container"), "application/octet-stream"))
      .toDF("id", "media", "declared_mime")
    val got = Multimodal.validateModality(rows, "media", "declared_mime")
      .select("id", "sniffed_mime", "modality_ok")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ("image/jpeg", true))
    assert(got(2L) == ("image/png", true))
    assert(got(3L) == ("audio/wav", true))
    assert(got(4L) == ("application/octet-stream", true))
    assert(got(5L) == ("application/octet-stream", true),
      "a 2-byte JPEG prefix is NOT a JPEG — truncated magic must fall through to octet-stream")
    assert(got(6L) == ("audio/wav", false), "declared jpeg but RIFF/WAVE bytes — must flag")
    assert(got(7L) == ("video/avi", true), "RIFF/AVI must sniff as video, not audio")
    assert(got(8L) == ("application/octet-stream", true),
      "an unknown RIFF form is neither audio nor video")
  }

  test("chunkFingerprints/chunkSharing: aligned blocks collapse, tails hash alone, empty is chunkless") {
    import org.apache.spark.sql.functions._
    val a64 = "A" * 64; val b64 = "B" * 64; val c64 = "C" * 64
    val docs = Seq(
      (1L, a64 + b64 + "xyz"), // 3 chunks: A, B, 3-byte tail
      (2L, a64 + c64),         // 2 chunks: A (shared with 1), C
      (3L, "zz"),              // 1 partial chunk
      (4L, ""))                // empty payload -> zero chunks
      .toDF("id", "txt")
    val media = Multimodal.attachFakeMedia(docs, "txt").select(col("id"), col("media"))
    val got = Multimodal.chunkSharing(media, "id", "media", chunkBytes = 64)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size == 6, s"expected 6 chunk rows, got ${got.keySet}")
    assert(!got.keySet.exists(_._1 == 4L), "empty payload must emit no chunks")
    // the aligned A block is ONE stored chunk across both payloads
    assert(got((1L, 0))._1 == got((2L, 0))._1, "identical aligned blocks must fingerprint equal")
    assert(got((1L, 0))._3 && got((2L, 0))._3, "the shared block is flagged in both payloads")
    assert(got((1L, 0))._2 == 2L)
    // everything else is payload-unique
    for (k <- got.keySet -- Set((1L, 0), (2L, 0)))
      assert(got(k)._2 == 1L && !got(k)._3, s"chunk $k must be unshared")
    // the partial tail hashes its own short hex, not a zero-padded block
    assert(got((1L, 2))._1 != got((3L, 0))._1)
  }

  test("perceptualHash: deterministic, equal payloads collide, bands recompose the hash") {
    val docs = Seq(
      (1L, "identical media payload content"),
      (2L, "identical media payload content"),   // byte-equal twin of 1
      (3L, "a different payload entirely")
    ).toDF("doc_id", "text")
    val hashed = Multimodal.perceptualHash(
      Multimodal.attachFakeMedia(docs, "text"), "media", dim = 64)
    val ph = hashed.select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) == ph(2L), "equal payloads must hash equal")
    assert(ph(1L) != ph(3L), "distinct payloads should differ (64-bit hash)")
    // bands recompose the hash exactly (logical shift, no sign leak)
    val bands = hashed.select(
        (col("doc_id") +: (0 until 4).map(b => Multimodal.phashBand(col("phash"), b))): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    for ((id, bs) <- bands) {
      assert(bs.forall(v => v >= 0 && v <= 0xFFFFL))
      val recomposed = bs.zipWithIndex.map { case (v, b) => v << (16 * b) }
        .reduce(_ | _)
      assert(recomposed == ph(id), s"bands must recompose phash for $id")
    }
    // near-dup pairs: the byte-equal twin at hamming 0, nothing else
    val pairs = Multimodal.phashNearDupPairs(hashed, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)), s"got $pairs")
  }

  test("phash banding pigeonhole: hamming <= bands-1 always collides; 4 spread bits can dodge") {
    import spark.implicits._
    val base = 0x0123456789ABCDEFL
    val hashed = Seq(
      (1L, base),
      // 3 bits flipped, all in DIFFERENT bands (bits 0, 17, 34): one
      // band (48..63) untouched -> MUST collide (pigeonhole over 4 bands)
      (2L, base ^ (1L | (1L << 17) | (1L << 34))),
      // 4 bits flipped, one per band (bits 0, 17, 34, 51): every band
      // touched -> banding may legitimately miss it
      (3L, base ^ (1L | (1L << 17) | (1L << 34) | (1L << 51)))
    ).toDF("doc_id", "phash")
    val cands = Multimodal.phashCandidatePairs(hashed, "doc_id")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)),
      "hamming-3 pair with an untouched band must always be a candidate")
    assert(!cands.contains((1L, 3L)),
      "all-bands-touched pair collides in no band: the documented miss case")
    // exact verify keeps the radius honest: (1,2) at hamming 3, and
    // (2,3) — one bit apart (bit 51 alone) — at hamming 1; (1,3) is
    // the banding miss above
    val nd = Multimodal.phashNearDupPairs(hashed, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(nd == Set((1L, 2L, 3), (2L, 3L, 1)), s"got $nd")
  }

  test("activeSegments: contiguous runs collapse, gaps split, energy sums are exact") {
    import spark.implicits._
    // item 1: active at wins 0,1,2 | 5 | 8,9 -> three segments
    // item 2: nothing active -> no rows
    val flags = Seq(
      (1L, 0, true, 10L), (1L, 1, true, 20L), (1L, 2, true, 30L),
      (1L, 3, false, 1L), (1L, 4, false, 1L),
      (1L, 5, true, 40L),
      (1L, 6, false, 1L), (1L, 7, false, 1L),
      (1L, 8, true, 50L), (1L, 9, true, 60L),
      (2L, 0, false, 5L), (2L, 1, false, 5L))
      .toDF("doc_id", "win_idx", "active", "energy")
    val segs = Multimodal.activeSegments(flags, "doc_id", "win_idx", "active", "energy")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(segs == Set(
      (1L, 1, 0, 2, 3L, 60L),
      (1L, 2, 5, 5, 1L, 40L),
      (1L, 3, 8, 9, 2L, 110L)), s"got $segs")
  }

  test("windowEnergy equals the integer numerator sum of the fake features") {
    import spark.implicits._
    val df = Seq((1L, "hello audio payload"), (2L, "x")).toDF("doc_id", "text")
    val feat = Multimodal.decodeFeatures(
      Multimodal.attachFakeMedia(df, "text").select(col("doc_id"), col("media")),
      "media", dim = 16)
    val got = feat.select(col("doc_id"), Multimodal.windowEnergy(col("features")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.collect().map { r =>
      val payload = r.getString(1).getBytes("UTF-8")
      val ks = Multimodal.FakeDecoder.decode(payload, 16)
        .map(f => (f * 16777216.0f).toLong)
      r.getLong(0) -> ks.sum
    }.toMap
    assert(got == want, s"got $got want $want")
  }

  // ---- real codec path (round-11): JDK ImageIO behind the same contract

  /** 8×8 gray PNG whose pixel (x, y) carries gray value v(y*8+x). */
  private def grayPng(v: Int => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = v(y * 8 + x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("ImageIoDecoder: hand-computed 8x8 PNG lumas and aHash through perceptualHash") {
    // gray 10 on the first 32 pixels, 200 on the last 32: at dim=64
    // each grid cell is exactly one pixel, luma == gray (BT.601 on
    // r=g=b collapses), feature = gray/256
    val png = grayPng(i => if (i < 32) 10 else 200)
    val df = Seq((1L, png)).toDF("id", "media")
    // the real payload sniffs as the mime m4 gates on
    assert(df.select(Multimodal.sniffMime(col("media"))).head().getString(0) == "image/png")
    val feats = Multimodal.decodeFeatures(df, "media", dim = 64,
        decoder = Multimodal.ImageIoDecoder)
      .select("features").head().getSeq[Float](0)
    val want = (0 until 64).map(i => (if (i < 32) 10 else 200) / 256.0f)
    assert(feats == want, s"lumas: $feats")
    // aHash by hand: mean = (32*10 + 32*200)/64/256 = 105/256 — bits
    // 32..63 (the 200-gray pixels) set, bits 0..31 clear
    val hash = Multimodal.perceptualHash(df, "media", dim = 64,
        decoder = Multimodal.ImageIoDecoder)
      .select("phash").head().getLong(0)
    assert(hash == 0xFFFFFFFF00000000L, f"phash: $hash%016x")
  }

  test("ImageIoDecoder feeds the banded phash join: one-pixel edit is a hamming-0 near-dup") {
    // flipping one 10-gray pixel to 0 moves the mean to 6730/64/256 —
    // still strictly between both gray levels, so every threshold bit
    // (and the hash) is unchanged: the classic aHash robustness claim,
    // here through the REAL decode path end to end
    val a = grayPng(i => if (i < 32) 10 else 200)
    val b = grayPng(i => if (i == 0) 0 else if (i < 32) 10 else 200)
    val hashed = Multimodal.perceptualHash(
      Seq((1L, a), (2L, b)).toDF("id", "media"), "media", dim = 64,
      decoder = Multimodal.ImageIoDecoder)
    val pairs = Multimodal.phashNearDupPairs(hashed, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), s"pairs: ${pairs.toSeq}")
  }

  test("ImageIoDecoder: area-average downscale and JPEG decodability") {
    // 8x8 image onto a 2x2 grid: each cell averages a 4x4 quadrant of
    // uniform gray — exact integer means
    val quad = grayPng(i => {
      val (x, y) = (i % 8, i / 8)
      (if (y < 4) (if (x < 4) 40 else 80) else (if (x < 4) 120 else 240))
    })
    val f = Multimodal.ImageIoDecoder.decode(quad, 4)
    assert(f.toSeq == Seq(40, 80, 120, 240).map(_ / 256.0f), s"got ${f.toSeq}")
    // JPEG: lossy (no golden values) but must decode through the same
    // path — 64 features in [0, 1)
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jf = Multimodal.ImageIoDecoder.decode(baos.toByteArray, 64)
    assert(jf.length == 64 && jf.forall(x => x >= 0f && x < 1f))
    // a mid-gray JPEG round-trips near mid-gray (IDCT noise ≤ a few steps)
    assert(jf.forall(x => math.abs(x - 128 / 256.0f) < 8 / 256.0f), s"jpeg lumas: ${jf.toSeq}")
  }

  /** Mono 16-bit PCM WAV from raw samples — 44-byte canonical header. */
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("synthPng/synthWav + imageStats/wavStats: lossless roundtrip of the integer content functions") {
    // synthPng's pixels are (31id+7x+13y, 17id+5x+3y, 11id+2x+19y) % 256
    // and PNG is lossless, so the decoded channel sums equal the
    // closed-form sums — the primitive m10's cross-engine oracle rests on
    val id = 42L
    def chSum(a: Long, bx: Long, cy: Long): Long =
      (for (y <- 0 until 6; x <- 0 until 8)
        yield (a * id + bx * x + cy * y) % 256).sum
    val df = Seq(Tuple1(id)).toDF("doc_id")
      .map(r => (r.getLong(0), Multimodal.synthPng(r.getLong(0), 8, 6)))
      .toDF("doc_id", "img")
    val st = Multimodal.imageStats(df, "img")
      .select("img_w", "img_h", "sum_r", "sum_g", "sum_b").head()
    assert((st.getInt(0), st.getInt(1)) == ((8, 6)))
    assert((st.getLong(2), st.getLong(3), st.getLong(4)) ==
      ((chSum(31, 7, 13), chSum(17, 5, 3), chSum(11, 2, 19))))
    // synthWav: sample i = ((37id + 101i) % 4096) - 2048; wavStats
    // re-parses the emitted bytes
    val wdf = Seq(Tuple1(id)).toDF("doc_id")
      .map(r => (r.getLong(0), Multimodal.synthWav(r.getLong(0), 64, 8000)))
      .toDF("doc_id", "wav")
    val ws = Multimodal.wavStats(wdf, "wav")
      .select("sample_rate", "n_samples", "sum_samples").head()
    val wantSum = (0 until 64).map(i => ((37L * id + 101L * i) % 4096) - 2048).sum
    assert((ws.getInt(0), ws.getLong(1), ws.getLong(2)) == ((8000, 64L, wantSum)))
    // and the m10 chain composes: resample then re-parse halves nothing,
    // quarters the rate and sample count with truncated 4-sample means
    val rs = Multimodal.wavStats(
      Multimodal.resampleAudio(wdf, "wav", 4), "wav")
      .select("sample_rate", "n_samples", "sum_samples").head()
    val wantOut = (0 until 16).map { i =>
      val s = (0 until 4).map(j => ((37L * id + 101L * (4 * i + j)) % 4096) - 2048).sum
      s / 4 // Long division truncates toward zero, matching the resampler
    }.sum
    assert((rs.getInt(0), rs.getLong(1), rs.getLong(2)) == ((2000, 16L, wantOut)))
  }

  test("WavResampler/resampleAudio: hand-computed box-filter bytes, header rewrite, tail drop, loud off-contract") {
    // factor 2 over [100, 300, -5, -6, 7]: means (200, -5) — the -11/2
    // sum truncates toward zero — and the odd tail sample drops
    val in = wavBytes(Array[Short](100, 300, -5, -6, 7))
    val out = Multimodal.WavResampler.resample(in, 2)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(new String(out, 0, 4, "US-ASCII") == "RIFF" &&
      new String(out, 8, 4, "US-ASCII") == "WAVE")
    assert(bb.getInt(24) == 4000, "sample rate must divide by the factor")
    assert(bb.getInt(40) == 4, "data chunk: 2 samples x 2 bytes")
    assert((bb.getShort(44), bb.getShort(46)) == ((200.toShort, (-5).toShort)),
      s"samples: ${bb.getShort(44)}, ${bb.getShort(46)}")
    // the output is itself a valid decoder input (round-trip contract)
    val f = Multimodal.WavDecoder.decode(out, 2)
    assert(f.toSeq == Seq(200 / 32768.0f, 5 / 32768.0f))
    // factor 1 is the identity on samples (header canonicalized)
    val id1 = Multimodal.WavResampler.resample(in, 1)
    assert(java.nio.ByteBuffer.wrap(id1).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getShort(44) == 100)
    // DataFrame plumbing: payload replaced, meta refreshed, factor recorded
    val df = Multimodal.resampleAudio(Seq((1L, in)).toDF("id", "media"), "media", 2)
    assert(df.select("media_meta.mime").head().getString(0) == "audio/wav")
    assert(df.select("resample_factor").head().getInt(0) == 2)
    assert(df.select("media").head().getAs[Array[Byte]](0).toSeq == out.toSeq)
    // off-contract: non-divisible rate and garbage fail loudly
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.WavResampler.resample(in, 3) // 8000 % 3 != 0
    }
    assert(e1.getMessage.contains("divisible"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.WavResampler.resample(Array[Byte](1, 2, 3), 2)
    }
    assert(e2.getMessage.contains("RIFF"), e2.getMessage)
  }

  test("WavDecoder: hand-computed window energies from raw PCM, loud failure off-contract") {
    // 8 samples at |1000| then 8 at |4000|: dim=2 windows of 8 — the
    // mean-|sample|/2^15 features are exact rationals
    val s = (Array.fill(8)(1000) ++ Array.fill(8)(4000))
      .zipWithIndex.map { case (a, i) => (if (i % 2 == 0) a else -a).toShort }
    val f = Multimodal.WavDecoder.decode(wavBytes(s), 2)
    assert(f.toSeq == Seq(1000 / 32768.0f, 4000 / 32768.0f), s"got ${f.toSeq}")
    // the payload sniffs as the mime m4 gates on
    val df = Seq(Tuple1(wavBytes(s))).toDF("media")
    assert(df.select(Multimodal.sniffMime(col("media"))).head().getString(0) == "audio/wav")
    // stereo / non-PCM / truncated payloads fail loudly, never misread
    val stereo = wavBytes(s).clone()
    stereo(22) = 2 // numChannels LE16 low byte
    intercept[Exception](Multimodal.WavDecoder.decode(stereo, 2))
    intercept[Exception](Multimodal.WavDecoder.decode(wavBytes(s).take(30), 2))
  }

  test("WavDecoder feeds activeSegments: silence-split on a real PCM payload end to end") {
    // 8 windows x 100 samples: tone / silence / tone — the audio
    // segmentation path with the REAL decoder instead of the fake twin
    val pattern = Seq(8000, 8000, 0, 0, 0, 0, 8000, 8000)
    val samples = pattern.flatMap(a => Seq.fill(100)(a.toShort)).toArray
    val feats = Multimodal.decodeFeatures(
      Seq((1L, wavBytes(samples))).toDF("doc_id", "media"),
      "media", dim = 8, decoder = Multimodal.WavDecoder)
    val wins = feats.select(col("doc_id"),
        posexplode(col("features")).as(Seq("win_idx", "f")))
      .withColumn("active", col("f") > 0.1f)
      .withColumn("energy", Multimodal.windowEnergy(array(col("f"))))
    val segs = Multimodal.activeSegments(wins, "doc_id", "win_idx", "active", "energy")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(segs == Set((1, 0, 1), (2, 6, 7)), s"got $segs")
  }

  test("AutoDecoder routes PNG to ImageIO and opaque payloads to the fake twin") {
    val png = grayPng(_ => 100)
    val text = "not an image".getBytes("UTF-8")
    assert(Multimodal.AutoDecoder.decode(png, 64).toSeq ==
      Multimodal.ImageIoDecoder.decode(png, 64).toSeq)
    assert(Multimodal.AutoDecoder.decode(text, 64).toSeq ==
      Multimodal.FakeDecoder.decode(text, 64).toSeq)
    val wav = wavBytes(Array.fill(64)(500.toShort))
    assert(Multimodal.AutoDecoder.decode(wav, 4).toSeq ==
      Multimodal.WavDecoder.decode(wav, 4).toSeq)
    // RIFF with an unknown form type is neither audio nor video —
    // falls to the fake twin instead of crashing either real parser
    val riffOther = "RIFF    XXXXLIST".getBytes("US-ASCII")
    assert(Multimodal.AutoDecoder.decode(riffOther, 4).toSeq ==
      Multimodal.FakeDecoder.decode(riffOther, 4).toSeq)
    // a RIFF/AVI payload routes to the REAL demux — and a frameless
    // one fails loudly rather than producing fake features
    intercept[Exception](Multimodal.AutoDecoder.decode(aviBytes(Seq.empty), 4))
    // undecodable bytes through the real path fail loudly, not silently
    val bad = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
    intercept[Exception](Multimodal.ImageIoDecoder.decode(bad, 64))
  }

  /** Minimal MJPEG-in-AVI: RIFF("AVI ") wrapping LIST("movi") of 00dc
    * chunks, one JPEG per frame — the real container layout, word-
    * aligned like a production muxer emits. */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f))
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi))
  }

  /** Gray JPEG of the given size with per-pixel luma v(x, y). */
  private def grayJpeg(size: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until size; x <- 0 until size) {
      val g = v(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("AviDemux + frameSampleAvi: real JPEG frames out of the RIFF walk, loud on corruption") {
    val j1 = grayJpeg(16)((x, _) => if (x < 8) 0 else 255)
    val j2 = grayJpeg(16)((x, _) => if (x < 8) 255 else 0)
    val avi = aviBytes(Seq(j1, j2))
    // the container sniffs as video, not as its WAV sibling
    val sniffed = Seq(Tuple1(avi)).toDF("media")
      .select(Multimodal.sniffMime(col("media"))).head().getString(0)
    assert(sniffed == "video/avi", sniffed)
    val frames = Multimodal.AviDemux.frames(avi)
    assert(frames.size == 2)
    assert(frames(0).toSeq == j1.toSeq && frames(1).toSeq == j2.toSeq,
      "frame payloads must be byte-identical to the muxed JPEGs")
    // the DataFrame shape: one row per frame, stub-compatible columns
    val rows = Multimodal.frameSampleAvi(
      Seq((7L, avi)).toDF("doc_id", "media"), "media")
      .select(col("doc_id"), col("frame_idx"), col("frame_payload"))
      .collect().sortBy(_.getInt(1))
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((7L, 0), (7L, 1)))
    assert(rows(1).getAs[Array[Byte]](2).toSeq == j2.toSeq)
    // a chunk whose declared size overruns the payload fails loudly:
    // layout is RIFF hdr (12) + LIST hdr (8) + "movi" (4) + chunk 1
    // (8 + j1 + pad) + chunk 2 — inflate chunk 2's LE size high byte
    val corrupt = avi.clone()
    val secondHdr = 24 + 8 + j1.length + (j1.length & 1)
    corrupt(secondHdr + 7) = 0x7f
    intercept[Exception](Multimodal.AviDemux.frames(corrupt))
    // WAV payloads are NOT AVIs: the demux refuses the sibling form
    intercept[Exception](
      Multimodal.AviDemux.frames(wavBytes(Array.fill(8)(100.toShort))))
  }

  test("real MJPEG AVI through the scene-cut tail: repeated frame holds, inverted frame cuts") {
    import org.apache.spark.sql.expressions.Window
    val a = grayJpeg(16)((x, _) => if (x < 8) 20 else 235)
    val b = grayJpeg(16)((x, _) => if (x < 8) 235 else 20) // a's inverse
    // frames A, A, B: hamming(A,A) = 0 (identical bytes → identical
    // decode), hamming(A,B) ≈ 64 (every aHash bit flips — JPEG ringing
    // cannot move a 20-vs-235 cell across the ~127 mean)
    val avi = aviBytes(Seq(a, a, b))
    val hashed = Multimodal.perceptualHash(
      Multimodal.frameSampleAvi(Seq((1L, avi)).toDF("doc_id", "media"), "media")
        .select(col("doc_id"), col("frame_idx"), col("frame_payload")),
      "frame_payload", decoder = Multimodal.ImageIoDecoder)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val ham = bit_count(col("phash").bitwiseXOR(col("_prev"))).cast("int")
    val got = hashed.withColumn("_prev", lag(col("phash"), 1).over(w))
      .select(col("frame_idx"),
        when(col("_prev").isNotNull, ham).as("hamming"),
        when(col("_prev").isNotNull, ham > 32).as("scene_cut"))
      .collect().sortBy(_.getInt(0))
    assert(got(0).isNullAt(1) && got(0).isNullAt(2),
      "frame 0 has no predecessor")
    assert(got(1).getInt(1) == 0 && !got(1).getBoolean(2),
      s"repeated frame must not cut: hamming ${got(1).getInt(1)}")
    assert(got(2).getInt(1) > 32 && got(2).getBoolean(2),
      s"inverted frame must cut: hamming ${got(2).getInt(1)}")
    // the thumbnail contract: AutoDecoder on the AVI = first frame's decode
    assert(Multimodal.AutoDecoder.decode(avi, 64).toSeq ==
      Multimodal.ImageIoDecoder.decode(a, 64).toSeq)
  }
}
