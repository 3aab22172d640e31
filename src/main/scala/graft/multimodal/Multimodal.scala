package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and batch-shaped
  * feature extraction over partitions.
  *
  * Decode is pluggable behind [[MediaDecoder]]: [[ImageIoDecoder]] is a
  * REAL PNG/JPEG path (JDK ImageIO — spec'd against a hand-computed
  * 8×8 PNG aHash), [[AutoDecoder]] routes per payload on magic bytes,
  * and [[FakeDecoder]] is the deterministic stand-in the DuckDB-oracled
  * m-queries keep (cross-engine replayable; WAV/video decode would need
  * native codecs this environment lacks). Everything Spark-side is real
  * and tested: the schema contract,
  * the per-partition batch shape (decode amortized over `batchSize`-row
  * chunks — the `mapInPandas` batching idiom, expressed natively in
  * Scala), and the partitioning behavior (decode is a narrow map — rows
  * never shuffle to be decoded).
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE per read/write call
    * (FileCache{Input,Output}Stream under java.io.tmpdir) — 4 file
    * creations per m10 row, and the dominant cost of the real-codec
    * pass at bench scale. Every payload here is an in-memory byte
    * array, so the memory-cached streams are strictly better; the flag
    * is JVM-global and flipping it is deliberate, documented library
    * behavior (decoded bytes are identical either way — the cache only
    * backs the stream, never the pixels). Each executor JVM flips it
    * once, on first use of any codec entry point.
    *
    * ESCAPE HATCH (r14 ADVICE): an embedding application whose OTHER
    * ImageIO consumers depend on disk-backed streams (e.g. decoding
    * images too large to double-buffer on heap) can opt out with
    * `-Dgraft.imageio.memcache=false` — graft's codec paths then run
    * against whatever cache mode the host application configured, at
    * the documented ~4× cost for in-memory payloads (m10 6.7 s vs
    * 1.5 s at sf0.1). Checked once per JVM, at first codec use. */
  private[multimodal] lazy val imageIoMemoryStreams: Unit =
    if (java.lang.Boolean.parseBoolean(
      System.getProperty("graft.imageio.memcache", "true")))
      javax.imageio.ImageIO.setUseCache(false)

  val mediaMetaType: StructType = new StructType()
    .add("mime", StringType)
    .add("n_bytes", LongType)
    .add("checksum", LongType)

  /** Attach a fake media payload derived from a text column (stand-in for
    * real image bytes) plus its typed metadata struct. */
  def attachFakeMedia(df: DataFrame, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.withColumn("media", payload)
      .withColumn("media_meta", struct(
        lit("application/x-graft-fake").as("mime"),
        octet_length(payload).cast("long").as("n_bytes"),
        xxhash64(payload).as("checksum")))
  }

  /** The decode contract: payload bytes → fixed-dim float features.
    * [[FakeDecoder]] is the deterministic oracle-replayable twin;
    * [[ImageIoDecoder]] is the real PNG/JPEG path (pure-JVM ImageIO —
    * no native codec needed); [[AutoDecoder]] routes per payload on
    * the same magic bytes [[sniffMime]] reads. Instances must be
    * serializable — they ship inside the mapPartitions closure. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * A real deployment swaps in [[ImageIoDecoder]]/[[AutoDecoder]];
    * the signature (bytes → fixed-dim float features) is the contract.
    *
    * The recurrence is chosen to be independently reproducible by a SQL
    * oracle (the driver's DuckDB gate): seed = first 8 bytes of
    * md5(payload) as an unsigned 64-bit value (md5 is standard on both
    * engines), mixed per dimension with an xorshift-multiply round, and
    * the feature is the top 24 bits over 2^24 — an exact dyadic rational
    * that float32 represents with zero rounding on any platform, so
    * value comparison is bit-exact. */
  object FakeDecoder extends MediaDecoder {
    private val C1 = 0x9E3779B97F4A7C15L
    private val C2 = 0xBF58476D1CE4E5B9L

    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      Array.tabulate(dim) { i =>
        var z = h + i.toLong * C1
        z ^= (z >>> 29)
        z *= C2
        z ^= (z >>> 32)
        (z >>> 40).toFloat / 16777216.0f
      }
    }
  }

  /** REAL image decode over javax.imageio (pure JVM — PNG and JPEG
    * readers ship with the JDK, no native codec): decode → luma
    * (integer ITU-R BT.601: (299·R + 587·G + 114·B)/1000, exact for
    * gray pixels where it collapses to the gray value) → integer
    * area-average downscale onto a √dim × √dim grid → feature =
    * mean-luma / 256 ∈ [0, 1). Exactly the aHash front-end
    * [[perceptualHash]] documents: with this decoder its features ARE
    * the downscaled luma grid.
    *
    * Determinism: PNG decode is lossless and bit-stable; the grid sum
    * is integer arithmetic with one terminal division — a spec
    * hand-computes an 8×8 PNG through it. (JPEG IDCT is bit-stable
    * within one JVM but not a cross-engine contract — which is why
    * the DuckDB-oracled m-queries keep [[FakeDecoder]].)
    *
    * Cell geometry uses the standard proportional split
    * (⌊c·extent/g⌋ boundaries), so any image size downscales; an
    * undecodable payload fails LOUDLY (quarantine upstream with
    * [[validateModality]] — feeding corrupt bytes to a codec should
    * never silently produce features). */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val g = math.sqrt(dim.toDouble).toInt
      require(g * g == dim, s"ImageIoDecoder needs a square dim, got $dim")
      imageIoMemoryStreams
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "ImageIoDecoder: payload is not a decodable image — gate with validateModality")
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= g && h >= g,
        s"image ${w}x$h smaller than the ${g}x$g feature grid")
      val out = new Array[Float](dim)
      var cy = 0
      while (cy < g) {
        val y0 = cy * h / g; val y1 = (cy + 1) * h / g
        var cx = 0
        while (cx < g) {
          val x0 = cx * w / g; val x1 = (cx + 1) * w / g
          var lumaSum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              lumaSum += (299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
              x += 1
            }
            y += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0).toLong
          out(cy * g + cx) = (lumaSum.toDouble / n / 256.0).toFloat
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** REAL audio decode — RIFF/WAVE PCM parsed directly from the bytes
    * (the container is a length-prefixed chunk list; 16-bit PCM needs
    * no codec at all, which is why voice pipelines standardize on it
    * before transcription): locate the `fmt ` and `data` chunks,
    * require mono 16-bit PCM (anything else fails LOUDLY — a
    * compressed or multichannel payload should be transcoded
    * upstream, not silently misread), then feature i = mean |sample|
    * over the i-th of `dim` proportional windows, normalized by 2^15
    * into [0, 1) — exactly the per-window energy profile
    * [[activeSegments]] cuts on. Integer sums, one terminal division:
    * deterministic on any platform, hand-computable in a spec. */
  object WavDecoder extends MediaDecoder {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Int =
      le16(b, off) | (le16(b, off + 2) << 16)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      require(payload.length >= 12 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "WavDecoder: not a RIFF/WAVE payload")
      var pos = 12
      var pcmOk = false
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= payload.length) {
        val id = tag(payload, pos)
        val sz = le32(payload, pos + 4)
        // long arithmetic: a crafted near-Int.MaxValue size must fail
        // HERE, not wrap negative and crash downstream (r12 ADVICE)
        require(sz >= 0 && pos.toLong + 8L + sz <= payload.length.toLong,
          s"WavDecoder: chunk $id overruns the payload")
        if (id == "fmt ") {
          val audioFormat = le16(payload, pos + 8)
          val channels = le16(payload, pos + 10)
          val bits = le16(payload, pos + 22)
          require(audioFormat == 1 && bits == 16 && channels == 1,
            s"WavDecoder: need mono 16-bit PCM, got format=$audioFormat " +
              s"channels=$channels bits=$bits — transcode upstream")
          pcmOk = true
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(pcmOk && dataOff >= 0, "WavDecoder: missing fmt/data chunk")
      val n = dataLen / 2
      require(n >= dim, s"WavDecoder: $n samples < $dim windows")
      val out = new Array[Float](dim)
      var w = 0
      while (w < dim) {
        val s0 = (w.toLong * n / dim).toInt
        val s1 = ((w + 1).toLong * n / dim).toInt
        var absSum = 0L
        var i = s0
        while (i < s1) {
          val s = le16(payload, dataOff + 2 * i).toShort.toInt
          absSum += math.abs(s.toLong)
          i += 1
        }
        out(w) = (absSum.toDouble / (s1 - s0) / 32768.0).toFloat
        w += 1
      }
      out
    }
  }

  /** REAL audio resample — integer-factor downsample of RIFF/WAVE mono
    * 16-bit PCM, parsed and re-emitted directly from the bytes (the
    * voice-pipeline standardization step before transcription — models
    * want one sample rate): output sample i is the MEAN of input
    * samples [i·f, (i+1)·f) (a box filter — the same integer
    * area-average discipline as [[ImageResizer]]; sums are exact, one
    * truncating division per output sample, so a spec hand-computes
    * the bytes), the trailing n mod f samples are dropped, and the
    * payload is re-emitted as a canonical 44-byte-header WAV with the
    * sample rate divided by f. Off-contract payloads (stereo,
    * compressed, truncated) fail LOUDLY via the same chunk-walk rules
    * as [[WavDecoder]]. */
  object WavResampler extends Serializable {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Int =
      le16(b, off) | (le16(b, off + 2) << 16)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def resample(payload: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, s"WavResampler: factor must be >= 1, got $factor")
      require(payload.length >= 12 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "WavResampler: not a RIFF/WAVE payload")
      var pos = 12
      var pcmOk = false
      var sampleRate = 0
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= payload.length) {
        val id = tag(payload, pos)
        val sz = le32(payload, pos + 4)
        require(sz >= 0 && pos.toLong + 8L + sz <= payload.length.toLong,
          s"WavResampler: chunk $id overruns the payload")
        if (id == "fmt ") {
          val audioFormat = le16(payload, pos + 8)
          val channels = le16(payload, pos + 10)
          val bits = le16(payload, pos + 22)
          require(audioFormat == 1 && bits == 16 && channels == 1,
            s"WavResampler: need mono 16-bit PCM, got format=$audioFormat " +
              s"channels=$channels bits=$bits — transcode upstream")
          sampleRate = le32(payload, pos + 12)
          pcmOk = true
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = sz
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(pcmOk && dataOff >= 0, "WavResampler: missing fmt/data chunk")
      require(sampleRate % factor == 0,
        s"WavResampler: sample rate $sampleRate not divisible by $factor")
      val n = dataLen / 2
      val outN = n / factor
      val outRate = sampleRate / factor
      val outLen = outN * 2
      val bb = java.nio.ByteBuffer.allocate(44 + outLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + outLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(outRate).putInt(outRate * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(outLen)
      var i = 0
      while (i < outN) {
        var s = 0L
        var j = 0
        while (j < factor) {
          s += le16(payload, dataOff + 2 * (i * factor + j)).toShort
          j += 1
        }
        bb.putShort((s / factor).toShort) // exact sum, one truncating division
        i += 1
      }
      bb.array()
    }
  }

  /** [[resizeImage]]'s audio sibling: replace the media column with the
    * [[WavResampler]] integer-decimated payload, refresh `media_meta`,
    * record `resample_factor`. One narrow mapPartitions pass. */
  def resampleAudio(df: DataFrame, mediaCol: String, factor: Int): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val resampled = df.mapPartitions { rows =>
      rows.map { r =>
        val p = WavResampler.resample(r.getAs[Array[Byte]](mediaIdx), factor)
        Row.fromSeq(r.toSeq.updated(mediaIdx, p))
      }
    }(Encoders.row(df.schema))
    resampled
      .withColumn("media_meta", struct(
        lit("audio/wav").as("mime"),
        octet_length(col(mediaCol)).cast("long").as("n_bytes"),
        xxhash64(col(mediaCol)).as("checksum")))
      .withColumn("resample_factor", lit(factor))
  }

  /** REAL video demux — MJPEG-in-AVI parsed directly from the bytes,
    * reusing the same length-prefixed RIFF chunk discipline as
    * [[WavDecoder]] (AVI and WAV are the SAME container; only the
    * form type and payload chunks differ — the r11 verdict's point
    * that the audio parser already was most of a video one). The
    * walker recurses into `LIST` chunks (hdrl/movi/rec nests) and
    * collects every `NNdc`/`NNdb` stream chunk — in MJPEG each is a
    * complete JPEG image [[ImageIoDecoder]] decodes as-is. Malformed
    * chunks fail LOUDLY ([[WavDecoder]]'s rule: corrupt bytes never
    * silently produce frames). No codec: the container walk is pure
    * byte arithmetic and the per-frame decode is the JDK's JPEG
    * reader. */
  object AviDemux extends Serializable {
    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], off: Int): Int =
      le16(b, off) | (le16(b, off + 2) << 16)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")
    private def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))

    /** All video-stream frame payloads of an AVI, in stream order. */
    def frames(payload: Array[Byte]): Seq[Array[Byte]] = {
      require(payload.length >= 12 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "AVI ", "AviDemux: not a RIFF/AVI payload")
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = tag(payload, pos)
          val sz = le32(payload, pos + 4)
          // bound check in LONG arithmetic: a crafted size near
          // Int.MaxValue would wrap `pos + 8 + sz` negative, pass an
          // int-typed require, and surface as a confusing
          // copyOfRange/negative-index crash instead of this message
          require(sz >= 0 && pos.toLong + 8L + sz <= end.toLong,
            s"AviDemux: chunk $id overruns the payload")
          if (id == "LIST") walk(pos + 12, pos + 8 + sz) // skip the list type
          else if (isFrameId(id) && sz > 0)
            out += java.util.Arrays.copyOfRange(payload, pos + 8, pos + 8 + sz)
          pos += 8 + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      out.toSeq
    }
  }

  /** REAL frame sampling for AVI payloads — [[frameSampleStub]]'s
    * contract (one row per frame: `frame_idx`, `frame_payload`) with
    * [[AviDemux]] doing the demux instead of a hash recurrence. A
    * narrow flatMap: rows never shuffle to be demuxed, and the
    * per-frame JPEG bytes flow straight into [[decodeFeatures]] /
    * [[perceptualHash]] with [[ImageIoDecoder]] (or [[AutoDecoder]],
    * which routes on the frames' own JPEG magic). Row multiplication
    * is the payload's real frame count. The DuckDB-oracled m-queries
    * keep the stub twin — a JPEG IDCT is not a cross-engine replay
    * contract; the spec suite drives this path on a real 2-frame
    * MJPEG AVI end-to-end through the scene-cut tail. */
  def frameSampleAvi(df: DataFrame, mediaCol: String): DataFrame = {
    val outSchema = df.schema
      .add("frame_idx", IntegerType, nullable = false)
      .add("frame_payload", BinaryType)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        AviDemux.frames(payload).iterator.zipWithIndex.map {
          case (frame, i) => Row.fromSeq(r.toSeq :+ i :+ frame)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Per-payload routing on the magic bytes [[sniffMime]] reads:
    * PNG/JPEG payloads take the real [[ImageIoDecoder]], RIFF/WAVE
    * payloads the real [[WavDecoder]], RIFF/AVI payloads decode
    * their FIRST frame through [[AviDemux]] + [[ImageIoDecoder]]
    * (the thumbnail-features contract — per-frame work goes through
    * [[frameSampleAvi]]); everything else falls back to the
    * deterministic [[FakeDecoder]] twin. The mixed-corpus entry
    * point — one `decodeFeatures` pass over a table whose media
    * column holds real images, real audio, real video, and opaque
    * payloads. */
  object AutoDecoder extends MediaDecoder {
    private def hasPrefix(payload: Array[Byte], magic: Array[Byte]): Boolean =
      payload.length >= magic.length && {
        var i = 0
        while (i < magic.length && payload(i) == magic(i)) i += 1
        i == magic.length
      }
    private def riffType(payload: Array[Byte]): String =
      if (payload.length >= 12 && hasPrefix(payload, "RIFF".getBytes("US-ASCII")))
        new String(payload, 8, 4, "US-ASCII")
      else ""
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val isImage = magicBytes.exists { case (mime, magic) =>
        mime.startsWith("image/") && hasPrefix(payload, magic)
      }
      if (isImage) ImageIoDecoder.decode(payload, dim)
      else riffType(payload) match {
        case "WAVE" => WavDecoder.decode(payload, dim)
        case "AVI " =>
          val fs = AviDemux.frames(payload)
          require(fs.nonEmpty, "AutoDecoder: AVI payload has no frames")
          ImageIoDecoder.decode(fs.head, dim)
        case _ => FakeDecoder.decode(payload, dim)
      }
    }
  }

  /** Per-partition, batch-shaped feature extraction: rows are processed
    * in `batchSize` chunks so a real decoder could amortize model/codec
    * setup per chunk (the Pandas-UDF batch idiom). Narrow operation —
    * preserves partitioning, no shuffle. Output schema = input +
    * `features array<float>`.
    *
    * DELIBERATE BOUNDARY: `mapPartitions` forfeits whole-stage codegen
    * and the columnar batch format on this one stage. That is the right
    * trade here — the per-chunk codec/session amortization IS the
    * operator's contract, and a Catalyst Expression evaluates row-at-a-
    * time with no place to hold per-chunk state. Do not "optimize" this
    * into an expression: it would break the real-codec integration point
    * for a stage whose cost is decode CPU, not expression overhead. */
  def decodeFeatures(
      df: DataFrame, mediaCol: String, dim: Int, batchSize: Int = 256,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType, containsNull = false))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        // a session-holding decoder amortizes its codec init per chunk
        chunk.iterator.map { r =>
          val payload = r.getAs[Array[Byte]](mediaIdx)
          val feats = decoder.decode(payload, dim)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize — decode (JDK ImageIO, PNG/JPEG), integer
    * area-average scale onto the (w, h) target grid per RGB channel,
    * PNG re-encode. The grid discipline is [[ImageIoDecoder]]'s
    * proportional split (⌊c·extent/g⌋ boundaries) applied per channel
    * instead of to the luma: downscale cells average their source
    * block with integer sums and one terminal division (deterministic
    * — a spec hand-computes a 4×4→2×2 golden image through it);
    * upscale cells clamp to ≥ 1 source pixel (nearest-neighbor
    * replication — the degenerate case of area averaging). PNG
    * re-encode is lossless, so the emitted payload's pixels ARE the
    * computed averages on any JVM. Undecodable payloads fail LOUDLY
    * (gate with [[validateModality]]). */
  object ImageResizer extends Serializable {
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"ImageResizer: target ${w}x$h must be positive")
      imageIoMemoryStreams
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "ImageResizer: payload is not a decodable image — gate with validateModality")
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // grid boundaries in Long: cx·sw (and cy·sh) overflow Int once
      // source×target dimension products pass 2^31 (~50k × 50k) and
      // would produce garbage block bounds (r13 ADVICE)
      var cy = 0
      while (cy < h) {
        val y0 = (cy.toLong * sh / h).toInt
        val y1 = math.max(y0 + 1, ((cy + 1).toLong * sh / h).toInt)
        var cx = 0
        while (cx < w) {
          val x0 = (cx.toLong * sw / w).toInt
          val x1 = math.max(x0 + 1, ((cx + 1).toLong * sw / w).toInt)
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0).toLong
          out.setRGB(cx, cy,
            (((rs / n).toInt & 0xff) << 16) | (((gs / n).toInt & 0xff) << 8) |
              ((bs / n).toInt & 0xff))
          cx += 1
        }
        cy += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** [[resizeStub]]'s contract with REAL pixels: replace the media
    * column with the [[ImageResizer]] area-average rescale of each
    * payload (PNG re-encoded), refresh `media_meta`, and record
    * `resize_dims`. One narrow mapPartitions pass — rows never shuffle
    * to be resized, the standard thumbnail/normalize stage of an image
    * training pipeline. The stub twin stays for the m3 oracle (a PNG
    * encoder's byte stream is not a cross-engine replay contract;
    * these pixels ARE spec'd against hand-computed goldens). */
  def resizeImage(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val resized = df.mapPartitions { rows =>
      rows.map { r =>
        val p = ImageResizer.resize(r.getAs[Array[Byte]](mediaIdx), w, h)
        Row.fromSeq(r.toSeq.updated(mediaIdx, p))
      }
    }(Encoders.row(df.schema))
    resized
      .withColumn("media_meta", struct(
        lit("image/png").as("mime"),
        octet_length(col(mediaCol)).cast("long").as("n_bytes"),
        xxhash64(col(mediaCol)).as("checksum")))
      .withColumn("resize_dims", struct(lit(w).as("w"), lit(h).as("h")))
  }

  /** STUB resize twin — kept ONLY as the m3 oracle's deterministic
    * replay contract (the real path is [[resizeImage]]): re-hashes the
    * payload with the target dims so a SQL engine can reproduce the
    * (payload, w, h) → payload' mapping exactly. Narrow op, no shuffle. */
  def resizeStub(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val payload = col(mediaCol)
    val resized = sha2(concat(payload, lit(s"${w}x$h").cast("binary")), 256).cast("binary")
    df.withColumn(mediaCol, resized)
      .withColumn("media_meta", struct(
        lit("application/x-graft-fake-resized").as("mime"),
        octet_length(resized).cast("long").as("n_bytes"),
        xxhash64(resized).as("checksum")))
      .withColumn("resize_dims", struct(lit(w).as("w"), lit(h).as("h")))
  }

  /** STUB frame sampling for video-like payloads: emits `nFrames` rows
    * per input row (explode — the one genuinely row-multiplying media
    * op), each tagged with frame_idx and a deterministic per-frame
    * pseudo-payload. A real implementation seeks+decodes keyframes. */
  def frameSampleStub(df: DataFrame, mediaCol: String, nFrames: Int): DataFrame = {
    val frames = sequence(lit(0), lit(nFrames - 1))
    df.withColumn("frame_idx", explode(frames))
      .withColumn("frame_payload",
        sha2(concat(col(mediaCol), col("frame_idx").cast("string").cast("binary")), 256)
          .cast("binary"))
  }

  /** Perceptual average-hash (aHash) over the decoded feature grid —
    * the image-near-dup primitive (the classic 8×8-luma mean-threshold
    * hash; pHash's DCT refinement swaps the grid, not the plumbing):
    * bit i of `phash` = feature(i) ≥ mean(features). Adds `phash`
    * (64-bit long). With the real codec the features are the
    * downscaled luma grid; under [[FakeDecoder]] every feature is an
    * exact 24-bit dyadic rational, so the sum of `dim` of them is
    * EXACT in double (numerators total < 2^53) and the threshold
    * compare `f_i ≥ mean` equals the integer predicate
    * `k_i·dim ≥ Σk` on any engine: no summation-order hazard, the
    * oracle replays the hash bit-for-bit.
    *
    * FUSED into the decode's own mapPartitions pass (round 12): the
    * original formulation staged `features` and packed bits through
    * interpreted higher-order lambdas — measured 160 µs/frame, 6.4 s
    * of m8's 11 s at sf0.1 for arithmetic worth microseconds. The
    * plain-loop mean/threshold/pack here is IEEE-identical (same
    * array-order double sum, same `≥` compare, same shift-or fold),
    * so every oracle value is unchanged — only the interpreted
    * expression stage is gone. Narrow map, no shuffle, one decode
    * per row. */
  def perceptualHash(
      df: DataFrame, mediaCol: String, dim: Int = 64,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    require(dim >= 1 && dim <= 64, s"phash needs 1..64 bits, got $dim")
    val outSchema = df.schema.add("phash", LongType, nullable = false)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = decoder.decode(r.getAs[Array[Byte]](mediaIdx), dim)
        var s = 0.0
        var i = 0
        while (i < dim) { s += feats(i).toDouble; i += 1 }
        val mean = s / dim
        var h = 0L
        i = 0
        while (i < dim) {
          if (feats(i).toDouble >= mean) h |= 1L << i
          i += 1
        }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(Encoders.row(outSchema))
  }

  /** 16-bit band `b` of a phash — logical shift + mask, so band 3 is
    * sign-extension-free. Shared by the candidate join and the oracle
    * (which derives the same value as (u div 2^16b) mod 2^16 from the
    * unsigned form). */
  def phashBand(hash: Column, b: Int): Column =
    call_function("shiftrightunsigned", hash, lit(16 * b)).bitwiseAND(lit(0xFFFFL))

  /** Banded candidate pairs over perceptual hashes: both sides explode
    * to (band, value) and equi-join — compared-pair volume is per-band
    * bucket co-occupancy, never n² (the [[graft.operators.Dedup]]
    * banding shape on the media axis). PIGEONHOLE GUARANTEE: hashes
    * within Hamming distance ≤ bands−1 differ in fewer bits than there
    * are bands, so at least one band is untouched and the pair ALWAYS
    * collides — recall 1.0 up to that radius, by construction (the
    * spec pins it). Beyond it, collision requires the differing bits
    * to dodge some band. */
  /** Internal variant carrying both hashes for the verify stage.
    * PRECONDITION (both variants): ids are unique — the distinct() on
    * (id_a, id_b, _ha, _hb) collapses multi-band collisions of the
    * SAME pair; a duplicated id with two different hashes would emit
    * ambiguous pairs under one name. */
  private def phashCandidatePairsWithHashes(
      hashed: DataFrame,
      idCol: String,
      hashCol: String,
      bands: Int): DataFrame = {
    require(bands >= 1 && bands <= 4, s"16-bit bands over 64 bits: 1..4, got $bands")
    def sideBands(side: DataFrame, id: String, h: String) = side
      .select(col(idCol).as(id), col(hashCol).as(h),
        posexplode(array((0 until bands).map(b => phashBand(col(hashCol), b)): _*))
          .as(Seq("_band", "_bv")))
    sideBands(hashed, "id_a", "_ha")
      .join(sideBands(hashed, "id_b", "_hb"), Seq("_band", "_bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_ha"), col("_hb"))
      .distinct()
  }

  /** Candidate pairs only — (id_a, id_b), the promised public shape
    * (round-9 advice: the internal _ha/_hb columns stay internal).
    * Ids must be unique (see [[phashCandidatePairsWithHashes]]). */
  def phashCandidatePairs(
      hashed: DataFrame,
      idCol: String,
      hashCol: String = "phash",
      bands: Int = 4): DataFrame =
    phashCandidatePairsWithHashes(hashed, idCol, hashCol, bands)
      .select(col("id_a"), col("id_b"))

  /** Perceptual near-dup pairs: banded candidates verified by exact
    * Hamming distance ≤ `maxHamming` (bit_count of xor — codegen'd).
    * Output (id_a, id_b, hamming), exact within the pigeonhole radius.
    * Ids must be unique (see [[phashCandidatePairsWithHashes]]). */
  def phashNearDupPairs(
      hashed: DataFrame,
      idCol: String,
      maxHamming: Int = 3,
      hashCol: String = "phash",
      bands: Int = 4): DataFrame =
    phashCandidatePairsWithHashes(hashed, idCol, hashCol, bands)
      .withColumn("hamming",
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** Content-addressable chunk fingerprints — the rsync/restic/CAS
    * primitive over opaque binary payloads: the payload splits into
    * fixed `chunkBytes`-byte chunks and each chunk gets a fingerprint,
    * so identical blocks across payloads (shared headers, watermarks,
    * repeated intros in video) collapse to one stored chunk. This is
    * the storage tier media pipelines put UNDER the decode tier:
    * dedup before decode, at block grain, with no codec involved.
    *
    * Engine-portable by construction: the chunk is sliced from the
    * payload's `hex()` form (2 chars/byte — binary slicing semantics
    * differ across engines, hex agrees everywhere) and fingerprinted
    * as md5 of that hex string — the same discipline as
    * [[sniffMime]]'s hex prefix probe and t5's md5 fingerprint.
    *
    * Shape: one narrow pass — hex is computed once per row BEFORE the
    * chunk-index explode (the staged-subtree discipline from
    * TextAnalysis: the Generate carries the hex attribute, never
    * recomputes it per chunk), then a per-chunk substring + md5. Rows
    * out = ceil(n_bytes/chunkBytes) per payload; empty payloads emit
    * zero chunks.
    *
    * Size bound: the hex form materializes 2× the payload per row AND
    * is capped by the JVM string limit, so a single payload is bounded
    * at ~1 GB — fine for media blobs, not for unbounded streams. The
    * substring offset is computed in LONG and cast back to int under
    * ANSI, so an offset past 2^31 (chunk_idx ≳ 16.7M at the default
    * 64-byte chunks) fails LOUDLY instead of silently wrapping to a
    * wrong chunk. Payloads past that bound belong on a byte-range
    * pre-split (one row per ~256 MB range) before this operator.
    *
    * Output grain: one row per (id, chunk_idx) with `chunk_fp`. */
  def chunkFingerprints(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      chunkBytes: Int = 64): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    val hexLen = chunkBytes * 2
    // exact ceil-div: byte counts are far below 2^53, so the double
    // division inside floor() is exact
    val nchunks = floor((octet_length(col(mediaCol)) + lit(chunkBytes - 1))
      / lit(chunkBytes)).cast("int")
    df.select(col(idCol), hex(col(mediaCol)).as("_hx"),
        when(nchunks > 0, sequence(lit(0), nchunks - 1))
          .otherwise(array().cast("array<int>")).as("_idx"))
      .select(col(idCol), col("_hx"), explode(col("_idx")).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        md5(col("_hx")
          .substr((col("chunk_idx").cast("long") * hexLen + 1).cast("int"),
            lit(hexLen))
          .cast("binary")).as("chunk_fp"))
  }

  /** Cross-payload chunk sharing report over [[chunkFingerprints]]:
    * per-chunk distinct-payload frequency joined back to the chunk
    * grain (the [[graft.operators.Dedup.boilerplatePassages]] shape on
    * binary), keyed through the 16-byte fingerprint — the shuffle
    * never carries payload bytes. `shared` chunks are the CAS savings:
    * every payload holding one stores a pointer, not the block. */
  def chunkSharing(
      df: DataFrame,
      idCol: String,
      mediaCol: String,
      chunkBytes: Int = 64,
      minPayloads: Int = 2): DataFrame = {
    require(minPayloads > 1, "minPayloads must be > 1")
    val chunks = chunkFingerprints(df, idCol, mediaCol, chunkBytes)
    val dfreq = chunks.groupBy(col("chunk_fp"))
      .agg(count_distinct(col(idCol)).as("df_payloads"))
    chunks.join(dfreq, "chunk_fp")
      .select(col(idCol), col("chunk_idx"), col("chunk_fp"),
        col("df_payloads"), (col("df_payloads") >= minPayloads).as("shared"))
  }

  /** Magic-byte registry for [[sniffMime]] — REAL format signatures
    * (this part of the multimodal path needs no codec): JPEG SOI
    * `FF D8 FF`, PNG `89 50 4E 47`, RIFF `52 49 46 46` (the shared
    * WAV/AVI container — [[sniffMime]] disambiguates on the form
    * type at bytes 8–11). Probe order is first-match; payloads
    * matching nothing sniff as `application/octet-stream`. */
  val magicBytes: Seq[(String, Array[Byte])] = Seq(
    "image/jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "image/png" -> Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte),
    "audio/wav" -> Array(0x52, 0x49, 0x46, 0x46).map(_.toByte))

  /** Sniffed MIME of a binary payload from its leading magic bytes.
    * The prefix compare runs over `hex()` strings — engine-portable
    * (binary slicing is not; every SQL engine agrees on hex), and a
    * narrow per-row expression, no decode required. RIFF payloads
    * (WAV and AVI share the container signature) disambiguate on the
    * form-type tag at bytes 8–11: `WAVE` → audio/wav, `AVI ` →
    * video/avi, anything else stays octet-stream. This is the cheap
    * pre-decode integrity gate a media pipeline runs corpus-wide:
    * declared-vs-sniffed mismatches mark corrupt uploads, extension
    * lies, and transcoding bugs BEFORE the expensive decode stage. */
  def sniffMime(media: Column): Column = {
    val hx = hex(media)
    val riff = when(substring(hx, 17, 8) === "57415645", lit("audio/wav"))    // WAVE
      .when(substring(hx, 17, 8) === "41564920", lit("video/avi"))            // AVI␣
      .otherwise(lit("application/octet-stream"))
    magicBytes.foldRight(lit("application/octet-stream"): Column) {
      case ((mime, magic), els) =>
        val hexPrefix = magic.map(b => f"${b & 0xff}%02X").mkString
        val hit = if (mime == "audio/wav") riff else lit(mime)
        when(substring(hx, 1, hexPrefix.length) === hexPrefix, hit)
          .otherwise(els)
    }
  }

  /** Declared-vs-sniffed modality validation: appends `sniffed_mime`
    * and `modality_ok`. Rows failing the check should be quarantined,
    * not decoded — a mismatched payload fed to the declared codec is
    * the classic media-pipeline crash. */
  def validateModality(df: DataFrame, mediaCol: String, declaredCol: String): DataFrame =
    df.withColumn("sniffed_mime", sniffMime(col(mediaCol)))
      .withColumn("modality_ok", col("sniffed_mime") === col(declaredCol))

  /** Exact integer energy of a decoded feature window: the sum of the
    * 24-bit feature NUMERATORS (each fake feature is k/2^24; k < 2^24
    * round-trips through float32 exactly, so the long cast is lossless
    * and the sum is an exact integer on any engine). With a real codec
    * the analogue is the window's integer sample-energy sum — the
    * segmentation logic downstream is codec-agnostic. */
  def windowEnergy(features: Column): Column =
    aggregate(features, lit(0L),
      (acc, f) => acc + (f * lit(16777216.0f)).cast("long"))

  /** Active-region segmentation over per-(item, window) activity flags
    * (the audio silence-splitting primitive — every voice pipeline cuts
    * on energy before transcribing): contiguous runs of active windows
    * become segments via gaps-and-islands (island = win − row_number,
    * both per item), then one (item, island) collapse. Bounded by
    * windows-per-item, one item-keyed shuffle shared by the window and
    * the groupBy; never corpus-quadratic. Output: per segment
    * (seg_idx, start_win, end_win, n_wins, energy_sum). */
  def activeSegments(
      df: DataFrame, idCol: String, winCol: String,
      activeCol: String, energyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byWin = Window.partitionBy(col(idCol)).orderBy(col(winCol))
    val segs = df.filter(col(activeCol))
      .withColumn("_island", col(winCol) - row_number().over(byWin))
      .groupBy(col(idCol), col("_island"))
      .agg(min(col(winCol)).as("start_win"), max(col(winCol)).as("end_win"),
        count(lit(1)).as("n_wins"), sum(col(energyCol)).as("energy_sum"))
    val byStart = Window.partitionBy(col(idCol)).orderBy(col("start_win"))
    segs.withColumn("seg_idx", row_number().over(byStart))
      .select(col(idCol), col("seg_idx"), col("start_win"), col("end_win"),
        col("n_wins"), col("energy_sum"))
  }

  /** Deterministic synthetic PNG for codec-roundtrip auditing: a w×h
    * RGB image whose channel values are mod-256 LINEAR functions of
    * (id, x, y) — r = (31·id + 7x + 13y) % 256, g = (17·id + 5x + 3y)
    * % 256, b = (11·id + 2x + 19y) % 256 — so a SQL engine with no
    * image codec can recompute every pixel from first principles. PNG
    * is lossless: decode(synthPng(id)) returns exactly these values,
    * which is what lets m10's oracle verify the REAL encode → decode →
    * area-average-resize → decode chain value-for-value. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((31L * id + 7L * x + 13L * y) % 256).toInt
        val g = ((17L * id + 5L * x + 3L * y) % 256).toInt
        val b = ((11L * id + 2L * x + 19L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    imageIoMemoryStreams
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** [[synthPng]]'s audio sibling: a canonical-header mono 16-bit PCM
    * WAV of n samples at `rate` Hz, sample i = ((37·id + 101·i) % 4096)
    * − 2048 — again a pure integer function a SQL oracle replays. */
  def synthWav(id: Long, n: Int, rate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) {
      bb.putShort((((37L * id + 101L * i) % 4096) - 2048).toShort)
      i += 1
    }
    bb.array()
  }

  /** Decoded-image integer audit stats — dims plus EXACT per-channel
    * pixel sums (img_w, img_h, sum_r, sum_g, sum_b) recomputed from the
    * actual decoded payload. This is how the REAL codec path gets under
    * a value-level cross-engine oracle: a PNG byte stream is encoder-
    * specific, but the decoded pixels (and so these sums) are not. One
    * narrow mapPartitions pass, no shuffle. */
  def imageStats(df: DataFrame, mediaCol: String): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = df.schema
      .add("img_w", IntegerType, nullable = false)
      .add("img_h", IntegerType, nullable = false)
      .add("sum_r", LongType, nullable = false)
      .add("sum_g", LongType, nullable = false)
      .add("sum_b", LongType, nullable = false)
    df.mapPartitions { rows =>
      imageIoMemoryStreams
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](mediaIdx)))
        require(img != null, "imageStats: payload is not a decodable image")
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
            x += 1
          }
          y += 1
        }
        Row.fromSeq(r.toSeq ++ Seq[Any](img.getWidth, img.getHeight, rs, gs, bs))
      }
    }(Encoders.row(outSchema))
  }

  /** [[imageStats]]'s audio sibling over RIFF/WAVE mono 16-bit PCM:
    * (sample_rate, n_samples, sum_samples) parsed from the actual
    * bytes with [[WavResampler]]'s chunk-walk rules. Narrow pass. */
  def wavStats(df: DataFrame, mediaCol: String): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = df.schema
      .add("sample_rate", IntegerType, nullable = false)
      .add("n_samples", LongType, nullable = false)
      .add("sum_samples", LongType, nullable = false)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](mediaIdx)
        def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
        def le32(off: Int): Int = le16(off) | (le16(off + 2) << 16)
        def tag(off: Int): String = new String(b, off, 4, "US-ASCII")
        require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
          "wavStats: not a RIFF/WAVE payload")
        var pos = 12
        var rate = -1
        var dataOff = -1
        var dataLen = 0
        while (pos + 8 <= b.length) {
          val id = tag(pos)
          val sz = le32(pos + 4)
          require(sz >= 0 && pos.toLong + 8L + sz <= b.length.toLong,
            s"wavStats: chunk $id overruns the payload")
          if (id == "fmt ") {
            require(le16(pos + 8) == 1 && le16(pos + 10) == 1 &&
              le16(pos + 22) == 16, "wavStats: need mono 16-bit PCM")
            rate = le32(pos + 12)
          } else if (id == "data") { dataOff = pos + 8; dataLen = sz }
          pos += 8 + sz + (sz & 1)
        }
        require(rate >= 0 && dataOff >= 0, "wavStats: missing fmt/data chunk")
        val n = dataLen / 2
        var s = 0L
        var i = 0
        while (i < n) { s += le16(dataOff + 2 * i).toShort; i += 1 }
        Row.fromSeq(r.toSeq ++ Seq[Any](rate, n.toLong, s))
      }
    }(Encoders.row(outSchema))
  }
}
