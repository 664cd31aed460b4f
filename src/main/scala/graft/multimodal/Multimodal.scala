package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extraction / resize / frame-sampling
  * run as partition-batched transforms.
  *
  * IMAGES decode for real: [[decodeImages]] reads PNG/JPEG with the JDK's
  * `javax.imageio` (no external dependency) and emits width / height /
  * channel count / exact per-channel means; [[resizeImages]] re-encodes
  * real thumbnails.
  *
  * AUDIO decodes for real too: [[decodeAudio]] parses WAV/AIFF/AU PCM with
  * the JDK's `javax.sound.sampled` (no external dependency) and emits
  * sample rate / channels / duration / exact per-channel RMS and peak.
  *
  * VIDEO decodes for real as animated GIF: [[decodeVideo]] walks the
  * frame sequence with `javax.imageio`'s GIF reader (frame count, dims,
  * per-frame delay metadata → duration/fps, exact channel means across
  * all frames) and [[sampleVideoFrames]] is real frame sampling — every
  * `stride`-th frame decoded and re-encoded as PNG. mp4 CONTAINER
  * metadata parses for real too — [[mp4Meta]] walks the ISO-BMFF box
  * tree in pure bytes (brand, timescale/duration, track dims, sample
  * counts), no codec needed. Only frame-PIXEL decode for codecs the JDK
  * lacks (h264/vp9 inside mp4/webm) goes through [[decodeStub]] — the
  * batching/schema contract is identical, and a javacv decoder drops
  * into the same `mapPartitions` slot without changing any plan shape.
  *
  * Scale design (100 TB): media rows are fat (MBs each), so the
  * partitioner must balance *bytes*, not row counts —
  * [[repartitionBySize]] buckets by cumulative size class. The transform
  * itself is `mapPartitions` (the Scala analog of `mapInPandas`): one
  * iterator pass, no shuffle, decode amortized per batch. Filters on
  * metadata (format, dims) push down to parquet before any byte is read
  * when the metadata lives in its own columns — keep meta OUT of the
  * binary blob.
  */
object Multimodal {

  /** Canonical media schema: id, modality tag, raw bytes, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any table into the media schema for testing: bytes = utf-8 of a
    * string column, deterministic fake metadata derived from the id. */
  def syntheticMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      struct(
        lit("png").as("format"),
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        (col(idCol) * 40L).as("duration_ms")).as("meta"))

  // ------------------------------------------------------ real image path

  /** Deterministic checkerboard color for synthetic PNGs: pixel (x,y) of
    * image `id` is `base` when (x+y) is even, `base+8 (mod 256)` when odd,
    * per channel — so decoded channel means are EXACT integers over a
    * known parity count, and an engine with no image codec (the DuckDB
    * oracle) can compute the expected features analytically. */
  private[graft] def checkerColors(id: Long): (Int, Int, Int) =
    (((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)

  /** Generate REAL PNG bytes per row (`javax.imageio` encode inside
    * `mapPartitions`): width = id%64+16, height = id%48+16, checkerboard
    * fill from [[checkerColors]]. PNG is lossless, so [[decodeImages]]
    * recovers the exact pixel values — the encode→decode roundtrip is the
    * oracle-checkable part of the image pipeline. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 64 + 16).toInt
        val h = (id % 48 + 16).toInt
        val (cr, cg, cb) = checkerColors(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val even = (cr % 256) << 16 | (cg % 256) << 8 | (cb % 256)
        val odd = ((cr + 8) % 256) << 16 | ((cg + 8) % 256) << 8 |
          ((cb + 8) % 256)
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            rowBuf(x) = if ((x + y) % 2 == 0) even else odd
            x += 1
          }
          img.setRGB(0, y, w, 1, rowBuf, 0, w) // bulk row write
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray,
          Row("png", w, h, null.asInstanceOf[java.lang.Long]))
      }
    }(enc).toDF()
  }

  /** Output schema of the real image decoder. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true)
  ))

  /** Row bytes → decoded image, or null when the bytes are not an image
    * the JDK registry reads. Catches ALL non-fatal throwables, not just
    * IOException: the JDK readers throw RuntimeExceptions on malformed
    * payloads (CMMException on corrupt ICC profiles, IndexOutOfBounds on
    * truncated GIF/BMP) — at 100 TB one poisoned row must flag
    * `decoded = false`, not kill the job. */
  private def readImageOrNull(r: Row, byIdx: Int):
      (Array[Byte], java.awt.image.BufferedImage) = {
    val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
      else r.getAs[Array[Byte]](byIdx)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    (bytes, img)
  }

  /** REAL decode + channel statistics via `javax.imageio` (PNG/JPEG/GIF/
    * BMP — whatever the JDK registry reads). Non-decodable bytes yield
    * `decoded = false` with null stats (callers route audio/video to
    * [[decodeStub]] instead). Channel sums accumulate in Long (exact), so
    * the means are one double division — bit-reproducible by the oracle's
    * integer arithmetic. One iterator pass, no shuffle; codec state is
    * per-JVM (ImageIO registry), nothing to re-open per row. */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val (bytes, img) = readImageOrNull(r, byIdx)
        if (img == null)
          Row(id, bytes.length, false, null, null, null, null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          // bulk row reads: per-pixel getRGB goes through the colormodel
          // conversion path per call — one getRGB(row) is ~10× cheaper
          val rowBuf = new Array[Int](w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val p = rowBuf(x)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Row(id, bytes.length, true, w, h, img.getRaster.getNumBands,
            sr / n, sg / n, sb / n)
        }
      }
    }(enc).toDF()
  }

  /** REAL thumbnail resize: decode, scale the long edge to `maxDim`
    * (area-averaging, aspect preserved), re-encode as PNG. Non-decodable
    * rows pass through with null thumb bytes. Same flatMap-free
    * mapPartitions shape as [[decodeImages]]. */
  def resizeImages(media: DataFrame, maxDim: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("thumb_w", IntegerType, nullable = true),
      StructField("thumb_h", IntegerType, nullable = true),
      StructField("thumb_png", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val (_, img) = readImageOrNull(r, byIdx)
        if (img == null) Row(id, null, null, null)
        else {
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val tw = math.max(1, math.round(img.getWidth * scale).toInt)
          val th = math.max(1, math.round(img.getHeight * scale).toInt)
          val scaled = img.getScaledInstance(tw, th,
            java.awt.Image.SCALE_AREA_AVERAGING)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(scaled, 0, 0, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(id, tw, th, bos.toByteArray)
        }
      }
    }(enc).toDF()
  }

  // ------------------------------------------------- perceptual image hash

  /** Deterministic textured grayscale pixel for synthetic dHash images:
    * `v(x,y) = (x·b + y·(b/7) + x·y) mod 241` where `b = id mod 10⁶` —
    * enough 2-D texture that dHash fingerprints vary per image (a plain
    * linear gradient would hash identically corpus-wide). Ids ≥ 10⁶ mark
    * planted near-copies: the 3×3 corner block is brightened by
    * `(v+100) mod 241`, flipping only the hash bits whose cells touch
    * that corner — a hamming distance of a few bits from the original. */
  private[graft] def texturedPixel(id: Long, x: Int, y: Int): Int = {
    val b = id % 1000000L
    val base = ((x * b + y * (b / 7) + x.toLong * y) % 241L).toInt
    if (id >= 1000000L && x < 3 && y < 3) ((base + 100) % 241) else base
  }
  private[graft] def texturedDims(id: Long): (Int, Int) = {
    val b = id % 1000000L
    ((b % 40 + 24).toInt, (b % 32 + 16).toInt)
  }

  /** Generate REAL grayscale PNG bytes per row from [[texturedPixel]]
    * (same `mapPartitions` + ImageIO shape as [[syntheticImages]]). PNG
    * is lossless and the pixels are integer-deterministic, so a codec-less
    * engine can state the decoded values — and hence the dHash — in
    * closed form. */
  def syntheticTexturedImages(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = texturedDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = texturedPixel(id, x, y)
            rowBuf(x) = v << 16 | v << 8 | v
            x += 1
          }
          img.setRGB(0, y, w, 1, rowBuf, 0, w)
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, "image", bos.toByteArray,
          Row("png", w, h, null.asInstanceOf[java.lang.Long]))
      }
    }(enc).toDF()
  }

  /** Output schema of [[dhashImages]]. */
  val dhashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("dhash", LongType, nullable = true)))

  /** 64-bit difference hash (dHash) of each image — the classic
    * perceptual fingerprint for image near-dup detection: decode
    * (real ImageIO), box-downsample the red channel onto a 9×8 grid
    * (cell of pixel x is `x·9/w` — integer-exact, no resampling filter
    * to replicate), then bit `j·8+i` is set when cell `(i+1,j)` is
    * brighter than cell `(i,j)`. Comparisons are cross-multiplied
    * integer sums (`s₂·n₁ > s₁·n₂`), so the hash is bit-reproducible by
    * any engine from the pixel values alone — no floats anywhere.
    * dHash is invariant to global brightness shifts and to any
    * monotone-preserving rescale, which is what makes it a NEAR-dup
    * key rather than an exact checksum. Pair generation: feed the
    * result to `Dedup.hammingPairs` (pigeonhole banding — linear in
    * images, never all-pairs). Non-decodable rows keep a null hash.
    *
    * Scale design: map-only over the media column (one decode per row,
    * ~100 bytes of state per image); the expensive candidate pairing is
    * delegated to the banded hammingPairs exchange. */
  def dhashImages(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(dhashSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val (_, img) = readImageOrNull(r, byIdx)
        if (img == null) Row(id, null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](9, 8)
          val counts = Array.ofDim[Long](9, 8)
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            val cj = y * 8 / h
            var x = 0
            while (x < w) {
              val ci = x * 9 / w
              sums(ci)(cj) += (rowBuf(x) >> 16) & 0xff
              counts(ci)(cj) += 1
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              if (sums(i + 1)(j) * counts(i)(j) >
                  sums(i)(j) * counts(i + 1)(j))
                hash |= 1L << (j * 8 + i)
              i += 1
            }
            j += 1
          }
          Row(id, w, h, hash)
        }
      }
    }(enc).toDF()
  }

  // ------------------------------------------------------- real audio path

  /** Deterministic per-channel amplitude for synthetic WAVs: channel `c`
    * of clip `id` is a period-2 square wave at amplitude
    * `(id·31 + c·17) % 16000 + 1000` (16-bit PCM range). A square wave's
    * RMS and peak BOTH equal the amplitude exactly, so an engine with no
    * audio codec (the DuckDB oracle) states the expected features in
    * closed form — the audio analog of [[checkerColors]]. */
  private[graft] def squareAmp(id: Long, channel: Int): Int =
    (((id * 31 + channel * 17) % 16000) + 1000).toInt

  /** Frame count of synthetic clip `id`: 100–599 frames (even, so the
    * period-2 square wave integrates to mean 0). */
  private[graft] def squareFrames(id: Long): Int = ((id % 250) * 2 + 100).toInt

  /** Sample rate of synthetic clip `id`: 8 or 16 kHz. */
  private[graft] def squareRate(id: Long): Int =
    if (id % 2 == 0) 8000 else 16000

  /** Generate REAL RIFF/WAVE bytes per row (`javax.sound.sampled` encode
    * inside `mapPartitions`): 16-bit signed little-endian PCM, stereo when
    * `id % 3 == 0` else mono, frames/rate/amplitude from [[squareFrames]]/
    * [[squareRate]]/[[squareAmp]]. PCM is lossless, so [[decodeAudio]]
    * recovers the exact samples — encode→decode is oracle-checkable like
    * the PNG path. */
  def syntheticAudio(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val channels = if (id % 3 == 0) 2 else 1
        val frames = squareFrames(id)
        val rate = squareRate(id)
        val pcm = new Array[Byte](frames * channels * 2)
        var f = 0
        while (f < frames) {
          var c = 0
          while (c < channels) {
            val a = squareAmp(id, c)
            val s = if (f % 2 == 0) a else -a
            val o = (f * channels + c) * 2
            pcm(o) = (s & 0xff).toByte         // little-endian
            pcm(o + 1) = ((s >> 8) & 0xff).toByte
            c += 1
          }
          f += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, "audio", bos.toByteArray,
          Row("wav", null, null, math.round(frames * 1000.0 / rate)))
      }
    }(enc).toDF()
  }

  /** Output schema of the real audio decoder. Per-channel stats cover the
    * first two channels (mono fills channel 1 with nulls) — fixed columns
    * so the frame is oracle-comparable; >2-channel streams still decode
    * (stats beyond channel 1 are simply not reported). */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_ms", DoubleType, nullable = true),
    StructField("rms_0", DoubleType, nullable = true),
    StructField("rms_1", DoubleType, nullable = true),
    StructField("peak_0", IntegerType, nullable = true),
    StructField("peak_1", IntegerType, nullable = true)
  ))

  /** REAL audio decode + per-channel signal statistics via
    * `javax.sound.sampled` (WAV/AIFF/AU — the JDK registry; 8/16-bit PCM).
    * Emits sample rate, channel count, frame count, duration and exact
    * per-channel RMS / absolute peak: squared sums accumulate in Long
    * (exact to 2⁵³ ≈ 94 h of 16-bit audio per channel), so RMS is one
    * sqrt of an exact ratio — reproducible by the oracle's integer
    * arithmetic. Non-decodable bytes yield `decoded = false` with null
    * stats (same poisoned-row containment as [[decodeImages]]: one bad
    * row at 100 TB must not kill the job). One iterator pass, no shuffle. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        decodeOneAudio(id, bytes)
      }
    }(enc).toDF()
  }

  /** Decode one clip, or the `decoded = false` row on any non-fatal
    * failure (UnsupportedAudioFileException, truncated stream, compressed
    * encodings the JDK can't read raw). */
  private def decodeOneAudio(id: Long, bytes: Array[Byte]): Row =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val ok = (fmt.getSampleSizeInBits == 16 &&
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
          (fmt.getSampleSizeInBits == 8 &&
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED))
        if (!ok)
          Row(id, bytes.length, false, null, null, null, null,
            null, null, null, null)
        else {
          val channels = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameSize = fmt.getFrameSize
          val buf = new Array[Byte](frameSize * 4096)
          val sq = new Array[Long](channels)
          val peak = new Array[Int](channels)
          var frames = 0L
          var carry = 0 // bytes of a partial frame carried between reads
          var read = ais.read(buf, carry, buf.length - carry)
          while (read > 0) {
            val avail = carry + read
            val whole = (avail / frameSize) * frameSize
            var o = 0
            while (o < whole) {
              var c = 0
              while (c < channels) {
                val so = o + c * bytesPerSample
                val s =
                  if (bytesPerSample == 2) {
                    val lo = buf(so) & 0xff; val hi = buf(so + 1).toInt
                    if (fmt.isBigEndian) (buf(so).toInt << 8) | (buf(so + 1) & 0xff)
                    else (hi << 8) | lo
                  } else { // 8-bit: unsigned center-128 per WAV convention
                    if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                      (buf(so) & 0xff) - 128
                    else buf(so).toInt
                  }
                sq(c) += s.toLong * s
                val a = math.abs(s)
                if (a > peak(c)) peak(c) = a
                c += 1
              }
              frames += 1
              o += frameSize
            }
            carry = avail - whole
            if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
            read = ais.read(buf, carry, buf.length - carry)
          }
          if (frames == 0)
            Row(id, bytes.length, false, null, null, null, null,
              null, null, null, null)
          else {
            def rms(c: Int): java.lang.Double =
              if (c < channels) math.sqrt(sq(c).toDouble / frames) else null
            def pk(c: Int): java.lang.Integer =
              if (c < channels) peak(c) else null
            Row(id, bytes.length, true, fmt.getSampleRate.toInt, channels,
              frames, frames * 1000.0 / fmt.getSampleRate, rms(0), rms(1),
              pk(0), pk(1))
          }
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        Row(id, bytes.length, false, null, null, null, null,
          null, null, null, null)
    }

  // ------------------------------------------------------- real video path

  /** Deterministic solid fill for frame `k` of synthetic video `id` — the
    * video analog of [[checkerColors]]/[[squareAmp]]: one exact color per
    * frame, so the across-frames channel means are closed-form for an
    * engine with no codec (the DuckDB oracle). */
  private[graft] def frameColor(id: Long, k: Int): (Int, Int, Int) =
    (((id * 37 + k * 11) % 256).toInt, ((id * 59 + k * 23) % 256).toInt,
      ((id * 83 + k * 5) % 256).toInt)

  /** Frame count of synthetic video `id`: 4–15. */
  private[graft] def videoFrames(id: Long): Int = (id % 12 + 4).toInt

  /** Per-frame delay of synthetic video `id` in GIF centiseconds: 1–10
    * (stored exactly in the GraphicControlExtension, so duration and fps
    * are closed-form). */
  private[graft] def videoDelayCs(id: Long): Int = (id % 10 + 1).toInt

  /** Dimensions of synthetic video `id`: 8–39 × 8–31. */
  private[graft] def videoDims(id: Long): (Int, Int) =
    ((id % 32 + 8).toInt, (id % 24 + 8).toInt)

  /** Generate REAL animated-GIF bytes per row (`javax.imageio` GIF
    * sequence writer): [[videoFrames]] solid-color frames from
    * [[frameColor]] on an explicit 2-entry indexed palette — GIF encodes
    * palette indices losslessly, so [[decodeVideo]] recovers the exact
    * colors — with the per-frame delay in the frame's
    * GraphicControlExtension. The writer is instantiated once per
    * partition; each row is its own prepare/write/end sequence. */
  def syntheticVideos(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = videoDims(id)
        val nFrames = videoFrames(id)
        val delayCs = videoDelayCs(id)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var k = 0
        while (k < nFrames) {
          val (cr, cg, cb) = frameColor(id, k)
          val cm = new java.awt.image.IndexColorModel(8, 2,
            Array(cr.toByte, 0.toByte), Array(cg.toByte, 0.toByte),
            Array(cb.toByte, 0.toByte))
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          // raster default-initializes to index 0 = the frame color
          val meta = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), null)
          val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
          val root = meta.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = {
            val kids = root.getElementsByTagName("GraphicControlExtension")
            if (kids.getLength > 0)
              kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            else {
              val n = new javax.imageio.metadata.IIOMetadataNode(
                "GraphicControlExtension")
              root.appendChild(n); n
            }
          }
          gce.setAttribute("disposalMethod", "none")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("transparentColorIndex", "0")
          gce.setAttribute("delayTime", delayCs.toString)
          meta.setFromTree(fmt, root)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
            null)
          k += 1
        }
        writer.endWriteSequence()
        ios.flush(); ios.close()
        Row(id, "video", bos.toByteArray,
          Row("gif", w, h, (nFrames.toLong * delayCs * 10)))
      }
    }(enc).toDF()
  }

  /** Output schema of the real video decoder. */
  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("duration_ms", DoubleType, nullable = true),
    StructField("fps", DoubleType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true)
  ))

  /** REAL video decode + across-frame statistics via the JDK GIF frame
    * reader: frame count, first-frame dimensions, per-frame delays from
    * the GraphicControlExtension (duration = Σ delay·10 ms; fps =
    * frames/duration; a delay-less stream reports null duration/fps
    * rather than inventing a default), and exact channel means over EVERY
    * pixel of EVERY frame (Long sums). Same poisoned-row containment as
    * the other decoders; one iterator pass, no shuffle. The reader is
    * per-partition; input streams are per-row. */
  def decodeVideo(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoFeatureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false, false) // allow frame-count search
            val n = reader.getNumImages(true)
            if (n <= 0) throw new java.io.IOException("no frames")
            var sr = 0L; var sg = 0L; var sb = 0L; var px = 0L
            var delaySum = 0L; var sawDelay = false
            var w0 = 0; var h0 = 0
            var i = 0
            while (i < n) {
              val img = reader.read(i)
              if (i == 0) { w0 = img.getWidth; h0 = img.getHeight }
              val w = img.getWidth; val h = img.getHeight
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) {
                  val p = rowBuf(x)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              px += w.toLong * h
              val meta = reader.getImageMetadata(i)
              val root = meta.getAsTree(meta.getNativeMetadataFormatName)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              val gce = root.getElementsByTagName("GraphicControlExtension")
              if (gce.getLength > 0) {
                val d = gce.item(0)
                  .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                  .getAttribute("delayTime")
                if (d != null && d.nonEmpty) {
                  delaySum += d.toLong; sawDelay = true
                }
              }
              i += 1
            }
            val durMs: java.lang.Double =
              if (sawDelay) (delaySum * 10).toDouble else null
            val fps: java.lang.Double =
              if (sawDelay && delaySum > 0) n * 100.0 / delaySum else null
            Row(id, bytes.length, true, w0, h0, n, durMs, fps,
              sr.toDouble / px, sg.toDouble / px, sb.toDouble / px)
          } finally iis.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, bytes.length, false, null, null, null, null, null,
              null, null, null)
        }
      }
    }(enc).toDF()
  }

  /** REAL frame sampling: every `stride`-th GIF frame, decoded and
    * re-encoded as PNG with its per-frame channel means — the real form
    * of [[frameSampleStub]]'s one-row→many-rows contract (flatMap, no
    * shuffle). Undecodable rows contribute zero frames. */
  def sampleVideoFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("frame_png", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false, false)
            val n = reader.getNumImages(true)
            (0 until n by stride).map { i =>
              val img = reader.read(i)
              val w = img.getWidth; val h = img.getHeight
              val rowBuf = new Array[Int](w)
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) {
                  val p = rowBuf(x)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val np = (w.toLong * h).toDouble
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              Row(id, i, w, h, sr / np, sg / np, sb / np, bos.toByteArray)
            }
          } finally iis.close()
        } catch {
          case scala.util.control.NonFatal(_) => Seq.empty[Row]
        }
      }
    }(enc).toDF()
  }

  // ------------------------------------------------ mp4 container parse

  /** Closed-form synthetic-mp4 parameters, shared with the DuckDB oracle
    * (the [[checkerColors]] convention): movie timescale, per-sample
    * delta, sample count, 16.16 track dimensions — all functions of the
    * id alone. */
  private[graft] def mp4Timescale(id: Long): Long = 600L * (id % 4 + 1)
  private[graft] def mp4Delta(id: Long): Long = 100L * (id % 3 + 1)
  private[graft] def mp4Samples(id: Long): Long = id % 20 + 5
  private[graft] def mp4Width(id: Long): Long = 16L * (id % 8 + 2)
  private[graft] def mp4Height(id: Long): Long = 16L * (id % 6 + 2)
  private[graft] def mp4Codec(id: Long): String =
    (id % 3) match { case 0 => "avc1"; case 1 => "hvc1"; case _ => "vp09" }
  private[graft] def mp4AvgBitrate(id: Long): Long = 1000L * (id % 50 + 10)

  /** Generate REAL ISO-BMFF (mp4) container bytes per row: ftyp + a full
    * moov tree (mvhd, trak{tkhd, mdia{mdhd, minf{stbl{stts}}}}) + a
    * token mdat, version-0 boxes, and a TWO-entry stts so the parser's
    * multi-entry sample summation is exercised. No codec is involved —
    * the container STRUCTURE is the artifact under test, and every field
    * (and the total byte size, which is constant by construction) is a
    * closed form of `id` the oracle states analytically. */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val ts = mp4Timescale(id); val delta = mp4Delta(id)
        val ns = mp4Samples(id); val dur = ns * delta
        val w = mp4Width(id); val h = mp4Height(id)
        def u32(vals: Long*): Array[Byte] = {
          val b = java.nio.ByteBuffer.allocate(4 * vals.length)
          vals.foreach(v => b.putInt((v & 0xffffffffL).toInt))
          b.array()
        }
        def box(typ: String, payload: Array[Byte]): Array[Byte] =
          u32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
        // unity transform matrix (16.16 / 2.30 fixed point)
        val matrix = u32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0,
          0x40000000L)
        val ftyp = box("ftyp",
          "isom".getBytes("ISO-8859-1") ++ u32(0L))
        val mvhd = box("mvhd", u32(0L, 0L, 0L, ts, dur,
          0x00010000L,        // rate 1.0
          0x01000000L,        // volume 1.0 + 2 reserved bytes
          0L, 0L) ++ matrix ++ u32(0L, 0L, 0L, 0L, 0L, 0L, 2L))
        val tkhd = box("tkhd", u32(7L,   // v0, flags enabled|in-movie
          0L, 0L, 1L,         // creation, modification, track_id
          0L, dur, 0L, 0L,    // reserved, duration, reserved×2
          0L, 0L) ++ matrix ++ u32(w << 16, h << 16))
        val mdhd = box("mdhd", u32(0L, 0L, 0L, ts, dur,
          0x55c40000L))       // language 'und' + predefined
        val stts = box("stts",
          u32(0L, 2L, ns - 1, delta, 1L, delta))
        // stsd: one VisualSampleEntry (78-byte body with data_ref_index,
        // width/height u16 at the spec offsets) whose fourcc IS the
        // codec id, carrying a standard btrt BitRateBox child —
        // container-level codec identity + bitrate, still zero codec
        // bytes involved
        val rate = mp4AvgBitrate(id)
        val entryBody = new Array[Byte](78)
        def put16(o: Int, v: Long): Unit = {
          entryBody(o) = ((v >> 8) & 0xff).toByte
          entryBody(o + 1) = (v & 0xff).toByte
        }
        put16(6, 1L)  // data_reference_index
        put16(24, w); put16(26, h)
        val btrt = box("btrt", u32(0L, 2L * rate, rate))
        val stsd = box("stsd", u32(0L, 1L) ++
          box(mp4Codec(id), entryBody ++ btrt))
        val moov = box("moov", mvhd ++ box("trak", tkhd ++
          box("mdia", mdhd ++ box("minf", box("stbl", stsd ++ stts)))))
        val mdat = box("mdat", Array[Byte](0, 1, 2, 3))
        val bytes = ftyp ++ moov ++ mdat
        Row(id, "video", bytes,
          Row("mp4", w.toInt, h.toInt,
            math.round(dur * 1000.0 / ts)))
      }
    }(enc).toDF()
  }

  /** Output schema of the mp4 container parser. */
  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("major_brand", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("duration", LongType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("codec_id", StringType, nullable = true),
    StructField("avg_bitrate", LongType, nullable = true)
  ))

  /** Box-tree walker over one mp4 byte array. Handles 64-bit largesize
    * boxes (size == 1), to-end boxes (size == 0), version-0 AND
    * version-1 mvhd/tkhd, and sums sample counts across every stts of
    * every track. Truncated/corrupt subtrees stop cleanly (partial
    * fields stay unset) instead of throwing. */
  private[graft] final class Mp4Walk(bytes: Array[Byte]) {
    var brand: String = _
    var timescale: Long = -1
    var duration: Long = -1
    var nTracks: Int = 0
    var width: Long = -1
    var height: Long = -1
    var nSamples: Long = 0
    var codec: String = _
    var avgBitrate: Long = -1
    var sawMoov = false
    private def u32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    private def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    private def fourcc(o: Int): String =
      new String(bytes, o, 4, "ISO-8859-1")
    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        var size = u32(off.toInt)
        val typ = fourcc(off.toInt + 4)
        var hdr = 8L
        if (size == 1 && off + 16 <= end) {
          size = u64(off.toInt + 8); hdr = 16
        } else if (size == 0) size = end - off
        if (size < hdr || off + size > end) return // corrupt: stop clean
        val p = (off + hdr).toInt
        typ match {
          case "ftyp" if brand == null && size >= hdr + 4 =>
            brand = fourcc(p)
          case "moov" => sawMoov = true; walk(off + hdr, off + size)
          case "trak" => nTracks += 1; walk(off + hdr, off + size)
          case "mdia" | "minf" | "stbl" => walk(off + hdr, off + size)
          case "mvhd" if size >= hdr + 4 =>
            val v = bytes(p) & 0xff
            if (v == 1 && size >= hdr + 32) {
              timescale = u32(p + 20); duration = u64(p + 24)
            } else if (v == 0 && size >= hdr + 20) {
              timescale = u32(p + 12); duration = u32(p + 16)
            }
          case "tkhd" if width < 0 && size >= hdr + 4 =>
            val v = bytes(p) & 0xff
            val woff = if (v == 1) 88 else 76 // past matrix, v1 has 64-bit times
            if (size >= hdr + woff + 8) {
              width = u32(p + woff) >> 16
              height = u32(p + woff + 4) >> 16
            }
          case "stsd" if codec == null && size >= hdr + 16 =>
            // first sample entry's fourcc IS the codec id; its child
            // boxes (after the 78-byte VisualSampleEntry body) may
            // carry a btrt BitRateBox with the average bitrate
            val nEnt = u32(p + 4)
            val entOff = p + 8
            val entSize = u32(entOff)
            if (nEnt >= 1 && entSize >= 8 &&
                entOff + entSize <= off + size) {
              codec = fourcc(entOff + 4)
              val entEnd = entOff + entSize
              var c = entOff + 8L + 78L
              while (c + 8 <= entEnd) {
                val cs = u32(c.toInt)
                if (cs < 8 || c + cs > entEnd) c = entEnd // corrupt: stop
                else {
                  if (fourcc(c.toInt + 4) == "btrt" && cs >= 20)
                    avgBitrate = u32(c.toInt + 16)
                  c += cs
                }
              }
            }
          case "stts" if size >= hdr + 8 =>
            val n = u32(p + 4)
            var i = 0L
            while (i < n && off + hdr + 8 + i * 8 + 8 <= off + size) {
              nSamples += u32((p + 8 + i * 8).toInt)
              i += 1
            }
          case _ => ()
        }
        off += size
      }
    }
  }

  /** REAL mp4/ISO-BMFF CONTAINER parse — pure byte walking, no codec:
    * ftyp major brand, mvhd timescale/movie duration (v0 and v1),
    * first-tkhd 16.16 track dimensions, trak count, total sample count
    * over every stts entry. This is the metadata a 100 TB video ingest
    * filters and validates on (duration caps, resolution gates,
    * corrupt-container rejection) WITHOUT decoding a frame — frame-pixel
    * decode stays behind [[decodeStub]] (the JDK ships no h264/vp9
    * codec; reference pipeline shape at tape's batch UDF boundary).
    * Bytes without a parseable moov+mvhd yield `decoded = false` with
    * null fields — the same poisoned-row containment as the other
    * decoders. One iterator pass, no shuffle. */
  def mp4Meta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mp4MetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        try {
          val wk = new Mp4Walk(bytes)
          wk.walk(0L, bytes.length.toLong)
          if (wk.sawMoov && wk.timescale > 0)
            Row(id, bytes.length, true, wk.brand, wk.timescale,
              wk.duration, wk.duration.toDouble / wk.timescale,
              wk.nTracks,
              if (wk.width >= 0) wk.width else null,
              if (wk.height >= 0) wk.height else null,
              wk.nSamples, wk.codec,
              if (wk.avgBitrate >= 0) wk.avgBitrate else null)
          else
            Row(id, bytes.length, false, null, null, null, null, null,
              null, null, null, null, null)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, bytes.length, false, null, null, null, null, null,
              null, null, null, null, null)
        }
      }
    }(enc).toDF()
  }

  /** Output schema of the stub feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_histogram", ArrayType(DoubleType), nullable = true),
    StructField("thumb_bytes", BinaryType, nullable = true)
  ))

  /** STUB decode + feature extraction: 16-bin byte histogram (stands in
    * for pixel statistics) and a truncated-bytes "thumbnail" (stands in
    * for resize). A real build replaces the body of the per-row closure
    * with an actual codec; the batching/schema contract is unchanged. */
  def decodeStub(media: DataFrame, thumbBytes: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      // per-partition setup (a real decoder opens its context once here)
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(bytes.length, 1)
        val normed = hist.map(_ / n)
        Row(id, bytes.length, normed.toSeq, bytes.take(thumbBytes))
      }
    }(enc).toDF()
  }

  /** Frame sampling stub: every `stride`-th chunk of `chunk` bytes —
    * the plumbing shape of video frame extraction (one input row → many
    * output rows, flatMap, no shuffle). */
  def frameSampleStub(media: DataFrame, chunk: Int = 32,
      stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val nChunks = bytes.length / chunk
        (0 until nChunks by stride).map { f =>
          Row(id, f, bytes.slice(f * chunk, f * chunk + chunk))
        }
      }
    }(enc).toDF()
  }

  /** Byte-size-aware repartition: assign each row a size class
    * (log2 of payload length) and hash-distribute within class, so a few
    * giant videos don't land on one executor while thumbnails pile up on
    * another. For real pipelines prefer writing with
    * `sortWithinPartitions(size_class)` + parquet so scans stay balanced. */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame = {
    val sized = media.withColumn("__size_class",
      floor(log2(greatest(length(col("bytes")).cast("long"), lit(1L)))))
    sized.repartition(partitions, col("__size_class"),
      pmod(hash(col("media_id")), lit(partitions)))
      .drop("__size_class")
  }

  // ------------------------------------------------- PNG chunk walk

  /** Output schema of the PNG chunk-walk parser. */
  val pngMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("is_png", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bit_depth", IntegerType, nullable = true),
    StructField("color_type", IntegerType, nullable = true),
    StructField("interlace", IntegerType, nullable = true),
    StructField("n_chunks", IntegerType, nullable = true),
    StructField("has_alpha", BooleanType, nullable = true)
  ))

  /** PNG structure metadata WITHOUT decoding — signature check + chunk
    * walk to IHDR: dimensions, bit depth, color type (and the derived
    * has_alpha: color types 4/6 or a tRNS chunk), interlace method,
    * total chunk count. Parses the bytes REAL encoders emit (the spec
    * and oracle run it over [[syntheticImages]]' actual `javax.imageio`
    * output — only encoder-contract fields are oracle-hashed; chunk
    * count is deflate-layout-dependent and stays spec-side, the
    * compressionRatio precedent). Truncated/corrupt chunk lists stop
    * cleanly. Map-only, the [[mp4Meta]] posture. */
  def pngMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pngMetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val b = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        val isPng = b.length >= 8 &&
          sig.indices.forall(i => (b(i) & 0xff) == sig(i))
        if (!isPng) Row(id, false, null, null, null, null, null, null,
          null)
        else {
          def u32(o: Int): Long =
            ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
              ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
          var w: Integer = null; var h: Integer = null
          var depth: Integer = null; var ct: Integer = null
          var il: Integer = null
          var trns = false
          var n = 0
          var off = 8
          var ok = true
          while (ok && off + 8 <= b.length) {
            val len = u32(off)
            val typ = new String(b, off + 4, 4, "ISO-8859-1")
            if (len < 0 || off + 12 + len > b.length) ok = false
            else {
              n += 1
              val p = off + 8
              if (typ == "IHDR" && len >= 13) {
                w = u32(p).toInt; h = u32(p + 4).toInt
                depth = b(p + 8) & 0xff; ct = b(p + 9) & 0xff
                il = b(p + 12) & 0xff
              } else if (typ == "tRNS") trns = true
              if (typ == "IEND") ok = false
              off += 12 + len.toInt
            }
          }
          val alpha: java.lang.Boolean =
            if (ct == null) null
            else Boolean.box(ct == 4 || ct == 6 || trns)
          Row(id, true, w, h, depth, ct, il, Int.box(n), alpha)
        }
      }
    }(enc).toDF()
  }

  // -------------------------------------------- JPEG marker walk + EXIF

  private[graft] def exifMake(id: Long): String = (id % 4) match {
    case 0 => "Canon"; case 1 => "NIKON"; case 2 => "Apple"
    case _ => "SONY"
  }
  private[graft] def exifModel(id: Long): String = s"Cam-${id % 6}"
  private[graft] def exifOrientation(id: Long): Int = (id % 8 + 1).toInt
  private[graft] def exifDateTime(id: Long): String =
    s"2024:0${id % 9 + 1}:0${id % 8 + 1} 0${id % 9}:0${id % 5 + 1}:0${id % 7}"
  private[graft] def exifHasGps(id: Long): Boolean = id % 5 == 0
  private[graft] def jpegWidth(id: Long): Int = (16 * (id % 9 + 1)).toInt
  private[graft] def jpegHeight(id: Long): Int = (8 * (id % 11 + 1)).toInt

  /** XMP APP1 namespace header (XMP Part 3 §1.1.3). */
  private[graft] val XmpNs = "http://ns.adobe.com/xap/1.0/\u0000"
  /** Every 3rd id carries an XMP packet; of those, evens embed XMP GPS
    * (so XMP GPS presence is independent of the TIFF GPS IFD arm). */
  private[graft] def hasXmp(id: Long): Boolean = id % 3 == 0
  private[graft] def xmpHasGpsF(id: Long): Boolean =
    hasXmp(id) && id % 2 == 0
  private[graft] def xmpTool(id: Long): String = s"Tool-${id % 4}"
  /** Space-padded XML length — fixed so the segment size (and the
    * oracle's n_bytes closed form) is a CONSTANT 353 = 2 marker +
    * 2 length + 29 namespace + 320 packet. */
  private[graft] val XmpXmlLen = 320
  private[graft] def xmpPacket(id: Long): String = {
    val gps = if (xmpHasGpsF(id))
      s""" exif:GPSLatitude="4${id % 9},30.00N"""" +
        s""" exif:GPSLongitude="12${id % 7},15.00E""""
    else ""
    val xml =
      "<x:xmpmeta xmlns:x=\"adobe:ns:meta/\">" +
        "<rdf:RDF xmlns:rdf=" +
        "\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\">" +
        "<rdf:Description" +
        " xmlns:xmp=\"http://ns.adobe.com/xap/1.0/\"" +
        " xmlns:exif=\"http://ns.adobe.com/exif/1.0/\"" +
        s""" xmp:CreatorTool="${xmpTool(id)}"""" + gps +
        "/></rdf:RDF></x:xmpmeta>"
    require(xml.length <= XmpXmlLen,
      s"xmp packet ${xml.length} exceeds the fixed $XmpXmlLen")
    xml + " " * (XmpXmlLen - xml.length)
  }

  /** Generate REAL JPEG marker streams per row — SOI, an APP1/Exif
    * segment (a full TIFF block: byte order ALTERNATING "II"/"MM" by id
    * so both endiannesses are exercised, IFD0 with Make/Model ASCII
    * entries in the out-of-line data area, an inline SHORT Orientation,
    * a 20-byte DateTime, and for every 5th id a GPS-IFD pointer tag
    * whose empty GPS IFD is appended after the data area), an SOF0
    * frame header carrying the real width/height, SOS and EOI. No
    * entropy-coded image data is involved — the MARKER/TIFF structure
    * is the artifact under test (the [[syntheticMp4s]] posture), and
    * every field is a closed form of `id` the oracle states
    * analytically. */
  def syntheticExifJpegs(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val little = id % 2 == 0
        val make = exifMake(id); val model = exifModel(id)
        val dt = exifDateTime(id); val gps = exifHasGps(id)
        val w = jpegWidth(id); val h = jpegHeight(id)
        val bb = java.nio.ByteBuffer.allocate(4096)
        def u16n(v: Int): Array[Byte] = // TIFF-endian u16
          if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
          else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def u32n(v: Long): Array[Byte] =
          if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
          else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
            ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        // TIFF block: header(8) + count(2) + n*12 + next(4) + data area
        val nEntries = if (gps) 5 else 4
        val entriesEnd = 8 + 2 + nEntries * 12 + 4
        val makeOff = entriesEnd
        val modelOff = makeOff + make.length + 1
        val dtOff = modelOff + model.length + 1
        val gpsOff = dtOff + 20
        val tiff = {
          val o = new java.io.ByteArrayOutputStream()
          o.write(if (little) Array[Byte]('I', 'I') else Array[Byte]('M', 'M'))
          o.write(u16n(42))
          o.write(u32n(8L))
          o.write(u16n(nEntries))
          def entry(tag: Int, typ: Int, count: Long,
              value: Array[Byte]): Unit = {
            o.write(u16n(tag)); o.write(u16n(typ)); o.write(u32n(count))
            o.write(value.padTo(4, 0.toByte))
          }
          // inline SHORT occupies the FIRST two bytes of the value
          // field in both byte orders (TIFF left-justifies values)
          entry(0x010f, 2, make.length + 1L, u32n(makeOff.toLong))
          entry(0x0110, 2, model.length + 1L, u32n(modelOff.toLong))
          entry(0x0112, 3, 1L, u16n(exifOrientation(id)))
          entry(0x0132, 2, 20L, u32n(dtOff.toLong))
          if (gps) entry(0x8825, 4, 1L, u32n(gpsOff.toLong))
          o.write(u32n(0L)) // next IFD
          o.write(make.getBytes("ISO-8859-1")); o.write(0)
          o.write(model.getBytes("ISO-8859-1")); o.write(0)
          o.write(dt.getBytes("ISO-8859-1")); o.write(0)
          if (gps) { o.write(u16n(0)); o.write(u32n(0L)) } // empty GPS IFD
          o.toByteArray
        }
        def be16(v: Int): Array[Byte] = // JPEG marker lengths are BE
          Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        def marker(m: Int, payload: Array[Byte]): Array[Byte] =
          Array(0xff.toByte, m.toByte) ++ be16(payload.length + 2) ++
            payload
        val app1 = marker(0xe1,
          "Exif".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++ tiff)
        // every 3rd id: a second APP1 carrying a real XMP packet
        // (CreatorTool always; exif:GPS* attributes on evens) — the
        // OTHER place JPEGs embed GPS, which an IFD-only redaction
        // would silently miss
        val xmp = if (hasXmp(id))
          marker(0xe1, (XmpNs + xmpPacket(id)).getBytes("ISO-8859-1"))
        else Array.emptyByteArray
        val sof0 = marker(0xc0, Array(8.toByte) ++ be16(h) ++ be16(w) ++
          Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
        val sos = marker(0xda,
          Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0))
        val bytes = Array(0xff.toByte, 0xd8.toByte) ++ app1 ++ xmp ++
          sof0 ++ sos ++ Array[Byte](0x12, 0x34) ++
          Array(0xff.toByte, 0xd9.toByte)
        Row(id, "image", bytes, Row("jpeg", w, h, null))
      }
    }(enc).toDF()
  }

  /** Output schema of the JPEG/EXIF metadata parser. */
  val exifMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("is_jpeg", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true),
    StructField("orientation", IntegerType, nullable = true),
    StructField("datetime", StringType, nullable = true),
    StructField("has_gps", BooleanType, nullable = true),
    StructField("xmp_tool", StringType, nullable = true),
    StructField("xmp_gps", BooleanType, nullable = true)
  ))

  /** JPEG metadata WITHOUT decoding — the corpus-scale fast path every
    * image pipeline needs before any pixel work: dimensions from the
    * SOF frame header, and camera provenance from the APP1/Exif TIFF
    * block (Make, Model, Orientation — needed to decode upright —
    * DateTime, and a GPS-present flag: embedded GPS is PII a training
    * corpus must strip, so the FLAG is the curation signal). Handles
    * both TIFF byte orders, inline and out-of-line values, stops at
    * SOS, and treats truncated/corrupt structures as cleanly-absent
    * fields (is_jpeg=false when SOI is missing) instead of throwing.
    * Map-only `mapPartitions` over the bytes column — no shuffle, the
    * [[mp4Meta]] posture. */
  def exifMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(exifMetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val b = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val wk = new JpegWalk(b)
        try wk.walk()
        catch { case scala.util.control.NonFatal(_) => () }
        Row(id, b.length, wk.isJpeg,
          if (wk.width >= 0) wk.width else null,
          if (wk.height >= 0) wk.height else null,
          wk.make, wk.model,
          if (wk.orientation >= 0) wk.orientation else null,
          wk.datetime,
          if (wk.sawExif) Boolean.box(wk.hasGps) else null,
          if (wk.sawXmp) wk.xmpTool else null,
          if (wk.sawXmp) Boolean.box(wk.xmpGps) else null)
      }
    }(enc).toDF()
  }

  /** Marker walk over one JPEG byte array + TIFF IFD0 scan. */
  private[graft] final class JpegWalk(b: Array[Byte]) {
    var isJpeg = false
    var width: Int = -1
    var height: Int = -1
    var make: String = _
    var model: String = _
    var orientation: Int = -1
    var datetime: String = _
    var sawExif = false
    var hasGps = false
    var sawXmp = false
    var xmpTool: String = _
    var xmpGps = false
    private def u8(o: Int): Int = b(o) & 0xff
    private def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    def walk(): Unit = {
      if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return
      isJpeg = true
      var off = 2
      while (off + 4 <= b.length) {
        if (u8(off) != 0xff) return // desynced: stop clean
        val m = u8(off + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          off += 2 // standalone markers carry no length
        } else if (m == 0xd9 || m == 0xda) {
          return // EOI / SOS: no more metadata segments
        } else {
          val len = be16(off + 2)
          if (len < 2 || off + 2 + len > b.length) return
          val p = off + 4
          if (m == 0xe1 && len >= 8 &&
              new String(b, p, 4, "ISO-8859-1") == "Exif")
            parseTiff(p + 6, off + 2 + len)
          else if (m == 0xe1 && len - 2 >= XmpNs.length &&
              new String(b, p, XmpNs.length, "ISO-8859-1") == XmpNs)
            parseXmp(p + XmpNs.length, off + 2 + len)
          else if ((m == 0xc0 || m == 0xc1 || m == 0xc2 || m == 0xc3) &&
              len >= 7) {
            height = be16(p + 1); width = be16(p + 3)
          }
          off += 2 + len
        }
      }
    }
    private def parseTiff(base: Int, end: Int): Unit = {
      if (base + 8 > end) return
      val little = u8(base) == 'I' && u8(base + 1) == 'I'
      val big = u8(base) == 'M' && u8(base + 1) == 'M'
      if (!little && !big) return
      def u16(o: Int): Int =
        if (little) u8(o) | (u8(o + 1) << 8) else be16(o)
      def u32(o: Int): Long =
        if (little) u16(o).toLong | (u16(o + 2).toLong << 16)
        else (u16(o).toLong << 16) | u16(o + 2).toLong
      if (u16(base + 2) != 42) return
      val ifd0 = base + u32(base + 4).toInt
      if (ifd0 + 2 > end) return
      sawExif = true
      val n = u16(ifd0)
      def ascii(off: Long, count: Long): String = {
        val s = base + off.toInt
        val c = math.min(count, (end - s).toLong).toInt
        if (c <= 0) return null
        val raw = new String(b, s, c, "ISO-8859-1")
        raw.takeWhile(_ != 0.toChar).trim
      }
      var i = 0
      while (i < n && ifd0 + 2 + (i + 1) * 12 <= end) {
        val e = ifd0 + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        tag match {
          case 0x010f if typ == 2 => make = ascii(u32(e + 8), cnt)
          case 0x0110 if typ == 2 => model = ascii(u32(e + 8), cnt)
          // inline SHORT sits in the FIRST two bytes of the value field
          case 0x0112 if typ == 3 && cnt == 1 => orientation = u16(e + 8)
          case 0x0132 if typ == 2 => datetime = ascii(u32(e + 8), cnt)
          case 0x8825 => hasGps = true
          case _ => ()
        }
        i += 1
      }
    }
    /** XMP APP1 payload (after the namespace header): CreatorTool and
      * an exif:GPS* presence flag — the XMP side of the PII surface
      * [[Multimodal.exifStrip]] must scrub. UTF-8 per XMP Part 1. */
    private def parseXmp(from: Int, end: Int): Unit = {
      if (from >= end) return
      sawXmp = true
      val xml = new String(b, from, end - from,
        java.nio.charset.StandardCharsets.UTF_8)
      val m = XmpToolRe.matcher(xml)
      if (m.find()) xmpTool = m.group(1)
      xmpGps = XmpGpsRe.matcher(xml).find()
    }
  }

  /** `xmp:CreatorTool` attribute and `exif:GPS*` property patterns
    * shared by the [[JpegWalk]] parse and the [[exifStrip]] scrub. */
  private val XmpToolRe = java.util.regex.Pattern.compile(
    "xmp:CreatorTool\\s*=\\s*\"([^\"]*)\"")
  private val XmpGpsAttrRe = java.util.regex.Pattern.compile(
    "exif:GPS[A-Za-z]*\\s*=\\s*(?:\"[^\"]*\"|'[^']*')")
  private val XmpGpsElemRe = java.util.regex.Pattern.compile(
    "(?s)<exif:GPS[A-Za-z]*[^>]*>.*?</exif:GPS[A-Za-z]*>")
  private val XmpGpsRe = java.util.regex.Pattern.compile("exif:GPS")

  // ------------------------------------------------- EXIF GPS redaction

  /** Bytes-per-element of a TIFF field type (TIFF 6.0 §2; unknown
    * types read as 1 so bounds stay conservative). */
  private def tiffTypeSize(typ: Int): Int = typ match {
    case 3 | 8 => 2
    case 4 | 9 | 11 => 4
    case 5 | 10 | 12 => 8
    case _ => 1
  }

  /** Redact embedded GPS from one JPEG's bytes — the multimodal
    * counterpart of the text PII redact (embedded coordinates are PII
    * a training corpus must strip, not just flag).
    *
    * `scope = "gps"` (surgical, in place — file length unchanged):
    * zero every out-of-line GPS value span, zero the GPS IFD table,
    * then remove the GPSInfo pointer entry (0x8825) from IFD0 by
    * shifting the later entries + next-IFD pointer up one slot and
    * decrementing the count (the vacated 12 bytes zero). Because
    * nothing else moves, every other absolute TIFF offset stays valid
    * on ARBITRARY real-world layouts — the reason this is a redaction
    * in place and not a rebuild (a splice would have to relocate every
    * out-of-line value of every tag, known or not). IFD0 scope: the
    * GPSInfo pointer lives in IFD0 per EXIF 2.3 §4.6.2.
    *
    * GPS also lives OUTSIDE the TIFF block: XMP packets (the second
    * APP1 form) carry `exif:GPSLatitude`-family properties as XML.
    * The gps scope space-blanks every `exif:GPS*` attribute and
    * element span inside the XMP packet IN PLACE (whitespace is legal
    * XML between attributes, so the packet stays well-formed, other
    * properties survive, and the file length is unchanged — same
    * surgical contract as the IFD scrub).
    *
    * `scope = "app1"` — drop every APP1 metadata segment, Exif AND
    * XMP (marker stream spliced, JPEG otherwise byte-identical):
    * maximal privacy, loses Make/Model/DateTime provenance too; the
    * caller's choice.
    *
    * Malformed structures return the input unchanged (containment —
    * the [[JpegWalk]] posture); non-JPEG bytes pass through. */
  private[graft] def stripOne(b0: Array[Byte], scope: String): Array[Byte] = {
    var b = b0
    def u8(o: Int): Int = b(o) & 0xff
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return b
    var off = 2
    while (off + 4 <= b.length) {
      if (u8(off) != 0xff) return b
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else if (m == 0xd9 || m == 0xda) return b
      else {
        val len = (u8(off + 2) << 8) | u8(off + 3)
        if (len < 2 || off + 2 + len > b.length) return b
        val p = off + 4
        val isExif = m == 0xe1 && len >= 8 &&
          new String(b, p, 4, "ISO-8859-1") == "Exif"
        val isXmp = m == 0xe1 && len - 2 >= XmpNs.length &&
          new String(b, p, XmpNs.length, "ISO-8859-1") == XmpNs
        if ((isExif || isXmp) && scope == "app1") {
          val out = new Array[Byte](b.length - (2 + len))
          System.arraycopy(b, 0, out, 0, off)
          System.arraycopy(b, off + 2 + len, out, off,
            b.length - (off + 2 + len))
          b = out // the next segment now sits at off — don't advance
        } else {
          if (isExif) b = redactGpsInPlace(b, p + 6, off + 2 + len)
          else if (isXmp) b = scrubXmpGps(b, p + XmpNs.length,
            off + 2 + len)
          off += 2 + len
        }
      }
    }
    b
  }

  /** The XMP arm of the `gps` scope: space-blank every `exif:GPS*`
    * attribute (`exif:GPSLatitude="…"`) and element
    * (`<exif:GPSLatitude>…</exif:GPSLatitude>`) span inside one XMP
    * packet. ISO-8859-1 maps bytes to chars 1:1, so regex character
    * offsets ARE byte offsets even around multi-byte UTF-8 content.
    * Returns the input array when nothing matches. */
  private def scrubXmpGps(orig: Array[Byte], from: Int,
      end: Int): Array[Byte] = {
    if (from >= end || end > orig.length) return orig
    val xml = new String(orig, from, end - from, "ISO-8859-1")
    var spans = List.empty[(Int, Int)]
    val ma = XmpGpsAttrRe.matcher(xml)
    while (ma.find()) spans ::= ((ma.start, ma.end))
    val me = XmpGpsElemRe.matcher(xml)
    while (me.find()) spans ::= ((me.start, me.end))
    if (spans.isEmpty) return orig
    val b = orig.clone()
    for ((s0, e0) <- spans; i <- s0 until e0) b(from + i) = ' '
    b
  }

  /** The `scope = "gps"` arm of [[stripOne]]: returns a redacted COPY
    * when a GPSInfo entry exists in IFD0, the input array otherwise. */
  private def redactGpsInPlace(orig: Array[Byte], base: Int,
      end: Int): Array[Byte] = {
    val b = orig.clone()
    def u8(o: Int): Int = b(o) & 0xff
    if (base + 8 > end) return orig
    val little = u8(base) == 'I' && u8(base + 1) == 'I'
    if (!little && !(u8(base) == 'M' && u8(base + 1) == 'M')) return orig
    def u16(o: Int): Int =
      if (little) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (little) u16(o).toLong | (u16(o + 2).toLong << 16)
      else (u16(o).toLong << 16) | u16(o + 2).toLong
    def putU16(o: Int, v: Int): Unit = {
      if (little) { b(o) = (v & 0xff).toByte; b(o + 1) = (v >> 8).toByte }
      else { b(o) = (v >> 8).toByte; b(o + 1) = (v & 0xff).toByte }
    }
    def zero(from: Int, until: Int): Unit = {
      var i = math.max(from, base)
      val stop = math.min(until, end)
      while (i < stop) { b(i) = 0; i += 1 }
    }
    if (u16(base + 2) != 42) return orig
    val ifd0 = base + u32(base + 4).toInt
    if (ifd0 < base || ifd0 + 2 > end) return orig
    val n = u16(ifd0)
    val lastEnd = ifd0 + 2 + n * 12 + 4 // entries + next-IFD pointer
    if (lastEnd > end) return orig
    var i = 0
    while (i < n) {
      val e = ifd0 + 2 + i * 12
      if (u16(e) == 0x8825) {
        // 1) destroy the GPS IFD's out-of-line values and its table
        val g0 = base + u32(e + 8).toInt
        if (g0 >= base && g0 + 2 <= end) {
          val g = u16(g0)
          val gEnd = g0 + 2 + g * 12 + 4
          if (gEnd <= end) {
            var j = 0
            while (j < g) {
              val ge = g0 + 2 + j * 12
              val span = tiffTypeSize(u16(ge + 2)) * u32(ge + 4)
              if (span > 4) {
                val v = base + u32(ge + 8).toInt
                zero(v, v + math.min(span, Int.MaxValue.toLong).toInt)
              }
              j += 1
            }
            zero(g0, gEnd)
          }
        }
        // 2) remove the pointer entry: shift the rest up one slot
        System.arraycopy(b, e + 12, b, e, lastEnd - (e + 12))
        zero(lastEnd - 12, lastEnd)
        putU16(ifd0, n - 1)
        return b
      }
      i += 1
    }
    orig // no GPS entry: nothing to redact
  }

  /** [[stripOne]] over a media table: same columns, the `bytes` column
    * rewritten. `scope = "gps"` (default) redacts the GPS IFD in
    * place; `scope = "app1"` splices the whole Exif segment out.
    * Map-only `mapPartitions`, no shuffle — the [[exifMeta]] posture:
    * a 100 TB redaction pass is scan → per-row byte surgery → sink. */
  def exifStrip(media: DataFrame, scope: String = "gps"): DataFrame = {
    require(scope == "gps" || scope == "app1",
      s"scope must be gps|app1, got $scope")
    val schema = media.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val byIdx = schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        if (r.isNullAt(byIdx)) r
        else {
          val vals = r.toSeq.toArray
          vals(byIdx) =
            try stripOne(r.getAs[Array[Byte]](byIdx), scope)
            catch { case scala.util.control.NonFatal(_) =>
              r.getAs[Array[Byte]](byIdx) }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc).toDF()
  }
}
