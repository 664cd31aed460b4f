package graft

import graft.multimodal.Multimodal
import graft.text.TextAnalysis._
import org.apache.spark.sql.functions._

/** Text-analysis functions on hand-built strings + multimodal stub
  * plumbing. */
class TextMultimodalSpec extends SparkSuite {

  import scala.jdk.CollectionConverters._
  def one(s: String) = spark.createDataFrame(
    Seq(org.apache.spark.sql.Row(s)).asJava,
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType))))

  def eval(s: String, c: org.apache.spark.sql.Column): Any =
    one(s).select(c).collect()(0).get(0)

  test("token counts") {
    assert(eval("hello world  foo", wsTokenCount(col("text"))) === 3)
    assert(eval("", wsTokenCount(col("text"))) === 0)
    assert(eval("   ", wsTokenCount(col("text"))) === 0)
    // don't, it's → [don, ', t] [it, ', s] = 3+3, plus "ok." = 2
    assert(eval("don't it's ok.", bpeTokenCount(col("text"))) === 8)
  }

  test("language id picks the language with most function words") {
    assert(eval("the cat is on the mat and a dog", langId(col("text"))) === "en")
    assert(eval("der Hund ist nicht ein Katze mit", langId(col("text"))) === "de")
    assert(eval("el perro es un gato que y la", langId(col("text"))) === "es")
    assert(eval("zzz qqq www", langId(col("text"))) === "und")
    assert(eval("", langId(col("text"))) === "und")
  }

  test("quality score bounded and ordered sensibly") {
    val good = eval("The quick brown fox jumps over the lazy dog. " * 5,
      qualityScore(col("text"))).asInstanceOf[Double]
    val bad = eval("!!! ??? *** ### $$$ %%%",
      qualityScore(col("text"))).asInstanceOf[Double]
    assert(good > 0.8 && good <= 1.0)
    assert(bad < 0.5)
    assert(good > bad)
  }

  test("repetition signals: duplicate line and n-gram fractions") {
    // lines "x","x","y" → 1 − 2/3; blank lines don't count
    assert(eval("x\nx\n\n  \ny", duplicateLineFraction(col("text")))
      === 1.0 - 2.0 / 3.0)
    assert(eval("x\ny", duplicateLineFraction(col("text"))) === 0.0)
    assert(eval("", duplicateLineFraction(col("text"))) === 0.0)
    // "a b a b": 2-grams [a b, b a, a b] → 1 − 2/3; 3-grams distinct → 0
    assert(eval("a b a b", duplicateNgramFraction(col("text"), 2))
      === 1.0 - 2.0 / 3.0)
    assert(eval("a b a b", duplicateNgramFraction(col("text"), 3)) === 0.0)
    // doubling a text drives the 2-gram fraction toward 1/2 and beyond 0
    val doubled = "the quick brown fox " * 2
    assert(eval(doubled, duplicateNgramFraction(col("text"), 2))
      .asInstanceOf[Double] > 0.4)
    // shorter than n → no grams → 0
    assert(eval("one", duplicateNgramFraction(col("text"), 2)) === 0.0)
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = eval("Hello   World", fingerprintMd5(col("text")))
    val b = eval("hello world", fingerprintMd5(col("text")))
    val c = eval("hello worlds", fingerprintMd5(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("char shingles distinct and of length n") {
    val sh = eval("abcabc", charShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq === Seq("abc", "bca", "cab"))
    assert(eval("ab", charShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("multimodal: decode stub produces histogram + thumbnail") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    // same shape modulo nullability (Catalyst infers its own nullability)
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      === Multimodal.mediaSchema.fields
        .map(f => (f.name, f.dataType.simpleString)).toSeq)
    val feats = Multimodal.decodeStub(media, thumbBytes = 16)
    val row = feats.filter(col("media_id") === 0).collect()(0)
    val hist = row.getSeq[Double](2)
    assert(hist.length === 16)
    assert(math.abs(hist.sum - 1.0) < 1e-9) // normalized
    assert(row.getAs[Array[Byte]](3).length <= 16)
    assert(feats.count() === docs.count())
  }

  test("multimodal: frame sampling explodes rows deterministically") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val frames = Multimodal.frameSampleStub(media, chunk = 32, stride = 4)
    val n0 = media.filter(col("media_id") === 0)
      .select(length(col("bytes"))).collect()(0).getInt(0)
    val expected = (0 until n0 / 32 by 4).size
    assert(frames.filter(col("media_id") === 0).count() === expected)
    frames.collect().foreach(r => assert(r.getAs[Array[Byte]](2).length == 32))
  }

  test("multimodal: size-aware repartition balances byte load") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val parts = Multimodal.repartitionBySize(media, 8)
    assert(parts.rdd.getNumPartitions === 8)
    assert(parts.count() === media.count())
  }

  test("multimodal: REAL png decode recovers exact dims and channel means") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticImages(docs, "doc_id")
    val feats = Multimodal.decodeImages(media).collect()
    assert(feats.length === 20)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2), s"PNG $id failed to decode")
      val w = (id % 64 + 16).toInt; val h = (id % 48 + 16).toInt
      assert(r.getInt(3) === w); assert(r.getInt(4) === h)
      assert(r.getInt(5) === 3)
      val (cr, _, cb) = Multimodal.checkerColors(id)
      val ne = (w * h + (w % 2) * (h % 2)) / 2
      val no = w * h - ne
      val expR = (ne.toLong * cr + no.toLong * ((cr + 8) % 256)).toDouble / (w * h)
      val expB = (ne.toLong * cb + no.toLong * ((cb + 8) % 256)).toDouble / (w * h)
      assert(r.getDouble(6) === expR, s"mean_r of $id")
      assert(r.getDouble(8) === expB, s"mean_b of $id")
    }
  }

  test("multimodal: dHash matches an independent pixel-space replay") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticTexturedImages(docs, "doc_id")
    val got = Multimodal.dhashImages(media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(got.size === 20)
    got.foreach { case (id, (w, h, hash)) =>
      val (ew, eh) = Multimodal.texturedDims(id)
      assert((w, h) === ((ew, eh)))
      // replay the hash straight from the pixel function — no codec
      val sums = Array.ofDim[Long](9, 8); val cnt = Array.ofDim[Long](9, 8)
      for (y <- 0 until eh; x <- 0 until ew) {
        sums(x * 9 / ew)(y * 8 / eh) += Multimodal.texturedPixel(id, x, y)
        cnt(x * 9 / ew)(y * 8 / eh) += 1
      }
      var exp = 0L
      for (j <- 0 until 8; i <- 0 until 8)
        if (sums(i + 1)(j) * cnt(i)(j) > sums(i)(j) * cnt(i + 1)(j))
          exp |= 1L << (j * 8 + i)
      assert(hash === exp, s"dhash of image $id")
    }
  }

  test("multimodal: dHash near-dup pairs — planted corner edits are close, " +
      "brightness shifts are distance 0") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 30)
    // planted near-copies of the first 10: same base image params
    // (id % 1e6) with the 3×3 corner perturbation switched on
    val planted = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val media = Multimodal.syntheticTexturedImages(
      docs.unionByName(planted), "doc_id")
    val hashes = Multimodal.dhashImages(media)
    val pairs = graft.dedup.Dedup.hammingPairs(hashes, "media_id", "dhash",
        maxDist = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue)
      .toMap
    // every planted copy finds its original within distance 3
    (0L until 10L).foreach { id =>
      val d = pairs.get((id, id + 1000000L))
      assert(d.isDefined, s"planted pair $id missing from hammingPairs")
      assert(d.get <= 3)
    }
    // a uniform brightness shift leaves dHash unchanged (hamming 0):
    // regenerate image 3 with all pixels +5 and compare hashes directly
    val base = Multimodal.texturedDims(3L)
    def pngOf(shift: Int): Array[Byte] = {
      val (w, h) = base
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (Multimodal.texturedPixel(3L, x, y) + shift).min(255)
        img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val two = Seq((1L, pngOf(0)), (2L, pngOf(5))).toDF("media_id", "bytes")
    val hs = Multimodal.dhashImages(two).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(hs(1L) === hs(2L), "dHash must be brightness-shift invariant")
  }

  test("multimodal: jpeg decodes too; garbage bytes are flagged not thrown") {
    // JPEG roundtrip (lossy — assert dims/decodability, not pixel values)
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val rows = Seq(
      (1L, "image", bos.toByteArray, ("jpg", 40, 30, 0L)),
      (2L, "image", "not an image".getBytes("UTF-8"), ("txt", 0, 0, 0L)))
    val media = spark.createDataFrame(rows)
      .toDF("media_id", "modality", "bytes", "meta")
    val feats = Multimodal.decodeImages(media)
      .orderBy("media_id").collect()
    assert(feats(0).getBoolean(2) && feats(0).getInt(3) === 40 &&
      feats(0).getInt(4) === 30)
    assert(!feats(1).getBoolean(2) && feats(1).isNullAt(3))
  }

  test("multimodal: REAL wav decode recovers exact rate/frames/RMS/peak") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticAudio(docs, "doc_id")
    // the generated bytes are a real RIFF/WAVE container
    val hdr = media.filter(col("media_id") === 0)
      .select(col("bytes")).collect()(0).getAs[Array[Byte]](0)
    assert(new String(hdr.take(4), "US-ASCII") === "RIFF")
    assert(new String(hdr.slice(8, 12), "US-ASCII") === "WAVE")

    val feats = Multimodal.decodeAudio(media).collect()
    assert(feats.length === 20)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2), s"WAV $id failed to decode")
      val channels = if (id % 3 == 0) 2 else 1
      val frames = Multimodal.squareFrames(id)
      val rate = Multimodal.squareRate(id)
      assert(r.getInt(3) === rate, s"rate of $id")
      assert(r.getInt(4) === channels, s"channels of $id")
      assert(r.getLong(5) === frames.toLong, s"frames of $id")
      assert(r.getDouble(6) === frames * 1000.0 / rate, s"duration of $id")
      // square wave: RMS == peak == amplitude, exactly
      val a0 = Multimodal.squareAmp(id, 0)
      assert(r.getDouble(7) === a0.toDouble, s"rms_0 of $id")
      assert(r.getInt(9) === a0, s"peak_0 of $id")
      if (channels == 2) {
        val a1 = Multimodal.squareAmp(id, 1)
        assert(r.getDouble(8) === a1.toDouble, s"rms_1 of $id")
        assert(r.getInt(10) === a1, s"peak_1 of $id")
      } else {
        assert(r.isNullAt(8) && r.isNullAt(10), s"mono $id has channel-1 stats")
      }
    }
  }

  test("multimodal: non-audio bytes are flagged not thrown by decodeAudio") {
    val rows = Seq(
      (1L, "audio", "definitely not a wav".getBytes("UTF-8"), ("txt", 0, 0, 0L)),
      (2L, "audio", Array.emptyByteArray, ("bin", 0, 0, 0L)))
    val media = spark.createDataFrame(rows)
      .toDF("media_id", "modality", "bytes", "meta")
    val feats = Multimodal.decodeAudio(media).orderBy("media_id").collect()
    feats.foreach { r =>
      assert(!r.getBoolean(2))
      assert(r.isNullAt(3) && r.isNullAt(7))
    }
  }

  test("multimodal: REAL resize produces decodable aspect-kept thumbnails") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 5)
    val thumbs = Multimodal.resizeImages(
      Multimodal.syntheticImages(docs, "doc_id"), maxDim = 20).collect()
    thumbs.foreach { r =>
      val id = r.getLong(0)
      val w = (id % 64 + 16).toInt; val h = (id % 48 + 16).toInt
      assert(math.max(r.getInt(1), r.getInt(2)) === 20)
      // re-decode the emitted PNG and confirm the stored dims are real
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](3)))
      assert(back.getWidth === r.getInt(1) && back.getHeight === r.getInt(2))
      val aspect = w.toDouble / h
      val thumbAspect = r.getInt(1).toDouble / r.getInt(2)
      assert(math.abs(aspect - thumbAspect) < 0.15, s"aspect drift on $id")
    }
  }

  test("multimodal: REAL animated-GIF video decode recovers frames/delay/means exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticVideos(docs, "doc_id")
    // generated bytes are a real GIF89a container
    val hdr = media.filter(col("media_id") === 0)
      .select(col("bytes")).collect()(0).getAs[Array[Byte]](0)
    assert(new String(hdr.take(6), "US-ASCII") === "GIF89a")

    val feats = Multimodal.decodeVideo(media).collect()
    assert(feats.length === 20)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2), s"video $id failed to decode")
      val (w, h) = Multimodal.videoDims(id)
      val nf = Multimodal.videoFrames(id)
      val dCs = Multimodal.videoDelayCs(id)
      assert(r.getInt(3) === w && r.getInt(4) === h, s"dims of $id")
      assert(r.getInt(5) === nf, s"frames of $id")
      assert(r.getDouble(6) === nf * dCs * 10.0, s"duration of $id")
      assert(r.getDouble(7) === nf * 100.0 / (nf.toLong * dCs), s"fps of $id")
      // solid frames on an indexed palette roundtrip losslessly: the
      // across-frame mean is the exact average of the per-frame colors
      val expR = (0 until nf).map(k => Multimodal.frameColor(id, k)._1.toLong)
        .sum.toDouble / nf
      val expG = (0 until nf).map(k => Multimodal.frameColor(id, k)._2.toLong)
        .sum.toDouble / nf
      val expB = (0 until nf).map(k => Multimodal.frameColor(id, k)._3.toLong)
        .sum.toDouble / nf
      assert(r.getDouble(8) === expR, s"mean_r of $id")
      assert(r.getDouble(9) === expG, s"mean_g of $id")
      assert(r.getDouble(10) === expB, s"mean_b of $id")
    }
  }

  test("multimodal: REAL frame sampling emits every stride-th frame as PNG") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 8)
    val media = Multimodal.syntheticVideos(docs, "doc_id")
    val frames = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    val byId = frames.groupBy(_.getLong(0))
    (0L until 8L).foreach { id =>
      val nf = Multimodal.videoFrames(id)
      val expected = (0 until nf by 2).toSeq
      val got = byId(id).map(_.getInt(1)).sorted.toSeq
      assert(got === expected, s"sampled frame numbers of $id")
      byId(id).foreach { fr =>
        val k = fr.getInt(1)
        val (cr, cg, cb) = Multimodal.frameColor(id, k)
        assert(fr.getDouble(4) === cr.toDouble, s"frame mean_r $id/$k")
        // the emitted PNG is a real decodable frame with the same pixels
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(fr.getAs[Array[Byte]](7)))
        val p = back.getRGB(0, 0)
        assert(((p >> 16) & 0xff) === cr && ((p >> 8) & 0xff) === cg &&
          (p & 0xff) === cb, s"frame pixel $id/$k")
      }
    }
    // garbage bytes contribute zero frames, not an exception
    val bad = spark.createDataFrame(Seq(
      (99L, "video", "not a gif".getBytes("UTF-8"), ("txt", 0, 0, 0L))))
      .toDF("media_id", "modality", "bytes", "meta")
    assert(Multimodal.sampleVideoFrames(bad).count() === 0L)
    assert(Multimodal.decodeVideo(bad).collect()(0).getBoolean(2) === false)
  }

  test("multimodal: REAL mp4 container parse recovers the synthetic " +
      "moov tree exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 25)
    val media = Multimodal.syntheticMp4s(docs, "doc_id")
    // generated bytes open with a real ftyp box
    val hdr = media.filter(col("media_id") === 0)
      .select(col("bytes")).collect()(0).getAs[Array[Byte]](0)
    assert(new String(hdr.slice(4, 8), "US-ASCII") === "ftyp")
    assert(hdr.length === 454) // constant box tree by construction
    val feats = Multimodal.mp4Meta(media).collect()
    assert(feats.length === 25)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2), s"mp4 $id failed to parse")
      assert(r.getInt(1) === 454)
      assert(r.getString(3) === "isom")
      assert(r.getLong(4) === Multimodal.mp4Timescale(id))
      val dur = Multimodal.mp4Samples(id) * Multimodal.mp4Delta(id)
      assert(r.getLong(5) === dur)
      assert(r.getDouble(6) ===
        dur.toDouble / Multimodal.mp4Timescale(id))
      assert(r.getInt(7) === 1)
      assert(r.getLong(8) === Multimodal.mp4Width(id))
      assert(r.getLong(9) === Multimodal.mp4Height(id))
      // two stts entries sum back to the sample count
      assert(r.getLong(10) === Multimodal.mp4Samples(id))
      // stsd sample-entry fourcc + btrt average bitrate parse back
      assert(r.getString(11) === Multimodal.mp4Codec(id))
      assert(r.getLong(12) === Multimodal.mp4AvgBitrate(id))
    }
  }

  test("multimodal: mp4 parser handles v1 boxes, largesize and corrupt " +
      "bytes") {
    def u32(vals: Long*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(v => b.putInt((v & 0xffffffffL).toInt))
      b.array()
    }
    def u64(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    // version-1 mvhd: 64-bit creation/modification/duration
    val mvhdV1 = box("mvhd", u32(0x01000000L) ++ u64(0) ++ u64(0) ++
      u32(700L) ++ u64(4200L) ++ new Array[Byte](80))
    // moov wrapped as a LARGESIZE box (size == 1 + u64 real size)
    val inner = mvhdV1
    val moovLarge = u32(1L) ++ "moov".getBytes("ISO-8859-1") ++
      u64(16L + inner.length) ++ inner
    val ftyp = box("ftyp", "mp42".getBytes("ISO-8859-1") ++ u32(0L))
    val wk = new Multimodal.Mp4Walk(ftyp ++ moovLarge)
    wk.walk(0L, (ftyp.length + moovLarge.length).toLong)
    assert(wk.sawMoov && wk.brand === "mp42")
    assert(wk.timescale === 700L && wk.duration === 4200L)
    // corrupt: a box claiming to run past the buffer stops cleanly
    val bad = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L)) ++
      u32(1000L) ++ "moov".getBytes("ISO-8859-1")
    val wk2 = new Multimodal.Mp4Walk(bad)
    wk2.walk(0L, bad.length.toLong)
    assert(!wk2.sawMoov && wk2.brand === "isom")
    // garbage bytes are flagged not thrown by the DataFrame operator
    import spark.implicits._
    val junk = Seq((1L, "video", "not an mp4 at all".getBytes("UTF-8")))
      .toDF("media_id", "modality", "bytes")
    val out = Multimodal.mp4Meta(junk).collect()
    assert(out.length === 1 && !out(0).getBoolean(2))
    assert(out(0).isNullAt(3) && out(0).isNullAt(4))
  }

  test("multimodal: JPEG/EXIF metadata parse recovers the synthetic " +
      "marker stream exactly — both TIFF byte orders, GPS flag, SOF dims") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 25)
    val media = Multimodal.syntheticExifJpegs(docs, "doc_id")
    val feats = Multimodal.exifMeta(media).collect()
    assert(feats.length === 25)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2), s"jpeg $id not recognized")
      // writer structure pinned: closed-form byte count (the XMP
      // APP1 is a constant 353 = 4 marker+length + 29 ns + 320 packet)
      val expBytes = (if (Multimodal.exifHasGps(id)) 156 else 138) +
        Multimodal.exifMake(id).length +
        (if (Multimodal.hasXmp(id)) 353 else 0)
      assert(r.getInt(1) === expBytes, s"n_bytes for id $id")
      assert(r.getInt(3) === Multimodal.jpegWidth(id))
      assert(r.getInt(4) === Multimodal.jpegHeight(id))
      assert(r.getString(5) === Multimodal.exifMake(id))
      assert(r.getString(6) === Multimodal.exifModel(id))
      assert(r.getInt(7) === Multimodal.exifOrientation(id))
      assert(r.getString(8) === Multimodal.exifDateTime(id))
      assert(r.getBoolean(9) === Multimodal.exifHasGps(id))
      // XMP side: CreatorTool + GPS flag on XMP-carrying ids, null
      // columns otherwise
      if (Multimodal.hasXmp(id)) {
        assert(r.getString(10) === Multimodal.xmpTool(id))
        assert(r.getBoolean(11) === Multimodal.xmpHasGpsF(id))
      } else assert(r.isNullAt(10) && r.isNullAt(11))
    }
  }

  test("multimodal: exifStrip gps scope redacts in place (count kept, " +
      "provenance kept, GPS gone); app1 scope splices; real JPEG " +
      "still ImageIO-decodes after both") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticExifJpegs(docs, "doc_id")
    val origBytes = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val gps = Multimodal.exifMeta(Multimodal.exifStrip(media)).collect()
    gps.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === origBytes(id).length, s"id=$id length moved")
      assert(r.getString(5) === Multimodal.exifMake(id))
      assert(r.getString(6) === Multimodal.exifModel(id))
      assert(r.getString(8) === Multimodal.exifDateTime(id))
      assert(!r.getBoolean(9), s"id=$id still has GPS")
      // XMP: CreatorTool survives the scrub, exif:GPS* is gone
      if (Multimodal.hasXmp(id)) {
        assert(r.getString(10) === Multimodal.xmpTool(id), s"id=$id")
        assert(!r.getBoolean(11), s"id=$id still has XMP GPS")
      } else assert(r.isNullAt(10) && r.isNullAt(11))
    }
    // rows with NEITHER GPS form pass through byte-identical; rows
    // with either must not
    val changed = Multimodal.exifStrip(media).collect()
      .map(r => r.getLong(0) ->
        java.util.Arrays.equals(r.getAs[Array[Byte]]("bytes"),
          origBytes(r.getLong(0)))).toMap
    changed.foreach { case (id, same) =>
      assert(same === !(Multimodal.exifHasGps(id) ||
        Multimodal.xmpHasGpsF(id)), s"id=$id")
    }
    val app1 = Multimodal.exifMeta(
      Multimodal.exifStrip(media, "app1")).collect()
    app1.foreach { r =>
      assert(r.getInt(1) === 39)
      assert(r.isNullAt(5) && r.isNullAt(9)) // no TIFF block at all
      assert(r.isNullAt(10) && r.isNullAt(11)) // no XMP packet either
      assert(r.getInt(3) === Multimodal.jpegWidth(r.getLong(0)))
    }
    // element-form XMP GPS (<exif:GPSLatitude>…</exif:GPSLatitude>)
    // scrubs too, in place, with the packet wrapper intact
    val elemXml = "<x:xmpmeta xmlns:x=\"adobe:ns:meta/\">" +
      "<rdf:Description xmp:CreatorTool=\"T9\">" +
      "<exif:GPSLatitude>12,34.00N</exif:GPSLatitude>" +
      "<exif:GPSLongitude>56,7.00E</exif:GPSLongitude>" +
      "</rdf:Description></x:xmpmeta>"
    val pay = (Multimodal.XmpNs + elemXml).getBytes("ISO-8859-1")
    val donor0 = origBytes(1L) // id 1: no XMP, no GPS
    val xmpSeg = Array(0xff.toByte, 0xe1.toByte,
      (((pay.length + 2) >> 8) & 0xff).toByte,
      ((pay.length + 2) & 0xff).toByte) ++ pay
    val withElem = donor0.take(2) ++ xmpSeg ++ donor0.drop(2)
    val scrubbed = Multimodal.stripOne(withElem, "gps")
    assert(scrubbed.length === withElem.length)
    val scrubXml = new String(scrubbed, "ISO-8859-1")
    assert(!scrubXml.contains("exif:GPS"))
    assert(scrubXml.contains("xmp:CreatorTool=\"T9\""))
    assert(scrubXml.contains("</rdf:Description>"))
    // a REAL JPEG (ImageIO-written) with the GPS-bearing APP1 spliced
    // in after SOI: both scopes must leave a decodable image
    val img = new java.awt.image.BufferedImage(31, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.createGraphics().fillRect(0, 0, 31, 17)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val real = bos.toByteArray
    val donor = origBytes(0L) // id 0 carries GPS
    val app1Len = 2 + (((donor(4) & 0xff) << 8) | (donor(5) & 0xff))
    val seg = java.util.Arrays.copyOfRange(donor, 2, 2 + app1Len)
    val withExif = real.take(2) ++ seg ++ real.drop(2)
    def meta(bb: Array[Byte]) = Multimodal.exifMeta(
      Seq((7L, "image", bb)).toDF("media_id", "modality", "bytes"))
      .collect()(0)
    assert(meta(withExif).getBoolean(9)) // GPS visible before redaction
    for (scope <- Seq("gps", "app1")) {
      val out = Multimodal.stripOne(withExif, scope)
      val m = meta(out)
      assert(m.isNullAt(9) || !m.getBoolean(9), scope)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out))
      assert(dec != null && dec.getWidth === 31 && dec.getHeight === 17,
        s"stripped $scope bytes no longer decode")
    }
    // containment: truncated APP1 and non-JPEG bytes pass through
    val trunc = withExif.take(20)
    assert(Multimodal.stripOne(trunc, "gps") eq trunc)
    val junk2 = "never a jpeg".getBytes("UTF-8")
    assert(Multimodal.stripOne(junk2, "app1") eq junk2)
  }

  test("multimodal: PNG chunk walk recovers IHDR from real ImageIO " +
      "bytes; tRNS/color-type alpha; corrupt bytes clean") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 20)
    val media = Multimodal.syntheticImages(docs, "doc_id")
    val feats = Multimodal.pngMeta(media).collect()
    assert(feats.length === 20)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(1), s"png $id not recognized")
      assert(r.getInt(2) === (id % 64 + 16).toInt)
      assert(r.getInt(3) === (id % 48 + 16).toInt)
      assert(r.getInt(4) === 8 && r.getInt(5) === 2) // 8-bit truecolor
      assert(r.getInt(6) === 0)                      // non-interlaced
      // IHDR + ≥1 IDAT + IEND at minimum
      assert(r.getInt(7) >= 3, s"png $id chunk count ${r.getInt(7)}")
      assert(!r.getBoolean(8)) // TYPE_INT_RGB: no alpha
    }
    // hand-built: grayscale-alpha color type 4 -> has_alpha
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def chunk(t: String, d: Array[Byte]) =
      u32(d.length.toLong) ++ t.getBytes("ISO-8859-1") ++ d ++ u32(0L)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = chunk("IHDR", u32(3) ++ u32(2) ++
      Array[Byte](16, 4, 0, 0, 1))
    val ga = sig ++ ihdr ++ chunk("IEND", Array.emptyByteArray)
    val r4 = Multimodal.pngMeta(Seq((9L, "image", ga))
      .toDF("media_id", "modality", "bytes")).collect()(0)
    assert(r4.getBoolean(1) && r4.getInt(2) === 3 && r4.getInt(3) === 2)
    assert(r4.getInt(4) === 16 && r4.getInt(5) === 4 &&
      r4.getInt(6) === 1 && r4.getBoolean(8))
    // truncated chunk list stops cleanly; junk is not a png
    val bad = sig ++ u32(1000L) ++ "IHDR".getBytes("ISO-8859-1")
    val r5 = Multimodal.pngMeta(Seq((10L, "image", bad))
      .toDF("media_id", "modality", "bytes")).collect()(0)
    assert(r5.getBoolean(1) && r5.isNullAt(2))
    val r6 = Multimodal.pngMeta(
      Seq((11L, "image", "nope".getBytes("UTF-8")))
        .toDF("media_id", "modality", "bytes")).collect()(0)
    assert(!r6.getBoolean(1) && r6.isNullAt(2))
  }

  test("multimodal: JPEG walk handles corrupt/truncated/non-exif bytes " +
      "cleanly") {
    import spark.implicits._
    // not a JPEG at all
    val junk = Seq((1L, "image", "plainly not a jpeg".getBytes("UTF-8")))
      .toDF("media_id", "modality", "bytes")
    val r1 = Multimodal.exifMeta(junk).collect()(0)
    assert(!r1.getBoolean(2) && r1.isNullAt(3) && r1.isNullAt(9))
    // SOI + SOF only, no APP1: dims parse, exif fields stay null,
    // has_gps NULL (no TIFF seen — unknown, not false)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sof = Array(0xff.toByte, 0xc0.toByte) ++ be16(13) ++
      Array(8.toByte) ++ be16(99) ++ be16(77) ++
      Array[Byte](1, 1, 0x11, 0)
    val noExif = Array(0xff.toByte, 0xd8.toByte) ++ sof ++
      Array(0xff.toByte, 0xd9.toByte)
    val r2 = Multimodal.exifMeta(Seq((2L, "image", noExif))
      .toDF("media_id", "modality", "bytes")).collect()(0)
    assert(r2.getBoolean(2) && r2.getInt(3) === 77 && r2.getInt(4) === 99)
    assert(r2.isNullAt(5) && r2.isNullAt(7) && r2.isNullAt(9))
    // APP1 whose declared length runs past the buffer: stop clean
    val badApp1 = Array(0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe1.toByte, 0x7f.toByte, 0xff.toByte, 'E', 'x')
      .map(_.toByte)
    val r3 = Multimodal.exifMeta(Seq((3L, "image", badApp1))
      .toDF("media_id", "modality", "bytes")).collect()(0)
    assert(r3.getBoolean(2) && r3.isNullAt(5))
  }

  test("htmlExtract: script/style/comment subtrees drop WITH contents, " +
      "block tags become newlines, entities decode once, density " +
      "signals; null-safe") {
    import spark.implicits._
    import graft.text.HtmlExtract
    val html = "<html><head><style>p { color: red }</style>" +
      "<script>var a = '<p>hidden</p>';\nvar b = 2;</script></head>" +
      "<body><!-- note\nacross lines --><h1>Head</h1>" +
      "<p>one &amp;amp; two &lt;b&gt;</p>" +
      "<div><a href=\"u\">link</a>&nbsp;end</div></body></html>"
    val df = Seq((1L, html), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")
    val out = HtmlExtract.extract(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val text = out(1L).getString(1)
    // dropped subtrees leave no trace — including the decoy tags and
    // code INSIDE the script, and the multi-line comment
    assert(!text.contains("hidden") && !text.contains("color") &&
      !text.contains("note") && !text.contains("var"))
    // entity decode is single-pass (&amp;amp; → &amp;, not &) and the
    // decoded &lt;b&gt; stays literal text (tags were already stripped)
    assert(text === "Head\none &amp; two <b>\nlink end")
    assert(out(1L).getLong(2) > 0)        // n_tags
    assert(out(1L).getLong(3) === 1L)     // n_links
    assert(out(1L).getLong(4) === 1L)     // n_script_blocks
    val density = out(1L).getDouble(5)
    assert(density > 0.0 && density < 1.0)
    assert(out(2L).isNullAt(1))           // null html → null text
  }

  test("htmlToMarkdown: headings, emphasis, links, images, lists, " +
      "fences, quote, hr, entities; boundaries degrade to text") {
    import graft.text.HtmlExtract
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(HtmlExtract.htmlToMarkdown(col("h")))
        .head().getString(0)
    val full = "<html><head><title>T</title><script>var x=1;" +
      "</script></head><body><h1>Doc 3</h1><p>Intro with " +
      "<b>bold</b> and <i>ital</i> &amp; entity.</p><h2>Sec 1</h2>" +
      "<ul><li>alpha 2</li><li><a href=\"/l/0\">link 0</a></li></ul>" +
      "<pre><code>x = 5</code></pre><blockquote>quoted 1" +
      "</blockquote><hr><p><img alt=\"pic 4\" src=\"/i/4.png\"> " +
      "tail</p></body></html>"
    assert(md(full) ===
      "T\n\n# Doc 3\n\nIntro with **bold** and *ital* & entity." +
      "\n\n## Sec 1\n\n- alpha 2\n- [link 0](/l/0)\n\n```\nx = 5\n```" +
      "\n\n> quoted 1\n\n---\n\n![pic 4](/i/4.png) tail")
    // linked image nests; src-before-alt order; src-only empty alt
    assert(md("<a href='/t'><img src=\"i.png\" alt=\"A\"></a>") ===
      "[![A](i.png)](/t)")
    assert(md("<p><img src=\"only.png\"></p>") === "![](only.png)")
    // unquoted href is a documented boundary: renders as plain text
    assert(md("<a href=/u>u text</a>") === "u text")
    // strong/em synonyms; inline code; h3-h6 depth
    assert(md("<strong>s</strong> <em>e</em> <code>c()</code>") ===
      "**s** *e* `c()`")
    assert(md("<h3>three</h3><h6>six</h6>") ===
      "### three\n\n###### six")
    // nested emphasis inside a link converts inside the brackets
    assert(md("<a href=\"/x\">a <b>b</b></a>") === "[a **b**](/x)")
    // null in, null out; markdown specials in prose pass unescaped
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "h")
      .select(HtmlExtract.htmlToMarkdown(col("h"))).head()
    assert(n.isNullAt(0))
    assert(md("<p>a*b_c#d</p>") === "a*b_c#d")
  }

  test("htmlToMarkdown structure: ol numbering, nested list depth, " +
      "multi-paragraph blockquotes, tables to GFM pipes") {
    import graft.text.HtmlExtract
    import spark.implicits._
    def md(h: String): String =
      Seq(h).toDF("h").select(HtmlExtract.htmlToMarkdown(col("h")))
        .head().getString(0)
    // ordered lists number their items; a second list restarts
    assert(md("<ol><li>a</li><li>b</li><li>c</li></ol>" +
      "<ol><li>z</li></ol>") === "1. a\n2. b\n3. c\n\n1. z")
    // nesting indents two spaces per level; ol-in-ul keeps numbering
    assert(md("<ul><li>top<ul><li>s1</li><li>s2</li></ul></li>" +
      "<li>second</li></ul>") ===
      "- top\n  - s1\n  - s2\n- second")
    assert(md("<ul><li>t<ol><li>one</li><li>two</li></ol></li></ul>") ===
      "- t\n  1. one\n  2. two")
    // multi-paragraph quote keeps ONE quote: bare > joins paragraphs
    assert(md("<blockquote><p>first</p><p>second</p></blockquote>") ===
      "> first\n>\n> second")
    // nested quote doubles the marker; the separator stays at the
    // OUTER depth
    assert(md("<blockquote>outer<blockquote>inner</blockquote>" +
      "</blockquote>") === "> outer\n>\n> > inner")
    // a table renders as a GFM pipe table: first row = header, a
    // synthesized delimiter at its width, literal | escapes \|
    assert(md("<table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>1</td><td>x|y</td></tr>" +
      "<tr><td>2</td><td>z</td></tr></table>") ===
      "| A | B |\n| --- | --- |\n| 1 | x\\|y |\n| 2 | z |")
    // inline markup inside cells converts before the table assembles;
    // a <br> inside a cell flows into the same cell
    assert(md("<p>before</p><table><tr><td><b>k</b></td>" +
      "<td>v<br>w</td></tr></table><p>after</p>") ===
      "before\n\n| **k** | v w |\n| --- | --- |\n\nafter")
    // the rendered table round-trips through the pipe-table reader
    import graft.text.Markdown
    val m = md("<table><tr><th>H</th></tr><tr><td>p|q</td></tr>" +
      "</table>")
    val cells = Markdown.markdownTableCells(
        Seq((1L, m)).toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getAs[Int]("row_idx"),
        r.getAs[String]("cell")))
    assert(cells.toSet === Set((0, "H"), (1, "p|q")))
    // forged marker control chars in source text are stripped, never
    // interpreted
    assert(md("<p>a\u0005b\u0007c</p>") === "abc")
  }

  test("paragraph gate: prose keeps, nav/copyright boilerplate drops, " +
      "long token-poor runs keep, dropBoilerplate rejoins kept lines") {
    import graft.text.HtmlExtract
    import spark.implicits._
    val prose = "the cat is on the mat and a dog sat with it today"
    val nav = "Home | About | Contact | Privacy"
    val copy = "Copyright 2024 SiteName"
    val long = "x" * 220
    val text = Seq(prose, nav, "", copy, long).mkString("\n")
    val rows = HtmlExtract.paragraphs(
        Seq((1L, text)).toDF("doc_id", "page_text"), "page_text")
      .collect()
      .map(r => r.getAs[Int]("para_idx") ->
        ((r.getAs[String]("paragraph"), r.getAs[Boolean]("keep"),
          r.getAs[Int]("n_words")))).toMap
    // blank line excluded from indexing
    assert(rows.size === 4)
    assert(rows(0) === ((prose, true, 13)))
    assert(rows(1) === ((nav, false, 7)))     // < 10 words
    assert(rows(2) === ((copy, false, 3)))    // short, stopword-free
    assert(rows(3) === ((long, true, 1)))     // long-run arm
    val cleaned = Seq((1L, text)).toDF("doc_id", "page_text")
      .select(HtmlExtract.dropBoilerplate(col("page_text")))
      .head().getString(0)
    assert(cleaned === prose + "\n" + long)
    // 10 words with no stopwords still drops (ratio arm)
    val nostop = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val r2 = HtmlExtract.paragraphs(
      Seq((1L, nostop)).toDF("doc_id", "page_text"), "page_text")
      .head()
    assert(!r2.getAs[Boolean]("keep") && r2.getAs[Int]("n_words") === 10)
  }

  test("htmlExtract plans as one map-only stage: zero exchanges") {
    import spark.implicits._
    val df = Seq((1L, "<p>x</p>"), (2L, "<div>y</div>"))
      .toDF("doc_id", "html")
    val plan = graft.text.HtmlExtract.extract(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"html extraction must not shuffle:\n${plan.take(400)}")
  }

  test("splitSentences: terminator runs split once, segments trim, " +
      "empties drop, indices are document order; agrees with the " +
      "readability sentence count") {
    import spark.implicits._
    import graft.text.Chunking
    val df = Seq(
      (1L, "First one. Second!! Third?  "),
      (2L, "...only punctuation..."),
      (3L, "no terminator at all"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Chunking.splitSentences(df).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getString(2), r.getInt(3))).toSeq).toMap
    assert(got(1L) === Seq(("First one", 2), ("Second", 1), ("Third", 1)))
    assert(got(2L) === Seq(("only punctuation", 2)))
    assert(got(3L) === Seq(("no terminator at all", 4)))
    assert(!got.contains(4L)) // null text → no rows
    // consistency with the readability sentence definition: doc 1 has
    // 3 terminator runs => 3 sentences by both definitions
    val ns = df.filter(col("doc_id") === 1L)
      .select(graft.text.TextAnalysis.readabilityScores(col("text"))
        .find(_._1 == "n_sentences").get._2).collect()(0).getLong(0)
    assert(ns === 3L)
  }

  test("cleanText: NFC composition, control strip, whitespace collapse, " +
      "idempotence; the NFC expression is real codegen") {
    import spark.implicits._
    import graft.text.TextAnalysis.cleanText
    val df = Seq(
      (1L, "  e\u0301\u0001\tx   y  "), // decomposed accent + C0 + ragged ws
      (2L, "plain ascii"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"), cleanText(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("\u00e9 x y")) // composed é, one-space, trimmed
    assert(out(2L) === Some("plain ascii")) // already clean: unchanged
    assert(out(3L) === Some(""))
    assert(out(4L) === None) // null in, null out
    // idempotent: cleaning clean text is the identity
    val twice = df.filter(col("id") === 1L)
      .select(cleanText(cleanText(col("t")))).collect()(0).getString(0)
    assert(twice === "\u00e9 x y")
    // real doGenCode: over a non-foldable source (a literal-only frame
    // constant-folds to LocalTableScan) the projection compiles into a
    // whole-stage-codegen span — the "*(1)" stage marker — and the
    // generated code evaluates correctly
    val ranged = spark.range(4).select(
      graft.functions.NormalizeExpression.nfcNormalize(
        concat(lit("e\u0301 "), col("id").cast("string"))).as("c"))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(ranged.collect().map(_.getString(0)).toSeq ===
      (0 until 4).map(i => s"\u00e9 $i"))
  }

  test("PII: counts and ordered redaction on crafted strings") {
    import spark.implicits._
    val rows = Seq(
      (1L, "write to alice.b+tag@sub.example.org today"),
      (2L, "call +44 (0)20 7946-0958 now"),
      (3L, "server at 192.168.0.1 responded"),
      (4L, "alice@ex.com and bob@ex.com, from 10.0.0.2 dial +1 555 010 99"),
      (5L, "no personal data in this sentence at all")
    ).toDF("doc_id", "text")
    val counts = piiCounts(col("text")).map { case (n, c) => c.as(n) }
    val got = rows.select(col("doc_id") +: counts :+
        redactPii(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L)._1 === 1 && got(1L)._2 === 0 && got(1L)._3 === 0)
    assert(got(2L)._2 === 1)
    assert(got(3L)._3 === 1)
    assert(got(4L) === ((2, 1, 1,
      "<PII> and <PII>, from <PII> dial <PII>")))
    assert(got(5L) === ((0, 0, 0,
      "no personal data in this sentence at all")))
    // redaction is idempotent: a redacted text has no remaining matches
    val re = rows.select(redactPii(col("text")).as("t"))
    val again = re.select(piiCounts(col("t"))
        .map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(again.forall(r => r.getLong(0) + r.getLong(1) + r.getLong(2) == 0))
  }

  // ------------------------------------------ TextAnalysis mojibake

  test("mojibake: repair inverts the cp1252 round trip; clean text " +
      "passes byte-identical; repair is idempotent") {
    import spark.implicits._
    import graft.text.TextAnalysis
    // build the damaged form OF a clean string exactly the way the web
    // damages it: UTF-8 bytes re-decoded as cp1252
    val clean = "café — “quoted” ño… 15°"
    def damage(s: String): String =
      TextAnalysis.MojibakePairs.foldLeft(s) { case (acc, (from, to)) =>
        if (to == " ") acc else acc.replace(to, from)
      }
    val broken = damage(clean)
    assert(broken != clean)
    val df = Seq((1L, broken), (2L, clean), (3L, "plain ascii, 100%"))
      .toDF("id", "t")
    val out = df.select(col("id"),
        TextAnalysis.repairMojibake(col("t")).as("r"),
        TextAnalysis.mojibakeCount(col("t")).as("nb"),
        TextAnalysis.mojibakeCount(
          TextAnalysis.repairMojibake(col("t"))).as("na"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 === clean)
    assert(out(1L)._2 > 0 && out(1L)._3 === 0L)
    assert(out(2L)._1 === clean && out(2L)._2 === 0L)
    assert(out(3L)._1 === "plain ascii, 100%")
    // idempotency: repairing repaired text changes nothing
    val twice = df.select(TextAnalysis.repairMojibake(
        TextAnalysis.repairMojibake(col("t"))).as("r2"))
      .collect().map(_.getString(0)).toSet
    assert(twice === out.values.map(_._1).toSet)
    // the NBSP artifact repairs to a PLAIN space
    val nbspArt = TextAnalysis.MojibakePairs.find(_._2 == " ").get._1
    val sp = Seq(Tuple1(s"a${nbspArt}b")).toDF("t")
      .select(TextAnalysis.repairMojibake(col("t"))).head().getString(0)
    assert(sp === "a b")
  }
}
