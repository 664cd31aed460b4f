package graft

import graft.core.ColumnMap
import graft.operators.Photometry._
import graft.sources.EnsembleIO
import org.apache.spark.sql.functions._

/** HiPSCat-style hive-dir ingestion, local dataset registry, merge. */
class IOSpec extends SparkSuite {

  def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_io").toString

  test("fromHipscat: hive-partitioned catalogs with object-source alignment") {
    val dir = tmp()
    val ev = SparkEntry.eventsSource(spark, sf0001)
    // fabricate a HiPSCat-ish layout: partition dirs Npix=<k>
    val objCat = ev.select(col("user_id").as("obj_idx")).distinct()
      .withColumn("Npix", pmod(col("obj_idx"), lit(4)))
      .withColumn("nobs_precomputed", lit(1L))
    val srcCat = ev.withColumnRenamed("user_id", "src_obj_idx")
      .withColumn("Npix", pmod(col("src_obj_idx"), lit(4)))
    objCat.write.partitionBy("Npix").parquet(s"$dir/object")
    srcCat.write.partitionBy("Npix").parquet(s"$dir/source")

    val ens = EnsembleIO.fromHipscat(spark, s"$dir/object", s"$dir/source",
      ColumnMap.events, objectIndexCol = "obj_idx",
      sourceIndexCol = "src_obj_idx")
    assert(ens.source.count() === ev.count())
    assert(ens.objectFrame.count() ===
      ev.select("user_id").distinct().count())
    // partition column came through as a normal column
    assert(ens.source.columns.contains("Npix"))
    // id column renamed to the ColumnMap id
    assert(ens.source.columns.contains("user_id"))
  }

  test("fromDataset: local registry round-trip + availableDatasets") {
    val dir = tmp()
    val reg = s"$dir/registry.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(reg),
      s"""{"events_tiny": {"source": "$sf0001/events.parquet"},
         | "other": {"source": "/nonexistent.parquet"}}""".stripMargin)
    assert(EnsembleIO.availableDatasets(reg).toSet ===
      Set("events_tiny", "other"))
    val ens = EnsembleIO.fromDataset(spark,
      reg, "events_tiny", ColumnMap.events.copy(time = "ts", err = "props"))
    assert(ens.source.count() > 0)
    intercept[IllegalArgumentException] {
      EnsembleIO.fromDataset(spark, reg, "missing", ColumnMap.events)
    }
  }

  test("bucketed save/load: object-source join plans without a shuffle") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.calcNobs(byBand = false, temporary = false)
    EnsembleIO.saveEnsembleBucketed(ens, "bucketed_spec", nBuckets = 8)
    val back = EnsembleIO.fromBucketedTables(spark, "bucketed_spec",
      ColumnMap.events)
    assert(back.source.count() === ens.source.count())
    // the id-equi join of the two bucketed tables needs NO shuffle
    // exchange (a broadcast of the tiny object side would also be fine,
    // but force the sort-merge path to prove the bucket layout is used)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = back.source.join(back.objectFrame, "user_id")
      assert(joined.count() === ens.source.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      // per-id aggregation over the bucketed source: also shuffle-free
      val agg = back.source.groupBy("user_id").count()
      agg.count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$aggPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("merge: suffixes clashing columns, marks table dirty") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val perUser = ens.source.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("value"))
    ens.merge(perUser, on = Seq("user_id"), how = "inner")
    assert(ens.isDirty("source"))
    val cols = ens.rawFrame("source").columns.toSeq
    assert(cols.contains("n_events"))
    assert(cols.contains("value") && cols.contains("value_right"))
  }

  test("httpResponseMeta: status/reason/media-type/charset/body lift " +
      "out of wire payloads; folded case, quoted charset, LF-only, " +
      "chunked-raw and non-HTTP boundaries") {
    import spark.implicits._
    import graft.sources.Warc
    def one(p: String) = Warc.httpResponseMeta(
      Seq((1L, p)).toDF("id", "payload")).head()
    val full = one("HTTP/1.1 200 OK\r\nserver: x\r\n" +
      "CONTENT-TYPE: Text/HTML; charset=\"ISO-8859-1\"\r\n" +
      "Content-Length: 11\r\n\r\n<p>body</p>")
    assert(full.getAs[Boolean]("is_http"))
    assert(full.getAs[Int]("status") === 200)
    assert(full.getAs[String]("reason") === "OK")
    assert(full.getAs[String]("content_type") === "text/html")
    assert(full.getAs[String]("charset") === "iso-8859-1")
    assert(full.getAs[Long]("content_length_hdr") === 11L)
    assert(full.getAs[String]("http_body") === "<p>body</p>")
    // bare-LF separators (sloppy archives) still split header/body
    val lf = one("HTTP/1.0 404 Not Found\nContent-Type: text/plain\n" +
      "\nmissing")
    assert(lf.getAs[Int]("status") === 404 &&
      lf.getAs[String]("http_body") === "missing")
    // no headers at all: status parses, body empty, fields null
    val bare = one("HTTP/1.1 204 No Content\r\n\r\n")
    assert(bare.getAs[Int]("status") === 204 &&
      bare.getAs[String]("http_body") === "" &&
      bare.isNullAt(bare.fieldIndex("content_type")))
    // chunked body returns RAW from the lift; dechunkHttpBodies
    // reassembles it (multi-chunk, extension, trailer, bare-LF)
    val ch = one("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n4\r\nWiki\r\n0\r\n\r\n")
    assert(ch.getAs[Boolean]("chunked"))
    assert(ch.getAs[String]("http_body").startsWith("4\r\nWiki"))
    assert(Warc.dechunkOne("4\r\nWiki\r\n0\r\n\r\n") === Some("Wiki"))
    assert(Warc.dechunkOne("4;x=1\r\nWiki\r\n6\r\npedia!\r\n" +
      "0\r\nX-T: v\r\n\r\n") === Some("Wikipedia!"))
    assert(Warc.dechunkOne("4\nWiki\n0\n\n") === Some("Wiki")) // bare LF
    // sizes count OCTETS: a multi-byte char consumes its UTF-8 bytes
    assert(Warc.dechunkOne("3\r\nüb\r\n0\r\n\r\n") === Some("üb"))
    assert(Warc.dechunkOne("Z\r\nbroken") === None)       // non-hex size
    assert(Warc.dechunkOne("9\r\nshort\r\n0\r\n\r\n") === None) // overrun
    val dc = Warc.dechunkHttpBodies(Warc.httpResponseMeta(Seq(
        (1L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          "4\r\nWiki\r\n0\r\n\r\n"),
        (2L, "HTTP/1.1 200 OK\r\n\r\nplain body"),
        (3L, "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          "Z\r\nbroken")).toDF("id", "payload")))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("http_body"), r.getAs[Boolean]("dechunk_ok"))))
      .toMap
    assert(dc(1L) === (("Wiki", true)))
    assert(dc(2L) === (("plain body", true)))  // non-chunked untouched
    assert(dc(3L) === (("Z\r\nbroken", false))) // raw kept, flag down
    // redirect Location lifts; absent elsewhere
    val mv = one("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://t.example/new\r\n\r\n")
    assert(mv.getAs[String]("location") === "https://t.example/new")
    assert(full.isNullAt(full.fieldIndex("location")))
    // not HTTP: everything nulls, flag false
    val raw = one("just a text document")
    assert(!raw.getAs[Boolean]("is_http") &&
      raw.isNullAt(raw.fieldIndex("status")) &&
      raw.isNullAt(raw.fieldIndex("http_body")))
  }

  test("binary payload lane: non-UTF-8 wire bodies survive as octets " +
      "through BOTH containers and transcode with the DETECTED charset; " +
      "truncated header blocks are distinguishable from empty bodies; " +
      "chunked reassembly runs on bytes BEFORE the decode") {
    import spark.implicits._
    import graft.sources.Warc
    import graft.functions.HttpBytesExpressions
    val w1252 = java.nio.charset.Charset.forName("windows-1252")
    val sjis = java.nio.charset.Charset.forName("Shift_JIS")
    val t1 = "café — désolé ±±" // 0xE9/0x97/0xB1: w1252-mappable
    val t2 = "日本語のテキスト"
    def resp(body: Array[Byte], hdr: String): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$hdr\r\n\r\n")
        .getBytes("US-ASCII") ++ body
    // chunk framing that SPLITS a Shift-JIS char across chunks: only
    // an octet-level dechunk-then-decode order can reassemble it
    def chunk(b: Array[Byte]): Array[Byte] = {
      val cut = 5
      val (a, c) = b.splitAt(cut)
      (f"${a.length}%x\r\n").getBytes("US-ASCII") ++ a ++
        "\r\n".getBytes("US-ASCII") ++
        (f"${c.length}%x\r\n").getBytes("US-ASCII") ++ c ++
        "\r\n0\r\n\r\n".getBytes("US-ASCII")
    }
    val rows = Seq(
      // html5 alias: latin-1 label decodes as windows-1252
      (1L, "https://a/x", resp(t1.getBytes(w1252),
        "Content-Type: text/html; charset=ISO-8859-1")),
      (2L, "https://a/y", resp(t2.getBytes(sjis),
        "Content-Type: text/html; charset=Shift_JIS")),
      // truncated capture: header block never terminates
      (3L, "https://a/z", "HTTP/1.1 200 OK\r\nContent-Type: text/p"
        .getBytes("US-ASCII")),
      (4L, "https://a/w", resp(chunk(t2.getBytes(sjis)),
        "Transfer-Encoding: chunked\r\n" +
          "Content-Type: text/plain; charset=shift_jis")),
      // malformed status line: is_http, but status AND reason null
      (5L, "https://a/v", "HTTP/1.1 XYZ bad\r\n\r\nx"
        .getBytes("US-ASCII")),
      // genuinely empty body: headers terminate, body ''
      (6L, "https://a/u", "HTTP/1.1 204 No Content\r\n\r\n"
        .getBytes("US-ASCII")))
      .toDF("doc_id", "url", "payload")
    val dirPlain = tmp()
    val dirGz = tmp()
    Warc.writeWarc(rows, dirPlain, textCol = "payload").collect()
    Warc.writeWarc(rows, dirGz, textCol = "payload", gzip = true)
      .collect()
    def run(df: org.apache.spark.sql.DataFrame) =
      Warc.decodeHttpBody(Warc.httpResponseMeta(df,
          bytesCol = Some("payload_bytes")))
        .collect().map(r => r.getAs[Long]("record_id") -> r).toMap
    val m = run(Warc.readWarc(spark, dirPlain))
    val g = run(Warc.readWarcGz(spark, dirGz))
    Seq(m, g).foreach { mm =>
      // the transcode reproduces the original text exactly…
      assert(mm(1L).getAs[String]("http_text") === t1)
      assert(mm(2L).getAs[String]("http_text") === t2)
      // …while the legacy UTF-8 column is replacement-charred
      assert(mm(1L).getAs[String]("http_body") !== t1)
      assert(mm(2L).getAs[String]("http_body") !== t2)
      // length_ok now counts the RAW octets (not a re-encode)
      assert(mm(2L).getAs[Boolean]("length_ok"))
      // truncation ≠ emptiness
      assert(mm(3L).getAs[Boolean]("headers_ok") === false)
      assert(mm(3L).isNullAt(mm(3L).fieldIndex("http_body")))
      assert(mm(6L).getAs[Boolean]("headers_ok") === true)
      assert(mm(6L).getAs[String]("http_body") === "")
      assert(mm(6L).getAs[String]("http_text") === "")
      // chunked: octet reassembly across a split multibyte char,
      // THEN the charset decode
      assert(mm(4L).getAs[Boolean]("dechunk_ok"))
      assert(mm(4L).getAs[String]("http_text") === t2)
      // malformed status line: reason is NULL, not ''
      assert(mm(5L).getAs[Boolean]("is_http"))
      assert(mm(5L).isNullAt(mm(5L).fieldIndex("status")))
      assert(mm(5L).isNullAt(mm(5L).fieldIndex("reason")))
    }
    // kernel fallbacks: unknown label → UTF-8; unmappable → U+FFFD
    import org.apache.spark.unsafe.types.UTF8String
    assert(HttpBytesExpressions.decodeCharset(
      "plain".getBytes("UTF-8"), UTF8String.fromString("x-bogus"))
      .toString === "plain")
    assert(HttpBytesExpressions.decodeCharset(
      Array(0x82.toByte), UTF8String.fromString("shift_jis"))
      .toString === "�")
    // header-terminator edge shapes
    assert(HttpBytesExpressions.httpBodyBytes(
      "H: v\r\n\r\n".getBytes("US-ASCII")).length === 0)
    assert(HttpBytesExpressions.httpBodyBytes(
      "H: v\n\n".getBytes("US-ASCII")).length === 0)
    assert(HttpBytesExpressions.httpBodyBytes(
      "H: v\r\n".getBytes("US-ASCII")) === null)
  }

  test("warc: multi-partition round-trip preserves headers and payload " +
      "bytes; null columns degrade cleanly; corrupt length is flagged") {
    import spark.implicits._
    import graft.sources.Warc
    val dir = tmp()
    val docs = Seq(
      (1L, "https://a.example/x", "plain text payload"),
      (2L, "https://b.example/y", "über UTF-8 ✓ payload"), // multi-byte
      (3L, null.asInstanceOf[String], ""),                 // null uri
      (4L, "https://c.example/z", null.asInstanceOf[String])) // null text
      .toDF("doc_id", "url", "text").repartition(3)
    val manifest = Warc.writeWarc(docs, dir).collect()
    assert(manifest.map(_.getLong(1)).sum === 4L)
    val back = Warc.readWarc(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(back.size === 4)
    back.values.foreach { r =>
      assert(r.getString(1) === "response")
      assert(r.getBoolean(6), s"length_ok false for ${r.getLong(0)}")
    }
    // multi-byte payload: Content-Length counts OCTETS, not chars
    assert(back(2L).getLong(3) ===
      "über UTF-8 ✓ payload".getBytes("UTF-8").length.toLong)
    assert(back(2L).getString(4) === "über UTF-8 ✓ payload")
    assert(back(3L).getString(2) === "" && back(3L).getString(4) === "")
    assert(back(4L).getString(4) === "") // null text writes empty payload
    // a record whose Content-Length lies is FLAGGED, not trusted
    val bad = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:9>\r\nWARC-Target-URI: u\r\n" +
      "Content-Length: 999\r\n\r\nshort\r\n\r\n"
    val dir2 = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "part_00000.warc"),
      bad.getBytes("UTF-8"))
    val flagged = Warc.readWarc(spark, dir2).collect()
    assert(flagged.length === 1 && !flagged(0).getBoolean(6))
  }

  test("wet: conversion records carry WARC-Type conversion and a " +
      "WARC-Refers-To pointer; round-trip preserves extracted text") {
    import spark.implicits._
    import graft.sources.Warc
    val dir = tmp()
    val docs = Seq(
      (7L, "https://a.example/p", "extracted text one"),
      (8L, "https://b.example/q", "extracted ü two"))
      .toDF("doc_id", "url", "text")
    Warc.writeWet(docs, dir).collect()
    val back = Warc.readWarc(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(back.size === 2)
    back.values.foreach { r =>
      assert(r.getString(1) === "conversion")
      assert(r.getBoolean(6))
    }
    assert(back(7L).getString(4) === "extracted text one")
    assert(back(8L).getString(4) === "extracted ü two")
    // the refers-to linkage is in the raw header bytes (the 8-column
    // read schema deliberately stays fixed)
    import scala.jdk.CollectionConverters._
    val raw = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.filter(_.toString.endsWith(".warc"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .mkString
    assert(raw.contains("WARC-Refers-To: <urn:graft:7>"))
    assert(raw.contains("WARC-Refers-To: <urn:graft:8>"))
    assert(raw.contains("WARC-Type: conversion"))
  }

  test("warc.gz: per-member gzip round-trip via the Content-Length " +
      "walk byte-matches the uncompressed container; WARC-Date is " +
      "emitted; writes are atomic; truncated members are flagged") {
    import spark.implicits._
    import graft.sources.Warc
    val docs = Seq(
      (1L, "https://a.example/x", "plain text payload"),
      (2L, "https://b.example/y", "über UTF-8 ✓ payload"),
      // payload CONTAINING the record delimiter: the delimiter recipe
      // would split this early — the Content-Length walk must not
      (3L, "https://c.example/z", "evil WARC/1.0\r\n inline bytes"),
      (4L, "https://d.example/w", "")).toDF("doc_id", "url", "text")
      .repartition(2)
    val dirPlain = tmp()
    val dirGz = tmp()
    Warc.writeWarc(docs, dirPlain).collect()
    val manifest = Warc.writeWarc(docs, dirGz, gzip = true).collect()
    assert(manifest.map(_.getLong(1)).sum === 4L)
    // atomic: no dot-tmp residue — only final .warc.gz part files (and
    // Hadoop's ChecksumFileSystem .crc sidecars OF those final names)
    val left = new java.io.File(dirGz).listFiles().map(_.getName).toSeq
      .filterNot(_.endsWith(".crc"))
    assert(left.nonEmpty && left.forall(n =>
      (n.endsWith(".warc.gz") || n.endsWith(".warc.gz.idx")) &&
        !n.startsWith(".")), left)
    val gz = Warc.readWarcGz(spark, dirGz).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(gz.size === 4)
    gz.values.foreach { r =>
      assert(r.getString(1) === "response")
      assert(r.getBoolean(6), s"length_ok false for ${r.getLong(0)}")
      assert(r.getString(7) === Warc.EpochWarcDate)
    }
    // the walk reads delimiter bytes as payload, not a record break
    assert(gz(3L).getString(4) === "evil WARC/1.0\r\n inline bytes")
    // byte-identity to the uncompressed container on every column
    val plain = Warc.readWarc(spark, dirPlain).collect()
      .map(r => r.getLong(0) -> r).toMap
    // (plain reader CAN mis-split doc 3 — that is its documented limit;
    // compare the clean rows only, and the walk-read values for all)
    // (payload_bytes is an Array — compare structurally, not by ref)
    def norm(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    Seq(1L, 2L, 4L).foreach { id =>
      assert(norm(gz(id)) === norm(plain(id)), s"mismatch at $id")
    }
    assert(gz(2L).getLong(3) ===
      "über UTF-8 ✓ payload".getBytes("UTF-8").length.toLong)
    // a truncated member (simulated crash mid-record) flags, not lies:
    // cut the single-member file in the middle of its payload
    val one = Seq((9L, "https://x.example/t",
      "a payload long enough to cut through the middle of"))
      .toDF("doc_id", "url", "text").coalesce(1)
    val dir3 = tmp()
    Warc.writeWarc(one, dir3, gzip = true).collect()
    val f3 = new java.io.File(dir3).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(f3.toPath)
    // re-gzip a truncated DECOMPRESSED stream so the gzip member is
    // valid but the record inside stops before Content-Length is met
    val full = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)).readAllBytes()
    val cutBytes = java.util.Arrays.copyOf(full, full.length - 20)
    val bo = new java.io.ByteArrayOutputStream()
    val go = new java.util.zip.GZIPOutputStream(bo)
    go.write(cutBytes); go.close()
    val dir4 = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir4, "part_00000.warc.gz"),
      bo.toByteArray)
    val dmg = Warc.readWarcGz(spark, dir4).collect()
    assert(dmg.length === 1 && !dmg(0).getBoolean(6))
    assert(dmg(0).getLong(0) === 9L)
  }

  test("warc.gz.idx sidecar: within-file member-range splits read the " +
      "identical row set across multiple real tasks; no sidecar " +
      "degrades to whole-file") {
    import spark.implicits._
    import graft.sources.Warc
    val docs = (0 until 120).map(i =>
        (i.toLong, s"https://h$i.example/p", s"payload body $i " + i))
      .toDF("doc_id", "url", "text").coalesce(1) // ONE 120-member file
    val dir = tmp()
    Warc.writeWarc(docs, dir, gzip = true).collect()
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.endsWith(".crc")).sorted.toSeq
    assert(names === Seq("part_00000.warc.gz", "part_00000.warc.gz.idx"),
      names)
    val whole = Warc.readWarcGz(spark, dir)
    val split = Warc.readWarcGzSplit(spark, dir, tasksPerFile = 5)
    // identical rows either way (payload_bytes compared structurally)
    def norm(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    val a = whole.collect().map(norm).toSet
    val b = split.collect().map(norm).toSet
    assert(a === b && a.size === 120)
    // and the split really fans out: one file, multiple partitions
    assert(split.rdd.getNumPartitions === 5)
    val perTask = split
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .collect().map(_.getInt(0)).groupBy(identity).view.mapValues(_.length)
    assert(perTask.size === 5, s"expected 5 live tasks: $perTask")
    // sidecar removed -> degrades to one whole-file range, same rows
    new java.io.File(dir, "part_00000.warc.gz.idx").delete()
    new java.io.File(dir, ".part_00000.warc.gz.idx.crc").delete()
    val noIdx = Warc.readWarcGzSplit(spark, dir, tasksPerFile = 5)
    assert(noIdx.rdd.getNumPartitions === 1)
    assert(noIdx.collect().map(norm).toSet === a)
  }
}
