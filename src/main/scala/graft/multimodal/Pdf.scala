package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF container plumbing for document corpora.
  *
  * A meaningful share of the high-quality text on the web (papers,
  * manuals, reports, books) ships as PDF, and every large-scale corpus
  * build has a PDF lane next to the HTML one. This module follows the
  * repo's zero-new-deps multimodal posture (the PNG chunk walk / JPEG
  * marker walk / mp4 box walk in [[Multimodal]]): build REAL bytes of
  * the format with a deterministic writer, then parse them back with an
  * independent structural walk — the Spark-side plumbing (schema,
  * mapPartitions batching, poisoned-row containment) is exactly what a
  * production lane with a full-featured PDF library would use.
  *
  * Scope boundary (documented, like the codec-pixel stub): the TEXT
  * extractor understands UNCOMPRESSED and FlateDecode content streams
  * (the JDK's zlib — real crawled PDFs are near-universally
  * Flate-compressed) — literal-string `Tj` / `TJ` show operators with
  * the standard escapes (octal `\ddd`, `\n\r\t\b\f`, backslash-EOL
  * continuation, balanced parentheses; ISO 32000-1 §7.3.4.2, §9.4.3).
  * The STRUCTURAL layer covers both generations: classic xref tables
  * AND the PDF 1.5+ machinery — `/ObjStm` object streams (inflated
  * and scanned for the page objects real modern files compress away)
  * and binary `/XRef` cross-reference streams (`/W`-field decode,
  * `/Index` ranges, type-1 offset + type-2 objstm-index validation).
  * Other filters (DCTDecode, LZW, …), font subsetting/CMaps and layout
  * reconstruction are what the real dependency buys — a stream behind
  * an unsupported filter flips `streams_ok` and contributes no text.
  *
  * Scale: writer and parser are one-pass `mapPartitions` over the
  * bytes already in the row — map-only, no shuffle, no driver collect;
  * a 100 TB PDF lane is embarrassingly parallel scan → parse → text.
  */
object Pdf {

  // ------------------------------------------------------------ fixtures

  private[graft] def nPdfPages(id: Long): Int = (id % 3 + 1).toInt

  private[graft] def pdfVersion(id: Long): String =
    if (id % 5 == 0) "1.5" else "1.4"

  /** Page k's text — parens and a backslash planted so every escape
    * path in writer and parser is exercised on every row. */
  private[graft] def pdfPageText(id: Long, k: Int): String =
    s"Doc $id pg $k (x=${id % 9}) a\\b"

  /** The incremental-update arm's replacement text for page 0. */
  private[graft] def pdfUpdateText(id: Long): String =
    s"Doc $id pg 0 rev2 (x=${id % 9}) a\\b"

  /** Escape a literal string for a PDF `(…)` token (§7.3.4.2). */
  private def escLit(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** zlib-deflate (JDK Deflater, default level — deterministic for a
    * given input) for the FlateDecode writer arm. */
  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** zlib-inflate with a decompression-bomb cap: a crawled PDF must
    * never be able to allocate unbounded memory in an executor, so
    * expansion stops (and the stream counts as damaged) past `maxOut`
    * bytes. Truncated/garbage zlib throws `DataFormatException` —
    * callers contain it per-stream. */
  private[graft] def inflate(data: Array[Byte],
      maxOut: Int = 1 << 24): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(
      math.min(data.length * 4 + 64, 1 << 16))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0) {
        if (inf.needsInput() || inf.needsDictionary()) {
          inf.end()
          throw new java.util.zip.DataFormatException(
            "truncated or preset-dictionary zlib stream")
        }
      } else {
        out.write(buf, 0, n)
        if (out.size() > maxOut) {
          inf.end()
          throw new java.util.zip.DataFormatException(
            "inflate output exceeds cap")
        }
      }
    }
    inf.end()
    out.toByteArray
  }

  /** PDF LZWDecode (ISO 32000-1 §7.4.4, EarlyChange=1 — the default):
    * MSB-first variable-width codes 9→12 bits, 256=Clear, 257=EOD,
    * width grows ONE CODE EARLY (at table sizes 511/1023/2047). The
    * pre-Flate filter old documents (and TIFF-derived tooling) still
    * carry; zero-deps decode is ~50 lines. Throws on malformed code
    * sequences — callers contain per-stream like [[inflate]]. */
  private[graft] def lzwDecode(data: Array[Byte],
      maxOut: Int = 1 << 24): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val table = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def reset(): Unit = {
      table.clear()
      (0 until 256).foreach(i => table += Array(i.toByte))
      table += Array.emptyByteArray // 256 Clear
      table += Array.emptyByteArray // 257 EOD
    }
    reset()
    var width = 9
    var acc = 0L
    var nbits = 0
    var prev: Array[Byte] = null
    var i = 0
    while (i < data.length || nbits >= width) {
      if (nbits < width) {
        acc = (acc << 8) | (data(i) & 0xff); nbits += 8; i += 1
      } else {
        val code = ((acc >> (nbits - width)) & ((1L << width) - 1)).toInt
        nbits -= width
        if (code == 257) return out.toByteArray // EOD
        else if (code == 256) { reset(); width = 9; prev = null }
        else {
          val entry =
            if (code < table.length) table(code)
            else if (code == table.length && prev != null)
              prev :+ prev(0) // the KwKwK case
            else throw new java.util.zip.DataFormatException(
              s"LZW code $code out of range")
          out.write(entry, 0, entry.length)
          if (out.size() > maxOut)
            throw new java.util.zip.DataFormatException(
              "LZW output exceeds cap")
          if (prev != null) table += (prev :+ entry(0))
          prev = entry
          // EarlyChange=1 + the decoder's one-entry lag behind the
          // encoder (the first post-Clear code adds nothing): grow
          // when the encoder — one entry ahead — is about to
          if (table.length >= (1 << width) - 2 && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  /** LZW encoder twin (EarlyChange=1) — the writer arm that gives the
    * decoder real compressed bytes to chew on. Emits Clear first and
    * EOD last, per §7.4.4. */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    var acc = 0L
    var nbits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    val dict = new java.util.HashMap[String, Int]()
    def reset(): Unit = {
      dict.clear()
      (0 until 256).foreach(i =>
        dict.put(new String(Array(i.toChar)), i))
    }
    reset()
    var next = 258
    emit(256) // Clear
    var w = ""
    for (b <- data) {
      val c = (b & 0xff).toChar.toString
      val wc = w + c
      if (dict.containsKey(wc)) w = wc
      else {
        emit(dict.get(w))
        dict.put(wc, next); next += 1
        // encoder grows width one code early too (mirror the decoder)
        if (next >= (1 << width) - 1 && width < 12) width += 1
        if (next > 4095) { emit(256); reset(); next = 258; width = 9 }
        w = c
      }
    }
    if (w.nonEmpty) emit(dict.get(w))
    emit(257) // EOD
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Hex-string form of a show operand (§7.3.4.3): UTF-8 bytes as hex
    * pairs inside `<…>`. */
  private def hexStr(s: String): String =
    "<" + s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map("%02X".format(_)).mkString + ">"

  /** Page k's show operator: even pages a single `Tj`, odd pages the
    * two-element kerned `TJ` every real PDF uses; `hex = true` writes
    * hex-string operands (`<…> Tj`) instead of literals — the form
    * identity-encoded fonts emit. */
  private def showOp(text: String, k: Int, hex: Boolean): String =
    if (k % 2 == 0) {
      if (hex) s"${hexStr(text)} Tj" else s"(${escLit(text)}) Tj"
    } else {
      val mid = text.length / 2
      val (a, b) = (text.substring(0, mid), text.substring(mid))
      if (hex) s"[${hexStr(a)} -250 ${hexStr(b)}] TJ"
      else s"[(${escLit(a)}) -250 (${escLit(b)})] TJ"
    }

  /** Build a complete single-xref PDF: catalog → page tree → one page
    * object + one uncompressed content stream per page (even pages use
    * `Tj`, odd pages split the text into a two-element `TJ` array — the
    * kerning form every real PDF uses) → shared Type1 font; then the
    * xref table with byte-exact offsets and the trailer. Returns the
    * file bytes (text encoded UTF-8 inside the literals). With
    * `flate = true`, every content stream is zlib-compressed behind
    * `/Filter /FlateDecode` — the form real crawled PDFs take — with
    * `/Length` counting the COMPRESSED bytes and the xref offsets
    * recomputed over the binary layout. With `modern = true`, the
    * PDF 1.5+ layout ([[buildPdfModern]]): non-stream objects inside
    * a compressed /ObjStm, a binary /XRef cross-reference STREAM
    * instead of the table, no `trailer` keyword. */
  private[graft] def buildPdf(pages: Seq[String],
      version: String = "1.4", flate: Boolean = false,
      modern: Boolean = false, hex: Boolean = false,
      lzw: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    if (modern) return buildPdfModern(pages, version, flate, hex)
    val n = pages.size
    val fontObj = 3 + 2 * n
    val out = new java.io.ByteArrayOutputStream(1024)
    def wr(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val offsets = new Array[Long](fontObj + 1) // index = object number
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size().toLong
      wr(s"$num 0 obj\n$body\nendobj\n")
    }
    wr(s"%PDF-$version\n")
    val kids = (0 until n).map(k => s"${3 + 2 * k} 0 R").mkString(" ")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [$kids] /Count $n >>")
    pages.zipWithIndex.foreach { case (text, k) =>
      val pageNum = 3 + 2 * k
      obj(pageNum, s"<< /Type /Page /Parent 2 0 R /Resources " +
        s"<< /Font << /F1 $fontObj 0 R >> >> " +
        s"/MediaBox [0 0 612 792] /Contents ${pageNum + 1} 0 R >>")
      val content = s"BT /F1 12 Tf 72 720 Td ${showOp(text, k, hex)} ET"
      val cbytes = content
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (lzw || flate) {
        val (data, filter) =
          if (lzw) (lzwEncode(cbytes), "/LZWDecode")
          else (deflate(cbytes), "/FlateDecode")
        offsets(pageNum + 1) = out.size().toLong
        wr(s"${pageNum + 1} 0 obj\n<< /Length ${data.length} " +
          s"/Filter $filter >>\nstream\n")
        out.write(data, 0, data.length)
        wr("\nendstream\nendobj\n")
      } else {
        obj(pageNum + 1,
          s"<< /Length ${cbytes.length} >>\nstream\n$content\nendstream")
      }
    }
    obj(fontObj,
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val xrefAt = out.size().toLong
    wr(s"xref\n0 ${fontObj + 1}\n")
    wr("0000000000 65535 f \n")
    (1 to fontObj).foreach(i => wr(f"${offsets(i)}%010d 00000 n \n"))
    wr(s"trailer\n<< /Size ${fontObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Incrementally-updated document (§7.5.6): the base file's bytes
    * UNTOUCHED, then an appended revision — a replacement content
    * stream for page 0 (object 4), a one-subsection xref table
    * covering just that object, and a trailer whose `/Prev` points at
    * the base xref — exactly how real editors save. A parser that only
    * walks the LAST startxref sees the update but never validates the
    * base table; [[pdfMeta]] walks the whole `/Prev` chain and reports
    * its length in `n_xrefs`. */
  private[graft] def buildPdfUpdated(pages: Seq[String],
      version: String = "1.4", flate: Boolean = false,
      hex: Boolean = false, lzw: Boolean = false,
      updateText: String): Array[Byte] = {
    val base = buildPdf(pages, version, flate, modern = false, hex, lzw)
    val s = new String(base, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sx = s.lastIndexOf("startxref")
    val prevAt = s.substring(sx + "startxref".length).trim
      .takeWhile(_.isDigit)
    val out = new java.io.ByteArrayOutputStream(base.length + 256)
    out.write(base, 0, base.length)
    def wr(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val objAt = out.size().toLong
    val content =
      s"BT /F1 12 Tf 72 720 Td (${escLit(updateText)}) Tj ET"
    val cbytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    wr(s"4 0 obj\n<< /Length ${cbytes.length} >>\nstream\n" +
      s"$content\nendstream\nendobj\n")
    val xrefAt = out.size().toLong
    val size = 3 + 2 * pages.size + 1 // unchanged: object 4 replaced
    wr("xref\n4 1\n")
    wr(f"$objAt%010d 00000 n \n")
    wr(s"trailer\n<< /Size $size /Root 1 0 R /Prev $prevAt >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The PDF 1.5+ layout of [[buildPdf]] — what real modern PDFs ship:
    * every NON-stream object (catalog, page tree, page dicts, font)
    * lives compressed inside one `/ObjStm` object stream (§7.5.7 —
    * streams themselves may not, so content streams stay regular
    * objects, plain or Flate per `flate`), and the cross-reference is
    * a binary `/XRef` STREAM (§7.5.8; `/W [1 2 2]` big-endian fields,
    * type-1 rows for regular objects, type-2 rows pointing into the
    * ObjStm by index, Flate-compressed, `/Root` carried in its dict —
    * no `trailer` keyword anywhere). Same page text, same object
    * NUMBERING as the classic layout (page k = 3+2k, content k =
    * 4+2k, font = 3+2n) with two extra objects: the ObjStm (4+2n) and
    * the XRef stream (5+2n), so `/Size − 1 = 5+2n`. */
  private def buildPdfModern(pages: Seq[String], version: String,
      flate: Boolean, hex: Boolean = false): Array[Byte] = {
    val n = pages.size
    val fontObj = 3 + 2 * n
    val objStmObj = fontObj + 1
    val xrefObj = fontObj + 2
    val size = xrefObj + 1
    val out = new java.io.ByteArrayOutputStream(2048)
    def wr(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val offsets = new Array[Long](size)
    wr(s"%PDF-$version\n")
    // content streams: regular objects (streams can't live in ObjStm)
    pages.zipWithIndex.foreach { case (text, k) =>
      val num = 4 + 2 * k
      val content = s"BT /F1 12 Tf 72 720 Td ${showOp(text, k, hex)} ET"
      val cbytes = content
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      offsets(num) = out.size().toLong
      if (flate) {
        val data = deflate(cbytes)
        wr(s"$num 0 obj\n<< /Length ${data.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        out.write(data, 0, data.length)
        wr("\nendstream\nendobj\n")
      } else {
        wr(s"$num 0 obj\n<< /Length ${cbytes.length} >>\nstream\n" +
          s"$content\nendstream\nendobj\n")
      }
    }
    // the ObjStm: header of (num offset) pairs, then the bodies
    val kids = (0 until n).map(k => s"${3 + 2 * k} 0 R").mkString(" ")
    val inObjs: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
      (0 until n).map { k =>
        (3 + 2 * k) -> (s"<< /Type /Page /Parent 2 0 R /Resources " +
          s"<< /Font << /F1 $fontObj 0 R >> >> " +
          s"/MediaBox [0 0 612 792] /Contents ${4 + 2 * k} 0 R >>")
      } ++
      Seq(fontObj ->
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = inObjs.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init // ASCII: len=bytes
    val header = inObjs.zip(offs)
      .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val osData = deflate(payload)
    offsets(objStmObj) = out.size().toLong
    wr(s"$objStmObj 0 obj\n<< /Type /ObjStm /N ${inObjs.size} " +
      s"/First ${header.length} /Length ${osData.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(osData, 0, osData.length)
    wr("\nendstream\nendobj\n")
    // the XRef stream, entries in object-number order 0..size-1. The
    // offset field width derives from the LARGEST offset in the file
    // (xrefAt — it follows every object): a fixed 2-byte field would
    // silently truncate offsets past 65535 as content grows (the r11
    // ADVICE cliff); real writers size /W the same way.
    val xrefAt = out.size().toLong
    val offW =
      if (xrefAt <= 0xFFFFL) 2
      else if (xrefAt <= 0xFFFFFFFFL) 4
      else 8
    val rows = new java.io.ByteArrayOutputStream(size * (offW + 3))
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      var j = offW - 1
      while (j >= 0) { rows.write(((f2 >> (8 * j)) & 0xff).toInt); j -= 1 }
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    row(0, 0L, 65535)
    row(2, objStmObj.toLong, 0) // catalog
    row(2, objStmObj.toLong, 1) // page tree
    for (k <- 0 until n) {
      row(2, objStmObj.toLong, 2 + k)  // page dict 3+2k
      row(1, offsets(4 + 2 * k), 0)    // content stream 4+2k
    }
    row(2, objStmObj.toLong, 2 + n)    // font
    row(1, offsets(objStmObj), 0)
    row(1, xrefAt, 0)
    val xData = deflate(rows.toByteArray)
    wr(s"$xrefObj 0 obj\n<< /Type /XRef /Size $size /W [1 $offW 2] " +
      s"/Root 1 0 R /Length ${xData.length} " +
      "/Filter /FlateDecode >>\nstream\n")
    out.write(xData, 0, xData.length)
    wr("\nendstream\nendobj\n")
    wr(s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Deterministic PDF corpus in the [[Multimodal.mediaSchema]] shape:
    * `doc_id % 3 + 1` pages, version keyed on `doc_id % 5`, page text
    * from [[pdfPageText]]; ODD ids Flate-compress their content
    * streams (the real-corpus form), evens stay plain; the version-1.5
    * ids (`doc_id % 5 == 0`) additionally use the MODERN layout —
    * ObjStm-compressed objects + a binary xref stream
    * ([[buildPdfModern]]) — so the q_pdf_parse oracle exercises the
    * classic table, both content-decode arms, and the 1.5 machinery,
    * while every parser field stays a closed form of doc_id (layout
    * changes bytes and the object COUNT — `5+2n` modern vs `3+2n`
    * classic — never the text). */
  def syntheticPdfs(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val pages =
            (0 until nPdfPages(id)).map(k => pdfPageText(id, k))
          // round-12 arms: %7 writes HEX show strings, %13 (classic
          // only) LZW-compresses content streams, %11 (classic only)
          // appends an incremental UPDATE revision for page 0
          val hex = id % 7 == 0
          val classic = id % 5 != 0
          val lzw = classic && id % 13 == 0
          val bytes =
            if (classic && id % 11 == 0)
              buildPdfUpdated(pages, pdfVersion(id),
                flate = id % 2 == 1, hex = hex, lzw = lzw,
                updateText = pdfUpdateText(id))
            else buildPdf(pages, pdfVersion(id),
              flate = id % 2 == 1, modern = !classic, hex = hex,
              lzw = lzw)
          Row(id, "document", bytes,
            Row("pdf", null, null, null))
        }
      }(enc).toDF()
  }

  // ------------------------------------------------------------- parser

  /** Output schema of the PDF structural parser. */
  val pdfMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("parsed", BooleanType, nullable = false),
    StructField("version", StringType, nullable = true),
    StructField("n_pages", IntegerType, nullable = true),
    StructField("pages_declared", IntegerType, nullable = true),
    StructField("n_objects", IntegerType, nullable = true),
    StructField("xref_ok", BooleanType, nullable = false),
    StructField("n_xrefs", IntegerType, nullable = true),
    StructField("streams_ok", BooleanType, nullable = false),
    StructField("text", StringType, nullable = true)
  ))

  /** Structural PDF parse + content-stream text extraction over a
    * [[Multimodal.mediaSchema]] table: header version, page objects
    * counted vs the page tree's declared `/Count`, object count from
    * the trailer `/Size`, xref VALIDATION (every in-use entry's offset
    * must land on `<num> 0 obj` — the integrity check a corpus lane
    * runs before trusting a crawled PDF), and the text of every
    * `(…) Tj` / `[…] TJ` show operator (standard escapes, balanced
    * parens, UTF-8 literals; one line per content stream). Content
    * streams may be plain or `/Filter /FlateDecode` (inflated with the
    * JDK zlib, bomb-capped); `streams_ok = false` marks a document
    * where some stream failed to decode (bad zlib bytes, unsupported
    * filter) — that stream contributes no text, the others still do.
    * Bytes without the `%PDF-` magic yield `parsed = false` with null
    * fields; a damaged xref/trailer yields `xref_ok = false` with null
    * `n_objects` but still extracts text — the poisoned-row containment
    * of the other multimodal walks. One iterator pass, no shuffle. */
  def pdfMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pdfMetaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        try parseOne(id, bytes)
        catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, bytes.length, false, null, null, null, null, false,
              null, false, null)
        }
      }
    }(enc).toDF()
  }

  /** One inflated object stream: payload text, declared object count
    * `/N`, first-object offset `/First` (§7.5.7). */
  private final case class ObjStmInfo(payload: String, n: Int,
      first: Int)

  private def parseOne(id: Long, bytes: Array[Byte]): Row = {
    // ISO-8859-1 is byte-preserving: structural scanning happens on
    // this string; literal text re-encodes back to bytes → UTF-8
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-"))
      return Row(id, bytes.length, false, null, null, null, null, false,
        null, false, null)
    val version = s.substring(5, math.min(s.length,
      s.indexWhere(c => c == '\r' || c == '\n', 5) match {
        case -1 => s.length
        case i => i
      }))
    // ---- stream walk FIRST: show-operator text, per-stream decode
    // health, and the inflated /ObjStm payloads (modern PDFs keep
    // their non-stream objects — catalog, page tree, page dicts —
    // compressed inside object streams, so page counting and type-2
    // xref validation below need these). The stream's own dict
    // (between its `N 0 obj` header and the `stream` keyword) names
    // the filter and the byte-exact /Length; the length, when it
    // lands on `endstream` (± an EOL), bounds the body WITHOUT
    // searching inside it — binary Flate data may contain any byte
    // sequence, including "endstream". Fallback: endstream search.
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    val objstms = scala.collection.mutable.Map[Int, ObjStmInfo]()
    var streamsOk = true
    var from = 0
    var more = true
    while (more) {
      val st = s.indexOf("stream", from)
      if (st < 0) more = false
      else {
        val bodyStart = s.indexOf('\n', st) + 1
        if (bodyStart <= 0) more = false
        else {
          val objPos = math.max(0, s.lastIndexOf("obj", st))
          val dict = s.substring(objPos, st)
          val objNum = "(\\d+)\\s+0\\s+obj$".r.findFirstMatchIn(
              s.substring(math.max(0, objPos - 16), objPos + 3))
            .map(_.group(1).toInt)
          val flate =
            "/Filter\\s*/FlateDecode\\b".r.findFirstIn(dict).isDefined
          val lzw = !flate &&
            "/Filter\\s*/LZWDecode\\b".r.findFirstIn(dict).isDefined
          val otherFilter = !flate && !lzw &&
            "/Filter\\b".r.findFirstIn(dict).isDefined
          val isObjStm =
            "/Type\\s*/ObjStm\\b".r.findFirstIn(dict).isDefined
          val isXref =
            "/Type\\s*/XRef\\b".r.findFirstIn(dict).isDefined
          val byLen = "/Length\\s+(\\d+)\\b".r.findFirstMatchIn(dict)
            .map(_.group(1).toInt)
            .flatMap { len =>
              val e0 = bodyStart + len
              if (e0 <= s.length) {
                val e = s.indexOf("endstream", e0)
                if (e >= 0 && e - e0 <= 2) Some((e0, e)) else None
              } else None
            }
          val (bodyEnd, endKw) = byLen.getOrElse {
            val e = s.indexOf("endstream", bodyStart)
            (e, e)
          }
          if (endKw < 0) more = false
          else {
            def decoded: Option[String] =
              if (flate || lzw)
                try {
                  val raw = s.substring(bodyStart, bodyEnd).getBytes(
                    java.nio.charset.StandardCharsets.ISO_8859_1)
                  Some(new String(
                    if (flate) inflate(raw) else lzwDecode(raw),
                    java.nio.charset.StandardCharsets.ISO_8859_1))
                } catch { case scala.util.control.NonFatal(_) =>
                  streamsOk = false; None }
              else if (otherFilter) { streamsOk = false; None }
              else Some(s.substring(bodyStart, bodyEnd))
            if (isXref) {
              // the index, not content: validated in the xref phase
            } else if (isObjStm) {
              for (p <- decoded; num <- objNum) {
                val n = "/N\\s+(\\d+)".r.findFirstMatchIn(dict)
                  .map(_.group(1).toInt).getOrElse(0)
                val first = "/First\\s+(\\d+)".r.findFirstMatchIn(dict)
                  .map(_.group(1).toInt).getOrElse(0)
                objstms(num) = ObjStmInfo(p, n, first)
              }
            } else {
              decoded.map(showText).filter(_.nonEmpty)
                .foreach(texts += _)
            }
            from = endKw + "endstream".length
          }
        }
      }
    }
    // ---- page counting over the raw bytes PLUS every object-stream
    // payload (a modern file's page dicts never appear uncompressed).
    // /Pages (the tree node) must not count, hence the non-'s' class.
    val scanSpaces = s +: objstms.values.map(_.payload).toSeq
    val nPages = scanSpaces
      .map(t => "/Type\\s*/Page[^s]".r.findAllMatchIn(t).length).sum
    val declared = scanSpaces.iterator.flatMap { t =>
      "/Type\\s*/Pages\\b".r.findFirstMatchIn(t).flatMap { m =>
        val tail = t.substring(m.start,
          math.min(t.length, m.start + 400))
        "/Count\\s+(\\d+)".r.findFirstMatchIn(tail)
          .map(_.group(1).toInt)
      }
    }.nextOption()
    // ---- xref walk: last startxref → a CLASSIC table ("xref"
    // keyword, possibly MULTIPLE subsections) or a 1.5+ XREF STREAM
    // (`N 0 obj` with /Type /XRef) → offset validation — then FOLLOW
    // THE /Prev CHAIN (§7.5.6): an incrementally-updated document
    // (every save in a real editor) appends a new xref whose trailer
    // points at the previous one; walking only the last startxref
    // (the pre-r12 behavior) never validates the base revision.
    // Classic: every in-use entry must land on `N 0 obj`. Modern:
    // type-1 entries likewise; type-2 entries must name an object
    // stream we decoded AND their index must resolve to the right
    // object number in its header — the cross-structure integrity
    // check a crawled 1.5+ PDF needs before being trusted. n_xrefs
    // reports the validated chain length; /Size (→ n_objects) comes
    // from the NEWEST section. A seen-set caps the walk: a /Prev
    // cycle in a malicious file terminates instead of spinning.
    var xrefOk = false
    var nObjects: Option[Int] = None
    var nXrefs = 0
    // one xref SECTION at `at` → Some((entriesOk, size?, prevAt?));
    // None when `at` lands on neither a table nor an XRef stream
    def xrefSection(at: Int): Option[(Boolean, Option[Int], Option[Long])] = {
      if (s.startsWith("xref", at)) {
        val lines = s.substring(at).linesIterator
        lines.next() // "xref"
        var ok = true
        var more = true
        var hdr = lines.next().trim
        while (more && ok) {
          // subsection header "first count", entries, then either
          // another subsection header or the trailer keyword
          val h = hdr.split("\\s+")
          if (h.length != 2 || !h.forall(_.forall(_.isDigit))) ok = false
          else {
            val first = h(0).toInt
            val count = h(1).toInt
            var i = 0
            while (i < count && ok) {
              val parts = lines.next().trim.split("\\s+")
              val objNum = first + i
              if (parts.length >= 3 && parts(2) == "n") {
                val off = parts(0).toLong
                ok = off < bytes.length &&
                  s.startsWith(s"$objNum 0 obj", off.toInt)
              } // free entries carry no offset to validate
              i += 1
            }
            if (ok) {
              hdr = lines.next().trim
              if (hdr.startsWith("trailer")) more = false
            }
          }
        }
        // bound the trailer dict at ITS closing >> — a fixed window
        // would read past this revision's trailer into the NEXT
        // appended revision and steal its /Prev (an infinite chain)
        val tr = s.indexOf("trailer", at)
        val tEnd = if (tr >= 0) s.indexOf(">>", tr) else -1
        val tdict =
          if (tr >= 0 && tEnd > tr) s.substring(tr, tEnd + 2) else ""
        val size = "/Size\\s+(\\d+)".r.findFirstMatchIn(tdict)
          .map(_.group(1).toInt)
        val prev = "/Prev\\s+(\\d+)".r.findFirstMatchIn(tdict)
          .map(_.group(1).toLong)
        Some((ok && tr >= 0, size, prev))
      } else {
        val stPos = s.indexOf("stream", at)
        if (stPos > at &&
            "^\\d+\\s+0\\s+obj".r.findFirstIn(s.substring(at,
              math.min(s.length, at + 24))).isDefined) {
          val dict = s.substring(at, stPos)
          if ("/Type\\s*/XRef\\b".r.findFirstIn(dict).isDefined) {
            val size = "/Size\\s+(\\d+)".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt).getOrElse(0)
            val w = "/W\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(dict)
              .map(_.group(1).trim.split("\\s+").map(_.toInt).toSeq)
              .getOrElse(Seq.empty)
            val index = "/Index\\s*\\[([^\\]]*)\\]".r
              .findFirstMatchIn(dict)
              .map(_.group(1).trim.split("\\s+").map(_.toInt).toSeq
                .grouped(2).map(p => (p(0), p(1))).toSeq)
              .getOrElse(Seq((0, size)))
            val len = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict)
              .map(_.group(1).toInt)
            val bodyStart = s.indexOf('\n', stPos) + 1
            val flate = "/Filter\\s*/FlateDecode\\b".r
              .findFirstIn(dict).isDefined
            if (w.size == 3 && size > 0 && bodyStart > 0 &&
                len.exists(bodyStart + _ <= s.length)) {
              val raw = s.substring(bodyStart, bodyStart + len.get)
                .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              val data = if (flate) inflate(raw) else raw
              val rowW = w.sum
              var ok = true
              var pos = 0
              for ((start, count) <- index; i <- 0 until count
                   if ok && pos + rowW <= data.length) {
                val objNum = start + i
                def fld(k: Int): Long = {
                  val o = pos + w.take(k).sum
                  var v = 0L
                  for (j <- 0 until w(k)) v = (v << 8) | (data(o + j) & 0xff)
                  v
                }
                val typ = if (w(0) == 0) 1L else fld(0)
                val f2 = fld(1); val f3 = fld(2)
                typ match {
                  case 1L =>
                    ok = f2 < bytes.length &&
                      s.startsWith(s"$objNum 0 obj", f2.toInt)
                  case 2L =>
                    ok = objstms.get(f2.toInt).exists { os =>
                      val toks = os.payload.trim.split("\\s+")
                      f3 < os.n && toks.length >= 2 * os.n &&
                        toks(2 * f3.toInt).toInt == objNum &&
                        os.first +
                          toks(2 * f3.toInt + 1).toInt <= os.payload.length
                    }
                  case _ => () // free
                }
                pos += rowW
              }
              // a truncated entry array must read as untrustworthy,
              // not silently-valid: every declared row must be present
              ok = ok && pos == index.map(_._2).sum * rowW
              val prev = "/Prev\\s+(\\d+)".r.findFirstMatchIn(dict)
                .map(_.group(1).toLong)
              Some((ok, Some(size), prev))
            } else None
          } else None
        } else None
      }
    }
    val sx = s.lastIndexOf("startxref")
    try if (sx >= 0) {
      val after = s.substring(sx + "startxref".length).trim
      val xrefAt = after.takeWhile(_.isDigit)
      if (xrefAt.nonEmpty && xrefAt.toLong < bytes.length) {
        val seenAts = scala.collection.mutable.Set[Long]()
        var next: Option[Long] = Some(xrefAt.toLong)
        var allOk = true
        while (next.isDefined && allOk) {
          val at = next.get
          next = None
          if (at >= bytes.length || seenAts(at)) allOk = false
          else {
            seenAts += at
            xrefSection(at.toInt) match {
              case Some((ok, size, prev)) =>
                allOk = ok
                if (ok) {
                  nXrefs += 1
                  if (nObjects.isEmpty)
                    nObjects = size.map(_ - 1) // entry 0 = free head
                  next = prev
                }
              case None => allOk = false
            }
          }
        }
        xrefOk = allOk && nXrefs > 0
        if (!xrefOk) nObjects = None
      }
    } catch {
      // a torn xref (truncated entries, non-numeric header, bad zlib
      // in the xref stream) means the INDEX is untrustworthy, not the
      // document: xref_ok stays false, extracted text stands
      case scala.util.control.NonFatal(_) =>
        xrefOk = false; nObjects = None
    }
    val text = if (texts.isEmpty) "" else texts.mkString("\n")
    Row(id, bytes.length, true, version, nPages,
      declared.map(Int.box).orNull, nObjects.map(Int.box).orNull,
      xrefOk, if (xrefOk) Int.box(nXrefs) else null, streamsOk, text)
  }

  /** Concatenated text of the `Tj` / `TJ` operators in one content
    * stream: a literal `(…)` (escapes + balanced parens per §7.3.4.2)
    * followed by `Tj` emits; a `[…] TJ` array emits its string
    * elements in order (numeric kerning entries skip). */
  private[graft] def showText(content: String): String = {
    val out = new StringBuilder
    var i = 0
    def ws(j0: Int): Int = {
      var j = j0
      while (j < content.length && content(j).isWhitespace) j += 1
      j
    }
    // hex string starting at '<' (§7.3.4.3): pairs of hex digits,
    // whitespace ignored, an odd final digit implies a trailing 0 —
    // the identity-encoded show form; returns (text, index after '>').
    // `<<` is a DICTIONARY opener, not a string — callers skip it.
    def hexString(j0: Int): (String, Int) = {
      val raw = new java.io.ByteArrayOutputStream(64)
      var j = j0 + 1
      var hi = -1
      var closed = false
      while (j < content.length && !closed) {
        val c = content(j)
        val d = Character.digit(c, 16)
        if (c == '>') {
          if (hi >= 0) raw.write(hi << 4) // odd digit: low nibble 0
          closed = true; j += 1
        } else if (d >= 0) {
          if (hi < 0) hi = d
          else { raw.write((hi << 4) | d); hi = -1 }
          j += 1
        } else j += 1 // whitespace between digits is legal
      }
      (new String(raw.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8), j)
    }
    // literal string starting at '(' → (decoded text, index after ')')
    def literal(j0: Int): (String, Int) = {
      val raw = new java.io.ByteArrayOutputStream(64)
      var j = j0 + 1
      var depth = 1
      while (j < content.length && depth > 0) {
        val c = content(j)
        if (c == '\\' && j + 1 < content.length) {
          content(j + 1) match {
            case 'n' => raw.write('\n'); j += 2
            case 'r' => raw.write('\r'); j += 2
            case 't' => raw.write('\t'); j += 2
            case 'b' => raw.write('\b'); j += 2
            case 'f' => raw.write('\f'); j += 2
            case d if d >= '0' && d <= '7' =>
              // \ddd octal (1–3 digits), high-order overflow ignored
              var k = j + 1; var v = 0
              while (k < content.length && k - j <= 3 &&
                  content(k) >= '0' && content(k) <= '7') {
                v = v * 8 + (content(k) - '0'); k += 1
              }
              raw.write(v & 0xFF); j = k
            case '\r' => // backslash-EOL: line continuation, emits nothing
              j += (if (j + 2 < content.length && content(j + 2) == '\n') 3
                else 2)
            case '\n' => j += 2
            case other => raw.write(other.toInt); j += 2
          }
        } else if (c == '(') { depth += 1; raw.write(c.toInt); j += 1 }
        else if (c == ')') {
          depth -= 1
          if (depth > 0) raw.write(c.toInt)
          j += 1
        } else { raw.write(c.toInt); j += 1 }
      }
      // bytes were ISO-8859-1-preserved chars; the writer emits UTF-8
      (new String(raw.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8), j)
    }
    while (i < content.length) {
      content(i) match {
        case '(' =>
          val (txt, after) = literal(i)
          val k = ws(after)
          if (content.startsWith("Tj", k)) { out ++= txt; i = k + 2 }
          else i = after
        case '<' if i + 1 < content.length && content(i + 1) == '<' =>
          i += 2 // dictionary opener, not a hex string
        case '<' =>
          val (txt, after) = hexString(i)
          val k = ws(after)
          if (content.startsWith("Tj", k)) { out ++= txt; i = k + 2 }
          else i = after
        case '[' =>
          val parts = scala.collection.mutable.ArrayBuffer[String]()
          var j = i + 1
          var closed = -1
          while (j < content.length && closed < 0) {
            content(j) match {
              case '(' =>
                val (txt, after) = literal(j)
                parts += txt; j = after
              case '<' if j + 1 < content.length &&
                  content(j + 1) == '<' => j += 2
              case '<' =>
                val (txt, after) = hexString(j)
                parts += txt; j = after
              case ']' => closed = j; j += 1
              case _ => j += 1
            }
          }
          val k = ws(j)
          if (closed >= 0 && content.startsWith("TJ", k)) {
            parts.foreach(out ++= _)
            i = k + 2
          } else i = if (closed >= 0) closed + 1 else content.length
        case _ => i += 1
      }
    }
    out.toString
  }
}
