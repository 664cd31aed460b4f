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

  /** Complete classic PDF exercising NON-IDENTITY font encodings —
    * the two forms real documents use that the identity tier cannot
    * read. Page 0 shows through a simple Type1 font whose
    * `/Encoding << /BaseEncoding /WinAnsiEncoding /Differences
    * [128 /Euro /bullet] >>` remaps bytes (octal `\200`/`\201` slots
    * + a WinAnsi `\222` right-quote), then SWITCHES fonts mid-stream
    * (`/F2 … Tf <0158> Tj`); page 1 shows 2-byte Identity-H codes
    * through a `/ToUnicode` CMap — an offset `bfrange`
    * (`<0100><01FF> <0000>`: code = char + 0x100) plus one `bfchar`
    * (`<0202> → é`). Every planted byte is a closed form of `id`, so
    * the oracle restates the decoded text analytically. */
  private[graft] def buildPdfEncoded(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(2048)
    def wr(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val offsets = new Array[Long](10)
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size().toLong
      wr(s"$num 0 obj\n$body\nendobj\n")
    }
    wr("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Resources " +
      "<< /Font << /F1 7 0 R /F2 8 0 R >> >> " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>")
    val c0 = s"BT /F1 12 Tf 72 720 Td " +
      s"(Euro \\200 ${id % 9}\\201 don\\222t) Tj " +
      "/F2 12 Tf <0158> Tj ET"
    obj(4, s"<< /Length ${c0.length} >>\nstream\n$c0\nendstream")
    obj(5, "<< /Type /Page /Parent 2 0 R /Resources " +
      "<< /Font << /F2 8 0 R >> >> " +
      "/MediaBox [0 0 612 792] /Contents 6 0 R >>")
    val codes = ("CID pg " + (id % 7))
      .map(c => f"01${c.toInt}%02X").mkString + "0202"
    val c1 = s"BT /F2 12 Tf 72 720 Td <$codes> Tj ET"
    obj(6, s"<< /Length ${c1.length} >>\nstream\n$c1\nendstream")
    obj(7, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 128 /Euro /bullet ] >> >>")
    obj(8, "<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      "/Encoding /Identity-H /ToUnicode 9 0 R >>")
    val cmap = "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "1 beginbfrange\n<0100> <01FF> <0000>\nendbfrange\n" +
      "1 beginbfchar\n<0202> <00E9>\nendbfchar\nendcmap\nend"
    obj(9, s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream")
    val xrefAt = out.size().toLong
    wr("xref\n0 10\n0000000000 65535 f \n")
    (1 to 9).foreach(i => wr(f"${offsets(i)}%010d 00000 n \n"))
    wr(s"trailer\n<< /Size 10 /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The decoded text [[buildPdfEncoded]] plants, per page. */
  private[graft] def pdfEncodedText(id: Long): String =
    s"Euro € ${id % 9}• don’tX\nCID pg ${id % 7}é"

  /** Font-encoding PDF corpus in the [[Multimodal.mediaSchema]] shape
    * ([[buildPdfEncoded]] per id). */
  def syntheticEncodedPdfs(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id, "document", buildPdfEncoded(id),
            Row("pdf", null, null, null))
        }
      }(enc).toDF()
  }

  private[graft] def pdfImgTextW(id: Long): Int = (id % 5 + 2).toInt * 8
  private[graft] def pdfImgTextH(id: Long): Int = (id % 4 + 2).toInt * 8
  private[graft] def pdfImgRawW(id: Long): Int = (id % 6 + 1).toInt * 4
  private[graft] def pdfImgRawH(id: Long): Int = (id % 3 + 1).toInt * 4

  /** Complete classic PDF embedding two Image XObjects — the
    * figure-extraction surface a multimodal corpus lane mines from
    * documents (papers and reports carry their images THIS way):
    * object 5 a `/Filter /FlateDecode` raw DeviceRGB bitmap (pixel
    * bytes a closed form of (x, y, id)), object 6 a `/DCTDecode`
    * image whose body is a REAL `javax.imageio` JPEG (solid fill,
    * closed-form dims). The page places both with `Do` operators and
    * shows one text line so the text and image lanes coexist. */
  private[graft] def buildPdfWithImages(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def wr(t: String): Unit =
      out.write(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val offsets = new Array[Long](7)
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size().toLong
      wr(s"$num 0 obj\n$body\nendobj\n")
    }
    wr("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /Resources " +
      "<< /XObject << /Im0 5 0 R /Im1 6 0 R >> >> " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>")
    val c = s"BT /F1 12 Tf 72 720 Td (img doc ${id % 9}) Tj ET\n" +
      s"q ${pdfImgRawW(id)} 0 0 ${pdfImgRawH(id)} 72 600 cm /Im0 Do Q\n" +
      s"q ${pdfImgTextW(id)} 0 0 ${pdfImgTextH(id)} 72 400 cm /Im1 Do Q"
    obj(4, s"<< /Length ${c.length} >>\nstream\n$c\nendstream")
    // raw RGB rows, deflated: pixel (x,y) channel k = (x + y + id + k)
    // mod 256 — independently replayable
    val (rw, rh) = (pdfImgRawW(id), pdfImgRawH(id))
    val raw = new Array[Byte](rw * rh * 3)
    var p = 0
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        var k = 0
        while (k < 3) {
          raw(p) = ((x + y + id + k) % 256).toByte; p += 1; k += 1
        }
        x += 1
      }
      y += 1
    }
    val rawZ = deflate(raw)
    offsets(5) = out.size().toLong
    wr(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width $rw " +
      s"/Height $rh /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      s"/Filter /FlateDecode /Length ${rawZ.length} >>\nstream\n")
    out.write(rawZ, 0, rawZ.length)
    wr("\nendstream\nendobj\n")
    // a REAL baseline JPEG via the JDK encoder (solid fill — only the
    // decode round trip and dims are contracted, not the bytes)
    val (jw, jh) = (pdfImgTextW(id), pdfImgTextH(id))
    val img = new java.awt.image.BufferedImage(jw, jh,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color((id % 200).toInt + 30,
      (id % 150).toInt + 50, (id % 100).toInt + 80))
    g.fillRect(0, 0, jw, jh)
    g.dispose()
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val jpeg = jbos.toByteArray
    offsets(6) = out.size().toLong
    wr(s"6 0 obj\n<< /Type /XObject /Subtype /Image /Width $jw " +
      s"/Height $jh /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
      s"/Filter /DCTDecode /Length ${jpeg.length} >>\nstream\n")
    out.write(jpeg, 0, jpeg.length)
    wr("\nendstream\nendobj\n")
    val xrefAt = out.size().toLong
    wr("xref\n0 7\n0000000000 65535 f \n")
    (1 to 6).foreach(i => wr(f"${offsets(i)}%010d 00000 n \n"))
    wr(s"trailer\n<< /Size 7 /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** Image-bearing PDF corpus in the [[Multimodal.mediaSchema]] shape. */
  def syntheticImagePdfs(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id, "document", buildPdfWithImages(id),
            Row("pdf", null, null, null))
        }
      }(enc).toDF()
  }

  /** Output schema of [[pdfImages]]. */
  val pdfImagesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("image_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("bits_per_component", IntegerType, nullable = true),
    StructField("filter", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = true)
  ))

  /** EMBEDDED IMAGES of every PDF — the figure-extraction pass a
    * multimodal training-data pipeline runs over a document corpus
    * (papers carry their figures as `/Subtype /Image` XObject
    * streams). One row per image in file order: declared `/Width`,
    * `/Height`, `/BitsPerComponent`, the filter name, the stream's
    * byte count, and a DECODE VERIFICATION: `/DCTDecode` bodies are
    * real JPEGs the JDK decodes (decode_ok = decoded dims equal the
    * declared dims), `/FlateDecode` bodies inflate to exactly
    * width·height·3 octets for 8-bit DeviceRGB; other filters
    * (JPXDecode, CCITT, JBIG2) report `decode_ok = null` — present
    * but undecoded, the documented zero-deps boundary. Malformed
    * bodies read `decode_ok = false`, never throw (poisoned-row
    * containment). Map-only `mapPartitions`, one iterator pass per
    * document — the [[pdfMeta]] posture. */
  def pdfImages(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(pdfImagesSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        try imagesOne(id, bytes)
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
    }(enc).toDF()
  }

  private def imagesOne(id: Long, bytes: Array[Byte]): Seq[Row] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Row]()
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
          val isImage =
            "/Subtype\\s*/Image\\b".r.findFirstIn(dict).isDefined
          val len = "/Length\\s+(\\d+)\\b".r.findFirstMatchIn(dict)
            .map(_.group(1).toInt)
          val byLen = len.flatMap { l =>
            val e0 = bodyStart + l
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
            if (isImage) {
              def num(k: String): Option[Int] =
                (k + "\\s+(\\d+)\\b").r.findFirstMatchIn(dict)
                  .map(_.group(1).toInt)
              val w = num("/Width"); val h = num("/Height")
              val bpc = num("/BitsPerComponent")
              val filter = "/Filter\\s*/(\\w+)".r
                .findFirstMatchIn(dict).map(_.group(1))
              val body = s.substring(bodyStart, bodyEnd).getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1)
              val ok: java.lang.Boolean = filter match {
                case Some("DCTDecode") =>
                  try {
                    val img = javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(body))
                    Boolean.box(img != null &&
                      w.contains(img.getWidth) &&
                      h.contains(img.getHeight))
                  } catch {
                    case scala.util.control.NonFatal(_) =>
                      Boolean.box(false)
                  }
                case Some("FlateDecode") =>
                  try Boolean.box((w, h) match {
                    case (Some(ww), Some(hh)) =>
                      inflate(body).length == ww * hh * 3
                    case _ => false
                  }) catch {
                    case scala.util.control.NonFatal(_) =>
                      Boolean.box(false)
                  }
                case _ => null // present but undecoded (boundary)
              }
              out += Row(id, out.length,
                w.map(Int.box).orNull, h.map(Int.box).orNull,
                bpc.map(Int.box).orNull, filter.orNull,
                body.length, ok)
            }
            from = endKw + "endstream".length
          }
        }
      }
    }
    out.toSeq
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
    val contents = scala.collection.mutable.ArrayBuffer[String]()
    val streamByNum = scala.collection.mutable.Map[Int, String]()
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
              // text extraction is DEFERRED until the font table is
              // known (a /Tf may select a non-identity encoding);
              // streams also index by object number so a /ToUnicode
              // reference can find its CMap payload
              decoded.foreach { p =>
                contents += p
                objNum.foreach(n => streamByNum(n) = p)
              }
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
    // ---- font table: resource NAME → byte decoder (§9.6, §9.10).
    // Page dicts name their fonts (`/Font << /F1 9 0 R >>`); each
    // referenced font object (top-level or ObjStm-compressed) may
    // carry /ToUnicode (a CMap stream → CID 2-byte decode) or an
    // /Encoding (named base and/or /Differences → simple 1-byte
    // decode). Fonts with NO encoding info stay identity — the
    // pre-r12 behavior, so undecorated documents parse byte-for-byte
    // as before. A name colliding across pages keeps the first
    // definition; a torn font structure falls back to identity for
    // everything (containment, not a wrong answer).
    val fonts: Map[String, PdfDecoder] = try {
      def topBody(num: Int): Option[String] =
        ("(?m)(?<![0-9])" + num + "\\s+0\\s+obj").r.findFirstMatchIn(s)
          .map { m =>
            val start = m.end
            val end = s.indexOf("endobj", start)
            s.substring(start,
              if (end < 0) math.min(s.length, start + 2000) else end)
          }
      def objstmBody(num: Int): Option[String] =
        objstms.values.iterator.flatMap { info =>
          val hdr = info.payload.take(info.first)
          val pairs = hdr.trim.split("\\s+").grouped(2).collect {
            case Array(a, o) if a.nonEmpty && a.forall(_.isDigit) &&
                o.nonEmpty && o.forall(_.isDigit) =>
              (a.toInt, info.first + o.toInt)
          }.toSeq
          pairs.find(_._1 == num).map { case (_, start) =>
            val ends = pairs.map(_._2).filter(_ > start)
            val end = if (ends.isEmpty) info.payload.length
              else math.min(ends.min, info.payload.length)
            info.payload.substring(math.min(start, info.payload.length),
              math.max(end, math.min(start, info.payload.length)))
          }
        }.nextOption()
      val refRe = "/([A-Za-z0-9]+)\\s+(\\d+)\\s+0\\s+R".r
      val nameToObj = scanSpaces.iterator
        .flatMap(sp => "/Font\\s*<<([^>]*)>>".r.findAllMatchIn(sp))
        .flatMap(m => refRe.findAllMatchIn(m.group(1))
          .map(r => r.group(1) -> r.group(2).toInt))
        .toSeq.distinct.take(256)
      val out = scala.collection.mutable.Map[String, PdfDecoder]()
      for ((name, num) <- nameToObj if !out.contains(name);
          body <- topBody(num).orElse(objstmBody(num))
          if "/Type\\s*/Font\\b".r.findFirstIn(body).isDefined) {
        val toUni = "/ToUnicode\\s+(\\d+)\\s+0\\s+R".r
          .findFirstMatchIn(body).map(_.group(1).toInt)
        toUni.flatMap(streamByNum.get) match {
          case Some(cmap) =>
            out(name) = cidDecoder(parseToUnicode(cmap))
          case None =>
            val encDict = "(?s)/Encoding\\s*<<(.*?)>>".r
              .findFirstMatchIn(body).map(_.group(1))
            // /Encoding << /BaseEncoding /X /Differences […] >>  or
            // the direct named form  /Encoding /WinAnsiEncoding
            val base = encDict.flatMap(d =>
                "/BaseEncoding\\s*/(\\w+)".r.findFirstMatchIn(d)
                  .map(_.group(1)))
              .orElse(("/Encoding\\s*/(WinAnsiEncoding|" +
                "MacRomanEncoding|StandardEncoding)").r
                .findFirstMatchIn(body).map(_.group(1)))
            val diffs = encDict.flatMap(d =>
              "(?s)/Differences\\s*\\[([^\\]]*)\\]".r
                .findFirstMatchIn(d).map(_.group(1)))
            if (base.isDefined || diffs.isDefined)
              out(name) = simpleFontDecoder(
                base.getOrElse("StandardEncoding"), diffs)
        }
      }
      out.toMap
    } catch {
      case scala.util.control.NonFatal(_) => Map.empty
    }
    val texts = contents.iterator.map(c => showText(c, fonts))
      .filter(_.nonEmpty).toBuffer
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

  /** String-byte decoder of one font: raw show-string bytes → text.
    * [[IdentityDecoder]] (UTF-8 of the raw bytes) is the default and
    * the pre-r12 behavior; simple-font encodings map single bytes,
    * CID fonts map 2-byte big-endian codes through a ToUnicode CMap. */
  private[graft] type PdfDecoder = Array[Byte] => String

  private[graft] val IdentityDecoder: PdfDecoder =
    raw => new String(raw, java.nio.charset.StandardCharsets.UTF_8)

  /** Concatenated text of the `Tj` / `TJ` operators in one content
    * stream: a literal `(…)` (escapes + balanced parens per §7.3.4.2)
    * followed by `Tj` emits; a `[…] TJ` array emits its string
    * elements in order (numeric kerning entries skip). String BYTES
    * decode through the currently-selected font: `/Name size Tf`
    * switches to `fonts(Name)` (unknown names and documents without
    * font info fall back to [[IdentityDecoder]] — the pre-r12
    * behavior, byte-for-byte). */
  private[graft] def showText(content: String,
      fonts: Map[String, PdfDecoder] = Map.empty): String = {
    val out = new StringBuilder
    var i = 0
    var cur: PdfDecoder = IdentityDecoder
    var lastName = ""
    def isDelim(c: Char): Boolean = c.isWhitespace ||
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def ws(j0: Int): Int = {
      var j = j0
      while (j < content.length && content(j).isWhitespace) j += 1
      j
    }
    // hex string starting at '<' (§7.3.4.3): pairs of hex digits,
    // whitespace ignored, an odd final digit implies a trailing 0;
    // returns (raw bytes, index after '>').
    // `<<` is a DICTIONARY opener, not a string — callers skip it.
    def hexString(j0: Int): (Array[Byte], Int) = {
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
      (raw.toByteArray, j)
    }
    // literal string starting at '(' → (raw bytes, index after ')')
    def literal(j0: Int): (Array[Byte], Int) = {
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
      (raw.toByteArray, j)
    }
    while (i < content.length) {
      content(i) match {
        case '(' =>
          val (raw, after) = literal(i)
          val k = ws(after)
          if (content.startsWith("Tj", k)) { out ++= cur(raw); i = k + 2 }
          else i = after
        case '<' if i + 1 < content.length && content(i + 1) == '<' =>
          i += 2 // dictionary opener, not a hex string
        case '<' =>
          val (raw, after) = hexString(i)
          val k = ws(after)
          if (content.startsWith("Tj", k)) { out ++= cur(raw); i = k + 2 }
          else i = after
        case '[' =>
          val parts = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
          var j = i + 1
          var closed = -1
          while (j < content.length && closed < 0) {
            content(j) match {
              case '(' =>
                val (raw, after) = literal(j)
                parts += raw; j = after
              case '<' if j + 1 < content.length &&
                  content(j + 1) == '<' => j += 2
              case '<' =>
                val (raw, after) = hexString(j)
                parts += raw; j = after
              case ']' => closed = j; j += 1
              case _ => j += 1
            }
          }
          val k = ws(j)
          if (closed >= 0 && content.startsWith("TJ", k)) {
            parts.foreach(p => out ++= cur(p))
            i = k + 2
          } else i = if (closed >= 0) closed + 1 else content.length
        case '/' =>
          // a name token: remember it — `/F2 12 Tf` selects by the
          // name that PRECEDED the Tf operator
          var j = i + 1
          while (j < content.length && !isDelim(content(j))) j += 1
          lastName = content.substring(i + 1, j)
          i = j
        case 'T' if content.startsWith("Tf", i) &&
            (i == 0 || isDelim(content(i - 1))) &&
            (i + 2 >= content.length || isDelim(content(i + 2))) =>
          cur = fonts.getOrElse(lastName, IdentityDecoder)
          i += 2
        case _ => i += 1
      }
    }
    out.toString
  }

  // ------------------------------------------- font encodings (§9.6, §9.10)

  /** Adobe-Glyph-List subset: the ASCII names plus the extended names
    * real `/Differences` arrays actually use (WinAnsi/MacRoman's
    * non-ASCII slots). Unknown names decode U+FFFD — visible, never
    * silently wrong. */
  private[graft] val GlyphNames: Map[String, String] = {
    val ascii = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~")
    val digits = Seq("zero", "one", "two", "three", "four", "five",
      "six", "seven", "eight", "nine").zipWithIndex
      .map { case (n, i) => n -> i.toString }.toMap
    val letters = (('A' to 'Z') ++ ('a' to 'z'))
      .map(c => c.toString -> c.toString).toMap
    val extended = Map(
      "Euro" -> "€", "bullet" -> "•", "emdash" -> "—",
      "endash" -> "–", "quotedblleft" -> "“",
      "quotedblright" -> "”", "quoteleft" -> "‘",
      "quoteright" -> "’", "ellipsis" -> "…",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "trademark" -> "™", "copyright" -> "©",
      "registered" -> "®", "degree" -> "°",
      "section" -> "§", "paragraph" -> "¶",
      "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
      "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
      "ccedilla" -> "ç", "adieresis" -> "ä",
      "odieresis" -> "ö", "udieresis" -> "ü",
      "ntilde" -> "ñ", "oslash" -> "ø", "aring" -> "å",
      "ae" -> "æ", "germandbls" -> "ß")
    ascii ++ digits ++ letters ++ extended
  }

  /** 256-slot base table of a named simple-font encoding: WinAnsi is
    * windows-1252, MacRoman is the JDK's x-MacRoman, Standard (and
    * anything unrecognized) keeps printable ASCII and leaves the rest
    * U+FFFD. One-byte decode via charset keeps the table exact. */
  private[graft] def baseEncodingTable(name: String): Array[String] = {
    val table = Array.fill[String](256)("�")
    val cs = name match {
      case "WinAnsiEncoding" => java.nio.charset.Charset
        .forName("windows-1252")
      case "MacRomanEncoding" => java.nio.charset.Charset
        .forName("x-MacRoman")
      case _ => null
    }
    var i = 0
    while (i < 256) {
      if (cs != null) {
        val s = new String(Array(i.toByte), cs)
        if (s.length == 1 && s.charAt(0) != '�') table(i) = s
      } else if (i >= 0x20 && i <= 0x7e) table(i) = i.toChar.toString
      i += 1
    }
    table
  }

  /** Simple-font decoder from a base encoding plus a `/Differences`
    * array body (`[ code /name /name code /name … ]` — each integer
    * resets the slot, each following name fills consecutive slots,
    * §9.6.5.1). */
  private[graft] def simpleFontDecoder(base: String,
      differences: Option[String]): PdfDecoder = {
    val table = baseEncodingTable(base)
    differences.foreach { body =>
      var slot = -1
      val tok = "(\\d+)|/([^\\s/\\[\\]<>()]+)".r
      tok.findAllMatchIn(body).foreach { m =>
        if (m.group(1) != null) slot = m.group(1).toInt
        else if (slot >= 0 && slot < 256) {
          table(slot) = GlyphNames.getOrElse(m.group(2), "�")
          slot += 1
        }
      }
    }
    raw => {
      val sb = new StringBuilder(raw.length)
      var i = 0
      while (i < raw.length) { sb ++= table(raw(i) & 0xff); i += 1 }
      sb.toString
    }
  }

  /** ToUnicode CMap → code → text map (§9.10.3): `beginbfchar` pairs
    * (`<src> <dstUtf16BE>`), `beginbfrange` with a scalar start
    * (`<lo> <hi> <dst>`, last code unit incrementing) or an array
    * (`<lo> <hi> [<d0> <d1> …]`). Entry count capped at 65536 — a
    * malicious range can't balloon the map. */
  private[graft] def parseToUnicode(cmap: String): Map[Int, String] = {
    val m = scala.collection.mutable.Map[Int, String]()
    def utf16(h: String): String = {
      val padded = if (h.length % 4 == 0) h
        else ("0" * (4 - h.length % 4)) + h
      new String(padded.grouped(4)
        .map(g => Integer.parseInt(g, 16).toChar).toArray)
    }
    for (blk <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(cmap);
        p <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>".r
          .findAllMatchIn(blk.group(1)))
      if (m.size < 65536)
        m(Integer.parseInt(p.group(1), 16)) = utf16(p.group(2))
    val rangeRe = ("<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*" +
      "(?:<([0-9A-Fa-f]+)>|\\[([^\\]]*)\\])").r
    for (blk <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(cmap);
        p <- rangeRe.findAllMatchIn(blk.group(1))) {
      val lo = Integer.parseInt(p.group(1), 16)
      val hi = Integer.parseInt(p.group(2), 16)
      if (p.group(3) != null) {
        val dst = p.group(3)
        // the increment applies to the LAST UTF-16 code unit (§9.10.3)
        val head = utf16(dst).dropRight(1)
        val last = utf16(dst).takeRight(1).headOption.map(_.toInt)
          .getOrElse(0)
        var k = 0
        while (k <= hi - lo && m.size < 65536) {
          m(lo + k) = head + (last + k).toChar
          k += 1
        }
      } else {
        val items = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(p.group(4))
          .map(_.group(1)).toSeq
        items.zipWithIndex.foreach { case (h, k) =>
          if (lo + k <= hi && m.size < 65536) m(lo + k) = utf16(h)
        }
      }
    }
    m.toMap
  }

  /** CID decoder: 2-byte big-endian codes (the Identity-H code space)
    * through a ToUnicode map; unmapped codes decode U+FFFD. An odd
    * trailing byte (malformed string) also decodes U+FFFD. */
  private[graft] def cidDecoder(toUnicode: Map[Int, String]): PdfDecoder =
    raw => {
      val sb = new StringBuilder(raw.length / 2)
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw(i) & 0xff) << 8) | (raw(i + 1) & 0xff)
        sb ++= toUnicode.getOrElse(code, "�")
        i += 2
      }
      if (raw.length % 2 == 1) sb += '�'
      sb.toString
    }
}
