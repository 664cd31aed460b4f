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
  * Other filters (DCTDecode, LZW, …), font subsetting/CMaps and layout
  * reconstruction are what the real dependency buys — a stream behind
  * an unsupported filter flips `streams_ok` and contributes no text;
  * the structural layer (header, object graph, xref table validation,
  * page tree) is the same either way.
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

  /** Build a complete single-xref PDF: catalog → page tree → one page
    * object + one uncompressed content stream per page (even pages use
    * `Tj`, odd pages split the text into a two-element `TJ` array — the
    * kerning form every real PDF uses) → shared Type1 font; then the
    * xref table with byte-exact offsets and the trailer. Returns the
    * file bytes (text encoded UTF-8 inside the literals). With
    * `flate = true`, every content stream is zlib-compressed behind
    * `/Filter /FlateDecode` — the form real crawled PDFs take — with
    * `/Length` counting the COMPRESSED bytes and the xref offsets
    * recomputed over the binary layout. */
  private[graft] def buildPdf(pages: Seq[String],
      version: String = "1.4", flate: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
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
      val show =
        if (k % 2 == 0) s"(${escLit(text)}) Tj"
        else {
          val mid = text.length / 2
          s"[(${escLit(text.substring(0, mid))}) -250 " +
            s"(${escLit(text.substring(mid))})] TJ"
        }
      val content = s"BT /F1 12 Tf 72 720 Td $show ET"
      val cbytes = content
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (flate) {
        val data = deflate(cbytes)
        offsets(pageNum + 1) = out.size().toLong
        wr(s"${pageNum + 1} 0 obj\n<< /Length ${data.length} " +
          "/Filter /FlateDecode >>\nstream\n")
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

  /** Deterministic PDF corpus in the [[Multimodal.mediaSchema]] shape:
    * `doc_id % 3 + 1` pages, version keyed on `doc_id % 5`, page text
    * from [[pdfPageText]]; ODD ids Flate-compress their content
    * streams (the real-corpus form), evens stay plain — so the
    * q_pdf_parse oracle exercises both decode arms while every parser
    * field stays a closed form of doc_id (the compressed arm changes
    * bytes, never parsed fields). */
  def syntheticPdfs(df: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val pages =
            (0 until nPdfPages(id)).map(k => pdfPageText(id, k))
          val bytes = buildPdf(pages, pdfVersion(id), flate = id % 2 == 1)
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
              false, null)
        }
      }
    }(enc).toDF()
  }

  private def parseOne(id: Long, bytes: Array[Byte]): Row = {
    // ISO-8859-1 is byte-preserving: structural scanning happens on
    // this string; literal text re-encodes back to bytes → UTF-8
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-"))
      return Row(id, bytes.length, false, null, null, null, null, false,
        false, null)
    val version = s.substring(5, math.min(s.length,
      s.indexWhere(c => c == '\r' || c == '\n', 5) match {
        case -1 => s.length
        case i => i
      }))
    // page objects counted structurally; /Pages (the tree node) must
    // not count, hence the non-'s' lookahead class
    val nPages =
      "/Type\\s*/Page[^s]".r.findAllMatchIn(s).length
    val declared = "/Type\\s*/Pages\\b".r.findFirstMatchIn(s)
      .flatMap { m =>
        val tail = s.substring(m.start,
          math.min(s.length, m.start + 400))
        "/Count\\s+(\\d+)".r.findFirstMatchIn(tail).map(_.group(1).toInt)
      }
    // ---- xref walk: last startxref → table → offset validation
    var xrefOk = false
    var nObjects: Option[Int] = None
    val sx = s.lastIndexOf("startxref")
    try if (sx >= 0) {
      val after = s.substring(sx + "startxref".length).trim
      val xrefAt = after.takeWhile(_.isDigit)
      if (xrefAt.nonEmpty && xrefAt.toLong < bytes.length &&
          s.startsWith("xref", xrefAt.toLong.toInt)) {
        val tbl = s.substring(xrefAt.toLong.toInt)
        val lines = tbl.linesIterator
        lines.next() // "xref"
        val hdr = lines.next().trim.split("\\s+")
        val first = hdr(0).toInt
        val count = hdr(1).toInt
        var ok = true
        var i = 0
        while (i < count && ok) {
          val ln = lines.next()
          val parts = ln.trim.split("\\s+")
          val objNum = first + i
          if (parts.length >= 3 && parts(2) == "n") {
            val off = parts(0).toLong
            ok = off < bytes.length &&
              s.startsWith(s"$objNum 0 obj", off.toInt)
          } // free entries carry no offset to validate
          i += 1
        }
        xrefOk = ok
        if (ok) {
          val tr = s.indexOf("trailer", xrefAt.toLong.toInt)
          if (tr >= 0)
            nObjects = "/Size\\s+(\\d+)".r
              .findFirstMatchIn(s.substring(tr))
              .map(_.group(1).toInt - 1) // entry 0 is the free head
        }
      }
    } catch {
      // a torn xref table (truncated entries, non-numeric header) means
      // the INDEX is untrustworthy, not the document: xref_ok stays
      // false, text extraction below still runs
      case scala.util.control.NonFatal(_) =>
        xrefOk = false; nObjects = None
    }
    // ---- text: every content stream's show operators. The stream's
    // own dict (between its `N 0 obj` header and the `stream` keyword)
    // names the filter and the byte-exact /Length; the length, when it
    // lands on `endstream` (± an EOL), bounds the body WITHOUT
    // searching inside it — binary Flate data may contain any byte
    // sequence, including "endstream". Fallback: endstream search
    // (the pre-/Length behavior, still right for plain streams).
    val texts = scala.collection.mutable.ArrayBuffer[String]()
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
          val dict = s.substring(math.max(0, s.lastIndexOf("obj", st)), st)
          val flate =
            "/Filter\\s*/FlateDecode\\b".r.findFirstIn(dict).isDefined
          val otherFilter = !flate &&
            "/Filter\\b".r.findFirstIn(dict).isDefined
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
            if (flate) {
              try {
                val inflated = inflate(s.substring(bodyStart, bodyEnd)
                  .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
                val t = showText(new String(inflated,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
                if (t.nonEmpty) texts += t
              } catch {
                case scala.util.control.NonFatal(_) => streamsOk = false
              }
            } else if (otherFilter) {
              streamsOk = false // undecodable here; text lives behind it
            } else {
              val t = showText(s.substring(bodyStart, bodyEnd))
              if (t.nonEmpty) texts += t
            }
            from = endKw + "endstream".length
          }
        }
      }
    }
    val text = if (texts.isEmpty) "" else texts.mkString("\n")
    Row(id, bytes.length, true, version, nPages,
      declared.map(Int.box).orNull, nObjects.map(Int.box).orNull,
      xrefOk, streamsOk, text)
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
        case '[' =>
          val parts = scala.collection.mutable.ArrayBuffer[String]()
          var j = i + 1
          var closed = -1
          while (j < content.length && closed < 0) {
            content(j) match {
              case '(' =>
                val (txt, after) = literal(j)
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
