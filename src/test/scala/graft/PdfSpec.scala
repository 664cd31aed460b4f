package graft

import graft.multimodal.Pdf
import org.apache.spark.sql.functions._

/** PDF structural parse + uncompressed-stream text extraction: writer
  * round-trip against closed forms, escape/balanced-paren handling,
  * poisoned-byte containment. */
class PdfSpec extends SparkSuite {
  import spark.implicits._

  test("pdf round-trip: version, page counts, object count, xref " +
      "validation and Tj/TJ text match the closed forms across the " +
      "plain/Flate content arms and the classic/modern (1.5) layouts") {
    val media = Pdf.syntheticPdfs(
      (0L until 31L).toDF("doc_id"), "doc_id")
    val rows = Pdf.pdfMeta(media).collect()
    assert(rows.length === 31)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = Pdf.nPdfPages(id)
      assert(r.getAs[Boolean]("parsed"), s"id=$id")
      assert(r.getAs[String]("version") === Pdf.pdfVersion(id))
      assert(r.getAs[Int]("n_pages") === n, s"id=$id")
      assert(r.getAs[Int]("pages_declared") === n)
      // modern ids carry two extra objects: the ObjStm + XRef stream
      assert(r.getAs[Int]("n_objects") ===
        (if (id % 5 == 0) 5 else 3) + 2 * n, s"id=$id objects")
      assert(r.getAs[Boolean]("xref_ok"), s"id=$id xref")
      assert(r.getAs[Boolean]("streams_ok"), s"id=$id streams")
      // %11 classic ids carry an incremental update: two validated
      // xref sections and the page-0 revision appended in byte order
      val updated = id % 5 != 0 && id % 11 == 0
      assert(r.getAs[Int]("n_xrefs") === (if (updated) 2 else 1),
        s"id=$id n_xrefs")
      val base =
        (0 until n).map(k => Pdf.pdfPageText(id, k)).mkString("\n")
      val expected =
        if (updated) base + "\n" + Pdf.pdfUpdateText(id) else base
      assert(r.getAs[String]("text") === expected, s"id=$id text")
    }
  }

  test("lzw: decode(encode(x)) is the identity incl. the 9->10->11 bit " +
      "width growth and KwKwK; the /LZWDecode arm parses to the same " +
      "text; corrupt codes flip streams_ok") {
    val small = "tobeornottobeortobeornot".getBytes("UTF-8")
    assert(Pdf.lzwDecode(Pdf.lzwEncode(small)).toSeq === small.toSeq)
    // KwKwK: aaa... makes the decoder reference the entry being built
    val kwk = Array.fill(64)('a'.toByte)
    assert(Pdf.lzwDecode(Pdf.lzwEncode(kwk)).toSeq === kwk.toSeq)
    // enough distinct material to push the table past 511 and 1023
    // entries (width 9 -> 10 -> 11)
    val big = (0 until 4000).map(i => s"w${i % 997}x").mkString
      .getBytes("UTF-8")
    assert(Pdf.lzwEncode(big).length < big.length) // actually compresses
    assert(Pdf.lzwDecode(Pdf.lzwEncode(big)).toSeq === big.toSeq)
    // random bytes survive (encode/decode total on any input)
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(2048)(rnd.nextInt(256).toByte)
    assert(Pdf.lzwDecode(Pdf.lzwEncode(noise)).toSeq === noise.toSeq)
    val pages = Seq("lzw page (one) a\\b", "lzw page two")
    val b = Pdf.buildPdf(pages, lzw = true)
    val s = new String(b, "ISO-8859-1")
    assert(s.contains("/LZWDecode") && !s.contains("/FlateDecode"))
    def parse(bytes: Array[Byte]) = Pdf.pdfMeta(
      Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))).head()
    val ok = parse(b)
    assert(ok.getAs[Boolean]("parsed") && ok.getAs[Boolean]("xref_ok"))
    assert(ok.getAs[Boolean]("streams_ok"))
    assert(ok.getAs[String]("text") === pages.mkString("\n"))
    // corrupt the first LZW body: that stream drops, the other stands
    val body1 = s.indexOf("\n", s.indexOf("stream\n")) + 1
    val bad = b.clone()
    bad(body1) = (bad(body1) ^ 0x7F).toByte
    bad(body1 + 1) = (bad(body1 + 1) ^ 0x7F).toByte
    val dam = parse(bad)
    assert(dam.getAs[Boolean]("parsed"))
    // either the codes go out of range (throw -> contained) or decode
    // to garbage without a Tj: text never contains page one's string
    assert(!dam.getAs[String]("text").contains("lzw page (one)"))
  }

  test("hex show strings: <…> Tj / TJ decode with whitespace and " +
      "odd-digit padding; << stays a dictionary; multi-byte UTF-8 " +
      "round-trips; the hex writer arm matches the literal arm's text") {
    assert(Pdf.showText("BT <414243> Tj ET") === "ABC")
    assert(Pdf.showText("<41 42\n43> Tj") === "ABC") // ws between digits
    assert(Pdf.showText("<414243 4> Tj") === "ABC@") // odd: low nibble 0
    assert(Pdf.showText("[<41> -120 <42> 3 (C)] TJ") === "ABC")
    assert(Pdf.showText("<48656C6C6F> Td <41> Tj") === "A") // non-show drops
    assert(Pdf.showText("<< /D <41> >> (x) Tj") === "x") // dict, not string
    val pages = Seq("hex über ✓ (p) a\\b", "日本語テキスト")
    val hexB = Pdf.buildPdf(pages, hex = true)
    val litB = Pdf.buildPdf(pages)
    assert(!java.util.Arrays.equals(hexB, litB))
    def parse(bytes: Array[Byte]) = Pdf.pdfMeta(
      Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))).head()
    val r = parse(hexB)
    assert(r.getAs[Boolean]("parsed") && r.getAs[Boolean]("xref_ok"))
    assert(r.getAs[String]("text") === pages.mkString("\n"))
    assert(r.getAs[String]("text") === parse(litB).getAs[String]("text"))
    // hex + modern layout compose
    val modHex = Pdf.buildPdf(pages, "1.5", flate = true, modern = true,
      hex = true)
    assert(parse(modHex).getAs[String]("text") === pages.mkString("\n"))
  }

  test("incremental update: the /Prev chain walk validates BOTH xref " +
      "sections (n_xrefs = 2), the revision text appends, and a torn " +
      "/Prev pointer fails the whole chain") {
    val pages = Seq("base page zero", "base page one")
    val b = Pdf.buildPdfUpdated(pages, updateText = "page zero rev2")
    def parse(bytes: Array[Byte]) = Pdf.pdfMeta(
      Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))).head()
    val r = parse(b)
    assert(r.getAs[Boolean]("parsed") && r.getAs[Boolean]("xref_ok"))
    assert(r.getAs[Int]("n_xrefs") === 2)
    assert(r.getAs[Int]("n_objects") === 7) // size unchanged: replaced
    assert(r.getAs[String]("text") ===
      "base page zero\nbase page one\npage zero rev2")
    // corrupt the /Prev target (base table's first in-use offset):
    // the newest section still validates but the CHAIN must not
    val s = new String(b, "ISO-8859-1")
    val baseXref = s.indexOf("xref\n0 ")
    val entry = s.indexOf("\n", s.indexOf("65535 f", baseXref)) + 1
    val bad = b.clone()
    bad(entry) = if (bad(entry) == '0'.toByte) '1'.toByte else '0'.toByte
    val dam = parse(bad)
    assert(dam.getAs[Boolean]("parsed"))
    assert(!dam.getAs[Boolean]("xref_ok"))
    assert(dam.isNullAt(dam.fieldIndex("n_xrefs")))
    // a /Prev pointing at itself (cycle) terminates, flagged invalid
    val cyc = s.replace(s"/Prev ${s.substring(
      s.indexOf("/Prev ") + 6).takeWhile(_.isDigit)}",
      s"/Prev ${s.substring(s.lastIndexOf("startxref") + 9).trim
        .takeWhile(_.isDigit)}")
    val cr = parse(cyc.getBytes("ISO-8859-1"))
    assert(cr.getAs[Boolean]("parsed") && !cr.getAs[Boolean]("xref_ok"))
  }

  test("modern layout: ObjStm + xref stream structure, no trailer " +
      "keyword; corrupt ObjStm contains — text survives, index doesn't") {
    val pages = Seq("modern (one)", "modern two")
    val b = Pdf.buildPdf(pages, "1.5", flate = true, modern = true)
    val str = new String(b, "ISO-8859-1")
    assert(str.contains("/ObjStm") && str.contains("/XRef"))
    assert(!str.contains("trailer"))
    def parse(bytes: Array[Byte]) = Pdf.pdfMeta(
      Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))).head()
    val ok = parse(b)
    assert(ok.getAs[Boolean]("parsed") && ok.getAs[Boolean]("xref_ok"))
    assert(ok.getAs[Boolean]("streams_ok"))
    assert(ok.getAs[Int]("n_pages") === 2) // dicts live INSIDE the ObjStm
    assert(ok.getAs[Int]("pages_declared") === 2)
    assert(ok.getAs[Int]("n_objects") === 9) // 5 + 2n with n=2
    assert(ok.getAs[String]("text") === pages.mkString("\n"))
    // corrupt the ObjStm's zlib: page dicts become unreadable and the
    // type-2 xref entries fail cross-validation, but the CONTENT
    // streams are separate objects — the text still extracts
    val osAt = str.indexOf("/ObjStm")
    val body = str.indexOf("\n", str.indexOf("stream", osAt)) + 1
    val bad = b.clone()
    bad(body + 4) = (bad(body + 4) ^ 0x5A).toByte
    bad(body + 5) = (bad(body + 5) ^ 0x5A).toByte
    val dam = parse(bad)
    assert(dam.getAs[Boolean]("parsed"))
    assert(!dam.getAs[Boolean]("streams_ok"))
    assert(!dam.getAs[Boolean]("xref_ok"))
    assert(dam.getAs[Int]("n_pages") === 0)
    assert(dam.getAs[String]("text") === pages.mkString("\n"))
    // truncating before the xref stream kills the index, not the text
    val cut = java.util.Arrays.copyOf(b, str.indexOf("/XRef") - 8)
    val torn = parse(cut)
    assert(torn.getAs[Boolean]("parsed"))
    assert(!torn.getAs[Boolean]("xref_ok"))
    assert(torn.getAs[String]("text") === pages.mkString("\n"))
  }

  test("flate arm: compressed bytes differ from plain but parse to the " +
      "same text; corrupt zlib flips streams_ok, other streams survive") {
    val pages = Seq("first (compressed) page", "second page")
    val plain = Pdf.buildPdf(pages)
    val flate = Pdf.buildPdf(pages, flate = true)
    assert(!java.util.Arrays.equals(plain, flate))
    assert(new String(flate, "ISO-8859-1").contains("/FlateDecode"))
    def parse(bytes: Array[Byte]) = Pdf.pdfMeta(
      Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))).head()
    val ok = parse(flate)
    assert(ok.getAs[Boolean]("parsed") && ok.getAs[Boolean]("xref_ok"))
    assert(ok.getAs[Boolean]("streams_ok"))
    assert(ok.getAs[String]("text") === pages.mkString("\n"))
    // corrupt the FIRST stream's zlib payload: its text drops,
    // streams_ok flips, the second stream still extracts
    val s = new String(flate, "ISO-8859-1")
    val body1 = s.indexOf("\n", s.indexOf("stream\n")) + 1
    val bad = flate.clone()
    bad(body1 + 4) = (bad(body1 + 4) ^ 0x5A).toByte
    bad(body1 + 5) = (bad(body1 + 5) ^ 0x5A).toByte
    val dam = parse(bad)
    assert(dam.getAs[Boolean]("parsed"))
    assert(!dam.getAs[Boolean]("streams_ok"))
    assert(dam.getAs[String]("text") === "second page")
  }

  test("showText: escapes, balanced parens, TJ kerning arrays, " +
      "literals not followed by a show operator drop") {
    assert(Pdf.showText("BT (a\\(b\\)c \\\\ d) Tj ET") === "a(b)c \\ d")
    // balanced unescaped parens are legal inside a literal (§7.3.4.2)
    assert(Pdf.showText("(outer (inner) tail) Tj") ===
      "outer (inner) tail")
    assert(Pdf.showText("[(A) -120 (B) 3 (C)] TJ") === "ABC")
    assert(Pdf.showText("(positioned) Td (shown) Tj") === "shown")
    assert(Pdf.showText("[(no closer) (x)") === "")
    assert(Pdf.showText("(esc newline \\n tab \\t) Tj") ===
      "esc newline \n tab \t")
    // octal escapes: 3-digit, shorter-than-3 stops at the first
    // non-octal digit, high bytes; \ + EOL is a continuation (vanishes)
    assert(Pdf.showText("(\\101\\102C) Tj") === "ABC")
    assert(Pdf.showText("(\\12) Tj") === "\n")
    assert(Pdf.showText("(\\0053) Tj") === "\u0005" + "3")
    assert(Pdf.showText("(split \\\nacross \\\r\nlines) Tj") ===
      "split across lines")
    assert(Pdf.showText("(\\b\\f) Tj") === "\b\f")
  }

  test("containment: non-PDF bytes, truncated tails and a torn xref " +
      "degrade without throwing") {
    val good = Pdf.buildPdf(Seq("hello (p) one", "page two"), "1.4")
    def parse(bytes: Array[Byte]) = {
      val df = Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
        .withColumn("bytes", lit(bytes))
      Pdf.pdfMeta(df).head()
    }
    val notPdf = parse("plain text, no magic".getBytes("UTF-8"))
    assert(!notPdf.getAs[Boolean]("parsed"))
    assert(!notPdf.getAs[Boolean]("xref_ok"))
    // cut the trailer/startxref: text still extracts, xref fails
    val torn = parse(java.util.Arrays.copyOf(good, good.length - 60))
    assert(torn.getAs[Boolean]("parsed"))
    assert(!torn.getAs[Boolean]("xref_ok"))
    assert(torn.getAs[String]("text") === "hello (p) one\npage two")
    // flip one xref offset digit: validation must notice
    val s = new String(good, "ISO-8859-1")
    val at = s.indexOf("xref\n0 ")
    val entry = s.indexOf("\n", s.indexOf("65535 f")) + 1
    val bad = good.clone()
    bad(entry) = if (bad(entry) == '0'.toByte) '1'.toByte
      else '0'.toByte
    assert(at > 0)
    val tornXref = parse(bad)
    assert(tornXref.getAs[Boolean]("parsed"))
    assert(!tornXref.getAs[Boolean]("xref_ok"))
  }

  test("multi-byte text round-trips through the UTF-8 literal contract") {
    val pages = Seq("über ✓ page (with parens)", "日本語テキスト")
    val good = Pdf.buildPdf(pages)
    val df = Pdf.syntheticPdfs(Seq(1L).toDF("doc_id"), "doc_id")
      .withColumn("bytes", lit(good))
    val r = Pdf.pdfMeta(df).head()
    assert(r.getAs[Boolean]("parsed") && r.getAs[Boolean]("xref_ok"))
    assert(r.getAs[String]("text") === pages.mkString("\n"))
  }

  test("buildPdf emits a spec-shaped file: header, startxref lands on " +
      "the xref keyword, %%EOF terminator") {
    val b = Pdf.buildPdf(Seq("only page"), "1.5")
    val s = new String(b, "ISO-8859-1")
    assert(s.startsWith("%PDF-1.5\n"))
    assert(s.trim.endsWith("%%EOF"))
    val sx = s.substring(s.lastIndexOf("startxref") + 9).trim
      .takeWhile(_.isDigit).toInt
    assert(s.startsWith("xref", sx))
  }

  test("parseToUnicode: bfchar pairs, scalar bfrange (last code unit " +
      "increments), array bfrange, entry cap") {
    val cmap = "begincmap\n" +
      "2 beginbfchar\n<0041> <0058>\n<0042> <00E90301>\nendbfchar\n" +
      "1 beginbfrange\n<0100> <0103> <0030>\nendbfrange\n" +
      "1 beginbfrange\n<0200> <0202> [<0061> <0062> <0063>]\n" +
      "endbfrange\nendcmap"
    val m = Pdf.parseToUnicode(cmap)
    assert(m(0x41) === "X")
    assert(m(0x42) === "\u00e9\u0301") // multi-unit dst survives
    assert((0 to 3).map(k => m(0x100 + k)).mkString === "0123")
    assert((0 to 2).map(k => m(0x200 + k)).mkString === "abc")
    assert(!m.contains(0x203))
  }

  test("simpleFontDecoder: WinAnsi base decodes cp1252 bytes, " +
      "Differences slots override, unknown glyphs decode U+FFFD") {
    val dec = Pdf.simpleFontDecoder("WinAnsiEncoding",
      Some("128 /Euro /bullet 200 /nosuchglyph"))
    assert(dec("Ab1".getBytes("ISO-8859-1")) === "Ab1")
    assert(dec(Array(0x80.toByte, 0x81.toByte)) === "\u20ac\u2022")
    assert(dec(Array(0x92.toByte)) === "\u2019") // cp1252 right quote
    assert(dec(Array(200.toByte)) === "\ufffd")
    val std = Pdf.simpleFontDecoder("StandardEncoding", None)
    assert(std("plain".getBytes("ISO-8859-1")) === "plain")
    assert(std(Array(0x92.toByte)) === "\ufffd") // no cp1252 in Standard
  }

  test("showText: /Name … Tf switches decoders mid-stream; unknown " +
      "names and no-font documents stay identity") {
    val fonts = Map[String, Pdf.PdfDecoder](
      "F9" -> (raw => raw.map(b => (b + 1).toChar).mkString))
    val content = "BT /F9 12 Tf (abc) Tj /F1 10 Tf (abc) Tj ET"
    assert(Pdf.showText(content, fonts) === "bcdabc")
    assert(Pdf.showText(content) === "abcabc") // no fonts: identity
  }

  test("buildPdfEncoded end to end: Differences + WinAnsi simple font, " +
      "mid-stream switch, ToUnicode CID page — decoded text matches " +
      "the closed form; xref validates") {
    for (id <- Seq(0L, 5L, 13L)) {
      val df = Pdf.syntheticEncodedPdfs(Seq(id).toDF("doc_id"), "doc_id")
      val r = Pdf.pdfMeta(df).head()
      assert(r.getAs[Boolean]("parsed") && r.getAs[Boolean]("xref_ok"))
      assert(r.getAs[Boolean]("streams_ok"))
      assert(r.getAs[Int]("n_pages") === 2)
      assert(r.getAs[Int]("n_objects") === 9)
      assert(r.getAs[String]("text") === Pdf.pdfEncodedText(id),
        s"id=$id")
    }
  }

  test("pdfImages: embedded XObject images parse in file order; DCT " +
      "bodies ImageIO-verify, Flate bitmaps inflate to w*h*3; " +
      "truncated bodies read decode_ok=false; pdfMeta coexists") {
    for (id <- Seq(0L, 7L, 23L)) {
      val df = Pdf.syntheticImagePdfs(Seq(id).toDF("doc_id"), "doc_id")
      val rows = Pdf.pdfImages(df).collect()
        .map(r => r.getAs[Int]("image_idx") ->
          ((r.getAs[Int]("width"), r.getAs[Int]("height"),
            r.getAs[String]("filter"), r.getAs[Boolean]("decode_ok"))))
        .toMap
      assert(rows(0) === ((Pdf.pdfImgRawW(id), Pdf.pdfImgRawH(id),
        "FlateDecode", true)), s"id=$id raw")
      assert(rows(1) === ((Pdf.pdfImgTextW(id), Pdf.pdfImgTextH(id),
        "DCTDecode", true)), s"id=$id jpeg")
      // the text lane still reads the page's show operator
      val meta = Pdf.pdfMeta(df).head()
      assert(meta.getAs[Boolean]("xref_ok"))
      assert(meta.getAs[String]("text") === s"img doc ${id % 9}")
    }
    // containment: corrupt the DCT body -> decode_ok false, not a throw
    val good = Pdf.buildPdfWithImages(3L)
    val s = new String(good, "ISO-8859-1")
    val at = s.indexOf("stream", s.indexOf("/DCTDecode")) + 8
    val bad = good.clone()
    var i = at + 2
    while (i < at + 40 && i < bad.length) { bad(i) = 0; i += 1 }
    val rows2 = Pdf.pdfImages(Pdf.syntheticImagePdfs(
        Seq(3L).toDF("doc_id"), "doc_id")
      .withColumn("bytes", lit(bad))).collect()
      .map(r => r.getAs[Int]("image_idx") ->
        r.getAs[Boolean]("decode_ok")).toMap
    assert(rows2(0) === true)
    assert(rows2(1) === false)
  }
}
