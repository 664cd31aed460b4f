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
      val expected =
        (0 until n).map(k => Pdf.pdfPageText(id, k)).mkString("\n")
      assert(r.getAs[String]("text") === expected, s"id=$id text")
    }
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
}
