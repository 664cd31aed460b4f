package graft

import graft.multimodal.Pdf
import org.apache.spark.sql.functions._

/** PDF structural parse + uncompressed-stream text extraction: writer
  * round-trip against closed forms, escape/balanced-paren handling,
  * poisoned-byte containment. */
class PdfSpec extends SparkSuite {
  import spark.implicits._

  test("pdf round-trip: version, page counts, object count, xref " +
      "validation and Tj/TJ text match the closed forms") {
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
      assert(r.getAs[Int]("n_objects") === 3 + 2 * n)
      assert(r.getAs[Boolean]("xref_ok"), s"id=$id xref")
      val expected =
        (0 until n).map(k => Pdf.pdfPageText(id, k)).mkString("\n")
      assert(r.getAs[String]("text") === expected, s"id=$id text")
    }
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
