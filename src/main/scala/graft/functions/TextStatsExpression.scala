package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-class statistics of a document — the native kernel
  * behind token counting and quality scoring. The regex formulation
  * (`regexp_count` with an alternation pattern, plus several `split`s)
  * re-scans the string once per statistic with per-char regex-engine
  * overhead; this computes all counts in a single scan.
  *
  * Semantics (ASCII classes, matching the SQL-oracle definitions):
  *  - ws_tokens: segment count of splitting the space-trimmed text on
  *    `\s+` — i.e. (number of whitespace runs inside the trimmed text)+1
  *    for non-empty text, 0 for empty. This reproduces split() semantics
  *    exactly, INCLUDING the empty leading/trailing segments produced
  *    when the space-trimmed text still starts/ends with `\t`/`\n` etc.
  *    (both Spark split with limit=-1 and DuckDB string_split_regex keep
  *    them), so the oracle comparison holds on any input.
  *  - bpe_tokens: runs of [A-Za-z0-9] count 1 each; every other
  *    non-whitespace char counts 1 (≙ `[A-Za-z0-9]+|[^A-Za-z0-9\s]`)
  *  - alpha: count of [A-Za-z]; punct: count of ASCII punctuation
  *  - nonspace: non-whitespace count in trimmed text (Σ token lengths)
  *  - nchars: codepoint length of the untrimmed text
  * Whitespace = Java regex `\s` = [ \t\n\x0B\f\r].
  */
object TextStatsExpression {

  val statsSchema: StructType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("nonspace", IntegerType, nullable = false),
    StructField("nchars", IntegerType, nullable = false)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  @inline private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  case class TextStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = statsSchema
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n = s.length
      // space-trim bounds (Spark/DuckDB trim() removes ' ' only)
      var lo = 0; var hi = n
      while (lo < hi && s.charAt(lo) == ' ') lo += 1
      while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
      var wsRuns = 0; var bpe = 0; var alpha = 0; var punct = 0
      var nonspace = 0
      var inWsRun = false; var inAlnumRun = false
      var i = 0
      var nchars = 0
      // iterate CODE POINTS (an astral char is one regex "character" in
      // both Spark's and DuckDB's engines — counting UTF-16 units would
      // double-count emoji/astral-CJK in bpe/nonspace)
      while (i < n) {
        val cp = s.codePointAt(i)
        val c = if (cp <= 0xFFFF) cp.toChar else '￿' // astral: "other"
        if (isAlnum(c)) { if (!inAlnumRun) bpe += 1; inAlnumRun = true }
        else {
          inAlnumRun = false
          if (!isWs(c)) bpe += 1
        }
        if (c >= 'A' && c <= 'Z' || c >= 'a' && c <= 'z') alpha += 1
        if (isPunct(c)) punct += 1
        if (i >= lo && i < hi) {
          if (isWs(c)) { if (!inWsRun) wsRuns += 1; inWsRun = true }
          else { inWsRun = false; nonspace += 1 }
        }
        nchars += 1
        i += Character.charCount(cp)
      }
      // split-on-\s+ segment count = whitespace runs + 1 (empty text → 0)
      val wsTokens = if (hi == lo) 0 else wsRuns + 1
      InternalRow(wsTokens, bpe, alpha, punct, nonspace, nchars)
    }
  }

  /** struct(ws_tokens, bpe_tokens, alpha, punct, nonspace, nchars). */
  def textStats(c: Column): Column = column(TextStats(expression(c)))

  /** zlib-deflate compressed byte size of the UTF-8 text (raw deflate,
    * level 6, no wrapper) — the kernel behind the COMPRESSION-RATIO
    * quality signal (the Dolma / RedPajama-v2 "gzip ratio": templated,
    * boilerplate or repetitive text compresses far below prose; random
    * or already-compressed junk barely compresses at all). A JVM
    * Deflater is allocated per CALL — deflate dominates the allocation
    * by orders of magnitude, and per-row state keeps the expression
    * thread-safe under whole-stage codegen.
    *
    * Determinism: exact for a given zlib/JDK implementation (same
    * input → same bytes → same size) but NOT pinned across zlib
    * versions, so this signal is SPEC-pinned (FiltersSpec properties)
    * rather than DuckDB-oracle-hashed — consumers should threshold on
    * it, not hash it. */
  def deflateSize(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  case class DeflateSize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      deflateSize(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextStatsExpression.deflateSize($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "graft_deflate_size"
  }

  /** Deflate-compressed size (bytes) of a string column. */
  def deflateSize(c: Column): Column = column(DeflateSize(expression(c)))
}
