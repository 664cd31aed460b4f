package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level HTTP payload kernels as NATIVE codegen'd expressions —
  * the ingest-boundary fix for non-UTF-8 crawls: a real WARC corpus is
  * full of windows-1252 / Shift-JIS / GBK responses whose bytes must
  * survive until the charset that `httpResponseMeta` DETECTS (from the
  * Content-Type header) can drive the decode. Decoding the whole
  * payload as UTF-8 at read time replacement-chars exactly the
  * non-English slice mixture balancing cares about, so the body split,
  * chunked-transfer reassembly and charset decode below all run on the
  * reader's `payload_bytes` BINARY column, in that order (chunk sizes
  * count octets, so dechunking must precede any charset decode).
  *
  * Spark's stock `decode(bin, charset)` cannot express this: since
  * SPARK-47307-era hardening it rejects any charset outside a seven-
  * entry whitelist (no windows-1252, no shift_jis) unless a legacy
  * flag is set, and the charset argument must be foldable — while here
  * the charset is a per-row COLUMN the wire metadata produced. Hence
  * [[CharsetDecodeExpr]], a real `doGenCode` expression (one static
  * kernel call, stays inside WholeStageCodegen) with replacement
  * semantics for unmappable bytes and a documented UTF-8 fallback for
  * unknown labels.
  *
  * Scale: all three are map-only, allocation-proportional to one row's
  * payload, zero shuffle — the [[NormalizeExpression]] posture. */
object HttpBytesExpressions {

  /** Resolved-charset cache: `Charset.forName` takes an uncontended
    * lock and label canonicalization allocates; a 100 TB scan calls
    * this per row with a handful of distinct labels. Values are
    * `null` for labels the JVM cannot resolve (negative caching, so a
    * corpus-wide bogus label doesn't re-throw per row). */
  private val charsetCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.nio.charset.Charset]()

  /** IANA-ish label → JVM charset, or null when unresolvable. Labels
    * arrive lowercased from the wire parse; common aliases the JVM
    * does not register (e.g. bare `shift-jis` spelling variants) are
    * normalized here rather than per-caller. */
  def resolveCharset(label: String): java.nio.charset.Charset = {
    val key = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (key.isEmpty) return null
    charsetCache.computeIfAbsent(key, k => {
      val norm = k match {
        // HTML5 spec maps latin-1 labels onto windows-1252 (the
        // superset browsers actually decode with)
        case "iso-8859-1" | "latin-1" | "latin1" | "iso8859-1" |
            "l1" | "ansi_x3.4-1968" | "us-ascii" | "ascii" |
            "windows-1252" | "cp1252" | "x-cp1252" => "windows-1252"
        case "shift-jis" | "shift_jis" | "sjis" | "x-sjis" |
            "ms_kanji" => "Shift_JIS"
        case "utf8" => "UTF-8"
        case other => other
      }
      try java.nio.charset.Charset.forName(norm)
      catch { case _: Exception => null }
    })
  }

  /** Decode `bytes` with the charset named by `label` (replacement for
    * malformed/unmappable input — never throws on data); unknown or
    * empty labels fall back to UTF-8, the HTML5 default. */
  def decodeCharset(bytes: Array[Byte], label: UTF8String): UTF8String = {
    val cs = {
      val r = resolveCharset(label.toString)
      if (r == null) java.nio.charset.StandardCharsets.UTF_8 else r
    }
    if (cs == java.nio.charset.StandardCharsets.UTF_8)
      UTF8String.fromString(new String(bytes, cs))
    else {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(
          java.nio.charset.CodingErrorAction.REPLACE)
      UTF8String.fromString(
        dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    }
  }

  /** Bytes after the first blank line (CRLF CRLF, tolerating bare-LF
    * separators some archives carry) — the HTTP body slice of a full
    * wire response. Null when the header block never terminates, so a
    * TRUNCATED response is distinguishable from a genuinely
    * empty-bodied one (they both read "" under a string regexp). */
  def httpBodyBytes(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < payload.length) {
      if (payload(i) == '\n') {
        // \n\n or \n\r\n terminate the header block
        if (i + 1 < payload.length && payload(i + 1) == '\n')
          return java.util.Arrays.copyOfRange(payload, i + 2,
            payload.length)
        if (i + 2 < payload.length && payload(i + 1) == '\r' &&
            payload(i + 2) == '\n')
          return java.util.Arrays.copyOfRange(payload, i + 3,
            payload.length)
      }
      i += 1
    }
    null
  }

  /** RFC 9112 §7.1 chunked-transfer reassembly over OCTETS (sizes
    * count bytes, so this must run BEFORE any charset decode): hex
    * size lines (extensions after `;` ignored), CRLF framing with
    * bare-LF tolerance, trailers after the 0-chunk dropped. Null when
    * the framing is malformed — callers keep the raw bytes and flag
    * the row, the poisoned-row containment posture. */
  def dechunkBytes(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (true) {
      var j = i
      var size = 0L
      var digits = 0
      while (j < b.length && Character.digit(b(j).toChar, 16) >= 0) {
        size = size * 16 + Character.digit(b(j).toChar, 16)
        digits += 1; j += 1
        if (size > Int.MaxValue || digits > 8) return null
      }
      if (digits == 0) return null
      while (j < b.length && b(j) != '\n' && b(j) != '\r') j += 1 // ext
      if (j < b.length && b(j) == '\r') j += 1
      if (j >= b.length || b(j) != '\n') return null
      j += 1
      if (size == 0) return out.toByteArray // trailers drop
      if (j + size > b.length) return null
      out.write(b, j, size.toInt)
      i = j + size.toInt
      if (i < b.length && b(i) == '\r') i += 1
      if (i >= b.length || b(i) != '\n') return null
      i += 1
    }
    null // unreachable
  }

  /** Encode `text` with the charset named by `label` (replacement for
    * unmappable chars; unknown labels fall back to UTF-8) — the
    * writer-side twin of [[decodeCharset]], used to materialize
    * non-UTF-8 wire bodies (fixtures, re-serialization). */
  def encodeCharset(text: UTF8String, label: UTF8String): Array[Byte] = {
    val cs = {
      val r = resolveCharset(label.toString)
      if (r == null) java.nio.charset.StandardCharsets.UTF_8 else r
    }
    if (cs == java.nio.charset.StandardCharsets.UTF_8) text.getBytes
    else {
      val enc = cs.newEncoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(
          java.nio.charset.CodingErrorAction.REPLACE)
      val bb = enc.encode(java.nio.CharBuffer.wrap(text.toString))
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    }
  }

  case class CharsetEncodeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def nullSafeEval(text: Any, label: Any): Any =
      encodeCharset(text.asInstanceOf[UTF8String],
        label.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, l) =>
        s"graft.functions.HttpBytesExpressions.encodeCharset($t, $l)")
    override def prettyName: String = "graft_charset_encode"
  }

  case class CharsetDecodeExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def nullSafeEval(bytes: Any, label: Any): Any =
      decodeCharset(bytes.asInstanceOf[Array[Byte]],
        label.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, l) =>
        s"graft.functions.HttpBytesExpressions.decodeCharset($b, $l)")
    override def prettyName: String = "graft_charset_decode"
  }

  /** Nullable-result unary over binary: the kernel returns null for
    * structurally invalid input even when the INPUT is non-null, so
    * codegen must re-check (plain `defineCodeGen` would leave
    * `isNull=false` on a null value — an NPE downstream). */
  abstract class NullableBytesExpr extends UnaryExpression {
    def kernelName: String
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} =
           |  graft.functions.HttpBytesExpressions.$kernelName($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
  }

  case class HttpBodyBytesExpr(child: Expression)
      extends NullableBytesExpr {
    override def kernelName: String = "httpBodyBytes"
    override protected def withNewChildInternal(c: Expression)
        : Expression = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      httpBodyBytes(input.asInstanceOf[Array[Byte]])
    override def prettyName: String = "graft_http_body_bytes"
  }

  case class DechunkBytesExpr(child: Expression)
      extends NullableBytesExpr {
    override def kernelName: String = "dechunkBytes"
    override protected def withNewChildInternal(c: Expression)
        : Expression = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      dechunkBytes(input.asInstanceOf[Array[Byte]])
    override def prettyName: String = "graft_dechunk_bytes"
  }

  /** Decode a binary column with a PER-ROW charset label column
    * (unknown labels → UTF-8, unmappable bytes → U+FFFD). */
  def charsetDecode(bytes: Column, charsetLabel: Column): Column =
    column(CharsetDecodeExpr(expression(bytes),
      expression(charsetLabel)))

  /** Encode a string column with a PER-ROW charset label column. */
  def charsetEncode(text: Column, charsetLabel: Column): Column =
    column(CharsetEncodeExpr(expression(text),
      expression(charsetLabel)))

  /** HTTP body bytes after the header terminator; null when the
    * header block never terminates (truncated response). */
  def httpBodyBytesCol(payload: Column): Column =
    column(HttpBodyBytesExpr(expression(payload)))

  /** Chunked-transfer reassembly over bytes; null when malformed. */
  def dechunkBytesCol(body: Column): Column =
    column(DechunkBytesExpr(expression(body)))
}
