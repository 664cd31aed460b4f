package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a NATIVE codegen'd expression — the
  * canonicalization pass a corpus ingest runs BEFORE hashing, dedup and
  * tokenization: the same text arriving as precomposed `é` (U+00E9) and
  * as `e` + combining acute (U+0065 U+0301) must fingerprint, shingle
  * and tokenize identically, or every dedup/decontamination signal
  * silently misses cross-encoding duplicates. NFC is the W3C-recommended
  * interchange form and what DuckDB's `nfc_normalize` implements, so the
  * oracle replays it natively.
  *
  * This is a real `doGenCode` expression (not `CodegenFallback`): the
  * generated code is one static call on the kernel below, so the whole
  * pipeline stays inside one WholeStageCodegen span with no
  * InternalRow boxing between the scan and the normalize.
  *
  * Scale note: normalization is map-only and allocation-free for text
  * that is already NFC (the `isNormalized` fast path — the overwhelming
  * majority of a web corpus), so running it unconditionally at 100 TB
  * costs one scan of the chars, not a rewrite of the corpus.
  */
object NormalizeExpression {

  /** JVM kernel shared by the interpreted and generated paths. Returns
    * the INPUT object (zero-copy) when the text is already NFC. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NormalizeExpression.nfc($c)")
    override def prettyName: String = "graft_nfc"
  }

  /** NFC-normalize a string column. */
  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))

  /** Accent-folding kernel: NFD decomposition, then every non-spacing
    * combining mark (Unicode category Mn) dropped, code-point-wise —
    * `é`→`e`, `Å`→`A`, while non-accent letters (`ø`, `ß`) and
    * non-Latin scripts pass through untouched. This is the match-key
    * normalization for accent-insensitive dedup/search, and it agrees
    * byte-for-byte with DuckDB's independent utf8proc-based
    * `strip_accents` on Latin accents (pinned by the q_accent_fold
    * oracle). Fast path: already-NFC text with no decomposition returns
    * the input object zero-copy. */
  def foldAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) { if (d == str) s else UTF8String.fromString(d) }
    else {
      val sb = new java.lang.StringBuilder(d.length)
      d.codePoints().forEach { cp =>
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  case class FoldAccents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any =
      foldAccents(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NormalizeExpression.foldAccents($c)")
    override def prettyName: String = "graft_fold_accents"
  }

  /** Accent-fold a string column (NFD + combining-mark strip). */
  def accentFold(c: Column): Column = column(FoldAccents(expression(c)))
}
