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
}
