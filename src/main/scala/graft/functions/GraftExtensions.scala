package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, ConcatWs, Divide, Expression, ExpressionInfo, Literal, RegExpReplace, ShiftRightUnsigned}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** SparkSessionExtensions installer exposing graft's native expressions to
  * the SQL surface (`spark.sql("SELECT graft_cosine(a, b) ...")`), so the
  * engine's kernels are usable from pure-SQL pipelines and
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` works on
  * a plain spark-submit.
  *
  * Integer parameters (shingle length, signature size) are taken from
  * literal arguments at resolution time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two vectors"),
      (args: Seq[Expression]) =>
        VectorExpressions.DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity"),
      (args: Seq[Expression]) =>
        VectorExpressions.CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit simhash"),
      (args: Seq[Expression]) => HashExpressions.SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text, n) - distinct n-gram hashes"),
      (args: Seq[Expression]) => HashExpressions.ShingleHashes(args(0),
        intLit(args(1), "shingle length"))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, k) - k-element minhash signature"),
      (args: Seq[Expression]) => HashExpressions.MinHashFromHashes(args(0),
        intLit(args(1), "signature size"))))
    ext.injectFunction((FunctionIdentifier("graft_text_stats"),
      info("graft_text_stats",
        "graft_text_stats(text) - one-pass char-class statistics struct"),
      (args: Seq[Expression]) => TextStatsExpression.TextStats(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_md5long"),
      info("graft_md5long",
        "graft_md5long(text) - md5-derived 64-bit hash (oracle-stable)"),
      (args: Seq[Expression]) => HashExpressions.Md5Long(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC normalization (codegen'd)"),
      (args: Seq[Expression]) => NormalizeExpression.NfcNormalize(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_fold_accents"),
      info("graft_fold_accents",
        "graft_fold_accents(text) - NFD accent folding (combining marks " +
          "stripped; codegen'd)"),
      (args: Seq[Expression]) => NormalizeExpression.FoldAccents(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (classic " +
          "0.7-boost-threshold variant, DuckDB-compatible)"),
      (args: Seq[Expression]) =>
        StringSimilarityExpressions.JaroWinkler(args(0), args(1))))
    // Composed functions are hand-built as RESOLVED catalyst trees: the
    // Column→Expression bridge yields unresolved function nodes that the
    // SQL path never re-analyzes (internal codegen error), so the trees
    // the Scala API produces are restated op-for-op here and pinned equal
    // by SqlExtensionsSpec.
    ext.injectFunction((FunctionIdentifier("graft_hash_uniform"),
      info("graft_hash_uniform",
        "graft_hash_uniform(key, seed) - deterministic uniform in [0,1) " +
          "from an md5-derived hash; the mixture-sampling primitive"),
      (args: Seq[Expression]) => {
        val seed = longLit(args(1), "seed")
        val keyed = ConcatWs(Seq(Literal("|"),
          Cast(args(0), StringType), Literal(seed.toString)))
        Divide(
          Cast(ShiftRightUnsigned(HashExpressions.Md5Long(keyed),
            Literal(11)), DoubleType),
          Literal(9007199254740992.0)) // 2^53
      }))
    ext.injectFunction((FunctionIdentifier("graft_deflate_size"),
      info("graft_deflate_size",
        "graft_deflate_size(text) - zlib-deflate compressed byte size " +
          "(the compression-ratio quality signal's kernel; codegen'd)"),
      (args: Seq[Expression]) => TextStatsExpression.DeflateSize(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_redact_pii"),
      info("graft_redact_pii",
        "graft_redact_pii(text) - redact emails/phones/IPv4s " +
          "(TextAnalysis.PiiPatterns, applied in order)"),
      (args: Seq[Expression]) =>
        graft.text.TextAnalysis.PiiPatterns.foldLeft(args(0)) {
          case (acc, (_, pat)) =>
            RegExpReplace(acc, Literal(pat), Literal("<PII>"))
        }))
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
