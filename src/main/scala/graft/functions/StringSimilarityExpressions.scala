package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-similarity kernels for fuzzy record linkage.
  *
  * Spark ships `levenshtein` but no Jaro-Winkler; entity resolution over
  * names/titles wants JW (prefix-weighted, length-normalized, O(n·window)
  * instead of O(n·m) DP). One tight JVM loop per row, `CodegenFallback`
  * so surrounding operators still fuse (the HashExpressions pattern).
  *
  * Semantics pinned to the classic Winkler variant — the exact algorithm
  * DuckDB's `jaro_winkler_similarity` implements, so the oracle is a
  * genuinely independent second implementation:
  *   - match window `max(|a|,|b|)/2 - 1`, transpositions halved
  *   - zero matches → 0.0; either side empty → 0.0 (both empty included)
  *   - prefix bonus `min(4, common_prefix) · 0.1 · (1 − jaro)` applied
  *     only when jaro exceeds the 0.7 boost threshold
  *
  * Unicode note: operates on UTF-16 code units of the decoded string —
  * identical to DuckDB on BMP text; fixtures stay BMP.
  */
object StringSimilarityExpressions {

  def jaroWinklerImpl(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(la, lb))
    while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /** `jaro_winkler(a, b)` ∈ [0,1] — see object doc for the exact
    * variant. NULL if either side is NULL. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerImpl(a.asInstanceOf[UTF8String].toString,
        b.asInstanceOf[UTF8String].toString)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
}
