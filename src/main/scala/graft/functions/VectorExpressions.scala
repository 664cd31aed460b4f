package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels over `array<float>` / `array<double>` columns.
  *
  * The `zip_with`+`aggregate` formulation is correct but runs in the
  * interpreted higher-order-function path: ~10 boxed expression
  * evaluations per vector element per pair. An all-pairs near-dup join at
  * 64 dims does billions of those. These expressions read the ArrayData
  * buffers directly in one JVM loop — double accumulation, left-to-right,
  * so results are bit-identical to the sequential formulation (and to the
  * DuckDB oracle's list_dot_product).
  */
object VectorExpressions {

  private def num(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element $et")
  }

  abstract class VectorBinary extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    protected def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType
  }

  /** Σ a_i·b_i over the common prefix length, in doubles. */
  case class DotProduct(left: Expression, right: Expression)
      extends VectorBinary {
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(la.numElements(), ra.numElements())
      var acc = 0.0; var i = 0
      while (i < n) { acc += num(la, lt, i) * num(ra, rt, i); i += 1 }
      acc
    }
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. Equals
    * dot(a,b)/(sqrt(dot(a,a))·sqrt(dot(b,b))) with sequential double
    * accumulation. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends VectorBinary {
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(la.numElements(), ra.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = num(la, lt, i); val y = num(ra, rt, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
  }

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Asymmetric-distance lookup for product quantization: `codes` is the
    * corpus row's array<int> of per-subspace centroid indices, `lut` the
    * query's array<array<double>> of precomputed ‖q_j − c_{j,i}‖² partial
    * distances. Result = Σ_j lut(j)(codes(j)), j ascending — one array
    * index per subspace instead of any vector math on the hot side. */
  case class AdcDistance(left: Expression, right: Expression)
      extends VectorBinary {
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val lut = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      var acc = 0.0; var j = 0
      while (j < m) {
        acc += lut.getArray(j).getDouble(codes.getInt(j))
        j += 1
      }
      acc
    }
  }

  def adcDistance(codes: Column, lut: Column): Column =
    column(AdcDistance(expression(codes), expression(lut)))
}
