package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native expression: the driver-built
  * filter ships inside the plan (serialized bytes, deserialized once per
  * executor via the transient lazy) and the probe is a map-only scan —
  * the standard semi-join reduction for "is this key in the (large)
  * reference set" when the set is too big to broadcast as exact hashes
  * but its Bloom bits (~1.2 bytes/key at 1% fpp vs 8 bytes/key) still
  * fit. False positives must be re-verified by an exact join downstream;
  * false negatives do not occur. */
object BloomExpressions {

  case class MightContainLong(child: Expression, bfBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    @transient private lazy val bf =
      BloomFilter.readFrom(new ByteArrayInputStream(bfBytes))
    override def nullSafeEval(input: Any): Any =
      bf.mightContainLong(input.asInstanceOf[Long])
  }

  def mightContainLong(c: Column, bf: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    column(MightContainLong(expression(c), bos.toByteArray))
  }
}
