package graft.analysis

import graft.core.ColumnMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Registration surface for per-lightcurve analysis aggregates — the Scala
  * counterpart of the reference's `AnalysisFunction` protocol
  * (src/tape/analysis/base.py:11-102): a function declares which physical
  * columns it consumes (`cols` ≙ base.py:33), the schema of its output rows
  * (`outputSchema` ≙ the Dask `meta`, base.py:52), and its default grouping
  * keys (`on` ≙ base.py:70).
  *
  * The batch engine (graft.batch.Batch) hands each group's rows — projected
  * to `cols(cm)`, in that column order — to `apply` and prepends the group
  * key columns to every returned row. Groups are single lightcurves (or
  * (lightcurve, band) pairs), so materializing them as a Seq is bounded by
  * per-object observation counts, exactly like the reference's per-group
  * pandas frames.
  */
trait AnalysisFunction extends Serializable {
  def cols(cm: ColumnMap): Seq[String]
  def outputSchema: StructType
  def on(cm: ColumnMap): Seq[String] = Seq(cm.id)
  def apply(rows: Seq[Row]): Seq[Row]
}

object AnalysisFunction {
  /** Numeric accessor tolerant of int/long/float/double physical types
    * (the reference data mixes f32/f64/int64 freely, SURVEY §1.2). */
  def num(r: Row, i: Int): Double = r.get(i) match {
    case null       => Double.NaN
    case d: Double  => d
    case f: Float   => f.toDouble
    case l: Long    => l.toDouble
    case n: Int     => n.toDouble
    case s: Short   => s.toDouble
    case b: Byte    => b.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case other =>
      throw new IllegalArgumentException(s"non-numeric value $other")
  }

  def str(r: Row, i: Int): String = Option(r.get(i)).map(_.toString).orNull
}
