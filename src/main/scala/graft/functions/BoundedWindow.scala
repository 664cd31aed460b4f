package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Constant partition key for windows whose input is PROVABLY BOUNDED
  * (post-`limit(k)` tables, distinct-value grids, per-stratum metadata
  * tables) — the single-partition sort is intended there, not an
  * accident.
  *
  * Why not just `Window.orderBy(...)`: an EMPTY partition spec is
  * indistinguishable from the accidental whole-table global window —
  * the #1 scale anti-pattern this repo guards against (an unbounded
  * vocabulary through one task). Spark even logs a warning for every
  * such window. And why not `partitionBy(lit(0))`: the
  * `EliminateWindowPartitions` optimizer rule strips FOLDABLE partition
  * keys back to the empty spec, reviving the ambiguity.
  *
  * [[BoundedPartitionKey]] is a deterministic constant that is NOT
  * foldable, so it survives optimization: every intentional bounded
  * window carries it, `PlanGuardSpec` asserts that NO window in any
  * driver query has an empty partition spec (a new one is an
  * unreviewed scale hazard by construction), and Spark's
  * "No Partition Defined" warning never fires on a reviewed plan.
  * Execution shape is identical to the empty spec: all (≤ bounded)
  * rows hash to one partition and sort once. */
case class BoundedPartitionKey() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override def prettyName: String = "bounded_partition_key"
}

object BoundedWindow {

  /** The marker key — see [[BoundedPartitionKey]]. */
  def key: Column = column(BoundedPartitionKey())

  /** `Window.partitionBy(<bounded marker>).orderBy(cols)` — use ONLY
    * when the window's input is bounded by construction; state the
    * bound at the call site. */
  def ordered(cols: Column*): WindowSpec =
    Window.partitionBy(key).orderBy(cols: _*)
}
