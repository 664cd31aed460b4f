package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * operator behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of k clustering keys into one scalar so that range-partitioning
  * and sorting by it co-locates rows that are close in EVERY dimension
  * at once. At 100 TB the payoff is file skipping: a predicate on ANY
  * z-ordered column prunes most files by min/max stats, where a
  * lexicographic sort only prunes on its leading column.
  *
  * [[zValue]] is pure bit arithmetic (clamp each dim to `bits` unsigned
  * bits, interleave round-robin from the LSB: bit i of dim j lands at
  * position i·k + j) — a fixed sum of shift/mask terms that whole-stage
  * codegen fuses into one projection, replayable verbatim in SQL.
  * [[cluster]] applies it: `repartitionByRange` on the z-value (range
  * exchange with sampled bounds) + `sortWithinPartitions`, which is
  * exactly the write-side layout pass before a parquet sink.
  */
object ZOrder {

  /** Morton interleave of `dims` (each cast to long and CLAMPED to
    * [0, 2^bits)) — `bits` per dimension, k·bits ≤ 63 total. Clamping
    * (not masking) keeps out-of-range values at the cube's edge so
    * ordering degrades gracefully instead of wrapping around. */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty, "need at least one dimension")
    require(bits >= 1 && dims.size * bits <= 63,
      s"k*bits must fit a positive long: k=${dims.size}, bits=$bits")
    val k = dims.size
    val lim = (1L << bits) - 1L
    // NULL dims clamp to the origin (not a NULL z that a range
    // partitioner would segregate arbitrarily)
    val clamped = dims.map(d =>
      least(greatest(coalesce(d.cast("long"), lit(0L)), lit(0L)),
        lit(lim)))
    val terms = for {
      i <- 0 until bits
      (d, j) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Range-partition + locally sort `df` by the z-value of `dims` —
    * the layout pass: `numPartitions` output partitions, each holding a
    * contiguous z-range (≈ a k-dimensional tile), ready for a parquet
    * write whose per-file min/max stats are tight in every dimension.
    * Keeps the z-value in `zCol` so callers can inspect/bucket it. */
  def cluster(df: DataFrame, dims: Seq[Column], numPartitions: Int,
      bits: Int = 16, zCol: String = "z"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions: $numPartitions")
    df.withColumn(zCol, zValue(dims, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
