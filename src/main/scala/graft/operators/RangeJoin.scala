package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: match each point row to the
  * interval rows of the same key whose [start, end] contains its time.
  * Spark plans a raw `t BETWEEN start AND end` join as a
  * BroadcastNestedLoopJoin (or a key-equi join followed by a full
  * per-key cross product) — both O(|points|·|intervals-per-key|) with no
  * shuffle-partition parallelism on the range predicate. This operator is
  * the bucketed EQUI-join form every large engine uses instead: time is
  * quantized into `bucket`-sized cells, an interval is replicated to each
  * cell it spans (⌈span/bucket⌉ copies — bounded, and chosen by the
  * caller to fit the data's typical span), a point lives in exactly one
  * cell, and the join is a plain hash/sort-merge equi-join on
  * (key, cell) with the exact BETWEEN applied as a post-filter. A point
  * matches an interval's replica only in the point's own cell, so no
  * dedup pass is needed.
  *
  * Scale shape (100 TB): one shuffle each side on (key, cell) — AQE
  * sizes and skew-splits it; the range predicate never leaves the
  * codegen'd filter; replication inflates only the (small) interval side
  * by span/bucket. Pick `bucket` ≈ the median interval span: smaller
  * buckets replicate intervals more, larger buckets funnel more
  * non-matching pairs into the post-filter.
  */
object RangeJoin {

  /** Join `points` (one row per observation at `pointTime`) to
    * `intervals` (one row per [startCol, endCol] range) on equal
    * `keyCol` and containment, both bounds inclusive. Returns all point
    * columns plus the interval's columns (minus its key, which equals
    * the point's). Intervals with end < start match nothing. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
      pointTime: String, startCol: String, endCol: String,
      bucket: Double): DataFrame = {
    require(bucket > 0.0, "bucket must be positive")
    val cells = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__cell",
        explode(sequence(
          floor(col(startCol) / bucket).cast("long"),
          floor(col(endCol) / bucket).cast("long"))))
    val pts = points.withColumn("__cell",
      floor(col(pointTime) / bucket).cast("long"))
    pts.join(cells, Seq(keyCol, "__cell"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("__cell")
  }
}
