package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of the
  * same entity belong to one session while the gap between them stays
  * ≤ `maxGap`; a larger gap opens a new session. The batch twin of the
  * classic streaming session window — useful both for behavioral event
  * data (user sessions over the `events` table) and for observation runs
  * in time-series astronomy (nights of observations split by the day
  * gap; cf. `find_day_gap_offset`, which this generalizes per-entity).
  *
  * Scale design: one window per entity (PARTITION BY id — never a global
  * window), one aggregate. Both shuffle on the entity key only; a
  * pathological single entity with millions of events serializes only
  * its own partition, which is inherent to the per-entity cumulative
  * semantics (same posture as `sort_lightcurves`).
  *
  * Determinism: events are ordered by (ts, tiebreak) so equal timestamps
  * order stably; the boundary predicate is `gap > maxGap` (a gap of
  * exactly `maxGap` stays in-session). */
object Sessionize {

  /** One row per (entity, session): (idCol, session_id, n_events,
    * start_ts, end_ts, duration) with session_id numbered from 0 in time
    * order per entity. `tsCol` is any numeric time column; `maxGap` is in
    * the same units. `tiebreakCol` breaks equal-timestamp order (pass a
    * unique event id). */
  def sessionize(events: DataFrame, idCol: String, tsCol: String,
      maxGap: Double, tiebreakCol: String): DataFrame = {
    require(maxGap >= 0, s"maxGap must be >= 0, got $maxGap")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val flagged = events
      .withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .withColumn("session_id",
        sum(when(col("__gap") > maxGap, 1L).otherwise(0L)).over(w))
    flagged.groupBy(col(idCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))
  }
}
