package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: bucket time into fixed windows
  * (days, weeks — any integer unit), assign every entity to the cohort of
  * its FIRST active bucket, and count how many of each cohort's entities
  * are still active `offset` buckets later — the classic retention
  * triangle.
  *
  * Scale design: the raw event stream collapses to distinct
  * (entity, bucket) pairs in the first exchange (map-side partials do
  * most of the work — activity is usually far denser than one event per
  * bucket); the per-entity cohort is a groupBy on the entity key that
  * AQE co-plans with the join back; and the final count is a plain
  * aggregate, NOT a countDistinct — (entity, bucket) pairs are already
  * distinct, so count(*) per (cohort, offset) is exact. No windows, no
  * driver-side collection; three narrow-keyed exchanges total. */
object Retention {

  /** One row per (cohort, offset) with `n_active` entities: entities
    * whose first bucket is `cohort` and who have ≥1 event in bucket
    * `cohort + offset`. `bucketCol` must be an integral bucket index
    * (e.g. `unix_micros(ts) div weekMicros`); offset 0 rows equal cohort
    * sizes by construction. */
  def cohortRetention(events: DataFrame, idCol: String,
      bucketCol: Column): DataFrame = {
    val active = events
      .select(col(idCol).as("id"), bucketCol.cast("long").as("__bucket"))
      .distinct()
    val cohorts = active.groupBy(col("id"))
      .agg(min(col("__bucket")).as("cohort"))
    active.join(cohorts, "id")
      .groupBy(col("cohort"),
        (col("__bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
