package graft

import graft.analysis.{sf, Ops, StetsonJ, StructureFunction2}
import graft.batch.Batch
import graft.core.{ColumnMap, Ensemble}
import graft.operators.Photometry._
import graft.sources.EnsembleIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The TAPE data model is exercised against the driver-generated `events`
  * table (FIXTURES.md §6): `user_id→id, ts→time (fractional epoch days),
  * value→flux, event_type→band`, with a deterministic synthetic error
  * column (events carries no measurement error). Every SQL-expressible
  * operator has a DuckDB oracle; per-lightcurve science (StetsonJ, SF²)
  * gets rows-only checks.
  *
  * Floating-point note: aggregate outputs that sum doubles are rounded to 6
  * decimals on BOTH sides so Spark's partial-aggregation order and DuckDB's
  * sequential order can't produce last-ulp hash mismatches.
  */
object SparkEntry {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events + derived (ts_days, err) — the TAPE source-table mapping.
    * `ts` is TIMESTAMP(NANOS) parquet, read as a long of epoch-nanos
    * (see graft.Spark), so the time arithmetic is integer-exact before the
    * one double division and Spark and DuckDB agree bit-for-bit. */
  def eventsSource(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      // integer-truncate nanos→micros to match DuckDB, whose TIMESTAMP
      // type truncates TIMESTAMP_NS parquet on read
      .withColumn("ts_days", expr("ts div 1000") / lit(86400e6))
      .withColumn("err", abs(col("value")) * lit(0.05) + lit(0.01))

  /** Matching DuckDB-side CTE for eventsSource. */
  private val EvCte =
    "WITH ev AS (SELECT *, epoch_us(ts) / 86400000000.0 AS ts_days, " +
      "abs(value) * 0.05 + 0.01 AS err FROM events)"

  def eventsEnsemble(s: SparkSession, dir: String): Ensemble =
    EnsembleIO.fromDataFrame(s, eventsSource(s, dir), ColumnMap.events)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises ingest → calcNobs → prune → sync → batch(StetsonJ). */
  def entry(spark: SparkSession): DataFrame = {
    val ens = eventsEnsemble(spark, "/root/testdata/sf0.001")
    ens.prune(5)
    Ops.AnalysisOps(ens).stetsonJ()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------- scans & relational
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 3).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),
    "q_select" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.select(Seq("event_id", "ts_days", "value"))
      ens.source
    }),
    "q_query_filter" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.query("value > 250 and event_type = 'purchase'")
      ens.source.select(col("event_id"), col("user_id"), col("value"))
    }),
    "q_assign" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.assign("value_sq" -> (col("value") * col("value")))
      ens.source.select(col("event_id"), col("value_sq"))
    }),
    "q_dropna" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.query("value <= 450") // make some rows disappear first
      ens.dropna(subset = Some(Seq("value", "props")))
      ens.source.select(col("event_id"), col("value"), col("props"))
    }),
    "q_merge" -> ((s, dir) => {
      // source ⋈ object-side per-user stats (frame-level merge surface)
      val ev = eventsSource(s, dir)
      val peruser = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      ev.join(peruser, Seq("user_id"), "inner")
        .select(col("event_id"), col("user_id"), col("n_events"))
    }),
    "q_union" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      val extra = eventsSource(s, dir).filter(col("event_type") === "error")
      ens.insertSources(extra)
      ens.source.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),
    // ------------------------------------------------------- aggregations
    "q_calc_nobs" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.calcNobs(byBand = true, temporary = false)
      ens.objectFrame
    }),
    "q_prune" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.calcNobs(byBand = false, temporary = false)
      ens.prune(60)
      ens.objectFrame
    }),
    "q_sync_semijoin" -> ((s, dir) => {
      // object-side prune propagates to source via lazy sync (left semi)
      val ens = eventsEnsemble(s, dir)
      ens.calcNobs(byBand = false, temporary = false)
      ens.prune(70)
      ens.source.select(col("event_id"), col("user_id"))
    }),
    "q_bin_sources" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.binSources(timeWindow = 1.0, countCol = Some("bin_count"))
      ens.source.select(col("user_id"), col("event_type"),
        round(col("ts_days"), 6).as("ts_days"),
        round(col("value"), 6).as("value"),
        round(col("err"), 6).as("err"), col("bin_count"))
    }),
    "q_flux2mag" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.convertFluxToMag(Right(25.0), zpForm = "mag")
      ens.source.select(col("event_id"),
        round(col("value_mag"), 6).as("value_mag"),
        round(col("err_mag"), 6).as("err_mag"))
    }),
    "q_coalesce" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.assign("value_or_null" ->
        when(col("value") > 250, lit(null)).otherwise(col("value")))
      ens.coalesceCols(Seq("value_or_null", "err"), "value_coalesced")
      ens.source.select(col("event_id"), col("value_coalesced"))
    }),
    "q_day_gap_hist" -> ((s, dir) => {
      // the 24-bin histogram behind find_day_gap_offset
      eventsSource(s, dir)
        .groupBy((floor(col("ts_days") * 24) % 24).cast("int").as("hour"))
        .agg(count(lit(1)).as("n"))
    }),
    // ------------------------------------------------------- batch engine
    "q_batch_mean" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      val res = Batch.batch(ens,
        Ops.ColumnReducer(_.flux, "mean_value", arr => arr.sum / arr.length))
      res.select(col("user_id"), round(col("mean_value"), 6).as("mean_value"))
    }),
    "q_stetson_j" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.prune(5)
      Ops.AnalysisOps(ens).stetsonJ()
    }),
    "q_sf2" -> ((s, dir) => {
      val ens = eventsEnsemble(s, dir)
      ens.prune(5)
      Ops.AnalysisOps(ens).sf2(sf.SFArgs(binCountTarget = 50))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 3) AS sum_base_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_select" ->
      s"$EvCte SELECT user_id, event_id, ts_days, value FROM ev",
    "q_query_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE value > 250 AND event_type = 'purchase'""".stripMargin,
    "q_assign" ->
      "SELECT event_id, value * value AS value_sq FROM events",
    "q_dropna" ->
      """SELECT event_id, value, props FROM events
        |WHERE value <= 450 AND value IS NOT NULL AND props IS NOT NULL""".stripMargin,
    "q_merge" ->
      """SELECT e.event_id, e.user_id, u.n_events
        |FROM events e JOIN (SELECT user_id, count(*) AS n_events
        |  FROM events GROUP BY user_id) u USING (user_id)""".stripMargin,
    "q_union" ->
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT event_type FROM events
        |  UNION ALL
        |  SELECT event_type FROM events WHERE event_type = 'error')
        |GROUP BY event_type""".stripMargin,
    "q_calc_nobs" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS nobs_click,
        | count(*) FILTER (WHERE event_type = 'error') AS nobs_error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS nobs_purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS nobs_signup,
        | count(*) FILTER (WHERE event_type = 'view') AS nobs_view,
        | count(*) AS nobs_total
        |FROM events GROUP BY user_id""".stripMargin,
    "q_prune" ->
      """SELECT user_id, count(*) AS nobs_total FROM events
        |GROUP BY user_id HAVING count(*) >= 60""".stripMargin,
    "q_sync_semijoin" ->
      """SELECT event_id, user_id FROM events
        |WHERE user_id IN (SELECT user_id FROM events
        |  GROUP BY user_id HAVING count(*) >= 70)""".stripMargin,
    "q_bin_sources" ->
      s"""$EvCte SELECT user_id, event_type,
        | round(avg(ts_days), 6) AS ts_days,
        | round(avg(value), 6) AS value,
        | round(sqrt(sum(err * err)) / count(err), 6) AS err,
        | count(*) AS bin_count
        |FROM ev
        |GROUP BY user_id, event_type, floor(ts_days / 1.0) * 1.0""".stripMargin,
    "q_flux2mag" ->
      s"""$EvCte SELECT event_id,
        | round(-2.5 * log10(value) + 25.0, 6) AS value_mag,
        | round((2.5 / ln(10)) * (err / value), 6) AS err_mag
        |FROM ev""".stripMargin,
    "q_coalesce" ->
      s"""$EvCte SELECT event_id,
        | coalesce(CASE WHEN value > 250 THEN NULL ELSE value END, err)
        |   AS value_coalesced
        |FROM ev""".stripMargin,
    "q_day_gap_hist" ->
      s"""$EvCte SELECT cast(floor(ts_days * 24) % 24 AS int) AS hour,
        | count(*) AS n
        |FROM ev GROUP BY 1""".stripMargin,
    "q_batch_mean" ->
      """SELECT user_id, round(avg(value), 6) AS mean_value
        |FROM events GROUP BY user_id""".stripMargin
    // q_stetson_j, q_sf2: per-lightcurve science, not SQL-expressible →
    // rows-only checks.
  )
}
