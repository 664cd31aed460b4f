package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-domain lightcurve operators beyond the reference surface: phase
  * folding (THE periodic-variable operation — the reference computes the
  * period via its feature extractor's Lomb-Scargle peak but leaves folding
  * to the user's notebook) and rolling time-window statistics (the batch
  * twin of `Streaming.runningLightcurveStats`, with a bounded look-back
  * instead of an all-history state).
  *
  * Scale design (100 TB): both operators partition by (id, band) — the
  * natural lightcurve key, the same key every other per-object operator
  * shuffles on, so a pre-sorted/bucketed ensemble layout (EnsembleIO
  * bucketed persistence) satisfies both with ZERO additional exchange.
  * Neither ever builds a global window or a driver-side loop.
  */
object LightCurveOps {

  /** Phase-fold each lightcurve at `period` (epoch `t0`) and aggregate
    * into `nBins` phase bins: phase = frac((t − t0)/period) ∈ [0, 1),
    * bin = ⌊phase·nBins⌋. Returns one row per (id, band, bin) with the
    * observation count and the mean/min/max of the value column — the
    * binned folded lightcurve used for period verification and
    * transit/eclipse shape inspection.
    *
    * The phase arithmetic is plain IEEE double ops (sub, div, floor), so
    * any engine reproduces the bin assignment bit-for-bit from the same
    * inputs; the mean is rounded to 6 decimals to absorb partial-aggregate
    * summation-order ulps (min/max/count are exact). One shuffle with
    * map-side partials; output cardinality ≤ |lightcurves|·nBins. */
  def foldBin(df: DataFrame, idCol: String, timeCol: String, valCol: String,
      bandCol: String, period: Double, t0: Double = 0.0,
      nBins: Int = 50): DataFrame = {
    require(period > 0.0, "period must be positive")
    require(nBins > 0, "nBins must be positive")
    val cycles = (col(timeCol) - lit(t0)) / lit(period)
    val phase = cycles - floor(cycles)
    // phase < 1 by construction, so floor(phase·nBins) ≤ nBins−1 except
    // when phase·nBins rounds UP to exactly nBins in fp — clamp that edge
    val bin = least(floor(phase * nBins), lit(nBins - 1)).cast("int")
    df.groupBy(col(idCol), col(bandCol), bin.as("phase_bin"))
      .agg(count(lit(1)).as("n_obs"),
        round(avg(col(valCol)), 6).as("mean_val"),
        min(col(valCol)).as("min_val"),
        max(col(valCol)).as("max_val"))
  }

  /** Rolling statistics over a trailing time window: for every observation,
    * the count/mean/min/max of the value column across the same
    * lightcurve's observations in (t − window, t] — computed as one SQL
    * RANGE frame per (id, band), never a self-join. Ties in the time
    * column are RANGE peers (both rows see the full peer group), so the
    * result is deterministic without a tiebreak column.
    *
    * The rolling mean is rounded to 6 decimals: sliding-frame aggregation
    * order differs between engines (Spark slides incrementally, DuckDB
    * uses segment trees), which is ulp-level noise on the sum. */
  def rollingStats(df: DataFrame, idCol: String, timeCol: String,
      valCol: String, bandCol: String, window: Double): DataFrame = {
    require(window > 0.0, "window must be positive")
    val frame = s"PARTITION BY $idCol, $bandCol ORDER BY $timeCol " +
      s"RANGE BETWEEN $window PRECEDING AND CURRENT ROW"
    df.select(col(idCol), col(bandCol), col(timeCol), col(valCol),
      expr(s"count(1) OVER ($frame)").as("n_win"),
      round(expr(s"avg($valCol) OVER ($frame)"), 6).as("mean_win"),
      expr(s"min($valCol) OVER ($frame)").as("min_win"),
      expr(s"max($valCol) OVER ($frame)").as("max_win"))
  }

  /** Rolling z-score outlier flags: observations whose value deviates from
    * the trailing-window mean by more than `sigma` times the trailing
    * sample stddev (windows with < minObs observations are never flagged —
    * a 2-point "stddev" flags nothing meaningful). Built on the same RANGE
    * frame as [[rollingStats]]; one window pass, no self-join. */
  def rollingOutliers(df: DataFrame, idCol: String, timeCol: String,
      valCol: String, bandCol: String, window: Double, sigma: Double = 3.0,
      minObs: Int = 5): DataFrame = {
    require(window > 0.0, "window must be positive")
    val frame = s"PARTITION BY $idCol, $bandCol ORDER BY $timeCol " +
      s"RANGE BETWEEN $window PRECEDING AND CURRENT ROW"
    val n = expr(s"count(1) OVER ($frame)")
    val mean = expr(s"avg($valCol) OVER ($frame)")
    val sd = expr(s"stddev_samp($valCol) OVER ($frame)")
    df.select(col(idCol), col(bandCol), col(timeCol), col(valCol),
      n.as("n_win"),
      (n >= minObs && sd > 0.0 &&
        abs(col(valCol) - mean) > lit(sigma) * sd).as("is_outlier"))
  }
}
