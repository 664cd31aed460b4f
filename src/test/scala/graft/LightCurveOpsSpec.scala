package graft

import graft.operators.LightCurveOps
import org.apache.spark.sql.functions._

/** Phase folding and rolling time-window statistics: exact bin/window
  * membership on crafted lightcurves, plus the outlier flag's minObs and
  * spike behavior. */
class LightCurveOpsSpec extends SparkSuite {
  import spark.implicits._

  test("foldBin assigns phases and aggregates per bin") {
    // period 1.0, 4 bins: t=0.1,1.1,2.1 all fold to phase 0.1 (bin 0);
    // t=0.30,0.55,0.80 land in bins 1,2,3
    val df = Seq(
      (1L, "g", 0.10, 10.0), (1L, "g", 1.10, 20.0), (1L, "g", 2.10, 30.0),
      (1L, "g", 0.30, 1.0), (1L, "g", 0.55, 2.0), (1L, "g", 0.80, 3.0),
      (2L, "r", 0.99, 7.0)
    ).toDF("id", "band", "t", "v")
    val out = LightCurveOps.foldBin(df, "id", "t", "v", "band",
      period = 1.0, t0 = 0.0, nBins = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "g", 0)) === ((3L, 20.0))) // mean of 10,20,30
    assert(out((1L, "g", 1)) === ((1L, 1.0)))
    assert(out((1L, "g", 2)) === ((1L, 2.0)))
    assert(out((1L, "g", 3)) === ((1L, 3.0)))
    assert(out((2L, "r", 3)) === ((1L, 7.0)))
    assert(out.size === 5)
  }

  test("foldBin respects t0 and clamps the phase=1 fp edge") {
    // t0 shifts the fold origin: with t0=0.25 and period 1, t=0.25 is
    // phase 0 exactly
    val df = Seq((1L, "g", 0.25, 5.0)).toDF("id", "band", "t", "v")
    val r = LightCurveOps.foldBin(df, "id", "t", "v", "band",
      period = 1.0, t0 = 0.25, nBins = 10).collect()
    assert(r.head.getInt(2) === 0)
    // phase_bin never reaches nBins even when phase*nBins rounds up
    val edge = Seq((1L, "g", 0.9999999999999999, 1.0))
      .toDF("id", "band", "t", "v")
    val e = LightCurveOps.foldBin(edge, "id", "t", "v", "band",
      period = 1.0, t0 = 0.0, nBins = 10).collect()
    assert(e.head.getInt(2) === 9)
  }

  test("rollingStats: trailing window membership, per-lightcurve frames") {
    val df = Seq(
      (1L, "g", 0.0, 10.0), (1L, "g", 0.4, 20.0), (1L, "g", 1.0, 30.0),
      (1L, "r", 0.4, 99.0), // other band never enters g's frames
      (2L, "g", 0.4, 50.0)  // other object never enters id 1's frames
    ).toDF("id", "band", "t", "v")
    val out = LightCurveOps.rollingStats(df, "id", "t", "v", "band", 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)) ->
        (r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(out((1L, "g", 0.0)) === ((1L, 10.0, 10.0, 10.0)))
    // t=0.4 sees (t-0.5, t] = {0.0, 0.4}
    assert(out((1L, "g", 0.4)) === ((2L, 15.0, 10.0, 20.0)))
    // t=1.0's frame is [0.5, 1.0] — 0.4 is outside, so it sees only itself
    assert(out((1L, "g", 1.0)) === ((1L, 30.0, 30.0, 30.0)))
    assert(out((1L, "r", 0.4)) === ((1L, 99.0, 99.0, 99.0)))
    assert(out((2L, "g", 0.4)) === ((1L, 50.0, 50.0, 50.0)))
  }

  test("rollingStats: RANGE ties are peers — both rows see the full group") {
    val df = Seq((1L, "g", 1.0, 2.0), (1L, "g", 1.0, 4.0))
      .toDF("id", "band", "t", "v")
    val out = LightCurveOps.rollingStats(df, "id", "t", "v", "band", 0.5)
      .collect()
    assert(out.forall(_.getLong(4) === 2L))
    assert(out.forall(_.getDouble(5) === 3.0))
  }

  test("rollingOutliers flags a spike but respects minObs") {
    // 21 points in-window: 20 at ~1.0 and one spike at 100. The trailing
    // window includes the spike itself, so the flag needs enough base
    // points that the self-inflated stddev still leaves |dev| > 3σ
    val base = (0 until 20).map(i => (1L, "g", 0.01 * i, 1.0 + 0.001 * i))
    val spike = Seq((1L, "g", 0.25, 100.0))
    val df = (base ++ spike).toDF("id", "band", "t", "v")
    val out = LightCurveOps.rollingOutliers(df, "id", "t", "v", "band",
      window = 0.5, sigma = 3.0, minObs = 5)
      .collect().map(r => r.getDouble(3) -> r.getBoolean(5)).toMap
    assert(out(100.0) === true)
    assert(out.filter(_._1 < 2.0).values.forall(_ == false))
    // same data, minObs too high: nothing flagged
    val strict = LightCurveOps.rollingOutliers(df, "id", "t", "v", "band",
      window = 0.5, sigma = 3.0, minObs = 25)
      .collect().map(_.getBoolean(5))
    assert(strict.forall(_ == false))
  }

  test("foldBin matches the events oracle shape at sf0.001") {
    val ev = SparkEntry.queries("q_fold")(spark, sf0001)
    val n = ev.count()
    assert(n > 0)
    // bins bounded, counts sum to the source row count
    val agg = ev.agg(sum("n_obs"), max("phase_bin"), min("phase_bin"))
      .head()
    assert(agg.getLong(0) === spark.read
      .parquet(s"$sf0001/events.parquet").count())
    assert(agg.getInt(1) <= 24 && agg.getInt(2) >= 0)
  }
}
