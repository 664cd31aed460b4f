package graft

import graft.analysis.{sf, Ops, StetsonJ}
import graft.batch.Batch
import graft.core.ColumnMap
import graft.operators.Photometry._
import graft.sources.EnsembleIO
import org.apache.spark.sql.functions._

/** Golden-value parity against the reference's own test expectations on its
  * PS1 fixture (2000 sources / 15 objects):
  * /root/reference/tests/tape_tests/test_ensemble.py:1956-1963. These pin
  * the exact Stetson iteration semantics (stetsonj.py:133-190). */
class GoldenSpec extends SparkSuite {

  /** Mirrors the reference test_batch setup (test_ensemble.py:1933-1937):
    * prune(10) then dropna on source before batching. */
  lazy val ens = {
    val e = EnsembleIO.fromParquet(spark, ps1Source, ColumnMap.ps1TestFixture,
      objectFile = Some(ps1Object))
    e.prune(10) // recomputes counts (reference prune with col_name=None)
    e.dropna("source")
    e
  }

  def stetsonByIdBand(): Map[(Long, String), Double] =
    Ops.AnalysisOps(ens).stetsonJ().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("StetsonJ matches reference goldens on the PS1 fixture") {
    val res = stetsonByIdBand()
    val firstId = res.keys.map(_._1).min
    // test_ensemble.py:1956-1958 (first object, result.values[0])
    assert(math.abs(res((firstId, "g")) - -0.04174282) < 1e-3 * 0.04174282 + 1e-9,
      s"g=${res((firstId, "g"))}")
    assert(math.abs(res((firstId, "r")) - 0.6075282) < 1e-3 * 0.6075282,
      s"r=${res((firstId, "r"))}")
  }

  test("StetsonJ with object-column grouping keys matches reference goldens") {
    // test_ensemble.py:1961-1963: batch(..., on=["nobs_total","ps1_objid"]);
    // result row 1 (sorted by the grouping keys) has g≈1.2208577,
    // r≈-0.49639028. Exercises the object-column graft join.
    val res = Batch.batch(ens, StetsonJ(),
      on = Some(Seq("nobs_total", "ps1_objid")))
    val rows = res.orderBy(col("nobs_total"), col("ps1_objid"))
      .collect()
      .groupBy(r => (r.get(0), r.get(1)))
    val sortedKeys = rows.keys.toSeq.sortBy(k =>
      (k._1.toString.toDouble, k._2.toString.toDouble))
    val second = rows(sortedKeys(1))
      .map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(math.abs(second("g") - 1.2208577) < 1e-3 * 1.2208577,
      s"g=${second("g")}")
    assert(math.abs(second("r") - -0.49639028) < 1e-3 * 0.49639028,
      s"r=${second("r")}")
  }

  test("by-band pivot equals long-format values") {
    // mirrors reference test_batch_by_band cross-check
    // (test_ensemble.py:2057-2141)
    val long = stetsonByIdBand()
    val wide = Batch.batch(ens, StetsonJ(), byBand = true)
    val cols = wide.columns.toSeq
    assert(cols.contains("stetsonJ_g") && cols.contains("stetsonJ_r"), cols)
    wide.collect().foreach { r =>
      val id = r.getLong(0)
      Seq("g", "r").foreach { b =>
        val i = r.fieldIndex(s"stetsonJ_$b")
        long.get((id, b)) match {
          case Some(v) => assert(math.abs(r.getDouble(i) - v) < 1e-12)
          case None    => assert(r.isNullAt(i)) // band absent for this object
        }
      }
    }
  }

  test("multi-feature ensemble batch: reference golden (test_feature_extraction.py:28-60)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the reference fixture: object 1 = 5 g-band obs flux linspace(1,2,5)
    // err 0.1; object 2 = the same series twice, once per band, err 0.01;
    // band_to_calc="g" → both objects reduce to the same g-band series
    val flux = Array(1.0, 1.25, 1.5, 1.75, 2.0)
    val rows =
      flux.zipWithIndex.map { case (f, i) =>
        Row(1L, i.toDouble, f, 0.1, "g") } ++
      (0 until 10).map(i => Row(2L, i.toDouble, flux(i % 5), 0.01,
        if (i < 5) "g" else "r"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("err", DoubleType),
      StructField("band", StringType)))
    val featEns = graft.sources.EnsembleIO.fromRows(spark, rows.toSeq,
      schema, graft.core.ColumnMap("id", "time", "flux", "err", "band"))
    val res = Ops.AnalysisOps(featEns).extractFeatures(
      Seq("anderson_darling_normal", "inter_percentile_range_25",
        "stetson_K"), band = Some("g"))
    val got = res.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(1L, 2L))
    // reference expectation: [[0.114875, 0.625, 0.848528]] * 2 (atol 1e-5)
    got.values.foreach { case (ad, ipr, k) =>
      assert(math.abs(ad - 0.114875) < 1e-5)
      assert(math.abs(ipr - 0.625) < 1e-5)
      assert(math.abs(k - 0.848528) < 1e-5)
    }
  }

  test("OtsuSplit via ensemble batch: reference golden (test_feature_extraction.py:61-93)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the reference fixture: object 1 all-g, object 2 half-g half-r, flux
    // [0 x5, 1 x5] each; band_to_calc=None pools bands
    val n = 10
    val rows =
      (0 until n).map(i => Row(1L, i.toDouble,
        if (i < n / 2) 0.0 else 1.0, 0.1, "g")) ++
      (0 until n).map(i => Row(2L, i.toDouble,
        if (i < n / 2) 0.0 else 1.0, 0.1, if (i < n / 2) "g" else "r"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("err", DoubleType),
      StructField("band", StringType)))
    val otsuEns = graft.sources.EnsembleIO.fromRows(spark, rows, schema,
      graft.core.ColumnMap("id", "time", "flux", "err", "band"))
    val res = Ops.AnalysisOps(otsuEns).extractFeatures(
      Seq("otsu_mean_diff", "otsu_std_lower", "otsu_std_upper",
        "otsu_lower_to_all_ratio"), band = None)
    val got = res.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet === Set(1L, 2L))
    // reference expectation: [[1.0, 0.0, 0.0, 0.5]] * 2 (atol 1e-5)
    got.values.foreach { case (md, sl, su, r) =>
      assert(math.abs(md - 1.0) < 1e-5)
      assert(math.abs(sl) < 1e-5 && math.abs(su) < 1e-5)
      assert(math.abs(r - 0.5) < 1e-5)
    }
  }

  test("sf2 on PS1 fixture produces per-(id,band) binned rows") {
    val res = Ops.AnalysisOps(ens).sf2(sf.SFArgs(binCountTarget = 100))
    assert(res.count() > 0)
    val cols = res.columns.toSeq
    assert(cols.contains("dt") && cols.contains("sf2"))
    // dt bins are positive time differences
    assert(res.filter(col("dt") <= 0).count() === 0)
  }

  test("TimeSeries-level stetsonJ/sf2 match ensemble-level results") {
    import graft.core.TimeSeries._
    val res = stetsonByIdBand()
    val firstId = res.keys.map(_._1).min
    val ts = ens.toTimeseries(firstId)
    val local = ts.stetsonJ()
    assert(math.abs(local("g") - res((firstId, "g"))) < 1e-12)
    assert(math.abs(local("r") - res((firstId, "r"))) < 1e-12)
    val sfRows = ts.sf2()
    assert(sfRows.nonEmpty)
    assert(sfRows.forall(_.getString(0) == String.valueOf(firstId)))
  }

  test("prune(50) + head(5) — the reference bench workflow W2") {
    val e2 = EnsembleIO.fromParquet(spark, ps1Source, ColumnMap.ps1TestFixture,
      objectFile = Some(ps1Object))
    e2.calcNobs(byBand = false, temporary = false)
    e2.prune(50)
    val h = e2.head(5)
    assert(h.length === 5)
    // every surviving object has >= 50 observations
    val counts = e2.source.groupBy(col("ps1_objid")).count().collect()
    assert(counts.forall(_.getLong(1) >= 50))
  }
}
