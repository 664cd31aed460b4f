package graft

import graft.analysis.{sf, StetsonJ, StructureFunction2}
import org.scalatest.funsuite.AnyFunSuite

/** Structure-function + StetsonJ unit goldens ported from the reference's
  * own expectations (tests/tape_tests/test_analysis.py and the
  * structure_function_calculators test directory). Pure in-group math — no
  * Spark. */
class SFSpec extends AnyFunSuite {

  // the reference's canonical 8-point lightcurve (test_analysis.py:68-71)
  val t = Array(1.11, 2.23, 3.45, 4.01, 5.67, 6.32, 7.88, 8.2)
  val y = Array(0.11, 0.23, 0.45, 0.01, 0.67, 0.32, 0.88, 0.2)
  val e = Array(0.1, 0.023, 0.045, 0.1, 0.067, 0.032, 0.8, 0.02)
  val r = Array.fill(8)("r")
  val ids = Array.fill(8)("1")

  test("sf2 base case matches reference golden (dt=3.1482, sf2=0.005365)") {
    val rows = StructureFunction2(sf.SFArgs()).compute(t, y, e, r, ids)
    assert(rows.length === 1) // 28 pairs, bin_count_target=100 → 1 bin
    assert(math.abs(rows.head.getDouble(2) - 3.1482) < 3.1482 * 1e-3)
    assert(math.abs(rows.head.getDouble(3) - 0.005365) < 0.005365 * 1e-3)
  }

  test("sf2 without timestamps uses equidistant fallback (test_analysis.py:88-110)") {
    val rows = StructureFunction2(sf.SFArgs())
      .compute(null, y, e, r, ids)
    assert(rows.length === 1)
    // same sf2 golden; dt becomes index-difference mean
    assert(math.abs(rows.head.getDouble(3) - 0.005365) < 0.005365 * 1e-3)
  }

  test("sf2 with null band/id falls back to '0' labels") {
    val rows = StructureFunction2(sf.SFArgs()).compute(t, y, e, null, null)
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "0")
    assert(rows.head.getString(1) === "0")
  }

  test("macleod_2012 IQR statistic golden: 11.0889 on 0..9") {
    // test_macleod_2012_calculator.py:28-60: 0.74*(6.75-2.25) squared
    val vals = Array.tabulate(10)(_.toDouble)
    val iqr = sf.quantile(vals, 0.75) - sf.quantile(vals, 0.25)
    val stat = math.pow(0.74 * iqr, 2)
    assert(math.abs(stat - 11.0889) < 1e-9)
  }

  test("all five estimators produce one finite bin on the canonical curve") {
    sf.SFMethods.names.foreach { m =>
      val rows = StructureFunction2(sf.SFArgs(sfMethod = m))
        .compute(t, y, e, r, ids)
      assert(rows.length === 1, m)
      assert(!rows.head.getDouble(3).isNaN, m)
    }
  }

  test("combine of two identical lightcurves equals the single-curve result") {
    val single = StructureFunction2(sf.SFArgs()).compute(t, y, e, r, ids)
    val rows2 = StructureFunction2(sf.SFArgs(combine = true)).compute(
      t ++ t, y ++ y, e ++ e, r ++ r,
      ids ++ Array.fill(8)("2"))
    assert(rows2.length === 1)
    assert(rows2.head.getString(0) === "combined")
    // pooled duplicated pairs -> same mean statistic
    assert(math.abs(rows2.head.getDouble(3) - single.head.getDouble(3)) < 1e-12)
  }

  test("bootstrap error estimation is seed-deterministic and reports sigma") {
    val args = sf.SFArgs(estimateErr = true, calculationRepetitions = 5,
      randomSeed = Some(42L))
    val a = StructureFunction2(args).compute(t, y, e, r, ids)
    val b = StructureFunction2(args).compute(t, y, e, r, ids)
    assert(a.head.getDouble(3) === b.head.getDouble(3))
    assert(a.head.getDouble(4) > 0.0) // 1_sigma populated
  }

  test("equally-weighted multi-lightcurve subsamples to the min pair count") {
    val t2 = t ++ Array(4.01, 5.67) // 10-point second curve
    val rows = StructureFunction2(sf.SFArgs(estimateErr = true,
        equallyWeightLightcurves = true, randomSeed = Some(7L)))
      .compute(t ++ t2, y ++ (y ++ Array(0.01, 0.67)),
        e ++ (e ++ Array(0.1, 0.067)), r ++ Array.fill(10)("r"),
        ids ++ Array.fill(10)("2"))
    // one bin per lightcurve, two lightcurves
    assert(rows.map(_.getString(0)).toSet === Set("1", "2"))
  }

  test("too-short lightcurves are rejected (min 3 observations)") {
    intercept[IllegalArgumentException] {
      new sf.SFLightCurve(Array(1.0, 2.0), Array(1.0, 2.0), Array(0.1, 0.1))
    }
  }

  test("pair differences match the reference pairing (dt>0 only)") {
    // 3 points -> 3 pairs (t2-t1, t3-t1, t3-t2)
    val lc = new sf.SFLightCurve(Array(1.0, 2.0, 4.0),
      Array(1.0, 3.0, 2.0), Array(0.1, 0.2, 0.3))
    assert(lc.allDTimes.toSeq === Seq(1.0, 3.0, 2.0))
    assert(lc.allDFluxes.toSeq === Seq(2.0, 1.0, -1.0))
    val sse = lc.allSumSquaredError
    assert(math.abs(sse(0) - (0.01 + 0.04)) < 1e-12)
    assert(math.abs(sse(1) - (0.01 + 0.09)) < 1e-12)
    assert(math.abs(sse(2) - (0.04 + 0.09)) < 1e-12)
  }

  test("dt bin edges match reference goldens for all three schemes") {
    // test_base_calculator.py:9-38, dts = 201-i for i in 0..199
    val dts = Array.tabulate(200)(i => 201.0 - i)
    val size = sf.binDts(dts, "size", 100)
    assert(size.length === 3)
    Seq(2.0, 101.5, 201.0).zip(size).foreach { case (e, a) =>
      assert(math.abs(a - e) < 1e-9, s"size: $a vs $e") }
    val len = sf.binDts(dts, "length", 100)
    Seq(1.801, 101.5, 201.0).zip(len).foreach { case (e, a) =>
      assert(math.abs(a - e) < 1e-9, s"length: $a vs $e") }
    val log = sf.binDts(dts, "loglength", 100)
    Seq(1.99080091, 20.04993766, 201.0).zip(log).foreach { case (e, a) =>
      assert(math.abs(a - e) < e * 1e-5, s"loglength: $a vs $e") }
    intercept[IllegalArgumentException] { sf.binDts(dts, "bogus", 100) }
  }

  test("size binning gives equal-count bins on distinct values") {
    val rng = new java.util.Random(1)
    val dts = Array.fill(1000)(rng.nextDouble() * 5 +
      math.pow(10, 1 + rng.nextDouble()))
    val edges = sf.binDts(dts, "size", 100)
    assert(edges.length === 11)
    val counts = sf.binnedStatistic(dts, dts, edges, _.length.toDouble)
    assert(counts.map(_.toInt).distinct.length === 1) // all equal
  }

  test("binnedStatistic duplicate edges: searchsorted-right (scipy) semantics") {
    // degenerate quantile edges [d, d, d, d]: every value equal to d lands
    // in the LAST bin (count-of-edges<=v − 1, capped) — what numpy's
    // digitize/searchsorted(side='right') inside scipy does; a plain
    // binarySearch would pick an arbitrary duplicate
    val d = 2.5
    val edges = Array(d, d, d, d)
    val out = sf.binnedStatistic(Array(d, d), Array(1.0, 2.0), edges, sf.mean)
    assert(out.length === 3)
    assert(out(0).isNaN && out(1).isNaN)
    assert(out(2) === 1.5)
    // mixed: duplicate interior edge [0, 1, 1, 2] — v=1.0 goes to bin 2
    val out2 = sf.binnedStatistic(Array(0.5, 1.0, 1.5),
      Array(10.0, 20.0, 30.0), Array(0.0, 1.0, 1.0, 2.0), sf.mean)
    assert(out2(0) === 10.0 && out2(1).isNaN && out2(2) === 25.0)
  }

  test("registry rejects duplicate names, accepts force") {
    intercept[IllegalArgumentException] {
      sf.SFMethods.register("basic", new sf.BasicCalculator(_, _))
    }
    sf.SFMethods.register("basic", new sf.BasicCalculator(_, _), force = true)
    assert(sf.SFMethods.contains("basic"))
  }

  test("StetsonJ golden: flux 0..4 with unit errors gives J=0.8") {
    // reference test_analysis.py:44-60
    val j = StetsonJ.singleBand(Array(0.0, 1.0, 2.0, 3.0, 4.0),
      Array.fill(5)(1.0))
    assert(math.abs(j - 0.8) < 1e-9)
  }
}
