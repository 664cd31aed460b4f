package graft

import graft.analysis.Features
import org.scalatest.funsuite.AnyFunSuite

/** Native feature math, incl. the Lomb-Scargle periodogram. */
class FeaturesSpec extends AnyFunSuite {

  test("Lomb-Scargle recovers the period of an irregularly sampled sine") {
    val rng = new java.util.Random(7)
    val truePeriod = 0.73
    val t = Array.fill(120)(rng.nextDouble() * 20.0).sorted
    val m = t.map(ti => 3.0 + 1.5 *
      math.sin(2 * math.Pi * ti / truePeriod) + 0.05 * rng.nextGaussian())
    val p = Features.periodPeak(t, m)
    assert(math.abs(p - truePeriod) < 0.01, s"recovered period $p")
    // strong peak: normalized power ~ n/2 for a clean sinusoid
    assert(Features.periodogramPeakPower(t, m) > 20.0)
  }

  test("Lomb-Scargle peak power is low for pure noise") {
    val rng = new java.util.Random(11)
    val t = Array.fill(120)(rng.nextDouble() * 20.0).sorted
    val m = Array.fill(120)(rng.nextGaussian())
    assert(Features.periodogramPeakPower(t, m) < 15.0)
  }

  test("stetson_K approaches sqrt(2/pi)*... ~0.798 for normal data") {
    // reference test_feature_extraction.py:12-26 semantics
    val rng = new java.util.Random(42)
    val m = Array.fill(5000)(rng.nextGaussian())
    val e = Array.fill(5000)(1.0)
    val k = Features.stetsonK(m, e)
    assert(math.abs(k - 0.798) < 0.02, s"K=$k")
  }

  test("amplitude, ptp, eta basics") {
    val m = Array(1.0, 5.0, 3.0)
    assert(Features.amplitude(m) === 2.0)
    assert(Features.evaluate("ptp", Array(0, 1, 2), m, m) === 4.0)
    val mono = Array.tabulate(100)(_.toDouble)
    assert(Features.eta(mono) < 0.01) // smooth trend -> tiny eta
  }

  test("degenerate inputs give NaN, not exceptions") {
    assert(Features.periodPeak(Array(1.0, 2.0), Array(1.0, 2.0)).isNaN)
    assert(Features.stddev(Array(1.0)).isNaN)
    assert(Features.evaluate("mean", Array.empty, Array.empty, Array.empty).isNaN)
  }

  test("AD-normal + IPR: reference goldens (test_feature_extraction.py:28-60)") {
    // flux = linspace(1, 2, 5): the reference expects
    // [anderson_darling_normal, inter_percentile_range_25, stetson_K]
    // = [0.114875, 0.625, 0.848528] (atol 1e-5)
    val m = Array(1.0, 1.25, 1.5, 1.75, 2.0)
    assert(math.abs(Features.andersonDarlingNormal(m) - 0.114875) < 1e-5)
    assert(math.abs(Features.interPercentileRange(m, 0.25) - 0.625) < 1e-12)
    val e = Array.fill(5)(0.1)
    assert(math.abs(Features.stetsonK(m, e) - 0.848528) < 1e-5)
    // the 0.625 golden pins the HAZEN quantile (numpy default gives 0.5)
    assert(math.abs(Features.evaluate("inter_percentile_range_25",
      m, m, e) - 0.625) < 1e-12)
    assert(math.abs(Features.evaluate("anderson_darling_normal",
      m, m, e) - 0.114875) < 1e-5)
  }

  test("phi: normal CDF accuracy incl. deep tails; A-D sanity on normal/uniform") {
    // spot values vs published Φ tables / scipy
    assert(math.abs(Features.phi(0.0) - 0.5) < 1e-15)
    assert(math.abs(Features.phi(1.0) - 0.8413447460685429) < 1e-12)
    assert(math.abs(Features.phi(-1.96) - 0.024997895148220435) < 1e-12)
    // z = −6 sits at the series/cancellation edge: relative ~1e−6 is the
    // honest bound there (abs err ~1e−16 at the 0.5 scale), plenty for
    // the log the A-D statistic takes
    assert(math.abs(Features.phi(-6.0) / 9.865876450376946e-10 - 1) < 1e-6)
    // tail branch: finite, positive, log-safe
    val tail = Features.phi(-9.0)
    assert(tail > 0 && tail < 1e-18 && !math.log(tail).isInfinite)
    assert(math.abs(Features.phi(9.0) - 1.0) < 1e-15)
    // A-D discriminates: gaussian sample scores low, uniform scores high
    val rng = new java.util.Random(5)
    val gauss = Array.fill(500)(rng.nextGaussian())
    val unif = Array.fill(500)(rng.nextDouble())
    val adG = Features.andersonDarlingNormal(gauss)
    val adU = Features.andersonDarlingNormal(unif)
    assert(adG < 1.0, s"gaussian A-D $adG") // ~0.3 expected
    assert(adU > 3.0, s"uniform A-D $adU")  // uniform is far from normal
  }

  test("otsuSplit: reference golden (test_feature_extraction.py:61-93)") {
    // the reference's OtsuSplit expectation: flux [0 x5, 1 x5] splits at
    // the value change -> mean_diff 1, both stds 0, lower ratio 0.5
    val m = Array.fill(5)(0.0) ++ Array.fill(5)(1.0)
    val (md, sl, su, r) = Features.otsuSplit(m)
    assert(math.abs(md - 1.0) < 1e-12)
    assert(sl === 0.0 && su === 0.0)
    assert(math.abs(r - 0.5) < 1e-12)
  }

  test("otsuSplit: bimodal sample, degenerate cases, equal-value splits") {
    // well-separated bimodal: split must land between the modes
    val m = Array(1.0, 1.1, 0.9, 1.05, 10.0, 10.2, 9.8)
    val (md, sl, su, r) = Features.otsuSplit(m)
    assert(md > 8.5 && md < 9.5, s"mean_diff $md")
    assert(math.abs(r - 4.0 / 7.0) < 1e-12)
    assert(sl > 0 && sl < 0.2 && su > 0 && su < 0.3)
    // single-element class -> std 0.0, not NaN
    val (_, sl1, _, r1) = Features.otsuSplit(Array(0.0, 10.0, 10.1, 10.2))
    assert(sl1 === 0.0)
    assert(math.abs(r1 - 0.25) < 1e-12)
    // a threshold cannot separate equal values: [0,0,0,1] must split 3|1,
    // never inside the run of zeros
    val (_, _, _, rEq) = Features.otsuSplit(Array(0.0, 0.0, 0.0, 1.0))
    assert(math.abs(rEq - 0.75) < 1e-12)
    // flat and sub-2-point samples -> NaN x4 (the reference errors here)
    assert(Features.otsuSplit(Array(5.0, 5.0, 5.0))._1.isNaN)
    assert(Features.otsuSplit(Array(5.0))._1.isNaN)
    // NaN magnitudes are dropped before the split
    val (mdN, _, _, rN) = Features.otsuSplit(
      Array(0.0, Double.NaN, 0.0, 1.0, 1.0))
    assert(math.abs(mdN - 1.0) < 1e-12 && math.abs(rN - 0.5) < 1e-12)
  }
}
