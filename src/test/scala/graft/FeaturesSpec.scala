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
}
