package graft.analysis

import graft.core.ColumnMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Native per-lightcurve feature extraction behind the same
  * `AnalysisFunction` protocol — the Spark counterpart of the reference's
  * `FeatureExtractor` adapter over the Rust `light-curve` package
  * (src/tape/analysis/feature_extractor.py:17-98). That package is an
  * optional native dependency; here a core feature set is implemented
  * directly in Scala, and arbitrary user features plug in as additional
  * `(String, LC => Double)` pairs.
  *
  * Semantics mirrored from feature_extractor.py:60-78: select one band,
  * sort by time, evaluate each feature, one float column per feature name.
  */
final case class FeatureExtractor(
    features: Seq[String],
    band: Option[String] = None
) extends AnalysisFunction {

  override def cols(cm: ColumnMap): Seq[String] =
    Seq(cm.time, cm.flux, cm.err, cm.band)

  override val outputSchema: StructType =
    StructType(features.map(f => StructField(f, DoubleType, nullable = true)))

  override def apply(rows: Seq[Row]): Seq[Row] = {
    import AnalysisFunction._
    val selected = band match {
      case Some(b) => rows.filter(r => str(r, 3) == b)
      case None    => rows
    }
    // time-sort (feature_extractor.py:69-72)
    val sorted = selected.sortBy(num(_, 0))
    val t = sorted.map(num(_, 0)).toArray
    val m = sorted.map(num(_, 1)).toArray
    val e = sorted.map(num(_, 2)).toArray
    // one periodogram pass when both period features are requested
    val periodFeatures = Set("period_peak", "periodogram_peak_power")
    lazy val lsPair = Features.periodogramPair(t, m)
    // likewise ONE Otsu split serves all four otsu_* outputs
    lazy val otsu = Features.otsuSplit(m)
    val values = features.map {
      case "period_peak" if features.count(periodFeatures) > 1 => lsPair._1
      case "periodogram_peak_power" if features.count(periodFeatures) > 1 =>
        lsPair._2
      case "otsu_mean_diff"          => otsu._1
      case "otsu_std_lower"          => otsu._2
      case "otsu_std_upper"          => otsu._3
      case "otsu_lower_to_all_ratio" => otsu._4
      case f => Features.evaluate(f, t, m, e)
    }
    Seq(Row.fromSeq(values))
  }
}

/** Feature formulas (public definitions from the light-curve feature
  * literature; see the `light-curve` package docs referenced by
  * feature_extractor.py:8-15). */
object Features {
  def evaluate(name: String, t: Array[Double], m: Array[Double],
      e: Array[Double]): Double = {
    if (m.length == 0) return Double.NaN
    name match {
      case "amplitude"       => amplitude(m)
      case "mean"            => mean(m)
      case "weighted_mean"   => weightedMean(m, e)
      case "standard_deviation" => stddev(m)
      case "stetson_K"       => stetsonK(m, e)
      case "eta"             => eta(m)
      case "eta_e"           => etaE(t, m)
      case "excess_variance" => excessVariance(m, e)
      case "ptp"             => m.max - m.min
      case "period_peak"     => periodPeak(t, m)
      case "periodogram_peak_power" => periodogramPeakPower(t, m)
      case "otsu_mean_diff"          => otsuSplit(m)._1
      case "otsu_std_lower"          => otsuSplit(m)._2
      case "otsu_std_upper"          => otsuSplit(m)._3
      case "otsu_lower_to_all_ratio" => otsuSplit(m)._4
      case "anderson_darling_normal" => andersonDarlingNormal(m)
      case ipr if ipr.startsWith("inter_percentile_range_") =>
        // reference naming: inter_percentile_range_<q·100>, e.g. _25.
        // q must sit in (0, 0.5): at q ≥ 0.5 the "range" quantile(1−q) −
        // quantile(q) inverts or degenerates; a non-numeric suffix falls
        // through to the unknown-feature error rather than a
        // NumberFormatException.
        ipr.stripPrefix("inter_percentile_range_").toIntOption
          .map(_ / 100.0).filter(q => q > 0.0 && q < 0.5) match {
          case Some(q) => interPercentileRange(m, q)
          case None =>
            throw new IllegalArgumentException(s"unknown feature $ipr")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown feature $other")
    }
  }

  def mean(m: Array[Double]): Double = m.sum / m.length

  /** Half peak-to-peak amplitude: (max − min) / 2. */
  def amplitude(m: Array[Double]): Double = (m.max - m.min) / 2.0

  /** Inverse-variance weighted mean. */
  def weightedMean(m: Array[Double], e: Array[Double]): Double = {
    var num = 0.0; var den = 0.0; var i = 0
    while (i < m.length) {
      val w = 1.0 / (e(i) * e(i)); num += w * m(i); den += w; i += 1
    }
    num / den
  }

  /** Sample standard deviation (N−1 denominator). */
  def stddev(m: Array[Double]): Double = {
    if (m.length < 2) return Double.NaN
    val mu = mean(m)
    math.sqrt(m.map(x => (x - mu) * (x - mu)).sum / (m.length - 1))
  }

  /** Stetson K robustness statistic:
    * K = mean(|delta|) / sqrt(mean(delta^2)),
    * delta_i = sqrt(n/(n-1)) * (m_i - weighted_mean) / e_i. */
  def stetsonK(m: Array[Double], e: Array[Double]): Double = {
    val n = m.length
    if (n < 2) return Double.NaN
    val mu = weightedMean(m, e)
    val f = math.sqrt(n.toDouble / (n - 1))
    val delta = m.indices.map(i => f * (m(i) - mu) / e(i))
    val meanAbs = delta.map(math.abs).sum / n
    val meanSq = delta.map(d => d * d).sum / n
    meanAbs / math.sqrt(meanSq)
  }

  /** Von Neumann eta: mean successive square difference over variance. */
  def eta(m: Array[Double]): Double = {
    val n = m.length
    if (n < 2) return Double.NaN
    val mu = mean(m)
    val variance = m.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    if (variance == 0) return Double.NaN
    val mssd = (1 until n).map(i => math.pow(m(i) - m(i - 1), 2)).sum / (n - 1)
    mssd / variance
  }

  /** Eta^e — eta generalized for unevenly spaced times:
    * eta_e = mean(((m_{i+1}-m_i)/(t_{i+1}-t_i))^2) * (t_N - t_1)^2 /
    *         (var(m) * (N-1)^2). */
  def etaE(t: Array[Double], m: Array[Double]): Double = {
    val n = m.length
    if (n < 2) return Double.NaN
    val mu = mean(m)
    val variance = m.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    if (variance == 0) return Double.NaN
    val slopes2 = (1 until n).map { i =>
      val dm = m(i) - m(i - 1); val dt = t(i) - t(i - 1)
      (dm / dt) * (dm / dt)
    }
    val meanSlope2 = slopes2.sum / (n - 1)
    meanSlope2 * math.pow(t.last - t.head, 2) / (variance * math.pow(n - 1, 2))
  }

  /** Normalized excess variance: (s^2 − mean(e^2)) / mean(m)^2. */
  def excessVariance(m: Array[Double], e: Array[Double]): Double = {
    val n = m.length
    if (n < 2) return Double.NaN
    val mu = mean(m)
    val s2 = m.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    val meanErr2 = e.map(x => x * x).sum / n
    (s2 - meanErr2) / (mu * mu)
  }

  /** Classic Lomb–Scargle periodogram (Lomb 1976, Scargle 1982; the
    * floating-mean-free form with the τ phase shift) of an unevenly
    * sampled series, evaluated at the given angular frequencies. Power is
    * normalized by the sample variance, so a pure sinusoid peaks near
    * n/2·(1/…)≈O(n). This is the native stand-in for the reference
    * FeatureExtractor's `Periodogram` feature (feature_extractor.py:8-15,
    * backed there by the optional Rust `light-curve` package). */
  def lombScargle(t: Array[Double], m: Array[Double],
      omegas: Array[Double]): Array[Double] = {
    val n = m.length
    val mu = mean(m)
    val dm = m.map(_ - mu)
    val sigma2 = dm.map(x => x * x).sum / (n - 1)
    omegas.map { w =>
      var s2 = 0.0; var c2 = 0.0
      var i = 0
      while (i < n) { s2 += math.sin(2 * w * t(i)); c2 += math.cos(2 * w * t(i)); i += 1 }
      val tau = math.atan2(s2, c2) / (2 * w)
      var cs = 0.0; var cc = 0.0; var ss = 0.0; var sc = 0.0
      i = 0
      while (i < n) {
        val arg = w * (t(i) - tau)
        val co = math.cos(arg); val si = math.sin(arg)
        cs += dm(i) * co; cc += co * co
        sc += dm(i) * si; ss += si * si
        i += 1
      }
      0.5 * ((cs * cs) / cc + (sc * sc) / ss) / sigma2
    }
  }

  /** Standard frequency grid: from 1/T to the pseudo-Nyquist n/(2T), with
    * `oversample`× resolution. */
  def lsFrequencyGrid(t: Array[Double], oversample: Int = 5): Array[Double] = {
    val tRange = t.max - t.min
    if (tRange <= 0) return Array.empty
    val n = t.length
    val fMin = 1.0 / tRange
    val fMax = n / (2.0 * tRange)
    val df = fMin / oversample
    val steps = math.max(((fMax - fMin) / df).toInt, 1)
    Array.tabulate(steps + 1)(k => 2 * math.Pi * (fMin + k * df))
  }

  /** Period of the highest Lomb–Scargle peak; NaN for constant series
    * (zero variance → every power is NaN, no peak exists). */
  def periodPeak(t: Array[Double], m: Array[Double]): Double = {
    if (t.length < 4) return Double.NaN
    val omegas = lsFrequencyGrid(t)
    if (omegas.isEmpty) return Double.NaN
    val power = lombScargle(t, m, omegas)
    if (power.forall(_.isNaN)) return Double.NaN
    val best = power.indices.filterNot(power(_).isNaN).maxBy(power)
    2 * math.Pi / omegas(best)
  }

  /** Variance-normalized power of the highest peak. */
  def periodogramPeakPower(t: Array[Double], m: Array[Double]): Double =
    periodogramPair(t, m)._2

  /** Standard normal CDF Φ(z) via Marsaglia's (2004) Taylor series —
    * double-precision accurate for the |z| ≲ 6 range the A-D statistic
    * evaluates; beyond that the series is clamped to the tail limit.
    * Computed directly for negative z (no 1 − Φ cancellation). */
  def phi(z: Double): Double = {
    // deep tails: the series suffers 0.5-cancellation (Φ(−8) ≈ 6e−16
    // would be a difference of ~0.5-sized terms), so switch to the
    // asymptotic Mills-ratio expansion — relative error ≲ 3e−6 at the
    // |z| = 6.5 crossover, shrinking further out
    if (z < -6.5) {
      val z2 = z * z
      val mills = (1.0 - 1.0 / z2 + 3.0 / (z2 * z2) -
        15.0 / (z2 * z2 * z2)) / (-z)
      return mills * math.exp(-0.5 * z2 - 0.9189385332046727)
    }
    if (z > 6.5) return 1.0 - phi(-z)
    var sum = z; var term = z; var i = 3
    while (math.abs(term) > 1e-18 * math.abs(sum) + 1e-300) {
      term = term * z * z / i
      sum += term
      i += 2
    }
    0.5 + sum * math.exp(-0.5 * z * z - 0.9189385332046727) // ln √(2π)
  }

  /** Anderson–Darling normality statistic with the sample-size bias
    * correction the `light-curve` package applies:
    * A*² = A²·(1 + 4/n − 25/n²), where
    * A² = −n − (1/n)·Σ (2i−1)·[ln Φ(z_i) + ln(1 − Φ(z_{n+1−i}))]
    * over the ascending standardized sample (sample std, N−1). The
    * reference golden (test_feature_extraction.py:28-60: 0.114875 on
    * linspace(1,2,5)) pins both the formula and the correction. */
  def andersonDarlingNormal(mRaw: Array[Double]): Double = {
    val s = mRaw.filterNot(_.isNaN).sorted
    val n = s.length
    if (n < 4) return Double.NaN // minimum for a meaningful A-D
    val mu = s.sum / n
    val sd = math.sqrt(s.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    if (sd == 0.0) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      val zi = (s(i) - mu) / sd
      val zr = (s(n - 1 - i) - mu) / sd
      // ln(1 − Φ(zr)) = ln Φ(−zr), computed directly — no cancellation
      acc += (2 * i + 1) * (math.log(phi(zi)) + math.log(phi(-zr)))
      i += 1
    }
    val a2 = -n - acc / n
    a2 * (1.0 + 4.0 / n - 25.0 / (n.toDouble * n))
  }

  /** Inter-percentile range at quantile q: ppf(1−q) − ppf(q), with the
    * `light-curve` package's Hazen plotting-position quantile
    * (h = p·n − 0.5, linear interpolation, clamped to [0, n−1]) — the
    * reference golden 0.625 on linspace(1,2,5) at q = 0.25
    * distinguishes Hazen from numpy's default (which gives 0.5). */
  def interPercentileRange(mRaw: Array[Double], q: Double): Double = {
    val s = mRaw.filterNot(_.isNaN).sorted
    val n = s.length
    if (n < 2) return Double.NaN
    def ppf(p: Double): Double = {
      val h = math.max(0.0, math.min(n - 1.0, p * n - 0.5))
      val lo = math.floor(h).toInt
      val hi = math.min(lo + 1, n - 1)
      s(lo) + (h - lo) * (s(hi) - s(lo))
    }
    ppf(1.0 - q) - ppf(q)
  }

  /** Otsu's-method split of the magnitude sample (Otsu 1979; the
    * `OtsuSplit` feature of the reference's `light-curve` package —
    * exercised by tests/tape_tests/test_feature_extraction.py:61-93):
    * choose the threshold maximizing the inter-class variance
    * w_lower·w_upper·(μ_lower − μ_upper)² between the `i` smallest values
    * and the rest, over all split positions where the sorted values
    * actually change (a threshold cannot separate equal values). Returns
    * `(otsu_mean_diff, otsu_std_lower, otsu_std_upper,
    * otsu_lower_to_all_ratio)` = (μ_upper − μ_lower, sample std of each
    * class — 0.0 for a single-element class — , |lower|/n).
    *
    * Numeric contract shared with the DuckDB oracle (q_otsu): both sides
    * compute class moments from ascending-order prefix sums and pick the
    * argmax of the NORMALIZED inter-class variance σ_b²/σ² (a scale-free
    * value in (0, 1] — raw σ_b² is O(n²·range²), where absolute rounding
    * cannot separate legitimate differences from cross-engine ulp noise)
    * ROUNDED to 5 decimals, ties → smallest split. Splits whose true
    * ratios differ by less than 1e-5 round equal and break on the index
    * identically in both engines, so fp summation-order noise cannot
    * flip the winner. NaN magnitudes are dropped; flat or sub-2-point
    * samples yield NaN×4 (the reference errors on flat data). */
  def otsuSplit(mRaw: Array[Double]): (Double, Double, Double, Double) = {
    val s = mRaw.filterNot(_.isNaN).sorted
    val n = s.length
    if (n < 2 || s(0) == s(n - 1))
      return (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    // ascending prefix sums — the same accumulation the SQL window uses
    val cs = new Array[Double](n)
    val cs2 = new Array[Double](n)
    var a = 0.0; var a2 = 0.0; var i = 0
    while (i < n) {
      a += s(i); a2 += s(i) * s(i); cs(i) = a; cs2(i) = a2; i += 1
    }
    val tot = cs(n - 1); val tot2 = cs2(n - 1)
    def round5(x: Double): Double = math.floor(x * 1e5 + 0.5) / 1e5
    var bestI = -1; var bestIcv = Double.NegativeInfinity
    i = 1
    while (i < n) {
      if (s(i - 1) < s(i)) {
        val muL = cs(i - 1) / i
        val muU = (tot - cs(i - 1)) / (n - i)
        // normalized: i·(n−i)·Δ² / (n·(Σx² − (Σx)²/n)) = σ_b²/σ² —
        // EXACTLY this expression shape in the SQL oracle too
        val icv = round5(
          i.toDouble * (n - i) * (muL - muU) * (muL - muU) /
            (n.toDouble * (tot2 - tot * tot / n)))
        if (icv > bestIcv) { bestIcv = icv; bestI = i }
      }
      i += 1
    }
    val k = bestI
    val muL = cs(k - 1) / k
    val muU = (tot - cs(k - 1)) / (n - k)
    val stdL =
      if (k == 1) 0.0
      else math.sqrt(math.max(0.0,
        (cs2(k - 1) - cs(k - 1) * cs(k - 1) / k) / (k - 1)))
    val stdU =
      if (n - k == 1) 0.0
      else math.sqrt(math.max(0.0,
        ((tot2 - cs2(k - 1)) -
          (tot - cs(k - 1)) * (tot - cs(k - 1)) / (n - k)) / (n - k - 1)))
    (muU - muL, stdL, stdU, k.toDouble / n)
  }

  /** (period of highest peak, its power) from ONE periodogram pass — use
    * when both features are wanted (the periodogram is the most expensive
    * per-lightcurve kernel; computing it twice doubles the dominant
    * cost). */
  def periodogramPair(t: Array[Double], m: Array[Double]): (Double, Double) = {
    if (t.length < 4) return (Double.NaN, Double.NaN)
    val omegas = lsFrequencyGrid(t)
    if (omegas.isEmpty) return (Double.NaN, Double.NaN)
    val power = lombScargle(t, m, omegas)
    val valid = power.indices.filterNot(power(_).isNaN)
    if (valid.isEmpty) return (Double.NaN, Double.NaN)
    val best = valid.maxBy(power)
    (2 * math.Pi / omegas(best), power(best))
  }
}
