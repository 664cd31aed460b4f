package graft.analysis

import scala.collection.mutable

/** Structure-function machinery: per-lightcurve pair differences, the three
  * Δt binning schemes, binned statistics, five SF estimators and their
  * plugin registry, and the argument container.
  *
  * Reference: src/tape/analysis/structure_function/ — base_calculator.py,
  * sf_light_curve.py, base_argument_container.py:97-116, the five
  * per-method calculator.py estimator files, calculator_registrar.py:4-45.
  *
  * Everything in this file is *driver-free in-group math*: it runs inside a
  * `flatMapGroups` task on one lightcurve's arrays (bounded memory), exactly
  * like the reference runs numpy on one pandas group.
  */
object sf {

  /** Configuration for structure-function calculations (reference
    * StructureFunctionArgumentContainer, base_argument_container.py:97-116). */
  final case class SFArgs(
      sfMethod: String = "basic",
      bandToCalc: Option[Seq[String]] = None,
      combine: Boolean = false,
      bins: Option[Array[Double]] = None,
      binMethod: String = "size",
      binCountTarget: Int = 100,
      ignoreTimestamps: Boolean = false,
      randomSeed: Option[Long] = None,
      equallyWeightLightcurves: Boolean = false,
      numberLightcurveSamples: Option[Int] = None,
      estimateErr: Boolean = false,
      calculationRepetitions: Int = 1,
      lowerErrorQuantile: Double = 0.16,
      upperErrorQuantile: Double = 0.84,
      reportUpperLowerErrorSeparately: Boolean = false
  ) extends Serializable

  val MinObservationsForSF = 3 // sf_light_curve.py:6

  /** Per-lightcurve validated data + all-pairs differences (reference
    * LightCurve light_curve.py:4-72 and StructureFunctionLightCurve
    * sf_light_curve.py:9-99). Pair expansion is O(n²)/2 per lightcurve —
    * acceptable because n is a single object's observation count; for
    * skewed giants use `equallyWeightLightcurves` subsampling like the
    * reference.
    *
    * @throws IllegalArgumentException on length mismatch or too few
    *         post-NaN-filter observations (light_curve.py:63-72).
    */
  final class SFLightCurve(
      timesIn: Array[Double],
      fluxesIn: Array[Double],
      errorsIn: Array[Double]
  ) extends Serializable {
    require(timesIn.length == fluxesIn.length &&
      timesIn.length == errorsIn.length,
      "Input arrays are expected to have the same size.")

    // NaN row filtering (light_curve.py:47-60)
    private val keep = timesIn.indices.filter { i =>
      !timesIn(i).isNaN && !fluxesIn(i).isNaN && !errorsIn(i).isNaN
    }
    val times: Array[Double] = keep.map(timesIn).toArray
    val fluxes: Array[Double] = keep.map(fluxesIn).toArray
    val errors: Array[Double] = keep.map(errorsIn).toArray

    require(times.length >= MinObservationsForSF,
      "Too few observations provided to create `LightCurve`.")

    // All pairs with dt > 0, in numpy's flatten order over the difference
    // matrix (sf_light_curve.py:29-52): row-major over (j, i) of
    // times[i] - times[j].
    val allDTimes: Array[Double] = {
      val buf = mutable.ArrayBuilder.make[Double]
      var j = 0
      while (j < times.length) {
        var i = 0
        while (i < times.length) {
          val dt = times(i) - times(j)
          if (dt > 0) buf += dt
          i += 1
        }
        j += 1
      }
      buf.result()
    }
    val allDFluxes: Array[Double] = {
      val buf = mutable.ArrayBuilder.make[Double]
      var j = 0
      while (j < times.length) {
        var i = 0
        while (i < times.length) {
          if (times(i) - times(j) > 0) buf += fluxes(i) - fluxes(j)
          i += 1
        }
        j += 1
      }
      buf.result()
    }
    val allSumSquaredError: Array[Double] = {
      val buf = mutable.ArrayBuilder.make[Double]
      var j = 0
      while (j < times.length) {
        var i = 0
        while (i < times.length) {
          if (times(i) - times(j) > 0)
            buf += errors(i) * errors(i) + errors(j) * errors(j)
          i += 1
        }
        j += 1
      }
      buf.result()
    }

    var sampleDTimes: Array[Double] = allDTimes
    var sampleDFluxes: Array[Double] = allDFluxes
    var sampleSumSquaredError: Array[Double] = allSumSquaredError
    def numberOfDifferenceValues: Int = allDTimes.length

    /** Random (re)sample of the difference triples, with replacement —
      * matching the reference code (`replace=True`,
      * sf_light_curve.py:91-99; the docstring says "without", the code says
      * with). Exact numpy RNG bit-parity is out of scope (SURVEY §7); we
      * use java.util.Random seeded deterministically. */
    def selectDifferenceSamples(n: Int, rng: java.util.Random): Unit = {
      require(n <= numberOfDifferenceValues,
        s"Requesting $n samples, but only $numberOfDifferenceValues are present")
      val dt = new Array[Double](n)
      val df = new Array[Double](n)
      val se = new Array[Double](n)
      var i = 0
      while (i < n) {
        val k = rng.nextInt(numberOfDifferenceValues)
        dt(i) = allDTimes(k); df(i) = allDFluxes(k); se(i) = allSumSquaredError(k)
        i += 1
      }
      sampleDTimes = dt; sampleDFluxes = df; sampleSumSquaredError = se
    }
  }

  // ----------------------------------------------------- numpy-compatible

  /** numpy linear-interpolation quantile on an UNSORTED array. */
  def quantile(values: Array[Double], q: Double): Double = {
    val sorted = values.sorted
    quantileSorted(sorted, q)
  }

  def quantileSorted(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    if (n == 1) return sorted(0)
    val pos = q * (n - 1)
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, n - 1)
    val frac = pos - lo
    sorted(lo) + frac * (sorted(hi) - sorted(lo))
  }

  /** numpy nanmedian: median of the non-NaN subset (NaN if empty). */
  def nanMedian(values: Array[Double]): Double = {
    val clean = values.filterNot(_.isNaN)
    if (clean.isEmpty) Double.NaN else quantile(clean, 0.5)
  }

  def nanQuantile(values: Array[Double], q: Double): Double = {
    val clean = values.filterNot(_.isNaN)
    if (clean.isEmpty) Double.NaN else quantile(clean, q)
  }

  /** scipy.stats.binned_statistic semantics: value v lands in bin i when
    * edges(i) <= v < edges(i+1); the last bin is closed on the right;
    * values outside [edges.head, edges.last] are ignored; empty bins give
    * NaN (reference base_calculator.py:109-215 wraps this). Bin lookup is
    * an UPPER-BOUND search (count of edges <= v, like numpy's
    * `searchsorted(side='right')` inside np.digitize) — with duplicate
    * edges (degenerate quantiles over few unique Δt) this picks the LAST
    * duplicate, exactly as scipy does, where `Arrays.binarySearch` would
    * return an arbitrary hit. */
  def binnedStatistic(
      x: Array[Double],
      values: Array[Double],
      edges: Array[Double],
      stat: Array[Double] => Double
  ): Array[Double] = {
    val nBins = edges.length - 1
    val buckets = Array.fill(nBins)(mutable.ArrayBuilder.make[Double])
    var i = 0
    while (i < x.length) {
      val v = x(i)
      if (v >= edges(0) && v <= edges(nBins)) {
        // upper bound: first index with edges(idx) > v
        var lo = 0; var hi = edges.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (edges(mid) <= v) lo = mid + 1 else hi = mid
        }
        var b = lo - 1 // containing bin
        if (b >= nBins) b = nBins - 1 // right edge of last bin is inclusive
        buckets(b) += values(i)
      }
      i += 1
    }
    buckets.map { b =>
      val arr = b.result()
      if (arr.isEmpty) Double.NaN else stat(arr)
    }
  }

  def mean(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s / a.length
  }

  // -------------------------------------------------------------- binning

  /** Compute Δt bin edges under one of three schemes (reference
    * base_calculator.py:60-107): 'size' = equal-count quantile bins over
    * unique Δt; 'length' = linear bins with the first edge extended by 0.1%
    * of the range (pandas.cut compatibility); 'loglength' = the same in log
    * space. */
  def binDts(
      dts: Array[Double],
      binMethod: String,
      binCountTarget: Int
  ): Array[Double] = {
    val numBins = math.ceil(dts.length.toDouble / binCountTarget).toInt
    val unique = dts.distinct.sorted
    binMethod match {
      case "size" =>
        (0 to numBins).map { k =>
          quantileSorted(unique, k.toDouble / numBins)
        }.toArray
      case "length" =>
        val lo = unique.head; val hi = unique.last
        val edges = linspace(lo, hi, numBins + 1)
        edges(0) -= 0.001 * (hi - lo)
        edges
      case "loglength" =>
        val logs = unique.map(math.log)
        val lo = logs.head; val hi = logs.last
        val edges = linspace(lo, hi, numBins + 1)
        edges(0) -= 0.001 * (hi - lo)
        edges.map(math.exp)
      case other =>
        throw new IllegalArgumentException(s"Method '$other' not recognized")
    }
  }

  def linspace(lo: Double, hi: Double, n: Int): Array[Double] = {
    if (n == 1) return Array(lo)
    val step = (hi - lo) / (n - 1)
    Array.tabulate(n)(i => if (i == n - 1) hi else lo + i * step)
  }

  // ---------------------------------------------------------- calculators

  /** Base SF estimator (reference StructureFunctionCalculator,
    * base_calculator.py:19-215). `bins` is computed lazily from the first
    * lightcurve with >1 differences and then REUSED for the rest — a
    * reference semantic worth preserving (base_calculator.py:183-186). */
  abstract class SFCalculator(
      val lightcurves: Seq[SFLightCurve],
      val args: SFArgs
  ) extends Serializable {
    protected var bins: Option[Array[Double]] = args.bins.map(_.clone())

    def calculate(): (Seq[Array[Double]], Seq[Array[Double]])
    def nameId: String

    /** reference _bootstrap, base_calculator.py:40-52: equal weighting →
      * min pair count for all; otherwise the configured sample count, and
      * when THAT is unset each lightcurve resamples at its OWN full count
      * (select_difference_samples None default, sf_light_curve.py:77-80). */
    def bootstrap(rng: java.util.Random): Unit = {
      val fixed: Option[Int] =
        if (args.equallyWeightLightcurves)
          Some(lightcurves.map(_.numberOfDifferenceValues).min)
        else args.numberLightcurveSamples
      lightcurves.foreach { lc =>
        lc.selectDifferenceSamples(
          fixed.getOrElse(lc.numberOfDifferenceValues), rng)
      }
    }

    /** reference _calculate_binned_statistics, base_calculator.py:109-215.
      * Returns (mean Δt per bin, statistic per bin), one array pair per
      * lightcurve (or a single pair in combine mode). */
    protected def calculateBinnedStatistics(
        sampleValues: Seq[Array[Double]],
        stat: Array[Double] => Double = mean
    ): (Seq[Array[Double]], Seq[Array[Double]]) = {
      require(sampleValues.length == lightcurves.length,
        "Number of lightcurves must equal sample_values.")
      if (args.combine && lightcurves.length > 1) {
        val allSampleDts = lightcurves.flatMap(_.sampleDTimes).toArray
        val allBinningDts = lightcurves.flatMap(_.allDTimes).toArray
        val allValues = sampleValues.flatten.toArray
        if (bins.isEmpty)
          bins = Some(binDts(allBinningDts, args.binMethod, args.binCountTarget))
        val sfs = binnedStatistic(allSampleDts, allValues, bins.get, stat)
        val dtMeans = binnedStatistic(allSampleDts, allSampleDts, bins.get, mean)
        (Seq(dtMeans), Seq(sfs))
      } else {
        val dtsAll = mutable.ListBuffer.empty[Array[Double]]
        val sfsAll = mutable.ListBuffer.empty[Array[Double]]
        lightcurves.indices.foreach { i =>
          val lc = lightcurves(i)
          if (lc.allDTimes.length > 1) {
            if (bins.isEmpty)
              bins = Some(binDts(lc.allDTimes, args.binMethod, args.binCountTarget))
            val sfs = binnedStatistic(lc.sampleDTimes, sampleValues(i), bins.get, stat)
            val dtMeans =
              binnedStatistic(lc.sampleDTimes, lc.sampleDTimes, bins.get, mean)
            dtsAll += dtMeans
            sfsAll += sfs
          } else {
            dtsAll += Array.empty[Double]
            sfsAll += Array.empty[Double]
          }
        }
        (dtsAll.toSeq, sfsAll.toSeq)
      }
    }
  }

  /** 'basic': mean(Δf² − (err_i²+err_j²)) per bin — Kozłowski 2016 eq. 12
    * (reference basic/calculator.py:16-23). */
  final class BasicCalculator(lcs: Seq[SFLightCurve], a: SFArgs)
      extends SFCalculator(lcs, a) {
    def nameId = "basic"
    def calculate(): (Seq[Array[Double]], Seq[Array[Double]]) = {
      val vals = lightcurves.map { lc =>
        lc.sampleDFluxes.indices.map { i =>
          lc.sampleDFluxes(i) * lc.sampleDFluxes(i) -
            lc.sampleSumSquaredError(i)
        }.toArray
      }
      calculateBinnedStatistics(vals)
    }
  }

  /** 'macleod_2012': (0.74·IQR(Δf))² per bin (reference
    * macleod_2012/calculator.py:26-50). */
  final class Macleod2012Calculator(lcs: Seq[SFLightCurve], a: SFArgs)
      extends SFCalculator(lcs, a) {
    def nameId = "macleod_2012"
    private val ConversionToSigma = 0.74
    def calculate(): (Seq[Array[Double]], Seq[Array[Double]]) = {
      val iqrStat: Array[Double] => Double = { arr =>
        val iqr = quantile(arr, 0.75) - quantile(arr, 0.25)
        val v = ConversionToSigma * iqr
        v * v
      }
      calculateBinnedStatistics(lightcurves.map(_.sampleDFluxes), iqrStat)
    }
  }

  /** 'bauer_2009a': mean(Δf²) − mean(err²) per bin (reference
    * bauer_2009a/calculator.py:19-31). */
  final class Bauer2009ACalculator(lcs: Seq[SFLightCurve], a: SFArgs)
      extends SFCalculator(lcs, a) {
    def nameId = "bauer_2009a"
    def calculate(): (Seq[Array[Double]], Seq[Array[Double]]) = {
      val (dts, meanDf2) = calculateBinnedStatistics(
        lightcurves.map(_.sampleDFluxes.map(x => x * x)))
      val (_, meanErr2) = calculateBinnedStatistics(
        lightcurves.map(_.sampleSumSquaredError))
      val sfs = meanDf2.zip(meanErr2).map { case (df2, e2) =>
        df2.indices.map(i => df2(i) - e2(i)).toArray
      }
      (dts, sfs)
    }
  }

  /** 'bauer_2009b': (π/2)·mean(|Δf|)² − mean(err²) per bin (reference
    * bauer_2009b/calculator.py:21-33). */
  final class Bauer2009BCalculator(lcs: Seq[SFLightCurve], a: SFArgs)
      extends SFCalculator(lcs, a) {
    def nameId = "bauer_2009b"
    private val PiOver2 = math.Pi / 2.0
    def calculate(): (Seq[Array[Double]], Seq[Array[Double]]) = {
      val (dts, meanAbsDf) = calculateBinnedStatistics(
        lightcurves.map(_.sampleDFluxes.map(math.abs)))
      val (_, meanErr2) = calculateBinnedStatistics(
        lightcurves.map(_.sampleSumSquaredError))
      val sfs = meanAbsDf.zip(meanErr2).map { case (adf, e2) =>
        adf.indices.map(i => PiOver2 * adf(i) * adf(i) - e2(i)).toArray
      }
      (dts, sfs)
    }
  }

  /** 'schmidt_2010': mean(√(π/2)·|Δf| − √(err_i²+err_j²))² per bin
    * (reference schmidt_2010/calculator.py:22-31). */
  final class Schmidt2010Calculator(lcs: Seq[SFLightCurve], a: SFArgs)
      extends SFCalculator(lcs, a) {
    def nameId = "schmidt_2010"
    private val SqrtPiOver2 = math.sqrt(math.Pi / 2.0)
    def calculate(): (Seq[Array[Double]], Seq[Array[Double]]) = {
      val vals = lightcurves.map { lc =>
        lc.sampleDFluxes.indices.map { i =>
          SqrtPiOver2 * math.abs(lc.sampleDFluxes(i)) -
            math.sqrt(lc.sampleSumSquaredError(i))
        }.toArray
      }
      val (dts, sfs) = calculateBinnedStatistics(vals)
      (dts, sfs.map(_.map(x => x * x)))
    }
  }

  // -------------------------------------------------------------- registry

  /** SF estimator registry with duplicate-name guard and runtime
    * registration (reference calculator_registrar.py:4-45). No reflection —
    * an explicit map. */
  object SFMethods {
    type Factory = (Seq[SFLightCurve], SFArgs) => SFCalculator
    private val methods = mutable.LinkedHashMap[String, Factory](
      "basic" -> (new BasicCalculator(_, _)),
      "macleod_2012" -> (new Macleod2012Calculator(_, _)),
      "bauer_2009a" -> (new Bauer2009ACalculator(_, _)),
      "bauer_2009b" -> (new Bauer2009BCalculator(_, _)),
      "schmidt_2010" -> (new Schmidt2010Calculator(_, _))
    )

    def apply(name: String): Factory =
      methods.getOrElse(name,
        throw new IllegalArgumentException(
          s"Unknown structure function calculator method: $name"))

    def register(name: String, factory: Factory,
        force: Boolean = false): Unit = {
      if (methods.contains(name) && !force)
        throw new IllegalArgumentException(
          s"A Structure Function calculator with name '$name' already exists")
      methods(name) = factory
    }

    def names: Seq[String] = methods.keys.toSeq
    def contains(name: String): Boolean = methods.contains(name)
  }
}
