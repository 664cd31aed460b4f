package graft.analysis

import graft.core.ColumnMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Stetson J variability statistic per band, per lightcurve.
  *
  * Reference: src/tape/analysis/stetsonj.py:12-190 —
  * `J = mean(sign(p_k) * sqrt(|p_k|))` with `p_k = delta_k^2 - 1` and
  * `delta_k = sqrt(n/(n-1)) * (flux_k - stetson_mean) / err_k`, where the
  * Stetson mean iteratively down-weights outliers
  * (alpha=2, beta=2, <=20 iterations, tol 1e-6; stetsonj.py:133-190).
  *
  * Output: one row per computed band, `(band, stetsonJ)`; the batch engine
  * prepends the group key (the object id). `bandToCalc=None` means all bands
  * present in the group (stetsonj.py:71-78); requesting an absent band
  * yields NaN (stetsonj.py:86-88).
  */
final case class StetsonJ(
    bandToCalc: Option[Seq[String]] = None,
    checkNans: Boolean = false
) extends AnalysisFunction {

  override def cols(cm: ColumnMap): Seq[String] =
    Seq(cm.flux, cm.err, cm.band)

  override val outputSchema: StructType = StructType(Seq(
    StructField("band", StringType, nullable = true),
    StructField("stetsonJ", DoubleType, nullable = true)
  ))

  override def apply(rows: Seq[Row]): Seq[Row] = {
    import AnalysisFunction._
    var flux = rows.map(num(_, 0)).toArray
    var err = rows.map(num(_, 1)).toArray
    var band = rows.map(str(_, 2)).toArray

    if (checkNans) { // stetsonj.py:61-68
      val keep = flux.indices.filter(i => !flux(i).isNaN && !err(i).isNaN)
      flux = keep.map(flux).toArray
      err = keep.map(err).toArray
      band = keep.map(band).toArray
    }

    val unqBands = band.distinct.sorted
    val targets = bandToCalc.getOrElse(unqBands.toSeq)
    targets.map { b =>
      val j =
        if (unqBands.contains(b)) {
          val idx = band.indices.filter(band(_) == b)
          StetsonJ.singleBand(idx.map(flux).toArray, idx.map(err).toArray)
        } else Double.NaN
      Row(b, j)
    }
  }
}

object StetsonJ {

  /** Single-band Stetson J (reference _stetson_J_single,
    * stetsonj.py:96-130). */
  def singleBand(fluxes: Array[Double], errors: Array[Double]): Double = {
    val n = fluxes.length
    if (n <= 1) return Double.NaN
    val mean = stetsonMean(fluxes, errors)
    val nFactor = math.sqrt(n.toDouble / (n - 1))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val delta = nFactor * (fluxes(i) - mean) / errors(i)
      val pk = delta * delta - 1.0
      acc += math.signum(pk) * math.sqrt(math.abs(pk))
      i += 1
    }
    acc / n
  }

  /** Iteratively re-weighted Stetson mean (reference _stetson_J_mean,
    * stetsonj.py:133-190), including the literal termination nuances: a
    * `mean == 0` break and the unguarded `diff / mean < tol` check. */
  def stetsonMean(
      values: Array[Double],
      errors: Array[Double],
      alpha: Double = 2.0,
      beta: Double = 2.0,
      nIter: Int = 20,
      tol: Double = 1e-6
  ): Double = {
    val n = values.length
    val nFactor = math.sqrt(n.toDouble / (n - 1))
    val invVar = errors.map(e => 1.0 / (e * e))

    def weightedAvg(weights: Array[Double]): Double = {
      var num = 0.0; var den = 0.0; var i = 0
      while (i < n) { num += weights(i) * values(i); den += weights(i); i += 1 }
      num / den
    }

    var mean = weightedAvg(invVar)
    var iter = 0
    var done = false
    while (iter < nIter && !done) {
      val weights = new Array[Double](n)
      var i = 0
      while (i < n) {
        val chi = math.abs(nFactor * (values(i) - mean) / errors(i))
        weights(i) = invVar(i) / (1.0 + math.pow(chi / alpha, beta))
        i += 1
      }
      val tmpMean = weightedAvg(weights)
      val diff = math.abs(tmpMean - mean)
      mean = tmpMean
      if (mean == 0.0) done = true // stetsonj.py:186-187
      else if (diff / mean < tol && diff < tol) done = true // :188-189
      iter += 1
    }
    mean
  }
}
