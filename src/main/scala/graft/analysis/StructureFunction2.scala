package graft.analysis

import graft.core.ColumnMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Structure function squared per (lightcurve, band) — the driver around
  * the SF calculators (reference StructureFunction2,
  * src/tape/analysis/structurefunction2.py:14-229).
  *
  * Runs inside a batch group: the group is one lightcurve in the default
  * per-object mode, or the whole ensemble in combine mode. Output rows are
  * `(lc_id, band, dt, sf2, 1_sigma[, lower_error, upper_error])`
  * (structurefunction2.py:26-27, 201-213).
  */
final case class StructureFunction2(
    args: sf.SFArgs = sf.SFArgs()
) extends AnalysisFunction {

  override def cols(cm: ColumnMap): Seq[String] =
    Seq(cm.time, cm.flux, cm.err, cm.band, cm.id)

  override val outputSchema: StructType = {
    val base = Seq(
      StructField("lc_id", StringType, nullable = true),
      StructField("band", StringType, nullable = true),
      StructField("dt", DoubleType, nullable = true),
      StructField("sf2", DoubleType, nullable = true),
      StructField("1_sigma", DoubleType, nullable = true)
    )
    val extra =
      if (args.reportUpperLowerErrorSeparately)
        Seq(StructField("lower_error", DoubleType, nullable = true),
          StructField("upper_error", DoubleType, nullable = true))
      else Seq.empty
    StructType(base ++ extra)
  }

  override def apply(rows: Seq[Row]): Seq[Row] = {
    import AnalysisFunction._
    val time = rows.map(num(_, 0)).toArray
    val flux = rows.map(num(_, 1)).toArray
    val err = rows.map(num(_, 2)).toArray
    val band = rows.map(str(_, 3)).toArray
    val lcId = rows.map(str(_, 4)).toArray
    compute(time, flux, err, band, lcId)
  }

  /** Core flow, directly callable with arrays (mirrors calc_sf2's signature
    * for unit tests; structurefunction2.py:33-229). */
  def compute(
      timeIn: Array[Double],
      flux: Array[Double],
      err: Array[Double],
      bandIn: Array[String],
      lcIdIn: Array[String]
  ): Seq[Row] = {
    // Fallback band/id arrays (structurefunction2.py:258-318)
    val band =
      if (bandIn == null) Array.fill(flux.length)("0") else bandIn
    val lcId =
      if (lcIdIn == null) Array.fill(flux.length)("0") else lcIdIn
    require(band.length == flux.length,
      "Value of `band` should be `None` or array with the same length as the `flux` array.")
    require(lcId.length == flux.length,
      "Value of `lc_id` should be `None` or array with the same length as the `flux` array.")
    require(sf.SFMethods.contains(args.sfMethod),
      s"Unknown structure function calculator method: ${args.sfMethod}")

    val unqBands = band.distinct.sorted
    val unqIds = lcId.distinct.sorted // np.unique sorts
    val bandToCalc = args.bandToCalc.getOrElse(unqBands.toSeq)

    val out = mutable.ListBuffer.empty[Row]

    bandToCalc.foreach { b =>
      if (unqBands.contains(b)) {
        val mask = band.indices.filter(band(_) == b)
        // equidistant-time fallback when timestamps are absent/ignored
        // (structurefunction2.py:386-418 _extract_time)
        val times: Array[Double] =
          if (timeIn == null || args.ignoreTimestamps)
            Array.tabulate(mask.length)(_.toDouble)
          else mask.map(timeIn).toArray
        val fluxes = mask.map(flux).toArray
        // scalar/None err handled by callers via pre-built arrays; null →
        // all zeros (structurefunction2.py:421-442 _extract_error)
        val errors =
          if (err == null) Array.fill(mask.length)(0.0)
          else mask.map(err).toArray
        val ids = mask.map(lcId).toArray

        // one SFLightCurve per id; too-few-points curves skipped
        // (structurefunction2.py:113-127). Surviving ids are tracked
        // alongside their curves so labels stay correct when some ids
        // are skipped. One-pass index grouping — O(n) instead of the
        // O(n·u) per-id scan (round-1 verdict minor #6; matters in
        // combine mode over many objects).
        val idxById = ids.indices.groupBy(ids(_))
        val idAndCurve = unqIds.flatMap { id =>
          val im = idxById.getOrElse(id, IndexedSeq.empty)
          try Some(id -> new sf.SFLightCurve(
            im.map(times).toArray, im.map(fluxes).toArray,
            im.map(errors).toArray))
          catch { case _: IllegalArgumentException => None }
        }.toSeq
        val survivingIds = idAndCurve.map(_._1)
        val lightcurves = idAndCurve.map(_._2)

        if (lightcurves.nonEmpty) {
          val calc = sf.SFMethods(args.sfMethod)(lightcurves, args)
          val rng = new java.util.Random(args.randomSeed.getOrElse(42L))
          // [rep][lc][bin] stacks (structurefunction2.py:131-166)
          val aggDts = mutable.ListBuffer.empty[Seq[Array[Double]]]
          val aggSfs = mutable.ListBuffer.empty[Seq[Array[Double]]]
          (0 until args.calculationRepetitions).foreach { _ =>
            if (args.estimateErr) calc.bootstrap(rng)
            val (d, s) = calc.calculate()
            aggDts += d; aggSfs += s
          }
          val nLcs = aggDts.head.length
          (0 until nLcs).foreach { li =>
            val nBins = aggDts.head(li).length
            val lcLabel =
              if (args.combine) "combined"
              else survivingIds(li)
            (0 until nBins).foreach { bi =>
              val dtStack = aggDts.map(_(li)(bi)).toArray
              val sfStack = aggSfs.map(_(li)(bi)).toArray
              val dtMed = sf.nanMedian(dtStack)
              val sfMed = sf.nanMedian(sfStack)
              val lowerQ = sf.nanQuantile(sfStack, args.lowerErrorQuantile)
              val upperQ = sf.nanQuantile(sfStack, args.upperErrorQuantile)
              val sigma =
                if (args.calculationRepetitions <= 1) 0.0
                else (upperQ - lowerQ) / 2
              if (args.reportUpperLowerErrorSeparately) {
                val lo = if (args.calculationRepetitions <= 1) 0.0 else sfMed - lowerQ
                val hi = if (args.calculationRepetitions <= 1) 0.0 else upperQ - sfMed
                out += Row(lcLabel, b, dtMed, sfMed, sigma, lo, hi)
              } else out += Row(lcLabel, b, dtMed, sfMed, sigma)
            }
          }
        }
      }
    }
    out.toSeq
  }

}
