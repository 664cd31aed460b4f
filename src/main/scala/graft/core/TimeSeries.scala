package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Local, single-object view of a light curve — the Spark counterpart of
  * the reference's in-memory `TimeSeries` (src/tape/timeseries.py:7, with
  * accessors .time/.flux/.flux_err/.band timeseries.py:106-126). Produced
  * by a partition-pruned id-equality filter + collect
  * (reference to_timeseries, ensemble.py:2342-2401).
  */
final case class TimeSeries(
    id: Any,
    colMap: ColumnMap,
    rows: Array[Row],
    columns: Seq[String]
) {
  private def colIdx(name: String): Int = columns.indexOf(name)
  private def numCol(name: String): Array[Double] = {
    val i = colIdx(name)
    rows.map(r => graft.analysis.AnalysisFunction.num(r, i))
  }

  def time: Array[Double] = numCol(colMap.time)
  def flux: Array[Double] = numCol(colMap.flux)
  def fluxErr: Array[Double] = numCol(colMap.err)
  def band: Array[String] = {
    val i = colIdx(colMap.band)
    rows.map(r => Option(r.get(i)).map(_.toString).orNull)
  }
  def length: Int = rows.length

  /** Per-band Stetson J of this single lightcurve (reference
    * TimeSeries.stetson_J, timeseries.py:148-167). */
  def stetsonJ(bandToCalc: Option[Seq[String]] = None): Map[String, Double] = {
    val f = flux; val e = fluxErr; val b = band
    val unq = b.distinct.sorted
    bandToCalc.getOrElse(unq.toSeq).map { bb =>
      val idx = b.indices.filter(b(_) == bb)
      bb -> (if (idx.nonEmpty)
        graft.analysis.StetsonJ.singleBand(
          idx.map(f).toArray, idx.map(e).toArray)
      else Double.NaN)
    }.toMap
  }

  /** Structure function squared of this single lightcurve (reference
    * TimeSeries.sf2, timeseries.py:169-211). Returns the same row shape
    * as the ensemble-level operator: (lc_id, band, dt, sf2, 1_sigma). */
  def sf2(args: graft.analysis.sf.SFArgs = graft.analysis.sf.SFArgs()): Seq[Row] =
    graft.analysis.StructureFunction2(args).compute(
      time, flux, fluxErr, band, Array.fill(length)(String.valueOf(id)))
}

object TimeSeries {
  implicit class TimeSeriesOps(private val ens: Ensemble) extends AnyVal {
    /** Collect one object's sources as a local TimeSeries (reference
      * ensemble.py:2342-2401). With a range-partitioned/sorted source the
      * id filter prunes to a single partition's worth of scan. */
    def toTimeseries(target: Any): TimeSeries = {
      val cm = ens.colMap
      val df = ens.source.filter(col(cm.id) === lit(target))
        .sort(col(cm.time))
      TimeSeries(target, cm, df.collect(), df.columns.toSeq)
    }

    /** Random object's TimeSeries (reference select_random_timeseries,
      * ensemble.py:2294-2340 — explicitly non-uniform there too). */
    def selectRandomTimeseries(seed: Long = 42L): TimeSeries = {
      val cm = ens.colMap
      val idRow = ens.objectFrame.select(col(cm.id))
        .sample(withReplacement = false, 0.5, seed).limit(1).collect()
      val chosen =
        if (idRow.nonEmpty) idRow(0).get(0)
        else ens.objectFrame.select(col(cm.id)).limit(1).collect()(0).get(0)
      toTimeseries(chosen)
    }
  }
}
