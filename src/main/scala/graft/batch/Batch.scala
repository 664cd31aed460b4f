package graft.batch

import graft.analysis.AnalysisFunction
import graft.core.Ensemble
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The per-lightcurve groupby-apply engine — the Spark rebuild of the
  * reference's `Ensemble.batch` (ensemble.py:1054-1237) plus its result
  * standardization (`_standardize_batch`, ensemble.py:1239-1313).
  *
  * Spark-first shape: one `groupByKey(keyRow).flatMapGroups` over the source
  * (optionally pre-joined with requested object-table columns). The declared
  * `StructType` plays the role of Dask's `meta`, turned into a Row encoder.
  * The reference's two code paths (partition-local `map_partitions` when
  * divisions are known vs. global shuffle groupby, ensemble.py:1203-1225)
  * collapse into this single plan: Catalyst inserts the key exchange only
  * when the incoming partitioning doesn't already satisfy it, so a source
  * that was `sortLightcurves()`-ed (range-partitioned on id) skips the
  * shuffle exactly like the reference's fast path.
  *
  * Scale notes: groups are single lightcurves — memory per task is bounded
  * by the largest lightcurve, not the partition; skewed giants are spread by
  * Spark's hash exchange over `spark.sql.shuffle.partitions`.
  */
object Batch {

  /** Run `fn` per group over the ensemble source.
    *
    * @param on    grouping keys; defaults to `fn.on` (usually the id col).
    *              Keys may name object-table columns — those are grafted
    *              onto the source with a broadcast left join first
    *              (reference ensemble.py:1182-1190).
    * @param byBand groups by (keys..., band) and pivots the result so each
    *              output column becomes `<col>_<band>`
    *              (reference ensemble.py:1285-1306).
    * @param label track the result frame under this name (auto `result_N`
    *              otherwise, reference ensemble.py:256-266).
    * @return the tracked result DataFrame.
    */
  def batch(
      ens: Ensemble,
      fn: AnalysisFunction,
      on: Option[Seq[String]] = None,
      byBand: Boolean = false,
      label: Option[String] = None
  ): DataFrame = {
    val cm = ens.colMap
    var keys = on.getOrElse(fn.on(cm))
    if (byBand && !keys.contains(cm.band)) keys = keys :+ cm.band

    val src = ens.source // lazy-sync hook (reference ensemble.py:1150)
    val dataCols = fn.cols(cm)

    // Graft object-table grouping columns onto the source when needed
    // (reference ensemble.py:1182-1190). The object table is one row per
    // lightcurve — orders of magnitude smaller than source — so hint
    // broadcast; AQE falls back to a shuffled join if it is still too big.
    val objOnly = keys.filterNot(src.columns.contains)
    val joined =
      if (objOnly.isEmpty) src
      else {
        val objCols = ens.objectFrame
          .select((cm.id +: objOnly).distinct.map(col): _*)
        src.join(broadcast(objCols), Seq(cm.id), "left")
      }

    val projected = joined.select((keys ++ dataCols).distinct.map(col): _*)
    val keySchema = StructType(keys.map(projected.schema(_)))
    val outSchema = StructType(keySchema.fields ++ fn.outputSchema.fields)

    val keyIdx = keys.map(projected.columns.indexOf(_))
    val dataIdx = dataCols.map(projected.columns.indexOf(_))

    // Encoders built from declared StructTypes — the Spark analog of the
    // reference's Dask `meta` (SURVEY §7 "Encoders for dynamic schemas").
    val keyEnc = Encoders.row(keySchema)
    val outEnc = Encoders.row(outSchema)

    val grouped = projected
      .groupByKey { row =>
        Row.fromSeq(keyIdx.map(row.get)): Row
      }(keyEnc)
      .flatMapGroups { (key: Row, it: Iterator[Row]) =>
        val rows = it.map(r => Row.fromSeq(dataIdx.map(r.get))).toVector
        fn(rows).iterator.map(out => Row.fromSeq(key.toSeq ++ out.toSeq))
      }(outEnc)

    val result =
      if (byBand) pivotByBand(ens, grouped.toDF(), keys, cm.band, fn)
      else grouped.toDF()

    ens.addFrame(result, label)
    result
  }

  /** Reshape a long (keys..., band, out...) result into per-band columns
    * `out_band` (reference _standardize_batch, ensemble.py:1285-1306). The
    * distinct-band collect mirrors the reference's `categorize` — bands are
    * low-cardinality. */
  private def pivotByBand(
      ens: Ensemble,
      long: DataFrame,
      keys: Seq[String],
      bandCol: String,
      fn: AnalysisFunction
  ): DataFrame = {
    val idKeys = keys.filterNot(_ == bandCol)
    val outCols = fn.outputSchema.fieldNames.toSeq
    val bands = long.select(col(bandCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    // numeric outputs sum across multi-row results per (key, band) —
    // the reference's pivot_table(aggfunc="sum"), ensemble.py:1291-1293;
    // non-numeric outputs keep the first value (sum is undefined).
    val aggs = outCols.map { c =>
      fn.outputSchema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => sum(col(c)).as(c)
        case _ => first(col(c)).as(c)
      }
    }
    val pivoted = long
      .groupBy(idKeys.map(col): _*)
      .pivot(col(bandCol).cast("string"), bands.toSeq)
      .agg(aggs.head, aggs.tail: _*)
    // Spark names pivot outputs `<band>_<agg>` (or `<band>` for one agg);
    // normalize to the reference's `<col>_<band>`.
    val renamed = if (outCols.size == 1) {
      bands.foldLeft(pivoted) { (d, b) =>
        d.withColumnRenamed(b, s"${outCols.head}_$b")
      }
    } else {
      bands.foldLeft(pivoted) { (d, b) =>
        outCols.foldLeft(d) { (dd, c) =>
          dd.withColumnRenamed(s"${b}_$c", s"${c}_$b")
        }
      }
    }
    renamed
  }

  implicit class BatchOps(private val ens: Ensemble) extends AnyVal {
    def batch(
        fn: AnalysisFunction,
        on: Option[Seq[String]] = None,
        byBand: Boolean = false,
        label: Option[String] = None
    ): DataFrame = Batch.batch(ens, fn, on, byBand, label)
  }
}
