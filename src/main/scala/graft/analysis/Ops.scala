package graft.analysis

import graft.batch.Batch
import graft.core.{ColumnMap, Ensemble}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ensemble-level analysis entry points (reference Ensemble.sf2,
  * ensemble.py:2429-2475) and a generic column-reducer for `batch(np.mean,
  * col)`-style ad-hoc aggregations (reference ensemble.py:1137-1147).
  */
object Ops {

  /** Arbitrary per-group reducer over one column — the counterpart of
    * passing a plain numpy reducer to `batch`. For codegen-able reducers
    * prefer `source.groupBy(id).agg(...)`; this exists for custom Scala
    * logic. */
  final case class ColumnReducer(
      column: ColumnMap => String,
      outName: String,
      reduce: Array[Double] => Double
  ) extends AnalysisFunction {
    override def cols(cm: ColumnMap): Seq[String] = Seq(column(cm))
    override val outputSchema: StructType =
      StructType(Seq(StructField(outName, DoubleType, nullable = true)))
    override def apply(rows: Seq[Row]): Seq[Row] = {
      val arr = rows.map(AnalysisFunction.num(_, 0)).toArray
      Seq(Row(reduce(arr)))
    }
  }

  implicit class AnalysisOps(private val ens: Ensemble) extends AnyVal {
    /** Structure function over the whole ensemble (reference
      * ensemble.py:2429-2475). Default: per-object groups through the batch
      * engine. `args.combine=true` pools every lightcurve into ONE group —
      * same semantics as the reference's combine mode, and the same
      * single-task cost profile; at very large scale prefer per-object mode
      * or pre-`sample()` the ensemble, as the reference docs advise. */
    def sf2(
        args: sf.SFArgs = sf.SFArgs(),
        label: Option[String] = None
    ): DataFrame = {
      val fn = StructureFunction2(args)
      if (args.combine) {
        val cm = ens.colMap
        val key = "__sf2_combine_key"
        ens.assign(Ensemble.SourceLabel, temporary = true,
          key -> lit(0))
        val res = Batch.batch(ens, fn, on = Some(Seq(key)), label = label)
        res.drop(key)
      } else {
        Batch.batch(ens, fn, label = label)
      }
    }

    def stetsonJ(
        bandToCalc: Option[Seq[String]] = None,
        checkNans: Boolean = false,
        label: Option[String] = None
    ): DataFrame =
      Batch.batch(ens, StetsonJ(bandToCalc, checkNans), label = label)

    def extractFeatures(
        features: Seq[String],
        band: Option[String] = None,
        label: Option[String] = None
    ): DataFrame =
      Batch.batch(ens, FeatureExtractor(features, band), label = label)
  }
}
