package graft.analysis

import graft.core.Ensemble
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational (self-join) structure function — the 100 TB scale path.
  *
  * The batch-engine SF² ([[StructureFunction2]]) materializes a
  * lightcurve's O(n²)/2 pair triples inside ONE task, exactly like the
  * reference (sf_light_curve.py:27-49). That is the right physical plan
  * for typical lightcurves (n ≲ 10⁴), but a single 10⁵-observation object
  * means ~5·10⁹ triples in one task — unrunnable. This operator expresses
  * pair expansion relationally instead:
  *
  *   pairs = src AS a JOIN src AS b
  *           ON a.id = b.id AND a.band = b.band AND a.time < b.time
  *
  * so Catalyst plans a shuffled equi-join on (id, band) and the pair rows
  * stream through whole-stage codegen without ever materializing per
  * group; binning and the estimator become ordinary aggregates with
  * map-side partials. AQE's skew-join splitting spreads a giant
  * lightcurve's pair generation across tasks — the property the
  * in-task path fundamentally cannot have.
  *
  * Supported: estimators basic / bauer_2009a / bauer_2009b / schmidt_2010
  * (pure aggregates) and macleod_2012 (exact `percentile` aggregate);
  * binning `length` / `loglength` (closed-form per-group edges from
  * min/max/count — 2 aggregation passes, no per-group quantile state);
  * combine mode (keys drop the id). The `size` (equal-count) binning
  * scheme needs per-group quantiles over distinct Δt — use the batch path
  * for that ([[Ops.AnalysisOps.sf2]]), which is also the
  * reference-numerics-exact path.
  */
object SF2Relational {

  def sf2Relational(
      ens: Ensemble,
      args: sf.SFArgs = sf.SFArgs()
  ): DataFrame = {
    require(args.binMethod == "length" || args.binMethod == "loglength",
      s"relational SF2 supports length/loglength binning; " +
        s"'${args.binMethod}' needs the batch path (Ops.sf2)")
    require(!args.estimateErr && args.calculationRepetitions <= 1 &&
      !args.equallyWeightLightcurves,
      "bootstrap error estimation / equal weighting need per-group " +
        "resampling state — use the batch path (Ops.sf2)")
    val cm = ens.colMap
    val src = ens.source.select(
      col(cm.id).cast("string").as("lc_id"),
      col(cm.band).cast("string").as("band"),
      col(cm.time).cast("double").as("t"),
      col(cm.flux).cast("double").as("f"),
      col(cm.err).cast("double").as("e"))
      // null AND NaN rows drop, matching SFLightCurve's keep-filter in the
      // batch path (isnan(null) is false in Spark, so nulls need their own
      // guard — without it a null-flux row would inflate npairs/nbins)
      .filter(col("t").isNotNull && col("f").isNotNull && col("e").isNotNull &&
        !isnan(col("t")) && !isnan(col("f")) && !isnan(col("e")))
    val bandFiltered = args.bandToCalc match {
      case Some(bs) => src.filter(col("band").isin(bs: _*))
      case None     => src
    }

    val a = bandFiltered.as("a"); val b = bandFiltered.as("b")
    val pairs = a.join(b,
        col("a.lc_id") === col("b.lc_id") &&
          col("a.band") === col("b.band") && col("a.t") < col("b.t"))
      .select(col("a.lc_id").as("lc_id"), col("a.band").as("band"),
        (col("b.t") - col("a.t")).as("dt"),
        (col("b.f") - col("a.f")).as("df"),
        (col("a.e") * col("a.e") + col("b.e") * col("b.e")).as("sse"))

    val keys: Seq[String] =
      if (args.combine) Seq("band") else Seq("lc_id", "band")
    val keyCols = keys.map(col)

    // Per-lightcurve Δt range and pair count, derived from the SOURCE
    // rows (n per group) rather than a second O(n²) pair expansion:
    //   max Δt  = max(t) − min(t)
    //   min Δt  = the smallest positive gap between time-sorted
    //             observations (the global minimum pair difference is
    //             always attained by an adjacent pair)
    //   npairs  = n·(n−1)/2 − Σ_t c_t·(c_t−1)/2  (strict <, ties excluded)
    // so the expensive self-join runs exactly once. These are ALWAYS
    // computed per (lc_id, band) — pairs never span lightcurves — and in
    // combine mode the per-band pooled range is then the min/max/sum of
    // the per-lightcurve stats (pooled pair dts = union of per-LC pair
    // dts). The window also stays partitioned per lightcurve, so no
    // single task sees a whole band.
    import org.apache.spark.sql.expressions.Window
    val lcKeys = Seq(col("lc_id"), col("band"))
    val w = Window.partitionBy(lcKeys: _*).orderBy(col("t"))
    val gaps = bandFiltered
      .withColumn("__gap", col("t") - lag(col("t"), 1).over(w))
    val tieCounts = bandFiltered.groupBy((lcKeys :+ col("t")): _*)
      .agg(count(lit(1)).as("__ct"))
      .groupBy(lcKeys: _*)
      .agg(sum(col("__ct") * (col("__ct") - 1) / 2).as("__tiepairs"))
    val perLc = gaps.groupBy(lcKeys: _*)
      .agg(min(when(col("__gap") > 0, col("__gap"))).as("mindt"),
        (max(col("t")) - min(col("t"))).as("maxdt"),
        count(lit(1)).as("n"))
      .join(tieCounts, Seq("lc_id", "band"))
      .withColumn("npairs",
        (col("n") * (col("n") - 1) / 2 - col("__tiepairs")).cast("long"))
      .filter(col("npairs") > 0)
    val rawRanges =
      if (args.combine)
        perLc.groupBy(col("band"))
          .agg(min(col("mindt")).as("mindt"), max(col("maxdt")).as("maxdt"),
            sum(col("npairs")).as("npairs"))
      else perLc
    val toEdge: Column => Column =
      if (args.binMethod == "loglength") log else identity
    val ranges = rawRanges.select(
      (keyCols :+ toEdge(col("mindt")).as("lo")
        :+ toEdge(col("maxdt")).as("hi")
        :+ greatest(ceil(col("npairs") / args.binCountTarget), lit(1L))
          .as("nbins")): _*)

    // bin index: uniform interior edges over [lo, hi]; first edge extended
    // by 0.1% of the range (base_calculator.py:88-90) — subsumed by
    // clamping; right edge of the last bin closed.
    val withBins = pairs.join(ranges, keys)
      .withColumn("__x",
        if (args.binMethod == "loglength") log(col("dt")) else col("dt"))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L)) // degenerate single-Δt group
          .otherwise(least(greatest(
            floor((col("__x") - col("lo")) / ((col("hi") - col("lo")) /
              col("nbins"))).cast("long"), lit(0L)),
            col("nbins") - 1)))

    // pass 2: per-(group, bin) estimator aggregate
    val sf2Agg: Column = args.sfMethod match {
      case "basic"       => avg(col("df") * col("df") - col("sse"))
      case "bauer_2009a" => avg(col("df") * col("df")) - avg(col("sse"))
      case "bauer_2009b" =>
        lit(math.Pi / 2.0) * pow(avg(abs(col("df"))), 2) - avg(col("sse"))
      case "schmidt_2010" =>
        pow(avg(lit(math.sqrt(math.Pi / 2.0)) * abs(col("df")) -
          sqrt(col("sse"))), 2)
      case "macleod_2012" =>
        pow(lit(0.74) * (percentile(col("df"), lit(0.75)) -
          percentile(col("df"), lit(0.25))), 2)
      case other => throw new IllegalArgumentException(
        s"Unknown structure function calculator method: $other")
    }

    val grouped = withBins
      .groupBy((keyCols :+ col("bin")): _*)
      .agg(avg(col("dt")).as("dt"), sf2Agg.as("sf2"))
      .drop("bin")

    val out =
      if (args.combine) grouped.withColumn("lc_id", lit("combined"))
      else grouped
    val res = out.select(col("lc_id"), col("band"), col("dt"), col("sf2"))
    ens.addFrame(res, None)
    res
  }

  implicit class SF2RelationalOps(private val ens: Ensemble) extends AnyVal {
    def sf2Relational(args: sf.SFArgs = sf.SFArgs()): DataFrame =
      SF2Relational.sf2Relational(ens, args)
  }
}
