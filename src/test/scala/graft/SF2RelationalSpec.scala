package graft

import graft.analysis.{sf, Ops, SF2Relational}
import org.apache.spark.sql.functions._

/** Relational (self-join) SF² agrees with the in-task batch path where
  * their binning semantics coincide. */
class SF2RelationalSpec extends SparkSuite {

  def singleObjectEnsemble() = {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val anyId = ens.source.select("user_id").limit(1).collect()(0).getLong(0)
    ens.query(s"user_id = $anyId")
    ens
  }

  def toMap(df: org.apache.spark.sql.DataFrame): Map[(String, String, Int), (Double, Double)] =
    df.collect().map { r =>
      // key by rounded dt so float-order differences don't break the match
      (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e6).toInt) ->
        (r.getDouble(2), r.getDouble(3))
    }.toMap

  test("single lightcurve: relational == batch for length binning, all estimators") {
    for (m <- Seq("basic", "bauer_2009a", "bauer_2009b", "schmidt_2010",
        "macleod_2012")) {
      val args = sf.SFArgs(sfMethod = m, binMethod = "length",
        binCountTarget = 30)
      val batch = toMap(Ops.AnalysisOps(singleObjectEnsemble()).sf2(args)
        .select("lc_id", "band", "dt", "sf2"))
      val rel = toMap(SF2Relational.SF2RelationalOps(singleObjectEnsemble())
        .sf2Relational(args))
      assert(rel.keySet === batch.keySet, m)
      rel.foreach { case (k, (dt, s)) =>
        val (bdt, bs) = batch(k)
        assert(math.abs(dt - bdt) <= 1e-9 * (1 + math.abs(bdt)), s"$m dt")
        assert(math.abs(s - bs) <= 1e-9 * (1 + math.abs(bs)), s"$m sf2 $s vs $bs")
      }
    }
  }

  test("combine mode values match the batch combine path (well-separated curves)") {
    // two lightcurves far apart in time: pooled ranges must come from
    // within-curve pairs only (regression: per-band pooled min/max over
    // OBSERVATIONS put hi at the cross-curve span)
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.query("user_id IN (0, 1)")
    ens.assign("ts_days" ->
      when(col("user_id") === 1, col("ts_days") + 100000.0)
        .otherwise(col("ts_days")))
    val args = sf.SFArgs(binMethod = "length", combine = true,
      binCountTarget = 40)
    val rel = toMap(SF2Relational.SF2RelationalOps(ens).sf2Relational(args))

    val ens2 = SparkEntry.eventsEnsemble(spark, sf0001)
    ens2.query("user_id IN (0, 1)")
    ens2.assign("ts_days" ->
      when(col("user_id") === 1, col("ts_days") + 100000.0)
        .otherwise(col("ts_days")))
    val batch = toMap(Ops.AnalysisOps(ens2).sf2(args)
      .select("lc_id", "band", "dt", "sf2"))
    assert(rel.keySet === batch.keySet,
      s"rel-only=${rel.keySet -- batch.keySet} batch-only=${batch.keySet -- rel.keySet}")
    rel.foreach { case (k, (dt, s)) =>
      val (bdt, bs) = batch(k)
      assert(math.abs(dt - bdt) <= 1e-9 * (1 + math.abs(bdt)), s"dt at $k")
      assert(math.abs(s - bs) <= 1e-9 * (1 + math.abs(bs)), s"sf2 at $k")
    }
  }

  test("combine mode pools lightcurves per band with global bins") {
    val args = sf.SFArgs(binMethod = "loglength", combine = true,
      binCountTarget = 200)
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.query("user_id < 10")
    val rel = SF2Relational.SF2RelationalOps(ens).sf2Relational(args)
    val rows = rel.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) == "combined"))
    // one row group per band
    assert(rows.map(_.getString(1)).distinct.length ===
      ens.source.select("event_type").distinct().count())
  }

  /** Every logical Window in the plan must carry a partition spec — a
    * partition-less window pulls the whole table through ONE task (the
    * round-1 checkSorted scale bug class). Asserted on the optimized plan
    * so literal-key fixtures that let Catalyst constant-fold the spec away
    * fail loudly instead of just WARN-ing. */
  def assertWindowsPartitioned(df: org.apache.spark.sql.DataFrame): Unit = {
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "fixture expected a windowed plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"single-partition window in plan:\n$w"))
  }

  /** Collect (NaN-row count, non-NaN map) — size binning emits NaN rows
    * for empty bins, which toMap's dt-keying can't distinguish. */
  def toNanSplit(df: org.apache.spark.sql.DataFrame)
      : (Long, Map[(String, String, Int), (Double, Double)]) = {
    val rows = df.collect()
    val nan = rows.count(r => r.getDouble(2).isNaN)
    val m = rows.filterNot(r => r.getDouble(2).isNaN).map { r =>
      (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e6).toInt) ->
        (r.getDouble(2), r.getDouble(3))
    }.toMap
    (nan, m)
  }

  def assertSizeAgrees(batchDf: org.apache.spark.sql.DataFrame,
      relDf: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    val (bNan, batch) = toNanSplit(batchDf)
    val (rNan, rel) = toNanSplit(relDf)
    assert(rNan === bNan, s"$tag NaN (empty-bin) row count")
    assert(rel.keySet === batch.keySet,
      s"$tag rel-only=${rel.keySet -- batch.keySet} " +
        s"batch-only=${batch.keySet -- rel.keySet}")
    rel.foreach { case (k, (dt, s)) =>
      val (bdt, bs) = batch(k)
      assert(math.abs(dt - bdt) <= 1e-9 * (1 + math.abs(bdt)), s"$tag dt $k")
      assert(math.abs(s - bs) <= 1e-9 * (1 + math.abs(bs)),
        s"$tag sf2 $k: $s vs $bs")
      assert(s.isNaN === bs.isNaN, s"$tag sf2 NaN at $k")
    }
  }

  test("single lightcurve: relational == batch for size binning (reference default), all estimators") {
    for (m <- Seq("basic", "bauer_2009a", "bauer_2009b", "schmidt_2010",
        "macleod_2012")) {
      val args = sf.SFArgs(sfMethod = m, binMethod = "size",
        binCountTarget = 30)
      assertSizeAgrees(
        Ops.AnalysisOps(singleObjectEnsemble()).sf2(args, giantThreshold = 0)
          .select("lc_id", "band", "dt", "sf2"),
        SF2Relational.SF2RelationalOps(singleObjectEnsemble())
          .sf2Relational(args), m)
    }
  }

  test("size binning: many objects, default args, relational == batch") {
    def ens() = {
      val e = SparkEntry.eventsEnsemble(spark, sf0001)
      e.query("user_id < 10")
      e
    }
    val args = sf.SFArgs(binCountTarget = 50) // binMethod defaults to size
    assertSizeAgrees(
      Ops.AnalysisOps(ens()).sf2(args, giantThreshold = 0)
        .select("lc_id", "band", "dt", "sf2"),
      SF2Relational.SF2RelationalOps(ens()).sf2Relational(args), "multi")
  }

  test("size binning: tied cadence → duplicate quantile edges → NaN bins match batch") {
    // 90 observations on a 30-step integer grid: only 29 distinct Δt but
    // ~3900 pairs, so nbins ≫ m and the quantile edges repeat — the batch
    // path leaves those interior bins empty (NaN rows); the relational
    // plan must reproduce them exactly. Non-literal keys so Catalyst
    // can't constant-fold the window partition spec away.
    def src() = spark.range(90).select(
      (pmod(col("id"), lit(1)) + 7L).as("user_id"),
      (col("id") % 30).cast("double").as("ts_days"),
      (sin(col("id") / 5.0) * 10 + pmod(col("id"), lit(13))).as("value"),
      lit(0.1).as("err"),
      when(col("id") >= 0, "g").otherwise("x").as("event_type"),
      col("id").as("event_id"))
    def ens() = graft.sources.EnsembleIO.fromDataFrame(spark, src(),
      graft.core.ColumnMap.events)
    val args = sf.SFArgs(binMethod = "size", binCountTarget = 50)
    // window guard on the barrier-free lineage (the production plan puts
    // the rank window behind an eager localCheckpoint, which severs the
    // logical plan this assertion walks; graft.sf2.barriers=false builds
    // the identical plan without the materialization boundaries)
    spark.conf.set("graft.sf2.barriers", "false")
    try assertWindowsPartitioned(
      SF2Relational.SF2RelationalOps(ens()).sf2Relational(args))
    finally spark.conf.unset("graft.sf2.barriers")
    val rel = SF2Relational.SF2RelationalOps(ens()).sf2Relational(args)
    val (relNan, _) = toNanSplit(rel)
    assert(relNan > 0, "fixture must actually produce empty bins")
    assertSizeAgrees(
      Ops.AnalysisOps(ens()).sf2(args, giantThreshold = 0)
        .select("lc_id", "band", "dt", "sf2"),
      rel, "tied")
  }

  test("combine mode: size binning pools per band and matches batch combine") {
    def ens() = {
      val e = SparkEntry.eventsEnsemble(spark, sf0001)
      e.query("user_id < 4")
      e
    }
    val args = sf.SFArgs(binMethod = "size", combine = true,
      binCountTarget = 40)
    assertSizeAgrees(
      Ops.AnalysisOps(ens()).sf2(args, giantThreshold = 0)
        .select("lc_id", "band", "dt", "sf2"),
      SF2Relational.SF2RelationalOps(ens()).sf2Relational(args), "combine")
  }

  test("sf2 auto-routes giants under REFERENCE DEFAULT args (size binning)") {
    // the round-3 gap: default binMethod=size used to force the batch
    // path; a giant must now route relationally under default args
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val routed = Ops.AnalysisOps(ens).sf2(sf.SFArgs(), giantThreshold = 10)
    val plan = routed.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"default-args giant must route:\n$plan")
  }

  test("giant + estimateErr is refused up front unless explicitly allowed") {
    // the batch path holds O(n²)·reps pair triples in ONE task for a
    // giant band — the guard must surface that as an error naming the
    // scale path, not as a bare executor OOM downstream
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val err = intercept[IllegalArgumentException] {
      Ops.AnalysisOps(ens).sf2(
        sf.SFArgs(estimateErr = true, calculationRepetitions = 2),
        giantThreshold = 10)
    }
    assert(err.getMessage.contains("sf2Relational"),
      s"guard must point at the distributed bootstrap: ${err.getMessage}")
    // combine mode pools everything into one group — same guard applies
    val errC = intercept[IllegalArgumentException] {
      Ops.AnalysisOps(SparkEntry.eventsEnsemble(spark, sf0001)).sf2(
        sf.SFArgs(estimateErr = true, combine = true,
          calculationRepetitions = 2),
        giantThreshold = 10)
    }
    assert(errC.getMessage.contains("allowGiantBootstrap"))
    // no giant (threshold higher than any band) → no guard, no opt-in
    val small = Ops.AnalysisOps(SparkEntry.eventsEnsemble(spark, sf0001))
      .sf2(sf.SFArgs(estimateErr = true, calculationRepetitions = 2),
        giantThreshold = 1000000L)
    assert(small.columns.contains("sf2"))
  }

  test("bootstrap auto-route stays on batch numerics; relational Poisson form is explicit") {
    // a silent reroute would change results under a fixed seed (numpy RNG
    // stream vs Poisson draws), so estimateErr must NOT auto-route...
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val res = Ops.AnalysisOps(ens).sf2(
      sf.SFArgs(estimateErr = true, calculationRepetitions = 2),
      giantThreshold = 10, allowGiantBootstrap = true)
    val plan = res.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("mapgroups"),
      s"bootstrap must stay on the batch apply:\n$plan")
    // ...while the explicit relational call now accepts it (Poisson form)
    val rel = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(sf.SFArgs(binMethod = "length", estimateErr = true,
        calculationRepetitions = 3))
    assert(rel.columns.toSeq ===
      Seq("lc_id", "band", "dt", "sf2", "1_sigma"))
    val rows = rel.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(4) >= 0.0 || r.getDouble(4).isNaN))
  }

  /** In-memory replay of the Poisson-bootstrap contract: same md5-derived
    * uniforms (independently re-derived from MessageDigest here), same
    * inverse-CDF chain, same weighted estimator, same across-rep
    * median/quantile formula — 1e-9 agreement pins the distributed plan
    * to the documented math, the same way the DuckDB q_sf2_bootstrap
    * oracle does externally. */
  test("relational Poisson bootstrap replays exactly (weights, estimator, quantiles)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = for {
      lc <- Seq(1L, 2L); i <- 0 until (if (lc == 1) 25 else 40)
    } yield (lc, "g", i * 1.5 + rnd.nextDouble() * 0.3,
      50.0 + rnd.nextDouble() * 10, 0.5 + rnd.nextDouble() * 0.1)
    val df = rows.toDF("user_id", "event_type", "ts_days", "value", "err")
    val ens = graft.sources.EnsembleIO.fromDataFrame(spark, df,
      graft.core.ColumnMap.events)
    val R = 4; val seed = 7L
    val args = sf.SFArgs(sfMethod = "basic", binMethod = "length",
      binCountTarget = 20, estimateErr = true, calculationRepetitions = R,
      randomSeed = Some(seed), equallyWeightLightcurves = true)
    val got = SF2Relational.SF2RelationalOps(ens).sf2Relational(args)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) ->
        (r.getDouble(3), r.getDouble(4))).toMap

    // ---- independent in-memory computation ----
    def md5u(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val h = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      (h >>> 11).toDouble / 9007199254740992.0
    }
    def pois(u: Double, lam: Double): Int = {
      var term = math.exp(-lam); var cum = term; var k = 0
      while (u >= cum && k < 17) { k += 1; term = term * lam / k; cum += term }
      k
    }
    val byLc = rows.groupBy(_._1)
    val pairsByLc = byLc.map { case (lc, obs) =>
      val sorted = obs.sortBy(o => (o._3, o._4, o._5)).zipWithIndex
      lc -> (for {
        (a, ia) <- sorted; (b, ib) <- sorted if a._3 < b._3
      } yield (ia, ib, b._3 - a._3, b._4 - a._4, a._5 * a._5 + b._5 * b._5))
    }
    val m = pairsByLc.values.map(_.size).min
    def q(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted; val pos = (s.length - 1) * p
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 >= s.length) s(lo) else s(lo) + frac * (s(lo + 1) - s(lo))
    }
    pairsByLc.foreach { case (lc, ps) =>
      val lam = m.toDouble / ps.size.toDouble
      val dts = ps.map(_._3)
      val lo = dts.min; val hi = dts.max
      val nbins = math.max(math.ceil(ps.size / 20.0).toLong, 1L)
      def bin(dt: Double): Long =
        if (hi == lo) 0L
        else math.min(math.max(
          math.floor((dt - lo) / ((hi - lo) / nbins)).toLong, 0L), nbins - 1)
      val perRep = for (rep <- 0 until R) yield {
        val weighted = ps.map { case (ia, ib, dt, df, sse) =>
          val u = md5u(s"$lc|g|$ia|$ib|$rep|$seed")
          (bin(dt), pois(u, lam), dt, df * df - sse)
        }.filter(_._2 > 0)
        weighted.groupBy(_._1).map { case (b, ws) =>
          val sw = ws.map(_._2.toDouble).sum
          (b, ws.map(w => w._2 * w._3).sum / sw,
            ws.map(w => w._2 * w._4).sum / sw)
        }
      }
      val bins = perRep.flatten.map(_._1).distinct
      bins.foreach { b =>
        val reps = perRep.flatMap(_.find(_._1 == b))
        val dtMed = q(reps.map(_._2), 0.5)
        val sfMed = q(reps.map(_._3), 0.5)
        val sigma = (q(reps.map(_._3), 0.84) - q(reps.map(_._3), 0.16)) / 2
        val key = (lc.toString, "g", dtMed)
        // dt is the map key — locate by closest dt instead of exact float
        val hit = got.keys.find(k => k._1 == lc.toString &&
          math.abs(k._3 - dtMed) <= 1e-9 * (1 + math.abs(dtMed)))
        assert(hit.isDefined, s"missing bin $key")
        val (gotSf, gotSig) = got(hit.get)
        assert(math.abs(gotSf - sfMed) <= 1e-9 * (1 + math.abs(sfMed)),
          s"sf2 lc=$lc bin=$b: $gotSf vs $sfMed")
        assert(math.abs(gotSig - sigma) <= 1e-9 * (1 + math.abs(sigma)),
          s"sigma lc=$lc bin=$b: $gotSig vs $sigma")
      }
      assert(got.keys.count(_._1 == lc.toString) === bins.size, s"bin count lc=$lc")
    }
  }

  test("bootstrap guardrails: determinism, R=1 sigma=0, sample-count validation") {
    val args0 = sf.SFArgs(binMethod = "length", estimateErr = true,
      calculationRepetitions = 3, randomSeed = Some(11))
    val a = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(args0).collect().sortBy(_.getDouble(2))
    val b = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(args0).collect().sortBy(_.getDouble(2))
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq,
      "same seed must reproduce the identical frame")

    val one = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(sf.SFArgs(binMethod = "length", estimateErr = true,
        calculationRepetitions = 1)).collect()
    assert(one.nonEmpty)
    assert(one.forall(_.getDouble(4) === 0.0),
      "reps<=1 reports 1_sigma = 0.0 like the reference")

    val e = intercept[IllegalArgumentException] {
      SF2Relational.SF2RelationalOps(singleObjectEnsemble())
        .sf2Relational(sf.SFArgs(binMethod = "length", estimateErr = true,
          numberLightcurveSamples = Some(Int.MaxValue)))
    }
    assert(e.getMessage.contains("samples"))
  }

  test("bootstrap under size binning keeps the NaN empty-bin grid") {
    val plain = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(sf.SFArgs(binCountTarget = 25))
    val boot = SF2Relational.SF2RelationalOps(singleObjectEnsemble())
      .sf2Relational(sf.SFArgs(binCountTarget = 25, estimateErr = true,
        calculationRepetitions = 3))
    // same (keys, bin) lattice: bootstrap only changes the statistics
    assert(boot.count() === plain.count())
    assert(boot.columns.contains("1_sigma"))
  }

  test("giant lightcurve: 5k-obs object (12.5M pairs) completes distributed") {
    // the scale scenario the batch path can't shoulder indefinitely: one
    // object whose pair expansion would be a single 12.5M-triple task
    // in-group, but streams through the distributed self-join here
    import spark.implicits._
    val n = 5000
    // non-literal keys: a lit() id/band constant-folds the window
    // partition spec away, turning every per-lightcurve window into a
    // single-partition one IN THE TEST PLAN ONLY — which both degrades
    // the fixture and prints the exact WARN a real regression would
    val src = spark.range(n).select(
      (pmod(col("id"), lit(1)) + 1L).as("user_id"),
      (col("id") * 0.37 + pmod(col("id") * 7919, lit(97)) / 100.0).as("ts_days"),
      (sin(col("id") / 50.0) * 10 + pmod(col("id"), lit(13))).as("value"),
      lit(0.1).as("err"),
      when(col("id") >= 0, "g").otherwise("x").as("event_type"),
      col("id").as("event_id"))
    val ens = graft.sources.EnsembleIO.fromDataFrame(spark, src,
      graft.core.ColumnMap.events)
    val t0 = System.nanoTime()
    val res = SF2Relational.SF2RelationalOps(ens).sf2Relational(
      sf.SFArgs(binMethod = "length", binCountTarget = 100000))
    assertWindowsPartitioned(res)
    val rows = res.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"5k-obs relational SF2: ${rows.length} bins in $secs%.1f s")
    assert(rows.length === math.ceil(n.toLong * (n - 1) / 2.0 / 100000).toInt)
    assert(rows.forall(r => !r.getDouble(3).isNaN))
    assert(secs < 120.0)
  }

  test("sf2 auto-routes giant bands to the relational plan, small to batch") {
    // mixed ensemble: ordinary objects plus one 3000-obs band (threshold
    // lowered so the spec stays fast; the default is 10⁴)
    val giant = spark.range(3000).select(
      (pmod(col("id"), lit(1)) + 999000L).as("user_id"),
      (col("id") * 0.37 + pmod(col("id") * 7919, lit(97)) / 100.0).as("ts_days"),
      (sin(col("id") / 50.0) * 10 + pmod(col("id"), lit(13))).as("value"),
      lit(0.1).as("err"),
      when(col("id") >= 0, "g").otherwise("x").as("event_type"),
      col("id").as("event_id"))
    def smallSrc() = SparkEntry.eventsSource(spark, sf0001)
      .filter(col("user_id") < 3)
      .select("user_id", "ts_days", "value", "err", "event_type", "event_id")
    val args = sf.SFArgs(binMethod = "length", binCountTarget = 50)
    val ens = graft.sources.EnsembleIO.fromDataFrame(spark,
      smallSrc().unionByName(giant), graft.core.ColumnMap.events)
    val routed = Ops.AnalysisOps(ens).sf2(args, giantThreshold = 1000)

    // both physical paths must appear in ONE plan: the batch engine's
    // per-group apply for small objects, a join for the giant band
    val plan = routed.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"no join path in plan:\n$plan")
    assert(plan.toLowerCase.contains("mapgroups"), "no batch path in plan")

    val out = toMap(routed.select("lc_id", "band", "dt", "sf2"))

    // giant rows == direct relational on the giant alone
    val gEns = graft.sources.EnsembleIO.fromDataFrame(spark, giant,
      graft.core.ColumnMap.events)
    val gExp = toMap(SF2Relational.SF2RelationalOps(gEns).sf2Relational(args))
    // small rows == pure batch (routing disabled)
    val sEns = graft.sources.EnsembleIO.fromDataFrame(spark, smallSrc(),
      graft.core.ColumnMap.events)
    val sExp = toMap(Ops.AnalysisOps(sEns).sf2(args, giantThreshold = 0)
      .select("lc_id", "band", "dt", "sf2"))

    assert(out.keySet === (gExp.keySet ++ sExp.keySet),
      s"missing=${(gExp.keySet ++ sExp.keySet) -- out.keySet} " +
        s"extra=${out.keySet -- gExp.keySet -- sExp.keySet}")
    (gExp ++ sExp).foreach { case (k, (dt, s)) =>
      val (odt, os) = out(k)
      assert(math.abs(odt - dt) <= 1e-9 * (1 + math.abs(dt)), s"dt at $k")
      assert(math.abs(os - s) <= 1e-9 * (1 + math.abs(s)), s"sf2 at $k")
    }
  }

  test("null flux rows are dropped identically by both SF2 paths") {
    // a null-value observation must not change pair counts or bin edges
    // (isnan(null) is false in Spark — regression pin for the explicit
    // null guard in SF2Relational's source filter)
    def ensWithNull() = {
      val ens = singleObjectEnsemble()
      ens.assign("value" ->
        when(col("event_id") === ens.source.select("event_id").limit(1)
          .collect()(0).getLong(0), lit(null)).otherwise(col("value")))
      ens
    }
    val args = sf.SFArgs(binMethod = "length", binCountTarget = 30)
    val batch = toMap(Ops.AnalysisOps(ensWithNull()).sf2(args,
      giantThreshold = 0).select("lc_id", "band", "dt", "sf2"))
    val rel = toMap(SF2Relational.SF2RelationalOps(ensWithNull())
      .sf2Relational(args))
    assert(rel.keySet === batch.keySet,
      s"rel-only=${rel.keySet -- batch.keySet} batch-only=${batch.keySet -- rel.keySet}")
    rel.foreach { case (k, (dt, s)) =>
      val (bdt, bs) = batch(k)
      assert(math.abs(dt - bdt) <= 1e-9 * (1 + math.abs(bdt)), s"dt at $k")
      assert(math.abs(s - bs) <= 1e-9 * (1 + math.abs(bs)), s"sf2 at $k")
    }
  }

  test("combine mode auto-routes to the distributed plan past the threshold") {
    val args = sf.SFArgs(binMethod = "length", combine = true,
      binCountTarget = 40)
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.query("user_id < 4")
    // force routing with a tiny threshold: the one-group batch apply must
    // be gone, replaced by the self-join plan
    val routed = Ops.AnalysisOps(ens).sf2(args, giantThreshold = 10)
    val plan = routed.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected join plan:\n$plan")
    assert(!plan.toLowerCase.contains("mapgroups"),
      "combine routing must not go through the single-group batch apply")
    assert(routed.columns.toSeq ===
      Seq("lc_id", "band", "dt", "sf2", "1_sigma"))

    // values equal the un-routed batch combine (threshold disabled)
    val ens2 = SparkEntry.eventsEnsemble(spark, sf0001)
    ens2.query("user_id < 4")
    val batch = toMap(Ops.AnalysisOps(ens2).sf2(args, giantThreshold = 0)
      .select("lc_id", "band", "dt", "sf2"))
    val rel = toMap(routed.select("lc_id", "band", "dt", "sf2"))
    assert(rel.keySet === batch.keySet)
    rel.foreach { case (k, (dt, s)) =>
      val (bdt, bs) = batch(k)
      assert(math.abs(dt - bdt) <= 1e-9 * (1 + math.abs(bdt)), s"dt at $k")
      assert(math.abs(s - bs) <= 1e-9 * (1 + math.abs(bs)), s"sf2 at $k")
    }
  }

  test("pair counts match n*(n-1)/2 per (id, band)") {
    val ens = singleObjectEnsemble()
    val perBand = ens.source.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cm = ens.colMap
    val src = ens.source.select(col(cm.id).as("id"),
      col(cm.band).as("band"), col(cm.time).as("t"))
    val pairCounts = src.as("a").join(src.as("b"),
        col("a.id") === col("b.id") && col("a.band") === col("b.band") &&
          col("a.t") < col("b.t"))
      .groupBy(col("a.band")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perBand.foreach { case (band, n) =>
      // ties in t reduce the strict < count; events ts are distinct
      assert(pairCounts.getOrElse(band, 0L) === n * (n - 1) / 2, band)
    }
  }
}
