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
  * all three binning schemes — `length` / `loglength` (closed-form
  * per-group edges from min/max/count — 2 aggregation passes, no
  * per-group quantile state) and `size` (the reference DEFAULT: exact
  * equal-count quantile edges over distinct Δt; see [[sizeBinned]]);
  * combine mode (keys drop the id); and bootstrap error estimation
  * (`estimateErr`) via a POISSON bootstrap (see [[bootstrapped]]) —
  * a distributed-valid approximation of the reference's exact
  * with-replacement resampling, with its own DuckDB-oracle pin
  * (q_sf2_bootstrap). Explicit `bins` arrays and `ignoreTimestamps`
  * remain batch-path-only args.
  *
  * Output-shape notes (both pinned by SF2RelationalSpec):
  *   - `size` reproduces the batch path bit-for-bit where the float
  *     boundary allows, including NaN rows for empty bins (duplicate
  *     quantile edges over few distinct Δt leave interior bins empty).
  *   - `length`/`loglength` omit empty bins (a group-by has no row to
  *     emit) — the one documented difference from the batch twin.
  *   - groups with exactly one pair are dropped (reference
  *     base_calculator.py:311 emits empty arrays for them), and no
  *     min-observation validation is applied (the batch path's
  *     SFLightCurve constructor rejects <3 points; routed giants are
  *     ≫3 points by definition, so the difference never reaches users
  *     of the auto-route — pre-filter explicitly if calling this
  *     directly on unvalidated data).
  */
object SF2Relational {

  def sf2Relational(
      ens: Ensemble,
      args: sf.SFArgs = sf.SFArgs()
  ): DataFrame = {
    require(Seq("size", "length", "loglength").contains(args.binMethod),
      s"Unknown binning method: '${args.binMethod}'")
    require(args.bins.isEmpty && !args.ignoreTimestamps,
      "explicit bin edges / ignoreTimestamps are batch-path args " +
        "(Ops.sf2) — the relational plan derives edges per group")
    val bootstrap = args.estimateErr
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
    val bandFiltered0 = args.bandToCalc match {
      case Some(bs) => src.filter(col("band").isin(bs: _*))
      case None     => src
    }
    // Bootstrap draws need a stable per-observation index so a pair's
    // resampling weight is a pure function of (lc, band, i, j, rep, seed).
    // The order (t, f, e) is a deterministic total order up to fully
    // identical rows, and swapping identical rows permutes indices between
    // identical pair triples — the result is invariant.
    // Multi-consumer barrier for the BOOTSTRAP path only (guide
    // §1.2/§5): with `estimateErr` the windowed frame feeds BOTH sides
    // of the pair self-join, the binning aggregates AND pairCounts —
    // without a barrier the r13 physical plan re-scanned the source
    // parquet SIX times for q_sf2_bootstrap, re-paying the row_number
    // window on every branch (measured 4.8 → 2.3 s suite with the
    // barrier). The plain paths deliberately stay UNbarriered: a
    // localCheckpoint's LogicalRDD loses the scan's size statistics,
    // which flipped the pair self-join's small-side planning from
    // broadcast to sort-merge and REGRESSED q_sf2_size_relational
    // 4.0 → 7-10 s (measured r14, reverted) — their redundant branches
    // are cheap scans deduplicated by exchange reuse, not a window.
    // Same `graft.sf2.barriers` escape hatch as sizeBinned's barriers.
    val bandFiltered =
      if (!bootstrap) bandFiltered0
      else barrier {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lc_id"), col("band"))
          .orderBy(col("t"), col("f"), col("e"))
        bandFiltered0.withColumn("__i", row_number().over(w) - 1)
      }

    val a = bandFiltered.as("a"); val b = bandFiltered.as("b")
    val pairCols = Seq(col("a.lc_id").as("lc_id"), col("a.band").as("band"),
      (col("b.t") - col("a.t")).as("dt"),
      (col("b.f") - col("a.f")).as("df"),
      (col("a.e") * col("a.e") + col("b.e") * col("b.e")).as("sse")) ++
      (if (bootstrap) Seq(col("a.__i").as("__ia"), col("b.__i").as("__ib"))
       else Seq.empty)
    val pairs = a.join(b,
        col("a.lc_id") === col("b.lc_id") &&
          col("a.band") === col("b.band") && col("a.t") < col("b.t"))
      .select(pairCols: _*)

    val keys: Seq[String] =
      if (args.combine) Seq("band") else Seq("lc_id", "band")
    val keyCols = keys.map(col)

    // size scheme: (distinct-Δt frame with estimator partial sums,
    // dt→bin map, full (keys, bin) lattice — batch emits NaN rows for
    // empty bins). Pair rows re-expand ONLY where per-pair values are
    // irreducibly needed: the Poisson bootstrap (weights keyed by
    // observation index) and macleod's percentile (a raw-df multiset
    // statistic). Every avg-shaped estimator reads the dt-granular
    // sums instead, so the DEFAULT SF² configuration expands the pair
    // stream exactly once.
    val sizeParts: Option[(DataFrame, DataFrame, DataFrame)] =
      if (args.binMethod == "size")
        Some(sizeBinned(pairs, bandFiltered, keys, args.binCountTarget,
          args.combine,
          dtSums(if (bootstrap) "" else args.sfMethod)))
      else None
    val grid: Option[DataFrame] = sizeParts.map(_._3)
    def pairWithBins: DataFrame = sizeParts match {
      case Some((_, binMap, _)) => pairs.join(binMap, keys :+ "dt")
      case None => lengthBinned(pairs, bandFiltered, keys, args)
    }

    if (bootstrap) {
      val res0 = bootstrapped(pairWithBins, grid, bandFiltered, keys, args)
      val res =
        if (args.combine) res0.withColumn("lc_id", lit("combined"))
          .select((col("lc_id") +: res0.columns.filter(_ != "lc_id")
            .map(col).toSeq): _*)
        else res0
      ens.addFrame(res, None)
      return res
    }

    val grouped = sizeParts match {
      case Some((dtc, binMap, _)) if args.sfMethod != "macleod_2012" =>
        // dt-granular estimator aggregate over the partial sums carried
        // by the dtc barrier (Σ per dt, then Σ per bin — same values as
        // the per-pair avg up to double-summation grouping, the same
        // tolerance class as partial aggregation order)
        val w = col("__cnt").cast("double")
        def wavg(s: Column): Column = sum(s) / sum(w)
        val sf2AggDt: Column = args.sfMethod match {
          case "basic"       => wavg(col("__s_d2se"))
          case "bauer_2009a" => wavg(col("__s_d2")) - wavg(col("__s_sse"))
          case "bauer_2009b" =>
            lit(math.Pi / 2.0) * pow(wavg(col("__s_absdf")), 2) -
              wavg(col("__s_sse"))
          case "schmidt_2010" => pow(wavg(col("__s_schmidt")), 2)
          case other => throw new IllegalArgumentException(
            s"Unknown structure function calculator method: $other")
        }
        dtc.join(binMap, keys :+ "dt")
          .groupBy((keyCols :+ col("bin")): _*)
          .agg(wavg(col("dt") * w).as("dt"), sf2AggDt.as("sf2"))
      case _ =>
        // per-(group, bin) estimator aggregate over pair rows
        val sf2Agg: Column = args.sfMethod match {
          case "basic"       => avg(col("df") * col("df") - col("sse"))
          case "bauer_2009a" => avg(col("df") * col("df")) - avg(col("sse"))
          case "bauer_2009b" =>
            lit(math.Pi / 2.0) * pow(avg(abs(col("df"))), 2) -
              avg(col("sse"))
          case "schmidt_2010" =>
            pow(avg(lit(math.sqrt(math.Pi / 2.0)) * abs(col("df")) -
              sqrt(col("sse"))), 2)
          case "macleod_2012" =>
            pow(lit(0.74) * (percentile(col("df"), lit(0.75)) -
              percentile(col("df"), lit(0.25))), 2)
          case other => throw new IllegalArgumentException(
            s"Unknown structure function calculator method: $other")
        }
        pairWithBins
          .groupBy((keyCols :+ col("bin")): _*)
          .agg(avg(col("dt")).as("dt"), sf2Agg.as("sf2"))
    }

    val filled = grid match {
      case Some(g) => // scipy semantics: empty bins are NaN rows
        g.join(grouped, keys :+ "bin", "left")
          .select((keyCols
            :+ coalesce(col("dt"), lit(Double.NaN)).as("dt")
            :+ coalesce(col("sf2"), lit(Double.NaN)).as("sf2")): _*)
      case None => grouped.drop("bin")
    }

    val out =
      if (args.combine) filled.withColumn("lc_id", lit("combined"))
      else filled
    val res = out.select(col("lc_id"), col("band"), col("dt"), col("sf2"))
    ens.addFrame(res, None)
    res
  }

  /** Eager materialization barrier for multi-branch intermediates (see
    * [[sizeBinned]]). Tests set the session conf
    * `graft.sf2.barriers=false` to keep the full lineage inspectable —
    * the window-partition-spec scale guard asserts on logical plans,
    * which a checkpoint would sever. Results are identical either way;
    * only materialization differs. */
  private def barrier(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("graft.sf2.barriers", "true") == "false") df
    else df.localCheckpoint(true)

  /** 'length'/'loglength' binning: closed-form per-group edges, so the
    * expensive self-join runs exactly once — ranges derive from SOURCE
    * rows (n per group) rather than a second pair expansion:
    *   max Δt  = max(t) − min(t)
    *   min Δt  = the smallest positive gap between time-sorted
    *             observations (the global minimum pair difference is
    *             always attained by an adjacent pair)
    *   npairs  = n·(n−1)/2 − Σ_t c_t·(c_t−1)/2  (strict <, ties excluded)
    * These are ALWAYS computed per (lc_id, band) — pairs never span
    * lightcurves — and in combine mode the per-band pooled range is then
    * the min/max/sum of the per-lightcurve stats (pooled pair dts = union
    * of per-LC pair dts). The window also stays partitioned per
    * lightcurve, so no single task sees a whole band. */
  private def lengthBinned(pairs: DataFrame, bandFiltered: DataFrame,
      keys: Seq[String], args: sf.SFArgs): DataFrame = {
    val keyCols = keys.map(col)
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
    pairs.join(ranges, keys)
      .withColumn("__x",
        if (args.binMethod == "loglength") log(col("dt")) else col("dt"))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L)) // degenerate single-Δt group
          .otherwise(least(greatest(
            floor((col("__x") - col("lo")) / ((col("hi") - col("lo")) /
              col("nbins"))).cast("long"), lit(0L)),
            col("nbins") - 1)))
  }

  /** 'size' binning — the reference DEFAULT (base_calculator.py:76-78):
    * per-group equal-count quantile edges over the DISTINCT pair Δt, with
    * numpy's linear-interpolation quantile (quantileSorted) reproduced
    * float-for-float, then scipy binned_statistic assignment (upper-bound
    * edge search, last bin closed right, empty bins = NaN rows).
    *
    * Distributed shape (the reason this exists — the batch path holds the
    * whole group in one task):
    *   1. pairs → groupBy (keys, dt): per-distinct-Δt multiplicities
    *      (everything after this runs on DISTINCT Δt — ties collapse).
    *   2. per-group m (distinct count), np (= reference len(dts)),
    *      nbins = ceil(np / binCountTarget).
    *   3. rank rn of each distinct Δt (row_number per group — the one
    *      per-group-serial step, over distinct values only; a giant at
    *      fixed cadence collapses to few distinct Δt).
    *   4. edge grid k = 0..nbins via two-level explode (no group ever
    *      materializes its range as one array), each edge evaluated by
    *      TWO equi-joins to the ranked frame at floor(pos) / floor(pos)+1
    *      — exactly quantileSorted's formula, exactly the DuckDB oracle's.
    *   5. bin of a distinct Δt with rank rn: in exact arithmetic the
    *      upper-bound edge search gives floor(rn·nbins/(m−1)) — computed
    *      with exact integer `div`, no per-group edge ARRAY — then
    *      corrected ±1 against the two float edges at that index, because
    *      the float pos=(k/nbins)·(m−1) can land on either side of integer
    *      rn when they are mathematically equal (assumes adjacent pos
    *      values are not BOTH within one ulp of rn, i.e. per-group
    *      m·nbins ≲ 2⁶³ and (m−1)/nbins ≫ ulp — holds to ~10⁷-observation
    *      lightcurves at the default target).
    *   6. consumers join the distinct-Δt→bin map on (keys, dt): the
    *      avg-shaped estimators at DT granularity (the partial sums ride
    *      the dtc barrier — no pair rows at all), macleod/bootstrap at
    *      pair granularity (raw-df percentile / per-observation weights
    *      are irreducibly pair-level).
    * The pair self-join therefore executes exactly ONCE for the default
    * configuration (collapsed immediately by this groupBy), and twice
    * only for macleod/bootstrap.
    *
    * Returns (distinct-Δt frame with partial sums, (keys, dt, bin) map,
    * full (keys, bin) grid). */
  /** The per-dt estimator partial sums a given sfMethod actually reads
    * from the dtc barrier — r13: the old unconditional five-sum set paid
    * a sqrt + four extra double sums PER PAIR ROW for estimators that
    * never read them (macleod and the bootstrap read pair rows, not dtc
    * sums, so they carry none: pass method = ""). Trimming is
    * output-invariant — the dropped columns were internal to the
    * barrier. */
  private def dtSums(method: String): Seq[org.apache.spark.sql.Column] =
    method match {
      case "basic" =>
        Seq(sum(col("df") * col("df") - col("sse")).as("__s_d2se"))
      case "bauer_2009a" =>
        Seq(sum(col("df") * col("df")).as("__s_d2"),
          sum(col("sse")).as("__s_sse"))
      case "bauer_2009b" =>
        Seq(sum(abs(col("df"))).as("__s_absdf"),
          sum(col("sse")).as("__s_sse"))
      case "schmidt_2010" =>
        Seq(sum(lit(math.sqrt(math.Pi / 2.0)) * abs(col("df")) -
          sqrt(col("sse"))).as("__s_schmidt"))
      case _ => Seq.empty // macleod_2012 / bootstrap: pair-granular paths
    }

  private def sizeBinned(pairs: DataFrame, bandFiltered: DataFrame,
      keys: Seq[String], binCountTarget: Int,
      combine: Boolean,
      estSums: Seq[org.apache.spark.sql.Column]): (DataFrame, DataFrame, DataFrame) = {
    val keyCols = keys.map(col)
    // barrier: dtc is read by grp0, the rank window AND (transitively,
    // via grp) the edge grid — without materialization every one of those
    // branches replays the pair-expansion self-join, and the static plan
    // grows 5+ SortMergeJoin copies of it (measured: 84 parquet scans in
    // one q_sf2_size_relational plan). One eager localCheckpoint keeps
    // the expansion at the documented TWO executions (this one + the
    // final binnedPairs join) and shrinks the plan to the distinct-Δt
    // frame. Block storage is MEMORY_AND_DISK: at 100 TB the distinct-Δt
    // frame spills rather than OOMs, and it is never larger than what
    // the rank window must sort anyway.
    // the distinct-Δt frame carries the per-dt estimator PARTIAL SUMS
    // the CONFIGURED estimator reads (dtSums — r13 trims the formerly
    // unconditional five-sum set), so the non-macleod, non-bootstrap
    // paths never touch pair rows again after this aggregate
    val dtc = barrier(pairs.groupBy((keyCols :+ col("dt")): _*)
      .agg(count(lit(1)).as("__cnt"), estSums: _*))
    val grp0 = dtc.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__m"), sum(col("__cnt")).as("__np"))
      .withColumn("__nbins",
        ceil(col("__np").cast("double") / binCountTarget).cast("long"))
    // single-pair groups emit nothing (base_calculator.py:311 — only via
    // the per-lightcurve branch, so combine mode keeps a pooled band alive
    // when it has >1 lightcurve even at np == 1). The lightcurve count
    // comes from the SOURCE rows (cheap aggregate), not a third pair
    // expansion.
    val grp = barrier(
      if (!combine) grp0.filter(col("__np") > 1)
      else {
        val nlc = bandFiltered.groupBy(col("band"))
          .agg(countDistinct(col("lc_id")).as("__nlc"))
        grp0.join(nlc, keys)
          .filter(col("__np") > 1 || col("__nlc") > 1).drop("__nlc")
      }) // one row per group; read by uq, ks, grid

    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(keyCols: _*).orderBy(col("dt"))
    // barrier again: the ranked frame feeds uqLo, uqHi AND binMap — the
    // rank window (the per-group-serial step) executes once, not three
    // times
    val uq = barrier(dtc.join(grp, keys)
      .withColumn("__rn", row_number().over(wRank).cast("long") - 1))

    // edge grid: quantileSorted(unique, k/nbins) for k = 0..nbins, with
    // the same two-step float rounding (q first, then q·(m−1))
    val ks = explodedRange(grp.withColumn("__n", col("__nbins") + 1), "__k")
      .withColumn("__pos",
        (col("__k").cast("double") / col("__nbins")) *
          (col("__m") - 1).cast("double"))
      .withColumn("__lorn", floor(col("__pos")))
      .withColumn("__hirn", least(col("__lorn") + 1, col("__m") - 1))
      .withColumn("__frac", col("__pos") - floor(col("__pos")))
    val uqLo = uq.select((keyCols :+ col("__rn").as("__lorn")
      :+ col("dt").as("__lodt")): _*)
    val uqHi = uq.select((keyCols :+ col("__rn").as("__hirn")
      :+ col("dt").as("__hidt")): _*)
    val edges = ks.join(uqLo, keys :+ "__lorn").join(uqHi, keys :+ "__hirn")
      .select((keyCols :+ col("__k") :+
        (col("__lodt") + col("__frac") * (col("__hidt") - col("__lodt")))
          .as("__edge")): _*)
    // next edge via a k−1 self-equi-join (not lead(): a window would pull
    // a giant group's whole edge set through one task)
    val edgesNext = edges.select((keyCols :+ (col("__k") - 1).as("__k")
      :+ col("__edge").as("__nextEdge")): _*)

    val binMap = uq
      .withColumn("__bc",
        when(col("__m") === 1, col("__nbins")) // all edges equal dt[0]
          .otherwise(expr("(__rn * __nbins) div (__m - 1)")))
      .join(edges.withColumnRenamed("__k", "__bc")
        .withColumnRenamed("__edge", "__e0"), keys :+ "__bc")
      .join(edgesNext.withColumnRenamed("__k", "__bc"),
        keys :+ "__bc", "left")
      .withColumn("bin", least(
        when(col("__nextEdge").isNotNull && col("__nextEdge") <= col("dt"),
          col("__bc") + 1)
          .when(col("__e0") <= col("dt"), col("__bc"))
          .otherwise(col("__bc") - 1),
        col("__nbins") - 1))
      .select((keyCols :+ col("dt") :+ col("bin")): _*)

    val grid = explodedRange(
      grp.select((keyCols :+ col("__nbins").as("__n")): _*), "bin")
      .select((keyCols :+ col("bin")): _*)
    (dtc, binMap.select((keyCols :+ col("dt") :+ col("bin")): _*), grid)
  }

  /** POISSON-BOOTSTRAP error estimation — the distributed form of the
    * reference's `estimate_err` (structurefunction2.py:131-166 +
    * base_calculator.py:40-52 + sf_light_curve.py:51-102).
    *
    * The reference resamples each lightcurve's pair-difference triples
    * WITH replacement down to m samples (m = min pair count across the
    * band's curves under `equallyWeightLightcurves`, else
    * `numberLightcurveSamples`, else all n of them), recomputes the
    * binned estimator `calculationRepetitions` times, and reports the
    * per-(lc, bin) median with (q84 − q16)/2 as `1_sigma`. Crucially the
    * BIN EDGES come from the FULL pair set (`_bin_dts(lc._all_d_times)`,
    * base_calculator.py:150-190) and are fixed across repetitions — only
    * the sampled statistics vary — so this path reuses [[lengthBinned]] /
    * [[sizeBinned]] unchanged and resamples with per-pair weights.
    *
    * Exact multinomial resampling (exactly m draws per curve) is
    * per-group sequential state; the standard distributed equivalent is
    * the Poisson bootstrap: each pair independently receives a
    * Poisson(λ = m/n) multiplicity per repetition, so the draw count is
    * m in expectation and every weight is a pure function of
    * (lc, band, i, j, rep, seed) — deterministic, shuffle-free, and
    * reproducible in SQL (the q_sf2_bootstrap DuckDB oracle replays the
    * identical md5-derived uniforms and inverse-CDF chain). λ ≤ 1 always
    * (m ≤ n is validated like the reference's ValueError), so the
    * inverse CDF truncated at k = 17 loses < 1e-14 of mass. The
    * estimator then becomes a weighted aggregate: Σw·x / Σw per
    * (group, bin, repetition) — map-side partials, no new shuffle family;
    * macleod_2012's IQR uses `percentile`'s frequency argument.
    *
    * This is a *statistically equivalent* bootstrap, not a bit-for-bit
    * replay of the reference's numpy RNG stream (impossible to
    * distribute); [[Ops.sf2]]'s auto-route therefore keeps bootstrap
    * requests on the reference-numerics batch path and this form is
    * opted into by calling sf2Relational directly. */
  private def bootstrapped(withBins: DataFrame, grid: Option[DataFrame],
      bandFiltered: DataFrame, keys: Seq[String],
      args: sf.SFArgs): DataFrame = {
    val keyCols = keys.map(col)
    val reps = math.max(args.calculationRepetitions, 1)
    val seed = args.randomSeed.getOrElse(42L)

    val lamed: DataFrame =
      if (!args.equallyWeightLightcurves &&
          args.numberLightcurveSamples.isEmpty)
        withBins.withColumn("__lam", lit(1.0)) // plain bootstrap: m = n
      else {
        val np = pairCounts(bandFiltered)
        val withM =
          if (args.equallyWeightLightcurves)
            np.join(
              np.groupBy(col("band")).agg(min(col("__npairs")).as("__m")),
              Seq("band"))
          else {
            val s = args.numberLightcurveSamples.get
            // reference raises ValueError when a curve has fewer
            // difference values than requested (sf_light_curve.py:81-85);
            // one tiny source-derived aggregate, no pair expansion
            val minPairs = np.agg(min(col("__npairs"))).collect()
              .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getLong(0)))
            require(minPairs.forall(_ >= s),
              s"Requesting $s samples, but only ${minPairs.getOrElse(0L)} " +
                "are present in the lightcurve")
            np.withColumn("__m", lit(s.toLong))
          }
        val lam = withM.select(col("lc_id"), col("band"),
          (col("__m").cast("double") / col("__npairs").cast("double"))
            .as("__lam"))
        withBins.join(lam, Seq("lc_id", "band"))
      }

    // all rep weights of a pair in ONE native pass (md5 + shift-divide +
    // inverse-CDF chain fused; see Md5PoissonWeights for the
    // byte/float-parity contract with the oracle's per-rep replay)
    val drawn = lamed
      .withColumn("__ws", graft.functions.HashExpressions.md5PoissonWeights(
        concat_ws("|", col("lc_id"), col("band"),
          col("__ia"), col("__ib")),
        col("__lam"), reps, seed))
      .select(col("*"), posexplode(col("__ws")).as(Seq("__rep", "__w")))
      .drop("__ws")
      .filter(col("__w") > 0)

    val wd = col("__w").cast("double")
    def wavg(x: Column): Column = sum(wd * x) / sum(wd)
    val sf2Agg: Column = args.sfMethod match {
      case "basic"       => wavg(col("df") * col("df") - col("sse"))
      case "bauer_2009a" => wavg(col("df") * col("df")) - wavg(col("sse"))
      case "bauer_2009b" =>
        lit(math.Pi / 2.0) * pow(wavg(abs(col("df"))), 2) - wavg(col("sse"))
      case "schmidt_2010" =>
        pow(wavg(lit(math.sqrt(math.Pi / 2.0)) * abs(col("df")) -
          sqrt(col("sse"))), 2)
      case "macleod_2012" =>
        pow(lit(0.74) * (percentile(col("df"), lit(0.75), col("__w")) -
          percentile(col("df"), lit(0.25), col("__w"))), 2)
      case other => throw new IllegalArgumentException(
        s"Unknown structure function calculator method: $other")
    }
    val perRep = drawn
      .groupBy((keyCols :+ col("bin") :+ col("__rep")): _*)
      .agg(wavg(col("dt")).as("dt"), sf2Agg.as("sf2"))

    // across repetitions: nanmedian + quantile half-width
    // (structurefunction2.py:143-166); a bin absent from a repetition
    // contributes no row, which is exactly nanmedian's NaN-skip
    val over = perRep.groupBy((keyCols :+ col("bin")): _*)
      .agg(percentile(col("dt"), lit(0.5)).as("dt"),
        percentile(col("sf2"), lit(0.5)).as("sf2"),
        percentile(col("sf2"), lit(args.lowerErrorQuantile)).as("__loq"),
        percentile(col("sf2"), lit(args.upperErrorQuantile)).as("__hiq"))
    val sigma: Column =
      if (reps <= 1) lit(0.0)
      else (col("__hiq") - col("__loq")) / lit(2)
    val extras: Seq[Column] =
      if (!args.reportUpperLowerErrorSeparately) Seq.empty
      else if (reps <= 1) Seq(lit(0.0).as("lower_error"),
        lit(0.0).as("upper_error"))
      else Seq((col("sf2") - col("__loq")).as("lower_error"),
        (col("__hiq") - col("sf2")).as("upper_error"))
    val resolved = over.select((keyCols :+ col("bin") :+ col("dt")
      :+ col("sf2") :+ sigma.as("1_sigma")) ++ extras: _*)

    grid match {
      case Some(g) => // scipy semantics: empty bins are NaN rows
        val emptyStat = if (reps <= 1) lit(0.0) else lit(Double.NaN)
        val extraFill: Seq[Column] =
          if (!args.reportUpperLowerErrorSeparately) Seq.empty
          else Seq(coalesce(col("lower_error"), emptyStat).as("lower_error"),
            coalesce(col("upper_error"), emptyStat).as("upper_error"))
        g.join(resolved, keys :+ "bin", "left")
          .select((keyCols
            :+ coalesce(col("dt"), lit(Double.NaN)).as("dt")
            :+ coalesce(col("sf2"), lit(Double.NaN)).as("sf2")
            :+ coalesce(col("1_sigma"), emptyStat).as("1_sigma"))
            ++ extraFill: _*)
      case None => resolved.drop("bin")
    }
  }

  /** Tie-corrected pair count per (lc_id, band) from SOURCE rows —
    * n·(n−1)/2 − Σ_t c_t·(c_t−1)/2, the same formula [[lengthBinned]]
    * uses — so λ never costs a pair expansion. */
  private def pairCounts(bandFiltered: DataFrame): DataFrame = {
    val lcKeys = Seq(col("lc_id"), col("band"))
    bandFiltered.groupBy((lcKeys :+ col("t")): _*)
      .agg(count(lit(1)).as("__ct"))
      .groupBy(lcKeys: _*)
      .agg(sum(col("__ct")).as("__n"),
        sum(col("__ct") * (col("__ct") - 1) / 2).as("__tp"))
      .select(col("lc_id"), col("band"),
        (col("__n") * (col("__n") - 1) / 2 - col("__tp")).cast("long")
          .as("__npairs"))
      .filter(col("__npairs") > 0)
  }

  /** Inverse-CDF Poisson(λ) draw from a uniform, λ ≤ 1, truncated at 17
    * (tail mass < 1e-14 at λ = 1). The float-operation ORDER — term·λ/k,
    * cumulative left-to-right addition — is the contract the DuckDB
    * oracle replays; don't "simplify" to pow/factorial. */
  /** Explode a per-row range 0..(__n − 1) as `out`, in ≤65536-element
    * chunks so a giant group's range never materializes as ONE in-memory
    * sequence array (a 10⁸-bin group would otherwise build an 800 MB row
    * buffer). */
  private def explodedRange(df: DataFrame, out: String): DataFrame = {
    val c = 65536L
    df.filter(col("__n") > 0)
      .withColumn("__chunk",
        explode(sequence(lit(0L), expr(s"(__n - 1) div $c"))))
      .withColumn(out, explode(sequence(col("__chunk") * c,
        least(col("__chunk") * c + (c - 1), col("__n") - 1))))
      .drop("__chunk")
  }

  implicit class SF2RelationalOps(private val ens: Ensemble) extends AnyVal {
    def sf2Relational(args: sf.SFArgs = sf.SFArgs()): DataFrame =
      SF2Relational.sf2Relational(ens, args)
  }
}
