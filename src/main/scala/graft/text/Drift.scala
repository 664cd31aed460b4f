package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution drift: KL / Jensen-Shannon divergence between the
  * unigram distributions of corpus strata (sources, crawl snapshots,
  * languages). The pipeline-monitoring pass a 100 TB ingest runs on every
  * new snapshot — "did this crawl drift from the last one?" — and the
  * diagnostic that localizes WHICH terms drive a drift.
  *
  * Distributions are add-one smoothed over the JOINT vocabulary:
  * P_s(t) = (c_st + 1) / (N_s + V), V = |joint vocab| — so every term has
  * nonzero mass in every stratum and the KL sums are finite by
  * construction (the standard Laplace treatment).
  *
  * Scale design (100 TB): ONE exact (stratum, term) count aggregate is the
  * only corpus pass; everything downstream is vocabulary-bounded. The
  * smoothed distribution table is vocab × S rows (S = #strata, bounded —
  * the same posture as the per-source profiling of q_corpus_stats); the
  * pair matrix joins it against itself ON TERM, producing ≤ V·S(S−1)/2
  * rows that aggregate with map-side partials down to S(S−1)/2 output
  * rows. Per-stratum totals and the vocab size are an S-row broadcast.
  *
  * Cross-engine determinism: counts are exact longs; each divergence term
  * is one shared IEEE expression shape; only the Σ over vocab is
  * reduction-order-sensitive, so outputs are rounded to 6 decimals
  * (the q_unigram_ce / q_bigram_ce convention).
  */
object Drift {

  /** Smoothed (stratum, term, p) distribution table over the joint vocab,
    * plus the stratum column kept as `stratum`. Internal building block —
    * exposed for tests. */
  private[graft] def smoothedUnigrams(docs: DataFrame, stratumCol: String,
      textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // vocab×S-bounded and read three times (totals, vocab scaffold, the
    // left join) — barrier so the corpus explode+count runs ONCE
    // NULL strata fall under the reserved Sampling.NullStratum sentinel:
    // a raw NULL stratum key would never match the left join below (null
    // keys don't equi-join), degenerating that stratum's distribution to
    // pure smoothing mass, and the a < b pair filter would then drop its
    // comparisons entirely — NULL-source documents would vanish from the
    // drift matrix without signal.
    val counts = docs
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        explode(toks).as("term"))
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = counts.groupBy(col("stratum"))
      .agg(sum(col("c")).as("n_s"))
    val vocab = counts.select(col("term")).distinct()
    val vsize = broadcast(vocab.agg(count(lit(1)).as("v")))
    val strata = broadcast(totals)
    // vocab × strata scaffold so zero-count terms still carry smoothing mass
    vocab.crossJoin(strata).crossJoin(vsize)
      .join(counts, Seq("stratum", "term"), "left")
      .select(col("stratum"), col("term"),
        ((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("n_s") + col("v"))).as("p"))
  }

  /** Pairwise drift matrix over all strata pairs (a < b by string order):
    * (stratum_a, stratum_b, kl_ab, kl_ba, js), divergences in nats,
    * rounded to 6 decimals. JS uses the standard mixture
    * m = (p_a + p_b)/2 and is symmetric and bounded by ln 2. */
  def unigramDrift(docs: DataFrame, stratumCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // the self-join reads the distribution table twice — barrier it
    val dist = smoothedUnigrams(docs, stratumCol, textCol)
      .localCheckpoint(true)
    val a = dist.select(col("stratum").as("stratum_a"), col("term"),
      col("p").as("p_a"))
    val b = dist.select(col("stratum").as("stratum_b"), col("term"),
      col("p").as("p_b"))
    val m = (col("p_a") + col("p_b")) / lit(2.0)
    a.join(b, Seq("term"))
      .filter(col("stratum_a") < col("stratum_b"))
      .groupBy(col("stratum_a"), col("stratum_b"))
      .agg(
        round(sum(col("p_a") * log(col("p_a") / col("p_b"))), 6).as("kl_ab"),
        round(sum(col("p_b") * log(col("p_b") / col("p_a"))), 6).as("kl_ba"),
        round(sum(col("p_a") * log(col("p_a") / m) * lit(0.5) +
          col("p_b") * log(col("p_b") / m) * lit(0.5)), 6).as("js"))
  }

  /** The terms driving KL(a‖b) hardest: top-k by the per-term KL
    * contribution p_a(t)·ln(p_a(t)/p_b(t)) (largest = most
    * over-represented in `a` relative to `b`). Output:
    * (term, c_a, c_b, contrib, rank). Contribution is rounded to 6
    * decimals and ranks tie on ascending term — the q_bm25 convention.
    * Top-k is a TakeOrderedAndProject over the vocab-bounded join. */
  def driftTopTerms(docs: DataFrame, stratumA: String, stratumB: String,
      k: Int, stratumCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(stratumA != stratumB, "strata must differ")
    val toks = TextAnalysis.tokens(col(textCol))
    // same sentinel convention as smoothedUnigrams — pass
    // Sampling.NullStratum as stratumA/B to target the NULL stratum
    val sentinel = coalesce(col(stratumCol).cast("string"),
      lit(graft.operators.Sampling.NullStratum))
    val counts = docs
      .filter(sentinel.isin(stratumA, stratumB))
      .select(sentinel.as("stratum"),
        explode(toks).as("term"))
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("c"))
    // vocab here = joint vocab of the two strata; smoothing as above.
    // byTerm feeds both the totals and the scoring — barrier it.
    val byTerm = counts.groupBy(col("term"))
      .agg(sum(when(col("stratum") === stratumA, col("c")).otherwise(0L))
          .as("c_a"),
        sum(when(col("stratum") === stratumB, col("c")).otherwise(0L))
          .as("c_b"))
      .localCheckpoint(true)
    val totals = broadcast(byTerm.agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("v")))
    val pa = (col("c_a") + lit(1.0)) / (col("n_a") + col("v"))
    val pb = (col("c_b") + lit(1.0)) / (col("n_b") + col("v"))
    val scored = byTerm.crossJoin(totals)
      .select(col("term"), col("c_a"), col("c_b"),
        round(pa * log(pa / pb), 6).as("contrib"))
    scored.orderBy(col("contrib").desc, col("term")).limit(k)
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow
          .ordered(col("contrib").desc, col("term"))).cast("int"))
  }

  /** Pearson correlation matrix of integer quality signals per stratum —
    * the monitoring pass that shows whether signals are redundant (two
    * near-collinear filters gate the same documents) and whether their
    * relationships shift between sources or snapshots.
    *
    * Signals must be INTEGER-valued columns (counts: chars, tokens,
    * punctuation, …): all five sufficient statistics (n, Σx, Σx², Σxy)
    * are then exact longs from ONE aggregate pass with map-side
    * partials, and the correlation is a single shared IEEE expression
    * over those exact integers — bit-exact cross-engine up to the final
    * 6-decimal rounding. Output is long-format: one row per (stratum,
    * signal_a, signal_b) unordered pair, corr NULL for degenerate
    * (zero-variance) signals.
    *
    * Scale: one groupBy(stratum) over |signals|² sum columns; output is
    * S·pairs rows. Caveat: Σx² of a count bounded by B over N rows needs
    * N·B² < 2^63 — at petabyte scale shard the aggregate or lift the
    * sums to decimal(38,0). */
  def signalCorrelation(docs: DataFrame, signals: Seq[(String, Column)],
      stratumCol: String = "source"): DataFrame = {
    require(signals.size >= 2, "need at least two signals")
    require(signals.map(_._1).distinct.size == signals.size,
      "signal names must be unique")
    val base = docs.select(
      col(stratumCol).cast("string").as("stratum") +:
        signals.map { case (n, c) => c.cast("long").as(s"__$n") }: _*)
    val pairs = for {
      i <- signals.indices; j <- signals.indices if i < j
    } yield (signals(i)._1, signals(j)._1)
    val sumAggs = signals.flatMap { case (n, _) => Seq(
      sum(col(s"__$n")).as(s"__s_$n"),
      sum(col(s"__$n") * col(s"__$n")).as(s"__ss_$n")) }
    val prodAggs = pairs.map { case (a, b) =>
      sum(col(s"__$a") * col(s"__$b")).as(s"__sp_${a}_$b") }
    val g = base.groupBy(col("stratum"))
      .agg(count(lit(1)).as("__n"), (sumAggs ++ prodAggs): _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("__n").cast("double")
      val sx = col(s"__s_$a").cast("double")
      val sy = col(s"__s_$b").cast("double")
      val sxx = col(s"__ss_$a").cast("double")
      val syy = col(s"__ss_$b").cast("double")
      val sxy = col(s"__sp_${a}_$b").cast("double")
      val den = sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)
      struct(lit(a).as("signal_a"), lit(b).as("signal_b"),
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(round((n * sxy - sx * sy) / den, 6)).as("corr"))
    }
    g.select(col("stratum"), explode(array(rows: _*)).as("p"))
      .select(col("stratum"), col("p.signal_a").as("signal_a"),
        col("p.signal_b").as("signal_b"), col("p.corr").as("corr"))
  }

  /** Mixture-balance entropy of the corpus: the Shannon entropy of the
    * per-stratum TOKEN mass distribution, plus its exponential (the
    * "effective number of strata" — 6 sources contributing equally score
    * 6.0; one source at 99% scores ≈ 1). The single-number monitor for
    * training-mixture collapse — watch it drop when one crawl dominates
    * an ingest.
    *
    * One stats scan + one |strata|-key aggregate; the entropy itself
    * folds the stratum shares in SORTED stratum order (collect_list +
    * sort_array over the |strata|-row aggregate — bounded metadata), so
    * the float accumulation order is fixed on every engine. NULL strata
    * count under the reserved sentinel. Returns one row (n_strata,
    * total_tokens, entropy, effective_strata), entropy rounded to 6. */
  def mixtureEntropy(docs: DataFrame, stratumCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val per = docs.select(
        coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("__tk"))
      .groupBy(col("stratum"))
      .agg(sum(col("__tk")).as("__t"))
      .filter(col("__t") > 0)
    val packed = per.agg(
      sort_array(collect_list(struct(col("stratum"), col("__t"))))
        .as("__l"),
      sum(col("__t")).as("total_tokens"))
    val tot = col("total_tokens").cast("double")
    val ent = -aggregate(col("__l"), lit(0.0),
      (acc, s) => acc + bindD(s.getField("__t").cast("double") / tot)(
        p => p * log(p)))
    packed.select(size(col("__l")).cast("long").as("n_strata"),
      col("total_tokens"),
      round(ent, 6).as("entropy"),
      round(exp(round(ent, 6)), 6).as("effective_strata"))
  }

  /** Robust per-stratum location/scale — MEDIAN and MAD (median absolute
    * deviation) of a GRID-VALUED signal (integers, or scores pre-rounded
    * to a fixed grid — the caller's contract), per stratum: the
    * outlier-resistant monitoring stats a mean/std corrupts under the
    * heavy-tailed signals corpora actually have (one 100 MB page moves a
    * source's mean length arbitrarily; it moves the median not at all).
    *
    * Exact WITHOUT per-stratum sorting or collection: the signal's
    * distinct-value grid per stratum is one count aggregate (map-side
    * partials); the LOWER median is the smallest value whose cumulative
    * count reaches ⌈n/2⌉ — a window over the grid-bounded per-stratum
    * value table, never the corpus (the Eval distinct-score argument).
    * MAD repeats the same trick on the |v − median| grid of the SAME
    * table (grid-sized, no second corpus pass). All integer/grid
    * arithmetic — engine-exact. NULL signals are excluded; NULL strata
    * report under [[graft.operators.Sampling.NullStratum]]. Returns
    * (stratum, n, median, mad). */
  def robustStats(df: DataFrame, stratumCol: String, signalCol: String)
      : DataFrame = {
    val grid = df.filter(col(signalCol).isNotNull)
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(signalCol).cast("double").as("__v"))
      .groupBy(col("stratum"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = grid.groupBy(col("stratum")).agg(sum(col("__c")).as("__n"))
    // lower median of a (stratum, value, count) grid: smallest v whose
    // cumulative count reaches ⌈n/2⌉ (2·cum ≥ n in integers)
    def lowerMedian(g: DataFrame, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("stratum")).orderBy(col("__v").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      g.withColumn("__cum", sum(col("__c")).over(w))
        .join(tot, Seq("stratum"))
        .filter(col("__cum") * 2 >= col("__n"))
        .groupBy(col("stratum")).agg(min(col("__v")).as(out))
    }
    val med = lowerMedian(grid, "median")
    val dGrid = grid.join(med, Seq("stratum"))
      .select(col("stratum"), abs(col("__v") - col("median")).as("__v"),
        col("__c"))
      .groupBy(col("stratum"), col("__v")).agg(sum(col("__c")).as("__c"))
    val mad = lowerMedian(dGrid, "mad")
    tot.join(med, Seq("stratum")).join(mad, Seq("stratum"))
      .select(col("stratum"), col("__n").as("n"), col("median"),
        col("mad"))
  }

  /** Per-stratum EXACT quantile profile of a grid-valued signal — the
    * monitoring table (p25/p50/p75/p90/p99 of doc length, score, token
    * count per source) computed the [[robustStats]] way: lower grid
    * quantiles (smallest value whose cumulative count reaches ⌈p·n⌉)
    * from ONE distinct-value-grid aggregate + one cumulative window
    * over the grid — no corpus sort, no per-stratum collection, exact
    * where `approxCorpusStats`' sketches are not. One |ps|-way column
    * pivot via S-row joins. Column names: p25, p50, p99_9 (dots → _). */
  def gridQuantiles(df: DataFrame, stratumCol: String, signalCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0, 1]: $ps")
    val grid = df.filter(col(signalCol).isNotNull)
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(signalCol).cast("double").as("__v"))
      .groupBy(col("stratum"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = grid.groupBy(col("stratum")).agg(sum(col("__c")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = grid.withColumn("__cum", sum(col("__c")).over(w))
      .join(tot, Seq("stratum"))
      .localCheckpoint(true) // read once per requested quantile
    def name(p: Double): String =
      "p" + BigDecimal(p * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_")
    ps.foldLeft(tot) { (acc, p) =>
      acc.join(cum
        .filter(col("__cum") >=
          ceil(lit(p) * col("n").cast("double")).cast("long"))
        .groupBy(col("stratum")).agg(min(col("__v")).as(name(p))),
        Seq("stratum"))
    }
  }

  /** Per-stratum WINSORIZATION: clamp a grid-valued signal to its
    * stratum's exact [pLo, pHi] quantile band — the standard tail
    * treatment before means/regressions on heavy-tailed corpus signals
    * (one 100 MB page stops dominating a source's mean length while the
    * row itself survives, unlike a drop filter). Quantiles are the
    * LOWER grid quantiles (smallest value whose cumulative count
    * reaches ⌈p·n⌉ — the [[robustStats]] convention, computed on the
    * distinct-value grid: no corpus sort, no collection); the clamp is
    * a broadcast S-row join + map-only `least`/`greatest`. Returns
    * (stratum, idCol, signal, lo, hi, winsorized, clipped). */
  def winsorize(df: DataFrame, stratumCol: String, signalCol: String,
      idCol: String, pLo: Double = 0.01, pHi: Double = 0.99)
      : DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val grid = df.filter(col(signalCol).isNotNull)
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(signalCol).cast("double").as("__v"))
      .groupBy(col("stratum"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = grid.groupBy(col("stratum")).agg(sum(col("__c")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = grid.withColumn("__cum", sum(col("__c")).over(w))
      .join(tot, Seq("stratum"))
    def quantile(p: Double, out: String): DataFrame = cum
      .filter(col("__cum") >=
        ceil(lit(p) * col("__n").cast("double")).cast("long"))
      .groupBy(col("stratum")).agg(min(col("__v")).as(out))
    val band = quantile(pLo, "lo").join(quantile(pHi, "hi"),
      Seq("stratum"))
    df.filter(col(signalCol).isNotNull)
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(idCol), col(signalCol).cast("double").as("signal"))
      .join(broadcast(band), Seq("stratum"))
      .select(col("stratum"), col(idCol), col("signal"), col("lo"),
        col("hi"),
        least(greatest(col("signal"), col("lo")), col("hi"))
          .as("winsorized"),
        (col("signal") < col("lo") || col("signal") > col("hi"))
          .as("clipped"))
  }

  /** Per-row robust outlier flags from [[robustStats]] — the modified
    * z-score of Iglewicz & Hoaglin (1993): `M = 0.6745·(v − median)/MAD`,
    * flagged when |M| > `zThreshold` (their recommended 3.5). The
    * mean/std z-score breaks exactly when outliers exist (the outliers
    * inflate the std that is supposed to expose them); the median/MAD
    * version doesn't — this is the per-document actionable form of the
    * per-stratum stats ("drop these specific pages").
    *
    * Plan: [[robustStats]]' two grid passes + ONE broadcast join of the
    * S-row stats table back onto the corpus — map-only scoring, no
    * second corpus shuffle. Degenerate strata (MAD = 0: over half the
    * stratum sits on one value) get a NULL score and flag
    * `v ≠ median` — any deviation from a collapsed distribution is an
    * outlier. Returns (stratum, idCol, signal, m, outlier). */
  def robustOutliers(df: DataFrame, stratumCol: String,
      signalCol: String, idCol: String, zThreshold: Double = 3.5)
      : DataFrame = {
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val stats = robustStats(df, stratumCol, signalCol)
    val m = lit(0.6745) * (col("__v") - col("median")) / col("mad")
    df.filter(col(signalCol).isNotNull)
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(idCol), col(signalCol).cast("double").as("__v"))
      .join(broadcast(stats), Seq("stratum"))
      .select(col("stratum"), col(idCol), col("__v").as("signal"),
        // floor-chain quantization, not round(): the division can land
        // exactly on a .5e-6 boundary where engine round() conventions
        // split — the floor(x·10⁶ + 0.5) double chain is bit-identical
        when(col("mad") =!= 0.0,
          floor(m * 1e6 + lit(0.5)) / 1e6).as("m"),
        when(col("mad") =!= 0.0, abs(m) > zThreshold)
          .otherwise(col("__v") =!= col("median")).as("outlier"))
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * sample of a bounded score (the credit-risk monitoring classic, now
    * the standard drift gate on classifier/quality scores feeding a
    * curation pipeline): scores clamp into `bins` equal-width buckets on
    * [0, 1] (the calibrationBins contract) and
    * `PSI = Σ_b (q_b − p_b)·ln(q_b/p_b)` over LAPLACE-SMOOTHED bin
    * fractions `p_b = (n_b + 1)/(N + bins)` — smoothing keeps every term
    * finite (an empty bin on one side is exactly the signal PSI must
    * not drop). Rule of thumb: < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 action.
    *
    * Scale: one count aggregate per side (map-side partials, ≤ `bins`
    * rows out), a broadcast scaffold join so empty bins surface, and the
    * total folds over the ≤`bins`-row table in ascending-bin order (the
    * ECE idiom — float accumulation order pinned). Returns one row per
    * bin: (bin, n_ref, n_cur, p_ref, p_cur, psi_term, psi) with `psi`
    * repeated (all rounded to 6). */
  def populationStabilityIndex(ref: DataFrame, cur: DataFrame,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    def binned(df: DataFrame, out: String) = {
      val clamped = least(greatest(round(col(scoreCol), 6), lit(0.0)),
        lit(1.0))
      df.filter(col(scoreCol).isNotNull)
        .select(least(floor(clamped * bins).cast("long"),
          lit(bins - 1L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    }
    psiFromBinned(ref.sparkSession, binned(ref, "n_ref"),
      binned(cur, "n_cur"), bins)
  }

  /** [[populationStabilityIndex]] with EQUAL-FREQUENCY bins derived
    * from the reference — the industry-standard decile PSI: bin edges
    * are the reference's exact grid quantiles (edge_i = smallest
    * rounded value whose cumulative count reaches ⌈i·N/B⌉ — the
    * [[robustStats]] lower-quantile convention, computed on the
    * distinct-value grid, never a sort of the corpus), so every
    * reference bin holds ≈ N/B rows by construction and the statistic
    * stops depending on an arbitrary [0,1] scale assumption — scores
    * with any bounded or unbounded range work. Edges are B−1 driver
    * doubles (model-side metadata); binning is a fixed sum of ≤ B−1
    * comparisons fused into one projection. Skewed references can
    * produce duplicate edges → structurally empty bins; the Laplace
    * smoothing keeps them finite (and they carry drift signal when the
    * current side lands there). */
  def populationStabilityIndexQuantile(ref: DataFrame, cur: DataFrame,
      scoreCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = ref.sparkSession
    // reference grid quantile edges, i = 1..B-1
    val grid = ref.filter(col(scoreCol).isNotNull)
      .select(round(col(scoreCol), 6).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // cumulative over the DISTINCT 6-decimal score grid — bounded by
    // the value resolution, never the corpus row count
    val w = graft.functions.BoundedWindow.ordered(col("__v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = grid.withColumn("__cum", sum(col("__c")).over(w))
      .collect().sortBy(_.getDouble(0))
    val n = if (cum.isEmpty) 0L else cum.last.getLong(2)
    require(n > 0, "empty reference")
    val edges = (1 until bins).map { i =>
      // smallest v with cum·B ≥ i·N (integer arithmetic)
      cum.find(r => r.getLong(2) * bins >= i.toLong * n).get.getDouble(0)
    }
    def binned(df: DataFrame, out: String) = {
      val s6 = round(col(scoreCol), 6)
      // RIGHT-CLOSED bins: a value equal to an edge closes the lower
      // bin — with lower-quantile edges this makes the reference
      // deciles exactly N/B (up to grid ties)
      val bin = edges.map(e => when(s6 > e, 1L).otherwise(0L))
        .reduce(_ + _)
      df.filter(col(scoreCol).isNotNull)
        .select(bin.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    }
    psiFromBinned(spark, binned(ref, "n_ref"), binned(cur, "n_cur"),
      bins)
  }

  private def psiFromBinned(spark: org.apache.spark.sql.SparkSession,
      refBinned: DataFrame, curBinned: DataFrame, bins: Int)
      : DataFrame = {
    import spark.implicits._
    val scaffold = (0L until bins.toLong).toDF("bin")
    val j = scaffold
      .join(refBinned, Seq("bin"), "left")
      .join(curBinned, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = j.groupBy().agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    val p = (col("n_ref") + 1).cast("double") /
      (col("__tr") + bins).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("__tc") + bins).cast("double")
    val terms = j.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        p.as("__p"), q.as("__q"),
        ((q - p) * log(q / p)).as("__t"))
    val psi = terms.groupBy()
      .agg(sort_array(collect_list(struct(col("bin"), col("__t"))))
        .as("__l"))
      .select(round(aggregate(col("__l"), lit(0.0),
        (a, x) => a + x.getField("__t")), 6).as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("__p"), 6).as("p_ref"), round(col("__q"), 6).as("p_cur"),
        round(col("__t"), 6).as("psi_term"), col("psi"))
  }

  /** Wilson score confidence intervals for per-stratum KEEP RATES — the
    * dashboard form of every gate's acceptance rate: a 95% interval on
    * "this source keeps p of its docs" that stays valid at small n and
    * near p ∈ {0, 1} (where the naive ±z·√(p(1−p)/n) interval collapses
    * or escapes [0,1]). `keep` is any boolean column (a filter verdict,
    * a classifier threshold). Per stratum: n, n_kept, the rate, and the
    * Wilson [lo, hi] clamped to [0,1], all rounded 6.
    *
    *   center = (p + z²/2n) / (1 + z²/n)
    *   half   = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n)
    *
    * z² is one IEEE product of the z literal, so the whole closed form
    * replays in the oracle. One keyed aggregate; |strata| rows out;
    * NULL keeps count as not kept, NULL strata under the sentinel. */
  def keepRateIntervals(df: DataFrame, stratumCol: String, keep: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val z2 = z * z
    val agg = df.groupBy(coalesce(col(stratumCol).cast("string"),
        lit(graft.operators.Sampling.NullStratum)).as("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(when(coalesce(keep, lit(false)), 1L).otherwise(0L))
          .as("n_kept"))
    val nD = col("n").cast("double")
    val p = col("n_kept").cast("double") / nD
    val denom = lit(1.0) + lit(z2) / nD
    val center = (p + lit(z2) / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z2) / (lit(4.0) * nD * nD))) / denom
    agg.select(col("stratum"), col("n"), col("n_kept"),
      round(p, 6).as("keep_rate"),
      round(greatest(lit(0.0), center - half), 6).as("ci_lo"),
      round(least(lit(1.0), center + half), 6).as("ci_hi"))
  }

  /** Evaluate `c` once inside a lambda body (the TextAnalysis.bind trick,
    * local copy to keep the fold linear). */
  private def bindD(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)
}
