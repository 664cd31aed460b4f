package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation over a scored, binary-labeled table — the
  * missing half of the quality-classifier loop ([[Classifier]] trains and
  * scores; this measures). A curation pipeline that gates 100 TB of crawl
  * on a classifier score needs the classifier's ROC AUC and operating-
  * point metrics computed ON THE CLUSTER, against however many labeled
  * documents exist (often millions of distilled labels, not thousands).
  *
  * Beyond-parity training-data mandate (SURVEY.md §2.9); the reference
  * engine has no model-evaluation layer.
  *
  * Scale design: the corpus is touched by exactly ONE aggregate pass —
  * `groupBy(rounded score)` with map-side partial (n_pos, n_neg) counts.
  * Everything downstream runs on the DISTINCT-SCORE table, whose
  * cardinality the rounding contract bounds by construction (a
  * `roundDecimals = 6` sigmoid score has at most 10⁶ + 1 distinct
  * values — metadata scale, the same bounded-cardinality argument the
  * vocab aggregates make). The ROC rank-sum therefore never windows over
  * documents: the cumulative-negative window runs over ≤ 10⁶ rows.
  *
  * Exactness: AUC uses the tie-aware Mann–Whitney U with midranks,
  * accumulated as the INTEGER `2·U` — each distinct score `s` with
  * `p` positives and `n` negatives contributes
  * `(2·negBelow(s) + n) · p` to `2·U` (the `n·p/2` midrank half-credit
  * kept doubled so the sufficient statistic stays a BIGINT). The only
  * float operations are the final divisions, each rounded — so the
  * result is bit-stable across engines, partitionings and layouts, and
  * the DuckDB oracle replays it exactly. Threshold metrics (confusion
  * counts, precision/recall/F1/accuracy) come from the SAME per-score
  * table: a score grid cell is entirely ≥ or < the threshold, so the
  * confusion counts are exact integer sums.
  */
object Eval {

  /** One-row evaluation of a binary classifier: ROC AUC (tie-aware
    * midrank Mann–Whitney) plus the confusion matrix and derived metrics
    * at `threshold` (predict positive when score ≥ threshold).
    *
    * `scoreCol` is rounded to `roundDecimals` BEFORE anything else —
    * part of the operator's definition (it bounds the distinct-score
    * table; see the object doc) — and `labelCol` is cast to int
    * (0/false = negative, anything else = positive; NULL labels are
    * excluded — unlabeled rows carry no evaluation signal).
    *
    * Degenerate inputs follow sklearn's conventions: AUC is NULL when
    * either class is empty; precision is NULL at zero predicted
    * positives, recall NULL at zero actual positives, F1 NULL when
    * precision + recall is 0 or either is NULL.
    */
  def binaryMetrics(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double = 0.5, roundDecimals: Int = 6): DataFrame =
    metricsCore(scored, scoreCol, labelCol, None, threshold,
      roundDecimals)

  /** Per-stratum [[binaryMetrics]] — one metrics row per value of
    * `stratumCol` (per-language / per-source classifier quality, the
    * fairness view a multilingual curation gate needs: a global AUC of
    * 0.9 can hide a 0.5 on the minority language). Same single corpus
    * pass, keyed on (stratum, score); the rank window partitions by
    * stratum over the per-stratum score grid. NULL strata report under
    * the reserved [[graft.operators.Sampling.NullStratum]] sentinel. */
  def binaryMetricsBy(scored: DataFrame, scoreCol: String,
      labelCol: String, stratumCol: String, threshold: Double = 0.5,
      roundDecimals: Int = 6): DataFrame =
    metricsCore(scored, scoreCol, labelCol, Some(stratumCol), threshold,
      roundDecimals)

  private def metricsCore(scored: DataFrame, scoreCol: String,
      labelCol: String, stratumCol: Option[String], threshold: Double,
      roundDecimals: Int): DataFrame = {
    require(roundDecimals >= 1 && roundDecimals <= 9,
      s"roundDecimals must be in [1, 9], got $roundDecimals")
    val keyCols = stratumCol.toSeq.map(c =>
      coalesce(col(c).cast("string"),
        lit(graft.operators.Sampling.NullStratum)).as("stratum"))
    val keys = stratumCol.toSeq.map(_ => "stratum")
    // One corpus pass: per-distinct-score class counts (map-side partials)
    val perScore = scored
      .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(keyCols :+
        round(col(scoreCol), roundDecimals).as("__s") :+
        (col(labelCol).cast("int") =!= 0).cast("long").as("__y"): _*)
      .groupBy((keys.map(col) :+ col("__s")): _*)
      .agg(sum(col("__y")).as("__p"),
        (count(lit(1)) - sum(col("__y"))).as("__n"))
    // Cumulative negatives strictly below each score: a window over the
    // bounded distinct-score table (NOT the corpus) — ≤ 10^roundDecimals
    // rows per stratum for a [0, 1] score by the rounding contract.
    val wBase =
      if (keys.isEmpty)
        graft.functions.BoundedWindow.ordered(col("__s").asc)
      else Window.partitionBy(keys.map(col): _*).orderBy(col("__s").asc)
    val wAsc = wBase.rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = perScore.withColumn("__negBelow",
      coalesce(sum(col("__n")).over(wAsc), lit(0L)))
    val grouped =
      if (keys.isEmpty) withBelow.groupBy()
      else withBelow.groupBy(keys.map(col): _*)
    val agg = grouped.agg(
      sum(col("__p")).as("n_pos"),
      sum(col("__n")).as("n_neg"),
      // 2·U as an exact BIGINT (midrank half-credit kept doubled)
      sum((lit(2L) * col("__negBelow") + col("__n")) * col("__p"))
        .as("__u2"),
      sum(when(col("__s") >= threshold, col("__p")).otherwise(0L))
        .as("tp"),
      sum(when(col("__s") >= threshold, col("__n")).otherwise(0L))
        .as("fp"),
      sum(when(col("__s") < threshold, col("__n")).otherwise(0L))
        .as("tn"),
      sum(when(col("__s") < threshold, col("__p")).otherwise(0L))
        .as("fn"))
    val prec = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")))
    val rec = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")))
    agg.select(keys.map(col) ++ Seq(
        col("n_pos"), col("n_neg"), col("tp"), col("fp"), col("tn"),
        col("fn"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"),
        round(prec, 6).as("precision"),
        round(rec, 6).as("recall"),
        when(prec.isNotNull && rec.isNotNull && prec + rec > 0,
          round(lit(2.0) * prec * rec / (prec + rec), 6)).as("f1"),
        round((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")), 6)
          .as("accuracy")): _*)
  }

  /** Reliability / calibration bins for a probabilistic classifier:
    * scores in [0, 1] (out-of-range values clamp — part of the
    * contract) land in `bins` equal-width buckets; each non-empty
    * bucket reports its count, positive count, MEAN SCORE and
    * POSITIVE FRACTION — the reliability-diagram table whose gap
    * |frac_pos − mean_score| is what "calibrated" means.
    *
    * One aggregate pass. Exactness: the mean score is accumulated as
    * INTEGER micro-units (the ROUNDED score × 10⁶ is exact in a long),
    * so every output is one rounded division of exact integers —
    * engine- and layout-stable, no float summation anywhere. */
  def calibrationBins(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val s6 = round(col(scoreCol), 6)
    val clamped = least(greatest(s6, lit(0.0)), lit(1.0))
    val bucket = least(floor(clamped * bins).cast("long"),
      lit(bins - 1L))
    scored
      .filter(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .select(bucket.as("bin"),
        round(clamped * 1000000.0, 0).cast("long").as("__u"),
        (col(labelCol).cast("int") =!= 0).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        round(sum(col("__u")).cast("double") /
          (lit(1000000.0) * count(lit(1))), 6).as("mean_score"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
      .withColumn("bin_lo",
        round(col("bin").cast("double") / bins, 6))
      .withColumn("bin_hi",
        round((col("bin") + 1).cast("double") / bins, 6))
  }

  /** Expected Calibration Error from a [[calibrationBins]] table:
    * `ECE = Σ_b (n_b / N) · |frac_pos_b − mean_score_b|`, folded in
    * ascending-bin order over the collected ≤`bins`-row table (the
    * mixtureEntropy sorted-fold idiom — float accumulation order is
    * engine-fixed). One row: (n_bins_nonempty, n, ece). */
  def expectedCalibrationError(binsDf: DataFrame): DataFrame = {
    val packed = binsDf.agg(
      sort_array(collect_list(struct(col("bin"), col("n"),
        col("frac_pos"), col("mean_score")))).as("__l"),
      sum(col("n")).as("n"))
    val tot = col("n").cast("double")
    val ece = aggregate(col("__l"), lit(0.0),
      (acc, b) => acc + b.getField("n").cast("double") / tot *
        abs(b.getField("frac_pos") - b.getField("mean_score")))
    packed.select(size(col("__l")).cast("long").as("n_bins_nonempty"),
      col("n"), round(ece, 6).as("ece"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected agreement between
    * TWO raters over categorical labels, the standard QC gate on
    * human-labeled training/eval data (raw percent agreement rewards
    * majority-class guessing; kappa subtracts the agreement two raters
    * would reach by chance from their marginal label rates):
    *
    *   κ = (p_o − p_e) / (1 − p_e),  p_e = Σ_c pA(c)·pB(c)
    *
    * Rows where either label is NULL are excluded (an unlabeled item
    * is not a disagreement). Returns one row: (n, n_categories, p_o,
    * p_e, kappa) — all from exact integer counts, only the final
    * ratios rounded, so the row is oracle-replayable. κ is NULL when
    * p_e = 1 (both raters constant — chance agreement is total and
    * the statistic is undefined).
    *
    * Scale: ONE confusion aggregate (≤ |categories|² rows — a
    * dimension table) carries everything; marginals and the agreement
    * fold run on it, never the corpus. */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String)
      : DataFrame = {
    val conf = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .groupBy(col(raterACol).as("__a"), col(raterBCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // feeds both marginals and the totals
    val aMarg = conf.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__na"))
    val bMarg = conf.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__nb"))
    val tot = conf.agg(sum(col("__c")).as("n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
        .as("__agree"))
    // p_e folds over the category-sorted marginal join — ordered, so
    // the float sum is engine-exact
    val cats = aMarg.join(bMarg, Seq("__k"), "full_outer")
      .select(col("__k"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("__k"), col("__na"),
        col("__nb")))).as("__l"))
    cats.crossJoin(broadcast(tot)).select(
      col("n"),
      size(col("__l")).cast("long").as("n_categories"),
      round(col("__agree").cast("double") / col("n"), 6).as("p_o"),
      round(aggregate(col("__l"), lit(0.0), (acc, x) =>
        acc + x.getField("__na").cast("double") / col("n") *
          (x.getField("__nb").cast("double") / col("n"))), 6).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") === 1.0, lit(null).cast("double"))
          .otherwise(round((col("p_o") - col("p_e")) /
            (lit(1.0) - col("p_e")), 6)))
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for N
    * raters per item (the multi-annotator generalization QC teams
    * actually need: every item rated by a pool, raters anonymous).
    * Input is ONE ROW PER RATING: (itemCol, labelCol). Items with
    * fewer than 2 ratings are excluded (agreement is undefined on a
    * single rating; the variable-n generalization is used, so rater
    * counts may differ per item):
    *
    *   P_i = (Σ_c n_ic² − n_i) / (n_i·(n_i − 1)),   P̄ = mean_i P_i
    *   p_c = Σ_i n_ic / Σ_i n_i,                    P̄_e = Σ_c p_c²
    *   κ = (P̄ − P̄_e) / (1 − P̄_e)
    *
    * Returns one row: (n_items, n_ratings, p_bar, p_e, kappa); κ NULL
    * when P̄_e = 1. Scale: one (item, label) count aggregate → one
    * per-item reduce (map-side partials, ≤1 row per item) → one scalar
    * pass; label totals are a |categories|-row fold. NULL labels drop.
    *
    * Determinism: Σ_i P_i is a corpus-sized FLOAT sum — the one
    * order-sensitive reduction — so each P_i (itself one IEEE division,
    * engine-exact) is quantized to integer nano-units with the
    * floor(x·10⁹ + 0.5) idiom and summed as DECIMAL(38,0): exact at any
    * corpus size, partition-order-free, and the DuckDB oracle replays
    * it digit-for-digit (the DoReMi/ECE micro-unit discipline). */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String)
      : DataFrame = {
    val cellCounts = df.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // feeds the per-item AND per-label passes
    val perItem = cellCounts.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n") * col("__n")).as("__sq"))
      .filter(col("__ni") >= 2)
      .localCheckpoint(true) // feeds the scalar pass AND the label join
    val pI = (col("__sq") - col("__ni")).cast("double") /
      (col("__ni") * (col("__ni") - 1)).cast("double")
    val scal = perItem.agg(count(lit(1)).as("n_items"),
      sum(col("__ni")).as("n_ratings"),
      sum(floor(pI * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
        .as("__pnano"))
    // label totals over the RETAINED items only (n_i >= 2)
    val labelTot = cellCounts.join(perItem.select(col("__i")), Seq("__i"))
      .groupBy(col("__c"))
      .agg(sum(col("__n")).as("__nc"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("__c"), col("__nc"))))
        .as("__l"))
    labelTot.crossJoin(broadcast(scal)).select(
      col("n_items"), col("n_ratings"),
      round(col("__pnano").cast("double") / lit(1e9) /
        col("n_items").cast("double"), 6).as("p_bar"),
      round(aggregate(col("__l"), lit(0.0), (acc, x) =>
        acc + (x.getField("__nc").cast("double") /
          col("n_ratings").cast("double")) *
          (x.getField("__nc").cast("double") /
            col("n_ratings").cast("double"))), 6).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") === 1.0, lit(null).cast("double"))
          .otherwise(round((col("p_bar") - col("p_e")) /
            (lit(1.0) - col("p_e")), 6)))
  }

  /** Unbiased pass@k over per-problem sample outcomes — the standard
    * functional-correctness metric for code models (Chen et al. 2021,
    * the HumanEval estimator): with n samples of which c pass,
    * `pass@k = 1 − C(n−c, k)/C(n, k)`, computed in the numerically
    * stable product form `1 − Π_{i=0..k−1} (n−c−i)/(n−i)` (never
    * touches factorials). Per problem: n, c, and one `pass_at_k`
    * column per requested k — exactly 1.0 when fewer than k samples
    * fail, NULL when the problem has fewer than n = k samples (the
    * estimator is undefined there; a silent clamp would overstate).
    *
    * Scale: ONE count/sum aggregate keyed by problem (map-side
    * combinable) and a fixed k-term fold per row — no windows, no
    * per-sample state; problems × |ks| output rows. */
  def passAtK(df: DataFrame, problemCol: String, correctCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"ks must be positive, got $ks")
    val n = col("n").cast("double")
    val c = col("c").cast("double")
    val cols = ks.map { k =>
      when(col("n") < k, lit(null).cast("double"))
        .when(n - c < k, lit(1.0))
        .otherwise(round(lit(1.0) -
          aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
            (acc, i) => acc * (n - c - i) / (n - i)), 6))
        .as(s"pass_at_$k")
    }
    df.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("c"))
      .select(col(problemCol) +: col("n") +: col("c") +: cols: _*)
  }
}
