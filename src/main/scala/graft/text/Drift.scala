package graft.text

import org.apache.spark.sql.DataFrame
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
    val counts = docs
      .select(col(stratumCol).cast("string").as("stratum"),
        explode(toks).as("term"))
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("c"))
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
    val dist = smoothedUnigrams(docs, stratumCol, textCol)
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
    val counts = docs
      .filter(col(stratumCol).cast("string").isin(stratumA, stratumB))
      .select(col(stratumCol).cast("string").as("stratum"),
        explode(toks).as("term"))
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("c"))
    // vocab here = joint vocab of the two strata; smoothing as above
    val byTerm = counts.groupBy(col("term"))
      .agg(sum(when(col("stratum") === stratumA, col("c")).otherwise(0L))
          .as("c_a"),
        sum(when(col("stratum") === stratumB, col("c")).otherwise(0L))
          .as("c_b"))
    val totals = broadcast(byTerm.agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("v")))
    val pa = (col("c_a") + lit(1.0)) / (col("n_a") + col("v"))
    val pb = (col("c_b") + lit(1.0)) / (col("n_b") + col("v"))
    val scored = byTerm.crossJoin(totals)
      .select(col("term"), col("c_a"), col("c_b"),
        round(pa * log(pa / pb), 6).as("contrib"))
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("contrib").desc, col("term")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("contrib").desc, col("term"))).cast("int"))
  }
}
