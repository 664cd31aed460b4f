package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions
import graft.text.TextAnalysis

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus, by importance weights between
  * two bag-of-hashed-n-grams unigram models, then sample without
  * replacement via the Gumbel-top-k trick. This is the standard
  * pretraining-data targeting move ("make CommonCrawl look like
  * Wikipedia") and composes with the rest of the curation layer.
  *
  * Shape (faithful to the paper, reduced where noted):
  *   - features: lower-cased whitespace-token BIGRAMS hashed into
  *     `buckets` buckets (the paper hashes unigrams+bigrams into 10k
  *     buckets; bigrams-only keeps the oracle SQL tractable and is the
  *     discriminative half).
  *   - models: add-one-smoothed bucket frequencies over the target (p)
  *     and raw (q) corpora.
  *   - weight: log w(x) = Σ_f c_f(x)·(log p_f − log q_f), the
  *     log-likelihood ratio under the two models.
  *   - resample: score = log w + Gumbel(0,1) noise from a deterministic
  *     md5 uniform of (id, seed); top-k by score IS a Gumbel-top-k
  *     sample without replacement ∝ w (Vieira 2014).
  *
  * Scale design: the two models are ONE aggregation each with at most
  * `buckets` output rows — broadcast dimension tables. Scoring is a
  * map-side join + per-doc partial aggregate (≤1 row/doc past the scan);
  * selection is orderBy+limit = TakeOrderedAndProject, never a global
  * sort or single-task window. Nothing here shuffles the corpus itself.
  */
object Dsir {

  /** Power of two so that signed-64 `& (buckets−1)` in Spark equals
    * UBIGINT `% buckets` in the DuckDB oracle (two's-complement low bits
    * == unsigned low bits; a non-power-of-two modulus would diverge on
    * negative signed values). */
  val DefaultBuckets = 4096

  /** Hashed-bigram bucket ids (with multiplicity) of a document. */
  def hashedBigramBuckets(text: Column,
      buckets: Int = DefaultBuckets): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val t = TextAnalysis.tokens(text)
    val n = size(t)
    val bigrams = when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
    transform(bigrams,
      g => HashExpressions.md5Long(g).bitwiseAND(lit((buckets - 1).toLong)))
  }

  private def feats(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(hashedBigramBuckets(col(textCol), buckets)).as("__f"))

  /** Per-document DSIR importance log-weight of `docs` (the raw corpus,
    * which is also the q model) against `target` (the p model). Returns
    * (idCol, n_bigrams, log_weight); documents with no bigram get
    * log_weight 0 (an empty product — the paper's weight is 1). */
  def importanceLogWeights(docs: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = DefaultBuckets): DataFrame = {
    // the two bucket-count models are ≤`buckets` rows each but are read
    // twice (totals + the log-ratio join); materializing them costs two
    // tiny blocks and saves two full corpus scans (the feats explode
    // re-runs per consumer otherwise — 6 scans measured in the static
    // plan, 4 after)
    val rawF = feats(docs, textCol, idCol, buckets)
    val tgtC = feats(target, textCol, idCol, buckets)
      .groupBy(col("__f")).agg(count(lit(1)).as("__tc"))
      .localCheckpoint(true)
    val rawC = rawF.groupBy(col("__f")).agg(count(lit(1)).as("__rc"))
      .localCheckpoint(true)
    // every bucket a doc produces is in rawC by construction (raw = docs),
    // so a left join from rawC covers the scoring domain; totals are one
    // tiny aggregate each, cross-joined as broadcast literals-of-one-row
    val totals = rawC.agg(sum(col("__rc")).as("__rn")).crossJoin(
      tgtC.agg(sum(col("__tc")).as("__tn")))
    val b = lit(buckets.toDouble)
    val model = rawC.join(tgtC, Seq("__f"), "left").crossJoin(broadcast(totals))
      .select(col("__f"),
        (log((coalesce(col("__tc"), lit(0L)) + lit(1.0)) /
            (col("__tn") + b)) -
          log((col("__rc") + lit(1.0)) / (col("__rn") + b))).as("__lr"))
    val scored = rawF.join(broadcast(model), Seq("__f"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lr")).as("log_weight"))
    docs.select(col(idCol).as("__id")).join(scored, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** Gumbel-top-k importance resample: k docs without replacement with
    * probability ∝ exp(log_weight). The Gumbel noise is a pure function
    * of (id, seed) — deterministic, replayable in SQL — so the selection
    * is reproducible across engines and reruns. Returns the k selected
    * rows as (idCol, log_weight, score, rank), rank 1 = highest score.
    *
    * The u = 0 corner (probability 2⁻⁵³ per doc): −ln(−ln 0) = −∞, the
    * doc simply never wins — no NaN reaches the sort. */
  def resample(docs: DataFrame, target: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = DefaultBuckets, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = importanceLogWeights(docs, target, textCol, idCol, buckets)
    val u = Sampling.hashUniform(col(idCol), seed)
    val top = w
      .withColumn("score", col("log_weight") - log(-log(u)))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    // rank over the k already-selected rows only (k = driver-bounded
    // metadata scale, not corpus scale) — the corpus-wide op above stays
    // TakeOrderedAndProject
    top.withColumn("rank",
      row_number().over(graft.functions.BoundedWindow
        .ordered(col("score").desc, col(idCol).asc)).cast("int"))
      .select(col(idCol), col("log_weight"), col("score"), col("rank"))
  }
}
