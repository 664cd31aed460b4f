package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Hashed linear text classifier scoring — the fastText-shaped quality
  * filter (Joulin et al. 2016; the architecture behind the CCNet /
  * GPT-3-style "looks like the target corpus" page filters): mean-pooled
  * hashed-token weights pushed through a sigmoid,
  *
  *   score(doc) = σ( bias + (Σ_t w[h(t)]) / n_tokens )
  *
  * with h the md5 bucket hash (power-of-two `buckets`, signed-vs-unsigned
  * safe like [[graft.operators.Dsir]]) over the shared lower-cased
  * whitespace tokenization. Only INFERENCE lives here — training a real
  * classifier happens offline; the weight vector arrives either as an
  * explicit array ([[scoreWithWeights]], the production path: the trained
  * vector becomes a broadcast literal) or as any Column→Column weight
  * function ([[score]]), which lets a derivation-based family (e.g. the
  * driver query's md5-derived weights) replay bit-for-bit in SQL without
  * shipping 4096 literals.
  *
  * Scale: map-only — tokenize, hash, look up, mean, sigmoid; zero
  * shuffle, one scan. Empty documents score σ(bias) (an empty sum, mean
  * taken as 0 — documented, not NaN). */
object Classifier {

  /** Hashed-token bucket ids (with multiplicity) of a document —
    * the unigram sibling of `Dsir.hashedBigramBuckets`. */
  def hashedTokenBuckets(text: Column, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    transform(TextAnalysis.tokens(text),
      t => HashExpressions.md5Long(t).bitwiseAND(lit((buckets - 1).toLong)))
  }

  /** σ(bias + mean of `weightOf(bucket)` over the document's tokens),
    * `weightOf` being any per-bucket weight expression. */
  def score(text: Column, buckets: Int, bias: Double)
      (weightOf: Column => Column): Column = {
    val bs = hashedTokenBuckets(text, buckets)
    val n = size(bs)
    val logit = lit(bias) + when(n === 0, lit(0.0)).otherwise(
      aggregate(bs, lit(0.0), (acc, b) => acc + weightOf(b)) /
        n.cast("double"))
    lit(1.0) / (lit(1.0) + exp(-logit))
  }

  /** [[score]] with an explicit weight vector (length == buckets) — the
    * trained-model path; the array ships as one broadcast literal. */
  def scoreWithWeights(text: Column, weights: Array[Double],
      bias: Double): Column = {
    val wLit = array(weights.map(lit): _*)
    score(text, weights.length, bias)(b => element_at(wLit, (b + 1).cast("int")))
  }
}
