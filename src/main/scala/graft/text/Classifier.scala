package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
  * whitespace tokenization. The weight vector arrives either as an
  * explicit array ([[scoreWithWeights]], the production path: the trained
  * vector becomes a broadcast literal) or as any Column→Column weight
  * function ([[score]]), which lets a derivation-based family (e.g. the
  * driver query's md5-derived weights) replay bit-for-bit in SQL without
  * shipping 4096 literals. [[train]] produces the weight vector ON the
  * cluster — full-batch logistic regression whose per-iteration cost is
  * two aggregate passes, the distributed twin of fastText supervised
  * training for this 1-layer architecture.
  *
  * Scale (inference): map-only — tokenize, hash, look up, mean, sigmoid;
  * zero shuffle, one scan. Empty documents score σ(bias) (an empty sum,
  * mean taken as 0 — documented, not NaN). */
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

  /** Distributed training of the hashed linear classifier: full-batch
    * logistic regression by gradient descent, `iters` iterations. The
    * model (B weights + bias) is DRIVER metadata like IVF centroids — it
    * ships into each iteration as an array literal, comes back as a
    * B-row collect, and the trained vector drops straight into
    * [[scoreWithWeights]]. The forward pass matches [[score]] exactly:
    * p = σ(bias + Σ_t w[h(t)] / n_tokens).
    *
    * Per iteration, two aggregate passes over the prepared
    * (doc × distinct-bucket count) frame (built ONCE, barriered):
    *   1. per-doc logits — bucket rows look weights up in the literal,
    *      one groupBy(doc) with map-side partials (≤ 1 row/doc exchanged);
    *   2. per-bucket mean gradients g_j = Σ_d (p_d − y_d)·c_dj/n_d / N
    *      (+ the bias gradient) — one groupBy(bucket), B rows out.
    * Nothing is ever quadratic; the corpus is scanned only to build the
    * prepared frame. Empty documents carry no bucket rows but still
    * drive the bias gradient — exactly their σ(bias) inference behavior.
    *
    * Determinism: weights are quantized with the floor(x·10^d + 0.5)/10^d
    * chain after EVERY update (the kmeansRefine convention), so the
    * per-iteration model — and hence the whole trajectory — is stable
    * across layouts and engines up to summation-order noise far below
    * the quantum. Returns (weights, bias). */
  def train(docs: DataFrame, label: Column, textCol: String = "text",
      idCol: String = "doc_id", buckets: Int = 64, iters: Int = 2,
      lr: Double = 1.0, roundDecimals: Int = 9): (Array[Double], Double) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    val p = math.pow(10, roundDecimals)
    def quant(x: Double): Double = math.floor(x * p + 0.5) / p
    val bs = hashedTokenBuckets(col(textCol), buckets)
    // doc-level frame (id, y, n) and bucket-count frame (id, b, cnt):
    // both read every iteration — barrier once
    val docF = docs.select(col(idCol).cast("long").as("id"),
        label.cast("double").as("y"), size(bs).cast("double").as("n"))
      .localCheckpoint(true)
    val bucketF = docs
      .select(col(idCol).cast("long").as("id"), explode(bs).as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint(true)
    val nDocs = docF.count().toDouble
    var w = new Array[Double](buckets)
    var bias = 0.0
    for (_ <- 0 until iters) {
      val wLit = array(w.map(lit): _*)
      val featSum = bucketF
        .select(col("id"),
          (element_at(wLit, (col("b") + 1).cast("int")) * col("cnt"))
            .as("__t"))
        .groupBy(col("id")).agg(sum(col("__t")).as("__s"))
      val pd = docF.join(featSum, Seq("id"), "left")
        .select(col("id"), col("y"), col("n"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
            when(col("n") === 0, lit(0.0))
              .otherwise(coalesce(col("__s"), lit(0.0)) / col("n"))))))
            .as("p"))
        .localCheckpoint(true) // read by both gradient aggregates
      val gb = pd.agg(sum(col("p") - col("y"))).collect()(0).getDouble(0)
      val gRows = pd.join(bucketF, Seq("id"))
        .groupBy(col("b"))
        .agg(sum((col("p") - col("y")) * col("cnt") / col("n")).as("g"))
        .collect()
      val next = w.clone()
      gRows.foreach { r =>
        val j = r.getLong(0).toInt
        next(j) = quant(next(j) - lr * r.getDouble(1) / nDocs)
      }
      w = next
      bias = quant(bias - lr * gb / nDocs)
    }
    (w, bias)
  }
}
