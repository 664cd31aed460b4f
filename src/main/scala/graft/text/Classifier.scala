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
      lr: Double = 1.0, roundDecimals: Int = 9): (Array[Double], Double) =
    trainTrajectory(docs, label, textCol, idCol, buckets, iters, lr,
      roundDecimals).last

  /** [[train]], returning the WHOLE quantized trajectory — the
    * post-update (weights, bias) snapshot after every iteration
    * (`result.last` is what [[train]] returns). The per-iteration
    * quantization makes each snapshot engine-exact, so the trajectory is
    * a deterministic artifact downstream operators can replay —
    * [[cartography]] scores every epoch's model from it. */
  def trainTrajectory(docs: DataFrame, label: Column,
      textCol: String = "text", idCol: String = "doc_id",
      buckets: Int = 64, iters: Int = 2, lr: Double = 1.0,
      roundDecimals: Int = 9): Seq[(Array[Double], Double)] = {
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
    val trajectory = Seq.newBuilder[(Array[Double], Double)]
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
      // bias + bucket gradients in ONE collect (the bias row rides the
      // same job under the reserved bucket id −1): same two aggregates,
      // same values — one driver round-trip per iteration instead of two
      val gRows = pd.join(bucketF, Seq("id"))
        .groupBy(col("b"))
        .agg(sum((col("p") - col("y")) * col("cnt") / col("n")).as("g"))
        .unionByName(pd.agg(sum(col("p") - col("y")).as("g"))
          .select(lit(-1L).as("b"), col("g")))
        .collect()
      var gb = 0.0
      val next = w.clone()
      gRows.foreach { r =>
        val j = r.getLong(0)
        if (j < 0) gb = r.getDouble(1)
        else next(j.toInt) = quant(next(j.toInt) - lr * r.getDouble(1) / nDocs)
      }
      w = next
      bias = quant(bias - lr * gb / nDocs)
      trajectory += ((w, bias))
    }
    trajectory.result()
  }

  /** Gradient-alignment data selection (the LESS / influence-function
    * recipe specialized to this 1-layer architecture, Xia et al. 2024 /
    * Pruthi et al. 2020 TracIn): score every training example by the dot
    * product of ITS loss gradient with the TARGET SET's mean gradient
    * under a trained model — one gradient-descent step on a positively-
    * aligned example reduces target loss (Δℓ_target ≈ −η·⟨g_d, ḡ⟩), so
    * ranking by `alignment` desc picks the most target-relevant training
    * data. For the hashed LR model the example gradient is
    * `(p_d − y_d)·[x_d ; 1]` with `x_d` the mean-pooled bucket vector,
    * so the score needs no per-example vector materialization:
    * `a_d = (p_d − y_d)·(Σ_b ḡ[b]·c_db/n_d + ḡ_bias)`.
    *
    * Scale design: the target pass is the training gradient aggregate
    * (B+1 rows to the driver, quantized 1e-9 like the weight trajectory
    * — ḡ is MODEL-side metadata); the train pass is the inference plan
    * (one tokenize scan, one groupBy(doc) over bucket rows with the ḡ
    * AND weight literals looked up in the same pass) — nothing scales
    * with |target| at score time and the corpus is never joined against
    * the target set. Output: (idCol, y, alignment), rounded to 6. */
  def gradientAlignment(train: DataFrame, target: DataFrame,
      weights: Array[Double], bias: Double, label: Column,
      textCol: String = "text", idCol: String = "doc_id",
      roundDecimals: Int = 9): DataFrame = {
    val buckets = weights.length
    val p = math.pow(10, roundDecimals)
    def quant(x: Double): Double = math.floor(x * p + 0.5) / p
    val bs = hashedTokenBuckets(col(textCol), buckets)
    def prepared(docs: DataFrame): (DataFrame, DataFrame) = {
      val docF = docs.select(col(idCol).cast("long").as("id"),
        label.cast("double").as("y"), size(bs).cast("double").as("n"))
      val bucketF = docs
        .select(col(idCol).cast("long").as("id"), explode(bs).as("b"))
        .groupBy(col("id"), col("b"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      (docF, bucketF)
    }
    val wLit = array(weights.map(lit): _*)
    def scoredOf(docF: DataFrame, bucketF: DataFrame): DataFrame = {
      val featSum = bucketF
        .select(col("id"),
          (element_at(wLit, (col("b") + 1).cast("int")) * col("cnt"))
            .as("__t"))
        .groupBy(col("id")).agg(sum(col("__t")).as("__s"))
      docF.join(featSum, Seq("id"), "left")
        .select(col("id"), col("y"), col("n"),
          (lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
            when(col("n") === 0, lit(0.0))
              .otherwise(coalesce(col("__s"), lit(0.0)) / col("n"))))))
            .as("p"))
    }
    // target mean gradient ḡ — (B+1)-dim model-side metadata, quantized.
    // Target count, bias gradient and bucket gradients all ride ONE
    // collect (reserved bucket ids −2/−1): same aggregates, same values,
    // one driver round-trip instead of three.
    val (tDocF, tBucketF) = prepared(target)
    val tScored = scoredOf(tDocF, tBucketF).localCheckpoint(true)
    val gRows = tScored.join(tBucketF, Seq("id"))
      .groupBy(col("b"))
      .agg(sum((col("p") - col("y")) * col("cnt") / col("n")).as("g"))
      .unionByName(tScored
        .agg(sum(col("p") - col("y")).as("__sb"),
          count(lit(1)).cast("double").as("__n"))
        .select(lit(-1L).as("b"), col("__sb").as("g"))
        .unionByName(tScored
          .agg(count(lit(1)).cast("double").as("g"))
          .select(lit(-2L).as("b"), col("g"))))
      .collect()
    val nT = gRows.find(_.getLong(0) == -2L).map(_.getDouble(1)).getOrElse(0.0)
    require(nT > 0, "empty target set")
    val gBias = quant(
      gRows.find(_.getLong(0) == -1L).map(_.getDouble(1)).get / nT)
    val gBar = new Array[Double](buckets)
    gRows.filter(_.getLong(0) >= 0)
      .foreach(r => gBar(r.getLong(0).toInt) = quant(r.getDouble(1) / nT))
    // train pass: alignment = (p − y)·(Σ_b ḡ[b]·c/n + ḡ_bias), map-side
    val gLit = array(gBar.map(lit): _*)
    val (dF, bF) = prepared(train)
    val gSum = bF
      .select(col("id"),
        (element_at(wLit, (col("b") + 1).cast("int")) * col("cnt"))
          .as("__t"),
        (element_at(gLit, (col("b") + 1).cast("int")) * col("cnt"))
          .as("__gt"))
      .groupBy(col("id"))
      .agg(sum(col("__t")).as("__s"), sum(col("__gt")).as("__gs"))
    dF.join(gSum, Seq("id"), "left")
      .select(col("id").as(idCol), col("y").cast("int").as("y"),
        round((lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
            when(col("n") === 0, lit(0.0))
              .otherwise(coalesce(col("__s"), lit(0.0)) / col("n")))))
          - col("y")) *
          (when(col("n") === 0, lit(0.0))
            .otherwise(coalesce(col("__gs"), lit(0.0)) / col("n")) +
            lit(gBias)), 6).as("alignment"))
  }

  /** Dataset cartography (Swayamdipta et al. 2020): per-example training
    * dynamics over the epochs of a [[trainTrajectory]] run —
    *
    *   - `confidence`  — mean over epochs of the model's probability on
    *                     the GOLD label (p if y=1 else 1−p)
    *   - `variability` — population std of that probability
    *   - `correctness` — fraction of epochs the prediction (p ≥ 0.5) was
    *                     right
    *
    * High-confidence/low-variability examples are easy-to-learn (safe to
    * downsample), low-confidence ones hard-to-learn (often label noise —
    * audit before training), high-variability ones ambiguous (the
    * highest-value training data) — the standard data-map triage for a
    * labeled corpus.
    *
    * Scale design: the corpus is tokenized ONCE into the same
    * (doc × distinct-bucket count) frame training uses; ONE
    * groupBy(doc) computes every epoch's feature sum in the same pass
    * (T sums per row, weight vectors broadcast as literals), then the
    * epoch scores and all three statistics are map-only arithmetic —
    * shuffle count independent of T.
    *
    * Exactness: each epoch probability is quantized to INTEGER
    * micro-units u = floor(p·10⁶ + 0.5) immediately; mean/std/
    * correctness are then integer sums — std via
    * sqrt(T·Σu² − (Σu)²)/(T·10⁶), exact under 2⁵³ — so every output is
    * one rounded expression over exact integers (prediction compares
    * u ≥ 500000, i.e. ON the grid). Engine-/layout-stable modulo the
    * ~1e-16 feature-sum noise far below the micro quantum (the
    * [[train]] acceptance argument). */
  def cartography(docs: DataFrame, label: Column,
      trajectory: Seq[(Array[Double], Double)], textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(trajectory.nonEmpty, "empty trajectory")
    val t = trajectory.size
    val buckets = trajectory.head._1.length
    val bs = hashedTokenBuckets(col(textCol), buckets)
    val docF = docs.select(col(idCol).cast("long").as("id"),
      label.cast("int").as("y"), size(bs).cast("double").as("n"))
    val bucketF = docs
      .select(col(idCol).cast("long").as("id"), explode(bs).as("b"))
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    // every epoch's feature sum in ONE aggregate pass
    val sums = bucketF
      .select(col("id") +: trajectory.zipWithIndex.map { case ((w, _), i) =>
        (element_at(array(w.map(lit): _*), (col("b") + 1).cast("int")) *
          col("cnt")).as(s"__t$i")
      }: _*)
      .groupBy(col("id"))
      .agg(sum(col("__t0")).as("__s0"),
        (1 until t).map(i => sum(col(s"__t$i")).as(s"__s$i")): _*)
    val scored = docF.join(sums, Seq("id"), "left")
    // per-epoch gold-label probability in micro-units (integer)
    val us = trajectory.zipWithIndex.map { case ((_, b), i) =>
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(b) +
        when(col("n") === 0, lit(0.0))
          .otherwise(coalesce(col(s"__s$i"), lit(0.0)) / col("n")))))
      val u = floor(p * 1000000.0 + lit(0.5)).cast("long")
      (when(col("y") === 1, u).otherwise(lit(1000000L) - u),
        when((u >= 500000L) === (col("y") === 1), 1L).otherwise(0L))
    }
    val su = us.map(_._1).reduce(_ + _)
    val su2 = us.map(x => x._1 * x._1).reduce(_ + _)
    val nc = us.map(_._2).reduce(_ + _)
    scored.select(col("id").as(idCol), col("y"),
      lit(t.toLong).as("n_epochs"),
      round(su.cast("double") / (t * 1000000.0), 6).as("confidence"),
      round(sqrt((lit(t.toLong) * su2 - su * su).cast("double")) /
        (t * 1000000.0), 6).as("variability"),
      round(nc.cast("double") / t, 6).as("correctness"))
  }
}
