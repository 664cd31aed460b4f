package graft.text

import graft.text.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document table (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework: BM25 and Beyond"): the standard
  * lexical relevance score for corpus search and training-data selection
  * (e.g. retrieving pre-training documents relevant to a target domain).
  *
  * Everything is relational — tokenize, explode, filter to the query's
  * terms, aggregate — so Catalyst keeps the whole pipeline in native
  * expressions with no UDFs.
  *
  * Scale design (100 TB): the explode is filtered to the query terms
  * BEFORE any aggregation, so only matching (doc, term) rows survive the
  * scan stage — the corpus itself is never shuffled in full. Document
  * frequencies and the corpus constants (N, avgdl) are tiny aggregates
  * joined back by broadcast. Top-k is `orderBy(...).limit(k)`, which
  * Spark plans as TakeOrderedAndProject — per-partition bounded heaps,
  * no global sort.
  */
object Bm25 {

  /** Per-(doc, term) BM25 term weights for `terms`, before summation:
    * (id, term, tf, dl, df, n_docs, avgdl, weight). Exposed for tests and
    * for callers composing multi-query scoring. */
  def termWeights(docs: DataFrame, terms: Seq[String],
      textCol: String, idCol: String,
      k1: Double, b: Double): DataFrame = {
    // tokens() lowercases the corpus, so terms must be lowercased here
    // too — a mixed-case term would silently match nothing
    val normTerms = terms.map(_.toLowerCase).distinct
    // one scan computes both the per-doc token stream and the per-doc
    // length; the corpus constants reuse the same dl values
    val toks = docs.select(col(idCol).as("id"),
      tokens(col(textCol)).as("__ts"))
    val dls = toks.select(col("id"), size(col("__ts")).as("dl"),
      col("__ts"))
    val stats = dls.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = dls
      .select(col("id"), col("dl"), explode(col("__ts")).as("term"))
      .filter(col("term").isin(normTerms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df(term) = #docs containing it — tf already has one row per
    // (doc, term), so a count per term is exact
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("weight",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl"))))
  }

  /** Top-k documents for a bag-of-words query, scored with BM25
    * (k1 = 1.2, b = 0.75 defaults — the standard Robertson parameters).
    * Returns (idCol, bm25, rank), rank 1-based, ties broken by ascending
    * id for determinism. Documents matching no query term score 0 and are
    * not returned.
    *
    * Scores are rounded to `scoreScale` decimals BEFORE ranking (negative
    * disables): the per-doc score is a float sum whose accumulation order
    * differs across partitionings and engines, so ranking raw doubles
    * would let sub-ulp noise flip the order of near-tied documents
    * between otherwise-identical runs. Rounded ties break on id. */
  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      k1: Double = 1.2, b: Double = 0.75,
      scoreScale: Int = 6): DataFrame = {
    require(query.nonEmpty, "empty query")
    val terms = query.map(_.toLowerCase).distinct
    val scored = termWeights(docs, terms, textCol, idCol, k1, b)
      .groupBy(col("id"))
      .agg(sum(col("weight")).as("__raw"))
      .withColumn("bm25",
        if (scoreScale >= 0) round(col("__raw"), scoreScale)
        else col("__raw"))
    // TakeOrderedAndProject keeps the global sort off the plan; the rank
    // window then runs over ≤ k rows — trivially single-partition
    scored.orderBy(col("bm25").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow
          .ordered(col("bm25").desc, col("id").asc)).cast("int"))
      .select(col("id").as(idCol), col("bm25"), col("rank"))
  }

}

/** Corpus-relative unigram language-model scoring — the shape of the
  * CCNet/KenLM perplexity quality filter (Wenzek et al. 2020) reduced
  * to a unigram model, kept separate from [[Bm25]] because the two
  * share nothing but tokenization. */
object UnigramLm {
  import TextAnalysis.tokens

  /** Per-document cross-entropy against an add-one-smoothed unigram
    * model: token probabilities are smoothed corpus frequencies,
    * P(t) = (count(t)+1)/(N+V), and a document scores the negative mean
    * log-probability of its tokens (LOW = typical text, HIGH =
    * out-of-distribution/garbled; filter on quantiles of this column).
    * `model` defaults to `docs` (score the corpus against itself); pass
    * a reference corpus to score one distribution against another.
    * Tokens unseen in the model get the smoothing floor 1/(N+V).
    * Returns (idCol, n_tokens, cross_entropy).
    *
    * Scale design: the model is ONE aggregation over the model corpus
    * (vocabulary-sized output — a dimension table); scoring joins each
    * token against it (broadcast when small, AQE decides otherwise) and
    * reduces per document with map-side partial averages — the scored
    * corpus is shuffled only as ~1 row per document. */
  def crossEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", model: DataFrame = null): DataFrame = {
    val m = Option(model).getOrElse(docs)
    val modelToks = m.select(explode(tokens(col(textCol))).as("term"))
    val counts = modelToks.groupBy(col("term"))
      .agg(count(lit(1)).as("tc"))
    val stats = counts.agg(sum(col("tc")).as("n_total"),
      count(lit(1)).as("vocab"))
    val scored = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
          (col("n_total") + col("vocab"))).as("__logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        (-avg(col("__logp"))).as("cross_entropy"))
    scored.select(col("id").as(idCol), col("n_tokens"),
      col("cross_entropy"))
  }

  /** Adjacent-token bigrams of a token array as (a, b) structs; empty for
    * docs shorter than two tokens. */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => struct(x.as("a"), y.as("b"))))

  /** Per-document cross-entropy against an interpolated BIGRAM model —
    * one LM order up from [[crossEntropy]], the KenLM-shaped quality
    * signal proper: P(b|a) = λ·C(a,b)/C(a,·) + (1−λ)·P₁(b), where
    * C(a,·) is the count of `a` as a bigram context and P₁ is the same
    * add-one unigram model `crossEntropy` uses (so an unseen context
    * falls back entirely to the unigram term — simple interpolation
    * backoff). A document scores the negative mean log-probability of
    * its ADJACENT TOKEN PAIRS; docs with fewer than two tokens emit no
    * row. LOW = fluent in-distribution text; HIGH = garbled or
    * out-of-distribution — filter on quantiles of this column.
    *
    * Scale design: three model aggregates (bigram, context, unigram) are
    * vocabulary²-bounded dimension tables built in one pass each over
    * the model corpus; scoring joins each document bigram against them
    * (broadcast when small, AQE decides otherwise) and reduces per
    * document with map-side partial averages — the scored corpus
    * shuffles only ~1 row per document past the scan. Nothing is
    * quadratic in documents.
    *
    * Cross-engine determinism: counts are exact longs; the interpolated
    * probability is one shared IEEE expression shape; only the per-doc
    * mean is reduction-order-sensitive, so callers wanting hash-stable
    * output round it (the q_bigram_ce oracle rounds to 6 decimals on
    * both sides). Default λ = 0.5 keeps both interpolation weights
    * exactly representable. */
  def bigramCrossEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", lambda: Double = 0.5,
      model: DataFrame = null): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1]: $lambda")
    val m = Option(model).getOrElse(docs)
    val toks = tokens(col(textCol))
    val modelBi = m.select(explode(bigrams(toks)).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c2"))
    val ctx = modelBi.groupBy(col("a")).agg(sum(col("c2")).as("cctx"))
    val uni = m.select(explode(toks).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val stats = uni.agg(sum(col("tc")).as("n_total"),
      count(lit(1)).as("vocab"))
    val scored = docs
      .select(col(idCol).as("id"), explode(bigrams(toks)).as("bg"))
      .select(col("id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .join(modelBi, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .join(uni, Seq("b"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"), log(
        lit(lambda) *
          coalesce(col("c2").cast("double") / col("cctx"), lit(0.0)) +
          lit(1.0 - lambda) *
          ((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
            (col("n_total") + col("vocab")))).as("__logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(col("__logp"))).as("cross_entropy"))
    scored.select(col("id").as(idCol), col("n_bigrams"),
      col("cross_entropy"))
  }

  /** Per-document cross-entropy under an interpolated KNESER-NEY bigram
    * model (Chen & Goodman 1999 — the smoothing KenLM defaults to, and
    * the reason a KenLM filter beats naive count LMs: continuation
    * probability ranks words by how many CONTEXTS they follow, not raw
    * frequency, so "francisco" stops looking fluent outside "san ~"):
    *
    *   P(b|a) = max(c(a,b) − d, 0)/c(a,·) + d·N₁₊(a,·)/c(a,·) · P_cont(b)
    *   P_cont(b) = (N₁₊(·,b) + 1) / (B + V)
    *
    * with discount `d`, N₁₊(a,·) = distinct successors of a, N₁₊(·,b) =
    * distinct predecessors of b, B = distinct bigrams, V = vocab. The
    * continuation distribution carries add-one mass so unseen words and
    * unseen contexts (which back off to P_cont alone) stay finite.
    *
    * Scale design identical to [[bigramCrossEntropy]]: the model is two
    * vocab-bounded aggregates off ONE bigram count table (never a second
    * corpus scan), scoring is three left joins + one scalar broadcast;
    * everything past the explode is ≤ |bigrams-per-doc| rows. The
    * per-doc mean is the one order-sensitive float — round the output
    * (the q_kn_ce oracle rounds to 6 on both sides). */
  def knBigramCrossEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", discount: Double = 0.75,
      model: DataFrame = null): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val m = Option(model).getOrElse(docs)
    val toks = tokens(col(textCol))
    val modelBi = m.select(explode(bigrams(toks)).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c2"))
    // both N₁₊ tables and the context totals from the ONE bigram table
    val ctx = modelBi.groupBy(col("a"))
      .agg(sum(col("c2")).as("cctx"), count(lit(1)).as("n1f"))
    val cont = modelBi.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val stats = modelBi.agg(count(lit(1)).as("n_bi"))
      .crossJoin(m.select(explode(toks).as("t")).agg(
        countDistinct(col("t")).as("vocab")))
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1.0)) /
      (col("n_bi") + col("vocab"))
    val p = when(col("cctx").isNotNull,
      greatest(coalesce(col("c2"), lit(0L)) - lit(discount), lit(0.0)) /
        col("cctx") +
        (lit(discount) * col("n1f") / col("cctx")) * pcont)
      .otherwise(pcont)
    docs.select(col(idCol).as("id"), explode(bigrams(toks)).as("bg"))
      .select(col("id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .join(modelBi, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .join(cont, Seq("b"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"), log(p).as("__logp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(col("__logp"))).as("cross_entropy"))
      .select(col("id").as(idCol), col("n_bigrams"), col("cross_entropy"))
  }

  /** CCNet perplexity bucketing (Wenzek et al. 2020): per language,
    * documents split into equal-count head / middle / tail thirds by
    * their LM score (here [[crossEntropy]] — lowest scores = most
    * fluent = head), with the published keep policy: head kept, middle
    * sampled at `middleRate` (seeded md5 uniform — reproducible), tail
    * dropped. CCNet's split is BY RANK (equal counts), so this uses
    * exact per-language rank windows rather than interpolated quantile
    * cutoffs — integer arithmetic end to end: the rank, the tertile
    * bounds ⌈n/3⌉ / ⌈2n/3⌉ (integral `div`), and the tie order
    * (ce, id) are all hash-exact cross-engine once ce is rounded to 6.
    *
    * Scale: the per-language rank is the
    * [[graft.operators.Sampling.stratumBucketRank]] two-phase plan —
    * score rows bucket by a monotone linear map of ce onto each
    * language's [min, max] range (order-aligned: equal ce ⇒ equal
    * bucket), per-(lang, bucket) counts come back to the driver, and the
    * exact window partitions by (lang, bucket) — so a dominant language
    * (English at half a 100 TB corpus) never sorts in a single task.
    * Bit-identical to the naive per-language window (a spec property).
    * With `exact = false` the tertile CUTOFFS come from an
    * `approx_percentile` sketch instead and the bucketing is map-only
    * past one sketch aggregate — the operational path at extreme scale
    * (the [[graft.text.Indexing.approxCorpusStats]] trade); bucket
    * boundaries then carry the sketch's rank tolerance, `rank` is NULL,
    * and outputs are no longer oracle-replayable (keep `exact = true`
    * when bit-exactness matters).
    *
    * NULL languages are ranked under the reserved
    * [[graft.operators.Sampling.NullStratum]] sentinel (the
    * stratifiedExactK convention) — a raw NULL key would silently drop
    * every null-lang scored doc at the tertile join (null keys never
    * equi-join). Docs with no tokens have no LM score: bucket `tail`,
    * dropped. Returns (idCol, lang, ce, rank, bucket, keep). */
  /** RHO-style learnability selection (Mindermann et al. 2022,
    * "Prioritized Training on Points that are Learnable, Worth
    * Learning, and Not Yet Learnt"; token-level successor RHO-1, Lin et
    * al. 2024): score each document by the EXCESS LOSS between a weak
    * "current" model and a stronger "reference" model and keep the top
    * `keepFraction`. Here the two models are the library's own LMs —
    * `excess_ce = unigram CE − Kneser-Ney bigram CE` (both rounded 6
    * before the difference). High excess = the stronger model explains
    * the document far better than the weak one = structured, learnable
    * text; near-zero or negative excess = either noise neither model
    * compresses or trivial text both ace — exactly the points RHO
    * deprioritizes. Swap `model` for a held-out reference corpus to
    * score against external models, the published shape.
    *
    * The keep threshold is the largest rounded excess whose
    * descending-cumulative count reaches ceil(keepFraction·n) — the
    * [[graft.operators.Sampling.keepRateThreshold]] distinct-value-grid
    * discipline: no global sort, the grid is |distinct scores|-bounded,
    * ties at the threshold all keep (so actual ≥ target). Only docs
    * with ≥ 2 tokens have both scores and are eligible. Returns
    * (idCol, n_tokens, unigram_ce, kn_ce, excess_ce, keep).
    *
    * Scale: two LM scorings (each one vocab-bounded model aggregate +
    * per-token joins reducing map-side to 1 row/doc), one id-keyed
    * join, a grid aggregate, one broadcast threshold join. */
  /** Min-K% Prob membership / memorization audit (Shi et al. 2023,
    * "Detecting Pretraining Data from Large Language Models"): a
    * document's score is the MEAN LOG-PROBABILITY OF ITS k% LEAST
    * PROBABLE TOKENS under a language model. The insight: a true
    * non-member contains some genuinely surprising tokens, so its
    * bottom-k% mean is very negative; text the model has memorized is
    * suspiciously probable EVEN at its rarest tokens — a HIGH (less
    * negative) min-k score flags likely training-set members,
    * benchmark leakage, or verbatim memorization. This is the
    * model-side complement of the n-gram decontamination pair: n-gram
    * overlap needs the benchmark text in hand; min-k% prob audits
    * against the MODEL when the suspect reference corpus is
    * unavailable.
    *
    * The published method reads the target LLM's token logprobs; this
    * operationalizes the same statistic with the library's add-one
    * unigram LM ([[crossEntropy]]'s model — swap `model` for any
    * (term, tc) table to audit against another distribution). Scores
    * are comparable ONLY within one run; calibrate `threshold` on
    * known non-members (the paper reports AUC over known splits).
    *
    * Determinism: logp is one shared IEEE expression; the bottom-k
    * selection is `slice(sort_array(per-doc logp list), 1, k)` and the
    * mean folds that slice in sorted order — accumulation order fixed,
    * so the oracle hash-matches (DuckDB `list_sort` + ordered
    * `list_sum`). Per-doc state is the doc's own token list (the
    * charEntropy sorted-run-fold posture — bounded by document length,
    * never corpus-sized). One vocab-bounded model aggregate, one token
    * join, one per-doc aggregate: ~1 row per document past the scan.
    *
    * Returns (idCol, n_tokens, k_tokens, min_k_logprob [mean, rounded
    * 6], suspect [min_k_logprob ≥ threshold]); empty docs emit no row.
    * `minKFrac` defaults to the paper's k = 20%. */
  def minKProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minKFrac: Double = 0.2,
      threshold: Double = -6.5, model: DataFrame = null): DataFrame = {
    require(minKFrac > 0 && minKFrac <= 1,
      s"minKFrac must be in (0, 1], got $minKFrac")
    val m = Option(model).getOrElse(docs)
    val counts = m.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tc"))
    val stats = counts.agg(sum(col("tc")).as("n_total"),
      count(lit(1)).as("vocab"))
    val perDoc = docs
      .select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .join(counts, Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
          (col("n_total") + col("vocab"))).as("__logp"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("__logp"))).as("__lps"))
    val n = size(col("__lps"))
    val kTok = greatest(lit(1L),
      ceil(lit(minKFrac) * n.cast("double") - lit(1e-9)).cast("long"))
    val kSlice = slice(col("__lps"), lit(1), kTok.cast("int"))
    val meanK = aggregate(kSlice, lit(0.0), (acc, x) => acc + x) /
      kTok.cast("double")
    perDoc.select(col("id").as(idCol),
        n.cast("long").as("n_tokens"),
        kTok.as("k_tokens"),
        round(meanK, 6).as("min_k_logprob"))
      .withColumn("suspect", col("min_k_logprob") >= threshold)
  }

  def learnabilitySelect(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", keepFraction: Double = 0.5,
      discount: Double = 0.75, model: DataFrame = null): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    val u = crossEntropy(docs, textCol, idCol, model)
      .select(col(idCol), col("n_tokens"),
        round(col("cross_entropy"), 6).as("unigram_ce"))
    val k = knBigramCrossEntropy(docs, textCol, idCol, discount, model)
      .select(col(idCol), round(col("cross_entropy"), 6).as("kn_ce"))
    // barrier: the scored frame feeds BOTH the threshold grid and the
    // final keep projection — without it the two LM chains run twice
    val scored = u.join(k, Seq(idCol))
      .withColumn("excess_ce",
        round(col("unigram_ce") - col("kn_ce"), 6))
      .localCheckpoint(true)
    val grid = scored.groupBy(col("excess_ce").as("__s"))
      .agg(count(lit(1)).as("__c"))
    // cumulative over the DISTINCT 6-decimal score grid — bounded by
    // the value resolution (≤ range/1e-6 rows), never the corpus
    val w = graft.functions.BoundedWindow.ordered(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = grid.withColumn("__cum", sum(col("__c")).over(w))
    val tot = grid.groupBy().agg(sum(col("__c")).as("__n"))
    val thr = cum.crossJoin(broadcast(tot))
      .filter(col("__cum") >=
        ceil(lit(keepFraction) * col("__n").cast("double")).cast("long"))
      .groupBy().agg(max(col("__s")).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .select(col(idCol), col("n_tokens"), col("unigram_ce"),
        col("kn_ce"), col("excess_ce"),
        (col("excess_ce") >= col("__thr")).as("keep"))
  }

  def perplexityBuckets(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text", idCol: String = "doc_id",
      middleRate: Double = 0.5, seed: Long = 42L,
      model: DataFrame = null, exact: Boolean = true,
      nBuckets: Int = 1024): DataFrame = {
    val ce = crossEntropy(docs, textCol, idCol, model)
      .select(col(idCol), round(col("cross_entropy"), 6).as("ce"))
    // one row per doc (id, lang, ce) — barriered because the two-phase
    // rank (or the sketch) plus the scoreless branch read it repeatedly,
    // and recomputing means re-exploding the corpus each time
    val scored = docs.select(col(idCol),
        coalesce(col(langCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("lang"))
      .join(ce, Seq(idCol), "left")
      .localCheckpoint(true)
    val withCe = scored.filter(col("ce").isNotNull)
    val bucketed =
      if (exact) {
        // order-aligned bucket: monotone linear map of ce onto the
        // language's [min, max] span (broadcast |langs|-row dimension);
        // equal ce ⇒ equal bucket, so (ce, id) ties stay inside a bucket
        val span = broadcast(withCe.groupBy(col("lang"))
          .agg(min(col("ce")).as("__lo"), max(col("ce")).as("__hi")))
        val keyed = withCe.join(span, Seq("lang"))
          .withColumn("__b",
            when(col("__hi") === col("__lo"), lit(0L))
              .otherwise(least(lit(nBuckets - 1),
                floor((col("ce") - col("__lo")) /
                  (col("__hi") - col("__lo")) * nBuckets)).cast("long")))
          .drop("__lo", "__hi")
        val ranked = graft.operators.Sampling.stratumBucketRank(
            keyed, "lang", "__b", Seq(col("ce"), col(idCol)), "rank")
          .drop("__b")
        val nPer = broadcast(ranked.groupBy(col("lang"))
          .agg(count(lit(1)).as("__n")))
        ranked.join(nPer, Seq("lang"))
          .withColumn("bucket",
            when(col("rank") <= expr("(__n + 2) div 3"), lit("head"))
              .when(col("rank") <= expr("(2 * __n + 2) div 3"),
                lit("middle"))
              .otherwise(lit("tail")))
          .drop("__n")
      } else {
        // approx path: per-language tertile cutoffs from ONE
        // approx_percentile sketch aggregate, then map-only bucketing;
        // no rank exists (the sketch orders nothing)
        val cuts = broadcast(withCe.groupBy(col("lang"))
          .agg(percentile_approx(col("ce"),
            array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("__c")))
        withCe.join(cuts, Seq("lang"))
          .withColumn("bucket",
            when(col("ce") <= col("__c").getItem(0), lit("head"))
              .when(col("ce") <= col("__c").getItem(1), lit("middle"))
              .otherwise(lit("tail")))
          .withColumn("rank", lit(null).cast("long"))
          .drop("__c")
      }
    val scoreless = scored.filter(col("ce").isNull)
      .withColumn("rank", lit(null).cast("long"))
      .withColumn("bucket", lit("tail"))
    bucketed.unionByName(scoreless)
      .withColumn("keep",
        when(col("bucket") === "head", lit(true))
          .when(col("bucket") === "middle",
            graft.operators.Sampling.hashUniform(col(idCol), seed) <
              middleRate)
          .otherwise(lit(false)))
      .select(col(idCol), col("lang"), col("ce"), col("rank"),
        col("bucket"), col("keep"))
  }
}
