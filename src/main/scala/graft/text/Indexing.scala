package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus indexing primitives over a document table: heavy-hitter term
  * statistics and inverted-index (posting list) construction — the build
  * side of a search/retrieval stack (BM25 scoring over the same stats
  * lives in [[Bm25]]).
  *
  * Tokenization is the shared whitespace contract used by every text
  * operator ([[TextAnalysis.tokens]]: split(trim(lower(text)), "\\s+"),
  * empty-text → no tokens), so the DuckDB oracles replay it verbatim.
  *
  * Scale design: both operators are one explode (map-only, linear in
  * corpus tokens) followed by ONE aggregation exchange keyed on the term.
  * Heavy hitters finish with a TakeOrderedAndProject (top-k never sorts
  * the full term table); posting lists are per-term rows whose width is
  * CAPPED (`maxPostings`) so a stop-word's million-doc posting list
  * cannot materialize a single fat row — its df/tf stay exact (they are
  * plain aggregates) while the stored postings truncate to the first
  * `maxPostings` doc ids, the standard impact-ordered-prefix trade. */
object Indexing {

  private def termDoc(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)

  /** Top-`k` most frequent terms corpus-wide: (term, tf, df, rank) where
    * tf counts occurrences and df counts distinct documents. Exact — the
    * per-term partial counts combine map-side, and only k rows pass the
    * final ordering (count-min-sketch alternatives trade that exactness
    * for one fewer exchange; at one bigint per distinct term the exact
    * aggregate is the right default even at 100 TB). Rank ties break on
    * ascending term for determinism. */
  def topKTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    termDoc(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(graft.functions.BoundedWindow
          .ordered(col("tf").desc, col("term").asc)).cast("long"))
  }

  /** Inverted index: one row per term with exact document frequency,
    * exact total term frequency, and the posting list of the first
    * `maxPostings` doc ids (ascending, comma-joined — a bounded, sortable
    * representation). `minDf` drops the hapax tail (terms in fewer docs),
    * the usual index-size/recall trade. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, maxPostings: Int = 20): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    // per-(term, doc) tf first: the explode collapses to one row per
    // (term, doc) in the FIRST exchange, so the term-level aggregate
    // sees df-many rows per term, not tf-many
    val td = termDoc(docs, idCol, textCol)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("__tf"))
    // postings via the bounded-heap top-k aggregate with a CONSTANT
    // score: ties break on ascending id, so it keeps exactly the
    // maxPostings lowest doc ids with ≤ maxPostings entries of state per
    // map partition — a stop word's million-doc posting list never
    // materializes anywhere (collect_list-then-slice would build the
    // full fat row first)
    td.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("__tf")).as("tf"),
        array_join(
          transform(
            graft.functions.TopKExpressions
              .topKByScore(lit(0.0), col("doc_id"), maxPostings),
            s => s.getField("neighbor_id")),
          ",").as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Tokenizer fertility per language — the standard tokenizer-quality
    * diagnostic for multilingual corpora: characters per (BPE-ish) token
    * by language. High fertility = the tokenizer fragments that language
    * into short pieces (under-trained vocabulary), the signal used to
    * rebalance tokenizer training mixes. One map-only stats pass + ONE
    * aggregation exchange keyed on the |languages|-sized key; every
    * ratio divides exact integer sums, so the output is deterministic to
    * the last bit before its display rounding. NULL languages aggregate
    * under the reserved [[graft.operators.Sampling.NullStratum]]
    * sentinel instead of silently forming a NULL key.
    *
    * Returns (lang, n_docs, total_chars, total_tokens, chars_per_token,
    * tokens_per_doc). */
  def tokenizerFertility(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame =
    docs.select(
        coalesce(col(langCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("lang"),
        length(col(textCol)).cast("long").as("__chars"),
        TextAnalysis.bpeTokenCount(col(textCol)).cast("long").as("__toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("total_chars"),
        sum(col("__toks")).as("total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_chars"),
        col("total_tokens"),
        when(col("total_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(col("total_chars").cast("double") /
            col("total_tokens"), 6)).as("chars_per_token"),
        round(col("total_tokens").cast("double") / col("n_docs"), 6)
          .as("tokens_per_doc"))

  /** Sparse all-pairs TF-IDF cosine similarity above a threshold — the
    * lexical (bag-of-words) counterpart of the embedding near-dup pairs:
    * finds document pairs whose PRUNED tf-idf vectors point the same way,
    * without ever materializing dense vectors or comparing all O(n²)
    * pairs.
    *
    * Pipeline: per-(term, doc) tf → per-term df → PRUNE terms with
    * df > `maxDf` or df < `minDf` → weight w = tf · ln(N/df) → per-doc
    * norm over the kept vocabulary → postings self-join on term
    * (id_a < id_b) → one aggregate per pair sums the dot product →
    * cosine = dot/(norm_a·norm_b), thresholded on the ROUNDED value so an
    * engine's last-ulp noise can't flip a boundary pair.
    *
    * Scale design (the classic all-pairs-similarity bound): candidate
    * pair work is Σ_term df², and with df capped at `maxDf` that is
    * ≤ maxDf · Σ_term df = maxDf · (total corpus tokens) — LINEAR in the
    * corpus for a constant cap. The cap is also semantically right:
    * stopword-frequency terms carry idf ≈ 0 and contribute nothing to
    * cosine, so pruning them changes little but removes exactly the
    * terms whose df² explodes (a 10⁸-doc stopword would otherwise emit
    * 10¹⁶ candidate rows). Per-term skew inside the cap is AQE's
    * skew-join case. Documents whose kept vocabulary is empty have no
    * norm and appear in no pair (they have no tf-idf direction).
    *
    * Returns (id_a, id_b, cosine) with cosine rounded to 6. */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Long, minDf: Long = 1L): DataFrame = {
    require(threshold >= 0 && threshold <= 1,
      s"threshold must be in [0,1]: $threshold")
    require(minDf >= 1 && maxDf >= minDf,
      s"bad df bounds [$minDf, $maxDf]")
    val td = termDoc(docs, idCol, textCol)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // inner join = the vocabulary prune; idf on the broadcast N
    val w = td.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("doc_id"),
        (col("tf") * log(col("n_docs").cast("double") / col("df")))
          .as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val pairs = w.as("a")
      .join(w.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    pairs
      .join(norms.select(col("doc_id").as("id_a"),
        col("norm").as("__na")), Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"),
        col("norm").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (col("__na") * col("__nb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Per-source Zipf slope — the corpus-health diagnostic that flags
    * unnatural term distributions (natural language follows Zipf's law
    * with slope ≈ −1 of ln(freq) vs ln(rank); template/machine-generated
    * text flattens or steepens it): ordinary-least-squares slope over
    * the top-`k` term frequencies of each source.
    *
    * Scale design: per-(source, term) counts aggregate once (map-side
    * partials), then the top-k FREQUENCIES per source ride the bounded-
    * heap top-k aggregate — ≤ k doubles of state per source per
    * partition, never a per-source rank window (the single-task-stratum
    * trap). Only frequencies matter for the slope, so equal-count tie
    * order is irrelevant (the (rank → count) sequence is tie-invariant).
    * The OLS sums fold the ordered array left-to-right — deterministic —
    * and the slope rounds to 6.
    *
    * Returns (source, n_terms_ranked, zipf_slope); sources with < 2
    * ranked terms emit a NULL slope. */
  def zipfSlope(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val counts = termDoc(docs, sourceCol, textCol)
      .withColumnRenamed("doc_id", "source")
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val tops = counts.groupBy(col("source"))
      .agg(transform(
        graft.functions.TopKExpressions.topKByScore(
          col("c").cast("double"),
          graft.functions.HashExpressions.md5Long(col("term")), k),
        s => s.getField("cosine")).as("__cs"))
    // OLS over (x=ln(rank), y=ln(count)) in rank order: one sequential
    // fold builds all four sums, so the float accumulation order is
    // fixed on every engine
    val n = size(col("__cs")).cast("double")
    def fold(f: (Column, Column) => Column): Column =
      aggregate(zip_with(sequence(lit(1), size(col("__cs"))), col("__cs"),
        (r, c) => struct(log(r.cast("double")).as("x"), log(c).as("y"))),
        lit(0.0), (acc, p) => acc + f(p.getField("x"), p.getField("y")))
    val sx = fold((x, _) => x)
    val sy = fold((_, y) => y)
    val sxy = fold((x, y) => x * y)
    val sxx = fold((x, _) => x * x)
    tops.select(col("source"),
      size(col("__cs")).cast("long").as("n_terms_ranked"),
      when(size(col("__cs")) < 2, lit(null).cast("double"))
        .otherwise(round(
          (n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
        .as("zipf_slope"))
  }

  /** Vocabulary coverage curve — the tokenizer-budget planning table:
    * for each candidate vocabulary size k, the fraction of ALL corpus
    * token occurrences covered by the k most frequent terms (the
    * complement is the OOV/byte-fallback rate a word-level vocab of
    * that size would pay). Zipfian text covers ~90%+ with a few
    * thousand terms; the curve's knee is where growing the vocab stops
    * paying.
    *
    * One exact term-count aggregate; only the top `max(checkpoints)`
    * terms matter (every checkpoint row reads ranks ≤ its k), so the
    * vocabulary first narrows through a distributed
    * `orderBy().limit(kMax)` (TakeOrderedAndProject — bounded-heap
    * partials, never a full-vocab sort), and the exact rank + running
    * token sum over the survivors use the two-phase bucket-offset plan
    * (the [[graft.operators.Sampling.stratumBucketRank]] idiom):
    * per-tf-class row counts collect to the driver (≤ kMax rows of
    * metadata), exclusive row/token prefix offsets broadcast back, and
    * the window runs PARTITIONED BY the tf class — within a class every
    * row adds the same tf, so the running sum is
    * `token_offset + row_number·tf`, bit-identical to the global
    * cumulative window it replaces. No unpartitioned window anywhere;
    * the largest single-task sort is one tf-class of the top-kMax
    * table. All integers except the final rounded division.
    * Returns (vocab_size, n_terms, tokens_covered, total_tokens,
    * coverage) per checkpoint; `n_terms = min(k, V)`. */
  def vocabCoverage(docs: DataFrame, checkpoints: Seq[Int],
      textCol: String = "text"): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ >= 1),
      s"checkpoints must be >= 1: $checkpoints")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val kMax = checkpoints.max
    // barrier: the top-kMax table feeds the driver histogram AND the
    // ranked join below
    val top = counts.orderBy(col("tf").desc, col("term").asc)
      .limit(kMax).localCheckpoint(true)
    // Phase A: per-tf-class counts -> exclusive row/token offsets in
    // (tf DESC) order — ≤ kMax rows of driver metadata
    val hist = top.groupBy(col("tf")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    var rowAcc = 0L
    var tokAcc = 0L
    val offsets = hist.map { case (tf, nRows) =>
      val o = (tf, rowAcc, tokAcc)
      rowAcc += nRows
      tokAcc += nRows * tf
      o
    }.toSeq
    val offDf = broadcast(offsets.toDF("tf", "__ro", "__to"))
    // Phase B: exact window PARTITIONED BY the tf class
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tf")).orderBy(col("term").asc)
    val ranked = top.join(offDf, Seq("tf"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__rk", col("__ro") + col("__rn"))
      .withColumn("__cum", col("__to") + col("__rn") * col("tf"))
    val tot = counts.groupBy().agg(sum(col("tf")).as("total_tokens"))
    val ck = broadcast(checkpoints.distinct.sorted.map(_.toLong)
      .toDF("vocab_size"))
    ranked.join(ck, col("__rk") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(max(col("__rk")).as("n_terms"),
        max(col("__cum")).as("tokens_covered"))
      .crossJoin(broadcast(tot))
      .select(col("vocab_size"), col("n_terms"), col("tokens_covered"),
        col("total_tokens"),
        round(col("tokens_covered").cast("double") /
          col("total_tokens"), 6).as("coverage"))
  }

  /** Per-stratum top-k terms: the heavy-hitter table sliced by source /
    * language / snapshot — "what does each slice of the corpus talk
    * about", the vocabulary summary a mixture recipe review starts
    * from. One exact (stratum, term) count aggregate (map-side
    * partials), then the rank window runs over the VOCAB×S-bounded
    * count table — never the corpus (the zipfSlope posture; its
    * bounded-heap trick is unavailable here because the TERM must
    * survive, not just its count). Ties break on ascending term. NULL
    * strata report under [[graft.operators.Sampling.NullStratum]].
    * Returns (stratum, rank, term, tf). */
  def topKTermsByStratum(docs: DataFrame, stratumCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = docs
      .select(coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("stratum"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(col("tf").desc, col("term").asc)
    counts.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("stratum"), col("rank"), col("term"), col("tf"))
  }

  /** The CMS row hash: md5 of `term|d` masked to the power-of-two
    * width — shared by the batch sketch and its streaming twin. */
  private[graft] def cmsBucket(t: Column, d: Int, width: Int): Column =
    graft.functions.HashExpressions.md5Long(
      concat(t, lit("|"), lit(d.toString)))
      .bitwiseAND(lit((width - 1).toLong))

  /** Count-Min-Sketch top-k terms — the BOUNDED-MEMORY scale path of
    * the exact heavy-hitter aggregate (Cormode & Muthukrishnan 2005):
    * term occurrences hash into a depth×width counter grid (depth
    * independent hash rows; power-of-two width), and a term's estimate
    * is the MIN of its depth counters — an OVERESTIMATE by at most
    * ~εN = (e/width)·N with probability 1−(1/2)^depth, never an
    * underestimate. The counter state is depth·width integers TOTAL
    * regardless of vocabulary size — the sketch a 100 TB stream keeps
    * when the exact per-term table (one bigint per distinct term)
    * stops fitting.
    *
    * Plan: one token scan exploded ×depth (map-only), ONE
    * (depth, bucket)-keyed count aggregate whose output is the bounded
    * grid, then the distinct-term table probes the grid with depth
    * broadcast joins folded into one (term, d, bucket) join + min
    * aggregate. The final top-k is a distributed
    * `orderBy(est DESC, term).limit(k)` (TakeOrderedAndProject —
    * bounded-heap partials), and only the ≤ k survivors pass through
    * the post-limit rank window. Deterministic end-to-end (md5 bucket
    * hashing,
    * integer counters), so the oracle replays it exactly — the rare
    * sketch that hash-matches cross-engine. */
  def cmsTopK(docs: DataFrame, k: Int, depth: Int = 4,
      width: Int = 1024, textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8]: $depth")
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    def bucket(t: Column, d: Int): Column = cmsBucket(t, d, width)
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val rows = toks.select(col("term"), explode(array(
      (0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(col("term"), d).as("b"))): _*))
      .as("__db"))
      .select(col("term"), col("__db.d").as("d"), col("__db.b").as("b"))
    val counters = rows.groupBy(col("d"), col("b"))
      .agg(count(lit(1)).as("__c"))
    val probes = rows.distinct()
    val est = probes.join(counters, Seq("d", "b"))
      .groupBy(col("term")).agg(min(col("__c")).as("est"))
    // top-k via distributed TakeOrderedAndProject (the topKTerms
    // idiom) — never a rank over the full estimate table, which would
    // defeat the sketch's bounded-memory purpose at the last step; the
    // rank window runs over the ≤ k post-limit rows
    est.orderBy(col("est").desc, col("term").asc).limit(k)
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow
          .ordered(col("est").desc, col("term").asc)).cast("int"))
      .select(col("rank"), col("term"), col("est"))
  }

  /** Heaps-law vocabulary growth (Heaps 1978): distinct-vocabulary size
    * as a function of cumulative corpus tokens, sampled at `checkpoints`
    * equal doc-id cutoffs, plus the fitted Heaps exponent —
    * `V(n) ≈ k·n^β` (natural text: β ≈ 0.4–0.6; template/duplicated
    * corpora flatten β, OCR noise / concatenated-language corpora
    * inflate it — the corpus-health sibling of [[zipfSlope]]). The
    * ingestion order is the ascending `idCol` (the corpus's canonical
    * order), so the curve is deterministic.
    *
    * Scale design: no windows and nothing per-doc ever sorts — a term's
    * FIRST-SEEN position is `min(doc_id)` (one vocab-keyed aggregate
    * with map-side partials), and each cutoff's totals come from a
    * broadcast ≤`checkpoints`-row nested-loop join whose output
    * collapses map-side to `checkpoints` rows per partition. The OLS fit
    * of ln V on ln n runs over the collected ≤`checkpoints`-point table
    * with the [[zipfSlope]] ordered-fold idiom (float accumulation order
    * fixed), and `heaps_k = exp(ȳ − β·x̄)`.
    *
    * Returns one row per checkpoint: (checkpoint, cutoff_doc_id, n_docs,
    * cum_tokens, vocab, heaps_beta, heaps_k) — beta/k repeated on every
    * row (points with zero tokens or vocab are excluded from the fit;
    * NULL beta/k when < 2 points remain). */
  def heapsGrowth(docs: DataFrame, checkpoints: Int = 10,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(checkpoints >= 2,
      s"checkpoints must be >= 2, got $checkpoints")
    val spark = docs.sparkSession
    import spark.implicits._
    val maxId = docs.agg(max(col(idCol).cast("long"))).head().getLong(0)
    val ck = broadcast((1 to checkpoints).map(i =>
        (i.toLong, i.toLong * maxId / checkpoints))
      .toDF("checkpoint", "cutoff_doc_id"))
    val docTok = docs.select(col(idCol).cast("long").as("__id"),
      TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("__n"))
    val cumTok = ck.join(docTok, col("__id") <= col("cutoff_doc_id"),
        "left")
      .groupBy(col("checkpoint"), col("cutoff_doc_id"))
      .agg(count(col("__id")).as("n_docs"),
        coalesce(sum(col("__n")), lit(0L)).as("cum_tokens"))
    val firstSeen = termDoc(docs, idCol, textCol)
      .groupBy(col("term")).agg(min(col("doc_id")).as("__fd"))
    val cumVocab = ck.join(firstSeen, col("__fd") <= col("cutoff_doc_id"),
        "left")
      .groupBy(col("checkpoint"))
      .agg(count(col("term")).as("vocab"))
    val growth = cumTok.join(cumVocab, Seq("checkpoint"))
    // OLS of y = ln(vocab) on x = ln(cum_tokens) over the ≤P positive
    // points, folded in checkpoint order so float accumulation is fixed
    val pts = growth.filter(col("cum_tokens") > 0 && col("vocab") > 0)
      .groupBy()
      .agg(sort_array(collect_list(struct(col("checkpoint"),
        log(col("cum_tokens").cast("double")).as("x"),
        log(col("vocab").cast("double")).as("y")))).as("__l"))
    val n = size(col("__l")).cast("double")
    def fold(f: (Column, Column) => Column): Column =
      aggregate(col("__l"), lit(0.0),
        (acc, p) => acc + f(p.getField("x"), p.getField("y")))
    val sx = fold((x, _) => x)
    val sy = fold((_, y) => y)
    val sxy = fold((x, y) => x * y)
    val sxx = fold((x, _) => x * x)
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    // the guard also catches a vertical point stack (all x equal →
    // denominator 0): NULL fit, never NaN
    val ok = size(col("__l")) >= 2 && (n * sxx - sx * sx) =!= 0.0
    val fit = pts.select(
      when(ok, round(beta, 6)).as("heaps_beta"),
      when(ok, round(exp(sy / n - beta * (sx / n)), 6)).as("heaps_k"))
    growth.crossJoin(broadcast(fit))
  }

  /** Sketch-based corpus profile — the 100 TB scale path of exact
    * per-source profiling (q_corpus_stats): per source,
    * `approx_count_distinct` (HyperLogLog++) replaces the exact distinct
    * term count and `approx_percentile` (KLL-style quantile sketch)
    * replaces the exact interpolated percentiles. Exact distinct terms
    * require shuffling the FULL (source, term) key set — at web scale
    * that's the corpus's entire vocabulary per partition re-exchanged;
    * both sketches instead keep constant-size per-partition state that
    * merges map-side, so the exchange is O(sources), not O(vocab).
    *
    * Sketch outputs are NOT cross-engine reproducible (HLL register
    * hashing is engine-specific), so this operator is pinned by accuracy
    * bounds against the exact twin (CorpusAnalysisSpec) rather than a
    * DuckDB hash oracle, and the driver records its query rows-only.
    * `rsd` is the HLL target relative standard deviation. */
  def approxCorpusStats(docs: DataFrame, sourceCol: String,
      textCol: String, rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    val tok = graft.text.TextAnalysis.wsTokenCount(col(textCol))
    // doc-grain stats and term-grain distinct are different grains: two
    // aggregates joined on the S-row source key, never one inflated pass
    val docStats = docs
      .select(col(sourceCol).as("source"), tok.cast("long").as("__tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("total_tokens"),
        expr("approx_percentile(__tok, array(0.5, 0.95))").as("__pcts"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        element_at(col("__pcts"), 1).as("p50_tokens_approx"),
        element_at(col("__pcts"), 2).as("p95_tokens_approx"))
    val termStats = termDoc(docs, sourceCol, textCol)
      .groupBy(col("doc_id"))
      .agg(approx_count_distinct(col("term"), rsd)
        .as("distinct_terms_approx"))
      .select(col("doc_id").as("source"), col("distinct_terms_approx"))
    docStats.join(termStats, Seq("source"), "left")
  }

  /** [[approxCorpusStats]] under a GREEN-CHECKABLE tolerance oracle.
    * Sketch registers cannot cross-engine hash, but the EXACT columns
    * can, and the sketch estimates can be ASSERTED within tolerance of
    * exact values computed in the same query. Per source this emits the
    * exact profile (n_docs, total_tokens, distinct_terms_exact) plus
    * three booleans: `distinct_ok` (the HLL estimate within `relTol`
    * relative error of the exact distinct count — HLL at rsd 0.05 is
    * ~3σ inside 0.15), and `p50_ok` / `p95_ok` (each percentile-sketch
    * output inside the exact [p25, p75] / [p85, max] value windows —
    * generous rank windows that any correct KLL/GK sketch satisfies).
    * The DuckDB oracle computes the exact columns and literal TRUE for
    * every _ok flag, so a sketch drifting out of tolerance turns the
    * row red instead of being invisible to the gate.
    *
    * Scale posture: the exact twin columns make this the AUDIT query,
    * not the production profile — run it on a sample or a small SF to
    * certify the sketch path, then run [[approxCorpusStats]] alone at
    * full scale (its whole point is avoiding the exact distinct's
    * vocabulary-sized exchange). */
  def approxCorpusStatsBounds(docs: DataFrame, sourceCol: String,
      textCol: String, rsd: Double = 0.05,
      relTol: Double = 0.15): DataFrame = {
    require(relTol > 0, s"relTol must be positive, got $relTol")
    val approx = approxCorpusStats(docs, sourceCol, textCol, rsd)
      .select(col("source"), col("distinct_terms_approx"),
        col("p50_tokens_approx"), col("p95_tokens_approx"))
    val tok = graft.text.TextAnalysis.wsTokenCount(col(textCol))
    val exactDocs = docs
      .select(col(sourceCol).as("source"), tok.cast("long").as("__tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("total_tokens"),
        expr("percentile(__tok, array(0.25, 0.75, 0.85))").as("__ps"),
        max(col("__tok")).as("__max"))
    val exactTerms = termDoc(docs, sourceCol, textCol)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("distinct_terms_exact"))
      .select(col("doc_id").as("source"), col("distinct_terms_exact"))
    val est = col("distinct_terms_approx").cast("double")
    val ex = col("distinct_terms_exact").cast("double")
    exactDocs.join(exactTerms, Seq("source"), "left")
      .join(approx, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        coalesce(col("distinct_terms_exact"), lit(0L))
          .as("distinct_terms_exact"),
        when(coalesce(ex, lit(0.0)) === 0.0,
            coalesce(est, lit(0.0)) === 0.0)
          .otherwise(abs(est - ex) / ex <= relTol).as("distinct_ok"),
        (col("p50_tokens_approx").cast("double")
          >= element_at(col("__ps"), 1) &&
          col("p50_tokens_approx").cast("double")
            <= element_at(col("__ps"), 2)).as("p50_ok"),
        (col("p95_tokens_approx").cast("double")
          >= element_at(col("__ps"), 3) &&
          col("p95_tokens_approx").cast("double")
            <= col("__max").cast("double")).as("p95_ok"))
  }

  /** Per-document top-k TF-IDF keyword extraction — the classic
    * document-summary/tagging primitive (and the cheap sparse "topic
    * signature" used to slice corpora before anything learned exists):
    * tfidf = tf · (ln((N+1)/(df+1)) + 1), the sklearn smooth-idf shape,
    * rounded 6; per document the k highest-scoring terms (ties →
    * ascending term). `minDf` drops hapax noise before scoring.
    *
    * Scale: one (doc, term) count aggregate (the tf table, barriered —
    * it feeds the df aggregate AND the scoring join), a vocab-bounded
    * df table, one scalar N, and a rank window partitioned PER DOCUMENT
    * — bounded by the document's own distinct-term count, never a
    * corpus-wide sort (the sessionize per-entity-window shape). */
  def docKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDf: Long = 1L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = termDoc(docs, idCol, textCol)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = tf.agg(countDistinct(col("doc_id")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("__n") + 1).cast("double") /
          (col("df") + 1).cast("double")) + lit(1.0)), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("doc_id").as(idCol), col("term"), col("tf"),
        col("df"), col("tfidf"), col("rank"))
  }

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR 2009) — the standard
    * hybrid-retrieval combiner: given N per-retriever top-k rankings
    * (e.g. BM25 sparse + embedding-cosine dense), each candidate scores
    * `Σ 1/(kConst + rank_i)` over the rankings that retrieved it, and
    * the fused list re-ranks on that score. Rank-based (not score-based)
    * fusion needs no per-retriever score calibration, which is why RRF
    * is the default in production hybrid search.
    *
    * Inputs carry `(queryCols..., idCol, rankCol)`; pass `queryCols`
    * when fusing a batch of queries at once (the fuse then re-ranks
    * within each query). Output: the join keys, one nullable
    * `rank_i` provenance column per input ranking (1-based, in input
    * order), `rrf_score` (rounded — ranking runs on the ROUNDED score
    * with an id tie-break, so order is engine-exact), and the fused
    * `rank`, capped at `k`.
    *
    * Scale: the heavy lifting lives in the retrievers (whose plans are
    * already bounded); fusion only ever touches their top-k OUTPUTS —
    * N full-outer joins on bounded tables and a rank window over
    * ≤ Σ kᵢ rows per query. Metadata-scale by construction. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, kConst: Int = 60,
      queryCols: Seq[String] = Seq.empty): DataFrame = {
    require(rankings.size >= 2,
      s"need at least 2 rankings to fuse, got ${rankings.size}")
    require(k > 0, s"k must be positive, got $k")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    val keys = queryCols :+ idCol
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      df.select((keys.map(col) :+
        col(rankCol).as(s"rank_${i + 1}")): _*)
    }
    val joined = renamed.reduce((a, b) => a.join(b, keys, "full_outer"))
    // fixed left-to-right addition order => engine-exact double
    val score = renamed.indices.map { i =>
      val r = col(s"rank_${i + 1}")
      when(r.isNotNull,
        lit(1.0) / (lit(kConst.toDouble) + r.cast("double")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    // no query key: one fused list whose input is the union of the
    // per-retriever TOP-K lists — bounded by Σ|rankings|·k_i rows by
    // construction, hence the bounded-window marker
    val w = if (queryCols.isEmpty)
      graft.functions.BoundedWindow
        .ordered(col("rrf_score").desc, col(idCol).asc)
    else
      org.apache.spark.sql.expressions.Window
        .partitionBy(queryCols.map(col): _*)
        .orderBy(col("rrf_score").desc, col(idCol).asc)
    joined.withColumn("rrf_score", round(score, 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
