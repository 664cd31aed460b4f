package graft.operators

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data
  * builder actually runs, wiring the individual operators in the
  * canonical order. One call takes a raw document table to a packed
  * training manifest:
  *
  *  1. PII redaction (map-only) — FIRST, so documents differing only in
  *     redacted spans deduplicate together downstream.
  *  2. Quality + language gate (map-only) — cheapest filters drop rows
  *     before anything that shuffles.
  *  3. Exact dedup (one shuffle on a 16-byte fingerprint).
  *  4. Benchmark decontamination (broadcast gram join, drop flagged) —
  *     near-dups of benchmark docs fall out here too, since they share
  *     n-grams.
  *  5. Deterministic stratified sampling by predicted language — AFTER
  *     cleaning, so the rates shape the final mixture, not the raw one.
  *  6. Concat-and-chunk sequence packing → (shard, sequence, offset)
  *     manifest.
  *
  * Near-duplicate (MinHash/SimHash/SemDeDup) stages are deliberately not
  * inlined — they carry their own tuning and cost profiles; run
  * [[graft.dedup.Dedup.dropNearDuplicates]] or
  * [[graft.similarity.Similarity.semDedup]] between steps 3 and 4 when
  * needed (q_dedup_pipeline/q_dedup_cc pin those compositions).
  *
  * Scale design: steps 1, 2 and 5 are zero-shuffle scans; step 3 is the
  * minimal-key groupBy; step 4 never shuffles the corpus side; step 6
  * shuffles once on the shard key. Nothing in the plan materializes more
  * than ~1 row per surviving document past the scan stage. */
object Curation {

  /** Returns the packed manifest: (idCol, shard, n_tokens, tok_start,
    * seq_first, seq_last, offset_in_seq, lang_pred). Deterministic end
    * to end — reruns and repartitions produce the identical manifest.
    *
    * URL-level stages (the FIRST filters every real crawl pipeline
    * runs — they are per-row/per-key and drop rows before any content
    * expression is ever evaluated) switch on via `urlCol`:
    *
    *  0a. URL dedup — one representative (min id) per canonical URL
    *      ([[graft.text.UrlOps.urlDedup]]; one keyed aggregate);
    *  0b. domain blocklist — broadcast anti-join on the registered
    *      domain (when `blockedDomains` is given);
    *  0c. per-domain cap — keep the `maxPerDomain` longest documents
    *      per registered domain (when `maxPerDomain` > 0; bounded-heap
    *      top-k, ties to the lowest id).
    *
    * Content stages below then run on the web-surviving rows only. */
  def curate(docs: DataFrame, bench: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minQuality: Double = 0.4,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr"),
      decontamN: Int = 8,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0, seed: Long = 42L,
      capacity: Long = 256L, shards: Int = 8,
      hashMode: String = graft.functions.HashExpressions.ModeXx,
      splits: Seq[(String, Double)] = Nil,
      urlCol: Option[String] = None,
      blockedDomains: Option[DataFrame] = None,
      maxPerDomain: Int = 0)
      : DataFrame = {
    val webDocs = urlCol match {
      case None => docs
      case Some(u) =>
        val afterUrl = graft.text.UrlOps.urlDedup(docs, u, idCol)
          .drop("norm_url", "n_variants")
        val afterBlock = blockedDomains match {
          case Some(b) => graft.text.UrlOps.filterBlockedDomains(
            afterUrl, u, b)
          case None => afterUrl
        }
        if (maxPerDomain > 0)
          graft.text.UrlOps.domainCap(afterBlock, u, idCol,
            length(col(textCol)).cast("double"), maxPerDomain)
        else afterBlock
    }
    val redacted = webDocs.withColumn(textCol,
      TextAnalysis.redactPii(col(textCol)))
    // Persist + eager-count barriers (the Dedup.minhashLshPairs
    // lifecycle): `gated` feeds both sides of the dedup semi-join and
    // `deduped` feeds the contamination join AND the anti-join — without
    // the barriers every downstream branch re-executes the full
    // redact/quality/langid expression tree against the scan (measured
    // 5.05 s → the tree is the pipeline's most expensive map stage).
    val gated = redacted
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        col("lang_pred").isin(allowedLangs: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gated.count() // one computation wave, then all consumers hit cache
    val deduped = Dedup.dropExactDuplicates(gated, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deduped.count()
    val flagged = Dedup.ngramContamination(deduped, bench, textCol, idCol,
        decontamN, hashMode)
      .filter(col("contaminated")).select(col(idCol))
    val clean = deduped.join(flagged, Seq(idCol), "left_anti")
    val sampled =
      if (rates.isEmpty && defaultRate >= 1.0) clean
      else Sampling.stratifiedSample(clean, idCol, "lang_pred", rates,
        defaultRate, seed)
    // eager manifest (≤1 row/surviving doc) so the big cached
    // intermediates can be released here; checkpoint blocks are
    // reclaimed when the returned frame is collected
    val packed = Packing.packConcat(sampled, idCol,
        TextAnalysis.wsTokenCount(col(textCol)), capacity, shards,
        carry = Seq("lang_pred"))
    // optional deterministic train/val/test assignment rides the
    // manifest as one extra map-only column (default: absent — the
    // q_curation oracle contract is unchanged)
    val result = (if (splits.isEmpty) packed
      else Sampling.assignSplits(packed, idCol, splits, seed))
      .localCheckpoint(true)
    gated.unpersist()
    deduped.unpersist()
    result
  }

  /** The published-heuristics curation pipeline (the C4/Gopher/
    * RefinedWeb recipe, complementary to [[curate]]'s score-based one):
    *
    *  1. C4 line/page cleaning — rewrites the text, drops boilerplate
    *     pages (map-only);
    *  2. Gopher A1 quality gate on the CLEANED text (map-only; the text
    *     rides through the signal projection via passthrough);
    *  3. exact dedup of the cleaned text (min-id keep — one fingerprint
    *     shuffle; cleaning runs FIRST so pages differing only in
    *     stripped boilerplate deduplicate together);
    *  4. seeded train/val split on the surviving ids (map-only; swap in
    *     [[Sampling.leakSafeSplits]] when a near-dup edge set exists).
    *
    * Returns (idCol, textCol cleaned, n_tokens, split), deterministic
    * end to end. The gated frame is barriered before dedup because the
    * fingerprint aggregate and the keep join both consume it. */
  def curateHeuristic(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minLineWords: Int = 3,
      minSentences: Int = 2, minWords: Int = 30,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.1),
      seed: Long = 42L): DataFrame = {
    val cleaned = graft.text.HeuristicFilters.c4Clean(docs, textCol,
        idCol, minLineWords, minSentences)
      .filter(col("keep"))
      .select(col(idCol), col("clean_text").as(textCol))
    val gated = graft.text.HeuristicFilters.gopherFilter(cleaned,
        textCol, idCol, minWords = minWords,
        passthrough = Seq(textCol))
      .filter(col("keep"))
      .select(col(idCol), col(textCol))
      .localCheckpoint(true)
    val deduped = Dedup.dropExactDuplicates(gated, textCol, idCol)
    Sampling.assignSplits(deduped, idCol, splits, seed)
      .select(col(idCol), col(textCol),
        TextAnalysis.bpeTokenCount(col(textCol)).cast("long")
          .as("n_tokens"),
        col("split"))
  }
}
