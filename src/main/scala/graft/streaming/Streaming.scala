package graft.streaming

import graft.core.ColumnMap
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension (no counterpart in the reference —
  * SURVEY.md §2.8): the two batch patterns that translate naturally to
  * streams.
  *
  *  - [[binSourcesStream]]: the streaming form of `bin_sources`
  *    (ensemble.py:956-1052) — event-time tumbling windows with a
  *    watermark for late data, instead of `floor(t/w)*w` bucketing.
  *  - [[runningLightcurveStats]]: incremental per-lightcurve aggregates
  *    via `flatMapGroupsWithState` — the streaming form of the `batch`
  *    engine for functions that are expressible as a bounded running
  *    state (count / mean / M2 for variance via Welford), emitting an
  *    updated row per object per micro-batch.
  *
  * Scale: both shapes are the canonical Structured Streaming state
  * patterns — state is keyed by object id and partitioned by the shuffle,
  * watermarks bound state size for windows, and the stats state is O(1)
  * per (id, band).
  */
object Streaming {

  /** Tumbling-window time binning over a streaming source table.
    *
    * @param tsCol     event-time timestamp column (TimestampType)
    * @param window    window duration, e.g. "1 day"
    * @param watermark how long to wait for late rows, e.g. "2 days"
    */
  def binSourcesStream(
      src: DataFrame,
      cm: ColumnMap,
      tsCol: String,
      windowDur: String = "1 day",
      watermark: String = "1 day",
      countCol: Option[String] = Some("bin_count")
  ): DataFrame = {
    val aggs = Seq(
      avg(col(cm.flux)).as(cm.flux),
      when(count(col(cm.err)) > 0, // all-null err bin: NULL, not ANSI /0
        sqrt(sum(col(cm.err) * col(cm.err))) / count(col(cm.err)))
        .as(cm.err)
    ) ++ countCol.map(c => count(lit(1)).as(c))
    src
      .withWatermark(tsCol, watermark)
      .groupBy(col(cm.id), col(cm.band),
        window(col(tsCol), windowDur).as("time_bin"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming exact dedup: drop rows whose content fingerprint was
    * already seen within the watermark horizon — the streaming form of
    * `Dedup.dropExactDuplicates`. State is one fingerprint per distinct
    * content, expired by the watermark (bounded state, the standard
    * Structured Streaming dedup pattern). */
  def streamingExactDedup(
      src: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 day"
  ): DataFrame =
    src
      .withColumn("__fp", graft.text.TextAnalysis.fingerprintMd5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-duplicate dedup — MinHash-LSH band keys on the
    * state store: a document drops when ANY of its `bands` r-row band
    * signatures was already seen (by a document that survived the
    * earlier bands) within the watermark.
    *
    * Collision math (two docs at shingle-Jaccard s share one r-row
    * band with probability s^r): at the r = 4 default, ONE band
    * catches ~66% of 0.9-Jaccard near-dups (0.9⁴ ≈ 0.656) but also
    * falsely collides **6.25%** of unrelated 0.5-Jaccard pairs
    * (0.5⁴ = 0.0625) — a real false-drop rate for a gate that
    * permanently discards stream documents. The two levers, both
    * honest:
    *  - `bandRows = 8` sharpens the S-curve: 0.43 of 0.9-Jaccard
    *    caught per band, 0.39% of 0.5-Jaccard falsely dropped;
    *  - `bands = b` recovers recall: catch ≈ 1 − (1 − s^r)^b, state
    *    and false-drop rate grow ~×b (b = 2 at r = 8: ~68% of
    *    0.9-Jaccard, ~0.8% of 0.5-Jaccard — better on BOTH axes than
    *    one r = 4 band). Tune against the batch
    *    [[graft.dedup.Dedup.optimalLshParams]] S-curve tuner; the THOROUGH
    *    multi-band batch pass ([[graft.dedup.Dedup.minhashLshPairs]] →
    *    CC) stays the compaction over what survives, exactly the
    *    probe-then-verify split the contamination flag uses.
    *
    * Mechanics: band b keys on rows [b·r, (b+1)·r) of ONE
    * `bands·bandRows`-row signature (the batch
    * [[graft.dedup.Dedup.lshBandKeys]] slicing), and each band is its
    * own watermark-bounded dedup stage — Structured Streaming keys
    * dedup state on one column, so `bands` stages hold `bands`
    * band-key state stores (state grows ×bands, still O(keys), all
    * watermark-expired). A doc dropped at band i never inserts keys
    * for bands > i, so survival is the GREEDY sequential policy — the
    * same keep-first semantics as the batch twin, spec-pinned against
    * a fold over the identical band keys in arrival order.
    * Exact duplicates always collide (identical shingles ⇒ identical
    * signature), so this subsumes [[streamingExactDedup]] up to
    * whitespace normalization. Sub-shingle-length docs have NO
    * shingles — band-keying them together would collapse every tiny
    * doc into one state entry, so they fall back to exact-fingerprint
    * keys (prefixes disjoint) at every stage. */
  def streamingNearDupDedup(src: DataFrame, textCol: String,
      tsCol: String, watermark: String = "1 day", shingleLen: Int = 5,
      bandRows: Int = 4,
      hashMode: String = graft.functions.HashExpressions.ModeXx,
      bands: Int = 1): DataFrame = {
    require(bandRows >= 1, s"bandRows must be >= 1, got $bandRows")
    require(bands >= 1 && bands <= 16,
      s"bands must be in [1, 16], got $bands")
    val sh = graft.functions.HashExpressions.shingleHashes(
      graft.text.TextAnalysis.normalizeText(col(textCol)), shingleLen,
      hashMode)
    val sig = graft.dedup.Dedup.minhashSignature(sh, bands * bandRows)
    // bands = 1 keeps the LEGACY unprefixed key (the pre-multi-band
    // format): an existing streaming checkpoint's dedup state store
    // keys keep matching across the upgrade, so previously-seen
    // documents are not re-admitted. Multi-band keys carry the 'b<i>:'
    // prefix so different bands' slices can never alias one another.
    def bandKey(b: Int): Column = when(size(sh) === 0,
        concat(lit("fp:"), graft.text.TextAnalysis
          .fingerprintMd5(col(textCol)).cast("string")))
      .otherwise(concat(
        if (bands == 1) lit("") else lit(s"b$b:"),
        concat_ws(",",
          transform(slice(sig, b * bandRows + 1, bandRows),
            x => x.cast("string")))))
    var out = src.withWatermark(tsCol, watermark)
    for (b <- 0 until bands) {
      out = out.withColumn("__band", bandKey(b))
        .dropDuplicatesWithinWatermark("__band")
    }
    out.drop("__band")
  }

  /** Streaming URL-level dedup — the live twin of
    * [[graft.text.UrlOps.urlDedup]], and the FIRST stateful stage of a
    * live crawl ingest (tracking-parameter variants of one page arrive
    * seconds apart; canonical-key dedup kills them before any content
    * work runs). Keys the state store on the CANONICAL url, so the
    * state-size bound is |distinct pages within the watermark|, not
    * |raw fetch URLs| — on a crawl stream those differ by the whole
    * tracking-variant multiplier. */
  def streamingUrlDedup(
      src: DataFrame,
      urlCol: String,
      tsCol: String,
      watermark: String = "1 day"
  ): DataFrame =
    src
      .withColumn("__norm", graft.text.UrlOps.normalizeUrl(col(urlCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__norm")
      .drop("__norm")

  /** Streaming robots gate — the crawl-politeness stage LIVE: each
    * fetched URL checks against its host's parsed robots rules as the
    * stream flows. The rules table is STATIC (robots snapshots refresh
    * on crawl-cycle cadence, not per-event), collapsed to one
    * rules-array row per host ([[graft.text.UrlOps.robotsRulesByHost]])
    * so the whole gate is a stream-static broadcast-joinable 1:1 join
    * plus a MAP-ONLY per-row fold ([[graft.text.UrlOps.robotsVerdict]])
    * — NO state store, no watermark, any output mode; verdicts are
    * bit-identical to the batch [[graft.text.UrlOps.robotsGate]]
    * (spec-pinned). Chain before [[streamingUrlDedup]] in a live
    * ingest: politeness first, then canonical dedup, then content. */
  def streamingRobotsGate(src: DataFrame, robots: DataFrame,
      urlCol: String, agent: String = "*",
      hostCol: String = "host", txtCol: String = "robots_txt",
      keepDisallowed: Boolean = false): DataFrame = {
    import graft.text.UrlOps
    val rules = broadcast(
      UrlOps.robotsRulesByHost(robots, hostCol, txtCol, agent))
    val verdict = UrlOps.robotsVerdict(col("__target"), col("rules"))
    val out = src
      .withColumn("host", UrlOps.host(col(urlCol)))
      .withColumn("__target", UrlOps.requestTarget(col(urlCol)))
      .join(rules, Seq("host"), "left")
      .withColumn("allowed", verdict.getField("allowed"))
      .withColumn("rule_type", verdict.getField("rule_type"))
      .withColumn("rule_pattern", verdict.getField("rule_pattern"))
      .drop("rules", "__target")
    if (keepDisallowed) out else out.filter(col("allowed"))
  }

  /** Streaming twin of the q_follow_graph EDGE stage — the
    * nofollow-respecting crawl-graph extractor LIVE: pages arriving on
    * a stream are gated by the robots META (page-level `nofollow`
    * drops every outgoing edge), anchors extracted with text + rel,
    * and link-level nofollow/ugc/sponsored edges dropped. Entirely
    * STATELESS (regexp extraction + explode + filters — no state
    * store, no watermark); aggregate downstream (windowed counts, or
    * [[graft.text.UrlOps.anchorTermIndex]] in the batch lane) where a
    * watermark policy belongs. Output = [[graft.text.UrlOps
    * .extractAnchors]] columns, batch-twin bit-identical. */
  def streamingFollowEdges(src: DataFrame, htmlCol: String,
      urlCol: String): DataFrame = {
    import graft.text.UrlOps
    UrlOps.extractAnchors(
        src.filter(!UrlOps.metaNofollow(col(htmlCol))),
        htmlCol, urlCol)
      .filter(!col("nofollow"))
  }

  /** Streaming twin of [[graft.text.UrlOps.anchorTermIndex]] — the
    * off-page relevance index LIVE: pages arriving on a stream emit
    * (window, target_url, term, n_refs) per event-time window, the
    * anchor-text label table a ranker tails continuously. Same
    * pipeline as the batch op (follow edges only, empty anchors drop,
    * targets canonicalize, lowercased whitespace terms), windowed by
    * `tsCol` with a WATERMARK so Append mode emits each window once,
    * final, and the store drops it — state is bounded by
    * (windows in flight) × (distinct target/term cells per window),
    * never corpus-lifetime. Page-level robots-meta gating composes
    * upstream exactly as in the batch lane (filter the page stream on
    * [[graft.text.UrlOps.metaNofollow]] before this op — it takes raw
    * pages, the [[streamingFollowEdges]] input shape). Hot
    * targets collapse in the hash aggregate's partial phase
    * map-side, the property the batch ScaleProbe pinned — a hot key
    * in an aggregate is benign, unlike a hot window partition. */
  def streamingAnchorTermIndex(src: DataFrame, htmlCol: String,
      urlCol: String, tsCol: String, windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    import graft.text.UrlOps
    UrlOps.extractAnchors(src.withWatermark(tsCol, watermark),
        htmlCol, urlCol)
      .filter(!col("nofollow") && col("anchor_text") =!= "")
      .select(col(tsCol),
        UrlOps.normalizeUrl(col("link_url")).as("target_url"),
        explode(split(lower(col("anchor_text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(window(col(tsCol), windowDur), col("target_url"),
        col("term"))
      .agg(count(lit(1)).as("n_refs"))
  }

  /** Streaming twin of [[graft.text.UrlOps.crawlSchedule]] — the
    * frontier-scheduling stage LIVE: URLs arriving on a stream are
    * assigned per-host fetch positions and due times continuously.
    * State is ONE long counter per host (`flatMapGroupsWithState`
    * keyed by host — O(hosts) state total, never O(urls); the batch
    * op's Zipf-skew concern doesn't arise because a mega-host's
    * arrivals spread across micro-batches instead of sorting in one
    * task). Crawl-delays resolve against a STATIC robots snapshot
    * (the [[streamingRobotsGate]] posture: robots refresh on
    * crawl-cycle cadence, not per event) broadcast-joined per batch.
    * Within a micro-batch a host's URLs take positions in ascending
    * id order — equal to the batch operator when one batch holds the
    * whole frontier (spec-pinned); across batches, arrival order —
    * a streaming scheduler is order-sensitive by nature, so use the
    * batch operator when bit-identical plans matter. Output:
    * (id, host, position, crawl_delay, fetch_at_s), Append mode, no
    * watermark needed (state never expires — hosts are a bounded
    * dimension; add expiry upstream by closing the stream per crawl
    * cycle). */
  def streamingCrawlSchedule(src: DataFrame, robots: DataFrame,
      urlCol: String, idCol: String, agent: String = "*",
      defaultDelay: Double = 1.0, hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame = {
    import graft.text.UrlOps
    require(defaultDelay >= 0,
      s"defaultDelay must be >= 0, got $defaultDelay")
    val delays = broadcast(
      UrlOps.crawlDelays(robots, hostCol, txtCol, agent))
    val projected = src
      .select(col(idCol).cast("long").as("id"),
        UrlOps.host(col(urlCol)).as("host"))
      .join(delays, Seq("host"), "left")
      .select(col("id"), col("host"),
        coalesce(col("crawl_delay"), lit(defaultDelay))
          .as("crawl_delay"))
    val stateEnc = Encoders.product[CrawlQueueState]
    val outEnc = Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("host",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("position",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("crawl_delay",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("fetch_at_s",
        org.apache.spark.sql.types.DoubleType))))
    projected
      .groupByKey(_.getString(1))(Encoders.STRING)
      .flatMapGroupsWithState[CrawlQueueState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[Row],
            state: GroupState[CrawlQueueState]) =>
          var pos = state.getOption.map(_.next).getOrElse(1L)
          val out = rows.toArray.sortBy(_.getLong(0)).map { r =>
            val delay = r.getDouble(2)
            val p = pos
            pos += 1
            // HALF_UP at 6 decimals — the exact semantics of the batch
            // op's round(x, 6)
            val due = BigDecimal((p - 1).toDouble * delay)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            Row(r.getLong(0), host, p, delay, due)
          }
          state.update(CrawlQueueState(pos))
          out.iterator
      }(stateEnc, outEnc).toDF()
  }

  /** One open-queue counter per host — [[streamingCrawlSchedule]]'s
    * whole state: the next position to hand out. */
  case class CrawlQueueState(next: Long)

  /** Streaming corpus-curation gate: the STATELESS stages of
    * [[graft.operators.Curation.curate]] — PII redaction, quality +
    * language gate, deterministic mixture sampling — applied to a
    * document stream. Pure map-only transforms, so no watermark, no
    * state store, any output mode; chain [[streamingExactDedup]] after
    * it for the stateful dedup stage (decontamination/packing stay
    * batch: they need the full benchmark/shard view). The hash-uniform
    * sampling keys on content-stable ids, so replays and reprocessing
    * keep the identical subset — exactly-once selection without state. */
  def streamingCurationGate(src: DataFrame, textCol: String,
      idCol: String, minQuality: Double = 0.4,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr"),
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0, seed: Long = 42L): DataFrame = {
    import graft.text.TextAnalysis
    val redacted = src.withColumn(textCol,
      TextAnalysis.redactPii(col(textCol)))
    val gated = redacted
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        col("lang_pred").isin(allowedLangs: _*))
    if (rates.isEmpty && defaultRate >= 1.0) gated
    else {
      val rateCol = rates.foldLeft(lit(defaultRate)) {
        case (acc, (stratum, r)) =>
          when(col("lang_pred") === lit(stratum), lit(r)).otherwise(acc)
      }
      gated.filter(
        graft.operators.Sampling.hashUniform(col(idCol), seed) < rateCol)
    }
  }

  /** Streaming heuristic-filter + augmentation gate: the round-7
    * published filter sets and augmentations composed as a STATELESS
    * stream stage — C4 line cleaning rewrites the text, the Gopher A1
    * verdict gates it, and FIM rewrites the survivors for training.
    * Every stage is a pure per-row expression ([[graft.text
    * .HeuristicFilters]], [[graft.text.Chunking.fimTransform]]), so the
    * stream plan carries NO state store, no watermark, no stream-static
    * join — replay-stable because the FIM cuts key on the seeded md5
    * uniform of the id, not on arrival order. Identical semantics to
    * running the batch operators over everything arrived (spec-pinned
    * via foreachBatch snapshots). */
  def streamingAugmentGate(src: DataFrame, textCol: String,
      idCol: String, minWords: Int = 30, fimRate: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    import graft.text.{Chunking, HeuristicFilters}
    val cleaned = HeuristicFilters.c4Clean(src, textCol, idCol,
        minLineWords = 3, minSentences = 1)
      .filter(col("keep"))
      .select(col(idCol), col("clean_text").as(textCol))
    // text rides THROUGH the gopher signals (passthrough) — a rejoin
    // against the cleaned stream would be a stateful stream-stream join
    val gated = HeuristicFilters.gopherFilter(cleaned, textCol, idCol,
        minWords = minWords, passthrough = Seq(textCol))
      .filter(col("keep"))
      .select(col(idCol), col(textCol))
    Chunking.fimTransform(gated, fimRate, seed, textCol, idCol)
  }

  /** Streaming HTML ingest gate — the live WARC→WET stage: extract text
    * from raw HTML ([[graft.text.HtmlExtract.extractText]] — the same
    * regexp chain as batch, so stream ≡ batch bit-for-bit) and gate on
    * markup density (`text_density ≥ minDensity` drops tag-soup pages
    * whose prose content is negligible) plus a minimum extracted
    * length. Pure per-row expressions: NO state store, no watermark —
    * the stage every crawl firehose runs before any stateful dedup.
    * Returns (idCol, text [extracted], n_tags, n_links,
    * n_script_blocks, text_density). */
  def streamingHtmlIngest(src: DataFrame, htmlCol: String,
      idCol: String, minDensity: Double = 0.1,
      minChars: Int = 1): DataFrame =
    graft.text.HtmlExtract.extract(src, htmlCol, idCol)
      .filter(col("text_density") >= minDensity &&
        length(col("text")) >= minChars)

  /** Streaming twin of the q_crawl_to_md composition — the modern
    * corpus ingest LIVE: WARC response payloads arriving on a stream
    * are HTTP-parsed ([[graft.sources.Warc.httpResponseMeta]]), gated
    * to successful HTML (`status == 200 && content_type ==
    * "text/html"` — 404s, redirects, non-HTML media and non-HTTP
    * payloads drop), and the surviving bodies converted to markdown
    * ([[graft.text.HtmlExtract.htmlToMarkdown]] — the same regexp
    * chains as batch, so stream ≡ batch bit-for-bit). Pure per-row
    * expressions end to end: NO state store, no watermark — compose
    * the stateful stages (dedup, windowed indexes) downstream.
    * Returns (idCol, markdown). Payloads arrive as STRINGS here
    * (already decoded at the stream boundary); a non-UTF-8 firehose
    * should run the batch byte path
    * ([[graft.sources.Warc.decodeHttpBody]] over `payload_bytes`)
    * in its source stage first — the q_crawl_to_md shape. */
  def streamingCrawlToMd(src: DataFrame, payloadCol: String,
      idCol: String): DataFrame =
    graft.sources.Warc.httpResponseMeta(src, payloadCol)
      .filter(col("is_http") && col("status") === 200 &&
        col("content_type") === "text/html")
      .select(col(idCol),
        graft.text.HtmlExtract.htmlToMarkdown(col("http_body"))
          .as("markdown"))

  /** Streaming twin of the q_crawl_md_tables composition — the
    * STRUCTURED-DATA lane live: [[streamingCrawlToMd]]'s markdown
    * output piped straight into the GFM pipe-table extractor
    * ([[graft.text.Markdown.markdownTableCells]] — the identical
    * regexp + posexplode chain as batch, so stream ≡ batch
    * bit-for-bit, `\|` escapes and all). Stateless generators: NO
    * state store, no watermark — rows = table cells, one per
    * (table_idx, row_idx, col_idx). Aggregate downstream. */
  def streamingMdTableCells(src: DataFrame, payloadCol: String,
      idCol: String): DataFrame =
    graft.text.Markdown.markdownTableCells(
      streamingCrawlToMd(src, payloadCol, idCol), "markdown")

  /** Streaming benchmark-contamination flag: mark stream documents that
    * (probably) share a word n-gram with a fixed benchmark corpus, via
    * the driver-built Bloom filter riding in the plan — a pure map-only
    * stream transform, no state store, no stream-static join. The flag
    * is one-sided: `false` is EXACT (no false negatives), `true` is
    * approximate with per-doc error ≈ n_grams·fpp — route flagged docs
    * to a side sink and confirm with the exact batch operator
    * ([[graft.dedup.Dedup.ngramContamination]]), the standard
    * probe-then-verify split. Build the filter once with
    * [[graft.dedup.Dedup.buildBenchGramBloom]]. */
  def streamingContaminationFlag(src: DataFrame,
      bf: org.apache.spark.util.sketch.BloomFilter, textCol: String,
      n: Int = 8,
      hashMode: String = graft.functions.HashExpressions.ModeXx)
      : DataFrame = {
    val hash: Column => Column =
      if (hashMode == graft.functions.HashExpressions.ModeMd5)
        graft.functions.HashExpressions.md5Long(_)
      else xxhash64(_)
    // coalesce: NULL text yields a NULL gram array and `exists` over it is
    // NULL — but a gram-less document cannot be contaminated, and the
    // one-sided contract above promises `false` is exact, so pin it false.
    src.withColumn("maybe_contaminated",
      coalesce(
        exists(graft.text.TextAnalysis.wordShingles(col(textCol), n),
          g => graft.functions.BloomExpressions
            .mightContainLong(hash(g), bf)),
        lit(false)))
  }

  /** Per-(id, band) running state: Welford's online mean/variance. */
  case class LcState(n: Long, mean: Double, m2: Double)

  val runningStatsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("band", StringType, nullable = true),
    StructField("nobs", LongType, nullable = false),
    StructField("mean_flux", DoubleType, nullable = false),
    StructField("var_flux", DoubleType, nullable = true)))

  /** Incremental per-lightcurve statistics over a stream of observations:
    * one updated (id, band, nobs, mean_flux, var_flux) row per group per
    * micro-batch. Use with `OutputMode.Update`. */
  def runningLightcurveStats(src: DataFrame, cm: ColumnMap): DataFrame = {
    val projected = src.select(
      col(cm.id).cast("long").as("id"),
      col(cm.band).cast("string").as("band"),
      col(cm.flux).cast("double").as("flux"))
    val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val stateEnc = Encoders.product[LcState]
    val outEnc = Encoders.row(runningStatsSchema)
    projected
      .groupByKey(r => (r.getLong(0), r.getString(1)))(keyEnc)
      .flatMapGroupsWithState[LcState, Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[Row],
            state: GroupState[LcState]) =>
          var s = state.getOption.getOrElse(LcState(0L, 0.0, 0.0))
          rows.foreach { r =>
            if (!r.isNullAt(2)) {
              val x = r.getDouble(2)
              val n1 = s.n + 1
              val d = x - s.mean
              val mean1 = s.mean + d / n1
              s = LcState(n1, mean1, s.m2 + d * (x - mean1))
            }
          }
          state.update(s)
          val variance = if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN
          Iterator.single(Row(key._1, key._2, s.n, s.mean, variance))
      }(stateEnc, outEnc).toDF()
  }

  /** Per-shard packer state: the open sequence's index and fill. */
  case class PackState(seq: Long, fill: Long)

  /** Output schema of [[streamingNextFitPack]]; the id column carries the
    * caller's `idCol` name, matching batch `Packing.packNextFit`. */
  def packedSchema(idCol: String = "doc_id"): StructType = StructType(Seq(
    StructField(idCol, LongType, nullable = false),
    StructField("shard", IntegerType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("seq_id", LongType, nullable = false),
    StructField("offset_in_seq", LongType, nullable = false)))

  /** Streaming no-split next-fit packing: documents arriving on a stream
    * are assigned (shard, sequence, offset) addresses continuously — the
    * streaming form of [[graft.operators.Packing.packNextFit]], with the
    * per-shard open-sequence fill carried ACROSS micro-batches as
    * `flatMapGroupsWithState` state (two longs per shard — O(shards)
    * state total, not O(docs)). Within a batch documents pack in
    * ascending id order; across batches, arrival order — a streaming
    * packer is order-sensitive by nature, so addresses are deterministic
    * per micro-batch sequence, not across replays with different
    * batching. Use the batch operator when bit-identical manifests
    * matter. */
  def streamingNextFitPack(src: DataFrame, textCol: String,
      idCol: String, capacity: Long, shards: Int): DataFrame = {
    require(capacity > 0 && shards > 0)
    val projected = src.select(col(idCol).cast("long").as(idCol),
      pmod(col(idCol), lit(shards)).cast("int").as("shard"),
      graft.text.TextAnalysis.wsTokenCount(col(textCol)).cast("long")
        .as("n_tokens"))
    val stateEnc = Encoders.product[PackState]
    val outEnc = Encoders.row(packedSchema(idCol))
    projected
      .groupByKey(_.getInt(1))(Encoders.scalaInt)
      .flatMapGroupsWithState[PackState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Row], state: GroupState[PackState]) =>
          var s = state.getOption.getOrElse(PackState(0L, 0L))
          val out = rows.toArray.sortBy(_.getLong(0)).map { r =>
            val n = r.getLong(2)
            if (s.fill > 0 && s.fill + n > capacity)
              s = PackState(s.seq + 1, 0L)
            val off = s.fill
            s = PackState(s.seq, s.fill + n)
            Row(r.getLong(0), shard, n, s.seq, off)
          }
          state.update(s)
          out.iterator
      }(stateEnc, outEnc).toDF()
  }

  /** Continuous IVF index ingestion: assign each arriving embedding to
    * its coarse cell (a map-only literal-centroid expression — no state,
    * no shuffle) and append it to the same cell-partitioned parquet
    * layout [[graft.similarity.Similarity.writeIvfIndex]] writes, so
    * [[graft.similarity.Similarity.knnIvfIndexed]] partition-prunes over
    * an index that grows in real time. Returns the started query. */
  /** Streaming twin of [[graft.operators.Sessionize.sessionize]]: gap-based
    * session aggregation over an event stream via Spark's native
    * `session_window` (merging windows that extend while events arrive
    * within `gap` of each other). Emits one row per closed session —
    * (id, session start/end, n_events) — once the watermark passes the
    * session's end. Same session-boundary semantics as the batch
    * operator up to the open/closed distinction: the batch form numbers
    * all sessions of a static table, the stream emits each session when
    * it can no longer grow. State is one open window per active entity —
    * the canonical bounded-state session pattern. */
  def streamingSessionize(
      src: DataFrame,
      idCol: String,
      tsCol: String,
      gap: String = "30 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    src
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("session"),
        col(idCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(idCol),
        col("session.start").as("start_ts"),
        col("session.end").as("end_ts"),
        col("n_events"))

  /** Per-key enrichment state: the newest reference row seen. */
  case class AsofState(rt: Double, rid: Long, v: Double)

  /** Output schema of [[streamingAsofEnrich]]. */
  def asofEnrichedSchema(keyCol: String): StructType = StructType(Seq(
    StructField(keyCol, LongType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("ts", DoubleType, nullable = false),
    StructField("matched_ts", DoubleType, nullable = true),
    StructField("matched_id", LongType, nullable = true),
    StructField("matched_value", DoubleType, nullable = true)))

  /** Streaming as-of enrichment — the streaming twin of
    * `AsofJoin.asofJoin(direction = "backward")`: one stream carries
    * both reference updates (`isRef` rows — purchases, calibration
    * epochs) and query rows; every query row is emitted once, enriched
    * with the latest same-key reference AT OR BEFORE it, within
    * `tolerance` (else nulls — left-outer, like the batch operator).
    *
    * State per key is ONE reference row — O(keys) state, no timeline
    * buffering. Rows are time-ordered inside each micro-batch (refs
    * before queries at equal times, greater reference id winning
    * equal-time ties — the batch operator's semantics), so intra-batch
    * disorder is handled; ACROSS batches the stream must deliver each
    * key approximately time-ordered (the per-key-partitioned log
    * contract). A reference arriving after a query it precedes cannot
    * retro-enrich it — watermark-buffered reordering is a deliberate
    * non-goal, matching processing-order enrichment joins. A reference
    * older than the stored one never regresses the state. */
  def streamingAsofEnrich(src: DataFrame, keyCol: String, timeCol: String,
      idCol: String, valueCol: String, isRef: Column,
      tolerance: Double = Double.PositiveInfinity): DataFrame = {
    val projected = src.select(
      col(keyCol).cast("long").as("key"),
      col(idCol).cast("long").as("id"),
      col(timeCol).cast("double").as("t"),
      isRef.cast("boolean").as("ref"),
      col(valueCol).cast("double").as("v"))
    val outEnc = Encoders.row(asofEnrichedSchema(keyCol))
    projected
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[AsofState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Row], state: GroupState[AsofState]) =>
          // refs sort before queries at equal t (inclusive match), and
          // by id so the greatest equal-time reference wins the state
          val batch = rows.toArray.sortBy(r =>
            (r.getDouble(2), if (r.getBoolean(3)) 0 else 1, r.getLong(1)))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Row]
          batch.foreach { r =>
            val t = r.getDouble(2)
            if (r.getBoolean(3)) {
              if (st == null || t > st.rt ||
                  (t == st.rt && r.getLong(1) >= st.rid))
                st = AsofState(t, r.getLong(1),
                  if (r.isNullAt(4)) Double.NaN else r.getDouble(4))
            } else {
              // st.rt <= t guards the backward contract against a query
              // arriving out-of-order behind an already-advanced state
              if (st != null && st.rt <= t && t - st.rt <= tolerance)
                out += Row(key, r.getLong(1), t, st.rt, st.rid,
                  if (st.v.isNaN) null else st.v)
              else
                out += Row(key, r.getLong(1), t, null, null, null)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }(Encoders.product[AsofState], outEnc).toDF()
  }

  /** Streaming twin of [[graft.text.Indexing.topKTerms]]'s counting
    * stage: running exact term frequencies over a document stream as a
    * plain Update-mode streaming aggregation — state is one long per
    * distinct term (vocab-bounded, the canonical streaming-wordcount
    * posture); a `Top-K` sink query over the in-memory table gives the
    * live heavy hitters. */
  def streamingTermCounts(src: DataFrame, textCol: String): DataFrame =
    src.select(explode(graft.text.TextAnalysis.tokens(col(textCol)))
        .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Streaming corpus-quality / drift monitor — the live twin of the
    * batch cross-entropy quality filter ([[graft.text.UnigramLm]]) and
    * drift pass ([[graft.text.Drift]]): per event-time window, the mean
    * cross-entropy of incoming documents against a FIXED reference
    * unigram model, plus doc count and mean quality score. A window
    * whose mean CE jumps is a drifting / degrading ingest — the alert a
    * 100 TB pipeline wants within minutes, with the exact batch drift
    * matrix as the confirming follow-up.
    *
    * The model is driver metadata (like IVF centroids): a term→count map,
    * typically the TOP-K vocabulary of a reference corpus
    * ([[graft.text.Bpe.vocabTopK]] / [[graft.text.Indexing.topKTerms]])
    * — it ships as a map literal in the plan, so per-doc scoring is
    * MAP-ONLY (no stream-static join, no state) and the only state is
    * the windowed aggregate itself, bounded by the watermark. Terms
    * outside the model get the add-one floor 1/(N+V), exactly the batch
    * convention; docs with no tokens score the floor too (they carry no
    * evidence either way).
    *
    * @param model reference term counts; N = Σ counts, V = model size */
  def streamingQualityMonitor(src: DataFrame, textCol: String,
      tsCol: String, model: Map[String, Long],
      windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    require(model.nonEmpty, "empty reference model")
    val n = model.values.sum
    val v = model.size
    val m = typedlit(model)
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val floorP = 1.0 / (n + v).toDouble
    val ce = graft.text.TextAnalysis.bind(toks) { ts =>
      when(size(ts) === 0, -math.log(floorP))
        .otherwise(-aggregate(ts, lit(0.0), (acc, t) =>
          acc + log((coalesce(element_at(m, t), lit(0L)) + lit(1.0)) /
            lit((n + v).toDouble))) / size(ts))
    }
    src
      .withColumn("__ce", ce)
      .withColumn("__q", graft.text.TextAnalysis.qualityScore(col(textCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("time_bin"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("__ce")).as("mean_ce"),
        avg(col("__q")).as("mean_quality"))
  }

  /** Streaming PSI drift monitor — the live twin of
    * [[graft.text.Drift.populationStabilityIndex]]: per event-time
    * window, the Population Stability Index of a bounded score against
    * FIXED reference bin counts (driver metadata from a batch PSI /
    * calibration run). The windowed side bins exactly like the batch
    * operator (clamp to [0,1], equal-width, top-closed) and both sides
    * Laplace-smooth, so a window over the reference sample itself
    * scores 0. PSI > 0.25 in a live window = the ingest's score
    * distribution has shifted — page before the corpus does.
    *
    * Streaming-safe in ONE aggregate: the per-bin counts are `bins`
    * conditional sums inside the single windowed agg (no second-level
    * aggregation, which Structured Streaming forbids), and the PSI fold
    * runs in the SELECT over those bounded columns in fixed bin order.
    * State = one row per window, bounded by the watermark. */
  def streamingPsiMonitor(src: DataFrame, scoreCol: String,
      tsCol: String, refCounts: Seq[Long], windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val bins = refCounts.size
    require(bins >= 2, s"need >= 2 reference bins, got $bins")
    require(refCounts.forall(_ >= 0), "negative reference count")
    val refN = refCounts.sum
    val clamped = least(greatest(round(col(scoreCol), 6), lit(0.0)),
      lit(1.0))
    val bucket = least(floor(clamped * bins).cast("long"),
      lit(bins - 1L))
    val agg0 = src
      .filter(col(scoreCol).isNotNull)
      .withColumn("__bin", bucket)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("time_bin"))
      .agg(count(lit(1)).as("n"),
        (0 until bins).map(b =>
          sum(when(col("__bin") === b, 1L).otherwise(0L))
            .as(s"__b$b")): _*)
    // fixed-order PSI fold over the bounded per-window bin columns;
    // p from the broadcastable reference literals, q from the window
    val psi = (0 until bins).map { b =>
      val p = lit((refCounts(b) + 1).toDouble / (refN + bins).toDouble)
      val q = (col(s"__b$b") + 1).cast("double") /
        (col("n") + bins).cast("double")
      (q - p) * log(q / p)
    }.reduce(_ + _)
    agg0.select(col("time_bin"), col("n"), round(psi, 6).as("psi"))
  }

  /** Streaming Count-Min Sketch — the BOUNDED-STATE running term
    * counter (the live twin of [[graft.text.Indexing.cmsTopK]]'s
    * grid): tokens hash into the same depth×width rows and the
    * streaming aggregation keyed on (d, bucket) maintains the running
    * counters in Update mode. The state is PROVABLY ≤ depth·width rows
    * forever — where a raw streaming term-count's state grows with the
    * unbounded live vocabulary — which is the whole point of running
    * the sketch on a stream. Downstream probes terms against the
    * latest counter snapshot exactly like the batch estimate
    * (min over rows ≥ true count, never an underestimate).
    *
    * Emits (d, b, c) counter updates; no watermark needed (the
    * counters are global, not windowed — state is bounded by
    * construction, not by time). */
  def streamingCms(src: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8]: $depth")
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    src
      .select(explode(graft.text.TextAnalysis.tokens(col(textCol)))
        .as("__t"))
      .filter(length(col("__t")) > 0)
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          graft.text.Indexing.cmsBucket(col("__t"), d, width)
            .as("b"))): _*)).as("__db"))
      .groupBy(col("__db.d").as("d"), col("__db.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Per-stratum exact-k sample state: the current top-k (u, id)
    * entries, best-first. */
  case class TopKSampleState(entries: List[(Double, Long)])

  /** Streaming twin of [[graft.operators.Sampling.stratifiedExactK]]: a
    * continuously maintained exact-k deterministic sample per stratum
    * over an unbounded ingest. Membership is decided by the seeded md5
    * uniform of the ID — not by arrival order — so unlike classical
    * reservoir sampling the maintained sample is ORDER-INDEPENDENT and
    * replay-idempotent: at every instant it equals the batch operator
    * run over everything that has arrived, re-deliveries included.
    * State is O(k) per stratum (the bounded heap as a sorted list);
    * each batch that touches a stratum re-emits that stratum's full
    * current sample (Update semantics: downstream keeps the newest
    * (stratum, rank) row). Ranking matches the batch contract: highest
    * u first, ties → lower id. */
  def streamingStratifiedExactK(src: DataFrame, idCol: String,
      stratumCol: String, k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val outEnc = Encoders.row(StructType(Seq(
      StructField("stratum", StringType, nullable = false),
      StructField("rank", IntegerType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("u", DoubleType, nullable = false))))
    src.select(
        coalesce(col(stratumCol).cast("string"),
          lit(graft.operators.Sampling.NullStratum)).as("stratum"),
        col(idCol).cast("long").as("id"),
        graft.operators.Sampling.hashUniform(col(idCol), seed).as("u"))
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState[TopKSampleState, Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[Row],
            state: GroupState[TopKSampleState]) =>
          val cur = state.getOption.map(_.entries).getOrElse(Nil)
          val merged = (cur ++ rows.map(r => (r.getDouble(2), r.getLong(1))))
            .distinct // re-delivered ids merge away: same (u, id) pair
            .sortBy { case (u, id) => (-u, id) }
            .take(k)
          state.update(TopKSampleState(merged))
          merged.zipWithIndex.iterator.map { case ((u, id), i) =>
            Row(stratum, i + 1, id, u) }
      }(Encoders.product[TopKSampleState], outEnc).toDF()
  }

  /** Per-entity funnel state: steps reached so far (1-based count) and
    * the last conversion time. */
  case class FunnelState(stage: Int, t: Double)

  /** Output schema of [[streamingFunnel]]. */
  def funnelSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType, nullable = false),
    StructField("step", IntegerType, nullable = false),
    StructField("step_name", StringType, nullable = false),
    StructField("converted_ts", DoubleType, nullable = false)))

  /** Streaming twin of [[graft.operators.Funnel.funnel]]: per-entity
    * first-touch funnel progression with the same strictly-after +
    * inclusive-window step semantics, emitting ONE row per entity per
    * newly reached step — `groupBy(step).count()` downstream is the live
    * funnel. State is O(entities) and O(1) each (stage counter + last
    * conversion time). Rows are time-ordered inside each micro-batch
    * (step order breaks equal-time ties so a view processes before a
    * same-batch click); across batches events must arrive approximately
    * time-ordered per entity — a step arriving before its predecessor's
    * batch cannot retro-convert, the same processing-order contract as
    * [[streamingAsofEnrich]]. */
  def streamingFunnel(src: DataFrame, idCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], window: Double): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(window > 0, s"window must be positive, got $window")
    val stepIdx = steps.zipWithIndex.toMap
    val outEnc = Encoders.row(funnelSchema(idCol))
    src.select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("double").as("t"),
        col(typeCol).cast("string").as("et"))
      .filter(col("et").isin(steps: _*))
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Row], state: GroupState[FunnelState]) =>
          val batch = rows.toArray.sortBy(r =>
            (r.getDouble(1), stepIdx(r.getString(2))))
          var st = state.getOption.getOrElse(FunnelState(0, 0.0))
          val out = Vector.newBuilder[Row]
          batch.foreach { r =>
            val t = r.getDouble(1)
            if (st.stage < steps.length && r.getString(2) == steps(st.stage)
                && (st.stage == 0 ||
                  (t > st.t && t <= st.t + window))) {
              st = FunnelState(st.stage + 1, t)
              out += Row(key, st.stage, steps(st.stage - 1), t)
            }
          }
          state.update(st)
          out.result().iterator
      }(Encoders.product[FunnelState], outEnc).toDF()
  }

  /** Per-entity retention state: the cohort bucket and the highest
    * bucket already emitted. */
  case class RetentionState(cohort: Long, maxBucket: Long)

  /** Output schema of [[streamingRetention]]. */
  def retentionSchema(idCol: String): StructType = StructType(Seq(
    StructField(idCol, LongType, nullable = false),
    StructField("cohort", LongType, nullable = false),
    StructField("offset", LongType, nullable = false)))

  /** Streaming twin of [[graft.operators.Retention.cohortRetention]]:
    * emits ONE (entity, cohort, offset) row the first time an entity is
    * active in a new bucket — `groupBy(cohort, offset).count()`
    * downstream is the live retention triangle. State is O(1) per
    * entity (cohort + highest emitted bucket); within a micro-batch
    * buckets are processed ascending, and ACROSS batches bucket
    * activations must be non-decreasing per entity (a late bucket below
    * the high-water mark is dropped rather than double-counted — the
    * monotonic-log contract shared by the other streaming twins). */
  def streamingRetention(src: DataFrame, idCol: String,
      bucketCol: Column): DataFrame = {
    val outEnc = Encoders.row(retentionSchema(idCol))
    src.select(col(idCol).cast("long").as("id"),
        bucketCol.cast("long").as("bucket"))
      .groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroupsWithState[RetentionState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Row],
            state: GroupState[RetentionState]) =>
          val buckets = rows.map(_.getLong(1)).toArray.distinct.sorted
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Row]
          buckets.foreach { b =>
            if (st == null) {
              st = RetentionState(b, b)
              out += Row(key, b, 0L)
            } else if (b > st.maxBucket) {
              st = RetentionState(st.cohort, b)
              out += Row(key, st.cohort, b - st.cohort)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }(Encoders.product[RetentionState], outEnc).toDF()
  }

  def streamingIvfIngest(
      src: DataFrame,
      centroids: Array[Array[Double]],
      indexPath: String,
      checkpointPath: String,
      vecCol: String = "embedding"
  ): org.apache.spark.sql.streaming.StreamingQuery =
    src
      .withColumn("cell",
        graft.similarity.Similarity.cellId(col(vecCol), centroids))
      .writeStream
      .format("parquet")
      .option("path", indexPath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("cell")
      .outputMode(OutputMode.Append)
      .start()
}
