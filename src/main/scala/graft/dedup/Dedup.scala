package graft.dedup

import graft.text.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact (hash-groupBy),
  * MinHash + LSH banding, SimHash hamming-distance, and exact n-gram
  * Jaccard verification. All built from codegen'd Catalyst expressions —
  * no UDFs.
  *
  * Scale design (100 TB): the only shuffles are (a) the groupBy on the
  * 16-byte fingerprint for exact dedup — minimal key width, map-side
  * partial aggregation applies — and (b) the LSH band-bucket exchange,
  * which is the standard linear-work candidate generator; the O(n²)
  * all-pairs comparison is only ever run *within* a bucket. Exact Jaccard
  * verification joins the (small) candidate-pair set back to the shingle
  * arrays — at most 2·|candidates| rows move. AQE's skew-join splitting
  * handles pathological buckets (e.g. boilerplate shared by millions of
  * docs); `maxBucketSize` caps them outright.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.dedup.Dedup")

  // ------------------------------------------------------------ exact dedup

  /** Exact duplicate groups by normalized-text fingerprint: one row per
    * distinct content with the representative (minimum) id and the member
    * count. Filter `n_dups > 1` for the duplicates themselves. */
  def exactDuplicateGroups(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.groupBy(fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Keep exactly one row (minimum id) per distinct normalized text. */
  def dropExactDuplicates(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val keep = exactDuplicateGroups(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact-duplicate EDGES: per fingerprint group, a star from the
    * minimum id to every other member — (id_a, id_b) rows with
    * id_a < id_b, the same pair schema the near-dup detectors emit, so
    * exact dups can enter a combined duplicate graph
    * ([[multiSignalDedup]]). A star is CC-equivalent to the clique at
    * group-size−1 edges instead of O(size²). */
  def exactDuplicatePairs(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val fp = df.select(fingerprintMd5(col(textCol)).as("__fp"),
      col(idCol).cast("long").as("__id"))
    val mins = fp.groupBy(col("__fp")).agg(min(col("__id")).as("__min"))
    fp.join(mins, Seq("__fp"))
      .filter(col("__id") =!= col("__min"))
      .select(col("__min").as("id_a"), col("__id").as("id_b"))
  }

  /** Soft dedup: duplicate-aware sampling WEIGHTS instead of row drops
    * (SoftDedup, Muennighoff et al. 2023's data-constrained scaling —
    * repeated content keeps contributing, just not linearly). Every row
    * survives, annotated with its exact-duplicate cluster size `n_dups`
    * and `weight = n_dups^(-alpha)` rounded 6: `alpha = 1` makes each
    * distinct CONTENT contribute total mass 1 regardless of copy count;
    * `alpha = 0.5` square-root damping; `alpha = 0` recovers uniform.
    * Feed the weight column to the weighted samplers
    * ([[graft.operators.Sampling]]) or a loss-weighting column in the
    * trainer.
    *
    * Scale: one fingerprint aggregate (16-byte md5 keys, map-side
    * partials) + one broadcast-able |distinct|-row join back — no
    * windows, no collect. */
  def softDedupWeights(df: DataFrame, textCol: String, idCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val counts = df.groupBy(fingerprintMd5(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("n_dups"))
    df.withColumn("__fp", fingerprintMd5(col(textCol)))
      .join(counts, Seq("__fp"))
      .withColumn("weight",
        round(pow(col("n_dups").cast("double"), -alpha), 6))
      .drop("__fp")
  }

  /** Per-source duplication profile — the dedup TELEMETRY a curation
    * pipeline publishes every snapshot: how much of each source is
    * redundant (a crawl source whose dup rate jumps is the canary for a
    * broken fetcher or a mirror site). One row per source:
    * `n_docs`, `n_distinct` (distinct normalized fingerprints),
    * `n_dup_docs = n_docs − n_distinct`, `dup_rate` (rounded — the one
    * float), and `max_group` (the largest exact-duplicate cluster
    * within the source). NULL sources report under the reserved
    * [[graft.operators.Sampling.NullStratum]] sentinel rather than
    * silently merging or vanishing.
    *
    * Scale: one aggregate keyed on (source, 16-byte fingerprint) with
    * map-side partials, then one |sources|-key aggregate — the second
    * exchange is metadata-sized. Never collects, never windows. */
  def duplicationProfile(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame = {
    val src = coalesce(col(sourceCol).cast("string"),
      lit(graft.operators.Sampling.NullStratum))
    df.groupBy(src.as("source"),
        fingerprintMd5(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source"))
      .agg(sum(col("__n")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum(col("__n")) - count(lit(1))).as("n_dup_docs"),
        round((sum(col("__n")) - count(lit(1))).cast("double") /
          sum(col("__n")), 6).as("dup_rate"),
        max(col("__n")).as("max_group"))
  }

  /** Corpus-wide duplicate-cluster size histogram: one row per distinct
    * exact-duplicate group size with the number of groups of that size
    * and the documents they hold — the "how heavy is the duplicate
    * tail" distribution (a power-law tail here means boilerplate or
    * mirrors; dedup telemetry's second standard plot).
    *
    * Scale: two chained exact aggregates — per-fingerprint counts
    * (map-side partials on the 16-byte key), then a group-by on the
    * size whose key cardinality is at most the largest cluster size.
    * Cross-source by design (the same content in two sources is ONE
    * group), which is why this is not derivable from
    * [[duplicationProfile]]'s per-source rows. */
  def dupSizeHistogram(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.groupBy(fingerprintMd5(col(textCol)).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("__n").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__n")).as("n_docs"))

  /** Multi-signal dedup: union the duplicate-pair edge sets of several
    * detectors — exact fingerprints ([[exactDuplicatePairs]]), MinHash
    * LSH ([[minhashLshPairs]]), embedding near-dups
    * ([[graft.similarity.Similarity.semDedupPairs]] keyed by the same
    * ids), edit-distance pairs — into ONE duplicate graph, label its
    * connected components exactly, and keep the best-scoring member per
    * component ([[keepBestPerComponent]] semantics: highest score, ties
    * → minimum id; unpaired rows keep themselves). The curation-grade
    * property: a document flagged by ANY signal joins the cluster, and
    * transitive chains ACROSS signals (A exact-dups B, B paraphrases C)
    * collapse to one representative — separate per-signal passes keep
    * one document per signal-cluster and can still emit near-identical
    * survivors.
    *
    * Scale: the union is edge-set-sized (each detector already bounds
    * its own pair generation); CC is the alternating large/small-star
    * fixpoint on that edge set; the corpus itself is touched only by
    * the detectors and the final semi-join. */
  def multiSignalDedup(docs: DataFrame, pairSets: Seq[DataFrame],
      idCol: String, score: Column): DataFrame = {
    require(pairSets.nonEmpty, "need at least one pair set")
    val edges = pairSets.map(_.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b")))
      .reduce(_ unionByName _)
    keepBestPerComponent(docs, edges, idCol, score)
  }

  // --------------------------------------- incremental (index-probe) dedup

  /** Persist the corpus's exact-dedup fingerprint index: one
    * (fingerprint, idCol) row per distinct content, range-partitioned and
    * sorted by fingerprint so probe scans benefit from parquet row-group
    * min/max statistics and periodic compactions stay merge-friendly. */
  def writeFingerprintIndex(df: DataFrame, textCol: String, idCol: String,
      path: String, mode: String = "overwrite"): Unit =
    df.groupBy(fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .repartitionByRange(col("fingerprint"))
      .sortWithinPartitions("fingerprint")
      .write.mode(mode).parquet(path)

  /** Exact dedup of an INCREMENTAL batch against a persisted fingerprint
    * index — the operational form of [[dropExactDuplicates]] at corpus
    * scale: re-deduplicating 100 TB on every ingest is not a plan;
    * probing the index with the (small) new batch is. Returns the batch
    * rows that are genuinely new — not duplicated within the batch (the
    * minimum id is kept) and not present in the index.
    *
    * Scale shape: the index is scanned MAP-ONLY and never shuffled — the
    * batch's distinct fingerprints broadcast as the build side of a
    * LeftSemi over the index scan, producing the (≤ batch-sized) set of
    * already-known fingerprints, which then broadcasts into the final
    * anti-join. The naive `batch LEFT ANTI index` would hash-build the
    * unbuildable index side (or sort-merge-shuffle all of it); this
    * two-step probe keeps every exchange batch-sized. */
  def incrementalExactDedup(batch: DataFrame, textCol: String,
      idCol: String, indexPath: String): DataFrame = {
    val spark = batch.sparkSession
    val fp = batch.withColumn("__fp", fingerprintMd5(col(textCol)))
    // barrier: the in-batch survivors feed the index-probe build side
    // AND the final anti-join — ingest batches are bounded by contract,
    // and unbarriered each consumer re-runs the batch fingerprint
    // aggregate + semi-join against the source (r14 optimization)
    val inBatch = fp.join(
      fp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq("__fp", idCol), "left_semi")
      .localCheckpoint(true)
    val known = spark.read.parquet(indexPath)
      .select(col("fingerprint").as("__fp"))
      .join(broadcast(inBatch.select(col("__fp")).distinct()),
        Seq("__fp"), "left_semi")
    inBatch.join(broadcast(known), Seq("__fp"), "left_anti").drop("__fp")
  }

  /** Persist the [[graft.dedup.Bloom]] grid of an existing fingerprint
    * index — the compact snapshot [[incrementalExactDedupBloom]] probes
    * BEFORE touching the index. ≤ m/64 rows on disk (4 MB of longs at
    * m = 2²⁵); rewrite it whenever the index compacts. */
  def writeFingerprintBloom(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, bloomPath: String, m: Long = 1L << 22,
      k: Int = 7): Unit =
    Bloom.build(spark.read.parquet(indexPath).select(col("fingerprint")),
        "fingerprint", m, k)
      .write.mode("overwrite").parquet(bloomPath)

  /** [[incrementalExactDedup]] with a Bloom pre-filter — the shape an
    * ingest pipeline actually runs at 100 TB: the batch's distinct
    * fingerprints probe the (tiny, broadcast) grid first, and ONLY the
    * `maybe_seen` survivors pay the index semi-join. Bloom has no
    * false negatives, so the result is IDENTICAL to the plain probe
    * (spec-pinned); false positives only cost a wasted exact lookup.
    * When an ingest batch is entirely new content — the common case —
    * the maybe-set is empty and the index is NEVER READ (one driver
    * count on the grid-probed batch keys decides). */
  def incrementalExactDedupBloom(batch: DataFrame, textCol: String,
      idCol: String, indexPath: String, bloomPath: String,
      m: Long = 1L << 22, k: Int = 7): DataFrame = {
    val spark = batch.sparkSession
    val fp = batch.withColumn("__fp", fingerprintMd5(col(textCol)))
    // same in-batch barrier as incrementalExactDedup: consumed by the
    // Bloom probe's distinct keys AND the final anti-join
    val inBatch = fp.join(
      fp.groupBy(col("__fp")).agg(min(col(idCol)).as(idCol)),
      Seq("__fp", idCol), "left_semi")
      .localCheckpoint(true)
    val grid = broadcast(spark.read.parquet(bloomPath))
    val maybe = Bloom.probe(inBatch.select(col("__fp")).distinct(),
        "__fp", "__fp", grid, m, k)
      .filter(col("maybe_seen")).select(col("__fp"))
      .localCheckpoint(true) // consumed by the count AND the semi-join
    if (maybe.isEmpty) inBatch.drop("__fp")
    else {
      val known = spark.read.parquet(indexPath)
        .select(col("fingerprint").as("__fp"))
        .join(broadcast(maybe), Seq("__fp"), "left_semi")
      inBatch.join(broadcast(known), Seq("__fp"), "left_anti")
        .drop("__fp")
    }
  }

  // ------------------------------------------------------- minhash + LSH

  /** k minhash values from an array of 64-bit shingle hashes: min over
    * elements of the i-th affine family member — one multiply-add per
    * (shingle, i). Native Catalyst expression
    * (graft.functions.HashExpressions) — one tight loop per row. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    graft.functions.HashExpressions.minhashFromHashes(shingleHashes, k)

  /** LSH band keys: split the signature into `bands` rows of
    * `k/bands` values and hash each row. Two documents share a band key
    * iff that band of their signatures matches exactly. */
  def lshBandKeys(sig: Column, k: Int, bands: Int): Column = {
    val rowSize = k / bands
    require(rowSize * bands == k, s"bands=$bands must divide k=$k")
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowSize + 1, lit(rowSize)),
            v => v.cast("string"))), b).as("sig")))
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle Jaccard.
    *
    * Pipeline: shingle → k minhashes → `bands` band keys → explode →
    * self-join on (band, bandSig) → distinct candidate pairs → join back
    * to shingle arrays → exact Jaccard ≥ threshold.
    *
    * @param maxBucketSize drop degenerate buckets larger than this before
    *   pairing (boilerplate guard; reported work is lost recall on content
    *   that duplicates >maxBucketSize times — at that multiplicity exact
    *   dedup catches it anyway).
    * @param hashMode shingle hash kernel: `"xx"` (murmur/xxhash — fast
    *   production default) or `"md5"` (DuckDB-reproducible; see
    *   HashExpressions). Candidate generation and Jaccard semantics are
    *   identical — only the 64-bit hash family changes.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 5, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.6, maxBucketSize: Int = 1000,
      hashMode: String = graft.functions.HashExpressions.ModeXx): DataFrame = {
    // Shingles live only as 64-bit hashes (ShingleHashes reads n-grams off
    // the string bytes — no string arrays materialize); exact Jaccard on
    // the hash arrays equals shingle Jaccard up to 2⁻⁶⁴ collisions.
    // Persist: the hash arrays feed the signature pass AND both
    // verification joins, and the buckets feed the size filter AND both
    // sides of the candidate self-join — without a cache Spark recomputes
    // the hash chain for every use.
    val sh = df.select(col(idCol).as("id"),
      graft.functions.HashExpressions.shingleHashes(
        normalizeText(col(textCol)), shingleLen, hashMode).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = sh.select(col("id"),
      minhashSignature(col("shingles"), k).as("sig"))

    // Eager materialization barrier (the count() call): both persisted
    // frames feed MULTIPLE branches of the final plan (sh → signature +
    // two verification joins; buckets → size filter + both sides of the
    // candidate self-join). Without a barrier, the first action races the
    // branches and concurrent tasks compute the same cached partition
    // twice ("Block rdd_N already exists" warnings = silently duplicated
    // shingle/signature work). ONE count over `buckets` populates BOTH
    // caches in one wave — its plan reads `sh` exactly once (sh → sig →
    // explode), so the former separate sh.count() job was a redundant
    // driver round-trip (removed r14); every later branch hits the
    // caches.
    val buckets = sig
      .select(col("id"), explode(lshBandKeys(col("sig"), k, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.sig").as("bsig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    buckets.count() // eager: one computation wave populates sh AND buckets

    val bucketSizes = buckets.groupBy("band", "bsig")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucketSize)
    val pruned = buckets.join(bucketSizes, Seq("band", "bsig"), "left_semi")

    val cand = pruned.as("a")
      .join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val withShingles = cand
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")

    // Materialize the (small) verified pair set eagerly via
    // localCheckpoint so the big intermediates can be unpersisted here:
    // checkpoint blocks are reclaimed by the ContextCleaner when the
    // returned DataFrame is garbage-collected — no caller-side unpersist
    // contract. (On a failure-prone cluster, prefer a reliable
    // checkpoint dir or a parquet sink for the pair set.)
    val result = withShingles
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    sh.unpersist()
    buckets.unpersist()
    result
  }

  /** End-to-end corpus cleaning, the composition a training-data pipeline
    * actually runs: exact dedup (keep min id per fingerprint) then
    * MinHash-LSH near-dup removal, dropping the higher id of every
    * verified pair — the one-anti-join greedy approximation of
    * connected-component dedup (a doc surviving only via a dropped
    * "bridge" doc stays dropped, which is the conservative direction for
    * training data). Scale shape: the two linear dedup passes plus one
    * broadcast-able anti-join on the (small) drop list. */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 5, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      hashMode: String = graft.functions.HashExpressions.ModeXx): DataFrame = {
    // Barrier the exact-dedup survivors: they feed the LSH pass AND the
    // final anti-join, and dropExactDuplicates itself evaluates its
    // input twice (fingerprint aggregate + semi-join) — unbarriered,
    // each downstream consumer re-runs the whole chain against the scan
    // (q_dedup_pipeline's r13 plan re-read the corpus parquet 6+ times).
    val exact = dropExactDuplicates(df, textCol, idCol)
      .localCheckpoint(true)
    val pairs = minhashLshPairs(exact, textCol, idCol, shingleLen, k,
      bands, threshold, maxBucketSize, hashMode)
    val drop = pairs.select(col("id_b").as(idCol)).distinct()
    exact.join(drop, Seq(idCol), "left_anti")
  }

  // ------------------------------------------ connected-component dedup

  /** Connected components over an undirected pair set, via alternating
    * large-star / small-star label joins (the MapReduce CC algorithm of
    * Kiveris et al. 2014, "Connected Components in MapReduce and Beyond"
    * — public algorithm, re-expressed as DataFrame aggregates):
    *
    *   large-star: every node's strictly-larger neighbors re-attach to the
    *     minimum of its closed neighborhood;
    *   small-star: every node's smaller-or-equal neighbors (and the node)
    *     re-attach likewise.
    *
    * Alternating the two converges to per-component star graphs rooted at
    * the component minimum in O(log n) rounds. Each round is two
    * aggregate+join passes — `min` over neighborhoods, never
    * `collect_set`, so a viral doc duplicated a million times becomes a
    * wide aggregate (map-side partial) rather than a single fat row.
    * Lineage is truncated per round with an eager `localCheckpoint`.
    *
    * Returns one row per node appearing in `pairs`: (`id`, `component`)
    * where `component` is the minimum id of the node's component.
    * Isolated docs (no pair) are absent — callers treat them as their own
    * singleton component. */
  def connectedComponents(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b", maxIter: Int = 30): DataFrame = {
    // LAZY checkpoints in the fixpoint loop (optimization guide §1.2 —
    // fewer driver round-trips): the signature aggregate right below is
    // the materializing action, so an eager count() job per round would
    // only re-walk the just-persisted blocks. Consumption is strictly
    // sequential (signature → next round / except), so no consumer race
    // can double-compute the checkpoint.
    var e = pairs.select(col(idACol).as("u"), col(idBCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    // signature = (count, Σu, Σv) in one aggregate job over the
    // checkpointed frame. Equal sets have equal signatures, so a CHANGED
    // signature proves non-convergence without touching the expensive
    // set-containment check; the authoritative `except` runs only on a
    // signature match — once, at the fixed point, instead of every round.
    // (Convergence is still decided by `except`: a signature collision
    // between different sets costs one extra check, never a wrong stop.)
    def signature(df: DataFrame): (Long, Any, Any) = {
      val r = df.agg(count(lit(1)), sum(col("u")), sum(col("v"))).head
      (r.getLong(0), r.get(1), r.get(2))
    }
    var sig = signature(e)
    var iter = 0
    var converged = sig._1 == 0
    log.info(s"connectedComponents: start, ${sig._1} distinct edges")
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next)
      // both sides are distinct sets: equal size + containment ⇒ equal
      converged = nextSig == sig && next.except(e).isEmpty
      e = next
      sig = nextSig
      iter += 1
      // one line per round: on a pathological 100 TB pair graph the
      // driver log alone shows whether rounds are shrinking or thrashing
      log.info(f"connectedComponents: round $iter%d, ${nextSig._1}%d edges, " +
        f"converged=$converged%b, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    require(converged, s"connectedComponents did not converge in $maxIter " +
      "rounds — pathological id ordering? raise maxIter")
    // converged edges form stars (node → component min); roots appear only
    // on the right-hand side
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Large-star round: for each node u, re-attach every neighbor x > u to
    * m(u) = min(Γ(u) ∪ {u}). One min-aggregate + one join — skew-safe.
    * Output may carry duplicate (u, v) rows: the only consumer is
    * [[smallStar]], whose min-aggregate is duplicate-insensitive and
    * whose trailing distinct restores set semantics — paying a dedup
    * Exchange here too would shuffle the same rows twice per round
    * (map-side partial aggregation already collapses the dups before
    * smallStar's exchanges). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v"), col("u")))
      .toDF("u", "v")
    val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star round: for each node u (edges oriented large→small),
    * re-attach its smaller neighbors and u itself to the neighborhood
    * minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** [[dropNearDuplicates]] with exact connected-component semantics:
    * keep ONE doc (the minimum id) per near-duplicate cluster, where
    * clusters are the transitive closure of the verified pair set — the
    * standard training-data dedup contract. Differs from the greedy
    * one-anti-join only on "local-minimum" shapes: a doc smaller than all
    * its neighbors but not its cluster's minimum survives greedy (it never
    * appears as a pair's higher id) yet is dropped here. CC therefore
    * drops a superset — the conservative direction for training data —
    * at the price of O(log n) iterative joins over the (small) pair set
    * instead of one anti-join. */
  def dropNearDuplicatesCC(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 5, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      hashMode: String = graft.functions.HashExpressions.ModeXx): DataFrame = {
    // same exact-survivor barrier as dropNearDuplicates (multi-consumer)
    val exact = dropExactDuplicates(df, textCol, idCol)
      .localCheckpoint(true)
    val pairs = minhashLshPairs(exact, textCol, idCol, shingleLen, k,
      bands, threshold, maxBucketSize, hashMode)
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    exact.join(drop, Seq(idCol), "left_anti")
  }

  /** Cluster-aware representative selection: partition the near-duplicate
    * graph into connected components and keep, per component, the member
    * with the HIGHEST score (ties → minimum id) — the curation-grade
    * alternative to min-id keeps when duplicates differ in quality
    * (truncation, boilerplate, OCR noise): of a cluster of variants you
    * keep the longest / highest-quality one, not the one with the
    * smallest id. Rows in no pair form singleton components and keep
    * themselves. Cost past the CC labeling: one aggregate + one
    * semi-join, both keyed on bounded sets. */
  def keepBestPerComponent(df: DataFrame, pairs: DataFrame, idCol: String,
      score: Column): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = df.select(col(idCol).as("id"), score.as("__score"))
      .join(comp, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
    // max(struct) orders by score, then by −id: highest score wins and
    // equal scores resolve to the lowest id — deterministic
    val best = scored.groupBy(col("component"))
      .agg(max(struct(col("__score"), (-col("id")).as("__nid")))
        .as("__b"))
      .select((-col("__b.__nid")).as(idCol))
    df.join(best, Seq(idCol), "left_semi")
  }

  /** Exact edit-distance verification of LSH candidate pairs: keeps
    * pairs whose normalized texts are within `maxDistance` Levenshtein
    * edits — an ABSOLUTE similarity bound shingle Jaccard cannot express
    * ("≤ 3 edits" template/OCR-variant detection is length-robust where
    * a Jaccard threshold scales with document size). Candidate
    * generation stays the linear LSH path (threshold 0, so every
    * bucket-collision pair reaches the verifier); only candidate pairs'
    * texts are joined in — the corpus is never cross-joined, and the
    * quadratic Levenshtein kernel runs on candidate pairs only. */
  def editDistancePairs(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Int, shingleLen: Int = 5, k: Int = 64,
      bands: Int = 16, maxBucketSize: Int = 1000,
      hashMode: String = graft.functions.HashExpressions.ModeXx)
      : DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    val cand = minhashLshPairs(df, textCol, idCol, shingleLen, k, bands,
      0.0, maxBucketSize, hashMode).select(col("id_a"), col("id_b"))
    val txt = df.select(col(idCol).as("__tid"),
      normalizeText(col(textCol)).as("__nt"))
    cand
      .join(txt.select(col("__tid").as("id_a"), col("__nt").as("__ta")),
        "id_a")
      .join(txt.select(col("__tid").as("id_b"), col("__nt").as("__tb")),
        "id_b")
      .withColumn("edit_distance", levenshtein(col("__ta"), col("__tb")))
      .filter(col("edit_distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("edit_distance"))
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    bind(size(array_intersect(a, b)).cast("double")) { inter =>
      bind((size(a) + size(b)).cast("double") - inter) { union =>
        when(union === 0, lit(0.0)).otherwise(inter / union)
      }
    }

  /** EXACT token-set Jaccard similarity join via PREFIX FILTERING
    * (Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008 PPJoin — the
    * classic exact alternative to MinHash-LSH): every pair with token
    * Jaccard ≥ `threshold` is returned with NO false negatives (LSH
    * banding misses pairs probabilistically; this misses none), at the
    * cost of exact-verify work on the candidate set.
    *
    * The pruning theorem: order each document's distinct tokens by a
    * GLOBAL rarity order (df asc, term asc) and take the first
    * `|T| − ⌈t·|T|⌉ + 1` as its PREFIX; if Jaccard(A,B) ≥ t then
    * overlap ≥ t·|A∪B| ≥ t·max(|A|,|B|), so the prefixes must share a
    * token — candidates are generated ONLY from prefix-token
    * collisions, and rare tokens lead the prefixes, so buckets stay
    * small exactly where df is large. A length filter
    * (min/max ≥ t, as the same division compare the verify uses)
    * prunes size-incompatible pairs before verification.
    *
    * Scale: one distinct (doc, token) table (barriered — it feeds df,
    * sizes, prefixes AND the verify); the global rarity order NEVER
    * MATERIALIZES as a rank — only the RELATIVE order of a doc's own
    * tokens matters for its prefix, so each per-doc window orders by
    * `(df ASC, term ASC)` directly (the rank is an order-isomorphic
    * relabeling of that pair, so this is bit-identical to ranking
    * first) and the largest sort anywhere is one document's token set.
    * Per-doc positions are per-entity windows; the candidate join keys
    * on prefix tokens (AQE skew-splits hot ones); verification counts
    * shared tokens per candidate pair — cost tracks Σ candidate-pair
    * token overlap, never n². The prefix length guards the IEEE
    * boundary: `ceil(t·sz − 1e-9)` instead of `ceil(t·sz)`, because
    * `fl(t)·sz` can land 1 ulp ABOVE the exact rational integer (e.g.
    * 0.9·10 = 9.000000000000002) and the bare ceil would shorten the
    * prefix below the theorem's bound, silently dropping true pairs;
    * the lemma tolerates the (at most 1 token) longer prefix the
    * epsilon can produce. Returns (id_a, id_b, jaccard ≥ t,
    * rounded 6).
    *
    * Measured vs the MinHash-LSH chain (`ScaleProbe prefix_join`,
    * 20k→1M docs at t=0.9, constant pair density — table in
    * BASELINE.md round 9): at a HIGH threshold this exact join BEAT
    * the k=64/8-band LSH chain at every size ≥100k (1M docs: 206 s vs
    * 330 s) — prefixes are short at high t, so candidates ≈ true
    * pairs, while LSH pays 64 minhashes + banding + its own verify
    * regardless — AND it caught the 10/38 440 true pairs LSH's
    * banding missed. The knee is max-task growth from prefix-bucket
    * fan-out under the df skew (2.7 s → 116 s across 50×docs; AQE
    * skew-split engaged): fan-out scales with prefix LENGTH, so at
    * LOWER thresholds (t ≲ 0.7, prefixes ≈ (1−t)·|T|) candidate
    * volume explodes and the LSH chain (bounded by maxBucketSize)
    * becomes the right tool — the classic exactness/recall-vs-cost
    * crossover, now with the measured operating points. */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val tok = df.select(col(idCol).as("id"),
        explode(graft.text.TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .localCheckpoint(true)
    val sizes = tok.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    // document frequency per term — joined back so each doc's window
    // orders its OWN tokens by global rarity; no corpus-wide rank
    // window exists (the vocabulary is unbounded at web scale, and a
    // global row_number would sort it in a single task)
    val tdf = tok.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val prefix = tok.join(tdf, Seq("term"))
      .withColumn("__pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("__df").asc, col("term").asc)))
      .join(sizes, Seq("id"))
      .filter(col("__pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("id"), col("term"), col("sz"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") /
            greatest(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("__sa"), col("b.sz").as("__sb"))
      .distinct()
    val inter = cand
      .join(tok.select(col("id").as("id_a"), col("term")), Seq("id_a"))
      .join(tok.select(col("id").as("id_b"), col("term")),
        Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("__ic"))
    inter.select(col("id_a"), col("id_b"),
        round(col("__ic").cast("double") /
          (col("__sa") + col("__sb") - col("__ic")).cast("double"), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram Jaccard over a (small/filtered) document set:
    * the verification baseline the approximate paths are measured against.
    * O(n²) by construction — use only on bounded subsets; the scalable
    * path is [[minhashLshPairs]]. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      charShingles(col(textCol), n).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact all-pairs n-gram CONTAINMENT (Broder 1997's asymmetric
    * companion to [[ngramJaccardPairs]]): `C(A→B) = |S(A)∩S(B)| / |S(A)|`
    * — near 1 when A is (mostly) a substring-level subset of B even if B
    * is much larger, the partial-duplicate case symmetric Jaccard
    * structurally misses (a doc quoted inside a 10× larger page has
    * Jaccard ≤ ~0.1 but containment ≈ 1). Emits both directions per
    * unordered pair, kept when `greatest(c_a_in_b, c_b_in_a) ≥
    * threshold`; an empty shingle set contains nothing and scores 0.
    *
    * O(n²) verification baseline like [[ngramJaccardPairs]] — run on
    * bounded subsets or LSH candidates; the same shingle sets feed both
    * metrics, so the candidate generator is shared. */
  def ngramContainmentPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      charShingles(col(textCol), n).as("sh"))
    sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double")
          .as("__i"),
        size(col("a.sh")).as("__na"), size(col("b.sh")).as("__nb"))
      .select(col("id_a"), col("id_b"),
        when(col("__na") === 0, lit(0.0))
          .otherwise(col("__i") / col("__na")).as("c_a_in_b"),
        when(col("__nb") === 0, lit(0.0))
          .otherwise(col("__i") / col("__nb")).as("c_b_in_a"))
      .filter(greatest(col("c_a_in_b"), col("c_b_in_a")) >= threshold)
  }

  /** Benchmark decontamination: flag training documents that share any
    * word n-gram with a benchmark/eval corpus (the published n-gram
    * overlap protocol of GPT-3 appendix C / PaLM §9 — typically n≈13 for
    * web text; pick n so natural collisions are rare). Returns one row
    * per `train` document: (idCol, n_grams, n_hits, contaminated) where
    * `n_hits` counts the document's DISTINCT n-grams that occur anywhere
    * in `bench` and `contaminated = n_hits > 0`.
    *
    * Scale design (100 TB train / small bench): benchmark grams are
    * hashed to 8-byte longs, deduplicated and BROADCAST — eval suites
    * are MBs, so the broadcast is tiny and the train side is never
    * shuffled by the join. The per-doc rollup's exchange is ~one row per
    * document, not per gram: exploded grams of a row stay in its
    * partition, so the partial count aggregate combines map-side.
    * `hashMode` as in [[minhashLshPairs]] — xxhash64 default, md5 for a
    * DuckDB-reproducible oracle. */
  def ngramContamination(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      hashMode: String = graft.functions.HashExpressions.ModeXx)
      : DataFrame = {
    def h(c: Column): Column =
      if (hashMode == graft.functions.HashExpressions.ModeMd5)
        graft.functions.HashExpressions.md5Long(c)
      else xxhash64(c)
    val bg = bench
      .select(explode(wordShingles(col(textCol), n)).as("__g"))
      .select(h(col("__g")).as("__gh"))
      .distinct()
      .withColumn("__hit", lit(1))
    val tg = train
      .select(col(idCol), explode_outer(wordShingles(col(textCol), n))
        .as("__g"))
      // explode_outer emits a NULL gram for gram-less (short) docs so
      // they still get a result row; the hash must stay NULL for them
      // (xxhash64 would hash "no input" to a real value and count it)
      .select(col(idCol),
        when(col("__g").isNotNull, h(col("__g"))).as("__gh"))
    tg.join(broadcast(bg), Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__gh")).as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** KMV (k-minimum-values) corpus-similarity estimate — "how much does
    * snapshot B overlap snapshot A?" WITHOUT the full-intersection
    * join: over the union of both sides' distinct content fingerprints,
    * keep the k smallest hashes (unsigned md5 order); the fraction of
    * that bottom-k present on BOTH sides estimates the Jaccard of the
    * two corpora (Beyer et al. 2007 — the classic distinct-sketch
    * argument: the bottom-k of the union is a uniform sample of it).
    * Error ~1/√k, and — unlike HLL — the construction is DETERMINISTIC
    * (md5 order, ties impossible on distinct hashes), so it oracles
    * exactly.
    *
    * Plan: one distinct-fingerprint aggregate per side, one hash-keyed
    * flag merge, then a TakeOrdered(k) — the only thing that ever
    * leaves the executors is k rows plus two counts. The exact
    * distinct counts ride along (they are one aggregate each — cheap;
    * the JOIN is what KMV avoids). Returns one row:
    * (k_used, n_a, n_b, n_common_topk, jaccard_est). */
  def corpusJaccardKmv(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    // NULL texts are excluded BEFORE hashing: a NULL hash would sort
    // into the bottom-k differently per engine (Spark NULLS FIRST vs
    // DuckDB NULLS LAST) and carries no content anyway
    def hashes(df: DataFrame) = df.filter(col(textCol).isNotNull)
      .select(graft.functions.HashExpressions.md5Long(
          graft.text.TextAnalysis.normalizeText(col(textCol))).as("h"))
      .distinct()
    val merged = hashes(a).select(col("h"), lit(1L).as("__a"),
        lit(0L).as("__b"))
      .unionByName(hashes(b).select(col("h"), lit(0L).as("__a"),
        lit(1L).as("__b")))
      .groupBy(col("h"))
      .agg(max(col("__a")).as("__a"), max(col("__b")).as("__b"))
    // bottom-k in UNSIGNED hash order: the sign-bit flip makes signed
    // ordering equal unsigned ordering (TakeOrderedAndProject, never a
    // full sort)
    val bottom = merged
      .orderBy(col("h").bitwiseXOR(lit(Long.MinValue)).asc).limit(k)
    val counts = hashes(a).agg(count(lit(1)).as("n_a"))
      .crossJoin(hashes(b).agg(count(lit(1)).as("n_b")))
    bottom.groupBy()
      .agg(count(lit(1)).as("k_used"),
        sum(col("__a") * col("__b")).as("n_common_topk"))
      .crossJoin(broadcast(counts))
      .select(col("k_used"), col("n_a"), col("n_b"),
        col("n_common_topk"),
        round(col("n_common_topk").cast("double") / col("k_used"), 6)
          .as("jaccard_est"))
  }

  /** Per-document duplicate-n-gram fraction — the MEMORIZATION-RISK
    * signal (Lee et al. 2022 / the Quantifying-Memorization line: what a
    * model memorizes first is text whose n-grams repeat across the
    * corpus): for every document, the fraction of its DISTINCT word
    * n-grams that occur in ≥ `minDf` distinct documents corpus-wide.
    * Exact copies and boilerplate-heavy pages score → 1; unique prose
    * scores → 0. Complements the pairwise dedup detectors with a
    * per-doc scalar a curation gate can threshold directly.
    *
    * Scale: one explode into distinct (doc, gram-hash) pairs, one
    * gram-keyed count aggregate (the document frequency), one gram-keyed
    * join back, one per-doc rollup — all map-side-combining keyed
    * aggregates, no windows. A stop-gram's fat key group is join-side
    * skew that AQE's skew-join split handles; the df table itself is one
    * row per distinct gram. Gram-less (short/empty) docs keep a row with
    * fraction 0. `hashMode` as in [[ngramContamination]]. */
  def dupNgramFraction(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8, minDf: Int = 2,
      hashMode: String = graft.functions.HashExpressions.ModeXx)
      : DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    def h(c: Column): Column =
      if (hashMode == graft.functions.HashExpressions.ModeMd5)
        graft.functions.HashExpressions.md5Long(c)
      else xxhash64(c)
    val tg = df
      .select(col(idCol), explode_outer(wordShingles(col(textCol), n))
        .as("__g"))
      .select(col(idCol),
        when(col("__g").isNotNull, h(col("__g"))).as("__gh"))
    val dfc = tg.filter(col("__gh").isNotNull)
      .groupBy(col("__gh")).agg(count(lit(1)).as("__df"))
    tg.join(dfc, Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__gh")).as("n_grams"),
        sum(when(col("__df") >= minDf, 1L).otherwise(0L))
          .as("n_dup_grams"))
      .withColumn("dup_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_dup_grams").cast("double") / col("n_grams")))
  }

  /** [[ngramContamination]] for benchmark sets too large to broadcast as
    * exact hashes: bench grams build a Bloom filter (~1.2 bytes/gram at
    * 1% fpp vs 8 for the hash set), the train side pre-filters with a
    * map-only membership probe, and only the surviving ~(true hits +
    * fpp·grams) rows pay the exact verification join. Output is
    * IDENTICAL to [[ngramContamination]] — the exact join removes every
    * false positive — so the two share one oracle; only the plan shape
    * differs.
    *
    * Scale shape (100 TB train, large bench): the probe keeps the
    * shuffled volume at |true contamination| + fpp·|train grams| instead
    * of |train grams|; `fpp` trades filter bytes for that residual.
    * The bench gram pipeline is evaluated ONCE (eager localCheckpoint)
    * and its materialized hash set feeds the sizing count, the filter
    * aggregate and the exact verify join — bench is the small side by
    * assumption, so the checkpointed set is MBs. */
  /** The gram hash of `hashMode` — shared by the contamination ops. */
  private def gramHash(c: Column, hashMode: String): Column =
    if (hashMode == graft.functions.HashExpressions.ModeMd5)
      graft.functions.HashExpressions.md5Long(c)
    else xxhash64(c)

  /** Distinct benchmark gram hashes (the contamination reference set). */
  def benchGramHashes(bench: DataFrame, textCol: String, n: Int,
      hashMode: String): DataFrame =
    bench.select(explode(wordShingles(col(textCol), n)).as("__g"))
      .select(gramHash(col("__g"), hashMode).as("__gh")).distinct()

  /** Driver-built Bloom filter over the benchmark gram hashes — the
    * shippable membership sketch for [[ngramContaminationBloom]] and the
    * streaming contamination flag. Runs two bench-side jobs (count for
    * sizing unless `expectedGrams` is given, then the filter
    * aggregate). */
  def buildBenchGramBloom(bench: DataFrame, textCol: String, n: Int = 8,
      hashMode: String = graft.functions.HashExpressions.ModeXx,
      fpp: Double = 0.01, expectedGrams: Long = 0L)
      : org.apache.spark.util.sketch.BloomFilter =
    buildBloomFromGramHashes(
      benchGramHashes(bench, textCol, n, hashMode), fpp, expectedGrams)

  /** [[buildBenchGramBloom]] over an already-computed gram-hash frame —
    * lets [[ngramContaminationBloom]] evaluate the bench gram pipeline
    * once and feed both the filter build and the exact verify join. */
  def buildBloomFromGramHashes(gramHashes: DataFrame, fpp: Double = 0.01,
      expectedGrams: Long = 0L)
      : org.apache.spark.util.sketch.BloomFilter = {
    val expected =
      if (expectedGrams > 0) expectedGrams
      else math.max(gramHashes.count(), 1)
    gramHashes.stat.bloomFilter("__gh", expected, fpp)
  }

  def ngramContaminationBloom(train: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      hashMode: String = graft.functions.HashExpressions.ModeXx,
      fpp: Double = 0.01, expectedGrams: Long = 0L): DataFrame = {
    def h(c: Column): Column = gramHash(c, hashMode)
    // localCheckpoint: the gram pipeline (tokenize → shingle → hash →
    // distinct) feeds the sizing count, the filter aggregate AND the
    // lazy verify join — eager-checkpointing it runs the pipeline ONCE
    // and every consumer (including the caller's later action) reads the
    // materialized blocks. Bench is the small side by assumption, so the
    // checkpointed hash set is MBs.
    val bg = benchGramHashes(bench, textCol, n, hashMode)
      .localCheckpoint(true)
    val bf = buildBloomFromGramHashes(bg, fpp, expectedGrams)
    val grams = train.select(col(idCol),
      wordShingles(col(textCol), n).as("__gs"))
    val perDoc = grams.select(col(idCol),
      coalesce(size(col("__gs")).cast("long"), lit(0L)).as("n_grams"))
    val cand = grams.select(col(idCol), explode(col("__gs")).as("__g"))
      .select(col(idCol), h(col("__g")).as("__gh"))
      .filter(graft.functions.BloomExpressions
        .mightContainLong(col("__gh"), bf))
    val hits = cand.join(bg, Seq("__gh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    perDoc.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash of the document's token set: for each bit position,
    * +1 if the token-hash has the bit set else −1, summed over tokens;
    * the sign of each sum gives the fingerprint bit. Near-duplicates have
    * small hamming distance between fingerprints. `hashMode` as in
    * [[minhashLshPairs]]. */
  def simhash64(textC: Column,
      hashMode: String = graft.functions.HashExpressions.ModeXx): Column =
    graft.functions.HashExpressions.simhash64(tokens(textC), hashMode)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with hamming distance ≤ maxDist.
    * Candidate generation by the pigeonhole principle: split the 64-bit
    * key into `maxDist+1` chunks — any pair within distance maxDist agrees
    * exactly on ≥1 chunk — and bucket-join per chunk. Linear work plus
    * within-bucket pairing, like LSH. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 1000,
      hashMode: String = graft.functions.HashExpressions.ModeXx): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"),
        simhash64(col(textCol), hashMode).as("sh")),
      "id", "sh", maxDist, maxBucketSize)

  /** Near-duplicate pairs of ANY 64-bit fingerprint column (SimHash,
    * image dHash/pHash, audio chromaprints …) with hamming distance ≤
    * `maxDist` — the generic banding engine behind [[simhashPairs]].
    * Candidate generation by the pigeonhole principle: any pair within
    * distance d agrees exactly on ≥1 of d+1 chunks of the 64-bit key, so
    * the self-join runs per exact-chunk bucket — linear work plus
    * within-bucket pairing, like LSH. */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val nChunks = maxDist + 1
    val chunkBits = 64 / nChunks
    // Persist + eager barrier: the chunk frame feeds the size filter and
    // BOTH sides of the candidate self-join — without the cache, every
    // branch re-derives the fingerprints (8 upstream scans in the plan;
    // one pass cached is 16 bytes/row). Same lifecycle as
    // minhashLshPairs: the small verified pair set is materialized
    // eagerly (localCheckpoint) so the big intermediate can be unpersisted
    // before returning.
    val chunks = hashes
      .select(col(idCol).as("id"), col(hashCol).as("sh"))
      .select(col("id"), col("sh"),
        explode(transform(sequence(lit(0), lit(nChunks - 1)), c =>
          struct(c.as("chunk"),
            call_function("shiftright", col("sh"), c * chunkBits)
              .bitwiseAND(lit((1L << chunkBits) - 1)).as("ck")))).as("e"))
      .select(col("id"), col("sh"), col("e.chunk").as("chunk"),
        col("e.ck").as("ck"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    chunks.count() // one computation wave, then all consumers hit cache

    val sizes = chunks.groupBy("chunk", "ck").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucketSize)
    val pruned = chunks.join(sizes, Seq("chunk", "ck"), "left_semi")

    val result = pruned.as("a").join(pruned.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .localCheckpoint(true)
    chunks.unpersist()
    result
  }

  // ------------------------------------------- duplicated substring spans

  /** Exact duplicated-substring detection (the "dedup at the substring
    * level" of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): every length-`n` character window whose
    * hash occurs at least `minCount` times in the corpus (any repeat —
    * across documents or within one), with overlapping hits merged into
    * maximal per-document spans `[span_start, span_end)` (0-based
    * codepoint offsets; `n_windows` = merged hit count).
    *
    * Scale shape: window generation is one map-side pass
    * ([[graft.functions.HashExpressions.WindowHashes]] — O(len) per doc,
    * positions included); the only shuffle is the groupBy on the 8-byte
    * window hash (map-side partials), whose ≥minCount survivors semi-join
    * back to the window stream co-partitioned on the same key. The merge
    * window is partitioned per document and ordered by position — no
    * global ordering, no task ever holds more than one document's hits.
    * `stride > 1` trades recall for a stride-fold smaller exchange
    * (standard at 100 TB; hits then mark every covered window start a
    * stride can reach, and the merged spans widen accordingly). */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int = 40, stride: Int = 1, minCount: Int = 2,
      hashMode: String = graft.functions.HashExpressions.ModeXx): DataFrame = {
    import graft.functions.HashExpressions.windowHashes
    import org.apache.spark.sql.expressions.Window
    val wins = df.select(col(idCol).as("doc_id"),
        explode(windowHashes(col(textCol), n, stride, hashMode)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.h").as("h"))
    val dupHashes = wins.groupBy(col("h"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
    val hits = wins.join(dupHashes, Seq("h"), "left_semi")

    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val merged = hits
      .withColumn("__rme", max(col("pos") + n)
        .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__rme").isNull || col("pos") > col("__rme"), 1)
          .otherwise(0))
      .withColumn("__grp", sum(col("__new")).over(byDoc))
    merged.groupBy(col("doc_id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        max(col("pos") + n).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__grp")
  }

  /** Cut the [[duplicateSpans]] spans out of each document — the
    * "remove duplicated substrings" pass. Documents without spans pass
    * through unchanged; spans are non-overlapping and sorted by
    * construction, so the rebuild is one `aggregate` fold over at most
    * |spans-per-doc| substring concatenations. Positions are codepoint
    * offsets, matching SQL `substring` semantics. */
  def removeDuplicateSpans(df: DataFrame, spans: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spansByDoc = spans
      .groupBy(col("doc_id").as(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("__spans"))
    df.join(spansByDoc, Seq(idCol), "left")
      .withColumn("__clean", when(col("__spans").isNull, col(textCol))
        .otherwise(expr(
          s"""concat(
             |  aggregate(
             |    __spans,
             |    struct(cast('' as string) as acc, cast(0 as bigint) as lastend),
             |    (a, sp) -> struct(
             |      concat(a.acc, substring($textCol, cast(a.lastend as int) + 1,
             |                              cast(sp.s - a.lastend as int))),
             |      sp.e)).acc,
             |  substring($textCol,
             |    cast(aggregate(__spans,
             |      cast(0 as bigint), (m, sp) -> sp.e) as int) + 1,
             |    2147483647))""".stripMargin)))
      .drop("__spans")
      .withColumn(textCol, col("__clean")).drop("__clean")
  }

  // ------------------------------------------- global repeated-line dedup

  /** Per-line corpus frequency: one row per distinct line (split on `sep`)
    * with its corpus-wide occurrence count — the statistic behind
    * C4/RefinedWeb-style line-level dedup, where boilerplate (nav menus,
    * cookie banners, license footers) shows up as lines shared by many
    * documents. One explode + one groupBy on the line string; map-side
    * partial aggregation keeps the exchange at one row per distinct line
    * per partition. */
  def repeatedLineCounts(df: DataFrame, textCol: String,
      sep: String = "\n"): DataFrame =
    df.select(explode(split(col(textCol), java.util.regex.Pattern.quote(sep),
        -1)).as("line"))
      .groupBy(col("line")).agg(count(lit(1)).as("n"))

  /** Remove every occurrence of any line whose corpus-wide count reaches
    * `minCount` — the C4 / RefinedWeb line-dedup protocol (C4 §2.2 drops
    * repeated three-sentence spans; RefinedWeb and CCNet drop duplicated
    * lines outright). Returns one row per input document with the cleaned
    * `textCol`, the original line count and the number of removed lines —
    * documents whose every line was boilerplate survive with empty text,
    * so downstream length gates (not silent row loss) decide their fate.
    *
    * Scale shape (100 TB): lines are exploded once; the banned set is the
    * count≥minCount aggregate over the 16-byte md5 of each line — tiny
    * relative to the corpus (it IS the boilerplate) — and joins back by
    * hash equality, so AQE broadcasts it when it fits and falls back to a
    * linear hash-partitioned join when a pathological corpus makes it
    * huge. The rebuild is one groupBy(id) carrying (pos, line) structs:
    * ~1 row per input line, the same cardinality the explode produced. */
  def removeRepeatedLines(df: DataFrame, textCol: String, idCol: String,
      minCount: Long = 3, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
        .as(Seq("pos", "line")))
    val banned = lines
      .groupBy(md5(col("line")).as("__line_fp"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col("__line_fp"))
    val flagged = lines
      .join(banned, md5(col("line")) === banned("__line_fp"), "left")
      .withColumn("__drop", col("__line_fp").isNotNull)
    flagged.groupBy(col(idCol))
      .agg(
        coalesce(
          array_join(transform(
            array_sort(collect_list(when(!col("__drop"),
              struct(col("pos"), col("line"))))),
            s => s.getField("line")), sep),
          lit("")).as(textCol),
        count(lit(1)).as("n_lines"),
        sum(col("__drop").cast("long")).as("n_removed_lines"))
  }

  /** WITHIN-document line dedup — the complement of
    * [[removeRepeatedLines]] (which bans corpus-GLOBAL boilerplate):
    * inside each document, keep only the FIRST occurrence of every line
    * (the Dolma/RedPajama `dedupe_paragraphs` rule — scraped pages
    * repeat nav blocks and templated paragraphs within one page). Line
    * order is preserved; a line is a duplicate only of an EARLIER line
    * in the SAME document. Returns (idCol, textCol, n_lines,
    * n_removed_lines).
    *
    * Scale design (100 TB): MAP-ONLY — zero shuffle, zero aggregation.
    * The whole operation is higher-order expressions per row (split →
    * indexed filter keeping positions where `array_position` finds the
    * first match → re-join), so it composes into any scan and
    * parallelizes embarrassingly. The split array is bound ONCE
    * ([[graft.text.TextAnalysis.bind]]) so the per-line lambda touches a
    * lambda variable, not a re-evaluated subtree; the first-occurrence
    * probe is O(lines²) string compares per document — bounded by
    * document size, the same class as shingling. */
  def dedupWithinDocLines(df: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val ls0 = split(col(textCol), java.util.regex.Pattern.quote(sep), -1)
    val res = graft.text.TextAnalysis.bind(ls0) { ls =>
      val kept = filter(ls, (x, i) =>
        array_position(ls, x) === (i + 1).cast("long"))
      struct(array_join(kept, sep).as("t"),
        size(ls).cast("long").as("n"),
        (size(ls) - size(kept)).cast("long").as("r"))
    }
    df.select(col(idCol), res.as("__r"))
      .select(col(idCol), col("__r.t").as(textCol),
        col("__r.n").as("n_lines"), col("__r.r").as("n_removed_lines"))
  }

  // ------------------------------------------- cross-source overlap matrix

  /** Pairwise exact-content overlap between corpus sources: for every
    * source pair sharing at least one distinct normalized-text
    * fingerprint, the number of shared contents, each side's distinct
    * content count, and the Jaccard overlap of the two content sets —
    * the "how contaminated is source A with source B" report that decides
    * which crawls/dumps are worth keeping at 100 TB.
    *
    * Scale shape: ONE corpus scan + one groupBy on the 16-byte
    * fingerprint building the per-content source SET (collect_set is
    * bounded by the source count S, not the corpus — sources are
    * crawls/dumps, tens to hundreds). Pair counts explode a<b set
    * combinations (≤ C(S,2) rows per shared content) and per-source sizes
    * explode the same sets — both branches hang off the IDENTICAL
    * aggregate subtree, so Catalyst's ReuseExchange materializes the
    * fingerprint exchange once (a fingerprint×fingerprint self-join would
    * instead replan the corpus scan per branch — measured 4 scans and
    * ~6.5 s of constant overhead before this shape). The final size joins
    * are S-row broadcasts. */
  def sourceOverlap(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame = {
    val perFp = df.select(
        graft.text.TextAnalysis.fingerprintMd5(col(textCol)).as("fp"),
        col(sourceCol).cast("string").as("source"))
      .groupBy(col("fp")).agg(collect_set(col("source")).as("__srcs"))
    val sizes = perFp.select(explode(col("__srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = perFp.select(explode(col("__srcs")).as("sa"), col("__srcs"))
      .select(col("sa"), explode(col("__srcs")).as("sb"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("n_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** Corpus snapshot diff — the ingest-monitoring primitive: classify
    * every document of two corpus versions as `added` (id only in new),
    * `removed` (id only in old), `changed` (same id, different content
    * fingerprint) or `unchanged`. Run between crawl refreshes to bound
    * reprocessing (only added/changed docs need re-curation — feed them
    * to [[incrementalExactDedup]]) and to catch silent pipeline breaks
    * (a 40% `changed` rate between adjacent snapshots is a parser
    * regression, not the web).
    *
    * One full outer join on the id, fingerprints compared with the
    * null-safe `<=>` — linear, no windows; the join is AQE's case.
    * Returns (idCol, status, old_fp, new_fp). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val o = oldDf.select(col(idCol),
      graft.text.TextAnalysis.fingerprintMd5(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol),
      graft.text.TextAnalysis.fingerprintMd5(col(textCol)).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Rare-token suppression — the memorization/privacy scrub: every
    * whitespace token whose CORPUS-WIDE count falls below `minCount` is
    * replaced by `replacement`. Rare strings are where verbatim PII and
    * unique identifiers live (a token seen twice in 100 TB is almost
    * certainly an account number, not language), and rare-token removal
    * is the standard counter to training-time memorization of them.
    * Counting
    * is case-sensitive on RAW whitespace tokens (this operator rewrites
    * the text, so it must not fold case the way the analysis tokenizer
    * does).
    *
    * Scale design: one (token → count) aggregate (map-side partials,
    * vocab-keyed exchange); the scrub joins each token position against
    * the KEEP set (count ≥ minCount — the vocabulary HEAD, much smaller
    * than the rare tail it bans; AQE broadcasts it when it fits) and
    * rebuilds documents with the ordered-groupBy pattern
    * [[removeRepeatedLines]] established. Linear in corpus tokens; the
    * doc rebuild is the only corpus-sized exchange.
    *
    * Returns (idCol, textCol, n_tokens, n_suppressed). */
  def suppressRareTokens(df: DataFrame, textCol: String, idCol: String,
      minCount: Long, replacement: String = "<UNK>"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = df.select(col(idCol),
        posexplode(when(length(trim(col(textCol))) === 0,
          array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
          .as(Seq("pos", "tok")))
    val keep = toks
      .groupBy(md5(col("tok")).as("__fp"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col("__fp"))
    val flagged = toks
      .join(keep, md5(col("tok")) === keep("__fp"), "left")
      .withColumn("__rare", col("__fp").isNull)
    val rebuilt = flagged.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            when(col("__rare"), lit(replacement)).otherwise(col("tok"))
              .as("t")))),
          s => s.getField("t")), " ").as(textCol),
        count(lit(1)).as("n_tokens"),
        sum(col("__rare").cast("long")).as("n_suppressed"))
    // tokenless docs emit no exploded rows — join them back as empty
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_suppressed"), lit(0L)).as("n_suppressed"))
  }

  /** The LSH S-curve: probability that a pair with Jaccard `s` becomes a
    * candidate under (bands, rowsPerBand) banding — 1 − (1 − s^r)^b. */
  def lshCandidateProbability(s: Double, bands: Int,
      rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** Choose (bands, rowsPerBand) for a `signatureSize`-hash MinHash
    * signature so the banding S-curve best approximates a step at
    * `threshold` — the standard tuning (the same objective datasketch's
    * `_optimal_param` minimizes): over every (b, r) with b·r ≤
    * signatureSize, minimize
    *
    *   fpWeight · ∫₀^t P(s) ds  +  fnWeight · ∫ₜ¹ (1 − P(s)) ds
    *
    * (false positives below the threshold vs false negatives above it),
    * integrals by 1000-point midpoint sums. Driver-side closed-form
    * search over ≤ signatureSize² candidates — no data touched; feed the
    * result straight into [[minhashLshPairs]]. Raise `fnWeight` when
    * missing a true near-duplicate is worse than verifying a spurious
    * candidate (the usual dedup asymmetry: candidates get verified
    * exactly anyway, so false positives only cost compute). */
  def optimalLshParams(threshold: Double, signatureSize: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1): $threshold")
    require(signatureSize >= 2, s"signatureSize too small: $signatureSize")
    require(fpWeight >= 0 && fnWeight >= 0 && fpWeight + fnWeight > 0,
      "weights must be non-negative and not both zero")
    val steps = 1000
    var best = (1, 1)
    var bestErr = Double.MaxValue
    for (b <- 1 to signatureSize; r <- 1 to signatureSize / b) {
      var fp = 0.0
      var fn = 0.0
      var i = 0
      while (i < steps) {
        val s = (i + 0.5) / steps
        val p = lshCandidateProbability(s, b, r)
        if (s < threshold) fp += p else fn += 1.0 - p
        i += 1
      }
      val err = (fpWeight * fp + fnWeight * fn) / steps
      if (err < bestErr) { bestErr = err; best = (b, r) }
    }
    best
  }
}
