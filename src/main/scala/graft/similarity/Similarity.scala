package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, plus two sub-linear
  * scale paths — random-hyperplane LSH bucketing and IVF coarse
  * quantization. Vector math is `zip_with`/`aggregate` over array columns
  * — codegen'd, no UDFs.
  *
  * Scale design (100 TB): brute-force knn broadcasts the (small) query set
  * so the big side is never shuffled — one scan, partial top-k per
  * partition via the aggregate pushdown in TopK window + AQE. The LSH and
  * IVF paths cut the scanned fraction: LSH probes one bucket per plane
  * signature; IVF probes `nprobe` of `k` coarse cells. Centroids live on
  * the driver (k·dim doubles — trivially small) and ship as literals, so
  * cell assignment is a map-only scan that parquet-prunes if the table is
  * written partitioned by cell id.
  */
object Similarity {

  /** Dot product of two numeric array columns (double accumulation,
    * left-to-right — deterministic). Native Catalyst expression: one JVM
    * loop per pair instead of interpreted HOF evaluation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. Bit-identical
    * to dot/(sqrt(dot aa)·sqrt(dot bb)) with sequential accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSimilarity(a, b)

  /** Per-query top-k over a (query_id, neighbor_id, cosine) pair stream via
    * the bounded heap aggregate — map-side partials reduce the exchange to
    * ≤ partitions×k rows per query, vs the full Q×N pair shuffle a
    * `row_number` window would do. Output matches the window formulation
    * exactly (cosine desc, neighbor_id asc; rank 1-based). */
  private[similarity] def topKPerQuery(pairs: DataFrame, k: Int): DataFrame =
    pairs.groupBy(col("query_id"))
      .agg(graft.functions.TopKExpressions
        .topKByScore(col("cosine"), col("neighbor_id"), k).as("__nn"))
      .select(col("query_id"), posexplode(col("__nn")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        col("col.cosine").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Exact brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors. Queries are broadcast (must be small — typically a
    * batch of probes); the corpus is scanned once, never shuffled; ties
    * break on ascending corpus id for determinism. `excludeSelf` drops
    * the query's own corpus row (for queries drawn from the corpus —
    * the retrieval-eval run shape). */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      excludeSelf: Boolean = false): DataFrame = {
    val joined = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"))))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    val cand =
      if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
      else joined
    topKPerQuery(cand, k)
  }

  /** Hard-negative mining for retrieval/embedding training (the DPR/ANCE
    * recipe): for every query, the top-k corpus vectors whose cosine
    * falls in the band [lo, hi) — similar enough to be informative
    * negatives, but below the near-duplicate/positive ceiling that would
    * poison training with false negatives. `excludeSelf` drops the
    * query's own row when queries are drawn from the corpus.
    *
    * Same plan shape as [[knnBruteForce]] (broadcast queries, corpus
    * scanned once and never shuffled, bounded-heap top-k — map-side
    * partials keep the exchange at ≤ partitions·k rows per query); the
    * band filter runs BEFORE the heap, so out-of-band candidates never
    * even enter per-partition state. The cosine is ROUNDED to 6 before
    * the band compare and the ranking, so an engine's last-ulp noise can
    * neither flip a band edge nor reorder near-ties (ties break on
    * ascending neighbor id). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      lo: Double, hi: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", queryIdCol: String = "query_id",
      excludeSelf: Boolean = true): DataFrame = {
    require(lo < hi, s"empty band [$lo, $hi)")
    require(k > 0, s"k must be positive, got $k")
    val joined = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"))))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("__qv"), col("__cv")), 6).as("cosine"))
      .filter(col("cosine") >= lo && col("cosine") < hi)
    val banded =
      if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
      else joined
    topKPerQuery(banded, k)
  }

  /** Embedding-space benchmark decontamination — the SEMANTIC complement
    * to the n-gram protocol ([[graft.dedup.Dedup.ngramContamination]]):
    * paraphrased or reformatted eval items share no 8-grams with their
    * source but sit next to it in embedding space. Every corpus vector is
    * scored by its maximum rounded cosine against the (broadcast)
    * benchmark set; `contaminated = max_cosine ≥ threshold`. Ties on the
    * max break to the LOWEST benchmark id (deterministic argmax).
    *
    * Plan: corpus scanned once, never shuffled; the |C|·|B| pair stream
    * collapses by a map-side max(struct(cosine, −bench_id)) partial
    * aggregate — per-partition state is one row per corpus id, the
    * exchange ≤ partitions·|C| singleton maxima, and no heap is needed
    * for k = 1. Benchmarks are eval suites (thousands of rows): always
    * broadcastable. */
  def embeddingDecontam(corpus: DataFrame, bench: DataFrame,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding", benchIdCol: String = "bench_id")
      : DataFrame = {
    require(threshold >= -1 && threshold <= 1,
      s"threshold must be a cosine in [-1,1], got $threshold")
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .join(broadcast(bench.select(col(benchIdCol).as("__bid"),
        col(vecCol).as("__bv"))))
      .select(col(idCol),
        round(cosine(col("__cv"), col("__bv")), 6).as("__cos"),
        col("__bid"))
      .groupBy(col(idCol))
      .agg(max(struct(col("__cos"), (-col("__bid")).as("__nb")))
        .as("__m"))
      .select(col(idCol),
        col("__m.__cos").as("max_cosine"),
        (-col("__m.__nb")).as("nearest_bench_id"),
        (col("__m.__cos") >= threshold).as("contaminated"))
  }

  /** Matryoshka dimension sweep (Kusupati et al. 2022 MRL evaluation):
    * per-query recall@k of TRUNCATED-dimension cosine retrieval against
    * the full-dimension ground truth, for each candidate prefix length.
    * The operating table for choosing how many leading dimensions an
    * index actually needs — halving dims halves index bytes AND ADC
    * cost, and MRL-trained embeddings concentrate signal in the prefix,
    * so the sweep tells you where recall falls off.
    *
    * Scale: one [[knnBruteForce]] per dim over the same broadcast query
    * set — the corpus scan repeats |dims|+1 times but never shuffles;
    * each run's exchange is the bounded-heap top-k rows only. Slicing is
    * a map-only `slice` expression (no re-materialized corpus). */
  def dimensionSweep(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Seq[Int], idCol: String = "vec_id",
      vecCol: String = "embedding", queryIdCol: String = "query_id")
      : DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    require(dims.forall(_ >= 1), s"dims must be >= 1, got $dims")
    val full = knnBruteForce(corpus, queries, k, idCol, vecCol, queryIdCol)
      .localCheckpoint(true)
    dims.map { d =>
      val cT = corpus.withColumn(vecCol, slice(col(vecCol), 1, d))
      val qT = queries.withColumn(vecCol, slice(col(vecCol), 1, d))
      val approx = knnBruteForce(cT, qT, k, idCol, vecCol, queryIdCol)
      graft.text.RankingEval.annRecallAtK(full, approx, k)
        .withColumn("dim", lit(d))
    }.reduce(_ unionByName _)
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking: greedily pick `k` results that balance
    * relevance to the query against redundancy with what is already
    * picked — `score = λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s)` — the
    * standard diversity pass over a dense-retrieval shortlist (λ = 1 is
    * plain top-k; λ → 0 maximizes spread).
    *
    * Plan, in the only shape that scales to a large query batch:
    * the greedy loop is sequential in k but PARALLEL ACROSS QUERIES —
    * each of the k rounds is one `max_by` aggregate (≤ |Q| winner rows)
    * plus bounded joins, never a per-query driver loop.
    *
    *  1. shortlist: [[knnBruteForce]]'s broadcast-queries +
    *     bounded-heap plan, top-`shortlist` per query (swap in any ANN
    *     variant upstream for the 100 TB corpus — MMR only ever sees
    *     the shortlist);
    *  2. candidate vectors fetched by broadcasting the Q·N-row
    *     shortlist against the corpus scan (map-only);
    *  3. within-query pairwise cosines — Q·N² rows, computed ONCE
    *     behind an eager localCheckpoint barrier and reused by every
    *     round;
    *  4. per round: score remaining candidates, `max_by` the winner per
    *     query (ties → lowest id), update `maxSim` by joining the
    *     winners back through the pair table; localCheckpoint per round
    *     (the PageRank/CC barrier pattern) keeps lineage flat.
    *
    * Determinism contract: relevance and pair cosines are ROUNDED to 6
    * before any comparison, the MMR score is rounded after the fixed
    * `λ·rel − (1−λ)·maxSim` arithmetic (both coefficients ship as
    * full-precision literals), so the greedy trajectory replays exactly
    * in the DuckDB oracle. A query whose shortlist is exhausted before
    * round k simply stops contributing rows. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, k: Int,
      lambda: Double = 0.7, shortlist: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda not in [0,1]: $lambda")
    val top = knnBruteForce(corpus, queries, shortlist, idCol, vecCol,
        queryIdCol)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("rel"))
    // barrier: the shortlist (and the corpus scan + heap behind it) is
    // evaluated ONCE — pair generation and the round loop reuse Q·N rows
    val cand = broadcast(top).join(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rel"), col("__v"))
      .localCheckpoint(true)
    val pairSims = cand.select(col("query_id"),
        col("neighbor_id").as("__pa"), col("__v").as("__va"))
      .join(cand.select(col("query_id"), col("neighbor_id").as("__pb"),
        col("__v").as("__vb")), Seq("query_id"))
      .filter(col("__pa") =!= col("__pb"))
      .select(col("query_id"), col("__pa"), col("__pb"),
        round(cosine(col("__va"), col("__vb")), 6).as("__sim"))
      .localCheckpoint(true)
    var remaining = cand.select(col("query_id"), col("neighbor_id"),
        col("rel"))
      .withColumn("__maxSim", lit(0.0)).localCheckpoint(true)
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val scored = remaining.withColumn("__mmr",
        round(lit(lambda) * col("rel")
          - lit(1.0 - lambda) * col("__maxSim"), 6))
      val winners = scored.groupBy(col("query_id"))
        .agg(max_by(
          struct(col("neighbor_id"), col("rel"), col("__mmr")),
          struct(col("__mmr"), (-col("neighbor_id")).as("__nid")))
          .as("__w"))
        .select(col("query_id"),
          col("__w.neighbor_id").as("neighbor_id"),
          col("__w.rel").as("rel"), col("__w.__mmr").as("__mmr"))
        .withColumn("rank", lit(r))
        .localCheckpoint(true)
      selected =
        if (selected == null) winners else selected.unionByName(winners)
      if (r < k) {
        val wj = winners.select(col("query_id"),
          col("neighbor_id").as("__wid"))
        remaining = remaining.join(wj, Seq("query_id"))
          .filter(col("neighbor_id") =!= col("__wid"))
          .join(pairSims,
            pairSims("query_id") === remaining("query_id") &&
              pairSims("__pa") === remaining("neighbor_id") &&
              pairSims("__pb") === col("__wid"), "left")
          .select(remaining("query_id"), remaining("neighbor_id"),
            remaining("rel"),
            greatest(col("__maxSim"), coalesce(col("__sim"), lit(0.0)))
              .as("__maxSim"))
          .localCheckpoint(true)
      }
    }
    selected.select(col("query_id"), col("neighbor_id"),
      col("rel").as("cosine"), col("__mmr").as("mmr_score"), col("rank"))
  }

  /** All-pairs near-duplicates above a cosine threshold, blocked by a
    * coarse partition column (e.g. an IVF cell or class label): pairs are
    * only generated *within* a block, the IVF-style pruning that makes
    * near-dup feasible beyond toy sizes. Pass a constant column to force a
    * true (quadratic) all-pairs run. */
  def nearDupPairs(df: DataFrame, threshold: Double,
      blockCol: Column, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val keyed = df.select(blockCol.as("__blk"), col(idCol).as("id"),
      col(vecCol).as("v"))
    keyed.as("a").join(keyed.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — published method):
    * semantic deduplication by cluster-then-prune. Every embedding is
    * assigned to its nearest centroid (map-only scan, centroids as
    * literals), candidate pairs are generated only WITHIN a cell, and of
    * every pair with cosine ≥ threshold the higher-id member is dropped.
    * Returns the KEPT rows as (idCol, cell).
    *
    * Scale design: the quadratic pair step is bounded per cell (~N/k rows
    * each) instead of N², the same blocking that makes [[nearDupPairs]]
    * feasible — with k centroids the join does k cell-local expansions
    * that AQE can skew-split independently. Dropping is the greedy
    * one-anti-join (all `id_b` of verified pairs), the same documented
    * approximation of connected-components as
    * [[graft.dedup.Dedup.dropNearDuplicates]]; pipe [[semDedupPairs]]
    * into [[graft.dedup.Dedup.connectedComponents]] for the exact
    * keep-one-per-component variant. */
  def semDedup(df: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cells = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      cellId(col(vecCol), centroids).as("cell"))
    val dropped = semDedupPairs(df, centroids, threshold, idCol, vecCol)
      .select(col("id_b").as("id")).distinct()
    cells.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  /** [[semDedup]] with the centroid count SIZED FROM THE CORPUS — the
    * operational scale posture. SemDeDup's pair work is Σ|cell|²/2, so a
    * FIXED k at a growing corpus is quadratic: 10× the vectors with the
    * same centroids means 10× cell sizes and ~100× pair work (measured:
    * `graft.ScaleProbe semdedup`, 23.2 s fixed-8 vs 4.5 s k∝n on the
    * same 20k vectors — see BASELINE.md sf1 section). This entry point
    * keeps |cell| ≈ `targetCellSize` by training k = max(8, n/target)
    * centroids (one count + one seeded bounded sample — both
    * driver-side metadata jobs), which restores ~linear scaling.
    * Returns (kept rows, the trained centroids) so callers can reuse the
    * codebook for incremental ingest ([[writeIvfIndex]],
    * streamingIvfIngest). */
  def semDedupAuto(df: DataFrame, threshold: Double,
      targetCellSize: Long = 250L, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    require(targetCellSize > 0, "targetCellSize must be positive")
    val n = df.count()
    val k = math.max(8L, n / targetCellSize).toInt
    val centroids = trainCentroids(df, k, dim, vecCol, seed = seed)
    (semDedup(df, centroids, threshold, idCol, vecCol), centroids)
  }

  /** Exact keep-one-per-component SemDeDup: the within-cell duplicate
    * pairs feed the alternating large/small-star connected-components
    * labeling and only each component's minimum id survives — the
    * CC-exact sibling of [[semDedup]]'s greedy anti-join, for when
    * bridge-linked near-dup chains must collapse to exactly one
    * representative (same greedy-vs-CC trade as
    * [[graft.dedup.Dedup.dropNearDuplicatesCC]]). */
  def semDedupCC(df: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cells = df.select(col(idCol).as("id"),
      cellId(col(vecCol), centroids).as("cell"))
    val drop = graft.dedup.Dedup
      .connectedComponents(semDedupPairs(df, centroids, threshold, idCol,
        vecCol))
      .filter(col("id") =!= col("component"))
      .select(col("id"))
    cells.join(drop, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cell"))
  }

  /** The within-cell duplicate pairs SemDeDup prunes on: (id_a, id_b,
    * cosine) with id_a < id_b, both in the same IVF cell, cosine ≥
    * threshold. Cross-cell near-duplicates are invisible by design — the
    * published method accepts that miss in exchange for the k× blocking
    * (recall vs the unblocked [[nearDupPairs]] is pinned in
    * SimilaritySpec). */
  def semDedupPairs(df: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    nearDupPairs(df, threshold, cellId(col(vecCol), centroids),
      idCol, vecCol)

  // ------------------------------------------------ LSH (random hyperplane)

  /** Deterministic pseudo-random hyperplanes (standard normal components
    * via seeded JVM RNG — same literals on every executor; public so the
    * oracle SQL can inline the identical plane literals). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nPlanes, dim)(rng.nextGaussian())
  }

  /** Random-hyperplane signature: bit i = sign(v · plane_i). Vectors with
    * equal signatures fall in the same cosine-LSH bucket. */
  def lshSignature(vec: Column, nPlanes: Int, dim: Int,
      seed: Long = 42L): Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toSeq.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate knn via hyperplane LSH: candidates = corpus vectors whose
    * signature matches the query's, ranked by exact cosine within the
    * bucket. Smaller `nPlanes` → bigger buckets → better recall, more
    * work. Returns the same schema as [[knnBruteForce]] (recall measured
    * against it in tests). */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nPlanes: Int = 8, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", queryIdCol: String = "query_id"): DataFrame = {
    val sig = lshSignature(col(vecCol), nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      sig.as("__sig"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("__qv"), sig.as("__sig"))
    val joined = c.join(broadcast(q), Seq("__sig"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(joined, k)
  }

  // --------------------------------------------------- IVF (coarse k-means)

  /** Driver-side k-means over a bounded sample: returns `k` centroids.
    * Deterministic: seeded sample, ids-ordered init, fixed iterations.
    * Centroids are tiny (k·dim doubles) — this is metadata, not data. */
  def trainCentroids(df: DataFrame, k: Int, dim: Int,
      vecCol: String = "embedding", sampleSize: Int = 2000,
      iters: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    // Uniform seeded sample, not limit(): limit() takes whatever rows Spark
    // produces first, so data written clustered (by label/time) would train
    // centroids on one cluster and collapse recall. orderBy(rand).limit is
    // planned as TakeOrderedAndProject — a distributed per-partition top-n
    // heap, no global sort, no full count() pre-pass.
    val sample = df.select(col(vecCol))
      .orderBy(rand(seed)).limit(sampleSize).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    kmeansFit(sample, k, dim, iters, seed)
  }

  /** Distributed Lloyd refinement of a codebook over the FULL corpus —
    * the operational follow-up to [[trainCentroids]] at scale: the
    * sample-trained codebook is good enough to start from, but its cells
    * reflect 2k vectors, not 10¹¹; `iters` exact assign+recenter passes
    * over the whole table tighten it. Each iteration is ONE map-only
    * cell assignment (centroid literals on the native dot kernel — the
    * same expression the IVF scan uses) plus ONE groupBy(cell) aggregate
    * of per-dimension means (map-side partials; ≤ k rows reach the
    * driver). Nothing corpus-sized shuffles or collects.
    *
    * Centroid coordinates are quantized to `roundDecimals` after every
    * recenter with the floor(x·10ᵈ + 0.5) idiom: the mean's float
    * summation order is partitioning-dependent, and quantizing each
    * iteration's output makes the refinement deterministic across
    * engines and physical layouts (and SQL-replayable — q_kmeans_refine
    * replays two full iterations in DuckDB). Empty cells keep their
    * previous centroid (standard Lloyd convention). */
  def kmeansRefine(df: DataFrame, init: Array[Array[Double]], iters: Int,
      vecCol: String = "embedding",
      roundDecimals: Int = 6): Array[Array[Double]] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val dim = init.head.length
    val p = math.pow(10, roundDecimals)
    var cents = init
    for (_ <- 0 until iters) {
      val avgs = (0 until dim).map(j =>
        avg(element_at(col("__v"), j + 1).cast("double")).as(s"__m$j"))
      val rows = df
        .select(cellId(col(vecCol), cents).as("__cell"), col(vecCol).as("__v"))
        .groupBy(col("__cell"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val c = r.getInt(0)
        next(c) = Array.tabulate(dim)(j =>
          math.floor(r.getDouble(j + 1) * p + 0.5) / p)
      }
      cents = next
    }
    cents
  }

  /** Driver-side Lloyd iterations over an in-memory sample — shared by
    * [[trainCentroids]] (IVF) and [[trainPqCodebooks]] (per subspace). */
  private def kmeansFit(sample: Array[Array[Double]], k: Int, dim: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty training set")
    val rng = new java.util.Random(seed)
    var centroids = Array.tabulate(k)(i => sample(
      ((rng.nextInt(Int.MaxValue).toLong * sample.length) / Int.MaxValue)
        .toInt.min(sample.length - 1)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var j = 0; while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double],
      cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var j = 0
      while (j < v.length) { val x = v(j) - cs(c)(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Cell id column: index of the nearest centroid (L2), centroids as
    * literals — a map-only scan. Ranks by `c·c − 2·v·c`, which orders
    * identically to ‖v−c‖² (the v·v term is constant per row) and runs on
    * the native dot-product kernel. */
  def cellId(vec: Column, centroids: Array[Array[Double]]): Column =
    least(centroidRank(vec, centroids): _*).getField("i")

  private def centroidRank(vec: Column,
      centroids: Array[Array[Double]]): Seq[Column] =
    centroids.zipWithIndex.map { case (cen, i) =>
      val cenLit = array(cen.toSeq.map(lit): _*)
      val cc = cen.map(x => x * x).sum
      struct((lit(cc) - lit(2.0) * dot(vec, cenLit)).as("d"),
        lit(i).as("i"))
    }.toSeq

  /** Approximate knn via IVF: assign corpus to cells once, probe the
    * `nprobe` nearest cells per query, exact-rank within. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      cellId(col(vecCol), centroids).as("__cell"))
    // nprobe nearest cells per query, exploded to (query, cell) probes
    val probes = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"),
        probeCells(col(vecCol), centroids, nprobe).as("__cells"))
      .select(col("query_id"), col("__qv"),
        explode(col("__cells")).as("__cell"))
    val joined = c.join(broadcast(probes), Seq("__cell"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(joined, k)
  }

  /** The `nprobe` nearest centroid indices for a vector, as an array. */
  def probeCells(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    slice(transform(array_sort(array(centroidRank(vec, centroids): _*)),
      s => s.getField("i")), 1, nprobe)

  // ------------------------------------------- IVF as an on-disk index

  /** Persist the corpus as an ON-DISK IVF index: parquet partitioned by
    * cell id. This is the inverted file made of storage layout — each
    * coarse cell is a partition directory, so a probe-time filter on
    * `cell` prunes every non-probed directory at the SCAN and only
    * ~nprobe/k of the corpus bytes are ever read. At 100 TB this is the
    * difference between an index and a full scan. */
  def writeIvfIndex(df: DataFrame, centroids: Array[Array[Double]],
      path: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    df.select(col(idCol), col(vecCol),
        cellId(col(vecCol), centroids).as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  // ------------------------------------------- PQ (product quantization)

  /** Per-subspace codebooks for product quantization: the vector is split
    * into `m` contiguous subspaces of `dim/m` dims and each gets its own
    * `ks`-centroid k-means codebook (same driver-side seeded Lloyd's as
    * IVF, one bounded sample shared by all subspaces). Codebooks are
    * metadata: m·ks·(dim/m) = ks·dim doubles. */
  def trainPqCodebooks(df: DataFrame, m: Int, ks: Int, dim: Int,
      vecCol: String = "embedding", sampleSize: Int = 2000,
      iters: Int = 10, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val sample = df.select(col(vecCol))
      .orderBy(rand(seed)).limit(sampleSize).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
    Array.tabulate(m) { j =>
      kmeansFit(sample.map(v => v.slice(j * sub, (j + 1) * sub)),
        ks, sub, iters, seed + j)
    }
  }

  /** PQ code column: array<int> of length m — per subspace, the index of
    * the nearest sub-centroid (same `c·c − 2·v·c` rank as [[cellId]],
    * ties to the lowest index). Codebooks ship as literals; encoding is a
    * map-only scan. */
  def pqCodes(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val sub = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val sv = slice(vec, j * sub + 1, sub)
      least(cb.zipWithIndex.map { case (cen, i) =>
        val cenLit = array(cen.toSeq.map(lit): _*)
        val cc = cen.map(x => x * x).sum
        struct((lit(cc) - lit(2.0) * dot(sv, cenLit)).as("d"),
          lit(i).as("i"))
      }.toSeq: _*).getField("i")
    }.toSeq: _*)
  }

  /** Encode the corpus as PQ codes — at 100 TB you STORE this (m ints —
    * m bytes after parquet byte-packing — instead of dim floats per row,
    * a ~dim·4/m-fold compression) and search it with [[knnPqAdc]]; the
    * raw vectors are only needed for an optional exact re-rank. */
  def encodePqCorpus(df: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), pqCodes(col(vecCol), codebooks).as("pq_code"))

  /** The query-side ADC lookup table: lut(j)(i) = ‖q_j − c_{j,i}‖²
    * (sequential double accumulation, d ascending — the float-op contract
    * the oracle replays). */
  def adcLut(q: Array[Double],
      codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val sub = codebooks(0)(0).length
    Array.tabulate(codebooks.length) { j =>
      Array.tabulate(codebooks(j).length) { i =>
        val cen = codebooks(j)(i)
        var d = 0.0; var x = 0
        while (x < sub) {
          val t = q(j * sub + x) - cen(x); d += t * t; x += 1
        }
        d
      }
    }
  }

  /** Approximate knn over a PQ-coded corpus via asymmetric distance
    * computation: the (small, by contract) query batch is collected and
    * each query ships its [[adcLut]] as a literal-backed broadcast row —
    * the corpus side then does ONE array lookup per subspace per row
    * (AdcDistance), never touching vector math or the raw vectors.
    * Returns (query_id, neighbor_id, adc_dist, rank), rank by ascending
    * distance then ascending id (via the same bounded-heap top-k
    * aggregate as every other knn — score = −distance). */
  def knnPqAdc(codes: DataFrame, queries: DataFrame, k: Int,
      codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", codeCol: String = "pq_code",
      queryIdCol: String = "query_id",
      vecCol: String = "embedding",
      maxQueryBatch: Int = 65536): DataFrame = {
    val spark = codes.sparkSession
    import scala.jdk.CollectionConverters._
    val qRows = collectQueryBatch(queries, queryIdCol, vecCol,
      maxQueryBatch, "knnPqAdc").map { r =>
        val q = r.getSeq[Number](1).map(_.doubleValue()).toArray
        org.apache.spark.sql.Row(r.getAs[Number](0).longValue(),
          adcLut(q, codebooks).map(_.toSeq).toSeq)
    }
    val lutSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__lut",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          containsNull = false), nullable = false)))
    val luts = spark.createDataFrame(qRows.toSeq.asJava, lutSchema)
    val pairs = codes.select(col(idCol).as("neighbor_id"), col(codeCol))
      .join(broadcast(luts))
      .select(col("query_id"), col("neighbor_id"),
        (-graft.functions.VectorExpressions
          .adcDistance(col(codeCol), col("__lut"))).as("cosine"))
    topKPerQuery(pairs, k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine")).as("adc_dist"), col("rank"))
  }

  /** PQ search with exact re-rank — the standard two-stage ANN at scale:
    * ADC over the compressed codes produces a `shortlist`-deep candidate
    * set per query (reads only m bytes/row), then ONLY those candidates'
    * raw vectors are fetched (broadcast semi-join of a Q·shortlist-row
    * id set against the corpus — the 100 TB vector table is filtered,
    * never shuffled) and re-ranked by exact cosine. Output schema matches
    * [[knnBruteForce]]; recall is governed by `shortlist`, cost by the
    * code scan. */
  def knnPqRerank(corpus: DataFrame, codes: DataFrame, queries: DataFrame,
      k: Int, codebooks: Array[Array[Array[Double]]], shortlist: Int = 50,
      idCol: String = "vec_id", codeCol: String = "pq_code",
      queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val cand = knnPqAdc(codes, queries, shortlist, codebooks,
        idCol, codeCol, queryIdCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(corpus, cand, queries, k, idCol, vecCol, queryIdCol)
  }

  /** Exact-cosine re-rank of a (query_id, neighbor_id) candidate set: only
    * the candidates' raw vectors are fetched (broadcast semi-join of the
    * Q·shortlist-row id set against the corpus — the 100 TB vector table
    * is filtered, never shuffled) and ranked per query. Output schema
    * matches [[knnBruteForce]]. */
  private def rerankExact(corpus: DataFrame, cand: DataFrame,
      queries: DataFrame, k: Int, idCol: String, vecCol: String,
      queryIdCol: String): DataFrame = {
    val candVecs = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
    val pairs = candVecs
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(pairs, k)
  }

  // --------------------------------------- SQ8 (scalar-quantized codes)

  /** Per-dimension scalar-quantization parameters — (mins, scales) with
    * scale_j = (max_j − min_j)/256 — from ONE min/max aggregate over the
    * corpus (dim-row driver metadata, like IVF centroids). Min/max of
    * floats cast to double are EXACT, so the parameter vectors replay
    * bit-for-bit in any engine. */
  def sq8Params(df: DataFrame, dim: Int,
      vecCol: String = "embedding"): (Array[Double], Array[Double]) = {
    require(dim > 0, s"dim must be positive, got $dim")
    val aggs = (0 until dim).flatMap { j =>
      val x = element_at(col(vecCol), j + 1).cast("double")
      Seq(min(x).as(s"__mn$j"), max(x).as(s"__mx$j"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val mins = Array.tabulate(dim)(j => r.getDouble(2 * j))
    val scales = Array.tabulate(dim)(j =>
      (r.getDouble(2 * j + 1) - r.getDouble(2 * j)) / 256.0)
    (mins, scales)
  }

  /** Encode the corpus as SQ8 codes + a stored reconstruction norm:
    * code_j = min(255, ⌊(x_j − min_j)/(256·scale_j/256)⌋·…) — i.e. the
    * 8-bit bin of x_j in [min_j, max_j] — and
    * sq_norm = ‖dequant(code)‖ with bin-center reconstruction
    * deq_j = min_j + (code_j + 0.5)·scale_j. At 100 TB you STORE
    * (id, code, norm): 1 byte/dim + 8 bytes instead of 4 bytes/dim — a
    * ~4× compression with near-exact recall (SQ8 is faiss's
    * ScalarQuantizer SQ8 shape), the middle ground between raw vectors
    * and PQ's ~dim·4/m×. Zero-range dimensions (scale 0) encode 0 and
    * reconstruct the constant. All arithmetic is exact-IEEE replayable:
    * floor on exact doubles, strict left-to-right dot for the norm. */
  def sq8Encode(df: DataFrame, mins: Array[Double], scales: Array[Double],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = mins.length
    val code = array((0 until dim).map { j =>
      val x = element_at(col(vecCol), j + 1).cast("double")
      if (scales(j) == 0.0) lit(0)
      else least(lit(255),
        floor((x - lit(mins(j))) / lit(scales(j) * 256.0) * 256.0))
        .cast("int")
    }: _*)
    val deq = (c: Column) => array((0 until dim).map { j =>
      lit(mins(j)) + (element_at(c, j + 1).cast("double") + lit(0.5)) *
        lit(scales(j))
    }: _*)
    df.select(col(idCol), code.as("sq_code"))
      .withColumn("sq_norm", graft.text.TextAnalysis.bind(
        deq(col("sq_code")))(d =>
        sqrt(graft.functions.VectorExpressions.dotProduct(d, d))))
  }

  /** Approximate knn over SQ8 codes via the asymmetric trick: for query
    * q, cos(q, deq(c)) = (bias_q + Σ_j w_j·c_j) / (‖q‖·sq_norm) with
    * w_j = q_j·scale_j and bias_q = Σ_j q_j·(min_j + 0.5·scale_j) — the
    * scan does ONE int-array dot against a broadcast per-query weight
    * vector and never dequantizes, reads only (id, code, norm). Scores
    * round to `scoreScale` before the bounded-heap top-k (ties → lower
    * id). Queries are collected (small by contract, like every knn
    * here); bias accumulates left-to-right (the dot-kernel fold), so
    * the DuckDB oracle replays every score bit-for-bit. */
  def knnSq8(codes: DataFrame, queries: DataFrame, k: Int,
      mins: Array[Double], scales: Array[Double],
      idCol: String = "vec_id", codeCol: String = "sq_code",
      normCol: String = "sq_norm", queryIdCol: String = "query_id",
      vecCol: String = "embedding", scoreScale: Int = 6,
      maxQueryBatch: Int = 65536): DataFrame = {
    val spark = codes.sparkSession
    import scala.jdk.CollectionConverters._
    val dim = mins.length
    val qRows = collectQueryBatch(queries, queryIdCol, vecCol,
        maxQueryBatch, "knnSq8")
      .map { r =>
        val q = r.getSeq[Number](1).map(_.doubleValue()).toArray
        require(q.length == dim, s"query dim ${q.length} != $dim")
        var bias = 0.0; var qq = 0.0; var j = 0
        while (j < dim) { // left-to-right: the dot-kernel fold contract
          bias += q(j) * (mins(j) + 0.5 * scales(j))
          qq += q(j) * q(j)
          j += 1
        }
        val w = Array.tabulate(dim)(j => q(j) * scales(j))
        org.apache.spark.sql.Row(r.getAs[Number](0).longValue(),
          w.toSeq, bias, math.sqrt(qq))
      }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__w",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        nullable = false),
      org.apache.spark.sql.types.StructField("__bias",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("__qnorm",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val qDf = spark.createDataFrame(qRows.toSeq.asJava, qSchema)
    val raw = (col("__bias") + graft.functions.VectorExpressions
      .dotProduct(col(codeCol).cast("array<double>"), col("__w"))) /
      (col("__qnorm") * col(normCol))
    val score = when(col("__qnorm") * col(normCol) === 0, lit(0.0))
      .otherwise(if (scoreScale >= 0) round(raw, scoreScale) else raw)
    val pairs = codes
      .select(col(idCol).as("neighbor_id"), col(codeCol), col(normCol))
      .join(broadcast(qDf))
      .select(col("query_id"), col("neighbor_id"), score.as("cosine"))
    topKPerQuery(pairs, k)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine").as("cosine_sq"), col("rank"))
  }

  /** Collect a "small by contract" query batch for the driver-side LUT
    * kNN paths — and ENFORCE the contract: the collect is capped at
    * `maxQueryBatch + 1` rows by a limit (so an oversized table can
    * never OOM the driver mid-collect) and one extra row trips a
    * require with an actionable message instead of a heap dump. The
    * driver-LUT paths are per-query O(dim·codebook) precomputation
    * broadcast back out; past the cap the right plan is cell-blocked
    * candidates ([[cellCandidates]]) or sharding the query batch. */
  private def collectQueryBatch(queries: DataFrame, queryIdCol: String,
      vecCol: String, maxQueryBatch: Int, caller: String)
      : Array[org.apache.spark.sql.Row] = {
    require(maxQueryBatch > 0,
      s"maxQueryBatch must be positive, got $maxQueryBatch")
    val rows = queries.select(col(queryIdCol), col(vecCol))
      .limit(maxQueryBatch + 1).collect()
    require(rows.length <= maxQueryBatch,
      s"$caller query batch exceeds maxQueryBatch=$maxQueryBatch: the " +
        "driver builds one lookup table per query, so the batch must " +
        "stay driver-sized — shard the query set, raise maxQueryBatch " +
        "deliberately, or use cellCandidates for corpus-sized queries")
    rows
  }

  // ------------------------------------- IVF+PQ (the composed ANN index)

  private def probeLutSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("query_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("__cell",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("__lut",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        containsNull = false), nullable = false)))

  /** Driver-side probe rows for a (small, by contract) collected query
    * batch: one row per (query, probed cell), each carrying the query's
    * [[adcLut]]. Cell ranking replays [[cellId]]'s exact float ops —
    * `d = c·c − 2·q·c` with the same left-to-right double accumulation as
    * the native DotProduct kernel — so the probed set is bit-identical to
    * the column formulation and to the oracle SQL. Also returns the
    * distinct probed cells (sorted) for partition pruning. */
  private def probeLutRows(queries: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nprobe: Int,
      queryIdCol: String, vecCol: String)
      : (Seq[org.apache.spark.sql.Row], Array[Int]) = {
    val ccs = centroids.map(c => c.map(x => x * x).sum)
    val rows = queries.select(col(queryIdCol), col(vecCol)).collect()
      .toSeq.flatMap { r =>
        val q = r.getSeq[Number](1).map(_.doubleValue()).toArray
        val probed = centroids.indices.map { i =>
          var acc = 0.0; var j = 0
          while (j < q.length) { acc += q(j) * centroids(i)(j); j += 1 }
          (ccs(i) - 2.0 * acc, i)
        }.sorted.take(nprobe)
        val lut = adcLut(q, codebooks).map(_.toSeq).toSeq
        probed.map { case (_, cell) =>
          org.apache.spark.sql.Row(r.getAs[Number](0).longValue(), cell, lut)
        }
      }
    (rows, rows.map(_.getInt(1)).distinct.sorted.toArray)
  }

  /** ADC shortlist within probed cells: `coded` is (neighbor_id, __cell,
    * __code), `probes` is the [[probeLutRows]] frame. One broadcast join
    * on the cell id — only probed-cell rows ever produce pairs — then the
    * bounded-heap top-`shortlist` per query on ascending ADC distance
    * (ties on ascending id). */
  private def shortlistAdc(coded: DataFrame, probes: DataFrame,
      shortlist: Int): DataFrame =
    topKPerQuery(coded.join(broadcast(probes), Seq("__cell"))
      .select(col("query_id"), col("neighbor_id"),
        (-graft.functions.VectorExpressions
          .adcDistance(col("__code"), col("__lut"))).as("cosine")),
      shortlist)
      .select(col("query_id"), col("neighbor_id"))

  /** FAISS-style IVF+PQ composed search (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search" — the IVFADC system): the
    * coarse quantizer routes each query to `nprobe` cells, ADC over the
    * m-int PQ codes ranks ONLY those cells' members into a
    * `shortlist`-deep candidate set, and only the shortlist's raw vectors
    * are fetched for the exact cosine re-rank. Per query the scan cost is
    * ~nprobe/k_cells of the corpus in m-byte codes, plus `shortlist` raw
    * vectors — at 100 TB neither the full vector table nor even the full
    * code table is read. Semantics replayed by the q_ann_ivfpq oracle. */
  def knnIvfPq(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int = 2, shortlist: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (rows, _) = probeLutRows(queries, centroids, codebooks, nprobe,
      queryIdCol, vecCol)
    val probes = corpus.sparkSession.createDataFrame(
      rows.asJava, probeLutSchema)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      cellId(col(vecCol), centroids).as("__cell"),
      pqCodes(col(vecCol), codebooks).as("__code"))
    val cand = shortlistAdc(coded, probes, shortlist)
    rerankExact(corpus, cand, queries, k, idCol, vecCol, queryIdCol)
  }

  /** Persist the corpus as an ON-DISK IVF+PQ index: parquet partitioned
    * by coarse cell, rows of (id, pq_code, vec). A probe then composes
    * BOTH prunings: partition pruning opens only probed cell directories,
    * and column pruning reads only (id, pq_code) bytes for the ADC stage
    * — the raw vector column's bytes are touched only for the shortlist
    * re-rank fetch. m ints vs dim floats is a ~dim·4/m-fold reduction of
    * the bytes the candidate scan reads. */
  def writeIvfPqIndex(df: DataFrame, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    df.select(col(idCol), col(vecCol),
        cellId(col(vecCol), centroids).as("cell"),
        pqCodes(col(vecCol), codebooks).as("pq_code"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** knn over a [[writeIvfPqIndex]] index. The probed cell set is
    * computed driver-side and inlined as a literal `cell IN (...)`
    * predicate on BOTH scans (static partition pruning — non-probed
    * directories never open); the ADC scan's ReadSchema carries only
    * (id, pq_code), never the vector column (asserted in
    * SimilaritySpec). Ranking identical to [[knnIvfPq]]. */
  def knnIvfPqIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      nprobe: Int = 2, shortlist: Int = 20,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (rows, needed) = probeLutRows(queries, centroids, codebooks,
      nprobe, queryIdCol, vecCol)
    val probes = spark.createDataFrame(rows.asJava, probeLutSchema)
    val pruned = col("cell").isin(needed.map(Integer.valueOf).toSeq: _*)
    val coded = spark.read.parquet(indexPath).filter(pruned)
      .select(col(idCol).as("neighbor_id"), col("cell").as("__cell"),
        col("pq_code").as("__code"))
    val cand = shortlistAdc(coded, probes, shortlist)
    val corpus = spark.read.parquet(indexPath).filter(pruned)
      .select(col(idCol), col(vecCol))
    rerankExact(corpus, cand, queries, k, idCol, vecCol, queryIdCol)
  }

  /** knn over a [[writeIvfIndex]] index. The probed cell set is computed
    * from the (small, by contract) query batch and inlined as a literal
    * `cell IN (...)` predicate, so Spark plans STATIC partition pruning —
    * `PartitionFilters` on the scan, non-probed directories never open.
    * Ranking semantics identical to [[knnIvf]]. */
  def knnIvfIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    // probes materialized ONCE (eager localCheckpoint): both the driver
    // collect of the needed cells and the broadcast join below read the
    // checkpoint, instead of re-evaluating k×dim centroid ranks per use
    val probes = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"),
        probeCells(col(vecCol), centroids, nprobe).as("__cells"))
      .localCheckpoint(true)
    val needed = probes.select(explode(col("__cells")).as("c"))
      .distinct().collect().map(_.getInt(0)).sorted
    val corpus = spark.read.parquet(indexPath)
      .filter(col("cell").isin(needed.map(Integer.valueOf).toSeq: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col("cell").as("__cell"))
    val probeRows = probes
      .select(col("query_id"), col("__qv"),
        explode(col("__cells")).as("__cell"))
    val joined = corpus.join(broadcast(probeRows), Seq("__cell"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(joined, k)
  }

  // ------------------- Random projection (Johnson–Lindenstrauss sketch)

  /** Project a vector column onto `planes` (the rows of a random Gaussian
    * matrix): out[i] = v · plane_i. The Johnson–Lindenstrauss guarantee —
    * pairwise distances survive to within (1±ε) for targetDim =
    * O(log n / ε²) — with the planes shipped as literals, so the
    * projection is a MAP-ONLY scan-time transform (no shuffle, no state).
    * Normalization constants are dropped: cosine ranking is invariant to
    * a uniform scale of every projected vector. */
  def projectVector(vec: Column, planes: Array[Array[Double]]): Column =
    array(planes.map(p =>
      dot(vec, array(p.toSeq.map(lit): _*))): _*)

  /** ANN via random-projection shortlist + exact re-rank: corpus and
    * queries project to `targetDim` dims (same seeded planes as
    * [[hyperplanes]] — deterministic, oracle-inlinable), a brute-force
    * top-`shortlist` runs in the CHEAP projected space (dim/targetDim ×
    * less arithmetic and memory traffic per row), and only shortlist
    * survivors get exact full-dimension cosine — the classic
    * sketch-then-verify ANN recipe, complementary to LSH (no bucket-miss
    * failure mode: every query always ranks the full corpus in sketch
    * space).
    *
    * Scale design (100 TB): projection is map-only; the projected
    * shortlist pass is [[knnBruteForce]]'s broadcast-queries + bounded-
    * heap plan (the corpus is scanned, never shuffled); the re-rank
    * fetches only Q·shortlist raw vectors via a broadcast semi-join.
    * For a standing corpus, persist the projected column next to the
    * vectors and the sketch pass reads targetDim/dim of the bytes. */
  def knnRandomProjection(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, targetDim: Int = 32, seed: Long = 7L, shortlist: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    require(targetDim > 0 && targetDim <= dim,
      s"targetDim must be in 1..$dim, got $targetDim")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val planes = hyperplanes(targetDim, dim, seed)
    val pc = corpus.select(col(idCol),
      projectVector(col(vecCol), planes).as("__proj"))
    val pq = queries.select(col(queryIdCol),
      projectVector(col(vecCol), planes).as("__proj"))
    val cand = knnBruteForce(pc, pq, shortlist, idCol, "__proj", queryIdCol)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(corpus, cand, queries, k, idCol, vecCol, queryIdCol)
  }

  /** ANN via PCA-reduced shortlist + exact re-rank —
    * [[knnRandomProjection]] with DATA-DRIVEN planes: the fitted
    * [[Pca]] model's top components capture maximal corpus variance, so
    * at equal targetDim the sketch preserves more ranking signal than
    * seeded JL planes (the PCA preprocessing step of OPQ-style
    * pipelines). The sketch coordinates are exactly [[Pca.project]]'s
    * rounded centered dot products (components/means as literals —
    * map-only, quantized, so the sketch space itself is engine-exact and
    * the q_knn_pca oracle replays the full fit + both rankings).
    *
    * Same scale posture as the JL path: projection is scan-time, the
    * shortlist pass is the broadcast-queries + bounded-heap plan over
    * nComponents-wide sketches, and only Q·shortlist raw vectors are
    * fetched for the exact re-rank. */
  def knnPcaReduced(corpus: DataFrame, queries: DataFrame, k: Int,
      model: Pca.PcaModel, shortlist: Int = 100,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      roundDecimals: Int = 6): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    def sketch(df: DataFrame, id: String): DataFrame = {
      val muLit = array(model.means.map(lit): _*)
      val centered = zip_with(col(vecCol).cast("array<double>"), muLit,
        (x, m) => x - m)
      df.select(col(id),
        array(model.components.map(comp =>
          round(dot(centered, array(comp.map(lit): _*)),
            roundDecimals)): _*).as("__proj"))
    }
    val cand = knnBruteForce(sketch(corpus, idCol),
        sketch(queries, queryIdCol), shortlist, idCol, "__proj",
        queryIdCol)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(corpus, cand, queries, k, idCol, vecCol, queryIdCol)
  }

  /** Cell-blocked candidate pairs for LARGE query sets — the scale path
    * when the query side is itself corpus-sized (self-mining, bitext
    * mining) and [[knnBruteForce]]'s broadcast-the-queries plan would
    * OOM the executors and sweep O(|Q|·|C|) cosines. Every corpus vector
    * is ASSIGNED to its nearest centroid (map-only, centroid literals);
    * every query PROBES its `nprobe` nearest cells; candidates are the
    * (query, corpus) pairs meeting in a cell — produced by a plain
    * SHUFFLE join keyed on the cell id, so nothing corpus-sized is ever
    * broadcast or collected. Exchange per side is ≤ nprobe rows per
    * query + 1 row per corpus vector; pair work is Σ_cells |assigned|·
    * |probing| — the IVF blocking bound, and AQE skew-splits hot cells.
    * A pair can match at most once (assignment is unique), so no dedup
    * pass is needed.
    *
    * Returns (query_id, neighbor_id, cosine) with the cosine ROUNDED to
    * `roundDecimals` (pass -1 to skip — [[BitextMining.marginPairsAnn]]
    * keeps raw cosines to match the exact path's margin arithmetic).
    * `excludeSelf` drops query_id == neighbor_id for self-mining runs. */
  def cellCandidates(corpus: DataFrame, queries: DataFrame,
      centroids: Array[Array[Double]], nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", excludeSelf: Boolean = false,
      roundDecimals: Int = 6): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe must be in 1..${centroids.length}, got $nprobe")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__cv"), cellId(col(vecCol), centroids).as("__cell"))
    val q = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__qv"),
        explode(probeCells(col(vecCol), centroids, nprobe)).as("__cell"))
    val raw = cosine(col("__qv"), col("__cv"))
    val joined = c.join(q, Seq("__cell"))
      .select(col("query_id"), col("neighbor_id"),
        (if (roundDecimals >= 0) round(raw, roundDecimals) else raw)
          .as("cosine"))
    if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
    else joined
  }

  /** Triplets from an explicit candidate-pair stream — the pluggable
    * core shared by [[tripletMining]] (exact, broadcast candidates) and
    * [[tripletMiningAnn]] (cell-blocked candidates): positives = the
    * top-1 candidate per anchor with cosine in [posThreshold, 1.1),
    * negatives = the top-`kNeg` in [negLo, negHi), both via the
    * bounded-heap top-k (cosine desc, id asc), joined anchor-keyed.
    * `cand` must be (query_id, neighbor_id, cosine-rounded-6) with self
    * pairs already excluded; callers with an expensive candidate plan
    * should barrier it first (both band selections consume it). */
  def tripletsFromCandidates(cand: DataFrame, posThreshold: Double,
      negLo: Double, negHi: Double, kNeg: Int): DataFrame = {
    require(posThreshold > negHi,
      s"positive threshold $posThreshold must exceed the negative " +
        s"band ceiling $negHi (overlap would mine false negatives)")
    require(kNeg > 0, s"kNeg must be positive, got $kNeg")
    val pos = topKPerQuery(
        cand.filter(col("cosine") >= posThreshold && col("cosine") < 1.1), 1)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("pos_id"), col("cosine").as("pos_cos"))
    val negs = topKPerQuery(
        cand.filter(col("cosine") >= negLo && col("cosine") < negHi), kNeg)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("neg_id"), col("cosine").as("neg_cos"),
        col("rank").as("neg_rank"))
    pos.join(negs, Seq("anchor_id"))
  }

  /** [[tripletMining]] through IVF cell blocking — the shape that
    * survives a corpus-sized anchor set: candidates come from
    * [[cellCandidates]] (shuffle join on the cell id — NO full-corpus
    * broadcast, no O(n²) cosine sweep), barriered once, then the same
    * band selections and bounded heaps as the exact path. Anchors whose
    * positive or in-band negatives live outside their probed cells are
    * missed — the standard ANN recall trade, pinned against the exact
    * baseline in SimilaritySpec and measured by `graft.ScaleProbe
    * triplets` (the exact path's broadcast grows with the corpus; this
    * path's exchange stays cell-bounded). */
  def tripletMiningAnn(emb: DataFrame, posThreshold: Double, negLo: Double,
      negHi: Double, kNeg: Int, centroids: Array[Array[Double]],
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cand = cellCandidates(emb, emb, centroids, nprobe, idCol, vecCol,
        idCol, excludeSelf = true)
      .localCheckpoint(true) // both band selections read the pair stream
    tripletsFromCandidates(cand, posThreshold, negLo, negHi, kNeg)
  }

  /** Contrastive TRIPLET mining — the training-data construction for
    * embedding models (SBERT/DPR-style): for every anchor, its best
    * in-corpus positive (most-similar other vector at cosine ≥
    * `posThreshold` — pseudo-labeling by similarity, the standard
    * bootstrap when no labeled pairs exist) joined with its top-`kNeg`
    * HARD negatives from the [negLo, negHi) band ([[hardNegatives]] —
    * similar enough to be informative, below the false-negative
    * ceiling). One row per (anchor, negative); anchors missing either
    * side drop (no positive = nothing to contrast; no in-band negative
    * = only trivial negatives exist).
    *
    * Both selections ride the same broadcast-queries bounded-heap plan,
    * rank on the ROUNDED cosine (ties → ascending id — the
    * hardNegatives determinism contract), and the join is
    * anchor-keyed and k-bounded. Returns (anchor_id, pos_id, pos_cos,
    * neg_id, neg_cos, neg_rank).
    *
    * SCALE CONTRACT: this exact path passes the FULL corpus as the
    * broadcast query side of [[hardNegatives]] — the oracle baseline,
    * fine to a few hundred thousand anchors on a real cluster, O(n²)
    * and an executor-sized broadcast beyond. For web-scale corpora use
    * [[tripletMiningAnn]] (cell-blocked, nothing broadcast), or feed
    * any candidate generator into [[tripletsFromCandidates]]. */
  def tripletMining(emb: DataFrame, posThreshold: Double, negLo: Double,
      negHi: Double, kNeg: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(posThreshold > negHi,
      s"positive threshold $posThreshold must exceed the negative " +
        s"band ceiling $negHi (overlap would mine false negatives)")
    val queries = emb.select(col(idCol).as("query_id"), col(vecCol))
    val pos = hardNegatives(emb, queries, 1, posThreshold, 1.1, idCol,
        vecCol)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("pos_id"), col("cosine").as("pos_cos"))
    val negs = hardNegatives(emb, queries, kNeg, negLo, negHi, idCol,
        vecCol)
      .select(col("query_id").as("anchor_id"),
        col("neighbor_id").as("neg_id"), col("cosine").as("neg_cos"),
        col("rank").as("neg_rank"))
    pos.join(negs, Seq("anchor_id"))
  }

  /** Clustering-quality diagnostics for an IVF/SemDeDup codebook — the
    * Davies-Bouldin line of checks run BEFORE trusting a codebook with
    * a 100 TB index layout (bad centroids → skewed cells → one-task
    * probes and collapsed recall): per cell its size and SCATTER
    * (mean L2 distance of members to the centroid, the k-means
    * quantization error), plus the cell's Davies-Bouldin component
    * `max_{j≠i} (S_i + S_j) / ‖c_i − c_j‖` (lower = tighter, better
    * separated; the corpus-level DB index is the mean of this column).
    * Empty cells emit (size 0, scatter 0, NULL db_component).
    *
    * Determinism: the per-cell distance sum is a corpus-sized float
    * reduction, so each row's distance is quantized to integer
    * nano-units (floor(d·10⁹ + 0.5) — one sqrt of the exact
    * c·c − 2·v·c + v·v chain per row) and summed as DECIMAL(38,0);
    * scatters and DB components round to 6. Centroid-pair distances
    * are driver metadata math on the k·dim literals.
    *
    * Scale: ONE map-only assignment + distance scan, one k-row
    * aggregate; everything after is k²-bounded driver arithmetic. */
  def clusterQuality(df: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val k = centroids.length
    // exact per-row L2 distance to the ASSIGNED centroid: ‖v‖² is one
    // native dot, the c·c − 2·v·c rank term is cellId's own arithmetic
    val vv = graft.functions.VectorExpressions
      .dotProduct(col(vecCol), col(vecCol))
    val dist = sqrt(greatest(lit(0.0),
      least(centroidRank(col(vecCol), centroids): _*).getField("d") + vv))
    val rows = df
      .select(cellId(col(vecCol), centroids).as("cell"),
        floor(dist * lit(1e9) + lit(0.5)).cast("decimal(38,0)")
          .as("__dn"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("__dn")).as("__sum"))
      .collect()
    val sizes = new Array[Long](k)
    val scat = new Array[Double](k)
    rows.foreach { r =>
      val c = r.getInt(0)
      sizes(c) = r.getLong(1)
      scat(c) = math.floor(r.getDecimal(2).doubleValue() / 1e9 /
        r.getLong(1) * 1e6 + 0.5) / 1e6
    }
    def cdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val d = a(j) - b(j); s += d * d; j += 1 }
      math.sqrt(s)
    }
    val out = (0 until k).map { i =>
      val db =
        if (sizes(i) == 0) null
        else {
          val worst = (0 until k).filter(j => j != i && sizes(j) > 0)
            .map(j => (scat(i) + scat(j)) / cdist(centroids(i),
              centroids(j)))
          if (worst.isEmpty) null
          else java.lang.Double.valueOf(
            math.floor(worst.max * 1e6 + 0.5) / 1e6)
        }
      org.apache.spark.sql.Row(i, sizes(i), scat(i), db)
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("scatter",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("db_component",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** Embedding-space health diagnostics — the collapse/anisotropy check
    * (Ethayarajh 2019 line) run before trusting any cosine-based
    * retrieval or dedup: `anisotropy = ‖μ‖² / E[‖x‖²]` ≈ the expected
    * pairwise cosine of random vectors. Near 0 = well-spread space;
    * near 1 = all vectors point the same way and every cosine
    * threshold in the pipeline is meaningless. Also reports the mean
    * vector's norm and the mean row norm.
    *
    * Scale: ONE scalar aggregate (n, E[‖x‖], E[‖x‖²] via the native
    * dot kernel) + one per-dim sum (posexplode → dim-keyed aggregate,
    * dim-bounded output); ‖μ‖² folds over the dim-sorted collected
    * list (the ECE idiom — order pinned). Returns one row:
    * (n, dim, mean_norm, norm_of_mean, anisotropy), rounded to 6. */
  def embeddingStats(emb: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val v = col(vecCol)
    val rows = emb.filter(v.isNotNull)
      .select(v.as("__v"),
        graft.functions.VectorExpressions.dotProduct(v, v).as("__n2"))
      .localCheckpoint(true) // read by the scalar AND the per-dim pass
    val scal = rows.agg(count(lit(1)).as("n"),
      avg(sqrt(col("__n2"))).as("__mnorm"),
      avg(col("__n2")).as("__msq"))
    val dims = rows
      .select(posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(sum(col("__x").cast("double")).as("__s"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("__d"), col("__s"))))
        .as("__l"))
    val joined = dims.crossJoin(broadcast(scal))
    val mu2 = aggregate(col("__l"), lit(0.0), (acc, x) =>
      acc + (x.getField("__s") / col("n")) *
        (x.getField("__s") / col("n")))
    joined.select(col("n"),
      size(col("__l")).cast("long").as("dim"),
      round(col("__mnorm"), 6).as("mean_norm"),
      round(sqrt(mu2), 6).as("norm_of_mean"),
      round(mu2 / col("__msq"), 6).as("anisotropy"))
  }
}
