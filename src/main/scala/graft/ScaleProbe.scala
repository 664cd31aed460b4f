package graft

import org.apache.spark.sql.functions._

/** Giant-lightcurve scale probe (manual tool, not part of the driver
  * contract): push one synthetic n-observation lightcurve through the
  * relational SF² plan and report wall time and bin count. The batch
  * path would materialize n·(n−1)/2 pair triples inside ONE task — at
  * n = 2·10⁴ that is 2·10⁸ triples (~5 GB of boxed doubles); the
  * relational plan streams them through the distributed self-join
  * instead. Usage:
  *
  *   SPARK_GRAFT_PROBE_N=20000 sbt "runMain graft.ScaleProbe"
  *   SPARK_GRAFT_PROBE_BIN=size … for the quantile-edge scheme
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "20000").toInt
    val binMethod = sys.env.getOrElse("SPARK_GRAFT_PROBE_BIN", "length")
    val spark = Spark.session()
    if (args.headOption.contains("dedup")) { dedupProbe(spark, n); return }
    if (args.headOption.contains("incremental")) {
      incrementalProbe(spark, n); return
    }
    if (args.headOption.contains("cc")) { ccProbe(spark, n); return }
    if (args.headOption.contains("curation")) {
      curationProbe(spark, n); return
    }
    if (args.headOption.contains("decontam")) {
      decontamProbe(spark, n); return
    }
    if (args.headOption.contains("semdedup")) {
      semdedupProbe(spark, args.lift(1)
        .getOrElse("/root/repo/testdata-sf1")); return
    }
    if (args.headOption.contains("dsir")) { dsirProbe(spark, n); return }
    if (args.headOption.contains("kmeans")) {
      kmeansProbe(spark, args.lift(1)
        .getOrElse("/root/repo/testdata-sf1")); return
    }
    if (args.headOption.contains("lines")) { linesProbe(spark, n); return }
    if (args.headOption.contains("interval")) {
      intervalProbe(spark, n); return
    }
    if (args.headOption.contains("shards")) { shardsProbe(spark, n); return }
    if (args.headOption.contains("interleave")) {
      interleaveProbe(spark, n); return
    }
    if (args.headOption.contains("tfidf")) { tfidfProbe(spark, n); return }
    if (args.headOption.contains("pca")) { pcaProbe(spark, n); return }
    if (args.headOption.contains("pagerank")) {
      pagerankProbe(spark, n); return
    }
    if (args.headOption.contains("cms")) { cmsProbe(spark, n); return }
    if (args.headOption.contains("triplets")) {
      tripletsProbe(spark, n); return
    }
    if (args.headOption.contains("dedup_chain")) {
      dedupChainProbe(spark, n); return
    }
    if (args.headOption.contains("prefix_join")) {
      prefixJoinProbe(spark, n); return
    }
    if (args.headOption.contains("robots")) {
      robotsProbe(spark, n); return
    }
    if (args.headOption.contains("crawl_schedule")) {
      crawlScheduleProbe(spark, n); return
    }
    if (args.headOption.contains("graph_rank")) {
      graphRankProbe(spark, n); return
    }
    if (args.headOption.contains("anchors")) {
      anchorsProbe(spark, n); return
    }
    if (args.headOption.contains("multimodal")) {
      multimodalProbe(spark, n); return
    }
    if (args.headOption.contains("html")) {
      htmlProbe(spark, n); return
    }
    if (args.headOption.contains("warc")) {
      warcProbe(spark, n); return
    }
    val src = spark.range(n).select(
      lit(1L).as("user_id"),
      (col("id") * 0.37 + pmod(col("id") * 7919, lit(97)) / 100.0).as("ts_days"),
      (sin(col("id") / 50.0) * 10 + pmod(col("id"), lit(13))).as("value"),
      lit(0.1).as("err"),
      lit("g").as("event_type"),
      col("id").as("event_id"))
    val ens = graft.sources.EnsembleIO.fromDataFrame(spark, src,
      graft.core.ColumnMap.events)
    val t0 = System.nanoTime()
    val bins = graft.analysis.SF2Relational.SF2RelationalOps(ens)
      .sf2Relational(graft.analysis.sf.SFArgs(
        binMethod = binMethod, binCountTarget = 100000))
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    val pairs = n.toLong * (n - 1) / 2
    println(f"SCALE_PROBE bin=$binMethod n=$n pairs=$pairs bins=$bins $secs%.1f s")
    spark.stop()
  }

  /** Dedup scale probe: blow the sf0.1 corpus up to ~n docs by stamping
    * near-duplicate replicas (" rK" suffixes — a dup-dense worst case for
    * the verify stage), then run the production (xx-mode) MinHash-LSH
    * pass. Usage:
    *   SPARK_GRAFT_PROBE_N=50000 sbt "runMain graft.ScaleProbe dedup"
    */
  private def dedupProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
    val t0 = System.nanoTime()
    val found = graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id",
      shingleLen = 5, k = 64, bands = 8, threshold = 0.8,
      maxBucketSize = 64).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE dedup docs=${base * replicas} pairs_found=$found $secs%.1f s")
    spark.stop()
  }

  /** Incremental-dedup probe: index an n-doc corpus ONCE, then measure a
    * 1000-doc ingest probe against it vs re-deduplicating the full
    * corpus+batch — the operational claim behind
    * Dedup.incrementalExactDedup (probe cost tracks the BATCH, full
    * re-dedup tracks the CORPUS). Usage:
    *   SPARK_GRAFT_PROBE_N=500000 sbt "runMain graft.ScaleProbe incremental"
    */
  private def incrementalProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
      .localCheckpoint(true)
    val path = java.nio.file.Files.createTempDirectory("probe_fp")
      .resolve("idx").toString
    val t0 = System.nanoTime()
    graft.dedup.Dedup.writeFingerprintIndex(corpus, "text", "doc_id", path)
    val tIndex = (System.nanoTime() - t0) / 1e9
    // batch: 500 fresh docs + 500 copies of indexed content
    val batch = docs.limit(500)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" fresh")).as("text"))
      .unionByName(corpus.limit(500)
        .select((col("doc_id") + 950000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    val t1 = System.nanoTime()
    val kept = graft.dedup.Dedup.incrementalExactDedup(
      batch, "text", "doc_id", path).count()
    val tProbe = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val full = graft.dedup.Dedup.dropExactDuplicates(
      corpus.unionByName(batch), "text", "doc_id").count()
    val tFull = (System.nanoTime() - t2) / 1e9
    println(f"SCALE_PROBE incremental corpus=${base * replicas} " +
      f"index=$tIndex%.1f s probe(1000 docs)=$tProbe%.1f s kept=$kept " +
      f"full_rededup=$tFull%.1f s (kept_full=$full)")
    spark.stop()
  }

  /** Connected-component dedup probe on the same dup-dense corpus as
    * [[dedupProbe]] — measures the CC label-propagation cost ON TOP of
    * candidate generation (clusters here are replica stars, the dup-dense
    * worst case: one component per base doc). Usage:
    *   SPARK_GRAFT_PROBE_N=50000 sbt "runMain graft.ScaleProbe cc"
    */
  private def ccProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id",
      shingleLen = 5, k = 64, bands = 8, threshold = 0.8,
      maxBucketSize = 64)
    val tPairs = (System.nanoTime() - t0) / 1e9
    val comps = graft.dedup.Dedup.connectedComponents(pairs)
    val nNodes = comps.count()
    val nComps = comps.select("component").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE cc docs=${base * replicas} nodes=$nNodes " +
      f"components=$nComps pairs_stage=$tPairs%.1f s total=$secs%.1f s")
    spark.stop()
  }

  /** DSIR probe: importance-resample k=1000 from the corpus replicated to
    * ~n docs against the sf0.1 corpus as the target (replicas get
    * distinct suffix tokens, so raw is a superset distribution of the
    * target — the realistic "make the crawl look like the curated slice"
    * shape). The model aggregates stay ≤4096 rows regardless of n; cost
    * should scale with the 4 corpus scans. Usage:
    *   SPARK_GRAFT_PROBE_N=500000 sbt "runMain graft.ScaleProbe dsir"
    */
  private def dsirProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
    val target = docs
    val t0 = System.nanoTime()
    val sel = graft.operators.Dsir.resample(corpus, target, k = 1000)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE dsir docs=${base * replicas} selected=$sel " +
      f"$secs%.1f s")
    spark.stop()
  }

  /** Full-corpus Lloyd refinement probe over the sf1 embeddings (20k ×
    * 64-d): per-iteration wall time for the assign+recenter pass, k=8
    * cells. The per-iteration cost is one map-only scan + one ≤k-row
    * aggregate — linear in corpus size, constant in iterations. Usage:
    *   sbt "runMain graft.ScaleProbe kmeans [dir]"
    */
  private def kmeansProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nv = emb.count()
    var cents = SparkEntry.IvfOracleCentroids
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      cents = graft.similarity.Similarity.kmeansRefine(emb, cents, iters = 1)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE_PROBE kmeans vectors=$nv iter=$i $secs%.1f s")
    }
    spark.stop()
  }

  /** Decontamination probe at LARGE benchmark size: train = the corpus
    * replicated to ~n docs, bench = a replicated quarter of it (so the
    * reference gram set is itself large), timing the exact
    * broadcast-hash-set plan against the Bloom probe-then-verify plan
    * and asserting identical flag counts. Shows where the ~6.7× smaller
    * filter broadcast starts paying for its extra verify join. Usage:
    *   SPARK_GRAFT_PROBE_N=100000 sbt "runMain graft.ScaleProbe decontam"
    */
  private def decontamProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    def blow(df: org.apache.spark.sql.DataFrame, tag: String) =
      df.crossJoin(spark.range(replicas).select(col("id").as("rep")))
        .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
          concat(col("text"), lit(" "), lit(tag), col("rep")).as("text"))
    val train = blow(docs, "t")
    val bench = blow(docs.filter(col("doc_id") % 4 === 0), "b")
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val flagged = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE_PROBE decontam $what train=${base * replicas} " +
        f"bench=${base / 4 * replicas} flagged=$flagged $secs%.1f s")
    }
    time("exact") {
      graft.dedup.Dedup.ngramContamination(train, bench, "text",
        "doc_id", n = 8).filter(col("contaminated")).count()
    }
    time("bloom") {
      graft.dedup.Dedup.ngramContaminationBloom(train, bench, "text",
        "doc_id", n = 8).filter(col("contaminated")).count()
    }
    spark.stop()
  }

  /** End-to-end curation probe: replicate the sf0.1 corpus to ~n docs
    * (exact-duplicate replicas — the dedup stage's worst case, every base
    * doc becomes a group of `replicas`) and run the full
    * Curation.curate pipeline in production (xx) hash mode. The pipeline
    * has no quadratic stage, so wall time should track corpus size
    * linearly. Usage:
    *   SPARK_GRAFT_PROBE_N=100000 sbt "runMain graft.ScaleProbe curation"
    */
  private def curationProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    // exact replicas: text unchanged, ids offset — dedup must collapse
    // every group back to one survivor
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        col("text"))
    val bench = docs.filter(col("doc_id") < 10)
    val t0 = System.nanoTime()
    val manifest = graft.operators.Curation.curate(corpus, bench,
      rates = Map("en" -> 0.6, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.9),
      defaultRate = 0.0, capacity = 2048L, shards = 64)
    val survivors = manifest.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE curation docs=${base * replicas} " +
      f"survivors=$survivors $secs%.1f s")
    spark.stop()
  }

  /** SemDeDup cell-count scaling probe: the published method blocks
    * pair work by IVF cell, so the pair volume is Σ|cell|²/2 — with a
    * FIXED centroid count a 10× corpus means 10× cells sizes and ~100×
    * pair work (the q_semdedup driver query pins 8 literal centroids
    * for the DuckDB oracle, so ITS sf1 time is intentionally
    * quadratic). Operationally k scales with n to keep |cell| bounded;
    * this probe runs the same corpus both ways and prints both times.
    * Usage: sbt "runMain graft.ScaleProbe semdedup [dir]"
    */
  private def semdedupProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    def timeIt(label: String, centroids: Array[Array[Double]]): Unit = {
      val t0 = System.nanoTime()
      val kept = graft.similarity.Similarity
        .semDedup(emb, centroids, 0.35).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE_PROBE semdedup vecs=$nVec k=${centroids.length} " +
        f"kept=$kept $secs%.1f s [$label]")
    }
    timeIt("fixed-8 (oracle config — quadratic at scale)",
      SparkEntry.IvfOracleCentroids)
    // k ∝ n: one trained centroid per ~250 vectors keeps |cell| bounded
    val k = math.max(8, (nVec / 250).toInt)
    timeIt("k∝n (operational config)",
      graft.similarity.Similarity.trainCentroids(emb, k, dim = 64))
    spark.stop()
  }

  /** Line-dedup probe: replicate the sf0.1 corpus to ~n docs with
    * UNTAGGED text (a dup-dense worst case — every line of every
    * original reaches count ≥ replicas, so the banned set is the whole
    * distinct-line table and every doc is rebuilt), re-line into
    * 10-token lines, and run removeRepeatedLines. The claim under test:
    * cost stays linear in corpus lines even when the banned set is NOT
    * small, because the banned join degrades to a hash join on the line
    * hash, never a nested loop. Usage:
    *   SPARK_GRAFT_PROBE_N=500000 sbt "runMain graft.ScaleProbe lines"
    */
  private def linesProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        col("text"))
    val ts = split(trim(col("text")), "\\s+")
    val nl = ceil(size(ts) / lit(10.0)).cast("int")
    val lined = corpus.select(col("doc_id"),
      concat_ws("\n", transform(sequence(lit(0), greatest(nl, lit(1)) - 1),
        i => array_join(slice(ts, i * 10 + 1, lit(10)), " "))).as("text"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val out = graft.dedup.Dedup
      .removeRepeatedLines(lined, "text", "doc_id", minCount = replicas)
    val removed = out.agg(sum("n_removed_lines"), sum("n_lines")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE lines docs=${base * replicas} " +
      f"lines=${removed.getLong(1)} removed=${removed.getLong(0)} " +
      f"$secs%.1f s")
    spark.stop()
  }

  /** TF-IDF all-pairs probe — measures THE df-cap lever: a synthetic
    * corpus where every doc carries one universal stop term plus two
    * low-df tags. With the cap (maxDf = 32) the stop term prunes and
    * pair work stays linear in docs; without it (maxDf = n) the stop
    * term alone emits n(n−1)/2 candidate pairs — the quadratic cliff the
    * docstring bound names. Run at n and 2n to see the capped path scale
    * linearly while the uncapped one quadruples. Usage:
    *   SPARK_GRAFT_PROBE_N=20000 sbt "runMain graft.ScaleProbe tfidf"
    */
  private def tfidfProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val m = math.max(n / 16, 1)
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", lit("stopterm"),
        concat(lit("tag"), pmod(col("id"), lit(m))),
        concat(lit("tag"), pmod(col("id") * 7, lit(m)))).as("text"))
      .localCheckpoint(true)
    for ((label, cap) <- Seq("capped32" -> 32L, "uncapped" -> n.toLong)) {
      val t0 = System.nanoTime()
      val pairs = graft.text.Indexing.tfidfCosinePairs(corpus, "doc_id",
        "text", threshold = 0.0, maxDf = cap).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE_PROBE tfidf $label docs=$n pairs=$pairs $secs%.1f s")
    }
    spark.stop()
  }

  /** PCA probe: wall time of the two-aggregate fit (means + d² exploded
    * outer-product covariance) as the corpus replicates ×1/×4 — the
    * O(n·d²) compute scales linearly and the exchange stays at
    * partitions·d² rows regardless of n. Usage:
    *   SPARK_GRAFT_PROBE_N=4 sbt "runMain graft.ScaleProbe pca"   (×n replicas)
    */
  private def pcaProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    val reps = math.max(1, math.min(n, 64))
    val corpus = base.crossJoin(
        spark.range(reps).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep")).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    val rows = corpus.count()
    val t0 = System.nanoTime()
    val model = graft.similarity.Pca.fit(corpus, nComponents = 2,
      iters = 8)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE pca rows=$rows eig1=${model.eigenvalues(0)}%.4f " +
      f"$secs%.1f s")
    spark.stop()
  }

  /** PageRank probe: n nodes with 3 modular out-edges each (3n edges),
    * 8 rounds — wall time should scale linearly in edges since every
    * round is one join + one aggregate. Usage:
    *   SPARK_GRAFT_PROBE_N=1000000 sbt "runMain graft.ScaleProbe pagerank"
    */
  private def pagerankProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val ids = spark.range(n)
    val edges = Seq(3L, 7L, 13L).map(k =>
      ids.select(col("id").as("src"),
        ((col("id") * k + 1) % n).as("dst")))
      .reduce(_.unionByName(_))
    val t0 = System.nanoTime()
    val ranks = graft.graph.GraphRank.pageRank(edges, iters = 8)
    val top = ranks.agg(sum(col("rank")), count(lit(1))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE pagerank nodes=${top.getLong(1)} " +
      f"edges=${3L * n} mass=${top.getDouble(0)}%.6f $secs%.1f s")
    spark.stop()
  }

  /** CMS probe: n synthetic docs over a Zipf-ish vocabulary that GROWS
    * with n (10 heavy terms + n/10 unique tail terms), top-30 via the
    * exact heavy-hitter aggregate vs the 4×4096 Count-Min sketch —
    * wall time and the state-size asymmetry (exact exchanges one
    * counter PER DISTINCT TERM, the sketch a constant 16k grid), plus
    * the heavy-set agreement and the no-underestimate overcount.
    * Usage: SPARK_GRAFT_PROBE_N=1000000 sbt "runMain graft.ScaleProbe cms"
    */
  private def cmsProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    // each doc: one heavy term (10 distinct) ×5 + one unique tail term
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("h"), pmod(col("id"), lit(10))),
        concat(lit("h"), pmod(col("id"), lit(10))),
        concat(lit("h"), pmod(col("id"), lit(10))),
        concat(lit("h"), pmod(col("id"), lit(10))),
        concat(lit("h"), pmod(col("id"), lit(10))),
        concat(lit("t"), (col("id") / 10).cast("long"))).as("text"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val exact = graft.text.Indexing.topKTerms(docs, "doc_id", "text",
        k = 30)
      .collect().map(r => r.getAs[String]("term") ->
        r.getAs[Long]("tf")).toMap
    val tExact = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val sketch = graft.text.Indexing.cmsTopK(docs, k = 30, depth = 4,
        width = 4096)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val tCms = (System.nanoTime() - t1) / 1e9
    val heavy = (0 until 10).map(i => s"h$i")
    val agree = heavy.count(h => sketch.contains(h))
    val over = heavy.map(h => sketch.getOrElse(h, 0L) -
      exact.getOrElse(h, 0L)).max
    val distinctTerms = n / 10 + 10
    println(f"SCALE_PROBE cms n=$n distinct=~$distinctTerms " +
      f"exact=$tExact%.1f s cms=$tCms%.1f s state_exact=$distinctTerms " +
      f"state_cms=${4 * 4096} heavy_found=$agree/10 max_overcount=$over")
    spark.stop()
  }

  /** Interval-join probe: n synthetic events over n/1000 entities with a
    * bursty gap structure, sessionized and then interval-joined back —
    * wall time for the (key, cell) equi-join at explosion factor
    * span/bucket. Usage:
    *   SPARK_GRAFT_PROBE_N=1000000 sbt "runMain graft.ScaleProbe interval"
    */
  private def intervalProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val perUser = 1000
    val evd = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") / perUser).cast("long").as("user_id"),
      // bursts of 10 events 0.01 apart, then a 0.5-day gap
      ((pmod(col("id"), lit(perUser)) / 10).cast("long") * 0.5 +
        pmod(col("id"), lit(10)) * 0.01).as("ts_days"))
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val sess = graft.operators.Sessionize.sessionize(evd, "user_id",
        "ts_days", maxGap = 0.2, tiebreakCol = "event_id")
      .select(col("user_id"), col("session_id"),
        col("start_ts"), col("end_ts"))
    val joined = graft.operators.RangeJoin.intervalJoin(
      evd, sess, "user_id", "ts_days", "start_ts", "end_ts", bucket = 0.25)
    val rows = joined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SCALE_PROBE interval events=$n matched=$rows $secs%.1f s")
    spark.stop()
  }

  /** Shard-layout scale probe: the bucket-offset two-phase global cumsum
    * of `Packing.assignShards` vs the naive ONE-GLOBAL-WINDOW
    * formulation (every row through a single task — the plan the design
    * exists to avoid). Both produce identical layouts (spot-checked by
    * shard-count parity here; proven bit-exact in CorpusAnalysisSpec).
    * Usage: SPARK_GRAFT_PROBE_N=5000000 sbt "runMain graft.ScaleProbe shards"
    */
  private def shardsProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.range(n).select(col("id").as("doc_id"),
        (pmod(col("id") * 7919, lit(997)) + 5).as("tok"))
      .localCheckpoint(true)
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .agg(countDistinct(col("shard")).as("s"), count(lit(1)).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val t0 = System.nanoTime()
    val twoPhase = stats(graft.operators.Packing.assignShards(
      docs, "doc_id", col("tok"), tokensPerShard = 1000000L, seed = 7L))
    val t1 = System.nanoTime()
    val u = graft.operators.Sampling.hashUniform(col("doc_id"), 7L)
    val naive = stats(docs
      .withColumn("__u", u)
      .withColumn("__cum", sum(col("tok")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__u"), col("doc_id"))))
      .withColumn("shard",
        expr("(__cum - tok) div 1000000L")))
    val t2 = System.nanoTime()
    println(f"SCALE_PROBE shards n=$n " +
      f"two_phase=${(t1 - t0) / 1e9}%.1f s (shards=${twoPhase._1}) " +
      f"global_window=${(t2 - t1) / 1e9}%.1f s (shards=${naive._1}) " +
      f"equal=${twoPhase == naive}")
    spark.stop()
  }

  /** Per-stratum-rank probe: grow ONE dominant stratum (90% of rows) and
    * compare the two-phase `Sampling.stratumBucketRank` interleave plan
    * against the naive `Window.partitionBy(stratum)` formulation — wall
    * time AND the longest single task. The naive plan's max task tracks
    * the dominant stratum (it sorts it whole in one task); the two-phase
    * plan's stays roughly flat as the stratum grows 10×, because no task
    * ever sorts more than ~1/1024 of a stratum. Usage:
    *   SPARK_GRAFT_PROBE_N=2000000 sbt "runMain graft.ScaleProbe interleave"
    */
  private def interleaveProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val weights = Map("en" -> 2.0, "de" -> 1.0)
    for (size <- Seq(n, n * 10)) {
      // 90% "en": one stratum dominates, the single-task worst case
      val docs = spark.range(size).select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(10)) < 9, lit("en")).otherwise(lit("de"))
            .as("lang"))
        .localCheckpoint(true)
      val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          var cur = maxTask.get()
          while (d > cur && !maxTask.compareAndSet(cur, d))
            cur = maxTask.get()
        }
      }
      def timed(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        maxTask.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        Bench.run(df)
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(listener)
        (secs, maxTask.get())
      }
      val (tp, tpMax) = timed(graft.operators.Sampling.interleaveByWeight(
        docs, "doc_id", "lang", weights))
      val wExpr = when(col("lang") === "en", lit(2.0))
        .when(col("lang") === "de", lit(1.0)).otherwise(lit(1.0))
      val (nv, nvMax) = timed(docs
        .withColumn("__u",
          graft.operators.Sampling.hashUniform(col("doc_id"), 42L))
        .withColumn("__w", wExpr)
        .withColumn("__interleave_key",
          ((row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"))
            .orderBy(col("__u").desc, col("doc_id"))).cast("double") - 1) +
            col("__u")) / col("__w")))
      println(f"SCALE_PROBE interleave n=$size " +
        f"two_phase=$tp%.1f s (max_task=${tpMax}ms) " +
        f"stratum_window=$nv%.1f s (max_task=${nvMax}ms)")
    }
    spark.stop()
  }

  /** Wall + longest-task timing shared by the round-8 probes — the
    * interleaveProbe listener pattern as a reusable helper. */
  private def timedRun(spark: org.apache.spark.sql.SparkSession)(
      df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        var cur = maxTask.get()
        while (d > cur && !maxTask.compareAndSet(cur, d))
          cur = maxTask.get()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    Bench.run(df)
    val secs = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    (secs, maxTask.get())
  }

  /** Triplet-mining scale probe: exact [[graft.similarity.Similarity
    * .tripletMining]] (full-corpus broadcast + O(n²) cosine sweep) vs
    * [[graft.similarity.Similarity.tripletMiningAnn]] (cell-id shuffle
    * join, k ∝ n cells) at n and 4n synthetic clustered embeddings. The
    * claim under measurement: the exact path's cost grows ~quadratically
    * (every anchor sweeps the whole corpus), the ANN path's ~linearly
    * (pair work is Σ|cell|·|probing| with |cell| held ≈ constant by
    * k ∝ n). Usage:
    *   SPARK_GRAFT_PROBE_N=4000 sbt "runMain graft.ScaleProbe triplets"
    */
  private def tripletsProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    for (size <- Seq(n, n * 4)) {
      // 50 clusters of near-duplicates: center by cluster id, small
      // per-row perturbation — positives are same-cluster rows
      val dims = (0 until 64).map { j =>
        (sin((col("id") % 50 + 1) * lit(0.7 * (j + 1))) +
          lit(0.05) * sin(col("id") * lit(13.3 * (j + 1)))).as(s"d$j")
      }
      val emb = spark.range(size).select(col("id").as("vec_id"),
          array(dims: _*).as("embedding"))
        .localCheckpoint(true)
      // floor = 32: the cell id is the shuffle key, so fewer cells than
      // cores strands the pair work on |cells| tasks (measured: 8 cells
      // at n=4000 → one 14.7 s task; 32 cells → max task 2.7 s)
      val kCells = math.max(32, size / 500)
      val cents = graft.similarity.Similarity.trainCentroids(
        emb, kCells, 64)
      val (tAnn, mAnn) = timedRun(spark)(
        graft.similarity.Similarity.tripletMiningAnn(emb,
          posThreshold = 0.95, negLo = 0.2, negHi = 0.8, kNeg = 3,
          centroids = cents, nprobe = 2))
      val (tEx, mEx) = timedRun(spark)(
        graft.similarity.Similarity.tripletMining(emb,
          posThreshold = 0.95, negLo = 0.2, negHi = 0.8, kNeg = 3))
      println(f"SCALE_PROBE triplets n=$size cells=$kCells " +
        f"ann=$tAnn%.1f s (max_task=${mAnn}ms) " +
        f"exact=$tEx%.1f s (max_task=${mEx}ms)")
    }
    spark.stop()
  }

  /** Full near-dup dedup CHAIN probe — minhash-LSH pairs → connected
    * components → keep-best — as ONE run (the per-stage probes exist;
    * this measures the chain's cache/barrier interactions): per stage,
    * wall seconds and the longest task. Corpus = the sf0.1 documents
    * replicated with near-dup suffixes to ~n docs (the dedupProbe
    * fixture — every replica family is a true near-dup cluster, the
    * dup-dense worst case). Usage:
    *   SPARK_GRAFT_PROBE_N=1000000 sbt "runMain graft.ScaleProbe dedup_chain"
    */
  private def dedupChainProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = docs.count()
    val replicas = math.max(1, (n / base).toInt)
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
      .localCheckpoint(true)
    val total = base * replicas
    // stage 1: banded LSH candidate pairs + Jaccard verify
    var pairs: org.apache.spark.sql.DataFrame = null
    val (tPairs, mPairs) = timedRun(spark) {
      pairs = graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id",
          shingleLen = 5, k = 64, bands = 8, threshold = 0.8,
          maxBucketSize = 64)
        .localCheckpoint(true)
      pairs
    }
    val nPairs = pairs.count()
    // stage 2: large/small-star CC labeling over the pair graph
    var comp: org.apache.spark.sql.DataFrame = null
    val (tCc, mCc) = timedRun(spark) {
      comp = graft.dedup.Dedup.connectedComponents(pairs)
        .localCheckpoint(true)
      comp
    }
    val nComp = comp.select("component").distinct().count()
    // stage 3: keep the longest doc per component (ties → min id).
    // keepBestPerComponent recomputes CC internally — the chain is
    // measured as the operator composes in production, so the CC stage
    // above is the marginal cost readout, not a shared input.
    val (tKeep, mKeep) = timedRun(spark)(
      graft.dedup.Dedup.keepBestPerComponent(corpus, pairs, "doc_id",
        length(col("text")).cast("double")))
    println(f"SCALE_PROBE dedup_chain docs=$total pairs=$nPairs " +
      f"components=$nComp " +
      f"lsh=$tPairs%.1f s (max_task=${mPairs}ms) " +
      f"cc=$tCc%.1f s (max_task=${mCc}ms) " +
      f"keep_best=$tKeep%.1f s (max_task=${mKeep}ms)")
    spark.stop()
  }

  /** EXACT prefix-filtering similarity join (SSJoin) vs the MinHash-LSH
    * chain on the SAME corpus and the same 0.9 threshold — the r9
    * probe behind the prefixJaccardPairs crossover note.
    *
    * Corpus design holds PAIR DENSITY constant while n grows, so the
    * readout is algorithm scaling, not answer-size scaling: each
    * replica of the 1040-doc sf0.1 base slice gets 25 replica-unique
    * filler tokens (diluting the template corpus's own near-dup pairs
    * below 0.9 — cross-replica AND within-replica), and 40 planted
    * copies per replica (4 extra tokens, Jaccard ≈ 0.96) are the true
    * answer — ~40·replicas pairs, linear in n. The df skew that
    * drives prefix-collision fan-out comes from the real template
    * vocabulary (shared tokens with df ≈ n·0.96 down to hapax). */
  private def prefixJoinProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    val base = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") < 1000).select("doc_id", "text")
    val planted = base.filter(col("doc_id") < 40)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
      .withColumn("text", concat(col("text"), lit(" zz1 zz2 zz3 zz4")))
    val slice = base.unionByName(planted)
    val nSlice = slice.count() // 1040
    val replicas = math.max(1, (n / nSlice).toInt)
    // filler keys on the UNDERLYING base id (mod the planted offset)
    // so a planted copy shares its source's filler and the pair stays
    // above the threshold
    val filler = concat_ws(" ", transform(sequence(lit(0), lit(24)),
      j => concat(lit("u"),
        pmod(pmod(col("doc_id"), lit(10000000L)) * 31 +
          col("rep") * 7919 + j * 104729, lit(1000000007L)),
        lit("q"), j)))
    val corpus = slice.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") * replicas + col("rep")).as("doc_id"),
        concat(col("text"), lit(" "), filler).as("text"))
      .localCheckpoint(true)
    val total = nSlice * replicas
    var exact: org.apache.spark.sql.DataFrame = null
    val (tEx, mEx) = timedRun(spark) {
      exact = graft.dedup.Dedup.prefixJaccardPairs(corpus, "text",
        "doc_id", threshold = 0.9).localCheckpoint(true)
      exact
    }
    val nExact = exact.count()
    var lsh: org.apache.spark.sql.DataFrame = null
    val (tLsh, mLsh) = timedRun(spark) {
      lsh = graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id",
          shingleLen = 5, k = 64, bands = 8, threshold = 0.9,
          maxBucketSize = 64)
        .localCheckpoint(true)
      lsh
    }
    val nLsh = lsh.count()
    println(f"SCALE_PROBE prefix_join docs=$total " +
      f"exact_pairs=$nExact ssjoin=$tEx%.1f s (max_task=${mEx}ms) " +
      f"lsh_pairs=$nLsh lsh=$tLsh%.1f s (max_task=${mLsh}ms)")
    spark.stop()
  }

  /** robotsGate shape probe: the rules-array FOLD (one 1:1 host join +
    * per-row aggregate over the ≤R-rule array) vs the exploded
    * per-rule JOIN + max(struct) re-aggregation, on n URLs across
    * n/100 hosts with 21 rules each — the r9 evidence behind
    * robotsGate's fold-based implementation. */
  /** crawlSchedule skew probe: one Zipf mega-host whose share of the
    * frontier SWEEPS 10% → 30% → 90% at fixed n (the wikipedia/youtube
    * shape of a real crawl, dialed up) — the production two-phase
    * bucket-offset rank vs the single `Window.partitionBy(host)` shape
    * it replaced in r10. The claim under measurement: the window
    * shape's longest task grows linearly with the mega-host (ALL its
    * URLs sort in ONE task that AQE cannot split, and must fit in one
    * task's memory), while the two-phase max task is bounded by
    * ~|frontier|/buckets regardless of host skew — so its max/median
    * task ratio stays flat as the skew grows. Usage:
    *   SPARK_GRAFT_PROBE_N=8000000 sbt "runMain graft.ScaleProbe crawl_schedule"
    */
  private def crawlScheduleProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val nHosts = math.max(2, n / 1000)
    for (megaPct <- Seq(1, 3, 9)) {
      val urls = spark.range(n).select(col("id"),
          concat(lit("https://"),
            when(pmod(col("id"), lit(10)) < megaPct, lit("mega.com"))
              .otherwise(concat(lit("h"),
                pmod(col("id") * 7919, lit(nHosts.toLong)),
                lit(".org"))),
            lit("/p/"), col("id")).as("url"))
        .localCheckpoint(true)
      val robots = spark.range(1).select(lit("mega.com").as("host"),
        lit("User-agent: *\nCrawl-delay: 2\n").as("robots_txt"))
      val (tTwo, mTwo) = timedRun(spark)(
        graft.text.UrlOps.crawlSchedule(urls, robots, "url", "id"))
      // comparator: the single-window shape crawlSchedule used pre-r10
      val (tWin, mWin) = timedRun(spark) {
        val delays = graft.text.UrlOps.crawlDelays(robots)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("host")).orderBy(col("id"))
        urls.withColumn("host", graft.text.UrlOps.host(col("url")))
          .join(broadcast(delays), Seq("host"), "left")
          .withColumn("crawl_delay",
            coalesce(col("crawl_delay"), lit(1.0)))
          .withColumn("position", row_number().over(w).cast("long"))
          .withColumn("fetch_at_s",
            round((col("position") - 1).cast("double") *
              col("crawl_delay"), 6))
          .select(col("id"), col("host"), col("position"),
            col("crawl_delay"), col("fetch_at_s"))
      }
      println(f"SCALE_PROBE crawl_schedule urls=$n " +
        f"hosts=${nHosts + 1} mega_share=0.${megaPct}0 " +
        f"two_phase=$tTwo%.1f s (max_task=${mTwo}ms) " +
        f"window=$tWin%.1f s (max_task=${mWin}ms)")
    }
    spark.stop()
  }

  /** Graph-fixpoint probe — the scaling table for the rank family: the
    * synthetic 3-out-regular graph (the pagerankProbe generator) at n
    * and 4n nodes (3n / 12n edges), pageRank and trustRank at 4
    * rounds each, wall + per-round wall + longest task. The claim
    * under measurement: round cost is edge-linear (per round: one
    * edge⋈rank join, one map-side-partial sum, one scalar collect —
    * nothing accumulates across rounds because each round starts from
    * a localCheckpoint barrier), so wall/round at 4n ≈ 4× wall/round
    * at n, and memory is bounded by the node table. Usage:
    *   SPARK_GRAFT_PROBE_N=1000000 sbt "runMain graft.ScaleProbe graph_rank"
    */
  private def graphRankProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val iters = 4
    for (size <- Seq(n, n * 4)) {
      val ids = spark.range(size)
      val edges = Seq(3L, 7L, 13L).map(k =>
        ids.select(col("id").as("src"),
          ((col("id") * k + 1) % size).as("dst")))
        .reduce(_.unionByName(_))
        .localCheckpoint(true)
      val (tPr, mPr) = timedRun(spark)(
        graft.graph.GraphRank.pageRank(edges, iters = iters))
      val (tTr, mTr) = timedRun(spark)(
        graft.graph.GraphRank.trustRank(edges,
          seeds = Seq(1L, 2L, 3L), iters = iters))
      println(f"SCALE_PROBE graph_rank nodes=$size edges=${3L * size} " +
        f"iters=$iters pagerank=$tPr%.1f s " +
        f"(per_round=${tPr / iters}%.2f s, max_task=${mPr}ms) " +
        f"trustrank=$tTr%.1f s " +
        f"(per_round=${tTr / iters}%.2f s, max_task=${mTr}ms)")
    }
    spark.stop()
  }

  /** Anchor-layer scale probe under TARGET skew: every page carries a
    * follow + a nofollow edge to ONE mega-target (2n anchors at a
    * single URL — the Zipf head of any real link graph: a viral page,
    * a CDN asset) next to per-page cold targets. The claims under
    * measurement: [[graft.text.UrlOps.extractAnchors]] stays map-only
    * (wall ∝ n, max task ≈ one partition's regex work), and
    * [[graft.text.UrlOps.anchorTermIndex]]'s (url, term) aggregate
    * absorbs the hot URL because map-side partial aggregation
    * collapses its cells to ≤ partitions·terms rows BEFORE the
    * exchange — a hot key in a hash AGGREGATE is benign (unlike a hot
    * window partition, which is one giant sort task). */
  private def anchorsProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val pages = spark.range(n).select(
      col("id"),
      concat(lit("https://s"), pmod(col("id"), lit(997L)),
        lit(".example/p"), col("id")).as("url"),
      concat(
        lit("<html><body>" +
          "<a href=\"https://hot.example/page\">hot page guide</a>" +
          "<a href=\"https://hot.example/page\" rel=nofollow>" +
          "paid hot link</a>"),
        lit("<a href=\"/local/"), pmod(col("id"), lit(1000L)),
        lit("\">local doc "), pmod(col("id"), lit(50L)), lit("</a>"),
        lit("<a href=\"//cdn.example/x"), pmod(col("id"), lit(100L)),
        lit("\">cdn asset</a>"),
        lit("<a href=\"#top\">skip</a></body></html>")).as("html"))
      .localCheckpoint(true)
    val (tEx, mEx) = timedRun(spark)(
      graft.text.UrlOps.extractAnchors(pages, "html", "url"))
    val (tIdx, mIdx) = timedRun(spark)(
      graft.text.UrlOps.anchorTermIndex(pages, "html", "url"))
    val idx = graft.text.UrlOps.anchorTermIndex(pages, "html", "url")
    val hot = idx.filter(col("target_url") === "https://hot.example/page")
      .agg(sum(col("n_refs"))).head().getLong(0)
    println(f"SCALE_PROBE anchors pages=$n anchors=${4L * n} " +
      f"hot_follow_refs=$hot extract=$tEx%.1f s (max_task=${mEx}ms) " +
      f"index=$tIdx%.1f s (max_task=${mIdx}ms)")
    spark.stop()
  }

  /** [[timedRun]] plus the summed per-task JVM GC time — the
    * heap-pressure signal the r10 bench anomaly called for. */
  private def timedRunGc(spark: org.apache.spark.sql.SparkSession)(
      df: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    val gcSum = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        var cur = maxTask.get()
        while (d > cur && !maxTask.compareAndSet(cur, d))
          cur = maxTask.get()
        if (te.taskMetrics != null)
          gcSum.addAndGet(te.taskMetrics.jvmGCTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    Bench.run(df)
    val secs = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    (secs, maxTask.get(), gcSum.get())
  }

  /** Multimodal decode scale probe — the one heavy family without a
    * scaling table until r11, and the family the r10 bench anomaly sat
    * in (allocation-heavy byte decodes on a shared JVM). Builds REAL
    * byte corpora (animated GIFs, EXIF JPEGs, PDFs with the
    * plain/Flate arms) at n and 5n rows, materializes the bytes behind
    * an eager localCheckpoint so the decode walk is measured ALONE,
    * then times each decode (wall, max task, summed task GC — the
    * heap-pressure proxy). Expected shape: wall linear in rows, max
    * task ≈ wall/partitions × partitions-per-wave (uniform per-row
    * cost, no skew axis at all — every row is the same few KB), GC a
    * small fraction of wall. Usage:
    *   SPARK_GRAFT_PROBE_N=200000 sbt "runMain graft.ScaleProbe multimodal"
    */
  private def multimodalProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.multimodal.{Multimodal, Pdf}
    // warmup: JIT-compile the three walks and let the heap reach its
    // working size BEFORE anything is timed — without this the first
    // measured size inherits the corpus builders' GC debt and cold
    // interpreters and reads SLOWER than a 5x larger run (measured:
    // pdf 200k = 21.7 s / 183 s summed GC cold vs 1M = 2.8 s / 5 s
    // warm — the same in-JVM heap-history mechanism suspected in the
    // r10 bench drift)
    locally {
      val wids = spark.range(math.max(n / 10, 1000).toLong)
        .select(col("id").as("doc_id"))
      Bench.run(Multimodal.decodeVideo(
        Multimodal.syntheticVideos(wids, "doc_id")))
      Bench.run(Multimodal.exifMeta(
        Multimodal.syntheticExifJpegs(wids, "doc_id")))
      Bench.run(Pdf.pdfMeta(Pdf.syntheticPdfs(wids, "doc_id")))
    }
    for (size <- Seq(n, n * 5)) {
      val ids = spark.range(size.toLong).select(col("id").as("doc_id"))
      def probe(tag: String, media: => org.apache.spark.sql.DataFrame)(
          decode: org.apache.spark.sql.DataFrame
            => org.apache.spark.sql.DataFrame): Unit = {
        val m = media.localCheckpoint(true)
        val bytes = m.agg(sum(length(col("bytes")))).head().getLong(0)
        val (t, mt, gc) = timedRunGc(spark)(decode(m))
        println(f"SCALE_PROBE multimodal $tag rows=$size " +
          f"corpus_mb=${bytes / 1e6}%.0f wall=$t%.1f s " +
          f"max_task=${mt}ms gc_sum=${gc}ms")
        m.unpersist(blocking = true)
      }
      probe("video_gif",
        Multimodal.syntheticVideos(ids, "doc_id"))(Multimodal.decodeVideo)
      probe("exif_jpeg",
        Multimodal.syntheticExifJpegs(ids, "doc_id"))(Multimodal.exifMeta)
      probe("pdf", Pdf.syntheticPdfs(ids, "doc_id"))(Pdf.pdfMeta)
    }
    spark.stop()
  }

  /** HTML ingest scale probe — the three regexp-chain map stages that
    * ARE the 100 TB ingest path: [[graft.text.HtmlExtract.extractText]]
    * (the WET form), [[graft.text.HtmlExtract.htmlToMarkdown]] (the
    * structure-preserving form, ~3x the regexp passes), and
    * [[graft.sources.Warc.httpResponseMeta]] (the wire-response lift
    * in front of both). Synthetic pages built from the q_html_markdown
    * template shapes at n and 5n rows behind an eager localCheckpoint;
    * warmed up before timing (the multimodalProbe lesson). Expected:
    * all three linear in rows, max task ≈ wall (uniform per-row regexp
    * cost, no skew axis), markdown a small constant factor over plain
    * extraction. Usage:
    *   SPARK_GRAFT_PROBE_N=200000 sbt "runMain graft.ScaleProbe html"
    */
  private def htmlProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    def pages(size: Long) = spark.range(size).select(
      col("id"),
      concat(
        lit("<html><head><title>T</title><script>var x=1;</script>" +
          "</head><body><h1>Doc "), pmod(col("id"), lit(7L)),
        lit("</h1><p>Intro with <b>bold</b> and <i>ital</i> &amp; " +
          "entity, plus a longer paragraph of running prose so the " +
          "chain works on realistic text volume not just tags.</p>" +
          "<h2>Sec "), pmod(col("id"), lit(3L)),
        lit("</h2><ul><li>alpha "), pmod(col("id"), lit(5L)),
        lit("</li><li><a href=\"/l/"), pmod(col("id"), lit(4L)),
        lit("\">link</a></li></ul><pre><code>x = "),
        pmod(col("id"), lit(9L)),
        lit("</code></pre><blockquote>quoted</blockquote><hr>" +
          "<p><img alt=\"pic\" src=\"/i/x.png\"> tail</p>" +
          "</body></html>")).as("html"))
    def payloads(size: Long) = pages(size).select(col("id"),
      concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
        "charset=UTF-8\r\nContent-Length: "),
        length(col("html")), lit("\r\n\r\n"), col("html")).as("payload"))
    locally { // warmup: JIT the chains before anything is timed
      val w = math.max(n / 10, 1000).toLong
      Bench.run(pages(w).select(
        graft.text.HtmlExtract.extractText(col("html"))))
      Bench.run(pages(w).select(
        graft.text.HtmlExtract.htmlToMarkdown(col("html"))))
      Bench.run(graft.sources.Warc.httpResponseMeta(payloads(w)))
    }
    for (size <- Seq(n.toLong, n.toLong * 5)) {
      val p = pages(size).localCheckpoint(true)
      val pay = payloads(size).localCheckpoint(true)
      val (tx, mx, _) = timedRunGc(spark)(
        p.select(graft.text.HtmlExtract.extractText(col("html"))))
      val (tm, mm, _) = timedRunGc(spark)(
        p.select(graft.text.HtmlExtract.htmlToMarkdown(col("html"))))
      val (th, mh, _) = timedRunGc(spark)(
        graft.sources.Warc.httpResponseMeta(pay))
      println(f"SCALE_PROBE html pages=$size " +
        f"extract=$tx%.1f s (max_task=${mx}ms) " +
        f"markdown=$tm%.1f s (max_task=${mm}ms) " +
        f"http_meta=$th%.1f s (max_task=${mh}ms)")
      p.unpersist(blocking = true); pay.unpersist(blocking = true)
    }
    spark.stop()
  }

  /** WARC read-path scale probe — the one ingest stage without a
    * scaling table until r12. Writes n and 5n records of
    * q_warc_http-shaped ~600 B HTTP payloads to `target/` twice —
    * 32 uncompressed `.warc` parts, and TWO fat `.warc.gz` parts with
    * their `.warc.gz.idx` member-offset sidecars (deliberately few
    * files, so within-file splitting is the only parallelism
    * available) — then times a full pass of each reader:
    * record-delimiter scan ([[graft.sources.Warc.readWarc]]),
    * per-file gz walk ([[graft.sources.Warc.readWarcGz]] — 2 tasks by
    * construction), and the sidecar-split gz walk
    * ([[graft.sources.Warc.readWarcGzSplit]], 16 ranges/file). The
    * gz-vs-split gap is the direct measurement that the sidecar
    * actually parallelizes single fat archives.
    * Usage: SPARK_GRAFT_PROBE_N=200000 sbt "runMain graft.ScaleProbe warc"
    */
  private def warcProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.sources.Warc
    def pages(size: Long) = spark.range(size).select(
      col("id"),
      concat(lit("https://h"), pmod(col("id"), lit(1000L)),
        lit(".example/p"), col("id")).as("url"),
      concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          "charset=UTF-8\r\nServer: graft\r\n\r\n"),
        rpad(concat(lit("<html><body><h1>Doc "), col("id"),
          lit("</h1><p>running prose for realistic record volume ")),
          520, "x"),
        lit("</p></body></html>")).as("payload"))
    def build(size: Long): String = {
      val base = new java.io.File(
        new java.io.File(System.getProperty("user.dir"), "target"),
        s"graft_probe_warc_$size").getAbsolutePath
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      Warc.writeWarc(pages(size).repartition(32), s"$base/plain",
        "id", "url", "payload").collect()
      Warc.writeWarc(pages(size).repartition(2), s"$base/gz",
        "id", "url", "payload", gzip = true).collect()
      base
    }
    locally { // warmup: JIT the readers before anything is timed
      val wbase = build(math.max(n / 10, 1000).toLong)
      Bench.run(Warc.readWarc(spark, s"$wbase/plain"))
      Bench.run(Warc.readWarcGz(spark, s"$wbase/gz"))
      Bench.run(Warc.readWarcGzSplit(spark, s"$wbase/gz", 16))
    }
    for (size <- Seq(n.toLong, n.toLong * 5)) {
      val base = build(size)
      val (tp, mp, _) = timedRunGc(spark)(
        Warc.readWarc(spark, s"$base/plain"))
      val (tg, mg, _) = timedRunGc(spark)(
        Warc.readWarcGz(spark, s"$base/gz"))
      val (ts, ms, _) = timedRunGc(spark)(
        Warc.readWarcGzSplit(spark, s"$base/gz", 16))
      println(f"SCALE_PROBE warc records=$size " +
        f"delim_scan=$tp%.1f s (max_task=${mp}ms) " +
        f"gz_per_file=$tg%.1f s (max_task=${mg}ms) " +
        f"gz_split=$ts%.1f s (max_task=${ms}ms)")
    }
    spark.stop()
  }

  private def robotsProbe(spark: org.apache.spark.sql.SparkSession,
      n: Int): Unit = {
    import org.apache.spark.sql.functions._
    val nHosts = math.max(1, n / 100)
    val ruleLines = (0 until 20)
      .map(i => s"Disallow: /p$i*\n").mkString
    val txt = "User-agent: *\n" + ruleLines + "Allow: /p7/ok$\n"
    val robots = spark.range(nHosts)
      .select(concat(lit("h"), col("id"), lit(".com")).as("host"),
        lit(txt).as("robots_txt"))
      .localCheckpoint(true)
    val urls = spark.range(n)
      .select(col("id"),
        concat(lit("https://h"), pmod(col("id"), lit(nHosts.toLong)),
          lit(".com/p"), pmod(col("id"), lit(37)), lit("/x"))
          .as("url"))
      .localCheckpoint(true)
    val (tFold, mFold) = timedRun(spark)(
      graft.text.UrlOps.robotsGate(urls, robots, "url", "id"))
    // comparator: the exploded shape robotsGate used before r9
    val rules = graft.text.UrlOps.parseRobots(robots)
      .localCheckpoint(true)
    val (tJoin, mJoin) = timedRun(spark) {
      val targets = urls.select(col("id"),
        graft.text.UrlOps.host(col("url")).as("host"),
        regexp_extract(col("url"), "^[a-z]+://[^/]*(/.*)$", 1)
          .as("target"))
      targets.join(rules, Seq("host"), "left")
        .withColumn("__m", col("like_pat").isNotNull &&
          expr("target LIKE like_pat ESCAPE '!'"))
        .groupBy(col("id"), col("host"), col("target"))
        .agg(max(when(col("__m"),
          struct(col("plen"),
            when(col("rule_type") === "allow", 1L).otherwise(0L)
              .as("__tr"),
            col("pattern"), col("rule_type")))).as("__w"))
        .select(col("id"),
          (col("__w").isNull ||
            col("__w.rule_type") === "allow").as("allowed"))
    }
    println(f"SCALE_PROBE robots urls=$n hosts=$nHosts rules_per_host=21 " +
      f"fold=$tFold%.1f s (max_task=${mFold}ms) " +
      f"join=$tJoin%.1f s (max_task=${mJoin}ms)")
    spark.stop()
  }
}
