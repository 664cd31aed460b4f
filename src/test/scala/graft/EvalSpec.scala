package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.Eval

/** Round-7 session-4 additions: classifier evaluation (tie-aware ROC AUC
  * + confusion metrics) and dedup telemetry (per-source duplication
  * profile, duplicate-cluster size histogram). */
class EvalSpec extends SparkSuite {

  // ------------------------------------------------- Eval.binaryMetrics

  test("eval: perfect separation scores auc 1 and a clean confusion") {
    import spark.implicits._
    val scored = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Long]("tp") === 2L)
    assert(r.getAs[Long]("fp") === 0L)
    assert(r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Double]("precision") === 1.0)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("f1") === 1.0)
    assert(r.getAs[Double]("accuracy") === 1.0)
  }

  test("passAtK: product form matches the hand value; undefined-below-k " +
      "nulls; fewer-than-k-failures saturates; zero-correct is zero") {
    import spark.implicits._
    // problem a: n=10, c=4 → pass@5 = 1 − C(6,5)/C(10,5) = 0.97619
    // problem b: n=3,  c=1 → pass@5 undefined (n < k)
    // problem c: n=6,  c=4 → n−c=2 < 5 → exactly 1.0
    // problem d: n=6,  c=0 → 0.0
    val rows =
      (0 until 10).map(i => ("a", i < 4)) ++
      (0 until 3).map(i => ("b", i < 1)) ++
      (0 until 6).map(i => ("c", i < 4)) ++
      (0 until 6).map(_ => ("d", false))
    val got = Eval.passAtK(rows.toDF("p", "ok"), "p", "ok", Seq(1, 5))
      .collect()
      .map(r => r.getAs[String]("p") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("c"),
          Option(r.getAs[java.lang.Double]("pass_at_5"))))).toMap
    assert(got("a") === ((10L, 4L, Some(0.97619))))
    assert(got("b") === ((3L, 1L, None)))
    assert(got("c") === ((6L, 4L, Some(1.0))))
    assert(got("d") === ((6L, 0L, Some(0.0))))
    // pass@1 is the plain success rate
    val p1 = Eval.passAtK(rows.toDF("p", "ok"), "p", "ok", Seq(1))
      .filter(col("p") === "a").head().getAs[Double]("pass_at_1")
    assert(p1 === 0.4)
  }

  test("eval: midrank tie handling matches the hand-computed rank-sum") {
    import spark.implicits._
    // pos scores {0.5, 0.7, 0.5}, neg {0.5, 0.3}:
    // pairwise wins 4 + one tie pair at 0.5 counted twice as 0.5 each
    // -> AUC = 5/6; at 0.5: tp=3 fp=1 tn=1 fn=0
    val scored = Seq((0.5, 1), (0.5, 0), (0.3, 0), (0.7, 1), (0.5, 1))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Double]("auc") === 0.833333)
    assert(r.getAs[Long]("tp") === 3L)
    assert(r.getAs[Long]("fp") === 1L)
    assert(r.getAs[Long]("tn") === 1L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Double]("precision") === 0.75)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("f1") === 0.857143)
    assert(r.getAs[Double]("accuracy") === 0.8)
  }

  test("eval: single-class input nulls the auc, not the confusion") {
    import spark.implicits._
    val allPos = Seq((0.9, 1), (0.2, 1)).toDF("score", "label")
    val r = Eval.binaryMetrics(allPos, "score", "label").collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.getAs[Long]("tp") === 1L)
    assert(r.getAs[Long]("fn") === 1L)
    assert(r.getAs[Double]("recall") === 0.5)
    // no predicted or actual negatives -> tn = fp = 0, accuracy still real
    assert(r.getAs[Double]("accuracy") === 0.5)
  }

  test("eval: NULL labels and scores are excluded, not counted") {
    import spark.implicits._
    val scored = Seq((Some(0.9), Some(1)), (Some(0.1), None),
        (None, Some(0)), (Some(0.2), Some(0)))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") === 1L)
    assert(r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Double]("auc") === 1.0)
  }

  test("eval: scores collapse onto the rounding grid before ranking") {
    import spark.implicits._
    // 1e-9 apart -> same grid cell -> a tie, AUC 0.5, not 1.0
    val scored = Seq((0.5000000001, 1), (0.5000000004, 0))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("eval: layout-invariant (repartition changes nothing)") {
    import spark.implicits._
    val scored = (1 to 400).map { i =>
      (math.floor((i * 37 % 100) / 100.0 * 1e6) / 1e6,
        if (i * 53 % 7 < 3) 1 else 0)
    }.toDF("score", "label")
    val a = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    val b = Eval.binaryMetrics(scored.repartition(13), "score", "label")
      .collect()(0)
    assert(a === b)
  }

  // ------------------------------------------------- Indexing.rrfFuse

  test("rrf: both-list items outrank single-list items; hand-computed") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val rows = graft.text.Indexing.rrfFuse(Seq(a, b), "doc_id", "rank",
        k = 10, kConst = 60)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 20: 1/62 + 1/61 = 0.032522; doc 10: 1/61 = 0.016393
    assert(rows(20L).getAs[Double]("rrf_score") === 0.032522)
    assert(rows(20L).getAs[Int]("rank") === 1)
    assert(rows(10L).getAs[Double]("rrf_score") === 0.016393)
    assert(rows(40L).getAs[Double]("rrf_score") === 0.016129)
    // provenance: doc 10 never retrieved by b, doc 40 never by a
    assert(rows(10L).isNullAt(rows(10L).fieldIndex("rank_2")))
    assert(rows(40L).isNullAt(rows(40L).fieldIndex("rank_1")))
  }

  test("rrf: k caps the fused list and ties break on id") {
    import spark.implicits._
    // identical ranks -> identical scores -> ascending-id order
    val a = Seq((3L, 1), (1L, 2)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (2L, 2)).toDF("doc_id", "rank")
    val out = graft.text.Indexing.rrfFuse(Seq(a, b), "doc_id", "rank",
        k = 2)
      .orderBy(col("rank")).collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("doc_id") === 3L)
    assert(out(1).getAs[Long]("doc_id") === 1L) // 1 before 2 on the tie
  }

  test("rrf: queryCols fuse each query independently") {
    import spark.implicits._
    val a = Seq(("q1", 10L, 1), ("q2", 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq(("q1", 10L, 1), ("q2", 30L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = graft.text.Indexing.rrfFuse(Seq(a, b), "doc_id", "rank",
        k = 5, queryCols = Seq("query_id"))
      .collect().map(r =>
        (r.getAs[String]("query_id"), r.getAs[Long]("doc_id")) ->
          r.getAs[Int]("rank")).toMap
    assert(out(("q1", 10L)) === 1)
    assert(out(("q2", 20L)) === 1) // q2's own rank 1, not global
    assert(out(("q2", 30L)) === 2)
    assert(out.size === 3)
  }

  test("rrf: rejects fewer than two rankings") {
    import spark.implicits._
    val a = Seq((1L, 1)).toDF("doc_id", "rank")
    intercept[IllegalArgumentException] {
      graft.text.Indexing.rrfFuse(Seq(a), "doc_id", "rank", k = 5)
    }
  }

  // ---------------------------------------- CorpusIO.parseJsonColumn

  test("json: pinned-schema parse flattens fields and flags validity") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val df = Seq(
      (1L, """{"k": 7, "name": "a"}"""), // clean
      (2L, """{"k": null}"""), // parseable null field -> VALID
      (3L, """{"name": "c"}"""), // missing field -> null, still valid
      (4L, "oops"), // malformed -> invalid
      (5L, null.asInstanceOf[String])) // null payload -> invalid
      .toDF("id", "props")
    val schema = new StructType().add("k", "long").add("name", "string")
    val rows = graft.sources.CorpusIO.parseJsonColumn(df, "props", schema)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("k") === 7L)
    assert(rows(1L).getAs[String]("name") === "a")
    assert(rows(1L).getAs[Boolean]("json_valid"))
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("k")))
    assert(rows(2L).getAs[Boolean]("json_valid"))
    assert(rows(3L).getAs[Boolean]("json_valid"))
    assert(!rows(4L).getAs[Boolean]("json_valid"))
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("k")))
    assert(!rows(5L).getAs[Boolean]("json_valid"))
  }

  test("json: undeclared payload fields are ignored, input cols kept") {
    import spark.implicits._
    import org.apache.spark.sql.types.StructType
    val df = Seq((1L, """{"k": 1, "extra": [1,2,3]}""")).toDF("id", "props")
    val out = graft.sources.CorpusIO.parseJsonColumn(df, "props",
      new StructType().add("k", "long"))
    assert(out.columns.toSeq === Seq("id", "props", "k", "json_valid"))
    assert(out.collect()(0).getAs[Long]("k") === 1L)
  }

  // -------------------------------------- Eval.binaryMetricsBy / ECE

  test("eval by stratum: per-group metrics, NULL stratum under sentinel") {
    import spark.implicits._
    val scored = Seq(
      // stratum a: perfect separation
      (0.9, 1, Some("a")), (0.8, 1, Some("a")),
      (0.2, 0, Some("a")), (0.1, 0, Some("a")),
      // stratum b: perfectly wrong
      (0.9, 0, Some("b")), (0.1, 1, Some("b")),
      // NULL stratum: one of each
      (0.7, 1, None), (0.3, 0, None))
      .toDF("score", "label", "lang")
    val rows = Eval.binaryMetricsBy(scored, "score", "label", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getAs[Double]("auc") === 1.0)
    assert(rows("b").getAs[Double]("auc") === 0.0)
    val n = rows(graft.operators.Sampling.NullStratum)
    assert(n.getAs[Double]("auc") === 1.0)
    assert(n.getAs[Long]("n_pos") === 1L)
    // the global one-row variant still agrees with a pooled computation
    assert(Eval.binaryMetrics(scored, "score", "label").collect()(0)
      .getAs[Long]("n_pos") === 4L)
  }

  test("calibration: bin bounds, micro-unit means, hand-computed ece") {
    import spark.implicits._
    val scored = Seq(
      (0.05, 0), (0.15, 0), (0.18, 1), // bins 0 and 1
      (0.95, 1), (0.93, 1), (0.91, 0)) // bin 9
      .toDF("score", "label")
    val bins = Eval.calibrationBins(scored, "score", "label", bins = 10)
    val m = bins.collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet === Set(0L, 1L, 9L))
    assert(m(1L).getAs[Long]("n") === 2L)
    assert(m(1L).getAs[Double]("mean_score") === 0.165)
    assert(m(1L).getAs[Double]("frac_pos") === 0.5)
    assert(m(9L).getAs[Double]("bin_lo") === 0.9)
    assert(m(9L).getAs[Double]("bin_hi") === 1.0)
    val e = Eval.expectedCalibrationError(bins).collect()(0)
    assert(e.getAs[Long]("n_bins_nonempty") === 3L)
    assert(e.getAs[Long]("n") === 6L)
    // ece = 1/6*|0-0.05| + 2/6*|0.5-0.165| + 3/6*|0.666667-0.93|
    val exp = 1.0 / 6 * 0.05 + 2.0 / 6 * 0.335 +
      3.0 / 6 * math.abs(0.666667 - 0.93)
    assert(math.abs(e.getAs[Double]("ece") -
      math.floor(exp * 1e6 + 0.5) / 1e6) <= 1e-6)
  }

  test("calibration: out-of-range scores clamp into the edge bins") {
    import spark.implicits._
    val scored = Seq((-0.3, 0), (1.7, 1)).toDF("score", "label")
    val m = Eval.calibrationBins(scored, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet === Set(0L, 9L))
    assert(m(0L).getAs[Double]("mean_score") === 0.0)
    assert(m(9L).getAs[Double]("mean_score") === 1.0)
  }

  // ----------------------------------------------- Similarity.mmrRerank

  test("mmr: redundant near-twin is deferred in favor of the diverse pick") {
    import spark.implicits._
    import graft.similarity.Similarity
    // query at 0 deg; candidates at 10, 12 and -40 deg. Pure relevance
    // ranks 1, 2, 3 — but 2 is nearly identical to 1 (2 deg apart), so
    // MMR at lambda 0.5 picks 1, then the diverse 3, then 2.
    def v(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = Seq((1L, v(10)), (2L, v(12)), (3L, v(-40)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, v(0))).toDF("query_id", "embedding")
    val out = Similarity.mmrRerank(corpus, q, k = 3, lambda = 0.5,
        shortlist = 3)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 3L, 2L))
    // rank 1 is pure relevance: mmr = round(0.5 * rel, 6)
    val rel1 = out(0).getAs[Double]("cosine")
    assert(out(0).getAs[Double]("mmr_score")
      === math.floor(0.5 * rel1 * 1e6 + 0.5) / 1e6)
  }

  test("mmr: lambda 1 reduces to plain relevance order") {
    import spark.implicits._
    import graft.similarity.Similarity
    val corpus = (0 until 12).map { i =>
      (i.toLong, Seq(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("query_id", "embedding")
    val mmr = Similarity.mmrRerank(corpus, q, k = 5, lambda = 1.0,
        shortlist = 8)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("neighbor_id"))
    val plain = Similarity.knnBruteForce(corpus, q, 5)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("neighbor_id"))
    assert(mmr.toSeq === plain.toSeq)
  }

  test("mmr: exhausted shortlist stops contributing, ranks stay dense") {
    import spark.implicits._
    import graft.similarity.Similarity
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((9L, Seq(1.0f, 1.0f))).toDF("query_id", "embedding")
    val out = Similarity.mmrRerank(corpus, q, k = 5, lambda = 0.7,
      shortlist = 5)
    assert(out.count() === 2) // only 2 candidates exist
    assert(out.select("rank").collect().map(_.getInt(0)).sorted
      === Array(1, 2))
  }

  // ------------------------------------------------ Pca.whitenProject

  test("whiten: hand-replayed from the model; unit variance on the axis") {
    import spark.implicits._
    import graft.similarity.Pca
    // anisotropic cloud: x-variance 100x the y-variance
    val pts = (0 until 200).map { i =>
      val u = (i * 37 % 200) / 200.0 - 0.5
      val v = (i * 53 % 200) / 200.0 - 0.5
      (i.toLong, Seq(u * 10.0, v))
    }
    val df = pts.toDF("id", "v")
    val model = Pca.fit(df, "v", nComponents = 1, iters = 8)
    val out = Pca.whitenProject(df, model, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver replay: z = (x - mu) . comp / sqrt(lambda), rounded
    val lam = model.eigenvalues(0)
    pts.foreach { case (id, x) =>
      var dot = 0.0
      for (j <- x.indices) dot += (x(j) - model.means(j)) *
        model.components(0)(j)
      val exp = math.floor(dot / math.sqrt(lam) * 1e6 + 0.5) / 1e6
      assert(math.abs(out(id) - exp) < 1e-9, s"id $id")
    }
    // whitened scores have (population) variance ~1
    val zs = out.values.toSeq
    val mz = zs.sum / zs.size
    val varz = zs.map(z => (z - mz) * (z - mz)).sum / zs.size
    assert(varz > 0.9 && varz < 1.1, s"variance $varz")
  }

  test("whiten: degenerate eigenvalue yields NULL, not a blow-up") {
    import spark.implicits._
    import graft.similarity.Pca
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val model = Pca.PcaModel(Array(0.0, 0.0),
      Array(Array(1.0, 0.0)), Array(0.0))
    val r = Pca.whitenProject(df, model, "id", "v").collect()(0)
    assert(r.isNullAt(r.fieldIndex("wpc1")))
  }

  // ------------------------------------------------- GraphRank.hits

  test("hits: star graph — pure authority at the center, equal hubs") {
    import spark.implicits._
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = graft.graph.GraphRank.hits(edges, iters = 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(3L).getAs[Double]("authority") === 1.0)
    assert(r(3L).getAs[Double]("hub") === 0.0)
    assert(r(1L).getAs[Double]("authority") === 0.0)
    // hubs split the unit L2 mass: 1/sqrt(2) on the 1e-9 grid
    assert(math.abs(r(1L).getAs[Double]("hub") - 0.707106781) < 1e-9)
    assert(r(1L).getAs[Double]("hub") === r(2L).getAs[Double]("hub"))
  }

  test("hits: self/duplicate edges are hygiene-dropped; layout-invariant") {
    import spark.implicits._
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val dirty = clean
      .unionByName(Seq((1L, 1L), (1L, 2L)).toDF("src", "dst"))
    val a = graft.graph.GraphRank.hits(clean, iters = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).sorted
    val b = graft.graph.GraphRank.hits(dirty.repartition(7), iters = 3)
      .collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).sorted
    assert(a.toSeq === b.toSeq)
    // L2 mass of each vector is ~1 on the quantization grid
    val sa = a.map(t => t._3 * t._3).sum
    assert(math.abs(sa - 1.0) < 1e-6)
  }

  // ------------------------------------------ RankingEval.rankingMetrics

  test("ranking metrics: hand-computed nDCG/MRR/AP/P/R on one query") {
    import spark.implicits._
    // run: docs a..d at ranks 1..4; qrels: b grade 2, d grade 1, and e
    // (never retrieved) grade 1
    val run = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, "b", 2.0), (1L, "d", 1.0), (1L, "e", 1.0))
      .toDF("query_id", "doc_id", "rel")
    val r = graft.text.RankingEval.rankingMetrics(run, qrels, k = 4)
      .collect()(0)
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Long]("hits") === 2L)
    assert(r.getAs[Double]("precision_k") === 0.5)
    assert(r.getAs[Double]("recall_k") === 0.666667)
    assert(r.getAs[Double]("rr") === 0.5)
    // AP = (1/2 + 2/4) / min(3, 4)
    assert(r.getAs[Double]("ap_k") === 0.333333)
    // DCG = 2/log2(3) + 1/log2(5); IDCG = 2 + 1/log2(3) + 1/2
    assert(r.getAs[Double]("dcg_k") === 1.692536)
    assert(r.getAs[Double]("idcg_k") === 3.13093)
    assert(r.getAs[Double]("ndcg_k") === 0.540586)
  }

  test("ranking metrics: no qrels -> zero n_rel and NULL recall/AP/nDCG") {
    import spark.implicits._
    val run = Seq((1L, "a", 1), (1L, "b", 2))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((2L, "a", 1.0)).toDF("query_id", "doc_id", "rel")
    val out = graft.text.RankingEval.rankingMetrics(run, qrels, k = 2)
      .collect()
    // query 2 has qrels but no run rows: absent by contract
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("query_id") === 1L)
    assert(r.getAs[Long]("n_rel") === 0L)
    assert(r.getAs[Long]("hits") === 0L)
    assert(r.getAs[Double]("rr") === 0.0)
    assert(r.isNullAt(r.fieldIndex("recall_k")))
    assert(r.isNullAt(r.fieldIndex("ap_k")))
    assert(r.getAs[Double]("idcg_k") === 0.0)
    assert(r.isNullAt(r.fieldIndex("ndcg_k")))
  }

  test("ranking metrics: rows past k are ignored; rel<=0 qrels too") {
    import spark.implicits._
    val run = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, "c", 1.0), (1L, "a", 0.0))
      .toDF("query_id", "doc_id", "rel")
    val r = graft.text.RankingEval.rankingMetrics(run, qrels, k = 2)
      .collect()(0)
    // c is relevant but ranked past the cutoff; a's grade 0 is ignored
    assert(r.getAs[Long]("n_rel") === 1L)
    assert(r.getAs[Long]("hits") === 0L)
    assert(r.getAs[Double]("rr") === 0.0)
    assert(r.getAs[Double]("dcg_k") === 0.0)
    assert(r.getAs[Double]("idcg_k") === 1.0)
    assert(r.getAs[Double]("ndcg_k") === 0.0)
  }

  // ------------------------------------------- RankingEval.annRecallAtK

  test("ann recall: overlap over exact ground truth, per query") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    // q1 finds 2 of 3 (plus a spurious 4th past k); q2 misses entirely
    val approx = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 12L, 3),
      (1L, 10L, 4)).toDF("query_id", "neighbor_id", "rank")
    val r = graft.text.RankingEval.annRecallAtK(exact, approx, k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_overlap") === 2L)
    assert(r(1L).getAs[Double]("recall") === 0.666667)
    assert(r(2L).getAs[Long]("n_approx") === 0L)
    assert(r(2L).getAs[Double]("recall") === 0.0)
    assert(r.size === 2)
  }

  // -------------------------------------------- Dedup.duplicationProfile

  test("dup profile: per-source stats, sentinel for NULL sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello  World", Some("a")), // normalized-dup of 2
      (2L, "hello world", Some("a")),
      (3L, "hello world", Some("a")), // triple within a
      (4L, "unique one", Some("a")),
      (5L, "x", Some("b")),
      (6L, "y", Some("b")),
      (7L, "z", None),
      (8L, "z", None)).toDF("doc_id", "text", "source")
    val rows = Dedup.duplicationProfile(docs, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_docs") === 4L)
    assert(a.getAs[Long]("n_distinct") === 2L)
    assert(a.getAs[Long]("n_dup_docs") === 2L)
    assert(a.getAs[Double]("dup_rate") === 0.5)
    assert(a.getAs[Long]("max_group") === 3L)
    val b = rows("b")
    assert(b.getAs[Long]("n_dup_docs") === 0L)
    assert(b.getAs[Double]("dup_rate") === 0.0)
    val n = rows(graft.operators.Sampling.NullStratum)
    assert(n.getAs[Long]("n_docs") === 2L)
    assert(n.getAs[Long]("n_distinct") === 1L)
  }

  // ---------------------------------------------- Dedup.dupSizeHistogram

  test("dup histogram: cross-source groups count once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared", "a"), (2L, "shared", "b"), // one size-2 group
      (3L, "t", "a"), (4L, "t", "a"), (5L, "t", "b"), // one size-3 group
      (6L, "u1", "a"), (7L, "u2", "b")) // two singletons
      .toDF("doc_id", "text", "source")
    val rows = Dedup.dupSizeHistogram(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows(1L) === ((2L, 2L)))
    assert(rows(2L) === ((1L, 2L)))
    assert(rows(3L) === ((1L, 3L)))
    assert(rows.size === 3)
  }

  test("trustRank: trust flows only from seeds — unreachable pages " +
      "score 0, trust decays along the chain, dangling mass teleports " +
      "back to seeds") {
    import spark.implicits._
    import graft.graph.GraphRank
    // seed 1 → 2 → 3 (dangling); island 4 → 5 unreachable from seeds
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val t = GraphRank.trustRank(edges, seeds = Seq(1L), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t(4L) === 0.0 && t(5L) === 0.0) // no path from the seed
    assert(t(1L) > t(2L) && t(2L) > t(3L)) // decay along the chain
    assert(t(1L) > 0.15) // teleport + returned dangling mass
    // layout invariance (quantized trajectory)
    val again = GraphRank.trustRank(edges.repartition(3), Seq(1L),
        iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === t)
  }

  test("spamMass: pages unreachable from the trusted seeds carry mass " +
      "1, the seed itself near 0") {
    import spark.implicits._
    import graft.graph.GraphRank
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val sm = GraphRank.spamMass(edges, seeds = Seq(1L), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sm(4L) === 1.0 && sm(5L) === 1.0) // all rank, zero trust
    assert(sm(1L) < 0.5, s"seed spam mass ${sm(1L)}")
    assert(sm(1L) <= sm(2L) && sm(2L) <= sm(3L) + 1e-9)
  }

  test("pageRankByKey: a key-hash collision fails LOUDLY instead of " +
      "silently merging two domains' ranks; the default hash passes") {
    import spark.implicits._
    import graft.graph.GraphRank
    val edges = Seq(("aa.com", "bb.com"), ("bb.com", "cc.net"))
      .toDF("src", "dst")
    // test seam: a length-based "hash" pins aa.com and bb.com (and
    // cc.net...) onto one id — the guard must trip
    val ex = intercept[IllegalArgumentException] {
      GraphRank.pageRankByKeyHashed(edges, "src", "dst", iters = 2,
        damping = 0.85, h = c => length(c).cast("long"))
    }
    assert(ex.getMessage.contains("collision"))
    // the real md5 hash separates them; ranks cover all 3 keys
    val r = GraphRank.pageRankByKey(edges, iters = 4)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set("aa.com", "bb.com", "cc.net"))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("keepRateIntervals: Wilson bounds are symmetric at p=0.5, " +
      "clamped at the extremes, and match the closed form") {
    import spark.implicits._
    import graft.text.Drift
    val df = ((1 to 100).map(i => ("a", i <= 50)) ++
      (1 to 20).map(_ => ("b", true)) ++
      (1 to 20).map(_ => ("c", false)) :+
      ((null.asInstanceOf[String], true)))
      .toDF("src", "keep")
    val got = Drift.keepRateIntervals(df, "src", col("keep"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n, k, p, lo, hi) = got("a")
    assert(n === 100L && k === 50L && p === 0.5)
    assert(math.abs(lo + hi - 1.0) < 1e-9) // symmetric around 0.5
    // closed form by hand
    val z = 1.96; val z2 = z * z
    val denom = 1.0 + z2 / 100
    val half = z * math.sqrt(0.25 / 100 + z2 / (4.0 * 100 * 100)) / denom
    val center = (0.5 + z2 / 200) / denom
    assert(math.abs(lo - (center - half)) < 1e-6)
    // all-kept / none-kept: bounds clamp inside [0,1], never degenerate
    assert(got("b")._3 === 1.0 && got("b")._5 === 1.0 && got("b")._4 < 1.0)
    assert(got("c")._3 === 0.0 && got("c")._4 === 0.0 && got("c")._5 > 0.0)
    assert(got.contains(graft.operators.Sampling.NullStratum))
  }

  test("cohenKappa: the textbook 2x2 example, null exclusion, " +
      "constant-rater degeneracy") {
    import spark.implicits._
    // classic worked example: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes
    // → p_o = 0.7, p_e = 0.5·0.6 + 0.5·0.4 = 0.5, κ = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")) :+
      (null.asInstanceOf[String], "yes") // excluded, not a disagreement
    val got = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(got.getAs[Long]("n") === 50L)
    assert(got.getAs[Long]("n_categories") === 2L)
    assert(got.getAs[Double]("p_o") === 0.7)
    assert(got.getAs[Double]("p_e") === 0.5)
    assert(got.getAs[Double]("kappa") === 0.4)
    // both raters constant: p_e = 1, kappa undefined → NULL
    val const = Eval.cohenKappa(
      Seq.fill(5)(("x", "x")).toDF("a", "b"), "a", "b").head()
    assert(const.isNullAt(const.fieldIndex("kappa")))
  }

  test("fleissKappa: hand-computed 3-rater pool, single-rating items " +
      "drop, layout invariance") {
    import spark.implicits._
    // item 1: x,x,x (P=1); item 2: x,x,y (P=1/3); item 3: one rating →
    // dropped. Retained: p_bar=(1+1/3)/2, labels x=5 y=1 →
    // p_e=26/36, κ=(2/3−26/36)/(1−26/36)=−0.2
    val ratings = Seq((1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "x"), (2L, "x"), (2L, "y"), (3L, "x"))
      .toDF("item", "label")
    val got = Eval.fleissKappa(ratings, "item", "label").head()
    assert(got.getAs[Long]("n_items") === 2L)
    assert(got.getAs[Long]("n_ratings") === 6L)
    assert(math.abs(got.getAs[Double]("p_bar") - 2.0 / 3) < 1e-6)
    assert(math.abs(got.getAs[Double]("p_e") - 26.0 / 36) < 1e-6)
    assert(math.abs(got.getAs[Double]("kappa") - (-0.2)) < 1e-5)
    val again = Eval.fleissKappa(ratings.repartition(4), "item", "label")
      .head()
    assert(again.getAs[Double]("p_bar") === got.getAs[Double]("p_bar"))
    assert(again.getAs[Double]("kappa") === got.getAs[Double]("kappa"))
  }
}
