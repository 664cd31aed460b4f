package graft

import graft.operators.{Packing, Sampling}
import graft.similarity.Outliers
import graft.text.{Collocations, Drift, Indexing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-analysis layer added in round 6 session 4: PMI collocations,
  * distribution drift, embedding outliers, global training-shard
  * assignment, and the sketch-based profile scale path. */
class CorpusAnalysisSpec extends SparkSuite {

  lazy val docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")

  // ---------------------------------------------------------------- PMI

  test("pmi: hand-computed on a 4-bigram corpus") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "new york new york"),
      (2L, "new jersey")).toDF("doc_id", "text")
    // unigrams: new=3 york=2 jersey=1 (N=6); bigrams: (new,york)=2,
    // (york,new)=1, (new,jersey)=1 (N=4). minCount=2 keeps only
    // (new,york): pmi = ln((2/4)/((3/6)(2/6))) = ln 3
    val res = Collocations.pmiTopK(tiny, k = 10, minCount = 2L).collect()
    assert(res.length === 1)
    val r = res.head
    assert(r.getAs[String]("a") === "new")
    assert(r.getAs[String]("b") === "york")
    assert(r.getAs[Long]("c_ab") === 2L)
    assert(r.getAs[Long]("c_a") === 3L)
    assert(r.getAs[Long]("c_b") === 2L)
    assert(math.abs(r.getAs[Double]("pmi") - 1.098612) < 1e-9)
    assert(r.getAs[Int]("rank") === 1)
  }

  test("pmi: minCount=1 admits the rare pairs; ranking ties on (a, b)") {
    import spark.implicits._
    val tiny = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    // both bigrams have identical counts ⇒ identical pmi; tie breaks on b
    val res = Collocations.pmiTopK(tiny, k = 2, minCount = 1L).collect()
    assert(res.map(_.getAs[String]("b")).toSeq === Seq("y", "z"))
    assert(res.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
  }

  test("pmi: frequent-but-independent pair scores near zero") {
    import spark.implicits._
    // a b appears adjacent exactly as often as independence predicts
    // within this stream; glued pair (p q) should outrank (the p,q pair
    // occurs always together)
    val tiny = Seq(
      (1L, "p q p q p q p q"),
      (2L, "a c a d b c b d")).toDF("doc_id", "text")
    val res = Collocations.pmiTopK(tiny, k = 1, minCount = 2L).collect()
    assert(res.head.getAs[String]("a") === "p")
    assert(res.head.getAs[String]("b") === "q")
  }

  // -------------------------------------------------------------- Drift

  test("drift: identical distributions diverge by zero") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "alpha beta", "s1"), (2L, "alpha beta", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Drift.unigramDrift(tiny).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("kl_ab") === 0.0)
    assert(r.head.getAs[Double]("kl_ba") === 0.0)
    assert(r.head.getAs[Double]("js") === 0.0)
  }

  test("drift: hand-computed KL and JS on a two-term vocab") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a a b", "s1"), (2L, "a b b", "s2"))
      .toDF("doc_id", "text", "source")
    // V=2, N=3 each: P_s1 = (0.6, 0.4), P_s2 = (0.4, 0.6)
    val kl = 0.6 * math.log(0.6 / 0.4) + 0.4 * math.log(0.4 / 0.6)
    val js = 0.5 * (0.6 * math.log(0.6 / 0.5) + 0.4 * math.log(0.4 / 0.5)) +
      0.5 * (0.4 * math.log(0.4 / 0.5) + 0.6 * math.log(0.6 / 0.5))
    val r = Drift.unigramDrift(tiny).collect().head
    assert(r.getAs[String]("stratum_a") === "s1")
    assert(math.abs(r.getAs[Double]("kl_ab") - kl) < 1e-6)
    assert(math.abs(r.getAs[Double]("kl_ba") - kl) < 1e-6) // symmetric here
    assert(math.abs(r.getAs[Double]("js") - js) < 1e-6)
  }

  test("drift: smoothing keeps divergence finite when vocabs are disjoint") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "only here", "s1"), (2L, "другой corpus", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Drift.unigramDrift(tiny).collect().head
    assert(!r.getAs[Double]("kl_ab").isInfinite)
    assert(r.getAs[Double]("kl_ab") > 0)
    assert(r.getAs[Double]("js") > 0 &&
      r.getAs[Double]("js") <= math.log(2) + 1e-9)
  }

  test("drift top terms: the over-represented term in A ranks first") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "spam spam spam spam ham", "s1"),
      (2L, "ham eggs toast beans tea", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Drift.driftTopTerms(tiny, "s1", "s2", k = 3).collect()
    assert(r.head.getAs[String]("term") === "spam")
    assert(r.head.getAs[Long]("c_a") === 4L)
    assert(r.head.getAs[Long]("c_b") === 0L)
    assert(r.head.getAs[Int]("rank") === 1)
    // contributions are descending in rank order
    val contribs = r.map(_.getAs[Double]("contrib")).toSeq
    assert(contribs === contribs.sorted.reverse)
  }

  test("drift matrix covers all source pairs on the fixture corpus") {
    val r = Drift.unigramDrift(docs).collect()
    val s = docs.select("source").distinct().count()
    assert(r.length === (s * (s - 1) / 2).toInt)
    // JS is a metric-squared: symmetric, bounded by ln 2, non-negative
    assert(r.forall(x => x.getAs[Double]("js") >= 0 &&
      x.getAs[Double]("js") <= math.log(2) + 1e-9))
  }

  test("drift: NULL stratum is a real stratum under the sentinel, not " +
      "pure smoothing mass") {
    import spark.implicits._
    // two sources with disjoint unigrams, one of them keyed NULL: the
    // old raw-NULL key never matched the scaffold's left join, so the
    // NULL side degenerated to pure smoothing mass and the a < b pair
    // filter dropped the comparison — the NULL source vanished entirely
    val d = Seq(
      (1L, "alpha alpha alpha", "crawl1"),
      (2L, "alpha alpha beta", "crawl1"),
      (3L, "gamma gamma gamma", null),
      (4L, "gamma delta delta", null)).toDF("doc_id", "text", "source")
    val r = Drift.unigramDrift(d).collect()
    assert(r.length === 1)
    val pair = (r.head.getString(0), r.head.getString(1))
    assert(pair === (Sampling.NullStratum, "crawl1") ||
      pair === ("crawl1", Sampling.NullStratum))
    // disjoint vocabs drift hard — far from the near-zero divergence a
    // smoothing-only distribution would show (add-one smoothing over the
    // tiny joint vocab caps JS around 0.2 here, vs ~0 for no drift)
    assert(r.head.getAs[Double]("js") > 0.15)
    // drill-down targets the NULL stratum via the sentinel key
    val top = Drift.driftTopTerms(d, Sampling.NullStratum, "crawl1", k = 2)
      .collect()
    assert(top.head.getString(0) === "gamma") // over-represented in NULL
    assert(top.head.getAs[Long]("c_a") === 4L) // 3 in doc 3 + 1 in doc 4
  }

  // ----------------------------------------------------------- Outliers

  test("outliers: NULL labels form their own group instead of being " +
      "dropped by the centroid join") {
    import spark.implicits._
    val rows = (
      (1 to 5).map(i => (i.toLong, java.lang.Integer.valueOf(0),
        Array(1.0f, 0.0f, 0.0f))) ++
        Seq((10L, null.asInstanceOf[java.lang.Integer],
            Array(0.0f, 1.0f, 0.0f)),
          (11L, null.asInstanceOf[java.lang.Integer],
            Array(0.0f, 1.0f, 0.0f)),
          (12L, null.asInstanceOf[java.lang.Integer],
            Array(1.0f, 0.0f, 0.0f)))  // the odd one out among NULLs
      ).toDF("vec_id", "label", "embedding")
    val r = Outliers.centroidOutliers(rows, dim = 3, k = 3).collect()
    val nulls = r.filter(_.isNullAt(0))
    // all three unlabeled vectors surface, ranked against the
    // NULL-group centroid — vector 12 is the farthest
    assert(nulls.length === 3)
    assert(nulls.minBy(_.getAs[Int]("rank")).getAs[Long]("vec_id") === 12L)
    // labeled group untouched by the null-safe join change
    assert(r.count(!_.isNullAt(0)) === 3) // k=3 of the 5 label-0 rows
  }

  test("outliers: planted far vector is rank 1 of its label") {
    import spark.implicits._
    val rows = (
      (1 to 9).map(i => (i.toLong, 0, Array(1.0f, 0.0f, 0.0f))) :+
        ((99L, 0, Array(0.0f, 1.0f, 0.0f))) :+      // the outlier
        ((50L, 1, Array(0.0f, 0.0f, 1.0f)))         // second label
      ).toDF("vec_id", "label", "embedding")
    val r = Outliers.centroidOutliers(rows, dim = 3, k = 2)
      .collect().map(x => (x.getAs[Int]("label"), x.getAs[Int]("rank"),
        x.getAs[Long]("vec_id"), x.getAs[Double]("dist")))
    val lab0 = r.filter(_._1 === 0).sortBy(_._2)
    assert(lab0.head._3 === 99L)
    assert(lab0.head._4 > 0.5) // orthogonal-ish to the centroid
    assert(lab0(1)._4 < 0.1)   // the inliers hug the centroid
    // singleton label: its only vector IS the centroid → dist 0
    val lab1 = r.filter(_._1 === 1)
    assert(lab1.length === 1 && lab1.head._4 === 0.0)
  }

  test("outliers: ties on quantized distance keep the lower id") {
    import spark.implicits._
    val rows = Seq(
      (3L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.0f, 1.0f)),
      (2L, 0, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val r = Outliers.centroidOutliers(rows, dim = 2, k = 2).collect()
      .sortBy(_.getAs[Int]("rank"))
    // vectors 1 and 2 are identical ⇒ identical dist; 1 beats 2
    val ids = r.map(_.getAs[Long]("vec_id")).toSeq
    assert(ids.head != 3L || ids(1) != 3L || ids.distinct.length === 2)
    val sameDist = r.groupBy(_.getAs[Double]("dist")).values
      .find(_.length > 1)
    sameDist.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Long]("vec_id")).toSeq ===
        sorted.map(_.getAs[Long]("vec_id")).sorted.toSeq)
    }
  }

  test("outliers: distances replay against a driver-side recomputation") {
    lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val res = Outliers.centroidOutliers(emb, dim = 64, k = 5)
    val vecs = emb.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Int]("label"),
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)).toSeq
    val cents = vecs.groupBy(_._2).map { case (lab, vs) =>
      val dim = 64
      val c = Array.tabulate(dim)(j =>
        math.floor(vs.map(_._3(j)).sum / vs.length * 1e6 + 0.5) / 1e6)
      lab -> c
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.groupBy(_._2).flatMap { case (lab, vs) =>
      vs.map { case (id, _, v) =>
        (lab, id,
          math.floor((1.0 - cos(v, cents(lab))) * 1e6 + 0.5) / 1e6)
      }.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((l, id, d), i) => ((l, i + 1), (id, d)) }
    }
    res.collect().foreach { r =>
      val key = (r.getAs[Int]("label"), r.getAs[Int]("rank"))
      val (id, d) = expected(key)
      assert(r.getAs[Long]("vec_id") === id, s"at $key")
      assert(math.abs(r.getAs[Double]("dist") - d) < 2e-6, s"at $key")
    }
  }

  // -------------------------------------------------------- assignShards

  test("assignShards: equals the naive global-window formulation") {
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val got = Packing.assignShards(docs, "doc_id", tok,
      tokensPerShard = 5000L, seed = 7L, nBuckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("global_start"), r.getAs[Long]("shard"))).toMap
    // naive: one global order by (u, id), running start, integral div
    val rows = docs.select(col("doc_id"),
        Sampling.hashUniform(col("doc_id"), 7L).as("u"),
        tok.cast("long").as("t"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("u"), r.getAs[Long]("t")))
      .sortBy(t => (t._2, t._1))
    var acc = 0L
    rows.foreach { case (id, _, t) =>
      val (start, shard) = got(id)
      assert(start === acc, s"doc $id")
      assert(shard === Math.floorDiv(acc, 5000L), s"doc $id")
      acc += t
    }
  }

  test("assignShards: bucket count does not change the layout") {
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    def run(b: Int) = Packing.assignShards(docs, "doc_id", tok,
      tokensPerShard = 3000L, seed = 1L, nBuckets = b)
      .select("doc_id", "global_start", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(1) === run(257))
  }

  test("assignShards: a new seed reshuffles; same seed is stable") {
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    def run(seed: Long) = Packing.assignShards(docs, "doc_id", tok,
      tokensPerShard = 3000L, seed = seed)
      .select("doc_id", "global_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(5L) === run(5L))
    assert(run(5L) !== run(6L))
  }

  test("writeTrainingShards: layout on disk + manifest agree with the plan") {
    val dir = java.nio.file.Files.createTempDirectory("shards_").toString
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val manifest = Packing.writeTrainingShards(docs, dir, "doc_id", tok,
      tokensPerShard = 5000L, seed = 7L, carry = Seq("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val assigned = Packing.assignShards(docs, "doc_id", tok, 5000L, 7L)
    val expect = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(manifest.toSeq === expect.toSeq)
    // every shard directory exists and rereads with its doc count
    val back = spark.read.parquet(dir)
    manifest.foreach { case (s, n, _) =>
      assert(back.filter(col("shard") === s).count() === n)
    }
    // the manifest file is real JSON with the layout parameters
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.json")), "UTF-8")
    assert(txt.contains("\"tokens_per_shard\":5000"))
    assert(txt.contains("\"seed\":7"))
  }

  // ------------------------------------------------- signal correlation

  test("signal correlation: perfect, inverse and degenerate cases") {
    import spark.implicits._
    val tiny = Seq(
      ("s", 1L, 2L, 9L, 4L), ("s", 2L, 4L, 8L, 4L),
      ("s", 3L, 6L, 7L, 4L)).toDF("source", "a", "b", "c", "d")
    val r = Drift.signalCorrelation(tiny,
        Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"),
          "d" -> col("d")))
      .collect().map(x => (x.getAs[String]("signal_a"),
        x.getAs[String]("signal_b")) ->
        Option(x.getAs[java.lang.Double]("corr"))).toMap
    assert(r(("a", "b")) === Some(1.0))  // b = 2a
    assert(r(("a", "c")) === Some(-1.0)) // c = 10 − a
    assert(r(("a", "d")) === None)       // d constant: zero variance
    assert(r.size === 6)                 // unordered pairs only
  }

  test("signal correlation: matches a driver-side Pearson on the fixture") {
    val st = graft.text.TextAnalysis.textStats(col("text"))
    val res = Drift.signalCorrelation(docs,
        Seq("n_chars" -> col("n_chars"), "alpha" -> st.getField("alpha")))
      .collect().map(x => x.getAs[String]("stratum") ->
        x.getAs[Double]("corr")).toMap
    val rows = docs.select(col("source"), col("n_chars"),
        st.getField("alpha").cast("long").as("al"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val n = g.length.toDouble
      val xs = g.map(_._2.toDouble); val ys = g.map(_._3.toDouble)
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = g.map(t => t._2.toDouble * t._3.toDouble).sum
      val expect = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(res(src) - expect) < 1e-5, s"source $src")
    }
  }

  // ------------------------------------------------------- plan guards

  test("plan guards: pmi top-k take-ordered, outliers heap-aggregated " +
      "and broadcast, shards never a global window") {
    val pmi = SparkEntry.queries("q_pmi")(spark, sf0001)
    val pmiPlan = pmi.queryExecution.executedPlan.toString
    assert(pmiPlan.contains("TakeOrderedAndProject"),
      "pmi must top-k via TakeOrderedAndProject, not a global sort")
    val out = SparkEntry.queries("q_outliers")(spark, sf0001)
    val outPlan = out.queryExecution.executedPlan.toString
    assert(outPlan.contains("ObjectHashAggregate"),
      "outliers must select via the bounded-heap aggregate")
    assert(outPlan.contains("BroadcastHashJoin"),
      "the centroid dimension table must broadcast")
    assert(!outPlan.contains("Window"),
      "outliers must never plan a per-label window")
    val sh = SparkEntry.queries("q_shards")(spark, sf0001)
    val shPlan = sh.queryExecution.executedPlan.toString
    assert(!shPlan.contains("Exchange SinglePartition") &&
      !shPlan.contains("Exchange rangepartitioning"),
      "the shard cumsum must stay bucket-partitioned — no global " +
        "single-partition or range exchange")
    assert(shPlan.contains("Window"), "bucket-partitioned window expected")
  }

  // --------------------------------------- curate → shards composition

  test("curate output drives writeTrainingShards: the full corpus → " +
      "training-files pipeline lands on disk with a manifest") {
    import graft.operators.{Curation, Packing}
    val bench = docs.filter(col("doc_id") < 5)
    val manifest = Curation.curate(docs, bench,
      capacity = 64L, shards = 4)
    // the curated manifest carries one row per surviving doc with its
    // exact token count — exactly the frame the shard writer expects
    val survivors = manifest.select(col("doc_id"), col("n_tokens"))
    val dir = java.nio.file.Files.createTempDirectory("curated_").toString
    val shardStats = Packing.writeTrainingShards(survivors, dir,
      "doc_id", col("n_tokens"),
      tokensPerShard = 2000L, seed = 7L, carry = Seq("n_tokens"))
      .collect()
    assert(shardStats.nonEmpty)
    // the on-disk layout holds every survivor exactly once, in shard
    // dirs, with the manifest totals agreeing
    val back = spark.read.parquet(dir)
    assert(back.count() === survivors.count())
    assert(back.select("doc_id").distinct().count() === survivors.count())
    assert(shardStats.map(_.getLong(1)).sum === survivors.count())
    // every shard except possibly the last starts a doc below the token
    // budget boundary (start-rule contract)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("shard=")) === shardStats.length)
  }

  // -------------------------------------------------------- JSONL I/O

  test("jsonl round-trip: newlines, quotes and unicode survive exactly") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "line one\nline two\ttabbed", "en"),
      (2L, "\"quoted\" and \\backslash\\", "de"),
      (3L, "ünïcødé — 中文 🙂", "fr"),
      (4L, "", "es")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_").toString
    graft.sources.CorpusIO.writeJsonl(nasty, dir, partitions = 2)
    val back = graft.sources.CorpusIO.readJsonl(spark, dir, nasty.schema)
    val a = nasty.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val b = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // shards really are gzip JSONL files
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length === 2)
  }

  test("jsonl read is schema-pinned: no inference pass, wrong-type " +
      "lines null out instead of poisoning the schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      ("{\"doc_id\": 1, \"text\": \"ok\"}\n" +
        "{\"doc_id\": \"not a number\", \"text\": \"bad\"}\n")
        .getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val got = graft.sources.CorpusIO.readJsonl(spark, dir, schema)
    assert(got.schema === schema) // pinned, not inferred
    val rows = got.collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(0)) === 1) // bad line nulls, not throws
  }

  // --------------------------------------------- sketch profile (approx)

  test("approx corpus stats: doc-grain columns are exact, sketches bounded") {
    val approx = Indexing.approxCorpusStats(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val exactDocs = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(tok).as("t")).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("t"))).toMap
    val exactTerms = docs.select(col("source"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source")).agg(countDistinct(col("term")).as("d"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("d")).toMap
    exactDocs.foreach { case (s, (n, t)) =>
      val r = approx(s)
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("total_tokens") === t)
      val est = r.getAs[Long]("distinct_terms_approx").toDouble
      val ex = exactTerms(s).toDouble
      assert(math.abs(est - ex) / ex < 0.15,
        s"source $s: HLL est $est vs exact $ex")
      // percentile sketches stay inside the observed token-count range
      val p50 = r.getAs[Long]("p50_tokens_approx")
      val p95 = r.getAs[Long]("p95_tokens_approx")
      assert(p50 <= p95)
    }
  }

  // ------------------------------------------- Drift.robustStats

  test("robustStats: lower median and MAD per stratum; immune to one " +
      "giant outlier; NULL stratum under the sentinel") {
    import spark.implicits._
    import graft.text.Drift
    // A: 1,2,3,4,100 → median 3, |d| = 2,1,0,1,97 → MAD 1
    // B: 5,5,7 → median 5, MAD 0 ; one NULL-stratum row
    val df = (Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"),
      (100L, "A"), (5L, "B"), (5L, "B"), (7L, "B")) :+
      ((9L, null.asInstanceOf[String])))
      .toDF("v", "src")
    val got = Drift.robustStats(df, "src", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") === ((5L, 3.0, 1.0)))
    assert(got("B") === ((3L, 5.0, 0.0)))
    assert(got(graft.operators.Sampling.NullStratum) === ((1L, 9.0, 0.0)))
    // the mean would be 22 for A; the median doesn't move — that's the
    // point
  }

  test("robustOutliers: the planted giant flags, inliers don't; " +
      "MAD-0 stratum flags any deviation with NULL score") {
    import spark.implicits._
    import graft.text.Drift
    // A: tight cluster + one giant; B: collapsed distribution + one dev
    val df = (Seq((1L, 100L, "A"), (2L, 101L, "A"), (3L, 99L, "A"),
      (4L, 102L, "A"), (5L, 5000L, "A"),
      (6L, 7L, "B"), (7L, 7L, "B"), (8L, 7L, "B"), (9L, 8L, "B")))
      .toDF("id", "v", "src")
    val got = Drift.robustOutliers(df, "src", "v", "id")
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
    // A: lower median 101 (ceil(5/2)=3rd of 99..5000), |d| grid
    // 0,1,1,2,4899 → MAD 1; giant M = .6745·4899
    assert(got(5L)._2 && got(5L)._1.get > 1000)
    assert(!got(1L)._2 && !got(2L)._2 && !got(4L)._2)
    assert(got(4L)._1.get === 0.6745) // (102−101)/1 on the 1e-6 grid
    assert(got(3L)._1.get === -(0.6745 * 2)) // 99 is 2 below the median
    // B: median 7, MAD 0 → NULL score, deviation flags
    assert(got(6L)._1.isEmpty && !got(6L)._2)
    assert(got(9L)._1.isEmpty && got(9L)._2)
  }

  test("winsorize: exact grid quantile band, clamp and flags; the " +
      "giant survives clamped instead of dropped") {
    import spark.implicits._
    import graft.text.Drift
    // 1..100 in one stratum: p05 -> 5 (cum>=ceil(5)), p95 -> 95
    val df = ((1L to 100L).map(v => (v, v, "A")) :+ ((999L, 100000L, "A")))
      .toDF("id", "v", "src")
    val got = Drift.winsorize(df, "src", "v", "id",
        pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    // n=101: ceil(.05*101)=6 -> lo=6; ceil(.95*101)=96 -> hi=96
    assert(got(50L) === ((6.0, 96.0, 50.0, false)))
    assert(got(3L) === ((6.0, 96.0, 6.0, true)))
    assert(got(999L) === ((6.0, 96.0, 96.0, true)))
    assert(got.size === 101)
  }

  test("gridQuantiles: lower quantiles land on exact grid values; " +
      "p100 is the max; column naming handles fractional percents") {
    import spark.implicits._
    import graft.text.Drift
    val df = (1L to 100L).map(v => (v, "A")).toDF("v", "src")
    val r = Drift.gridQuantiles(df, "src", "v",
      Seq(0.25, 0.5, 0.999, 1.0)).head()
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("p25") === 25.0)
    assert(r.getAs[Double]("p50") === 50.0)
    assert(r.getAs[Double]("p99_9") === 100.0) // ceil(99.9) = 100
    assert(r.getAs[Double]("p100") === 100.0)
  }

  test("robustStats: even-count stratum takes the lower median") {
    import spark.implicits._
    import graft.text.Drift
    val df = Seq((1L, "E"), (2L, "E"), (3L, "E"), (4L, "E"))
      .toDF("v", "src")
    val r = Drift.robustStats(df, "src", "v").head()
    // ⌈4/2⌉ = 2 → lower median 2; |d| grid 1,0,1,2 → cum at 1 (count
    // 2... d values: 1,0,1,2 → grid {0:1, 1:2, 2:1}; ⌈4/2⌉=2 → MAD 1
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 1.0)
  }

  // --------------------------------- Drift.populationStabilityIndex

  test("PSI: identical samples score 0; a hard shift crosses the 0.25 " +
      "action line; empty bins stay finite via smoothing") {
    import spark.implicits._
    import graft.text.Drift
    val ref = Seq(0.05, 0.15, 0.15, 0.25, 0.35).toDF("s")
    val same = Drift.populationStabilityIndex(ref, ref, "s", bins = 10)
      .collect()
    assert(same.length === 10)
    assert(same.head.getAs[Double]("psi") === 0.0)
    // all mass moved to the top bin: PSI blows past 0.25 and every
    // term — including the now-empty ref-side bins — is finite
    val cur = Seq(0.95, 0.96, 0.97, 0.98, 0.99).toDF("s")
    val shifted = Drift.populationStabilityIndex(ref, cur, "s",
      bins = 10).collect()
    val psi = shifted.head.getAs[Double]("psi")
    assert(psi > 0.25, s"psi $psi")
    assert(shifted.forall(r => !r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite))
    // per-bin counts land where the clamped binning says
    val byBin = shifted.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(byBin(0L) === ((1L, 0L)) && byBin(9L) === ((0L, 5L)))
    assert(byBin(1L) === ((2L, 0L)))
  }

  test("quantile PSI: equal-frequency reference bins; scale-free " +
      "(unbounded scores); identical -> 0, shift detected") {
    import spark.implicits._
    import graft.text.Drift
    // unbounded score range — the fixed-width [0,1] variant can't bin
    // this; quantile edges come from the reference itself
    val ref = (1 to 100).map(_.toDouble * 37).toDF("s")
    val same = Drift.populationStabilityIndexQuantile(ref, ref, "s",
      bins = 10).collect()
    assert(same.head.getAs[Double]("psi") === 0.0)
    // every reference decile holds exactly 10 of the 100 rows
    assert(same.forall(_.getAs[Long]("n_ref") === 10L))
    // current sample squeezed into the top decile
    val cur = Seq.fill(50)(97.0 * 37).toDF("s")
    val shifted = Drift.populationStabilityIndexQuantile(ref, cur, "s",
      bins = 10).collect()
    assert(shifted.head.getAs[Double]("psi") > 0.25)
    // all current mass in bin 9 (score ≥ the 90th-percentile edge)
    val byBin = shifted.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byBin(9L) === 50L && byBin(0L) === 0L)
  }

  test("PSI: out-of-range scores clamp into the edge bins") {
    import spark.implicits._
    import graft.text.Drift
    val ref = Seq(-3.0, 0.5).toDF("s")
    val cur = Seq(7.7, 0.5).toDF("s")
    val rows = Drift.populationStabilityIndex(ref, cur, "s", bins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(0L) === ((1L, 0L)))
    assert(rows(9L) === ((0L, 1L)))
    assert(rows(5L) === ((1L, 1L)))
  }
}
