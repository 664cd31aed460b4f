package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sessionize}
import graft.text.Chunking

/** Round-6 curation additions: DSIR importance resampling, RAG chunking,
  * gap sessionization, exact-k stratified sampling, hashed linear
  * quality scoring, distributed k-means refinement, and BPE tokenizer
  * training/inference. */
class CurationOpsSpec extends SparkSuite {

  // ----------------------------------------------------------------- DSIR

  test("dsir: buckets are in range and deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val b = docs.select(explode(Dsir.hashedBigramBuckets(col("text"))))
      .as[Long].collect()
    assert(b.length === 4) // 5 tokens -> 4 bigrams, multiplicity kept
    assert(b.forall(x => x >= 0 && x < 4096))
    // "a b" occurs twice -> identical bucket both times
    val again = docs.select(explode(Dsir.hashedBigramBuckets(col("text"))))
      .as[Long].collect()
    assert(b.toSeq === again.toSeq)
  }

  test("dsir: in-target-distribution doc outweighs out-of-distribution") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox leaps over the lazy cat"),
      (3L, "zzq qqz zqq qzz zqz qzq zzz qqq zq qz")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 1L)
    val w = Dsir.importanceLogWeights(docs, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L)) // target doc itself beats gibberish
    assert(w(2L) > w(3L)) // near-target beats gibberish
  }

  test("dsir: log weight matches a driver-side recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma delta"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2L)
    val feats = docs.select(col("doc_id"),
        explode(Dsir.hashedBigramBuckets(col("text"))).as("f"))
      .as[(Long, Long)].collect()
    val tgt = feats.filter(_._1 <= 2L)
    val rawC = feats.groupBy(_._2).map { case (f, xs) => f -> xs.length }
    val tgtC = tgt.groupBy(_._2).map { case (f, xs) => f -> xs.length }
    val rn = feats.length.toDouble; val tn = tgt.length.toDouble
    def lr(f: Long): Double =
      math.log((tgtC.getOrElse(f, 0) + 1.0) / (tn + 4096.0)) -
        math.log((rawC(f) + 1.0) / (rn + 4096.0))
    val expected = feats.filter(_._1 == 1L).map(x => lr(x._2)).sum
    val got = Dsir.importanceLogWeights(docs, target)
      .filter(col("doc_id") === 1L).collect().head.getDouble(2)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("dsir: empty and sub-bigram docs get weight 0; resample contract") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words"),
      (4L, "more words here")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 4L)
    val w = Dsir.importanceLogWeights(docs, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(1L) === ((0L, 0.0)))
    assert(w(2L) === ((0L, 0.0)))
    assert(w(3L)._1 === 1L)
    val sel = Dsir.resample(docs, target, k = 2)
    val rows = sel.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(3)).sorted.toSeq === Seq(1, 2))
    // deterministic: same seed, same selection and order
    val again = Dsir.resample(docs, target, k = 2).collect()
    assert(rows.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
  }

  // ------------------------------------------------------------- chunking

  test("chunking: exact windows, overlap, short tail") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    // chunk=3, overlap=1 -> stride 2; n=6 -> ceil((6-3)/2)+1 = 3 chunks
    val rows = Chunking.chunkDocuments(docs, 3, 1).orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      (0, 3L, "t0 t1 t2"), (1, 3L, "t2 t3 t4"), (2, 2L, "t4 t5")))
  }

  test("chunking: short, exact-size and empty docs") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c"), (3L, "   "), (4L, ""))
      .toDF("doc_id", "text")
    val rows = Chunking.chunkDocuments(docs, 3, 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(rows.toSeq.sorted === Seq((1L, 0, "a b"), (2L, 0, "a b c")))
  }

  test("chunking: every token covered; consecutive chunks share overlap") {
    import spark.implicits._
    val n = 53; val chunk = 8; val overlap = 3
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.chunkDocuments(docs, chunk, overlap)
      .orderBy("chunk_id").collect().map(_.getString(3).split(" ").toSeq)
    assert(rows.flatten.distinct.length === n) // full coverage
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(overlap) === b.take(overlap))
      case _         => ()
    }
    assert(rows.last.nonEmpty) // never an empty tail chunk
  }

  test("chunking: argument validation") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkDocuments(docs, 0, 0))
    intercept[IllegalArgumentException](Chunking.chunkDocuments(docs, 4, 4))
  }

  // ----------------------------------------------------------- sessionize

  test("sessionize: gap splits, boundary gap stays in-session") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, 0.0), ("u1", 2L, 0.1), ("u1", 3L, 0.3), // 0.2 gap: stays
      ("u1", 4L, 0.9), ("u1", 5L, 1.0),                  // 0.6 gap: splits
      ("u2", 6L, 5.0)).toDF("user_id", "event_id", "ts")
    val res = Sessionize.sessionize(ev, "user_id", "ts", 0.2, "event_id")
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(res.toSeq === Seq(
      ("u1", 0L, 3L, 0.0, 0.3), ("u1", 1L, 2L, 0.9, 1.0),
      ("u2", 0L, 1L, 5.0, 5.0)))
  }

  // ------------------------------------------- exact-k stratified sample

  test("stratifiedExactK: exact counts, short strata kept whole") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 50L).map(i => (i, if (i <= 40) "big" else "small"))
      .toDF("doc_id", "lang")
    val res = Sampling.stratifiedExactK(df, "doc_id", "lang", k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(res.count(_._1 == "big") === 10)
    assert(res.count(_._1 == "small") === 10) // only 10 rows exist
    // ranks contiguous from 1 within each stratum
    assert(res.filter(_._1 == "big").map(_._2).sorted.toSeq === (1 to 10))
    // matches the window formulation exactly
    val expected = df
      .withColumn("u", Sampling.hashUniform(col("doc_id"), 42L))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("u").desc, col("doc_id").asc)))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(res.toSet === expected)
  }

  test("weightedExactK: heavy weights dominate, equal weights reduce " +
      "to the uniform order, non-positive weights never sample") {
    import spark.implicits._
    import graft.operators.Sampling
    // A-ES keys: ln(u)/w → a 1e6× weight puts the key ~1e6× closer to
    // 0 than any light row's, so ALL heavy rows outrank all light ones
    val mixed = ((1L to 10L).map(i => (i, "s", 1.0e6)) ++
      (101L to 120L).map(i => (i, "s", 1.0e-3))).toDF("doc_id", "src", "w")
    val top = Sampling.weightedExactK(mixed, "doc_id", "src",
        col("w"), k = 10)
      .collect().map(_.getLong(2)).toSet
    assert(top === (1L to 10L).toSet)
    // equal weights: ln(u)/1 is monotone in u, so the selected SET and
    // ORDER equal stratifiedExactK's uniform draw
    val df = (1L to 50L).map(i => (i, if (i <= 40) "big" else "small"))
      .toDF("doc_id", "lang")
    val wk = Sampling.weightedExactK(df, "doc_id", "lang", lit(1.0),
        k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val uk = Sampling.stratifiedExactK(df, "doc_id", "lang", k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(wk.toSet === uk.toSet)
    // zero/negative/null weights are excluded entirely
    val guarded = ((1L to 5L).map(i => (i, "s", 2.0)) ++
      Seq((6L, "s", 0.0), (7L, "s", -1.0)))
      .toDF("doc_id", "src", "w")
      .unionByName(Seq((8L, "s", null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "src", "w"))
    val kept = Sampling.weightedExactK(guarded, "doc_id", "src",
      col("w"), k = 10).collect().map(_.getLong(2)).toSet
    assert(kept === (1L to 5L).toSet)
    // plan guard: bounded-heap aggregate, never a per-stratum window
    val plan = Sampling.weightedExactK(df, "doc_id", "lang", lit(1.0),
      k = 10).queryExecution.optimizedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty)
    // layout determinism
    val again = Sampling.weightedExactK(df.repartition(7), "doc_id",
        "lang", lit(1.0), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSet === wk.toSet)
  }

  // --------------------------------------------------- quality classifier

  test("classifier: hand-computed score, empty doc, weight monotonicity") {
    import spark.implicits._
    import graft.text.Classifier
    val docs = Seq((1L, "a a b"), (2L, "")).toDF("doc_id", "text")
    // weights resolved through the real bucket hash so the lookup path
    // is exercised end to end
    val buckets = docs.select(
      explode(Classifier.hashedTokenBuckets(col("text"), 4096))).as[Long]
      .collect().distinct
    val w = new Array[Double](4096)
    val Seq(ba, bb) = docs.filter(col("doc_id") === 1L).select(
      Classifier.hashedTokenBuckets(col("text"), 4096)).as[Seq[Long]]
      .collect().head.distinct.toSeq
    w(ba.toInt) = 0.6; w(bb.toInt) = -0.3
    val scored = docs.select(col("doc_id"),
      Classifier.scoreWithWeights(col("text"), w, bias = 0.1).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val logit1 = 0.1 + (0.6 + 0.6 - 0.3) / 3.0
    assert(math.abs(scored(1L) - 1.0 / (1.0 + math.exp(-logit1))) < 1e-12)
    assert(math.abs(scored(2L) - 1.0 / (1.0 + math.exp(-0.1))) < 1e-12)
    assert(buckets.forall(b => b >= 0 && b < 4096))
    // raising a token's weight raises the containing doc's score
    w(bb.toInt) = 0.9
    val rescored = docs.filter(col("doc_id") === 1L).select(
      Classifier.scoreWithWeights(col("text"), w, bias = 0.1))
      .collect().head.getDouble(0)
    assert(rescored > scored(1L))
  }

  // ---------------------------------------------------------------- bpe

  /** In-memory reference BPE (greedy left-to-right application, ties to
    * the lexicographically smallest pair) to pin the distributed
    * trainer. */
  private def refBpe(wc: Map[String, Long],
      t: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] = wc.toSeq.map { case (w, n) =>
      (w.map(_.toString).toVector :+ "</w>") -> n
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    for (round <- 1 to t) {
      val freqs = words.flatMap { case (s, n) =>
        s.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)) -> n)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (freqs.nonEmpty) {
        val ((a, b), f) = freqs.minBy { case ((a, b), f) => (-f, a, b) }
        if (f >= 2) {
          out += ((round, a, b, a + b, f))
          words = words.map { case (s, n) =>
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.result() -> n
          }
        }
      }
    }
    out.toSeq
  }

  test("bpe: learned merges match the in-memory reference on a corpus") {
    import spark.implicits._
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "new" -> 4L)
    // one doc per word repetition so the word-count table matches wc
    val docs = wc.toSeq.flatMap { case (w, n) =>
      (1L to n).map(i => (w.hashCode.toLong * 100 + i, w))
    }.toDF("doc_id", "text")
    val got = graft.text.Bpe.trainMerges(docs, merges = 6)
    assert(got === refBpe(wc, 6))
    assert(got.length === 6) // corpus rich enough for all rounds
  }

  test("bpe: greedy overlap semantics and early stop") {
    import spark.implicits._
    // "aaa" -> a a a </w>; merging (a, a) greedily gives [aa, a, </w>]
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = graft.text.Bpe.trainMerges(docs, merges = 10)
    assert(m.head._2 === "a"); assert(m.head._3 === "a")
    val ref = refBpe(Map("aaa" -> 2L), 10)
    assert(m === ref)
    assert(m.length < 10) // stops when no pair repeats
    // unique-word corpus: every pair has freq 1 -> zero merges
    val lone = Seq((1L, "xyz")).toDF("doc_id", "text")
    assert(graft.text.Bpe.trainMerges(lone, merges = 3).isEmpty)
  }

  test("bpe tokenCounts: pieces shrink with merges, empty doc is 0") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "newest"), (3L, ""))
      .toDF("doc_id", "text")
    // no merges: every word costs chars + 1 pieces
    val raw = graft.text.Bpe.tokenCounts(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(raw(1L) === ((3L, (3 + 1) * 2 + (5 + 1) * 1)))
    assert(raw(2L) === ((1L, 6 + 1)))
    assert(raw(3L) === ((0L, 0L)))
    // with trained merges, piece counts only go down, never below word count
    val merges = graft.text.Bpe.trainMerges(docs, merges = 4)
    val enc = graft.text.Bpe.tokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(enc(1L) < raw(1L)._2)
    assert(enc(1L) >= 3L)
    assert(enc(3L) === 0L)
  }

  test("bpe encodeIds: sequences decode consistently with piece counts " +
      "and the deterministic vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower"), (2L, "newest"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = graft.text.Bpe.trainMerges(docs, merges = 4)
    val vocab = graft.text.Bpe.pieceVocab(docs, merges).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("pid"),
        r.getAs[Long]("n_occ")))
    // ids are a contiguous 0-based range ordered by (count desc, piece)
    assert(vocab.map(_._2).sorted.toSeq === vocab.indices.map(_.toLong))
    val byPid = vocab.sortBy(_._2)
    byPid.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    val enc = graft.text.Bpe.encodeIds(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the id sequence length IS the piece count (tokenCounts agreement)
    val counts = graft.text.Bpe.tokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    enc.foreach { case (id, (np, ids)) =>
      assert(np === counts(id), s"doc $id")
      val seq = if (ids.isEmpty) Nil else ids.split(",").toSeq
      assert(seq.length.toLong === np, s"doc $id")
      // every id is a valid vocab id
      seq.foreach(s => assert(s.toLong >= 0 && s.toLong < vocab.length))
    }
    assert(enc(3L) === ((0L, "")))
    // decode check: mapping ids back to pieces and stripping the </w>
    // markers reproduces doc 2's text
    val pieceOf = byPid.map(t => t._2 -> t._1).toMap
    val decoded = enc(2L)._2.split(",").map(s => pieceOf(s.toLong))
      .mkString("").replace("</w>", " ").trim
    assert(decoded === "newest")
    // identical words encode identically: doc 1 is "low low lower", so
    // its decoded text reproduces exactly (same id run for both "low"s)
    val d1 = enc(1L)._2.split(",").map(s => pieceOf(s.toLong))
      .mkString("").replace("</w>", " ").trim
    assert(d1 === "low low lower")
  }

  test("vocabTopK: ordering, tie-break, bound") {
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c c z"), (2L, "a z")).toDF("doc_id", "text")
    val v = graft.text.Bpe.vocabTopK(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  // ------------------------------------------------------- kmeans refine

  test("kmeansRefine: recenters onto cluster means, keeps empty cells") {
    import spark.implicits._
    import graft.similarity.Similarity
    // two tight clusters in 2-D; init centroids deliberately offset, plus
    // a third centroid no point is nearest to
    val pts = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(10.0f, 9.9f)), (4L, Array(9.9f, 10.0f)))
      .toDF("vec_id", "embedding")
    val init = Array(Array(1.0, 1.0), Array(8.0, 8.0), Array(100.0, 100.0))
    val r1 = Similarity.kmeansRefine(pts, init, iters = 1, roundDecimals = 6)
    assert(r1(0).toSeq === Seq(0.05, 0.05))
    assert(r1(1).toSeq === Seq(9.95, 9.95))
    assert(r1(2).toSeq === Seq(100.0, 100.0)) // empty cell: carried over
    // a second iteration is a fixpoint here
    val r2 = Similarity.kmeansRefine(pts, init, iters = 2)
    assert(r2.map(_.toSeq).toSeq === r1.map(_.toSeq).toSeq)
    // iters = 0 returns the init unchanged
    assert(Similarity.kmeansRefine(pts, init, iters = 0)
      .map(_.toSeq).toSeq === init.map(_.toSeq).toSeq)
  }

  // ------------------------------------------------------- plan guards

  test("plan guards: exact-k is heap-aggregated, map-only ops stay " +
      "shuffle-free") {
    val ek = SparkEntry.queries("q_stratified_exact_k")(spark, sf0001)
    val ekPlan = ek.queryExecution.executedPlan.toString
    assert(ekPlan.contains("ObjectHashAggregate"),
      "exact-k must select via the bounded-heap aggregate")
    assert(!ekPlan.contains("Window"),
      "exact-k must never plan a per-stratum window")
    // the OPERATORS must add no shuffle; the r13 input-parallelism floor
    // (SparkEntry.table: explicit round-robin spread of a
    // fewer-splits-than-cores scan) is ingest, not operator work.
    // Tightened per ADVICE r13: the tolerated round-robin exchange must
    // sit DIRECTLY above the file scan, and ReusedExchange pointers
    // don't count as new shuffles.
    def opExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val lines = df.queryExecution.executedPlan.toString
        .linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Exchange RoundRobinPartitioning"))
          assert(lines.slice(i + 1, i + 5).exists(n =>
            n.contains("FileScan") || n.contains("Scan parquet")),
            s"round-robin exchange not directly above a scan:\n$l")
      }
      lines.count(l => l.contains("Exchange ") &&
        !l.contains("Exchange RoundRobinPartitioning") &&
        !l.contains("ReusedExchange"))
    }
    val ch = SparkEntry.queries("q_chunks")(spark, sf0001)
    assert(opExchanges(ch) === 0, "chunking must stay map-only")
    val qc = SparkEntry.queries("q_quality_classifier")(spark, sf0001)
    assert(opExchanges(qc) === 0, "classifier scoring must stay map-only")
    val se = SparkEntry.queries("q_sessionize")(spark, sf0001)
    val sePlan = se.queryExecution.executedPlan.toString
    // exactly the one per-entity hash exchange the semantics require
    assert("Exchange hashpartitioning".r
      .findAllIn(sePlan).length === 1, sePlan.linesIterator.take(5).mkString)
  }

  test("sessionize: equal timestamps are one session, deterministic") {
    import spark.implicits._
    val ev = Seq(("u1", 2L, 1.0), ("u1", 1L, 1.0), ("u1", 3L, 1.0))
      .toDF("user_id", "event_id", "ts")
    val res = Sessionize.sessionize(ev, "user_id", "ts", 0.0, "event_id")
      .collect()
    assert(res.length === 1)
    assert(res.head.getLong(2) === 3L) // n_events
    assert(res.head.getDouble(5) === 0.0) // duration
  }

  test("classifier training: first step from zero matches the hand " +
      "gradient; the trained model separates the classes") {
    import graft.text.Classifier
    import spark.implicits._
    // class 1 speaks 'aaa', class 0 speaks 'bbb'; two docs each
    val corpus = Seq(
      (1L, "aaa aaa", 1.0), (2L, "aaa", 1.0),
      (3L, "bbb bbb", 0.0), (4L, "bbb", 0.0))
      .toDF("doc_id", "text", "y")
    // one iteration from w = 0: p = 0.5 for every doc, so
    // g_j = Σ_d (0.5 − y_d)·c_dj/n_d / N and w1_j = q(−lr·g_j)
    val (w1, b1) = Classifier.train(corpus, col("y"), buckets = 16,
      iters = 1, lr = 1.0)
    val bA = spark.range(1).select(explode(
      Classifier.hashedTokenBuckets(lit("aaa"), 16))).as[Long].head
    val bB = spark.range(1).select(explode(
      Classifier.hashedTokenBuckets(lit("bbb"), 16))).as[Long].head
    assert(bA != bB) // fixture sanity: no hash collision at 16 buckets
    def q(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    // docs 1, 2: (0.5 − 1)·(2/2 and 1/1); docs 3, 4 symmetric positive
    assert(w1(bA.toInt) === q(-((-0.5) + (-0.5)) / 4))
    assert(w1(bB.toInt) === q(-(0.5 + 0.5) / 4))
    assert(b1 === q(-(4 * 0.5 - 2.0) / 4)) // Σ(0.5−y) = 0 here
    // more iterations: the model separates the classes through the
    // SHARED inference path
    val (w, b) = Classifier.train(corpus, col("y"), buckets = 16,
      iters = 20, lr = 2.0)
    val scores = corpus.select(col("doc_id"),
        Classifier.scoreWithWeights(col("text"), w, b).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 0.8 && scores(2L) > 0.8)
    assert(scores(3L) < 0.2 && scores(4L) < 0.2)
  }

  test("classifier training: empty docs drive only the bias; layout " +
      "does not change the model") {
    import graft.text.Classifier
    import spark.implicits._
    val corpus = Seq(
      (1L, "xx yy", 1.0), (2L, "", 1.0), (3L, "zz", 0.0))
      .toDF("doc_id", "text", "y")
    val (w, b) = Classifier.train(corpus, col("y"), buckets = 8,
      iters = 3, lr = 0.5)
    val (w2, b2) = Classifier.train(corpus.repartition(7), col("y"),
      buckets = 8, iters = 3, lr = 0.5)
    assert(w.toSeq === w2.toSeq)
    assert(b === b2)
    // the empty doc's pull on the bias is visible: with 2 positives and
    // 1 negative the bias moves up from zero
    assert(b > 0.0)
  }

  test("trainTrajectory: last snapshot IS train's model; snapshots " +
      "differ across epochs") {
    import graft.text.Classifier
    import spark.implicits._
    val corpus = Seq(
      (1L, "aaa aaa", 1.0), (2L, "aaa", 1.0),
      (3L, "bbb bbb", 0.0), (4L, "bbb", 0.0))
      .toDF("doc_id", "text", "y")
    val traj = Classifier.trainTrajectory(corpus, col("y"), buckets = 16,
      iters = 3, lr = 1.0)
    val (w, b) = Classifier.train(corpus, col("y"), buckets = 16,
      iters = 3, lr = 1.0)
    assert(traj.size === 3)
    assert(traj.last._1.toSeq === w.toSeq && traj.last._2 === b)
    assert(traj(0)._1.toSeq !== traj(1)._1.toSeq)
  }

  test("cartography: clean examples gain confidence, a mislabeled one " +
      "stays low; micro-unit stats are layout-invariant") {
    import graft.text.Classifier
    import spark.implicits._
    // doc 5 is 'aaa'-speak labeled 0 — deliberate label noise
    val corpus = Seq(
      (1L, "aaa aaa", 1), (2L, "aaa", 1),
      (3L, "bbb bbb", 0), (4L, "bbb", 0),
      (5L, "aaa aaa", 0))
      .toDF("doc_id", "text", "y")
    val traj = Classifier.trainTrajectory(corpus, col("y").cast("double"),
      buckets = 16, iters = 8, lr = 2.0)
    val m = Classifier.cartography(corpus, col("y"), traj)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // the mislabeled twin of doc 1 scores the SAME p per epoch but its
    // gold-label confidence is the complement — strictly worse
    assert(m(1L)._1 > 0.5 && m(5L)._1 < 0.5)
    assert(m(1L)._1 + m(5L)._1 === 1.0) // complement on the micro grid
    assert(m(5L)._3 < m(1L)._3) // correctness: noise never catches up
    // layout invariance of every statistic
    val m2 = Classifier.cartography(corpus.repartition(7), col("y"), traj)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(m === m2)
  }

  test("bpe decodeIds: full round-trip equals the normalized text; " +
      "empty docs decode to empty") {
    import spark.implicits._
    val docs = Seq((1L, "Low  LOW lower"), (2L, "newest widest"),
      (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val merges = graft.text.Bpe.trainMerges(docs, merges = 6)
    val dec = graft.text.Bpe.decodeIds(
        graft.text.Bpe.encodeIds(docs, merges),
        graft.text.Bpe.pieceVocab(docs, merges))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // decode(encode(x)) = lower-cased whitespace-normalized x
    assert(dec(1L) === "low low lower")
    assert(dec(2L) === "newest widest")
    assert(dec(3L) === "" && dec(4L) === "")
    // layout invariance through the whole chain
    val dec2 = graft.text.Bpe.decodeIds(
        graft.text.Bpe.encodeIds(docs.repartition(5), merges),
        graft.text.Bpe.pieceVocab(docs, merges))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec2 === dec)
  }

  test("gradientAlignment: target-aligned examples score positive, " +
      "off-distribution and mislabeled negative; layout-invariant") {
    import graft.text.Classifier
    import spark.implicits._
    val corpus = Seq(
      (1L, "aaa aaa", 1.0), (2L, "aaa", 1.0),
      (3L, "bbb bbb", 0.0), (4L, "bbb", 0.0),
      (5L, "aaa", 0.0)) // mislabeled twin of doc 2
      .toDF("doc_id", "text", "y")
    val (w, b) = Classifier.train(corpus, col("y"), buckets = 16,
      iters = 5, lr = 1.0)
    val target = corpus.filter(col("doc_id") <= 2) // class-1 slice
    val m = Classifier.gradientAlignment(corpus, target, w, b, col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // training on an 'aaa' positive moves the model toward the target;
    // its mislabeled twin pulls exactly the other way, and the 'bbb'
    // negatives are off-distribution (only the bias couples them)
    assert(m(1L) > 0 && m(2L) > 0)
    assert(m(5L) < 0)
    assert(m(5L) < m(3L) && m(5L) < m(4L))
    val m2 = Classifier.gradientAlignment(corpus.repartition(7), target,
      w, b, col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m === m2)
  }

  test("cartography: empty doc scores sigma(bias) every epoch; " +
      "single-epoch variability is exactly 0") {
    import graft.text.Classifier
    import spark.implicits._
    val corpus = Seq((1L, "", 1), (2L, "zz", 0))
      .toDF("doc_id", "text", "y")
    val traj = Classifier.trainTrajectory(corpus,
      col("y").cast("double"), buckets = 8, iters = 1, lr = 1.0)
    val rows = Classifier.cartography(corpus, col("y"), traj)
      .collect().map(r => r.getLong(0) -> r).toMap
    def sigma(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val u = math.floor(sigma(traj.head._2) * 1e6 + 0.5) / 1e6
    assert(rows(1L).getDouble(3) === u)
    assert(rows(1L).getDouble(4) === 0.0)
    assert(rows(2L).getDouble(4) === 0.0)
    assert(rows(1L).getLong(2) === 1L)
  }

  test("contextBudgetCurve: hand-computed fit/truncation table") {
    import spark.implicits._
    import graft.operators.Packing
    // token counts 3, 5, 10; contexts 4 and 8
    val docs = Seq((1L, "a b c"), (2L, "a b c d e"),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = Packing.contextBudgetCurve(docs,
        graft.text.TextAnalysis.wsTokenCount(col("text")), Seq(4, 8))
      .collect().map(r => r.getLong(0) -> r).toMap
    // L=4: 1 doc fits; kept = 3 + 4 + 4 = 11 of 18
    assert(got(4L).getAs[Long]("n_docs") === 3L)
    assert(got(4L).getAs[Long]("n_docs_fit") === 1L)
    assert(got(4L).getAs[Long]("tokens_kept_truncate") === 11L)
    assert(got(4L).getAs[Double]("frac_tokens_kept") === 0.611111)
    // L=8: 2 docs fit; kept = 3 + 5 + 8 = 16 of 18
    assert(got(8L).getAs[Long]("n_docs_fit") === 2L)
    assert(got(8L).getAs[Long]("tokens_kept_truncate") === 16L)
  }

  test("sequenceBoundaries: segments tile each packed sequence exactly, " +
      "fragments split at capacity, padding only on the tail") {
    import spark.implicits._
    import graft.operators.Packing
    // one shard, capacity 5, docs of 3/4/2 tokens packed in id order:
    // seq 0 = d1[0,3) d2[3,5); seq 1 = d2[0,2) d3[2,4) pad 1
    val docs = Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val manifest = Packing.packConcat(docs, "doc_id",
      graft.text.TextAnalysis.wsTokenCount(col("text")),
      capacity = 5L, shards = 1)
    val segs = Packing.sequenceBoundaries(manifest, 5L)
      .collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end"),
          r.getAs[Int]("segment"), r.getAs[Long]("padding")))).toMap
    assert(segs((0L, 1L)) === ((0L, 3L, 1, 0L)))
    assert(segs((0L, 2L)) === ((3L, 5L, 2, 0L)))
    assert(segs((1L, 2L)) === ((0L, 2L, 1, 1L)))
    assert(segs((1L, 3L)) === ((2L, 4L, 2, 1L)))
    assert(segs.size === 4)
  }

  test("docKeywords: rare distinguishing terms outrank ubiquitous ones") {
    import spark.implicits._
    import graft.text.Indexing
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common common common yak"),
      (3L, "common plain words here")).toDF("doc_id", "text")
    val got = Indexing.docKeywords(docs, "doc_id", "text", k = 2,
        minDf = 1L)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(5)).map(_.getString(1)).toSeq)
      .toMap
    // doc 1: 'zebra' tf=3·idf(ln(4/2)+1)≈5.08 beats 'common' tf=2·1=2;
    // doc 2: 'common' tf=3·1=3 still beats 'yak' 1·1.69 — idf tempers,
    // not erases, term frequency
    assert(got(1L) === Seq("zebra", "common"))
    assert(got(2L) === Seq("common", "yak"))
    // every doc emits ≤ k rows, ranked 1..k
    got.values.foreach(terms => assert(terms.size <= 2))
  }
}
