package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pca
import graft.text.{HeuristicFilters, Indexing}

/** Round-7 additions: published heuristic filter rule sets (C4, Gopher),
  * sparse TF-IDF all-pairs similarity, and distributed power-iteration
  * PCA. */
class FiltersSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------- C4

  test("c4Clean: line rules keep exactly terminal-punct lines with >=3 words") {
    val docs = Seq(
      (1L, "This line ends well.\nno punct here\nShort.\n" +
        "Another good sentence here!\nA third one with words?")
    ).toDF("doc_id", "text")
    val r = HeuristicFilters.c4Clean(docs, minSentences = 2).head()
    assert(r.getAs[String]("clean_text") ===
      "This line ends well.\nAnother good sentence here!\n" +
        "A third one with words?")
    assert(r.getAs[Long]("n_lines_kept") === 3L)
    assert(r.getAs[Long]("n_lines_total") === 5L)
    assert(r.getAs[Long]("n_sentences") === 3L)
    assert(r.getAs[Boolean]("keep"))
  }

  test("c4Clean: page rules drop lorem ipsum, braces, short pages") {
    val docs = Seq(
      (1L, "A fine sentence stands here.\nAnd another one follows it."),
      (2L, "Lorem Ipsum dolor sit amet.\nAnd another one follows it."),
      (3L, "A config { block } lurks.\nAnd another one follows it."),
      (4L, "Only one real sentence here.")
    ).toDF("doc_id", "text")
    val keep = HeuristicFilters.c4Clean(docs, minSentences = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("c4Clean: closing quote is terminal; empty text yields empty page") {
    val docs = Seq(
      (1L, "He said the whole \"quote.\"\nplain trailer"),
      (2L, "")).toDF("doc_id", "text")
    val rows = HeuristicFilters.c4Clean(docs, minSentences = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("clean_text"), r.getAs[Boolean]("keep")))).toMap
    assert(rows(1L)._1 === "He said the whole \"quote.\"")
    assert(rows(1L)._2)
    assert(rows(2L)._1 === "" && !rows(2L)._2)
  }

  // --------------------------------------------------------------- Gopher

  test("gopherFilter: every signal computed; clean doc passes") {
    val good = ("the quick brown fox jumps over and over with " +
      "calm delight of that fine morning to be sure").trim
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    val r = HeuristicFilters.gopherFilter(docs, minWords = 10).head()
    assert(r.getAs[Long]("n_words") === 18L)
    assert(r.getAs[Double]("alpha_word_frac") === 1.0)
    assert(r.getAs[Long]("n_stopword_hits") >= 2L)
    assert(r.getAs[Double]("bullet_line_frac") === 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("gopherFilter: each published rule fails its crafted violator") {
    val base = "the meaning of life and all that have with it " // 10 words
    val docs = Seq(
      (1L, base * 2),                                    // passes (20 words)
      (2L, "the of and"),                                // too few words
      (3L, base + "#### ## # ## ## # ## # # #"),         // symbol ratio
      (4L, "• one\n• two\n• three\n• four"),             // bullets
      (5L, base + "\nsee more...\nread on...\nnext..."), // ellipsis lines
      (6L, base + "12 34 56 78 90 11 22 33 44 55 66"),   // alpha-word frac
      (7L, "zq qz zzz qqq www eee rrr ttt yyy uuu iii")  // no stopwords
    ).toDF("doc_id", "text")
    val got = HeuristicFilters.gopherFilter(docs, minWords = 15)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(got(1L))
    assert(!got(2L) && !got(3L) && !got(4L) && !got(5L) && !got(6L) &&
      !got(7L))
    // boundary: bullet fraction is strict-less-than 0.9
    val d4 = HeuristicFilters.gopherFilter(docs, minWords = 1)
      .filter(col("doc_id") === 4L).head()
    assert(d4.getAs[Double]("bullet_line_frac") === 1.0)
  }

  test("gopherFilter: empty document emits zero signals and fails") {
    val r = HeuristicFilters.gopherFilter(
      Seq((1L, "")).toDF("doc_id", "text")).head()
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Double]("mean_word_len") === 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  // --------------------------------------------------- TF-IDF pair cosine

  test("tfidfCosinePairs: hand-computed cosine on a 3-doc corpus") {
    // vocab after prune (maxDf=2): terms in <=2 docs. "common" (df 3)
    // must be pruned; "alpha" df 2, "beta"/"gamma" df 1.
    val docs = Seq(
      (1L, "common alpha alpha beta"),
      (2L, "common alpha"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val got = Indexing.tfidfCosinePairs(docs, "doc_id", "text",
      threshold = 0.0, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // w(alpha, d1) = 2 ln(3/2), w(beta, d1) = ln 3; w(alpha, d2) = ln(3/2)
    val wa1 = 2 * math.log(3.0 / 2); val wb1 = math.log(3.0)
    val wa2 = math.log(3.0 / 2)
    val exp12 = wa1 * wa2 /
      (math.sqrt(wa1 * wa1 + wb1 * wb1) * wa2)
    assert(math.abs(got((1L, 2L)) - exp12) < 1e-6)
    // doc 3 shares no kept term with anyone: no pair rows
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("tfidfCosinePairs: identical docs hit cosine 1; threshold gates") {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val all = Indexing.tfidfCosinePairs(docs, "doc_id", "text",
      threshold = 0.99, maxDf = 10).collect()
    assert(all.length === 1)
    assert(all.head.getLong(0) === 1L && all.head.getLong(1) === 2L)
    assert(all.head.getDouble(2) === 1.0)
  }

  test("tfidfCosinePairs: maxDf prune keeps pair work off stop terms") {
    // "the" appears in every doc; with maxDf = 2 it generates no pairs
    val docs = (1L to 6L).map(i => (i, s"the unique$i token$i"))
      .toDF("doc_id", "text")
    val got = Indexing.tfidfCosinePairs(docs, "doc_id", "text",
      threshold = 0.0, maxDf = 2)
    assert(got.count() === 0L)
  }

  // -------------------------------------------- script mix & fertility

  test("scriptCounts/dominantScript: mixed-script text counted exactly") {
    import graft.text.TextAnalysis._
    val docs = Seq(
      (1L, "hello мир привет"),          // 5 latin, 9 cyrillic
      (2L, "你好世界 ok"),               // 4 cjk, 2 latin
      (3L, "123 !!"),                    // no script chars
      (4L, "abc ابجد")                   // 3 latin, 4 arabic
    ).toDF("doc_id", "text")
    val cols = scriptCounts(col("text")).map { case (n, c) => c.as(n) }
    val got = docs.select(col("doc_id") +:
        (cols :+ dominantScript(col("text")).as("dom")): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_latin"), r.getAs[Long]("n_cyrillic"),
          r.getAs[Long]("n_cjk"), r.getAs[Long]("n_arabic"),
          r.getAs[String]("dom")))).toMap
    assert(got(1L) === ((5L, 9L, 0L, 0L, "cyrillic")))
    assert(got(2L) === ((2L, 0L, 4L, 0L, "cjk")))
    assert(got(3L) === ((0L, 0L, 0L, 0L, "none")))
    assert(got(4L) === ((3L, 0L, 0L, 4L, "arabic")))
    // tie (3 latin vs 3 cyrillic) resolves to the declaration order
    val tie = Seq((9L, "abc где")).toDF("doc_id", "text")
      .select(dominantScript(col("text"))).head.getString(0)
    assert(tie === "latin")
  }

  test("tokenizerFertility: exact integer sums, NULL lang sentinel") {
    import graft.text.Indexing
    val docs = Seq(
      (1L, Option("en"), "ab cd"),     // 5 chars, 2 bpe tokens
      (2L, Option("en"), "x,y"),       // 3 chars, 3 tokens (x , y)
      (3L, None, "hello")              // 5 chars, 1 token → sentinel
    ).toDF("doc_id", "lang", "text")
    val got = Indexing.tokenizerFertility(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("en") === ((2L, 8L, 5L, 1.6, 2.5)))
    assert(got("__null__") === ((1L, 5L, 1L, 5.0, 1.0)))
  }

  // --------------------------------------------------- accent folding

  test("foldAccents: precomposed and combining forms fold to one key") {
    import graft.text.TextAnalysis.foldAccents
    val docs = Seq(
      (1L, "héllo"),            // precomposed é
      (2L, "héllo"),           // e + combining acute
      (3L, "naïve Ångström"),
      (4L, "øre ß plain"), // ø/ß must NOT change
      (5L, "ascii only")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), foldAccents(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "hello" && got(2L) === "hello")
    assert(got(3L) === "naive Angstrom")
    assert(got(4L) === "øre ß plain")
    assert(got(5L) === "ascii only")
    // idempotent
    val twice = docs.select(foldAccents(foldAccents(col("text"))))
      .collect().map(_.getString(0)).toSet
    assert(twice === got.values.toSet)
  }

  // ------------------------------------------------ LSH parameter tuner

  test("optimalLshParams: respects budget, beats neighbors, tracks threshold") {
    import graft.dedup.Dedup
    val (b, r) = Dedup.optimalLshParams(0.8, 64)
    assert(b * r <= 64 && b >= 1 && r >= 1)
    // the S-curve is steep around the threshold: well above t it must
    // catch nearly everything, well below t nearly nothing
    val pHi = Dedup.lshCandidateProbability(0.93, b, r)
    val pLo = Dedup.lshCandidateProbability(0.5, b, r)
    assert(pHi > 0.8, s"P(0.93)=$pHi at ($b,$r)")
    assert(pLo < 0.1, s"P(0.5)=$pLo at ($b,$r)")
    // a higher threshold demands a steeper curve: more rows per band
    val (_, rHi) = Dedup.optimalLshParams(0.95, 64)
    val (_, rLo) = Dedup.optimalLshParams(0.4, 64)
    assert(rHi > rLo)
    // the chosen point is at least as good as its (b±1) neighbors under
    // the same objective
    def err(bb: Int, rr: Int): Double = {
      val steps = 1000
      (0 until steps).map { i =>
        val s = (i + 0.5) / steps
        val p = Dedup.lshCandidateProbability(s, bb, rr)
        if (s < 0.8) 0.5 * p else 0.5 * (1 - p)
      }.sum / steps
    }
    for ((bb, rr) <- Seq((b - 1, r), (b + 1, r), (b, r - 1), (b, r + 1))
         if bb >= 1 && rr >= 1 && bb * rr <= 64)
      assert(err(b, r) <= err(bb, rr) + 1e-12, s"($bb,$rr) beats ($b,$r)")
  }

  // ------------------------------------------------- hard negatives

  test("hardNegatives: band gates, self excluded, rank by rounded cosine") {
    import graft.similarity.Similarity
    // query q along e1; corpus: self-copy (cos 1, above band), a ~0.6
    // candidate, a ~0.4 candidate, an orthogonal (below band)
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.6f, 0.8f)),       // cos 0.6
      (3L, Seq(0.4f, 0.916515f)),  // cos ~0.4
      (4L, Seq(0.0f, 1.0f))        // cos 0
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Similarity.hardNegatives(corpus, queries, k = 10,
      lo = 0.2, hi = 0.95).collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((2L, 1), (3L, 2)))
    // self row sits at cosine 1.0 — outside [0.2, 0.95) anyway; with an
    // open-ceiling band it is excludeSelf that must drop it
    val withSelf = Similarity.hardNegatives(corpus, queries, k = 10,
      lo = 0.2, hi = 1.1, excludeSelf = false).collect()
    assert(withSelf.exists(r => r.getLong(1) === 1L))
    val noSelf = Similarity.hardNegatives(corpus, queries, k = 10,
      lo = 0.2, hi = 1.1).collect()
    assert(!noSelf.exists(r => r.getLong(1) === 1L))
  }

  // --------------------------------------------------- FIM transform

  test("fimTransform: PSM pieces reconstruct the original; cuts bounded") {
    import graft.text.Chunking
    val docs = (1L to 50L).map(i => (i, s"document number $i body text"))
      .toDF("doc_id", "text")
    val out = Chunking.fimTransform(docs, rate = 1.0, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val texts = (1L to 50L).map(i => i -> s"document number $i body text")
      .toMap
    out.foreach { case (id, applied, a, b, t) =>
      assert(applied)
      val orig = texts(id)
      assert(a >= 0 && a <= b && b <= orig.length, s"cuts $a,$b")
      // parse <PRE>p<SUF>s<MID>m and check p+m+s == original
      val body = t.stripPrefix("<PRE>")
      val Array(p, rest) = body.split("<SUF>", 2)
      val Array(sfx, mid) = rest.split("<MID>", 2)
      assert(p + mid + sfx === orig, s"doc $id splice mismatch")
      assert(p.length === a && mid.length === (b - a))
    }
    // rate 0: pure pass-through, null cuts
    val none = Chunking.fimTransform(docs, rate = 0.0, seed = 7L)
      .collect()
    assert(none.forall(r => !r.getBoolean(1) && r.isNullAt(2) &&
      r.getString(4) === texts(r.getLong(0))))
    // deterministic across runs
    val again = Chunking.fimTransform(docs, rate = 1.0, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(4)))
    assert(again.toMap === out.map(o => (o._1, o._5)).toMap)
  }

  // --------------------------------------------- rare-token suppression

  test("suppressRareTokens: corpus-global rare tokens scrub to <UNK>") {
    import graft.dedup.Dedup
    val docs = Seq(
      (1L, "alpha beta SECRET123 alpha"),
      (2L, "alpha beta gamma"),
      (3L, "beta gamma KEY456"),
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.suppressRareTokens(docs, "text", "doc_id",
      minCount = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    // alpha(3) beta(3) gamma(2) survive; SECRET123/KEY456 (1 each) scrub
    assert(got(1L) === (("alpha beta <UNK> alpha", 4L, 1L)))
    assert(got(2L) === (("alpha beta gamma", 3L, 0L)))
    assert(got(3L) === (("beta gamma <UNK>", 3L, 1L)))
    // empty doc survives with zero counts
    assert(got(4L) === (("", 0L, 0L)))
    // counting is case-sensitive: "Alpha" is NOT "alpha"
    val cased = Seq((1L, "alpha Alpha"), (2L, "alpha"))
      .toDF("doc_id", "text")
    val c = Dedup.suppressRareTokens(cased, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c(1L) === "alpha <UNK>")
  }

  // --------------------------------------------------- span corruption

  test("spanCorrupt: sentinels ordinal, target closes, splice recovers") {
    import graft.text.Chunking
    val docs = (1L to 30L).map(i =>
      (i, (1 to 17).map(t => s"w${i}_$t").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Chunking.spanCorrupt(docs, rate = 0.4, spanLen = 3,
      seed = 9L).collect()
    rows.foreach { r =>
      val (id, n, masked, inp, tgt) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getString(4))
      assert(n === 17L)
      val sentRe = "<extra_id_(\\d+)>".r
      val inpSents = sentRe.findAllMatchIn(inp).map(_.group(1).toInt).toSeq
      // input sentinels are 0,1,2,... in order
      assert(inpSents === inpSents.indices.toSeq, s"doc $id: $inpSents")
      if (masked > 0) {
        // target ends with the closing sentinel = count of masked blocks
        assert(tgt.endsWith(s"<extra_id_${inpSents.length}>"),
          s"doc $id target: $tgt")
        // splice: replacing each input sentinel with its target span
        // recovers the original token sequence
        val spans = tgt.split("<extra_id_\\d+>").map(_.trim)
          .filter(_.nonEmpty)
        var rebuilt = inp
        inpSents.foreach { k =>
          rebuilt = rebuilt.replace(s"<extra_id_$k>", spans(k))
        }
        assert(rebuilt.split("\\s+").toSeq ===
          (1 to 17).map(t => s"w${id}_$t"), s"doc $id splice")
      } else assert(tgt === "" && inp.split("\\s+").length === 17)
    }
    // some docs masked, some not, at rate 0.4
    assert(rows.count(_.getLong(2) > 0) > 5)
    assert(rows.exists(_.getLong(2) === 0) ||
      rows.forall(_.getLong(2) > 0))
    // empty doc: zero everything
    val e = Chunking.spanCorrupt(Seq((1L, "")).toDF("doc_id", "text"))
      .head()
    assert(e.getLong(1) === 0L && e.getLong(2) === 0L &&
      e.getString(3) === "" && e.getString(4) === "")
  }

  test("null-key conventions: batching keeps null-count rows, zorder " +
      "nulls land at the origin, KMV and charEntropy ignore null text, " +
      "classifier labels treat null lang as class 0") {
    import spark.implicits._
    // lengthGroupedBatches: a NULL token count must NOT vanish at the
    // two-phase offset join — it batches as 0 tokens
    val lb = graft.operators.Packing.lengthGroupedBatches(
      Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
        .toDF("doc_id", "tok"), 2, col("tok"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(lb === 3L)
    // zorder: null dim = origin coordinate, z stays non-null
    val z = Seq((Some(3L), None.asInstanceOf[Option[Long]]))
      .toDF("x", "y")
      .select(graft.operators.ZOrder.zValue(Seq(col("x"), col("y")), 3))
      .head()
    assert(!z.isNullAt(0) && z.getLong(0) === 5L) // interleave(3, 0)
    // KMV: null texts occupy no bottom-k slot on either side
    val a = Seq((1L, "x"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val b = Seq((3L, "x")).toDF("doc_id", "text")
    val kmv = graft.dedup.Dedup.corpusJaccardKmv(a, b, "text", k = 16)
      .head()
    assert(kmv.getAs[Long]("n_a") === 1L &&
      kmv.getAs[Double]("jaccard_est") === 1.0)
    // charEntropy(NULL) = 0.0, not NULL
    val ce = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.text.TextAnalysis.charEntropy(col("t"))).head()
    assert(!ce.isNullAt(0) && ce.getDouble(0) === 0.0)
  }

  test("mlmMask: seeded determinism, 80/10/10 bookkeeping, labels " +
      "carry the originals, empty doc is a zero row") {
    import graft.text.Chunking
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, (1 to 40).map(j => s"w$j").mkString(" "))) :+ ((99L, " "))
    val df = docs.toDF("doc_id", "text")
    val rows = Chunking.mlmMask(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // empty doc: zero counts, empty outputs
    val e = rows(99L)
    assert(e.getLong(1) === 0L && e.getString(5) === "" &&
      e.getString(6) === "")
    // selection bookkeeping: n_mask + n_random <= n_selected; the
    // keep-10% case explains the remainder
    rows.values.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(2))
      // one label per selected position
      val labs = r.getString(6)
      val nLabs = if (labs.isEmpty) 0 else labs.split(" ").length
      assert(nLabs.toLong === r.getLong(2), s"doc ${r.getLong(0)}")
      // token count preserved in the masked text
      val nOut = if (r.getString(5).isEmpty) 0
        else r.getString(5).split(" ").length
      assert(nOut.toLong === r.getLong(1))
    }
    // aggregate rate ≈ 15% over 2000 positions (4σ bounds)
    val totSel = rows.values.filter(_.getLong(0) != 99L)
      .map(_.getLong(2)).sum
    assert(totSel > 230 && totSel < 370, s"selected $totSel of 2000")
    // unselected positions pass through: rebuild from labels
    val r1 = rows(1L)
    val masked = r1.getString(5).split(" ")
    val selPos = if (r1.getString(6).isEmpty) Set.empty[Int]
      else r1.getString(6).split(" ").map(_.split(":")(0).toInt).toSet
    (1 to 40).filterNot(selPos).foreach { i =>
      assert(masked(i - 1) === s"w$i", s"pos $i changed unselected")
    }
    // determinism across layouts
    val again = Chunking.mlmMask(df.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(again === rows.view.mapValues(_.getString(5)).toMap)
  }

  // ------------------------------------------- Zipf slope & entropy

  test("zipfSlope: OLS on exact counts; short sources yield null") {
    import graft.text.Indexing
    // source A: term freqs 8,4,2,1 → hand-computed OLS slope
    val a = (Seq.fill(8)("t1") ++ Seq.fill(4)("t2") ++ Seq.fill(2)("t3") ++
      Seq("t4")).mkString(" ")
    val docs = Seq(("A", a), ("B", "only")).toDF("source", "text")
    val got = Indexing.zipfSlope(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val slope = (n * xs.zip(ys).map(p => p._1 * p._2).sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(got("A")._1 === 4L)
    assert(math.abs(got("A")._2.get - slope) < 1e-6)
    assert(got("B") === ((1L, None)))
  }

  test("vocabCoverage: hand-computed curve; checkpoints past the " +
      "vocab saturate at 1.0") {
    import graft.text.Indexing
    import spark.implicits._
    // tf: a=5, b=3, c=1, d=1 → total 10
    val docs = Seq((1L, "a a a a a b b b c d")).toDF("doc_id", "text")
    val rows = Indexing.vocabCoverage(docs, Seq(1, 2, 10))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(rows(1L) === ((1L, 5L, 0.5)))
    assert(rows(2L) === ((2L, 8L, 0.8)))
    assert(rows(10L) === ((4L, 10L, 1.0)))
  }

  test("topKTermsByStratum: per-stratum ranks, tie on term, NULL " +
      "stratum under the sentinel") {
    import graft.text.Indexing
    import spark.implicits._
    val docs = Seq(
      ("A", "x x x y y z"), ("A", "x"),
      ("B", "q q p p"), (null.asInstanceOf[String], "n n m"))
      .toDF("src", "text")
    val rows = Indexing.topKTermsByStratum(docs, "src", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(rows(("A", 1)) === (("x", 4L)))
    assert(rows(("A", 2)) === (("y", 2L)))
    // B: p and q tie at 2 → ascending term
    assert(rows(("B", 1)) === (("p", 2L)))
    assert(rows(("B", 2)) === (("q", 2L)))
    assert(rows((graft.operators.Sampling.NullStratum, 1)) ===
      (("n", 2L)))
  }

  test("cmsTopK: estimates never underestimate; ample width recovers " +
      "the exact heavy hitters; tiny width overestimates but ranks " +
      "the giant first") {
    import graft.text.Indexing
    import spark.implicits._
    val docs = Seq((1L,
      (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
        Seq.fill(5)("gamma") ++ Seq("delta", "eps")).mkString(" ")))
      .toDF("doc_id", "text")
    val exact = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 5L,
      "delta" -> 1L, "eps" -> 1L)
    val wide = Indexing.cmsTopK(docs, k = 5, depth = 4, width = 1024)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // CMS property: est >= exact always; at width 1024 over 5 terms,
    // collisions are absent and the estimates are exact
    exact.foreach { case (t, c) => assert(wide(t) === c) }
    // tiny width forces collisions: still no underestimates, and the
    // dominant term still ranks first
    val tiny = Indexing.cmsTopK(docs, k = 5, depth = 2, width = 2)
      .collect()
    val tinyMap = tiny.map(r => r.getString(1) -> r.getLong(2)).toMap
    exact.foreach { case (t, c) => assert(tinyMap(t) >= c, t) }
    assert(tiny.minBy(_.getInt(0)).getString(1) === "alpha")
  }

  test("charEntropy: collapse is 0, uniform hits ln(k), mixed is exact") {
    import graft.text.TextAnalysis
    val cases = Seq(
      ("", 0.0), ("aaaa", 0.0), ("ab", math.log(2)),
      ("abab", math.log(2)), ("abcd", math.log(4)),
      // 3×a + 1×b: ln(4) − (3·ln3 + 1·ln1)/4
      ("aaab", math.log(4) - 3 * math.log(3) / 4))
    import spark.implicits._
    val got = cases.map(_._1).toDF("t")
      .select(col("t"), TextAnalysis.charEntropy(col("t")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cases.foreach { case (t, want) =>
      assert(math.abs(got(t) - want) < 1e-12, s"entropy('$t')")
    }
    // whitespace and newlines are characters like any other
    val ws = Seq("a a\na").toDF("t")
      .select(TextAnalysis.charEntropy(col("t"))).head().getDouble(0)
    // chars: a,a,a,' ','\n' → ln5 − (3ln3)/5
    assert(math.abs(ws - (math.log(5) - 3 * math.log(3) / 5)) < 1e-12)
  }

  test("heapsGrowth: cutoffs, first-seen vocab, exact power-law fit") {
    import graft.text.Indexing
    // doc 0: 2 tokens/2 new terms; doc 1: +2 tokens, +1 new term;
    // doc 2: empty; doc 3: +1 token, +1 new term
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "  "), (3L, "d"))
      .toDF("doc_id", "text")
    val rows = Indexing.heapsGrowth(docs, checkpoints = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // cutoffs: 1·3/3=1, 2·3/3=2, 3·3/3=3
    assert(rows(1L) === ((1L, 2L, 4L, 3L)))
    assert(rows(2L) === ((2L, 3L, 4L, 3L)))
    assert(rows(3L) === ((3L, 4L, 5L, 4L)))
    // exact power law V = n^β through all distinct points → beta recovers
    // exactly: (4,3) and (5,4) with (4,3) duplicated — still 3 points, so
    // check beta against the hand OLS
    val pts = Seq((4.0, 3.0), (4.0, 3.0), (5.0, 4.0))
      .map { case (x, y) => (math.log(x), math.log(y)) }
    val n = 3.0
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val k = math.exp(sy / n - beta * (sx / n))
    val fit = Indexing.heapsGrowth(docs, checkpoints = 3)
      .select("heaps_beta", "heaps_k").head()
    assert(math.abs(fit.getDouble(0) - beta) < 1e-6)
    assert(math.abs(fit.getDouble(1) - k) < 1e-6)
  }

  test("heapsGrowth: degenerate single point yields NULL fit") {
    import graft.text.Indexing
    val docs = Seq((0L, "a b c")).toDF("doc_id", "text")
    val rows = Indexing.heapsGrowth(docs, checkpoints = 2).collect()
    assert(rows.length === 2)
    // both cutoffs are 0 (max id 0): a vertical point stack — the
    // zero-denominator guard yields NULL beta/k, never NaN
    rows.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === 3L &&
        r.getLong(4) === 3L)
      assert(r.isNullAt(r.fieldIndex("heaps_beta")))
      assert(r.isNullAt(r.fieldIndex("heaps_k")))
    }
  }

  test("mixtureEntropy: uniform mix hits ln(k); collapse hits 0") {
    import graft.text.Drift
    val even = Seq(("s1", "a b c d"), ("s2", "e f g h"))
      .toDF("source", "text")
    val r = Drift.mixtureEntropy(even).head()
    assert(r.getLong(0) === 2L)
    assert(math.abs(r.getDouble(2) - math.log(2)) < 1e-6)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-5)
    val one = Seq(("s1", "a b c d")).toDF("source", "text")
    val r1 = Drift.mixtureEntropy(one).head()
    assert(r1.getDouble(2) === 0.0 && r1.getDouble(3) === 1.0)
    // NULL stratum participates under the sentinel
    val withNull = Seq((Option("s1"), "a b"), (None, "c d"))
      .toDF("source", "text")
    assert(Drift.mixtureEntropy(withNull).head().getLong(0) === 2L)
  }

  // ------------------------------------------- heuristic curation

  test("curateHeuristic: gates compose; copies dedup; splits assigned") {
    import graft.operators.Curation
    val good = "The quick brown fox jumps over the lazy dog and runs " +
      "on through the field to the river and that is the whole story " +
      "of it all told here. And then another sentence follows it now!"
    val docs = Seq(
      (1L, good),
      (2L, good),                           // exact copy → deduped
      (3L, "no terminal punctuation page"), // c4 drops every line
      (4L, "Too few words here now.")       // c4-clean but gopher-short
    ).toDF("doc_id", "text")
    val out = Curation.curateHeuristic(docs, minSentences = 1,
      minWords = 10).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out.keySet === Set(1L)) // min-id copy survives, rest gated
    assert(out(1L)._1 === good)    // both lines end in terminal punct
    assert(Set("train", "val").contains(out(1L)._3))
    assert(out(1L)._2 > 30L)
  }

  // ----------------------------------------------------- corpus diff

  test("corpusDiff: added/removed/changed/unchanged classified exactly") {
    import graft.dedup.Dedup
    val oldV = Seq((1L, "same text"), (2L, "goes away"), (3L, "edited v1"),
      (4L, "Same  TEXT")).toDF("doc_id", "text")
    val newV = Seq((1L, "same text"), (3L, "edited v2"), (5L, "brand new"),
      (4L, "same text")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(oldV, newV, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    // 4 is "unchanged" because fingerprints NORMALIZE case/whitespace
  }

  // ------------------------------------------------------- page rank

  test("pageRank: hub ranks highest, dangling mass returns, mass ~1") {
    import graft.graph.GraphRank
    // 1→3, 2→3, 3→4; 4 dangling — the hub 3 outranks everyone, 4 gets
    // 3's forwarded mass, total stays ≈ 1
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = GraphRank.pageRank(edges, iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size === 4)
    assert(r(3L) > r(1L) && r(3L) > r(2L))
    assert(r(4L) > r(1L)) // fed by the hub
    assert(math.abs(r.values.sum - 1.0) < 1e-3)
    // layout invariance: repartitioned edges give bit-identical ranks
    val r2 = GraphRank.pageRank(edges.repartition(5), iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r === r2)
    // duplicate + self edges are ignored
    val r3 = GraphRank.pageRank(
      edges.unionByName(Seq((1L, 3L), (2L, 2L)).toDF("src", "dst")),
      iters = 20).collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r === r3)
  }

  // ------------------------------------------------- leak-safe splits

  test("leakSafeSplits: duplicate components co-assign; chains collapse") {
    import graft.operators.Sampling
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    // chain 1-2-3 (transitive) + pair (10, 11); everything else isolated
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Sampling.leakSafeSplits(docs, edges, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getString(2)))).toMap
    assert(got(1L)._1 === 1L && got(2L)._1 === 1L && got(3L)._1 === 1L)
    assert(got(1L)._2 === got(2L)._2 && got(2L)._2 === got(3L)._2)
    assert(got(10L)._2 === got(11L)._2)
    // isolated docs are their own component
    assert(got(50L)._1 === 50L)
    // proportions roughly honored over isolated docs
    val splits = got.values.map(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    assert(splits("train") > 120 && splits.getOrElse("test", 0) < 60)
  }

  // ------------------------------------------------------- readability

  test("readabilityScores: hand-computed Flesch/FK/LIX; empty is null") {
    import graft.text.TextAnalysis
    // "the cat sat. it ran away!" → 6 words, 2 sentences,
    // syllables: the(1) cat(1) sat.(1) it(1) ran(1) away!(2) = 7,
    // long words (>6 incl punct): none
    val docs = Seq((1L, "the cat sat. it ran away!"), (2L, ""))
      .toDF("doc_id", "text")
    val cols = TextAnalysis.readabilityScores(col("text"))
      .map { case (n, c) => c.as(n) }
    val r = docs.select(col("doc_id") +: cols: _*).collect()
      .map(x => x.getLong(0) -> x).toMap
    val a = r(1L)
    assert(a.getAs[Long]("n_words") === 6L)
    assert(a.getAs[Long]("n_sentences") === 2L)
    assert(a.getAs[Long]("n_syllables") === 7L)
    val flesch = 206.835 - 1.015 * 3.0 - 84.6 * (7.0 / 6)
    assert(math.abs(a.getAs[Double]("flesch") - flesch) < 1e-6)
    val lix = 3.0 + 100.0 * 0.0
    assert(math.abs(a.getAs[Double]("lix") - lix) < 1e-6)
    assert(r(2L).isNullAt(4) && r(2L).isNullAt(5) && r(2L).isNullAt(6))
    assert(r(2L).getAs[Long]("n_sentences") === 1L)
  }

  // ----------------------------------------------- binary token shards

  test("tokenShards: bin/idx round-trip exact; offsets contiguous") {
    import graft.sources.TokenShards
    val docs = (1L to 60L).map { i =>
      (i, (0 until (i % 7 + 1).toInt).map(t => (i * 31 + t).toInt % 32768))
    }.toDF("doc_id", "ids")
    val dir = new java.io.File(
      new java.io.File(System.getProperty("user.dir"), "target"),
      "token_shards_spec").getAbsolutePath
    val manifest = TokenShards.writeTokenShards(docs, dir, "doc_id",
      "ids", tokensPerShard = 40L, seed = 5L).collect()
    assert(manifest.map(_.getLong(1)).sum === 60L)
    val back = TokenShards.readTokenShards(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2),
        r.getSeq[Int](5)))).toMap
    // every document's ids survive the binary round trip exactly
    val expect = (1L to 60L).map { i =>
      i -> (0 until (i % 7 + 1).toInt).map(t => (i * 31 + t).toInt % 32768)
    }.toMap
    assert(back.keySet === expect.keySet)
    expect.foreach { case (id, ids) =>
      assert(back(id)._3 === ids, s"doc $id ids")
    }
    // offsets tile each shard contiguously and match the manifest
    val byShard = TokenShards.readTokenShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val mTokens = manifest.map(r => r.getLong(0) -> r.getLong(2)).toMap
    byShard.foreach { case (s, rows) =>
      val sorted = rows.sortBy(_._2)
      var off = 0L
      sorted.foreach { case (_, o, l) =>
        assert(o === off, s"shard $s gap at $o"); off += l
      }
      assert(off === mTokens(s), s"shard $s token total")
    }
    // deterministic: a rewrite produces the identical layout
    val again = TokenShards.writeTokenShards(docs, dir, "doc_id", "ids",
      tokensPerShard = 40L, seed = 5L).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === manifest.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  // -------------------------------------------------------------- PCA

  test("pca: recovers the dominant axis of an anisotropic cloud") {
    // points spread along (1, 1, 0)/sqrt(2) with small noise off-axis
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val n = ((i * 37) % 13 - 6) / 50.0
      (i.toLong, Seq(t + n, t - n, n / 2).map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, nComponents = 2, iters = 12)
    val c1 = m.components(0)
    val s = 1 / math.sqrt(2)
    // direction match up to sign
    val dot = math.abs(c1(0) * s + c1(1) * s)
    assert(dot > 0.999, s"pc1 ${c1.toSeq} not along (1,1,0): $dot")
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1))
    // unit length after quantization
    assert(math.abs(c1.map(x => x * x).sum - 1.0) < 1e-4)
  }

  test("pca: projection replays the driver-side centered dot product") {
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq(i / 10.0f, (50 - i) / 25.0f, 1.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, nComponents = 1, iters = 8)
    val got = Pca.project(df, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      var s = 0.0
      for (j <- v.indices) s += (v(j).toDouble - m.means(j)) *
        m.components(0)(j)
      assert(math.abs(got(id) - math.floor(s * 1e6 + 0.5) / 1e6) <= 1e-6,
        s"vec $id")
    }
  }

  test("plans: filters are map-only; pca projection has no exchange") {
    // the published-rule filters must stay first-stage 100 TB operators:
    // pure expression trees, nothing that exchanges or windows
    for (q <- Seq("q_c4_filter", "q_gopher_filter")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      // the OPERATOR must add no shuffle; the r13 input-parallelism
      // floor (SparkEntry.table: explicit round-robin spread of a
      // fewer-splits-than-cores scan) is ingest, not operator work.
      // Tightened per ADVICE r13: a tolerated round-robin exchange must
      // sit DIRECTLY above the file scan (an operator adding its own
      // repartition() no longer passes), and ReusedExchange pointers
      // don't count as new shuffles.
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Exchange RoundRobinPartitioning"))
          assert(lines.slice(i + 1, i + 5).exists(n =>
            n.contains("FileScan") || n.contains("Scan parquet")),
            s"$q: round-robin exchange not directly above a scan:\n$plan")
      }
      val opExchanges = lines.count(l => l.contains("Exchange ") &&
        !l.contains("Exchange RoundRobinPartitioning") &&
        !l.contains("ReusedExchange"))
      assert(opExchanges === 0, s"$q plans an operator Exchange:\n$plan")
      assert(!plan.contains("Window"), s"$q plans a Window:\n$plan")
    }
    val df = (0 until 40).map(i =>
      (i.toLong, Seq((i % 5).toFloat, (i % 3).toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, nComponents = 1, iters = 4)
    val plan = Pca.project(df, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pca projection plans an Exchange:\n$plan")
  }

  test("knnPcaReduced: shortlist=corpus equals brute force; recall holds") {
    import graft.similarity.{Pca, Similarity}
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq.tabulate(8)(j =>
        (math.sin(i * 0.37 + j) + (i % 11) * 0.1 * j).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val model = Pca.fit(corpus, nComponents = 3, iters = 8)
    // full shortlist degenerates to exact brute force
    val full = Similarity.knnPcaReduced(corpus, queries, k = 5, model,
      shortlist = 120).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val brute = Similarity.knnBruteForce(corpus, queries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(full === brute)
    // a 25% shortlist on a 3-component sketch keeps good top-5 recall
    val sk = Similarity.knnPcaReduced(corpus, queries, k = 5, model,
      shortlist = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = brute.toSeq.map { case ((q, _), n) => (q, n) }
      .count(p => sk.contains(p))
    assert(hits >= 15, s"recall ${hits}/25 too low")
  }

  test("pca: fit is layout-invariant (repartition changes nothing)") {
    val rows = (0 until 120).map(i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 11).toFloat, (i % 5).toFloat,
        (i % 3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val a = Pca.fit(df, nComponents = 2, iters = 8)
    val b = Pca.fit(df.repartition(7), nComponents = 2, iters = 8)
    assert(a.means.toSeq === b.means.toSeq)
    assert(a.components.map(_.toSeq).toSeq ===
      b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
  }

  // ----------------------------------------------------------- taxonomy

  test("assignTopics: weighted keyword scores, argmax with alpha ties") {
    import graft.text.Taxonomy
    val tax = Seq(
      "storage" -> Seq("table" -> 1, "row" -> 2),
      "compute" -> Seq("join" -> 2, "agg" -> 2))
    val docs = Seq(
      (1L, "table row row table"),      // storage 2+4=6, compute 0
      (2L, "join agg join"),            // compute 6
      (3L, "table table join"),         // storage 2, compute 2 -> tie: compute (alpha)
      (4L, "nothing relevant here")     // all zero -> unknown
    ).toDF("doc_id", "text")
    val got = Taxonomy.assignTopics(docs, "text", tax)
      .select("doc_id", "score_storage", "score_compute", "topic")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 6L, 0L, "storage")))
    assert(got(1) === ((2L, 0L, 6L, "compute")))
    assert(got(2) === ((3L, 2L, 2L, "compute")))
    assert(got(3) === ((4L, 0L, 0L, "unknown")))
  }

  test("assignTopics: word boundaries, case folding, regex-safe keywords") {
    import graft.text.Taxonomy
    val tax = Seq("t" -> Seq("c++" -> 1, "data" -> 1))
    val got = Taxonomy.assignTopics(
      Seq((1L, "Data database c++ xdata")).toDF("doc_id", "text"),
      "text", tax).select("score_t").as[Long].head()
    // "Data" counts (case), "database"/"xdata" do not (boundary),
    // "c++" counts literally (quoted, not a regex)
    assert(got === 2L)
  }

  test("homoglyph folding: spoofed keys collapse to their latin form, " +
      "counts are exact, clean text passes untouched, idempotent") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val spoof = "pаypаl νisit Пress" // Cyr а ×2, Greek ν, Cyr П (unmapped)
    val df = Seq((1L, spoof), (2L, "paypal visit"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.homoglyphCount(col("t")).as("n"),
        TextAnalysis.foldHomoglyphs(col("t")).as("f"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          Option(r.getString(2)))).toMap
    assert(got(1L)._1 === 3L) // а, а, ν — П is deliberately unmapped
    assert(got(1L)._2.get === "paypal νisit Пress"
      .replace("νisit", "visit")) // folded spoof
    assert(got(2L) === ((0L, Some("paypal visit")))) // untouched
    assert(got(3L) === ((0L, Some(""))))
    assert(got(4L)._2 === None) // null-safe
    // folding makes the spoof fingerprint-equal to the clean string
    val fp = df.filter(col("id") <= 2).select(
      TextAnalysis.fingerprintMd5(TextAnalysis.foldHomoglyphs(
        regexp_replace(col("t"), " νisit Пress| visit", ""))))
      .collect().map(_.getString(0)).distinct
    assert(fp.length === 1)
  }

  test("compressionRatio: repetitive boilerplate compresses far below " +
      "prose, high-entropy junk barely compresses, empty/null → 0") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val rep = "click here to subscribe now " * 200
    val prose = "The committee reviewed seventeen proposals during the " +
      "autumn session, rejecting most on procedural grounds while " +
      "advancing three pilot programs whose budgets differed widely " +
      "across regions and whose outcomes nobody could confidently " +
      "predict at the time of writing."
    val rng = new scala.util.Random(7)
    val junk = Array.fill(2000)((33 + rng.nextInt(94)).toChar).mkString
    val df = Seq((1L, rep), (2L, prose), (3L, junk), (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < 0.1, s"boilerplate ratio ${got(1L)}")
    assert(got(2L) > got(1L) && got(2L) < got(3L),
      s"prose ${got(2L)} should sit between boilerplate and junk")
    assert(got(3L) > 0.6, s"high-entropy ratio ${got(3L)}")
    assert(got(4L) === 0.0 && got(5L) === 0.0)
    // deterministic across layouts (same JVM/zlib)
    val again = df.repartition(4).select(col("id"),
        TextAnalysis.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === got)
  }
}
