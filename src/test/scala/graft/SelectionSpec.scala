package graft

import graft.operators.Sampling
import graft.text.Bm25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data selection: BM25 retrieval and deterministic mixture
  * sampling. */
class SelectionSpec extends SparkSuite {

  lazy val docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("min-k% prob: hand-computed bottom-k selection, suspect flag, " +
      "layout invariance") {
    import spark.implicits._
    import graft.text.UnigramLm
    // corpus: a appears 9x, z once -> N=10, V=2
    // logp(a) = ln(10/12), logp(z) = ln(2/12)
    val d = Seq((1L, "a a a a z"), (2L, "a a a a a"))
      .toDF("doc_id", "text")
    val out = UnigramLm.minKProb(d, minKFrac = 0.2, threshold = -1.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    val lpA = math.log(10.0 / 12.0)
    val lpZ = math.log(2.0 / 12.0)
    // k = ceil(0.2*5) = 1 -> doc 1's single worst token is z
    assert(out(1L).getLong(1) === 5L && out(1L).getLong(2) === 1L)
    assert(math.abs(out(1L).getDouble(3) - lpZ) < 1e-6)
    assert(!out(1L).getBoolean(4)) // rare token present: not a suspect
    // doc 2 is all high-prob tokens -> high min-k score -> suspect
    assert(math.abs(out(2L).getDouble(3) - lpA) < 1e-6)
    assert(out(2L).getBoolean(4))
    // k covers multiple tokens: k = ceil(0.2*10) = 2, fold order fixed
    val d2 = Seq((3L, "z z a a a a a a a a")).toDF("doc_id", "text")
    val out2 = UnigramLm.minKProb(d2, minKFrac = 0.2, model = d)
      .collect()(0)
    // model excludes doc 3, so counts stay a=9, z=1... model=d: N=10,V=2
    assert(out2.getLong(2) === 2L)
    assert(math.abs(out2.getDouble(3) -
      math.log(2.0 / 12.0)) < 1e-6) // both bottom tokens are z
    // layout invariance: same scores at any partitioning
    val big = docs.limit(60)
    val a = UnigramLm.minKProb(big).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    val b = UnigramLm.minKProb(big.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(a === b)
  }

  test("bm25: hand-computed score on a 3-doc corpus") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry cherry")).toDF("doc_id", "text")
    // N=3, df(apple)=1, dl(doc1)=3, avgdl=3.0 — the Robertson formula by
    // hand, in the same float-op order the operator states
    val idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    val expected = idf * 2 * (1.2 + 1.0) /
      (2 + 1.2 * ((1.0 - 0.75) + (0.75 * 3.0) / 3.0))
    val res = Bm25.bm25TopK(tiny, Seq("apple"), k = 5, scoreScale = -1)
      .collect()
    assert(res.length === 1) // only doc 1 matches
    assert(res.head.getLong(0) === 1L)
    assert(math.abs(res.head.getDouble(1) - expected) < 1e-12)
    assert(res.head.getInt(2) === 1)
  }

  test("bm25: longer documents score lower at equal tf (b > 0)") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple pad"),
      (2L, "apple pad pad pad pad pad pad")).toDF("doc_id", "text")
    val res = Bm25.bm25TopK(tiny, Seq("apple"), k = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(res(1L) === 1 && res(2L) === 2)
  }

  test("bm25 on the corpus: k bound, contiguous ranks, determinism") {
    val res = Bm25.bm25TopK(docs, Seq("dup", "spark", "vector"), k = 10)
    val rows = res.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
    assert(rows.forall(_.getDouble(1) > 0))
    val again = Bm25.bm25TopK(docs.repartition(7),
      Seq("dup", "spark", "vector"), k = 10).collect()
    assert(again.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSet ===
      rows.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet)
  }

  test("unigramCrossEntropy: hand-computed on a 2-doc corpus; OOD high") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a a a"),
      (2L, "a b")).toDF("doc_id", "text")
    // counts: a=4, b=1; N=5, V=2 → P(a)=(4+1)/7, P(b)=(1+1)/7
    val pa = math.log(5.0 / 7.0); val pb = math.log(2.0 / 7.0)
    val got = graft.text.UnigramLm.crossEntropy(tiny)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 === 3)
    assert(math.abs(got(1L)._2 - -pa) < 1e-12)
    assert(math.abs(got(2L)._2 - -(pa + pb) / 2.0) < 1e-12)
    // a doc full of model-unseen tokens scores the smoothing floor —
    // strictly worse (higher) than anything in-distribution
    val ood = graft.text.UnigramLm.crossEntropy(
        Seq((9L, "zz qq ww")).toDF("doc_id", "text"), model = tiny)
      .collect()(0).getDouble(2)
    assert(ood > got(1L)._2 && ood > got(2L)._2)
    assert(math.abs(ood - -math.log(1.0 / 7.0)) < 1e-12)
  }

  test("bigramCrossEntropy: hand-computed; backoff; short docs emit none") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b"),
      (2L, "a b"),
      (3L, "a c"),
      (4L, "a"),    // one token  -> no bigram, no row
      (5L, " ")).toDF("doc_id", "text") // empty -> no row
    // unigrams: a=4,b=2,c=1; N=7,V=3 → P1(b)=3/10, P1(c)=2/10
    // bigrams: (a,b)=2,(a,c)=1; C(a,·)=3
    val got = graft.text.UnigramLm.bigramCrossEntropy(tiny)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === 1)
    // doc1: P(b|a) = 0.5·(2/3) + 0.5·(3/10)
    val p1 = 0.5 * (2.0 / 3.0) + 0.5 * (3.0 / 10.0)
    assert(math.abs(got(1L)._2 - -math.log(p1)) < 1e-12)
    // doc3: P(c|a) = 0.5·(1/3) + 0.5·(2/10)
    val p3 = 0.5 * (1.0 / 3.0) + 0.5 * (2.0 / 10.0)
    assert(math.abs(got(3L)._2 - -math.log(p3)) < 1e-12)
    assert(got(1L)._2 < got(3L)._2) // frequent pair scores better
    // unseen context "x b": bigram term 0, pure unigram backoff
    val backoff = graft.text.UnigramLm.bigramCrossEntropy(
        Seq((9L, "x b")).toDF("doc_id", "text"), model = tiny)
      .collect()(0).getDouble(2)
    assert(math.abs(backoff - -math.log(0.5 * (3.0 / 10.0))) < 1e-12)
    // garbled OOD text scores strictly worse than anything in-corpus
    assert(backoff > got(3L)._2)
  }

  test("stratifiedSample: scoped, deterministic, roughly at rate") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 0.0)
    val langs = sampled.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en"))) // absent strata dropped entirely
    val nEn = docs.filter(col("lang") === "en").count()
    val n = sampled.count()
    // binomial(nEn, 0.5): loose 4σ-ish bounds, no flakiness at n≈25
    assert(n > nEn * 0.15 && n < nEn * 0.85, s"kept $n of $nEn")

    // same ids regardless of physical layout or recomputation
    val ids = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(docs.repartition(7), "doc_id",
        "lang", Map("en" -> 0.5), defaultRate = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2)

    // different seed → different (deterministic) subset
    val ids3 = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.5), defaultRate = 0.0, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3 !== ids)
  }

  test("assignSplits: stable intervals, remainder to last, layout-proof") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val got = graft.operators.Sampling.assignSplits(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 1000)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900, counts)
    assert(counts("val") > 50 && counts("val") < 150, counts)
    // identical assignment on a different layout
    val again = graft.operators.Sampling.assignSplits(
        df.repartition(13), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === got)
    // fractions summing under 1: the remainder falls into the LAST split
    val skewed = graft.operators.Sampling.assignSplits(df, "id",
        Seq(("a", 0.1), ("b", 0.1)))
      .collect().map(_.getString(1))
    assert(skewed.count(_ == "b") > 800) // 0.1 + the 0.8 remainder
  }

  test("interleaveByWeight: proportional mixing, zero-weight drop, " +
      "deterministic keys") {
    import spark.implicits._
    val df = ((0 until 40).map(i => (i.toLong, "big")) ++
      (100 until 120).map(i => (i.toLong, "small")) ++
      (200 until 210).map(i => (i.toLong, "off")))
      .toDF("id", "src")
    val out = graft.operators.Sampling.interleaveByWeight(df, "id", "src",
      Map("big" -> 2.0, "small" -> 1.0, "off" -> 0.0))
    val rows = out.orderBy("__interleave_key")
      .select("src").collect().map(_.getString(0)).toSeq
    // zero-weight stratum dropped entirely
    assert(!rows.contains("off") && rows.length === 60)
    // proportionality holds throughout: after any prefix long enough to
    // hold both, big ≈ 2× small (weight-2 keys advance half as fast)
    val firstHalf = rows.take(30)
    val bigCount = firstHalf.count(_ == "big")
    assert(bigCount >= 18 && bigCount <= 22, s"prefix mix $bigCount/30")
    // 40 rows at weight 2 and 20 rows at weight 1 span the same key
    // range [0, 20) — proportional mixing means both strata sustain the
    // 2:1 ratio to the END rather than one running dry early
    val lastQuarter = rows.takeRight(15)
    assert(lastQuarter.count(_ == "big") >= 7 &&
      lastQuarter.count(_ == "small") >= 3, s"tail mix $lastQuarter")
    // deterministic: identical keys on a different layout
    val again = graft.operators.Sampling.interleaveByWeight(
      df.repartition(7), "id", "src",
      Map("big" -> 2.0, "small" -> 1.0, "off" -> 0.0))
    val a = out.select("id", "__interleave_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = again.select("id", "__interleave_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("NULL strata: temperatureRates and stratifiedSample agree on the sentinel") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (5L, null), (6L, null)).toDF("doc_id", "lang")
    // no NPE; NULL rows counted under the sentinel key
    val rates = Sampling.temperatureRates(withNulls, "lang", 1.0, 1.0)
    assert(rates.keySet === Set("en", Sampling.NullStratum))
    assert(rates.values.forall(r => math.abs(r - 1.0) < 1e-12))
    // the sample stage matches NULL rows back to that same key: with
    // every rate 1.0 nothing may fall through to defaultRate = 0
    val kept = Sampling.stratifiedSample(withNulls, "doc_id", "lang",
      rates, defaultRate = 0.0)
    assert(kept.count() === 6)
    // and a rate map WITHOUT the sentinel sends NULL rows to defaultRate
    val dropped = Sampling.stratifiedSample(withNulls, "doc_id", "lang",
      Map("en" -> 1.0), defaultRate = 0.0)
    assert(dropped.count() === 4)
  }

  test("bm25 termWeights normalizes mixed-case terms like bm25TopK does") {
    import spark.implicits._
    val tiny = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val w = Bm25.termWeights(tiny, Seq("Apple", "APPLE"), "text",
      "doc_id", 1.2, 0.75).collect()
    assert(w.length === 1, "mixed-case duplicate terms must match once")
    assert(w.head.getAs[String]("term") === "apple")
  }

  test("packConcat: contiguous zero-waste layout, straddles marked") {
    import graft.operators.Packing
    val packed = Packing.packConcat(docs, "doc_id",
      graft.text.TextAnalysis.wsTokenCount(col("text")),
      capacity = 64L, shards = 4)
    val rows = packed.collect()
    assert(rows.length === docs.count())
    // within a shard, documents tile the token stream exactly:
    // tok_start(next) = tok_start(prev) + n_tokens(prev), starting at 0
    rows.groupBy(_.getLong(1)).foreach { case (_, shardRows) =>
      val byId = shardRows.sortBy(_.getLong(0))
      var expect = 0L
      byId.foreach { r =>
        assert(r.getLong(3) === expect, s"gap at doc ${r.getLong(0)}")
        expect += r.getLong(2)
      }
    }
    // straddle iff the document crosses a 64-token cut
    rows.foreach { r =>
      val (n, start, sf, sl, off) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))
      assert(off === start % 64)
      assert(sf === start / 64)
      if (n > 0) assert(sl === (start + n - 1) / 64) else assert(sl === sf)
    }
    // the window must stay partitioned by shard (no global sort task)
    val windows = packed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "packing cumsum must never use a global window")
  }

  test("packNextFit: capacity respected, no splits, next-fit fill bound") {
    import graft.operators.Packing
    val cap = 64L
    val packed = Packing.packNextFit(docs, "doc_id",
      graft.text.TextAnalysis.wsTokenCount(col("text")),
      capacity = cap, shards = 4).collect()
    assert(packed.length === docs.count())
    val byShardSeq = packed.groupBy(r => (r.getInt(1), r.getLong(3)))
    byShardSeq.foreach { case ((shard, seq), members) =>
      val total = members.map(_.getLong(2)).sum
      // a sequence only exceeds capacity when a single doc does
      if (members.length > 1)
        assert(total <= cap, s"shard $shard seq $seq holds $total")
      // members tile the sequence contiguously from offset 0
      val sorted = members.sortBy(_.getLong(4))
      var expect = 0L
      sorted.foreach { m =>
        assert(m.getLong(4) === expect); expect += m.getLong(2)
      }
    }
    // next-fit guarantee: > 50% fill when every doc fits capacity
    val maxDoc = packed.map(_.getLong(2)).max
    if (maxDoc <= cap) {
      val stats = Packing.packingStats(
        Packing.packNextFit(docs, "doc_id",
          graft.text.TextAnalysis.wsTokenCount(col("text")), cap, 4),
        cap, "seq_id").collect()
      stats.foreach { s =>
        assert(s.getDouble(3) > 0.5,
          s"shard ${s.get(0)} fill ${s.getDouble(3)}")
      }
    }
  }

  test("curate: end-to-end manifest honors every stage's contract") {
    import graft.operators.Curation
    import graft.text.TextAnalysis
    val bench = docs.filter(col("doc_id") < 5)
    val manifest = Curation.curate(docs, bench,
      rates = Map("en" -> 0.8, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8),
      defaultRate = 0.0, capacity = 64L, shards = 4)
    val rows = manifest.collect()
    assert(rows.nonEmpty)
    val outIds = rows.map(_.getLong(0)).toSet
    // benchmark docs never survive (they contaminate themselves)
    assert(outIds.intersect((0L until 5L).toSet).isEmpty)
    // near-copies of bench doc 0 (fixture plants 50, 82) fall out too
    assert(!outIds.contains(50L) && !outIds.contains(82L))
    // only allowed predicted languages in the manifest
    val langs = rows.map(_.getString(7)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr")))
    // survivors still tile their shards contiguously (packing contract
    // holds on the FILTERED id stream, not the original one)
    rows.groupBy(_.getLong(1)).foreach { case (_, shardRows) =>
      var expect = 0L
      shardRows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) === expect); expect += r.getLong(2)
      }
    }
    // deterministic end to end
    val again = Curation.curate(docs.repartition(7), bench,
      rates = Map("en" -> 0.8, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8),
      defaultRate = 0.0, capacity = 64L, shards = 4).collect()
    assert(again.map(_.getLong(0)).toSet === outIds)
    // exact duplicates deduplicate even when they differ only in PII:
    // same doc text with two different planted emails → one survivor
    val twin = docs.filter(col("doc_id") === 100)
      .withColumn("doc_id", lit(9000L))
      .withColumn("text", concat(col("text"), lit(" a@x.com")))
    val twin2 = docs.filter(col("doc_id") === 100)
      .withColumn("doc_id", lit(9001L))
      .withColumn("text", concat(col("text"), lit(" b@y.org")))
    val out2 = Curation.curate(
        docs.unionByName(twin).unionByName(twin2), bench,
        defaultRate = 1.0, capacity = 64L, shards = 4)
      .collect().map(_.getLong(0)).toSet
    // doc 100 survives as the min id of the {100, 9000, 9001} group iff
    // it passes the gates; the twins never co-survive
    assert(!(out2.contains(9000L) && out2.contains(9001L)))
    assert(!out2.contains(9001L))

    // optional split stage: one extra column, same manifest otherwise
    val withSplits = Curation.curate(docs, bench,
      rates = Map("en" -> 0.8, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8),
      defaultRate = 0.0, capacity = 64L, shards = 4,
      splits = Seq(("train", 0.9), ("val", 0.1)))
    assert(withSplits.columns.contains("split"))
    val sRows = withSplits.collect()
    assert(sRows.map(_.getLong(0)).toSet === outIds)
    assert(sRows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val")))
  }

  test("deterministicShuffle: total order, layout-stable, seed-sensitive") {
    def order(df: DataFrame, seed: Long): Seq[Long] = {
      val shuffled = Sampling.deterministicShuffle(df, "doc_id",
        seed = seed, numPartitions = 4)
      // global order = partition id, then within-partition position
      shuffled.select(col("doc_id"), col("__shuffle_key"),
          spark_partition_id().as("pid"))
        .collect()
        .sortBy(r => (r.getInt(2), r.getDouble(1)))
        .map(_.getLong(0)).toSeq
    }
    val a = order(docs, 42L)
    assert(a.toSet === docs.collect().map(_.getLong(0)).toSet)
    assert(a !== a.sorted, "shuffle must not preserve id order")
    // identical across physical layouts (rand() would differ)
    assert(order(docs.repartition(7), 42L) === a)
    // a new seed is a different permutation (the epoch reshuffle)
    assert(order(docs, 7L) !== a)
    // the range partitioning gives a true GLOBAL order: every key in
    // partition i precedes every key in partition i+1
    val parts = Sampling.deterministicShuffle(docs, "doc_id", 42L, 4)
      .select(spark_partition_id().as("pid"), col("__shuffle_key"))
      .collect().groupBy(_.getInt(0))
      .view.mapValues(rs => rs.map(_.getDouble(1))).toMap
    val pids = parts.keys.toSeq.sorted
    pids.sliding(2).foreach {
      case Seq(p, q) => assert(parts(p).max <= parts(q).min)
      case _ =>
    }
  }

  test("temperatureRates: τ=1 proportional; τ<1 upsamples small strata") {
    val r1 = Sampling.temperatureRates(docs, "lang", 1.0, 0.5)
    assert(r1.values.forall(v => math.abs(v - 0.5) < 1e-9))
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = counts.minBy(_._2)._1
    val largest = counts.maxBy(_._2)._1
    val rt = Sampling.temperatureRates(docs, "lang", 0.5, 0.5)
    assert(rt(smallest) > rt(largest),
      s"τ=0.5 must favor $smallest over $largest: $rt")
    assert(rt.values.forall(v => v > 0 && v <= 1.0))
  }

  test("tokenBudgetSample ≡ the naive cumsum-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val out = Sampling.tokenBudgetSample(docs, "doc_id", "source",
        tok, budgetTokens = 300L, seed = 42L, buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .toSet
    // naive: full per-stratum window, cum <= budget
    val naive = docs
      .select(col("source").as("stratum"), col("doc_id"),
        Sampling.hashUniform(col("doc_id"), 42L).as("u"),
        tok.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(Window
        .partitionBy("stratum").orderBy(col("u"), col("doc_id"))))
      .filter(col("cum_tokens") <= 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .toSet
    assert(out === naive)
    assert(out.nonEmpty)
    // deterministic across reruns
    val again = Sampling.tokenBudgetSample(docs, "doc_id", "source",
        tok, budgetTokens = 300L, seed = 42L, buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .toSet
    assert(again === out)
  }

  test("tokenBudgetSample: a budget above the stratum total keeps all; " +
      "budget 0 keeps none") {
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val all = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      tok, budgetTokens = 100000000L, seed = 42L)
    assert(all.count() === docs.count())
    // kept cum never exceeds the budget; per-stratum totals respect it
    val none = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      tok, budgetTokens = 0L, seed = 42L)
    assert(none.count() === 0L)
    val some = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      tok, budgetTokens = 500L, seed = 42L)
    val maxCum = some.agg(max("cum_tokens")).head().getLong(0)
    assert(maxCum <= 500L)
  }

  test("ccnet buckets: exact rank tertiles, ordering, keep policy, " +
      "scoreless docs fall to tail") {
    import spark.implicits._
    val withEmpty = docs.unionByName(
      Seq((900001L, "", "en", "srcX", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val res = graft.text.UnigramLm.perplexityBuckets(withEmpty)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Double]("ce")).map(_.doubleValue),
        r.getString(4), r.getBoolean(5))).toSeq
    // the empty doc is scoreless → tail, dropped
    val empty = res.find(_._1 == 900001L).get
    assert(empty._3.isEmpty && empty._4 === "tail" && !empty._5)
    res.groupBy(_._2).foreach { case (lang, g) =>
      val scoredDocs = g.filter(_._3.nonEmpty)
      val n = scoredDocs.size
      val byBucket = scoredDocs.groupBy(_._4)
        .view.mapValues(_.size).toMap
      // ceil splits: |head| = ⌈n/3⌉, |head|+|middle| = ⌈2n/3⌉
      assert(byBucket.getOrElse("head", 0) === (n + 2) / 3, s"$lang")
      assert(byBucket.getOrElse("head", 0) +
        byBucket.getOrElse("middle", 0) === (2 * n + 2) / 3, s"$lang")
      // rank order respects ce: max head ce <= min tail ce
      val headMax = scoredDocs.filter(_._4 == "head").map(_._3.get).max
      val tailMin = scoredDocs.filter(_._4 == "tail").map(_._3.get).min
      assert(headMax <= tailMin, s"$lang")
      // keep policy: head all kept, tail all dropped, middle by uniform
      assert(scoredDocs.filter(_._4 == "head").forall(_._5))
      assert(scoredDocs.filter(_._4 == "tail").forall(!_._5))
    }
    // middle keeps replay the stratified-sampling uniform exactly
    val midKeep = res.filter(t => t._4 == "middle").map(t => t._1 -> t._5)
    val u = withEmpty.select(col("doc_id"),
        (Sampling.hashUniform(col("doc_id"), 42L) < 0.5).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    midKeep.foreach { case (id, k) => assert(k === u(id), s"doc $id") }
  }

  /** Partition-spec widths of every Window in the optimized plan. */
  private def windowPartitionWidths(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.length
    }

  test("interleaveByWeight: bit-identical to the naive per-stratum " +
      "window, and no window ever partitions by the stratum alone") {
    import org.apache.spark.sql.expressions.Window
    val weights = Map("en" -> 2.0, "de" -> 1.0, "zh" -> 0.0)
    val out = Sampling.interleaveByWeight(docs, "doc_id", "lang",
      weights, defaultWeight = 0.5)
    // the naive single-window formulation the two-phase plan replaces
    val wExpr = weights.foldLeft(lit(0.5)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc) }
    val naive = docs
      .withColumn("__u", Sampling.hashUniform(col("doc_id"), 42L))
      .withColumn("__w", wExpr).filter(col("__w") > 0)
      .withColumn("key",
        ((row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("__u").desc, col("doc_id"))).cast("double") - 1) +
          col("__u")) / col("__w"))
      .select(col("doc_id"), col("key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = out.select(col("doc_id"), col("__interleave_key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === naive) // exact doubles — integer rank + exact uniform
    // plan guard: every window partitions by (stratum, bucket) — a
    // 1-wide partition spec would be the single-task-per-stratum shape
    val widths = windowPartitionWidths(
      Sampling.interleaveByWeight(docs, "doc_id", "lang", weights))
    assert(widths.nonEmpty && widths.forall(_ >= 2), s"widths $widths")
    // tiny bucket count stresses bucket-boundary ties; still identical
    val coarse = Sampling.interleaveByWeight(docs, "doc_id", "lang",
        weights, defaultWeight = 0.5, nBuckets = 3)
      .select(col("doc_id"), col("__interleave_key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(coarse === naive)
  }

  test("ccnet buckets: two-phase rank bit-identical to the naive " +
      "per-language window; plan never partitions by language alone") {
    import org.apache.spark.sql.expressions.Window
    val out = graft.text.UnigramLm.perplexityBuckets(docs)
    val ce = graft.text.UnigramLm.crossEntropy(docs)
      .select(col("doc_id"), round(col("cross_entropy"), 6).as("ce"))
    val naive = docs.select(col("doc_id"), col("lang"))
      .join(ce, Seq("doc_id"), "left").filter(col("ce").isNotNull)
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("lang")).orderBy(col("ce"), col("doc_id")))
        .cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val got = out.filter(col("rank").isNotNull)
      .select(col("doc_id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive)
    val widths = windowPartitionWidths(
      graft.text.UnigramLm.perplexityBuckets(docs))
    assert(widths.nonEmpty && widths.forall(_ >= 2), s"widths $widths")
    // degenerate span (all ce equal within a language) collapses to one
    // bucket but stays correct: ranks are still 1..n by id
    import spark.implicits._
    val flat = Seq((1L, "x x", "aa"), (2L, "x x", "aa"), (3L, "x x", "aa"))
      .toDF("doc_id", "text", "lang")
    val fr = graft.text.UnigramLm.perplexityBuckets(flat)
      .select("doc_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fr === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("ccnet buckets: NULL languages rank under the sentinel instead " +
      "of vanishing at the tertile join") {
    import spark.implicits._
    val withNulls = docs.select(col("doc_id"), col("text"),
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("lang")).as("lang"))
    val res = graft.text.UnigramLm.perplexityBuckets(withNulls)
    // every input doc appears exactly once — nothing dropped
    assert(res.count() === docs.count())
    val nullLang = res.filter(col("lang") === Sampling.NullStratum)
    val expected = withNulls.filter(col("lang").isNull).count()
    assert(nullLang.count() === expected && expected > 0)
    // the sentinel stratum is a real stratum: scored docs get ranks and
    // ceil-tertile bucket sizes like any other language
    val scored = nullLang.filter(col("rank").isNotNull)
    val n = scored.count()
    assert(n > 0)
    assert(scored.filter(col("bucket") === "head").count() ===
      (n + 2) / 3)
  }

  test("ccnet buckets: approx-cutoff variant agrees with exact tertiles " +
      "within sketch tolerance, and is map-only past the sketch") {
    val exact = graft.text.UnigramLm.perplexityBuckets(docs)
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val approx = graft.text.UnigramLm.perplexityBuckets(docs,
      exact = false)
    // no rank exists on the approx path
    assert(approx.filter(col("rank").isNotNull).count() === 0)
    // no window at all in the approx plan — bucketing is map-only past
    // the percentile sketch aggregate
    assert(windowPartitionWidths(approx).isEmpty)
    val joined = exact.join(
      approx.select(col("doc_id"), col("bucket").as("b_approx")),
      Seq("doc_id"))
    val n = joined.count()
    val agree = joined.filter(col("b_exact") === col("b_approx")).count()
    // at accuracy 10000 on a few-thousand-doc fixture the sketch ranks
    // are near-exact; disagreement is confined to cutoff boundaries
    assert(agree.toDouble / n > 0.95, s"agree $agree/$n")
    // keep policy semantics hold on the approx path too
    val a = approx.collect()
    assert(a.filter(_.getString(4) == "head").forall(_.getBoolean(5)))
    assert(a.filter(_.getString(4) == "tail").forall(!_.getBoolean(5)))
  }

  // ------------------------------------------------ Sampling.mixtureEpochs

  test("mixtureEpochs: integer epochs repeat exactly, fractional " +
      "epochs hit the expected share, zero drops, steps contiguous") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 200L).map(i => (i, "b")) ++
      (201L to 250L).map(i => (i, "c")))
      .toDF("doc_id", "src")
    val out = graft.operators.Sampling.mixtureEpochs(df, "doc_id",
      "src", Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0)).collect()
    val byS = out.groupBy(_.getString(0))
    // integer epochs: every 'a' doc exactly twice
    assert(byS("a").length === 200)
    assert(byS("a").groupBy(_.getLong(1)).forall(_._2.length == 2))
    // fractional: 'b' keeps ~half (4σ bounds on binomial(100, .5))
    val nb = byS("b").length
    assert(nb > 30 && nb < 70, s"b kept $nb")
    assert(byS("b").groupBy(_.getLong(1)).forall(_._2.length == 1))
    // zero epochs: stratum absent
    assert(!byS.contains("c"))
    // steps are exactly 0..total-1 and copies of one doc spread out
    assert(out.map(_.getLong(4)).sorted.toSeq ===
      (0L until out.length.toLong))
    // layout invariance
    val again = graft.operators.Sampling.mixtureEpochs(
        df.repartition(7), "doc_id", "src",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(again === out.map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(4))).toSet)
  }

  // ------------------------------------------------ Sampling.clusterSample

  test("clusterSample: stage-1 picks whole strata, stage-2 exact-k " +
      "inside; small strata keep all; deterministic") {
    import spark.implicits._
    val df = (for (s <- 'a' to 'f'; i <- 1 to 10)
      yield (s"${s}${i}".hashCode.toLong.abs + i, s.toString))
      .distinct.toDF("doc_id", "src")
    val out = graft.operators.Sampling.clusterSample(df, "doc_id",
      "src", kStrata = 2, kPerStratum = 3).collect()
    val strata = out.map(_.getString(0)).distinct
    assert(strata.length === 2)
    assert(out.groupBy(_.getString(0)).forall(_._2.length == 3))
    // the picked strata are exactly the top-2 by stage-1 uniform over
    // ALL six strata (recompute via a 1-stratum-per-row call)
    val all = graft.operators.Sampling.clusterSample(df, "doc_id",
      "src", kStrata = 6, kPerStratum = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).distinct
    val top2 = all.sortBy { case (s, u) => (-u, s) }.take(2).map(_._1)
    assert(strata.sorted.toSeq === top2.sorted.toSeq)
    // a stratum smaller than k keeps everything
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y"))
      .toDF("doc_id", "src")
    val t = graft.operators.Sampling.clusterSample(tiny, "doc_id",
      "src", kStrata = 1, kPerStratum = 5).collect()
    assert(t.length === 2 || t.length === 1) // whichever stratum won
    val again = graft.operators.Sampling.clusterSample(df.repartition(7),
        "doc_id", "src", kStrata = 2, kPerStratum = 3)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(again === out.map(r => (r.getString(0), r.getLong(3))).toSet)
  }

  // --------------------------------------------- Sampling.multiEpochOrder

  test("multiEpochOrder: every doc once per epoch, contiguous global " +
      "steps, epochs shuffle independently, layout-invariant") {
    import spark.implicits._
    val df = (1L to 60L).toDF("doc_id")
    val out = graft.operators.Sampling.multiEpochOrder(df, epochs = 3)
      .collect()
    assert(out.length === 180)
    // steps are exactly 0..179, each doc once per epoch
    assert(out.map(_.getLong(3)).sorted.toSeq === (0L until 180L))
    (0 until 3).foreach { e =>
      val ep = out.filter(_.getLong(0) == e)
      assert(ep.map(_.getLong(1)).sorted.toSeq === (1L to 60L))
      // epoch e occupies steps [e*60, (e+1)*60)
      assert(ep.map(_.getLong(3)).min === e * 60L &&
        ep.map(_.getLong(3)).max === e * 60L + 59L)
    }
    // different epochs permute differently
    def order(e: Int) = out.filter(_.getLong(0) == e)
      .sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
    assert(order(0) !== order(1))
    assert(order(1) !== order(2))
    val again = graft.operators.Sampling.multiEpochOrder(
        df.repartition(7), epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(again === out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(3))).toSet)
  }

  // ------------------------------------------ Sampling.thresholdFrontier

  test("thresholdFrontier: one-pass doc and token survival at every " +
      "threshold; NULL scores keep nothing but stay in totals") {
    import spark.implicits._
    val df = Seq((Some(0.9), 10L), (Some(0.5), 20L), (Some(0.1), 30L),
      (None: Option[Double], 40L))
      .toDF("s", "tok")
    val rows = graft.operators.Sampling.thresholdFrontier(df, "s",
        col("tok"), Seq(0.4, 0.8))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))))
      .toMap
    // totals include the NULL-score row (visible, not vanished)
    assert(rows(0.4) === ((4L, 2L, 100L, 30L)))
    assert(rows(0.8) === ((4L, 1L, 100L, 10L)))
  }

  // ------------------------------------------- Sampling.keepRateThreshold

  test("keepRateThreshold: largest grid threshold reaching the target; " +
      "ties overshoot by one cell at most") {
    import spark.implicits._
    // scores 0.9, 0.8, 0.8, 0.7, 0.6 — keep 40% of 5 → target 2;
    // cum(0.9)=1, cum(0.8)=3 → threshold 0.8, kept 3 (tie overshoot)
    val df = Seq(0.9, 0.8, 0.8, 0.7, 0.6).toDF("s")
    val r = graft.operators.Sampling.keepRateThreshold(df, "s", 0.4)
      .head()
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_target") === 2L)
    assert(r.getAs[Double]("threshold") === 0.8)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Double]("actual_rate") === 0.6)
    // keepRate 1.0 keeps everything at the minimum score
    val all = graft.operators.Sampling.keepRateThreshold(df, "s", 1.0)
      .head()
    assert(all.getAs[Double]("threshold") === 0.6)
    assert(all.getAs[Long]("n_kept") === 5L)
  }

  // ------------------------------------------------ Sampling.quotaExactK

  test("quotaExactK: Hamilton apportionment with remainder ties on " +
      "stratum name; quotas cap at stratum size; budget exact") {
    import spark.implicits._
    // A:6 B:3 C:1 rows, K=5 → floors (3,1,0), one leftover seat;
    // remainders B=C=5 tie → B (name asc) takes it → quotas 3/2/1…
    // but C's floor 0 + no seat = 0: exact shares 3.0/1.5/0.5
    val df = ((1 to 6).map(i => (i.toLong, "A")) ++
      (11 to 13).map(i => (i.toLong, "B")) ++ Seq((21L, "C")))
      .toDF("doc_id", "src")
    val got = graft.operators.Sampling.quotaExactK(df, "doc_id", "src",
        totalK = 5)
      .collect()
    val byStratum = got.groupBy(_.getString(0)).view
      .mapValues(_.length).toMap
    assert(byStratum === Map("A" -> 3, "B" -> 2))
    assert(got.length === 5)
    // every rank within its quota, quota column consistent
    assert(got.forall(r => r.getInt(2) <= r.getLong(1)))
    // cap: a 1-row stratum cannot supply more than 1 even at K = N
    val capped = graft.operators.Sampling.quotaExactK(df, "doc_id",
        "src", totalK = 10).collect()
    assert(capped.groupBy(_.getString(0)).view.mapValues(_.length)
      .toMap === Map("A" -> 6, "B" -> 3, "C" -> 1))
    // layout invariance
    val again = graft.operators.Sampling.quotaExactK(df.repartition(7),
        "doc_id", "src", totalK = 5)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(again === got.map(r => (r.getString(0), r.getLong(3))).toSet)
  }

  // ---------------------------------------- Packing.lengthGroupedBatches

  test("lengthGroupedBatches: sorted runs cut at batchSize; padding is " +
      "n·max − Σ; short tail batch allowed") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = Seq((1L, 10L), (2L, 1L), (3L, 11L), (4L, 2L), (5L, 3L))
      .toDF("doc_id", "tok")
    val rows = Packing.lengthGroupedBatches(docs, batchSize = 2,
        col("tok"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // sorted tokens: 1,2,3,10,11 → [1,2] [3,10] [11]
    assert(rows(0L) === ((2L, 1L, 2L, 3L, 1L)))
    assert(rows(1L) === ((2L, 3L, 10L, 13L, 7L)))
    assert(rows(2L) === ((1L, 11L, 11L, 11L, 0L)))
    // grouping beats a random batch over the same docs: total padding
    // 8 here vs e.g. pairing (1,11) and (2,10) which already pads 18
    assert(rows.values.map(_._5).sum === 8L)
  }

  test("lengthGroupedBatches: ties break on doc id; layout-invariant") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = (1L to 100L).map(i => (i, i % 7)).toDF("doc_id", "tok")
    val a = Packing.lengthGroupedBatches(docs, 8, col("tok"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = Packing.lengthGroupedBatches(docs.repartition(13), 8,
        col("tok"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq === b.toSeq)
    assert(a.map(_(1).asInstanceOf[Long]).sum === 100L)
  }

  // --------------------------------------------------- ZOrder

  test("zValue: hand-computed interleave; clamping at the cube edge") {
    import spark.implicits._
    import graft.operators.ZOrder
    // x=3 (011), y=5 (101), 3 bits: z = 1 + 2 + 4 + 32 = 39
    val r = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3))
      .head().getLong(0)
    assert(r === 39L)
    val clamped = Seq((-5L, 100L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3))
      .head().getLong(0)
    // (-5 → 0, 100 → 7): bits of y at odd positions → 2 + 8 + 32
    assert(clamped === 42L)
    // one dim degenerates to its own value
    val one = Seq(Tuple1(123L)).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), bits = 16)).head().getLong(0)
    assert(one === 123L)
  }

  test("zValue: interleave preserves locality both ways — every " +
      "clustered partition's bbox is a tile, not a stripe") {
    import spark.implicits._
    import graft.operators.ZOrder
    // full 16×16 grid; 4 range partitions of the morton curve ≈ the
    // 4 quadrants: BOTH x- and y-extents stay ~8, where any row-major
    // layout gives stripes with a full-width 16 extent in one dim
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val parts = ZOrder.cluster(grid, Seq(col("x"), col("y")),
        numPartitions = 4, bits = 4)
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid")
      .agg((max(col("x")) - min(col("x"))).as("xr"),
        (max(col("y")) - min(col("y"))).as("yr"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.map(_.getAs[Long]("n")).sum === 256L)
    parts.filter(_.getAs[Long]("n") > 16).foreach { p =>
      assert(p.getAs[Long]("xr") <= 11L, s"x extent too wide: $p")
      assert(p.getAs[Long]("yr") <= 11L, s"y extent too wide: $p")
    }
  }

  test("doremi MWU: high-excess domain gains, trajectory is exact integers") {
    import spark.implicits._
    import graft.operators.Doremi
    // domain a: excess 0.5 (500000 micro); b: 0; c (NULL): 0.1
    val docs = Seq(
      ("a", 500000L), ("a", 500000L),
      ("b", 0L), ("b", 0L),
      (null.asInstanceOf[String], 100000L))
      .toDF("domain", "e")
    val out = Doremi.domainReweight(docs, "domain", col("e"),
        steps = 2, etaDiv = 10)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // step 0: uniform floor(1e6/3)
    assert(out((0, "a")) === 333333L)
    // hand-replay step 1: mult = (1050000, 1000000, 1010000)
    val w0 = 333333L
    val raw = Seq(w0 * 1050000L, w0 * 1000000L, w0 * 1010000L)
    val z = raw.sum
    val w1 = raw.map(r => r * 1000000L / z)
    assert(out((1, "a")) === w1(0))
    assert(out((1, "b")) === w1(1))
    assert(out((1, graft.operators.Sampling.NullStratum)) === w1(2))
    assert(out((1, "a")) > out((1, "b")))
    // step -1 is the floor-mean of iterates 1..2
    val raw2 = Seq(w1(0) * 1050000L, w1(1) * 1000000L, w1(2) * 1010000L)
    val z2 = raw2.sum
    val w2 = raw2.map(r => r * 1000000L / z2)
    assert(out((-1, "a")) === (w1(0) + w2(0)) / 2)
    // negative excess clamps to zero, never downweights below uniform decay
    val neg = Seq(("a", -900000L), ("b", 0L)).toDF("domain", "e")
    val o2 = Doremi.domainReweight(neg, "domain", col("e"), steps = 1)
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(o2((1, "a")) === o2((1, "b")))
  }

  test("knBigramCrossEntropy: hand-computed Kneser-Ney on a 3-bigram model") {
    import spark.implicits._
    import graft.text.UnigramLm
    // model corpus "a b a c": bigrams (a,b),(b,a),(a,c) each once;
    // V=3, B=3; ctx a: c=2,N1f=2; ctx b: c=1,N1f=1; N1b = 1 for a,b,c
    val m = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),  // seen bigram: .25/2 + (.75*2/2)*(2/6) = 0.375
      (2L, "c a"),  // unseen context -> pcont(a) = 2/6
      (3L, "b c")   // seen ctx, unseen bigram: 0 + (.75*1/1)*(2/6) = 0.25
    ).toDF("doc_id", "text")
    val got = UnigramLm.knBigramCrossEntropy(docs, model = m)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - (-math.log(0.375))) < 1e-12)
    assert(math.abs(got(2L)._2 - (-math.log(1.0 / 3))) < 1e-12)
    assert(math.abs(got(3L)._2 - (-math.log(0.25))) < 1e-12)
  }

  test("knBigramCrossEntropy ranks a fluent doc below a shuffled one") {
    import spark.implicits._
    import graft.text.UnigramLm
    val m = (1 to 50).map(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (100L, "the quick brown fox jumps"),
      (101L, "fox the jumps quick brown")).toDF("doc_id", "text")
    val ce = UnigramLm.knBigramCrossEntropy(probe, model = m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(100L) < ce(101L))
  }

  test("unimaxAllocation: textbook waterfill — small stratum caps, the " +
      "rest split evenly; capacity-limited case under-spends; NULL " +
      "stratum under the sentinel") {
    import spark.implicits._
    // one doc per token so per-stratum tokens are exact: a=10, b=100,
    // c=100 tokens; maxEpochs=1.0 → caps (10, 100, 100); budget 60 →
    // a caps at 10, b and c split floor(50/2)=25 each
    def corpus(counts: Map[String, Int]): DataFrame =
      counts.toSeq.flatMap { case (s, n) =>
        (1 to n).map(i => (s, "tokenword"))
      }.toDF("lang", "text")
    val docs3 = corpus(Map("a" -> 10, "b" -> 100, "c" -> 100))
    val tok = graft.text.TextAnalysis.wsTokenCount(col("text"))
    val got = Sampling.unimaxAllocation(docs3, "lang", tok,
        budget = 60L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("a") === ((10L, 10L, 10L, 1.0)))
    assert(got("b") === ((100L, 100L, 25L, 0.25)))
    assert(got("c") === ((100L, 100L, 25L, 0.25)))
    // budget above total capacity: everyone capped, budget under-spent
    val rich = Sampling.unimaxAllocation(docs3, "lang", tok,
        budget = 10000L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rich === Map("a" -> 10L, "b" -> 100L, "c" -> 100L))
    // NULL stratum rides the sentinel; layout invariance
    val withNull = corpus(Map("a" -> 10))
      .unionByName(Seq((null.asInstanceOf[String], "x y z"))
        .toDF("lang", "text"))
    val ns = Sampling.unimaxAllocation(withNull.repartition(5), "lang",
        tok, budget = 7L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // caps (a=10, null=3), budget 7: null caps at 3, a takes floor(4/1)
    assert(ns(Sampling.NullStratum) === 3L)
    assert(ns("a") === 4L)
  }

  test("curriculumOrder: buckets are monotone in score, steps are a " +
      "0-based permutation ordered easy-first, layout-invariant") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("doc_id", "difficulty")
    val got = Sampling.curriculumOrder(df, "doc_id", col("difficulty"),
      buckets = 4, seed = 11L).collect()
    assert(got.length === 200)
    // steps are exactly 0..199
    assert(got.map(_.getLong(4)).sorted.toSeq === (0L until 200L))
    // global order is easy-first: score is non-decreasing ACROSS
    // buckets (shuffled within), so bucket is monotone in step
    val byStep = got.sortBy(_.getLong(4))
    assert(byStep.map(_.getInt(2)).toSeq === byStep.map(_.getInt(2))
      .sorted.toSeq)
    // within a bucket every score is <= every score of later buckets
    val maxPerBucket = got.groupBy(_.getInt(2))
      .view.mapValues(_.map(_.getDouble(1)).max).toMap
    val minPerBucket = got.groupBy(_.getInt(2))
      .view.mapValues(_.map(_.getDouble(1)).min).toMap
    maxPerBucket.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(maxPerBucket(a) <= minPerBucket(b))
      case _ => ()
    }
    // deterministic across layouts
    val again = Sampling.curriculumOrder(df.repartition(7), "doc_id",
        col("difficulty"), buckets = 4, seed = 11L).collect()
    assert(again.map(_.toString).sorted.toSeq ===
      got.map(_.toString).sorted.toSeq)
    // NULL difficulty: excluded explicitly, steps stay a dense 0-based
    // permutation of the scored rows
    val withNull = df.unionByName(Seq((999L,
      null.asInstanceOf[java.lang.Long])).toDF("doc_id", "difficulty"))
    val ns = Sampling.curriculumOrder(withNull, "doc_id",
      col("difficulty"), buckets = 4, seed = 11L).collect()
    assert(ns.length === 200 && !ns.exists(_.getLong(0) == 999L))
    assert(ns.map(_.getLong(4)).sorted.toSeq === (0L until 200L))
  }

  test("learnabilitySelect: keep count honors the fraction with ties, " +
      "excess is the rounded CE difference, repartition-invariant") {
    import spark.implicits._
    import graft.text.UnigramLm
    // structured docs (repeated bigram patterns the KN model exploits)
    // vs scrambled docs (same unigrams, broken bigrams): structured
    // docs should have HIGHER excess = more learnable
    val structured = (1 to 12).map(i => (i.toLong,
      "alpha beta gamma delta alpha beta gamma delta alpha beta"))
    val scrambled = Seq(
      (101L, "beta alpha delta gamma beta delta alpha gamma beta alpha"),
      (102L, "gamma alpha beta delta gamma beta delta alpha gamma delta"),
      (103L, "delta gamma beta alpha delta alpha gamma beta delta beta"))
    val docs = (structured ++ scrambled).toDF("doc_id", "text")
    val got = UnigramLm.learnabilitySelect(docs, keepFraction = 0.4)
    val rows = got.collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      val want = BigDecimal(r.getDouble(2) - r.getDouble(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - want) < 1e-9)
    }
    val kept = rows.filter(_.getBoolean(5))
    // ceil(0.4 * 15) = 6; the 12 structured docs share one score, so
    // the tie at the threshold keeps all of them
    assert(kept.length >= 6)
    kept.foreach(r => assert(r.getLong(0) <= 100L,
      s"scrambled doc ${r.getLong(0)} kept over structured"))
    // layout invariance
    val again = UnigramLm.learnabilitySelect(docs.repartition(7),
      keepFraction = 0.4).collect()
    assert(again.map(_.toString).sorted.toSeq ===
      rows.map(_.toString).sorted.toSeq)
  }
}
