package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup operators: exact groups, MinHash-LSH recall against exact
  * Jaccard, SimHash near-dup detection on perturbed copies. */
class DedupSpec extends SparkSuite {

  /** documents plus near-duplicate copies: docs 0-9 duplicated with a tiny
    * suffix edit (near-dup) and docs 10-14 copied verbatim (exact dup). */
  lazy val docsWithDups: DataFrame = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val near = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" xyzq")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val exact = docs.filter(col("doc_id") >= 10 && col("doc_id") < 15)
      .select((col("doc_id") + 20000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    docs.unionByName(near).unionByName(exact)
  }

  test("exact dedup finds verbatim copies and keeps min id") {
    val groups = Dedup.exactDuplicateGroups(docsWithDups, "text", "doc_id")
    val dups = groups.filter(col("n_dups") > 1).collect()
    assert(dups.length === 5)
    assert(dups.forall(r => r.getLong(1) >= 10 && r.getLong(1) < 15)) // keep_id
    val kept = Dedup.dropExactDuplicates(docsWithDups, "text", "doc_id")
    assert(kept.count() === docsWithDups.count() - 5)
    assert(kept.filter(col("doc_id") >= 20000).count() === 0)
  }

  test("incremental dedup: index hits drop, in-batch dups keep min id, " +
      "index never shuffled") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("fp_index")
      .resolve("idx").toString
    Dedup.writeFingerprintIndex(docs.filter(col("doc_id") < 100),
      "text", "doc_id", path)
    // batch: 50 new docs, 10 exact copies of indexed content (retagged
    // ids), one in-batch duplicate pair of a new doc
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 30000L))
      .unionByName(docs.filter(col("doc_id") === 120)
        .withColumn("doc_id", lit(40000L)))
    val res = Dedup.incrementalExactDedup(batch, "text", "doc_id", path)
    val ids = res.select("doc_id").collect().map(_.getLong(0)).toSet
    // copies of indexed docs gone; in-batch dup resolved to min id (120)
    assert(ids === (100L until 150L).toSet)
    // two-step probe: every join broadcasts (no sort-merge shuffle of
    // the index side anywhere in the plan)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"index side shuffled into a sort-merge join:\n$plan")

    // append-style second ingest: the accepted batch joins the index
    Dedup.writeFingerprintIndex(res, "text", "doc_id", path,
      mode = "append")
    val again = Dedup.incrementalExactDedup(
      docs.filter(col("doc_id") === 120)
        .withColumn("doc_id", lit(50000L)),
      "text", "doc_id", path)
    assert(again.count() === 0) // now an index hit
  }

  test("minhash LSH recovers high-jaccard pairs (recall vs exact)") {
    val truth = Dedup.ngramJaccardPairs(docsWithDups, "text", "doc_id",
        n = 5, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.size >= 15, s"expected injected dup pairs, got ${truth.size}")
    val found = Dedup.minhashLshPairs(docsWithDups, "text", "doc_id",
        shingleLen = 5, k = 64, bands = 16, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // every found pair is truly above threshold (verification step is exact)
    assert(found.subsetOf(truth))
    // banding theory: P(detect | j>=0.9) = 1-(1-0.9^4)^16 ≈ 0.9999
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9")
  }

  test("containment: a prefix fragment is fully contained while " +
      "jaccard stays low; empty side scores 0") {
    import spark.implicits._
    // A = prefix of B: S(A) = {abc,bcd,cde,def} ⊂ S(B) (6 shingles)
    val docs = Seq((1L, "abcdef"), (2L, "abcdefgh"), (3L, "zzzz"),
      (4L, "")).toDF("doc_id", "text")
    val rows = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows((1L, 2L)) === ((1.0, 4.0 / 6.0)))
    // the symmetric metric on the same pair: 4/6 < the 0.7 gate the
    // asymmetric max direction clears
    assert(rows.size === 1) // zzzz and the empty doc pair with nobody
    val none = Dedup.ngramContainmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 1.01)
    assert(none.count() === 0)
  }

  test("corpusJaccardKmv: k covering the union makes the estimate " +
      "exact; bottom-k is layout-invariant") {
    import spark.implicits._
    // A: t1..t6, B: t4..t9 → |∩| = 3, |∪| = 9, J = 1/3
    val a = (1 to 6).map(i => (i.toLong, s"text number $i"))
      .toDF("doc_id", "text")
    val b = (4 to 9).map(i => (i.toLong, s"text number $i"))
      .toDF("doc_id", "text")
    val r = Dedup.corpusJaccardKmv(a, b, "text", k = 16).head()
    assert(r.getAs[Long]("k_used") === 9L) // whole union fits
    assert(r.getAs[Long]("n_a") === 6L && r.getAs[Long]("n_b") === 6L)
    assert(r.getAs[Long]("n_common_topk") === 3L)
    assert(r.getAs[Double]("jaccard_est") === 0.333333)
    val r2 = Dedup.corpusJaccardKmv(a.repartition(5), b.repartition(3),
      "text", k = 16).head()
    assert(r2.toSeq === r.toSeq)
    // duplicate TEXTS collapse to one fingerprint before the sketch
    val dupA = a.unionByName(a)
    val r3 = Dedup.corpusJaccardKmv(dupA, b, "text", k = 16).head()
    assert(r3.toSeq === r.toSeq)
  }

  test("dupNgramFraction: copies and their originals hit 1.0, unique " +
      "prose 0, gram-less docs keep a zero row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five"), // copied below
      (2L, "one two three four five"),
      (3L, "six seven eight nine ten eleven"), // unique
      (4L, "short"), // < n tokens: no grams
      (5L, "")) // empty
      .toDF("doc_id", "text")
    val rows = Dedup.dupNgramFraction(docs, "text", "doc_id", n = 3,
        minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) === ((3L, 3L, 1.0)))
    assert(rows(2L) === ((3L, 3L, 1.0)))
    assert(rows(3L) === ((4L, 0L, 0.0)))
    assert(rows(4L) === ((0L, 0L, 0.0)))
    assert(rows(5L) === ((0L, 0L, 0.0)))
    // layout invariance
    val again = Dedup.dupNgramFraction(docs.repartition(7), "text",
        "doc_id", n = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(again === rows)
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val pairs = Dedup.simhashPairs(docsWithDups, "text", "doc_id",
      maxDist = 3)
    val found = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies have hamming 0 → all 5 must be found
    val exactPairs = (10 until 15).map(i => (i.toLong, (i + 20000).toLong))
    assert(exactPairs.forall(found.contains),
      s"missing exact-dup simhash pairs: ${exactPairs.filterNot(found.contains)}")
    // a tiny suffix edit shifts few bits → most near-dups found too
    val nearPairs = (0 until 10).map(i => (i.toLong, (i + 10000).toLong))
    assert(nearPairs.count(found.contains) >= 7)
  }

  test("winnowing fingerprints overlap heavily for near-identical docs") {
    val fp = docsWithDups.select(col("doc_id"),
      TextAnalysis.winnowingFingerprint(col("text")).as("fp"))
    val a = fp.filter(col("doc_id") === 3).collect()(0).getSeq[Long](1).toSet
    val b = fp.filter(col("doc_id") === 10003).collect()(0).getSeq[Long](1).toSet
    val j = a.intersect(b).size.toDouble / a.union(b).size
    assert(j > 0.8, s"winnow jaccard $j")
  }

  test("dropNearDuplicates removes exact AND near copies, keeps originals") {
    val cleaned = Dedup.dropNearDuplicates(docsWithDups, "text", "doc_id",
      bands = 8, threshold = 0.8)
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    // exact copies (20000+) all gone; near copies (10000+, ' xyzq' suffix)
    // gone; their originals survive
    assert(ids.forall(_ < 20000))
    assert((0L until 10L).forall(ids.contains), "originals must survive")
    assert(!ids.exists(i => i >= 10000 && i < 10010),
      "planted near-dups must be dropped")
  }

  test("editDistancePairs: near copies at exact distance, threshold gates") {
    // docsWithDups: docs 0-9 have " xyzq"-suffixed copies → normalized
    // distance exactly 5; exact copies were NOT predropped here, so
    // 10-14's verbatim twins sit at distance 0
    val pairs = Dedup.editDistancePairs(docsWithDups, "text", "doc_id",
      maxDistance = 5, bands = 8, maxBucketSize = 64)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    (0L until 10L).foreach { i =>
      assert(got.get((i, i + 10000)).contains(5), s"doc $i near copy")
    }
    (10L until 15L).foreach { i =>
      assert(got.get((i, i + 20000)).contains(0), s"doc $i exact copy")
    }
    // a tighter threshold drops the 5-edit pairs but keeps the exact ones
    val tight = Dedup.editDistancePairs(docsWithDups, "text", "doc_id",
        maxDistance = 1, bands = 8, maxBucketSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === (10L until 15L).map(i => (i, i + 20000)).toSet)
  }

  test("keepBestPerComponent: highest score wins, ties to min id, " +
      "singletons survive") {
    import spark.implicits._
    val df = Seq(
      (1L, 5), (2L, 9), (3L, 7),  // chain 1-2-3: 2 has the best score
      (10L, 4), (11L, 4),         // pair with equal scores: min id (10)
      (20L, 1))                   // singleton: kept regardless of score
      .toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestPerComponent(df, pairs, "id", col("score"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 10L, 20L))
  }

  test("connected components: chains, triangles and singleton-free output") {
    // chain 1-2-3-4-5 (one component), pair 10-11, triangle 20-21-22,
    // and a 0..19 path under a distinct id range to exercise iteration
    // depth beyond one round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)) ++
      (100L until 119L).map(i => (i, i + 1))
    val pairs = spark.createDataFrame(edges).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L))
    assert(comp(10L) === 10L && comp(11L) === 10L)
    assert((20L to 22L).forall(comp(_) == 20L))
    assert((100L to 119L).forall(comp(_) == 100L), "20-node path")
    assert(comp.size === 5 + 2 + 3 + 20, "exactly the paired nodes")
  }

  test("CC vs greedy keep-sets: equal on chains, CC drops local minima") {
    // chain shape (a<b<c, pairs (a,b),(b,c)): both drop {b,c}
    val chain = spark.createDataFrame(Seq((1L, 2L), (2L, 3L)))
      .toDF("id_a", "id_b")
    val ccDrop = Dedup.connectedComponents(chain)
      .filter(col("id") =!= col("component"))
      .collect().map(_.getLong(0)).toSet
    assert(ccDrop === Set(2L, 3L)) // greedy: distinct id_b = {2,3} — same
    // local-minimum shape (pairs (2,3),(1,3)): node 2 is smaller than its
    // only neighbor, so greedy (drop = distinct id_b = {3}) keeps it; CC
    // folds {1,2,3} into one cluster and keeps only the minimum
    val lm = spark.createDataFrame(Seq((2L, 3L), (1L, 3L)))
      .toDF("id_a", "id_b")
    val lmDrop = Dedup.connectedComponents(lm)
      .filter(col("id") =!= col("component"))
      .collect().map(_.getLong(0)).toSet
    assert(lmDrop === Set(2L, 3L), "CC must drop the non-minimum local min")
  }

  test("dropNearDuplicatesCC keeps one doc per cluster, subset of greedy") {
    val greedy = Dedup.dropNearDuplicates(docsWithDups, "text", "doc_id",
        bands = 8, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cc = Dedup.dropNearDuplicatesCC(docsWithDups, "text", "doc_id",
        bands = 8, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cc.subsetOf(greedy), s"CC keep-set must be ⊆ greedy: ${cc -- greedy}")
    // same contract as the greedy spec: originals survive, plants die
    assert((0L until 10L).forall(cc.contains), "originals must survive")
    assert(!cc.exists(_ >= 10000), "planted near/exact dups must be dropped")
  }

  test("md5 shingles: ASCII byte fast path equals the char-window path") {
    // the md5 mode windows CHARACTERS (SQL substr semantics); the ASCII
    // fast path windows bytes off the backing array — identical only
    // while every char is one byte. Pin both sides: ASCII text agrees
    // with hand-computed char windows, and multibyte text (fast path
    // inapplicable) still hashes char windows, not byte windows.
    import graft.functions.HashExpressions
    def shingles(s: String): Seq[Long] = {
      val df = spark.createDataFrame(Seq(Tuple1(s))).toDF("t")
      df.select(HashExpressions.shingleHashes(col("t"), 3, "md5").as("h"))
        .collect()(0).getSeq[Long](0)
    }
    def md5Of(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (h(i) & 0xffL))
    }
    val ascii = "abcde"
    assert(shingles(ascii) ===
      Seq("abc", "bcd", "cde").map(md5Of).distinct)
    val multi = "aé€bc" // 1-, 2-, 3-byte chars
    assert(shingles(multi) ===
      Seq("aé€", "é€b", "€bc").map(md5Of).distinct)
  }

  test("md5 hash mode: known value, and same LSH pairs as xx mode") {
    // md5("hello") = 5d41402abc4b2a76... → first 8 bytes big-endian signed
    // = 0x5d41402abc4b2a76 — the value DuckDB's
    // ('0x' || substr(md5(s),1,16))::UBIGINT reproduces.
    import graft.functions.HashExpressions
    val v = spark.range(1).select(
      HashExpressions.md5Long(lit("hello")).as("h")).collect()(0).getLong(0)
    assert(v === 0x5d41402abc4b2a76L)

    // Candidate/verify semantics are hash-family-independent: both modes
    // must report the same verified near-dup pairs on the planted set.
    def pairs(mode: String) =
      Dedup.minhashLshPairs(docsWithDups, "text", "doc_id",
          shingleLen = 5, k = 64, bands = 8, threshold = 0.8,
          hashMode = mode)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val xx = pairs(HashExpressions.ModeXx)
    val md5 = pairs(HashExpressions.ModeMd5)
    assert(xx.nonEmpty)
    assert(xx === md5, s"mode mismatch: xx-only=${xx -- md5} md5-only=${md5 -- xx}")

    // simhash mode changes the fingerprint but not its near-dup power:
    // exact copies still collide bit-for-bit.
    val sh = docsWithDups.filter(col("doc_id").isin(10, 20010))
      .select(Dedup.simhash64(col("text"), HashExpressions.ModeMd5).as("s"))
      .collect().map(_.getLong(0))
    assert(sh(0) === sh(1))
  }

  test("duplicate spans: cross-doc shared substrings located and merged exactly") {
    import spark.implicits._
    // fillers must not self-repeat: a run like "aaaaaaaa" duplicates
    // WITHIN the doc (that is correct behavior, pinned by the next test)
    val shared = "THE-QUICK-BROWN-FOX-JUMPS-OVER!!"   // 32 chars
    val docs = Seq(
      (1L, "abcdefghij" + shared + "JKLMNOPQRS"),      // shared at [10, 42)
      (2L, shared + "qrstuvwxyz0123456789"),           // shared at [0, 32)
      (3L, "unique text with nothing repeated here x")
    ).toDF("doc_id", "text")
    val n = 8
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", n = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(r => (r._1, r._2))
    // every window inside `shared` repeats; windows touching the distinct
    // context are unique → the merged span is exactly the shared region
    assert(spans.toSeq === Seq(
      (1L, 10L, 42L, (32 - n + 1).toLong),
      (2L, 0L, 32L, (32 - n + 1).toLong)))

    // removal cuts exactly the span, keeps everything else
    val cleaned = Dedup.removeDuplicateSpans(
        docs, Dedup.duplicateSpans(docs, "text", "doc_id", n = n),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) === "abcdefghij" + "JKLMNOPQRS")
    assert(cleaned(2L) === "qrstuvwxyz0123456789")
    assert(cleaned(3L) === "unique text with nothing repeated here x")
  }

  test("duplicate spans: within-doc repeats, stride recall, mode equivalence") {
    import spark.implicits._
    val x = "0123456789ABCDEF"                          // 16 chars
    val docs = Seq((7L, x + x)).toDF("doc_id", "text")  // doc = X+X
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", n = 8)
      .collect()
    // prefix windows repeat at +16; adjacent hit runs merge into one span
    assert(spans.length === 1)
    assert(spans(0).getLong(1) === 0L && spans(0).getLong(2) === 32L)

    // md5 and xx modes agree on spans (hash family only changes the key)
    val corpus = docsWithDups.filter(col("doc_id") < 15 ||
      col("doc_id") >= 20000)
    def spanSet(mode: String) =
      Dedup.duplicateSpans(corpus, "text", "doc_id", n = 30,
          hashMode = mode)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val xxS = spanSet(graft.functions.HashExpressions.ModeXx)
    assert(xxS.nonEmpty) // verbatim copies exist in the fixture
    assert(xxS === spanSet(graft.functions.HashExpressions.ModeMd5))

    // stride>1 still finds the fully-duplicated docs, with coarser starts
    val strided = Dedup.duplicateSpans(corpus, "text", "doc_id", n = 30,
      stride = 4).collect()
    assert(strided.nonEmpty)
    assert(strided.forall(_.getLong(1) % 4 == 0))

    // the span merge window must stay partitioned per document
    val plan = Dedup.duplicateSpans(corpus, "text", "doc_id", n = 30)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "span merge must never use a global window")
  }

  test("ngramContamination flags planted benchmark copies, nothing else") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bench = docs.filter(col("doc_id") < 5)
    val planted = bench
      .withColumn("doc_id", col("doc_id") + 1000)
      .withColumn("text", concat(col("text"), lit(" zz")))
    val train = docs.filter(col("doc_id") >= 5).unionByName(planted)
    val res = Dedup.ngramContamination(train, bench, "text", "doc_id",
      n = 8)
    assert(res.count() === train.count()) // every train doc reported
    val flagged = res.filter(col("contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the planted suffix-edited copies share all interior 8-grams and
    // MUST flag; the fixture also contains its own planted near-dups of
    // doc 0 (e.g. 50, 82), so the full flag set is checked against an
    // independent string-level ground truth (array_intersect on the gram
    // STRINGS — no hashing, different code path than the operator)
    assert(Set(1000L, 1001L, 1002L, 1003L, 1004L).subsetOf(flagged))
    val truth = train.select(col("doc_id"),
        TextAnalysis.wordShingles(col("text"), 8).as("tg"))
      .crossJoin(bench.select(
        TextAnalysis.wordShingles(col("text"), 8).as("bg")))
      .filter(size(array_intersect(col("tg"), col("bg"))) > 0)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged === truth)
    val hit = res.filter(col("doc_id") === 1000L).collect().head
    assert(hit.getLong(2) > 0 && hit.getLong(2) <= hit.getLong(1))

    // short documents (< n tokens) still get a row: 0 grams, clean
    val shorty = train.limit(0).unionByName(
      docs.filter(col("doc_id") === 5)
        .withColumn("text", lit("too short for grams")))
    val sres = Dedup.ngramContamination(shorty, bench, "text", "doc_id",
      n = 8).collect()
    assert(sres.length === 1)
    assert(sres.head.getLong(1) === 0 && !sres.head.getBoolean(3))

    // xx and md5 hash modes agree on flags and counts
    val md5Res = Dedup.ngramContamination(train, bench, "text", "doc_id",
        n = 8, hashMode = graft.functions.HashExpressions.ModeMd5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val xxRes = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(md5Res === xxRes)

    // the Bloom-prefilter plan returns the IDENTICAL result — even when
    // the filter is deliberately undersized so false positives flood the
    // probe, the exact verify join strips every one of them
    val bloomRes = Dedup.ngramContaminationBloom(train, bench, "text",
        "doc_id", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloomRes === xxRes)
    val floodRes = Dedup.ngramContaminationBloom(train, bench, "text",
        "doc_id", n = 8, fpp = 0.5, expectedGrams = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(floodRes === xxRes)
  }

  test("dedupWithinDocLines keeps first occurrences in order, is " +
      "per-document, and plans map-only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"),  // dups of a and b inside one doc
      (2L, "a\nz"),           // 'a' repeats ACROSS docs — both kept
      (3L, ""),               // empty text: one empty line, kept
      (4L, "x\nx\nx\nx")).toDF("doc_id", "text")
    val res = graft.dedup.Dedup.dedupWithinDocLines(docs, "text", "doc_id")
    val got = res.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("a\nb\nc", 5L, 2L))) // order kept, first wins
    assert(got(2L) === (("a\nz", 2L, 0L)))    // cross-doc repeat untouched
    assert(got(3L) === (("", 1L, 0L)))
    assert(got(4L) === (("x", 4L, 3L)))
    // map-only contract: no aggregate, no join, no exchange — the whole
    // op is per-row higher-order expressions
    val plan = res.queryExecution.optimizedPlan
    assert(plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      case r: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionOperation => r
    }.isEmpty, plan.toString)
  }

  test("removeRepeatedLines drops corpus-frequent lines, keeps order, " +
      "and keeps fully-boilerplate docs with empty text") {
    import spark.implicits._
    // "nav" appears in 3 docs (count 3 >= minCount), "body N" lines are
    // unique, doc 4 is ALL boilerplate, doc 5 repeats "nav" twice itself
    // (within-doc occurrences count toward the global total)
    val docs = Seq(
      (1L, "nav\nbody one\nbody two"),
      (2L, "body three\nnav"),
      (3L, "nav\nbody four"),
      (4L, "nav"),
      (5L, "promo\npromo\npromo")
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedLines(docs, "text", "doc_id",
        minCount = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    // "nav" count = 4 (docs 1,2,3,4), "promo" count = 3 (all in doc 5)
    assert(out(1L) === (("body one\nbody two", 3L, 1L)))
    assert(out(2L) === (("body three", 2L, 1L)))
    assert(out(3L) === (("body four", 2L, 1L)))
    assert(out(4L) === (("", 1L, 1L))) // survives, empty — not dropped
    assert(out(5L) === (("", 3L, 3L)))
    assert(out.size === 5)
  }

  test("removeRepeatedLines below minCount leaves docs untouched") {
    import spark.implicits._
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedLines(docs, "text", "doc_id",
        minCount = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a\nb")
    assert(out(2L) === "a\nc")
  }

  test("sourceOverlap counts shared distinct contents and Jaccard") {
    import spark.implicits._
    // srcA: {x, y, z}; srcB: {x, y, w}; srcC: {q} (no overlap rows);
    // duplicate rows of the same content within a source count ONCE
    val docs = Seq(
      (1L, "x", "srcA"), (2L, "y", "srcA"), (3L, "z", "srcA"),
      (4L, "x", "srcB"), (5L, "y", "srcB"), (6L, "w", "srcB"),
      (7L, "x", "srcB"), // within-source dup of content x
      (8L, "q", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs, "text", "doc_id", "source")
      .collect()
    assert(out.length === 1) // only the (srcA, srcB) pair overlaps
    val r = out.head
    assert(r.getString(0) === "srcA" && r.getString(1) === "srcB")
    assert(r.getLong(2) === 2L) // shared contents {x, y}
    assert(r.getLong(3) === 3L && r.getLong(4) === 3L)
    assert(r.getDouble(5) === 0.5) // 2 / (3 + 3 - 2)
  }

  test("exact duplicate pairs: star edges from the min id, singletons " +
      "emit nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text"), (5L, "same  TEXT"), (3L, "Same text"),
      (7L, "unique")).toDF("doc_id", "text")
    val pairs = Dedup.exactDuplicatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // group {1, 3, 5} (normalization folds case/whitespace) → star from 1
    assert(pairs === Set((1L, 3L), (1L, 5L)))
  }

  test("multi-signal dedup: chains across signals collapse to one " +
      "representative") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha body", 10L), (2L, "ALPHA body", 12L), // exact pair 1-2
      (3L, "beta body", 30L),                           // linked 2-3 below
      (4L, "gamma body", 40L)                           // untouched
    ).toDF("doc_id", "text", "n_chars")
    val exact = Dedup.exactDuplicatePairs(docs, "text", "doc_id")
    // a second signal (stand-in for embedding near-dup) links 2 and 3
    val emb = Seq((2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.multiSignalDedup(docs, Seq(exact, emb), "doc_id",
      col("n_chars")).collect().map(_.getLong(0)).toSet
    // {1,2,3} is ONE component (1-2 exact, 2-3 embedding): keep 3
    // (n_chars 30); 4 is a singleton and keeps itself
    assert(kept === Set(3L, 4L))
    // per-signal passes would NOT collapse the chain: the exact pass
    // alone keeps 1 (min id of {1,2}) and 3 — two surviving near-dups
    val exactOnly = Dedup.multiSignalDedup(docs, Seq(exact), "doc_id",
      col("n_chars")).collect().map(_.getLong(0)).toSet
    assert(exactOnly === Set(2L, 3L, 4L)) // 2 wins 1-2 on n_chars 12>10
  }

  test("multi-signal dedup equals keepBestPerComponent on the edge union") {
    val docs = docsWithDups
    val exact = Dedup.exactDuplicatePairs(docs, "text", "doc_id")
    val mh = Dedup.minhashLshPairs(docs, "text", "doc_id",
      shingleLen = 5, k = 64, bands = 16, threshold = 0.6,
      maxBucketSize = 1000)
      .select(col("id_a"), col("id_b"))
    val multi = Dedup.multiSignalDedup(docs, Seq(exact, mh), "doc_id",
      col("n_chars")).collect().map(_.getLong(0)).toSet
    val union = exact.select("id_a", "id_b")
      .unionByName(mh.select("id_a", "id_b"))
    val direct = Dedup.keepBestPerComponent(docs, union, "doc_id",
      col("n_chars")).collect().map(_.getLong(0)).toSet
    assert(multi === direct)
    assert(multi.size < docs.count()) // the planted dups really dropped
  }

  test("prefixJaccardPairs: EXACT — identical to the brute-force " +
      "all-pairs token Jaccard, boundary pairs included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),         // 10 tokens
      (2L, "a b c d e f g h i k"),         // 9/11 vs 1 ≈ 0.818
      (3L, "a b c d e f g h i j x"),       // 10/11 vs 1 ≈ 0.909
      (4L, "a b c d e f g h i j"),         // exact dup of 1 → 1.0
      (5L, "p q r s t u v w x2 y"),        // disjoint-ish
      (6L, "p q r s t u v w x2 z"))        // 9/11 vs 5
      .toDF("doc_id", "text")
    def brute(t: Double): Set[(Long, Long, Double)] = {
      val toks = docs.collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").toSet).toMap
      (for {
        a <- toks.keys; b <- toks.keys if a < b
        inter = (toks(a) & toks(b)).size.toDouble
        j = inter / (toks(a).size + toks(b).size - inter)
        jr = BigDecimal(j).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= t
      } yield (a, b, jr)).toSet
    }
    for (t <- Seq(0.5, 0.8, 0.818182, 0.9, 1.0)) {
      val got = Dedup.prefixJaccardPairs(docs, "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2))).toSet
      assert(got === brute(t), s"threshold $t")
    }
    // layout invariance
    val again = Dedup.prefixJaccardPairs(docs.repartition(4), "text",
        "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(again === brute(0.8))
  }

  test("bloom: no false negatives ever, false positives appear at a " +
      "tiny m, grid is bounded by m/64, params validated") {
    import spark.implicits._
    import graft.dedup.Bloom
    val seen = (0 until 200).map(i => s"key-$i").toDF("k")
    val grid = Bloom.build(seen, "k", m = 1L << 10, k = 5)
    val gridRows = grid.collect()
    assert(gridRows.length <= 16) // 1024 bits = 16 words max
    assert(gridRows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 16))
    // probe members + 800 non-members
    val probeKeys = ((0 until 200).map(i => (i.toLong, s"key-$i")) ++
      (0 until 800).map(i => (1000L + i, s"other-$i")))
      .toDF("id", "k")
    val got = Bloom.probe(probeKeys, "k", "id", grid,
        m = 1L << 10, k = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Boolean]("maybe_seen")).toMap
    // every true member hits — the structural no-false-negative bound
    (0 until 200).foreach(i => assert(got(i.toLong), s"FN at key-$i"))
    // at 200 keys × k=5 in 1024 bits the fill ratio is ~0.62 → FP rate
    // ~0.1: expect SOME false positives but far from all
    val fps = (0 until 800).count(i => got(1000L + i))
    assert(fps > 0, "expected false positives at this saturation")
    assert(fps < 600, s"FP count $fps implausibly high")
    // degenerate: empty filter rejects everything
    val empty = Bloom.build(seen.filter(lit(false)), "k", 1L << 10, 5)
    val none = Bloom.probe(probeKeys, "k", "id", empty, 1L << 10, 5)
      .filter(col("maybe_seen")).count()
    assert(none === 0L)
    intercept[IllegalArgumentException] {
      Bloom.build(seen, "k", m = 1000L, k = 5) // not a power of two
    }
  }

  test("bloom-prefiltered incremental dedup equals the plain probe; " +
      "an all-new batch never reads the index") {
    import spark.implicits._
    import graft.dedup.Dedup
    val dir = java.nio.file.Files.createTempDirectory("bloominc")
      .toString
    val idxPath = s"$dir/idx"; val bloomPath = s"$dir/bloom"
    val corpus = (0 until 120)
      .map(i => (i.toLong, s"indexed document number $i"))
      .toDF("doc_id", "text")
    Dedup.writeFingerprintIndex(corpus, "text", "doc_id", idxPath)
    Dedup.writeFingerprintBloom(spark, idxPath, bloomPath,
      m = 1L << 10, k = 5)
    // batch: 40 new docs + 10 copies of indexed content + 1 in-batch dup
    val batch = ((200 until 240)
      .map(i => (i.toLong, s"fresh content $i")) ++
      (0 until 10).map(i => (500L + i, s"indexed document number $i")) ++
      Seq((900L, "fresh content 200")))
      .toDF("doc_id", "text")
    val plain = Dedup.incrementalExactDedup(batch, "text", "doc_id",
      idxPath).select("doc_id").as[Long].collect().sorted
    val bloomed = Dedup.incrementalExactDedupBloom(batch, "text",
        "doc_id", idxPath, bloomPath, m = 1L << 10, k = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(bloomed.toSeq === plain.toSeq)
    assert(plain.length === 40) // copies dropped, in-batch dup dropped
    // all-new batch: maybe-set empty -> the index scan never appears
    // in the executed plan (the zero-overlap shortcut)
    val fresh = (300 until 320).map(i => (i.toLong, s"brand new $i"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedupBloom(fresh, "text", "doc_id",
      s"$dir/absent_index_is_never_touched", bloomPath,
      m = 1L << 10, k = 5)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ===
      (300L until 320L))
  }
}
