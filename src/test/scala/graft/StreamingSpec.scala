package graft

import graft.core.ColumnMap
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming operators driven through MemoryStream sources. */
class StreamingSpec extends SparkSuite {

  case class Obs(user_id: Long, ts: java.sql.Timestamp, value: Double,
      err: Double, event_type: String)

  val cm = ColumnMap(id = "user_id", time = "ts", flux = "value",
    err = "err", band = "event_type")

  def obs(id: Long, hour: Int, v: Double, b: String = "g"): Obs =
    Obs(id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"),
      v, 0.1, b)

  test("streaming binSources: tumbling windows with watermark") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Obs]
    val binned = Streaming.binSourcesStream(mem.toDF(), cm, "ts",
      windowDur = "6 hours", watermark = "1 hour")
    val q = binned.writeStream.format("memory").queryName("binned")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(obs(1, 0, 10.0), obs(1, 1, 20.0), obs(1, 7, 30.0))
      q.processAllAvailable()
      val rows = spark.table("binned").collect()
      // two windows for id 1: [00:00,06:00) avg 15, [06:00,12:00) avg 30
      val byWindow = rows.map(r => (
        r.getAs[org.apache.spark.sql.Row]("time_bin")
          .getAs[java.sql.Timestamp](0).toString,
        r.getAs[Double]("value"), r.getAs[Long]("bin_count"))).toSet
      assert(byWindow === Set(
        ("2024-01-01 00:00:00.0", 15.0, 2L),
        ("2024-01-01 06:00:00.0", 30.0, 1L)))
    } finally q.stop()
  }

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
  case class Fetch(doc_id: Long, ts: java.sql.Timestamp, url: String)
  case class Page(doc_id: Long, ts: java.sql.Timestamp, url: String,
      html: String)

  test("streaming exact dedup drops repeated content across batches") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val deduped = Streaming.streamingExactDedup(mem.toDF(), "text", "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, h: Int, t: String) =
        Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), t)
      mem.addData(doc(1, 0, "Hello  World"), doc(2, 1, "unique one"))
      q.processAllAvailable()
      // same normalized content → dropped; new content → kept
      mem.addData(doc(3, 2, "hello world"), doc(4, 3, "another"))
      q.processAllAvailable()
      val kept = spark.table("dedup").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streaming curation gate: redact + gate + sample, stateless") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val good = "the quick brown fox jumps over the lazy dog and runs on " +
      "through the field to the river and that is the whole story of it"
    val gated = Streaming.streamingCurationGate(mem.toDF(), "text",
      "doc_id", minQuality = 0.4, rates = Map.empty, defaultRate = 1.0)
    val q = gated.writeStream.format("memory").queryName("curation")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, h: Int, t: String) =
        Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), t)
      mem.addData(
        doc(1, 0, good + " mail me at fox@den.example.org"),
        doc(2, 1, "!!! ??? ### $$$ %%%"), // punctuation-bombed: gated out
        doc(3, 2, good))
      q.processAllAvailable()
      val out = spark.table("curation").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(out.keySet === Set(1L, 3L))
      // PII was redacted in-flight and the language was tagged
      assert(out(1L).endsWith("mail me at <PII>"))
      val langs = spark.table("curation").collect()
        .map(_.getString(3)).toSet
      assert(langs === Set("en"))
    } finally q.stop()
  }

  test("streaming augment gate: c4 + gopher + fim, stateless, batch-equal") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val good = "The quick brown fox jumps over the lazy dog and runs on " +
      "through the field to the river and that is the whole story of it."
    val gated = Streaming.streamingAugmentGate(mem.toDF(), "text",
      "doc_id", minWords = 10, fimRate = 1.0, seed = 7L)
    // stateless by construction: the streaming plan must carry no
    // stateful operator
    val q = gated.writeStream.format("memory").queryName("augment")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, h: Int, t: String) =
        Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), t)
      mem.addData(
        doc(1, 0, good),
        doc(2, 1, "no terminal punctuation so c4 keeps nothing"),
        doc(3, 2, good + "\nshort."))
      q.processAllAvailable()
      mem.addData(doc(4, 3, good))
      q.processAllAvailable()
      val out = spark.table("augment").collect()
        .map(r => r.getLong(0) -> r.getString(4)).toMap
      assert(out.keySet === Set(1L, 3L, 4L))
      out.values.foreach(t => assert(t.startsWith("<PRE>")))
      // replay-stable: the batch composition over the same docs yields
      // the identical FIM output (cuts key on ids, not arrival)
      val batch = graft.text.Chunking.fimTransform(
        graft.text.HeuristicFilters.gopherFilter(
          graft.text.HeuristicFilters.c4Clean(
            Seq((1L, good), (4L, good)).toDF("doc_id", "text"),
            minSentences = 1)
            .filter(col("keep"))
            .select(col("doc_id"), col("clean_text").as("text")),
          minWords = 10, passthrough = Seq("text"))
          .filter(col("keep")).select(col("doc_id"), col("text")),
        rate = 1.0, seed = 7L).collect()
        .map(r => r.getLong(0) -> r.getString(4)).toMap
      assert(batch(1L) === out(1L) && batch(4L) === out(4L))
    } finally q.stop()
  }

  test("streaming near-dup dedup: one-band LSH keys fold normalization " +
      "variants, tiny docs fall back to exact fingerprints") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val long = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet field toward the river"
    val out = Streaming.streamingNearDupDedup(mem.toDF(), "text", "ts")
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, t: String) =
        Doc(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t)
      mem.addData(doc(1, long), doc(3, "entirely different content " +
        "about storage engines and columnar formats in databases"),
        doc(4, "hi"))
      q.processAllAvailable()
      // second micro-batch: a CASE/WHITESPACE variant normalizes to the
      // identical shingle set → identical band key → dropped by state;
      // a tiny exact duplicate drops via the fingerprint fallback; a
      // different tiny doc survives
      mem.addData(doc(2, "  " + long.toUpperCase + "  "),
        doc(5, "hi"), doc(6, "yo"))
      q.processAllAvailable()
      val ids = spark.table("neardup").collect()
        .map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L, 4L, 6L))
    } finally q.stop()
  }

  test("streaming near-dup dedup: multi-band (bands=2) survival is " +
      "bit-identical to the greedy fold over the same band keys, and " +
      "a band-1-only collision drops a doc one band misses") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val bandRows = 1 // r=1 bands: band key = one minhash row — makes
    // partial-signature collisions (band 1 hits, band 0 doesn't)
    // reachable with a small deterministic corpus
    val bands = 2
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa quebec romeo"
    // 16 deterministic variants at MODERATE (~0.5) Jaccard to base:
    // half shared words, half unique — so r=1 band keys split (some
    // rows hit, some miss) instead of all colliding at band 0
    val texts = (0 until 16).map(i => base + " " +
      (0 until 14).map(j => s"unique$i${('a' + j).toChar}$j")
        .mkString(" "))
    // batch-side band keys via the SAME kernels the stream uses
    val sigRows = spark.createDataFrame(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.dedup.Dedup.minhashSignature(
        graft.functions.HashExpressions.shingleHashes(
          graft.text.TextAnalysis.normalizeText(col("text")), 5,
          graft.functions.HashExpressions.ModeXx),
        bands * bandRows).as("sig"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toIndexedSeq).toMap
    def key(id: Long, b: Int): String =
      s"b$b:" + sigRows(id).slice(b * bandRows, (b + 1) * bandRows)
        .mkString(",")
    // the greedy fold twin: arrival order, drop at the FIRST band whose
    // key a prior SURVIVOR-OF-EARLIER-BANDS inserted; stage i state is
    // fed by docs that passed stages < i (exactly the chained
    // dropDuplicatesWithinWatermark semantics)
    val seen = Array.fill(bands)(
      scala.collection.mutable.Set.empty[String])
    val expected = texts.indices.map(_.toLong).filter { id =>
      var kept = true
      var b = 0
      while (kept && b < bands) {
        if (!seen(b).add(key(id, b))) kept = false
        b += 1
      }
      kept
    }.toSet
    // the corpus must actually exercise the multi-band recall: some doc
    // must collide at band 1 having PASSED band 0 (else bands=1 would
    // give the same answer and the test pins nothing new)
    val oneBandSeen = scala.collection.mutable.Set.empty[String]
    val oneBandKept = texts.indices.map(_.toLong)
      .filter(id => oneBandSeen.add(key(id, 0))).toSet
    assert(expected !== oneBandKept,
      s"corpus never collides at band 1 only — adjust variants\n" +
        texts.indices.map(i => s"$i: ${key(i, 0)} | ${key(i, 1)}")
          .mkString("\n"))
    val mem = MemoryStream[Doc]
    val out = Streaming.streamingNearDupDedup(mem.toDF(), "text", "ts",
      shingleLen = 5, bandRows = bandRows, bands = bands)
    val q = out.writeStream.format("memory").queryName("neardup2")
      .outputMode(OutputMode.Append).start()
    try {
      // one micro-batch per doc: arrival order IS the fold order
      texts.zipWithIndex.foreach { case (t, i) =>
        mem.addData(Doc(i.toLong,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t))
        q.processAllAvailable()
      }
      val ids = spark.table("neardup2").collect()
        .map(_.getLong(0)).toSet
      assert(ids === expected,
        s"stream=$ids fold=$expected oneBand=$oneBandKept")
    } finally q.stop()
  }

  test("streaming robots gate: stateless stream-static join, verdicts " +
      "bit-identical to the batch robotsGate") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val robots = Seq(
      ("h.com", "User-agent: *\nDisallow: /p/1*\nAllow: /p/12$\n"),
      ("w.org", "User-agent: graftbot\nDisallow: /\n" +
        "\nUser-agent: *\nAllow: /\n"))
      .toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "https://h.com/p/12"),  // allow (longest match, $ exact)
      (2L, "https://h.com/p/13"),  // disallow /p/1*
      (3L, "https://h.com/q"),     // default allow (no match)
      (4L, "https://w.org/any"),   // graftbot group: disallow all
      (5L, "https://none.net/x"))  // no robots at all: allow
    val mem = MemoryStream[Fetch]
    val out = Streaming.streamingRobotsGate(mem.toDF(), robots, "url",
      agent = "graftbot", keepDisallowed = true)
    // stateless: no state store in the physical plan description
    val q = out.writeStream.format("memory").queryName("robots_gate")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(urls.map { case (i, u) =>
        Fetch(i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u) }: _*)
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        "expected no stateful operators")
      val got = spark.table("robots_gate").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("allowed"),
            Option(r.getAs[String]("rule_pattern")).orNull))).toMap
      val batch = graft.text.UrlOps.robotsGate(
          urls.toDF("doc_id", "url"), robots, "url", "doc_id",
          agent = "graftbot").collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(3), Option(r.getString(5)).orNull))).toMap
      assert(got === batch)
      assert(got(1L) === ((true, "/p/12$")) && got(2L)._1 === false &&
        got(3L) === ((true, null)) && got(4L)._1 === false &&
        got(5L) === ((true, null)))
      // the default gate drops disallowed fetches
      assert(Streaming.streamingRobotsGate(
        urls.toDF("doc_id", "url"), robots, "url",
        agent = "graftbot").count() === 3)
    } finally q.stop()
  }

  test("streaming follow edges: meta-nofollow pages and nofollow links " +
      "drop live; stateless; batch-twin bit-identical") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val follow = "<html><body>" +
      "<a href=\"/keep\">kept edge</a>" +
      "<a href=\"/spam\" rel=\"sponsored\">paid edge</a></body></html>"
    val gated = "<html><head><meta name=robots content=nofollow></head>" +
      "<body><a href=\"/never\">blocked page edge</a></body></html>"
    val pages = Seq(
      (1L, "https://a.example/p", follow),
      (2L, "https://b.example/q", gated))
    val mem = MemoryStream[Page]
    val out = Streaming.streamingFollowEdges(mem.toDF(), "html", "url")
    val q = out.writeStream.format("memory").queryName("follow_edges")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(pages.map { case (i, u, h) =>
        Page(i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u, h)
      }: _*)
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        "expected no stateful operators")
      val got = spark.table("follow_edges").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("link_url"),
          r.getAs[String]("anchor_text")))
      val batch = Streaming.streamingFollowEdges(
          pages.toDF("doc_id", "url", "html"), "html", "url")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("link_url"),
          r.getAs[String]("anchor_text")))
      assert(got.toSet === batch.toSet)
      assert(got.toSeq === Seq(
        (1L, "https://a.example/keep", "kept edge")))
    } finally q.stop()
  }

  test("streaming anchor-term index: one-window batch equality with " +
      "anchorTermIndex; watermark-bounded state; closed windows final") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val h1 = "<html><body><a href=\"/t\">Great Product</a>" +
      "<a href=\"/t\" rel=nofollow>paid product</a>" +
      "<a href=\"/other\">great</a></body></html>"
    val h2 = "<html><body><a href=\"https://a.example/t\">great</a>" +
      "</body></html>"
    val pages = Seq(
      (1L, "https://a.example/p1", h1),
      (2L, "https://a.example/p2", h2))
    val mem = MemoryStream[Page]
    val out = Streaming.streamingAnchorTermIndex(mem.toDF(), "html",
      "url", "ts", windowDur = "1 hour", watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("anchor_idx")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(pages.map { case (i, u, h) =>
        Page(i, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), u, h)
      }: _*)
      q.processAllAvailable()
      // a later-window event advances the watermark past 01:00 so the
      // first window closes and emits (Append = once, final)
      mem.addData(Page(3L,
        java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
        "https://a.example/p3", h2))
      q.processAllAvailable()
      val got = spark.table("anchor_idx").collect()
        .map(r => (r.getAs[String]("target_url"),
          r.getAs[String]("term"), r.getAs[Long]("n_refs")))
      val batch = graft.text.UrlOps.anchorTermIndex(
          pages.toDF("doc_id", "url", "html"), "html", "url")
        .collect()
        .map(r => (r.getAs[String]("target_url"),
          r.getAs[String]("term"), r.getAs[Long]("n_refs")))
      assert(got.toSet === batch.toSet)
      // nofollow edge dropped; both /t anchors (one relative, one
      // absolute) canonicalize to the same target and their terms merge
      assert(got.toSet === Set(
        ("https://a.example/t", "great", 2L),
        ("https://a.example/t", "product", 1L),
        ("https://a.example/other", "great", 1L)))
      // state is rows-per-open-window-cell, not corpus-lifetime: after
      // the first window closed, only the 03:00 window's single cell
      // remains in the store
      val prog = q.lastProgress.stateOperators
      assert(prog.nonEmpty && prog.head.numRowsTotal === 1L,
        s"state rows ${prog.map(_.numRowsTotal).toSeq}")
    } finally q.stop()
  }

  test("streaming crawl schedule: one-batch frontier equals the batch " +
      "operator; positions continue across micro-batches; O(hosts) state") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2.5\n"),
      ("b.org", "User-agent: *\nDisallow: /x\n")) // no delay -> default
      .toDF("host", "robots_txt")
    val urls = Seq(
      (3L, "https://a.com/p3"), (1L, "https://a.com/p1"),
      (2L, "https://b.org/q"), (4L, "https://b.org/r"))
    val mem = MemoryStream[Fetch]
    val out = Streaming.streamingCrawlSchedule(mem.toDF(), robots, "url",
      "doc_id", defaultDelay = 1.5)
    val q = out.writeStream.format("memory").queryName("crawl_sched")
      .outputMode(OutputMode.Append).start()
    try {
      def fetch(i: Long, u: String) =
        Fetch(i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), u)
      // batch 1: the whole frontier in ONE micro-batch -> within-batch
      // id-asc ordering equals the batch operator's (no priority) order
      mem.addData(urls.map { case (i, u) => fetch(i, u) }: _*)
      q.processAllAvailable()
      def snap(): Map[Long, (String, Long, Double, Double)] =
        spark.table("crawl_sched").collect()
          .map(r => r.getAs[Long]("id") ->
            ((r.getAs[String]("host"), r.getAs[Long]("position"),
              r.getAs[Double]("crawl_delay"),
              r.getAs[Double]("fetch_at_s")))).toMap
      val got = snap()
      val batch = graft.text.UrlOps.crawlSchedule(
          urls.toDF("doc_id", "url"), robots, "url", "doc_id",
          defaultDelay = 1.5).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))).toMap
      assert(got === batch)
      assert(got(1L) === (("a.com", 1L, 2.5, 0.0)) &&
        got(3L) === (("a.com", 2L, 2.5, 2.5)) &&
        got(4L) === (("b.org", 2L, 1.5, 1.5)))
      // batch 2: the per-host counters carry across micro-batches
      mem.addData(fetch(9L, "https://a.com/p9"),
        fetch(8L, "https://new.net/s"))
      q.processAllAvailable()
      val got2 = snap()
      assert(got2(9L) === (("a.com", 3L, 2.5, 5.0)))
      assert(got2(8L) === (("new.net", 1L, 1.5, 0.0)))
      // state is one counter per host, not per url
      val prog = q.lastProgress.stateOperators
      assert(prog.nonEmpty && prog.head.numRowsTotal === 3L,
        s"expected 3 host counters, got ${prog.headOption
          .map(_.numRowsTotal)}")
    } finally q.stop()
  }

  test("streaming html ingest: extraction is batch-equal, density gate " +
      "drops tag soup, stateless") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val page = "<html><body><p>Real prose content of a real page " +
      "with plenty of words.</p></body></html>"
    val soup = "<html>" + "<div a=\"b\"></div>" * 40 + "<p>x</p></html>"
    val out = Streaming.streamingHtmlIngest(mem.toDF(), "text",
      "doc_id", minDensity = 0.2)
    val q = out.writeStream.format("memory").queryName("htmlgate")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, t: String) =
        Doc(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t)
      mem.addData(doc(1, page), doc(2, soup))
      q.processAllAvailable()
      val rows = spark.table("htmlgate").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L)) // the tag soup fails the density gate
      // stream ≡ batch: the same regexp chain, same extracted text
      val batch = graft.text.HtmlExtract.extract(
          Seq((1L, page)).toDF("doc_id", "text"), "text")
        .collect()(0).getString(1)
      assert(rows(1L) === batch)
      assert(batch === "Real prose content of a real page with plenty " +
        "of words.")
    } finally q.stop()
  }

  test("streaming crawl-to-md: HTTP parse + 200/html gate + markdown, " +
      "stateless, batch-equal") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    def resp(status: String, ct: String, body: String) =
      s"HTTP/1.1 $status\r\nContent-Type: $ct\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n" + body
    val keep = resp("200 OK", "text/html; charset=utf-8",
      "<h1>Title</h1><p>Body with a <b>bold</b> word.</p>")
    val miss = resp("404 Not Found", "text/html", "<p>gone</p>")
    val plain = resp("200 OK", "text/plain", "not html")
    val out = Streaming.streamingCrawlToMd(mem.toDF(), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("crawl_md")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, t: String) =
        Doc(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t)
      mem.addData(doc(1, keep), doc(2, miss), doc(3, plain),
        doc(4, "not http at all"))
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        "expected no stateful operators")
      val rows = spark.table("crawl_md").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L))
      assert(rows(1L) === "# Title\n\nBody with a **bold** word.")
      // stream ≡ batch on the same payloads
      val batch = Streaming.streamingCrawlToMd(
          Seq((1L, keep), (2L, miss)).toDF("doc_id", "text"),
          "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(batch === rows)
    } finally q.stop()
  }

  test("streaming md-table cells: crawl-to-md piped into the pipe-table " +
      "extractor, stateless, batch-equal, escape round-trip") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val html = "<p>intro</p><table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>x|1</td><td>y</td></tr></table>"
    val keep = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      s"Content-Length: ${html.length}\r\n\r\n" + html
    val out = Streaming.streamingMdTableCells(mem.toDF(), "text",
      "doc_id")
    val q = out.writeStream.format("memory").queryName("md_cells")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Doc(1,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), keep))
      q.processAllAvailable()
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        "expected no stateful operators")
      val rows = spark.table("md_cells").collect()
        .map(r => (r.getAs[Int]("row_idx"), r.getAs[Int]("col_idx")) ->
          r.getAs[String]("cell")).toMap
      // the literal pipe survives the converter's \| escape and the
      // extractor's unescape — the full render/re-parse round trip
      assert(rows === Map((0, 0) -> "A", (0, 1) -> "B",
        (1, 0) -> "x|1", (1, 1) -> "y"))
      val batch = Streaming.streamingMdTableCells(
          Seq((1L, keep)).toDF("doc_id", "text"), "text", "doc_id")
        .collect()
        .map(r => (r.getAs[Int]("row_idx"), r.getAs[Int]("col_idx")) ->
          r.getAs[String]("cell")).toMap
      assert(batch === rows)
    } finally q.stop()
  }

  test("streaming contamination flag: bloom probe, no state, no misses") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val bench = docs.filter(col("doc_id") < 5)
    val bf = graft.dedup.Dedup.buildBenchGramBloom(bench, "text", n = 8,
      fpp = 1e-4)
    val benchText = bench.filter(col("doc_id") === 0)
      .collect()(0).getString(1)
    val mem = MemoryStream[Doc]
    val flagged = Streaming.streamingContaminationFlag(mem.toDF(), bf,
      "text", n = 8)
    val q = flagged.writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, t: String) =
        Doc(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t)
      mem.addData(
        doc(1, benchText + " tail edit"), // shares bench 8-grams: MUST flag
        doc(2, "totally unrelated words nothing shared here at all"),
        doc(3, null)) // NULL text: gram-less, cannot be contaminated
      q.processAllAvailable()
      val out = spark.table("contam").collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(out(1L)) // no false negatives, ever
      assert(!out(2L)) // short clean doc (<8 distinct grams hit nothing)
      // the one-sided contract says false is EXACT — a NULL-text row must
      // land false, not NULL (which would match neither routing predicate)
      assert(!out(3L))
    } finally q.stop()
  }

  test("streaming next-fit packing: fill state carries across batches") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    // single shard so the cross-batch fill is easy to assert; capacity 8
    val packed = Streaming.streamingNextFitPack(mem.toDF(), "text",
      "doc_id", capacity = 8L, shards = 1)
    val q = packed.writeStream.format("memory").queryName("packed")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, words: Int) =
        Doc(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          Seq.fill(words)("w").mkString(" "))
      mem.addData(doc(1, 5), doc(2, 2)) // seq 0: [5 @0, 2 @5] fill=7
      q.processAllAvailable()
      mem.addData(doc(3, 3), doc(4, 6)) // 3 overflows → seq 1: [3 @0];
      q.processAllAvailable()           // 6 overflows → seq 2: [6 @0]
      val got = spark.table("packed").collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      assert(got === Map(
        1L -> ((0L, 0L)), 2L -> ((0L, 5L)),
        3L -> ((1L, 0L)), 4L -> ((2L, 0L))))
      // the id column carries the caller's name, like batch packNextFit
      assert(packed.schema.fieldNames.head === "doc_id")
      assert(Streaming.streamingNextFitPack(mem.toDF().withColumnRenamed(
          "doc_id", "item_id"), "text", "item_id", 8L, 1)
        .schema.fieldNames.head === "item_id")
    } finally q.stop()
  }

  test("running lightcurve stats: incremental mean/variance across batches") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Obs]
    val stats = Streaming.runningLightcurveStats(mem.toDF(), cm)
    val q = stats.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(obs(1, 0, 10.0), obs(1, 1, 20.0))
      q.processAllAvailable()
      mem.addData(obs(1, 2, 30.0), obs(2, 0, 5.0))
      q.processAllAvailable()
      val rows = spark.table("running").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      // latest update for id 1: n=3, mean=20, var=100 (sample)
      val last1 = rows.filter(_._1 == 1L).maxBy(_._2)
      assert(last1._2 === 3L)
      assert(math.abs(last1._3 - 20.0) < 1e-12)
      assert(math.abs(last1._4 - 100.0) < 1e-12)
      val last2 = rows.filter(_._1 == 2L).maxBy(_._2)
      assert(last2._2 === 1L)
      assert(last2._4.isNaN) // variance undefined for n=1
    } finally q.stop()
  }

  test("streaming sessionize: gap-merged session windows across batches") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    def at(id: Long, hm: String, v: Double) =
      Obs(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"), v, 0.1, "g")
    val mem = MemoryStream[Obs]
    val sess = Streaming.streamingSessionize(mem.toDF(), "user_id", "ts",
      gap = "30 minutes", watermark = "1 hour")
    // session-window aggregation only supports Append on streams: a
    // session row is emitted once the watermark passes its end and it
    // can no longer grow
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // 00:00 and 00:10 merge (gap < 30m); 02:00 is separate and, at
      // watermark = 02:00 − 1h = 01:00, still open — only the first
      // session (end 00:40 < 01:00) is emitted
      mem.addData(at(1, "00:00", 1), at(1, "00:10", 2), at(1, "02:00", 3))
      q.processAllAvailable()
      def rows() = spark.table("sessions").collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3))).toSet
      // session end = last event + gap (session_window semantics)
      assert(rows() === Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:40:00.0", 2L)))
      // 05:00 advances the watermark to 04:00, closing the 02:00 session;
      // its own session stays open (unemitted)
      mem.addData(at(1, "05:00", 4))
      q.processAllAvailable()
      assert(rows() === Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:40:00.0", 2L),
        (1L, "2024-01-01 02:00:00.0", "2024-01-01 02:30:00.0", 1L)))
    } finally q.stop()
  }

  test("streaming IVF ingest: cell-partitioned index grows, stays queryable") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    import graft.similarity.Similarity
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val centroids = Similarity.trainCentroids(emb, k = 4, dim = 64)
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dir = java.nio.file.Files.createTempDirectory("ivf_stream")
    val idx = dir.resolve("idx").toString
    val ckpt = dir.resolve("ckpt").toString

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.streamingIvfIngest(
      mem.toDF().toDF("vec_id", "embedding"), centroids, idx, ckpt)
    try {
      mem.addData(rows.take(40).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(40).toSeq: _*) // index grows across batches
      q.processAllAvailable()
    } finally q.stop()

    val cells = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cells.length > 1, s"expected multiple cell dirs, got ${cells.toSeq}")
    // the streamed index answers the same queries as the batch-built one
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val streamed = Similarity.knnIvfIndexed(spark, idx, queries, k = 3,
      centroids, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val mem2 = Similarity.knnIvf(emb, queries, k = 3, centroids, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(streamed === mem2)
  }

  case class Tick(user_id: Long, event_id: Long, t: Double,
      event_type: String, value: Double)

  test("streaming as-of enrich: state carries across batches, tolerance " +
      "gates, intra-batch disorder sorted") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Tick]
    val enriched = Streaming.streamingAsofEnrich(mem.toDF(), "user_id",
      "t", "event_id", "value", isRef = col("event_type") === "purchase",
      tolerance = 2.0)
    val q = enriched.writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1, deliberately out of time order inside the batch: the
      // click at t=1.5 must still see the purchase at t=1.0
      mem.addData(
        Tick(7, 100, 1.5, "click", 0.0),
        Tick(7, 50, 1.0, "purchase", 10.0))
      q.processAllAvailable()
      // batch 2: state carried — click at t=2.5 matches the batch-1
      // purchase; click at t=9 is beyond tolerance 2.0 → nulls
      mem.addData(
        Tick(7, 101, 2.5, "click", 0.0),
        Tick(7, 102, 9.0, "click", 0.0))
      q.processAllAvailable()
      // batch 3: newer purchase replaces state; equal-time click matches
      // it inclusively; other key stays independent (no state → nulls)
      mem.addData(
        Tick(7, 60, 9.5, "purchase", 20.0),
        Tick(7, 103, 9.5, "click", 0.0),
        Tick(8, 104, 1.0, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof").collect()
        .map(r => r.getLong(1) ->
          ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))))
        .toMap
      assert(got(100L) === ((Some(1.0), Some(50L), Some(10.0))))
      assert(got(101L) === ((Some(1.0), Some(50L), Some(10.0))))
      assert(got(102L) === ((None, None, None)))
      assert(got(103L) === ((Some(9.5), Some(60L), Some(20.0))))
      assert(got(104L) === ((None, None, None)))
      // every query row emitted exactly once; refs never emitted
      assert(got.size === 5)
    } finally q.stop()
  }

  test("streaming funnel: step advances across batches, window gates, " +
      "intra-batch disorder sorted") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Tick]
    val fun = Streaming.streamingFunnel(mem.toDF(), "user_id", "t",
      "event_type", Seq("view", "click", "purchase"), window = 7.0)
    val q = fun.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1, out of order in the batch: view@1 then click@2 both
      // convert once sorted; the same-ts click@1 would NOT have (strict >)
      mem.addData(
        Tick(1, 11, 2.0, "click", 0.0),
        Tick(1, 10, 1.0, "view", 0.0),
        Tick(2, 20, 1.0, "view", 0.0))
      q.processAllAvailable()
      // batch 2: user 1 purchases in-window (step 3); user 2's click at
      // t=9 is outside view@1 + 7 → stalls at step 1
      mem.addData(
        Tick(1, 12, 3.0, "purchase", 0.0),
        Tick(2, 21, 9.0, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getDouble(3))).toSet
      assert(got === Set(
        (1L, 1, "view", 1.0), (1L, 2, "click", 2.0),
        (1L, 3, "purchase", 3.0), (2L, 1, "view", 1.0)))
    } finally q.stop()
  }

  test("streaming twins agree with the batch operators on random " +
      "in-order event sets") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val rng = new scala.util.Random(4242L)
    val types = Seq("view", "click", "purchase")
    val events = (1 to 400).map { i =>
      (rng.nextInt(20).toLong, i.toLong,
        rng.nextInt(40).toDouble / 2.0, types(rng.nextInt(3)))
    }
    val cols = Seq("user_id", "event_id", "t", "event_type")
    val df = events.toDF(cols: _*)

    // funnel: batch counts per step == streaming rows per step
    val batchFunnel = graft.operators.Funnel.funnel(df, "user_id", "t",
        "event_type", types, window = 7.0)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val memF = MemoryStream[(Long, Long, Double, String)]
    val qf = Streaming.streamingFunnel(memF.toDF().toDF(cols: _*),
        "user_id", "t",
        "event_type", types, window = 7.0)
      .writeStream.format("memory").queryName("tw_funnel")
      .outputMode(OutputMode.Append).start()
    try {
      memF.addData(events)
      qf.processAllAvailable()
      val streamFunnel = spark.table("tw_funnel").collect()
        .groupBy(_.getInt(1)).view.mapValues(_.length.toLong).toMap
      types.indices.foreach { i =>
        assert(streamFunnel.getOrElse(i + 1, 0L) === batchFunnel(i + 1),
          s"step ${i + 1}")
      }
    } finally qf.stop()

    // retention: batch (cohort, offset) counts == streaming emissions
    val batchRet = graft.operators.Retention.cohortRetention(df,
        "user_id", floor(col("t")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val memR = MemoryStream[(Long, Long, Double, String)]
    val qr = Streaming.streamingRetention(memR.toDF().toDF(cols: _*),
        "user_id", floor(col("t")))
      .writeStream.format("memory").queryName("tw_retention")
      .outputMode(OutputMode.Append).start()
    try {
      memR.addData(events)
      qr.processAllAvailable()
      val streamRet = spark.table("tw_retention").collect()
        .groupBy(r => (r.getLong(1), r.getLong(2)))
        .view.mapValues(_.length.toLong).toMap
      assert(streamRet === batchRet)
    } finally qr.stop()
  }

  test("streaming term counts: frequencies accumulate across batches") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val counts = Streaming.streamingTermCounts(mem.toDF(), "text")
    val q = counts.writeStream.format("memory").queryName("terms")
      .outputMode(OutputMode.Update).start()
    try {
      def doc(id: Long, t: String) =
        Doc(id, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), t)
      mem.addData(doc(1, "the cat"), doc(2, "the dog"))
      q.processAllAvailable()
      mem.addData(doc(3, "THE bird"))
      q.processAllAvailable()
      val got = spark.table("terms").collect()
        .groupBy(_.getString(0))
        .map { case (t, rs) => t -> rs.map(_.getLong(1)).max }
      assert(got("the") === 3L) // case-folded, carried across batches
      assert(got("cat") === 1L && got("bird") === 1L)
    } finally q.stop()
  }

  test("streaming retention: cohort pinned, one emission per new bucket, " +
      "late buckets dropped") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Tick]
    val ret = Streaming.streamingRetention(mem.toDF(), "user_id",
      col("t"))
    val q = ret.writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 active in buckets 3 and 4 (duplicate 3 ignored)
      mem.addData(Tick(1, 0, 3.0, "e", 0.0), Tick(1, 1, 3.0, "e", 0.0),
        Tick(1, 2, 4.0, "e", 0.0))
      q.processAllAvailable()
      // batch 2: bucket 6 is new (offset 3); bucket 4 repeats (dropped);
      // bucket 2 is LATE below the high-water mark (dropped); user 2
      // starts its own cohort at 5
      mem.addData(Tick(1, 3, 6.0, "e", 0.0), Tick(1, 4, 4.0, "e", 0.0),
        Tick(1, 5, 2.0, "e", 0.0), Tick(2, 6, 5.0, "e", 0.0))
      q.processAllAvailable()
      val got = spark.table("retention").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set(
        (1L, 3L, 0L), (1L, 3L, 1L), (1L, 3L, 3L), (2L, 5L, 0L)))
    } finally q.stop()
  }

  test("streaming exact-k sample: snapshots equal the batch operator " +
      "over everything arrived, order-independent") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val sample = Streaming.streamingStratifiedExactK(
      mem.toDF().withColumn("lang",
        when(col("doc_id") % 2 === 0, "en").otherwise("de")),
      "doc_id", "lang", k = 3, seed = 42L)
    val snapshots =
      scala.collection.mutable.Map[Long, Array[(String, Int, Long)]]()
    val q = sample.writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        snapshots.synchronized {
          snapshots(id) = df.collect()
            .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        }
      }.start()
    try {
      def doc(id: Long) = Doc(id,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), s"text $id")
      def expected(ids: Seq[Long]) = {
        val df = ids.map(i => (i, s"text $i")).toDF("doc_id", "text")
          .withColumn("lang",
            when(col("doc_id") % 2 === 0, "en").otherwise("de"))
        graft.operators.Sampling.stratifiedExactK(df, "doc_id", "lang",
            k = 3, seed = 42L)
          .collect()
          .map(r => (r.getAs[String]("stratum"), r.getAs[Int]("rank"),
            r.getAs[Long]("doc_id"))).toSet
      }
      val b1 = (1L to 10L)
      mem.addData(b1.map(doc): _*)
      q.processAllAvailable()
      assert(snapshots(0).toSet === expected(b1))
      // batch 2: more ids plus a RE-DELIVERY of id 4 — idempotent
      val b2 = (11L to 20L) :+ 4L
      mem.addData(b2.map(doc): _*)
      q.processAllAvailable()
      assert(snapshots(1).toSet === expected(b1 ++ b2))
      // O(k) state: every snapshot emits exactly k rows per stratum
      snapshots.values.foreach { snap =>
        snap.groupBy(_._1).values.foreach(g => assert(g.length === 3))
      }
    } finally q.stop()
  }

  test("streaming quality monitor: in-model windows score low CE, " +
      "drifted windows high, empty docs get the floor") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    // reference model: a tiny clean-corpus vocabulary
    val model = Map("the" -> 10L, "cat" -> 5L, "sat" -> 5L, "mat" -> 5L)
    val mon = Streaming.streamingQualityMonitor(mem.toDF(), "text", "ts",
      model, windowDur = "1 hour", watermark = "1 hour")
    val q = mon.writeStream.format("memory").queryName("qmon")
      .outputMode(OutputMode.Update).start()
    try {
      def doc(id: Long, hour: Int, t: String) = Doc(id,
        java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"), t)
      // window 0: in-distribution; window 1: OOD tokens; window 2: empty
      mem.addData(doc(1, 0, "the cat sat"), doc(2, 0, "the mat"),
        doc(3, 1, "zzzq xkcd qqqq"), doc(4, 2, ""))
      q.processAllAvailable()
      val rows = spark.table("qmon").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString.take(13),
          r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(rows.map(_._2).toSeq === Seq(2L, 1L, 1L))
      val Seq(w0, w1, w2) = rows.map(_._3).toSeq
      assert(w0 < w1, s"in-model CE $w0 should be below drifted $w1")
      // every OOD token scores the add-one floor, so the drifted window's
      // mean CE equals the empty-doc floor value exactly
      val n = model.values.sum; val v = model.size
      val floor = -math.log(1.0 / (n + v))
      assert(math.abs(w1 - floor) < 1e-12)
      assert(math.abs(w2 - floor) < 1e-12)
      // and the clean window replays the batch add-one formula by hand
      def p(t: String) = (model.getOrElse(t, 0L) + 1.0) / (n + v)
      val ce1 = -(math.log(p("the")) + math.log(p("cat")) +
        math.log(p("sat"))) / 3
      val ce2 = -(math.log(p("the")) + math.log(p("mat"))) / 2
      assert(math.abs(w0 - (ce1 + ce2) / 2) < 1e-12)
    } finally q.stop()
  }

  case class Scored(id: Long, ts: java.sql.Timestamp, s: Double)

  test("streaming CMS: running counters equal the batch sketch grid; " +
      "state bounded at depth x width") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    val cms = Streaming.streamingCms(mem.toDF(), "text", depth = 2,
      width = 8)
    val q = cms.writeStream.format("memory").queryName("cmsmon")
      .outputMode(OutputMode.Update).start()
    try {
      def doc(id: Long, t: String) = Doc(id,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), t)
      mem.addData(doc(1, "a a b"), doc(2, "b c"))
      q.processAllAvailable()
      mem.addData(doc(3, "a d d d"))
      q.processAllAvailable()
      // Update mode re-emits changed counters: keep the LATEST per key
      val latest = spark.table("cmsmon").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      // state bound: at most depth×width distinct counter keys
      assert(latest.size <= 16)
      // twin equality: the batch sketch over all the data so far
      val batch = Seq((1L, "a a b"), (2L, "b c"), (3L, "a d d d"))
        .toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.explode(
          graft.text.TextAnalysis.tokens(
            org.apache.spark.sql.functions.col("text"))).as("t"))
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array((0 until 2).map(d =>
            org.apache.spark.sql.functions.struct(
              org.apache.spark.sql.functions.lit(d).as("d"),
              graft.text.Indexing.cmsBucket(
                org.apache.spark.sql.functions.col("t"), d, 8)
                .as("b"))): _*)).as("db"))
        .groupBy("db.d", "db.b").count()
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(latest === batch)
      // every counter row sums tokens: total mass = depth × total tokens
      assert(latest.values.sum === 2L * 9L)
    } finally q.stop()
  }

  test("streaming PSI monitor: reference-shaped window scores 0, " +
      "shifted window crosses the action line — batch-twin exact") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Scored]
    // reference: one obs in each of bins 0,1,2,3 (scores .05/.15/.25/.35)
    val ref = Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)
    val mon = Streaming.streamingPsiMonitor(mem.toDF(), "s", "ts", ref,
      windowDur = "1 hour", watermark = "1 hour")
    val q = mon.writeStream.format("memory").queryName("psimon")
      .outputMode(OutputMode.Update).start()
    try {
      def at(id: Long, hour: Int, s: Double) = Scored(id,
        java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"), s)
      // window 0 replays the reference shape; window 1 is all-top-bin
      mem.addData(at(1, 0, 0.05), at(2, 0, 0.15), at(3, 0, 0.25),
        at(4, 0, 0.35),
        at(5, 1, 0.95), at(6, 1, 0.97), at(7, 1, 0.99))
      q.processAllAvailable()
      val rows = spark.table("psimon").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString.take(13),
          r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(rows.map(_._2).toSeq === Seq(4L, 3L))
      val Seq(w0, w1) = rows.map(_._3).toSeq
      assert(w0 === 0.0, s"reference-shaped window scored $w0")
      assert(w1 > 0.25, s"shifted window only $w1")
      // batch-twin exactness: the streaming window-1 PSI equals the
      // batch operator on the same data
      import org.apache.spark.sql.functions.col
      val batch = graft.text.Drift.populationStabilityIndex(
          Seq(0.05, 0.15, 0.25, 0.35).toDF("s"),
          Seq(0.95, 0.97, 0.99).toDF("s"), "s", bins = 10)
        .select(col("psi")).head().getDouble(0)
      assert(w1 === batch)
    } finally q.stop()
  }

  test("streaming URL dedup keys state on the CANONICAL url") {
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    import sqlc.implicits._
    val mem = MemoryStream[Doc]
    // Doc.text carries the url for this twin
    val deduped = Streaming.streamingUrlDedup(mem.toDF(), "text", "ts")
    val q = deduped.writeStream.format("memory").queryName("urldedup")
      .outputMode(OutputMode.Append).start()
    try {
      def doc(id: Long, h: Int, u: String) =
        Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), u)
      mem.addData(
        doc(1, 0, "https://E.com/a?utm_source=feed"),
        doc(2, 1, "https://other.org/x"))
      q.processAllAvailable()
      // tracking-variant + trailing-slash duplicates of doc 1 -> dropped
      mem.addData(
        doc(3, 2, "https://e.com/a/"),
        doc(4, 3, "HTTP://e.com/a"))  // different scheme -> kept
      q.processAllAvailable()
      val kept = spark.table("urldedup").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L))
      // batch-twin equality: same canonical keys survive
      val batch = graft.text.UrlOps.urlDedup(
        Seq((1L, "https://E.com/a?utm_source=feed"),
          (2L, "https://other.org/x"), (3L, "https://e.com/a/"),
          (4L, "HTTP://e.com/a")).toDF("doc_id", "url"),
        "url", "doc_id").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(batch === kept)
    } finally q.stop()
  }
}
