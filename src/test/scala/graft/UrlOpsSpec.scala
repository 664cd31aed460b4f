package graft

import org.apache.spark.sql.functions._

import graft.text.UrlOps

/** URL / domain curation layer: canonicalization, registered-domain
  * extraction, per-domain stats, blocklist filtering, URL-level dedup. */
class UrlOpsSpec extends SparkSuite {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.normalizeUrl(col("url")).as("n"))
      .as[String].collect().toSeq

  test("normalizeUrl: case, default port, tracking params, sort, fragment") {
    assert(norm("HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag")
      === Seq("http://example.com/a/b?a=1&b=2"))
    assert(norm("https://www.Example.co.uk:443/") ===
      Seq("https://www.example.co.uk/"))
  }

  test("normalizeUrl: schemeless, userinfo, trailing-dot host, bare host") {
    assert(norm("example.com/path/") === Seq("https://example.com/path"))
    assert(norm("https://user:pw@Host.org./x") === Seq("https://host.org/x"))
    assert(norm("https://example.com") === Seq("https://example.com/"))
  }

  test("normalizeUrl: tracking-only query collapses; non-default port kept") {
    assert(norm("https://example.com/?fbclid=abc&gclid=1") ===
      Seq("https://example.com/"))
    assert(norm("http://example.com:8080/x?ref=nav") ===
      Seq("http://example.com:8080/x"))
    // utm bare key (no =) and empty params are stripped too
    assert(norm("https://e.com/p?&utm_campaign&z=9&a=1") ===
      Seq("https://e.com/p?a=1&z=9"))
  }

  test("normalizeUrl is idempotent on its own output") {
    val raw = Seq(
      "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "example.com/path/", "https://user@h.org./", "https://e.com/p?a=1")
    val once = norm(raw: _*)
    assert(norm(once: _*) === once)
  }

  test("registeredDomain: eTLD+1 with multi-part suffixes") {
    val got = Seq("www.example.co.uk", "a.b.example.com", "example.com",
      "localhost", "news.bbc.co.uk", "x.com.au")
      .toDF("h").select(UrlOps.registeredDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got === Seq("example.co.uk", "example.com", "example.com",
      "localhost", "bbc.co.uk", "x.com.au"))
  }

  test("urlDedup keeps the min id per canonical URL and counts variants") {
    val docs = Seq(
      (1L, "https://E.com/a?utm_source=t"),
      (2L, "https://e.com/a/"),
      (3L, "https://e.com/b"),
      (4L, "HTTP://e.com:80/a")). // different scheme → different URL
      toDF("doc_id", "url")
    val kept = UrlOps.urlDedup(docs, "url", "doc_id")
      .select("doc_id", "norm_url", "n_variants")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(kept === Seq(
      (1L, "https://e.com/a", 2L),
      (3L, "https://e.com/b", 1L),
      (4L, "http://e.com/a", 1L)))
  }

  test("domainStats aggregates per registered domain") {
    val docs = Seq(
      (1L, "https://a.example.com/x", "one two three"),
      (2L, "https://b.example.com/y?utm_source=t", "four five"),
      (3L, "https://b.example.com/y", "six"), // same canonical URL as 2
      (4L, "https://other.co.uk/z", "seven eight nine ten")
    ).toDF("doc_id", "url", "text")
    val got = UrlOps.domainStats(docs, "url", "text")
      .select("domain", "n_docs", "n_urls", "total_tokens")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq(
      ("example.com", 3L, 2L, 6L),
      ("other.co.uk", 1L, 1L, 4L)))
  }

  test("filterBlockedDomains broadcast anti-joins on the registered domain") {
    val docs = Seq(
      (1L, "https://spam.example.com/x"),
      (2L, "https://fine.org/y")).toDF("doc_id", "url")
    val blocked = Seq("example.com").toDF("domain")
    val kept = UrlOps.filterBlockedDomains(docs, "url", blocked)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
    val plan = UrlOps.filterBlockedDomains(docs, "url", blocked)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("robots: RFC 9309 longest-match, allow wins ties, $ anchor, " +
      "mid-pattern literals, LIKE metacharacter escaping") {
    val robots = Seq(("h.com",
      "User-agent: *\n" +
        "Allow: /a\n" +          // len 2 — ties the next line
        "Disallow: /a\n" +       // allow wins the tie
        "Disallow: /a/b\n" +     // len 4 beats both where it matches
        "Disallow: /x$\n" +      // end-anchored
        "Disallow: /y_z%\n" +    // _ and % are LITERALS in robots
        "Disallow: /w*9$\n"))    // mid-* with end anchor
      .toDF("host", "robots_txt")
    def gate(path: String): (Boolean, String) = {
      val r = UrlOps.robotsGate(
        Seq((1L, s"https://h.com$path")).toDF("doc_id", "url"),
        robots, "url", "doc_id").collect()(0)
      (r.getBoolean(3), Option(r.getString(5)).orNull)
    }
    assert(gate("/a") === ((true, "/a")))        // tie -> allow
    assert(gate("/a/b") === ((false, "/a/b")))   // longer disallow wins
    assert(gate("/x") === ((false, "/x$")))
    // $ anchored /x$ doesn't match /xy, and '/a%' doesn't either:
    // winner is null -> allowed with null rule
    assert(gate("/xy") === ((true, null)))
    // '%' in the pattern is a literal octet, not a LIKE wildcard: a
    // target missing the literal '%' must not match...
    assert(gate("/y_zX") === ((true, null)))
    // ...while the literal (and any prefix extension of it) does:
    assert(gate("/y_z%") === ((false, "/y_z%")))
    assert(gate("/y_z%25") === ((false, "/y_z%")))
    assert(gate("/yQzX") === ((true, null)))     // _ is not any-char
    assert(gate("/w1239") === ((false, "/w*9$")))
    assert(gate("/w1239x") === ((true, null)))   // anchored $ stops it
  }

  test("robots: group selection — specific agent over *, rules before " +
      "any header dropped, unknown directives don't break groups, " +
      "multi-agent headers, no-robots default-allow") {
    val robots = Seq(
      ("s.com",
        "Disallow: /orphan\n" + // before any header: dropped
          "User-agent: OtherBot\nUser-agent: GRAFTBOT\n" + // multi-UA
          "Crawl-delay: 10\n" + // unknown directive: ignored
          "Disallow: /private\n" +
          "User-agent: *\nDisallow: /\n"),
      ("w.com", "User-agent: *\nDisallow: /blocked\n"))
      .toDF("host", "robots_txt")
    val docs = Seq(
      (1L, "https://s.com/orphan"),   // orphan rule dropped -> allowed
      (2L, "https://s.com/private"),  // graftbot group -> disallowed
      (3L, "https://s.com/other"),    // * group NOT used (specific won)
      (4L, "https://w.com/blocked"),  // wildcard group applies
      (5L, "https://w.com/fine"),
      (6L, "https://nothing.example/p")) // no robots row at all
      .toDF("doc_id", "url")
    val out = UrlOps.robotsGate(docs, robots, "url", "doc_id",
        agent = "graftbot").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true, 6L -> true))
  }

  test("crawl-delay + schedule: group-resolved delays, conservative " +
      "min, default fill, per-host positions and fetch times") {
    val robots = Seq(
      ("a.com", "User-agent: bot\nCrawl-delay: 10\n" +
        "\nUser-agent: *\nCrawl-delay: 0.5\n"), // specific group wins
      ("b.org", "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 2\n"),
      ("c.net", "User-agent: *\nCrawl-delay: oops\n"), // unparsable
      ("d.io", "User-agent: *\nDisallow: /x\n"))       // absent
      .toDF("host", "robots_txt")
    val delays = UrlOps.crawlDelays(robots, agent = "bot").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(delays === Map("a.com" -> 10.0, "b.org" -> 2.0))
    val urls = Seq(
      (3L, "https://a.com/p3"), (1L, "https://a.com/p1"),
      (2L, "https://b.org/q"), (4L, "https://d.io/r"))
      .toDF("doc_id", "url")
    val sched = UrlOps.crawlSchedule(urls, robots, "url", "doc_id",
        agent = "bot", defaultDelay = 1.5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(sched(1L) === ((1L, 10.0, 0.0)))   // a.com queue: id order
    assert(sched(3L) === ((2L, 10.0, 10.0)))
    assert(sched(2L) === ((1L, 2.0, 0.0)))
    assert(sched(4L) === ((1L, 1.5, 0.0)))    // default delay
    // priority reorders within the host queue
    val pri = UrlOps.crawlSchedule(
        urls.withColumn("p", col("doc_id").cast("double")),
        robots, "url", "doc_id", priorityCol = Some("p"),
        agent = "bot").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pri(3L) === 1L && pri(1L) === 2L) // higher priority first
  }

  test("crawlSchedule: two-phase rank equals the single-window rank " +
      "on a Zipf-skewed fixture (one host holds ~half the URLs)") {
    // 501 URLs on mega.com + 250 spread over 50 small hosts; ids
    // shuffled so range buckets don't trivially coincide with id order
    val urls = spark.range(751).selectExpr(
      "(id * 2654435761) % 751 AS doc_id",
      """CASE WHEN id < 501 THEN 'https://mega.com/p/' || id
         ELSE 'https://h' || (id % 50) || '.org/p/' || id END AS url""")
    val robots = Seq(("mega.com", "User-agent: *\nCrawl-delay: 2\n"))
      .toDF("host", "robots_txt")
    val got = graft.text.UrlOps.crawlSchedule(
        urls, robots, "url", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(x => (x._2, x._1))
    // reference: the plain per-host window rank, computed inline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("doc_id"))
    val ref = urls
      .withColumn("host", graft.text.UrlOps.host(col("url")))
      .withColumn("crawl_delay",
        when(col("host") === "mega.com", 2.0).otherwise(1.0))
      .withColumn("position", row_number().over(w).cast("long"))
      .withColumn("fetch_at_s",
        round((col("position") - 1) * col("crawl_delay"), 6))
      .select("doc_id", "host", "position", "crawl_delay", "fetch_at_s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(x => (x._2, x._1))
    assert(got.length === 751)
    assert(got.toSeq === ref.toSeq)
  }

  test("crawlSchedule: two-phase rank matches the window rank with a " +
      "priority column carrying heavy ties") {
    // priorities take only 3 values -> ties break on doc_id asc; the
    // range buckets must respect (priority DESC, doc_id ASC)
    val urls = spark.range(300).selectExpr(
      "id AS doc_id",
      "'https://tied.com/p/' || id AS url",
      "(id % 3)::double AS pri")
    val robots = Seq(("x.invalid", "User-agent: *\n"))
      .toDF("host", "robots_txt")
    val got = graft.text.UrlOps.crawlSchedule(urls, robots, "url",
        "doc_id", priorityCol = Some("pri"))
      .select("doc_id", "position").as[(Long, Long)]
      .collect().sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit("tied.com")).orderBy(col("pri").desc,
        col("doc_id").asc)
    val ref = urls.withColumn("position", row_number().over(w)
        .cast("long"))
      .select("doc_id", "position").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === ref.toSeq)
  }

  test("sitemap index parse: child sitemaps with lastmod, loc-less " +
      "blocks drop, url blocks ignored, entity decode") {
    val xml = "<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc> https://a.com/sm/0.xml </loc>" +
      "<lastmod>2024-03-01</lastmod></sitemap>" +
      "<sitemap><loc>https://a.com/sm/1.xml?a=1&amp;b=2</loc></sitemap>" +
      "<sitemap><lastmod>2024-01-01</lastmod></sitemap>" + // no loc
      "<url><loc>https://a.com/page</loc></url>" +         // not index
      "</sitemapindex>"
    val out = graft.text.UrlOps.parseSitemapIndex(
        Seq(("a.com", xml)).toDF("host", "sitemap_xml")).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).orNull)).sortBy(_._2)
    assert(out.toSeq === Seq(
      ("a.com", "https://a.com/sm/0.xml", "2024-03-01"),
      ("a.com", "https://a.com/sm/1.xml?a=1&b=2", null)))
  }

  test("recrawlPriority: periods per changefreq, never pins 0, unknown " +
      "lastmod means due, staleness caps at 2, priority defaults 0.5") {
    val rows = Seq(
      // (lastmod, changefreq, priority)
      ("2024-03-14", "daily", Some(1.0)),   // age 1 / period 1 -> 1.0
      ("2024-03-08", "weekly", Some(1.0)),  // age 7 / 7 -> 1.0
      ("2024-01-01", "daily", Some(1.0)),   // ancient -> capped 2.0
      ("2024-03-14", "never", Some(1.0)),   // never -> 0
      (null, "daily", Some(1.0)),           // unknown lastmod -> 1.0
      ("garbage", "daily", Some(1.0)),      // junk parses null -> 1.0
      ("2024-03-14", null, None),           // default period 7, pri 0.5
      ("2024-03-14", "HOURLY", Some(0.5)))  // case-insensitive, cap 2
      .map { case (l, c, p) => (l, c, p.map(Double.box).orNull) }
      .toDF("lastmod", "cf", "pri")
    val got = rows.select(graft.text.UrlOps.recrawlPriority(
        col("lastmod"), col("cf"), col("pri"), "2024-03-15").as("s"))
      .as[Double].collect().toSeq
    // row 7: age 1 / default period 7 = 0.142857…, × default pri 0.5
    // = 0.0714285… → round6 0.071429
    assert(got === Seq(1.0, 1.0, 2.0, 0.0, 1.0, 1.0, 0.071429, 1.0))
  }

  test("robotsSitemaps: global directives, case-insensitive key, " +
      "comments and relative values drop, several per file") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /x\n" +
        "Sitemap: https://a.com/s1.xml\n" +  // inside a group: still kept
        "SITEMAP: https://a.com/s2.xml \n" + // cased key, padded value
        "# Sitemap: https://a.com/no.xml\n" + // comment: drops
        "Sitemap: relative/no.xml\n"),        // relative: drops
      ("b.org", "User-agent: *\nAllow: /\n")) // no directive: no rows
      .toDF("host", "robots_txt")
    val got = graft.text.UrlOps.robotsSitemaps(robots).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._2)
    assert(got.toSeq === Seq(
      ("a.com", "https://a.com/s1.xml"),
      ("a.com", "https://a.com/s2.xml")))
  }

  test("sitemap parse: entity decode order, loc-less blocks drop, " +
      "malformed priority nulls, index blocks ignored") {
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>" +
      "<lastmod>2024-02-03</lastmod><priority>0.8</priority></url>" +
      // &amp;lt; must decode to the literal '&lt;', NOT to '<'
      "<url><loc>https://a.com/q?s=&amp;lt;tag&amp;gt;</loc>" +
      "<priority>high</priority></url>" + // malformed priority -> null
      "<url><lastmod>2024-01-01</lastmod></url>" + // no loc: drops
      "<sitemap><loc>https://a.com/child.xml</loc></sitemap>" + // index
      "</urlset>"
    val out = UrlOps.parseSitemap(
        Seq(("a.com", xml)).toDF("host", "sitemap_xml")).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(out.size === 2)
    val p = out("https://a.com/p?x=1&y=2")
    assert(p.getString(2) === "2024-02-03" && p.getDouble(4) === 0.8)
    val q = out("https://a.com/q?s=&lt;tag&gt;")
    assert(q.isNullAt(2) && q.isNullAt(4))
  }

  test("extractLinks: RFC 3986 reference resolution, scheme carry, " +
      "base-directory join, drops and entity decode") {
    val html = "<a href=\"https://abs.example/x#f\">a</a>" + // absolute
      "<A HREF='//proto.example/y'>b</A>" +        // protocol-relative
      "<a href=\"/root?q=1&amp;r=2\">c</a>" +      // root + entities
      "<a href=\"rel/child\">d</a>" +              // directory-relative
      "<a href=\"#top\">e</a>" +                   // fragment-only: drop
      "<a href=\"mailto:x@y\">f</a>" +             // scheme drops
      "<a href=\"javascript:void(0)\">g</a>"
    def links(pageUrl: String): Map[String, (String, Boolean)] =
      UrlOps.extractLinks(
        Seq((1L, pageUrl, html)).toDF("doc_id", "url", "page_html"),
        "page_html", "url").collect()
        .map(r => r.getAs[String]("href") ->
          ((r.getAs[String]("link_url"), r.getAs[Boolean]("internal"))))
        .toMap
    val l1 = links("HTTP://Host.Example:80/dir/page.html")
    assert(l1.size === 4)
    assert(l1("https://abs.example/x#f") ===
      (("https://abs.example/x", false)))       // fragment stripped
    assert(l1("//proto.example/y") ===
      (("http://proto.example/y", false)))      // page scheme carried
    assert(l1("/root?q=1&amp;r=2") ===
      (("http://host.example/root?q=1&r=2", true))) // decoded, rooted
    assert(l1("rel/child") ===
      (("http://host.example/dir/rel/child", true))) // base dir join
    // schemeless page defaults to https; trailing-slash base dir
    val l2 = links("host.example/dir/sub/")
    assert(l2("rel/child")._1 === "https://host.example/dir/sub/rel/child")
    assert(l2("//proto.example/y")._1 === "https://proto.example/y")
  }

  test("extractLinks: HTML5 unquoted attribute values — whitespace " +
      "around =, > termination, quoted values with spaces intact") {
    val html = "<a href=/about>a</a>" +            // unquoted, > ends it
      "<a href = rel/doc>b</a>" +                  // spaces around =
      "<a href=https://u.example/x class=q>c</a>" + // space ends value
      "<a href=\"/spaced path/x\">d</a>" +         // quoted keeps space
      "<a href=>e</a>"                             // empty unquoted: drop
    val got = graft.text.UrlOps.extractLinks(
        Seq((1L, "https://h.example/dir/page", html))
          .toDF("doc_id", "url", "page_html"),
        "page_html", "url").collect()
      .map(r => r.getAs[String]("href") -> r.getAs[String]("link_url"))
      .toMap
    assert(got === Map(
      "/about" -> "https://h.example/about",
      "rel/doc" -> "https://h.example/dir/rel/doc",
      "https://u.example/x" -> "https://u.example/x",
      "/spaced path/x" -> "https://h.example/spaced path/x"))
  }

  test("extractAnchors: anchor text (nested tags, entities, whitespace), " +
      "rel nofollow/ugc/sponsored, resolution parity with extractLinks") {
    val html =
      "<a href=\"https://ext.example/e#f\" rel=\"NoFollow\">Spon " +
        "<b>sored</b>\n link</a>" +
      "<a rel='ugc x' href='/u/1'>user &amp; content</a>" +
      "<a href=/about rel=me>About&nbsp;Us</a>" +
      "<a href=\"sub/p\"><img src=\"x.png\"/></a>" +
      "<a href=\"//cdn.example/l\" rel=\"noopener noreferrer\">cdn</a>" +
      "<a href=\"mailto:x@y\">m</a>" +
      "<a>no href</a>" +
      "<a href=\"/unclosed\">tail with no close tag"
    val got = UrlOps.extractAnchors(
        Seq((1L, "https://h.example/dir/page", html))
          .toDF("doc_id", "url", "page_html"), "page_html", "url")
      .collect()
      .map(r => r.getAs[String]("href") ->
        ((r.getAs[String]("link_url"), r.getAs[Boolean]("nofollow"),
          r.getAs[String]("rel"), r.getAs[String]("anchor_text"))))
      .toMap
    // mailto, no-href and the unclosed trailing anchor drop
    assert(got.keySet === Set("https://ext.example/e#f", "/u/1",
      "/about", "sub/p", "//cdn.example/l"))
    assert(got("https://ext.example/e#f") === (("https://ext.example/e",
      true, "nofollow", "Spon sored link"))) // case-folded rel; ws collapse
    assert(got("/u/1") ===
      (("https://h.example/u/1", true, "ugc x", "user & content")))
    assert(got("/about") ===
      (("https://h.example/about", false, "me", "About Us")))
    assert(got("sub/p") ===
      (("https://h.example/dir/sub/p", false, "", ""))) // img-only anchor
    assert(got("//cdn.example/l") ===
      (("https://cdn.example/l", false, "noopener noreferrer", "cdn")))
  }

  test("attrValue walk: quoted-value contents can't match; duplicate " +
      "attr keeps the first; quote-adjacent attrs tokenize") {
    // `href=evil` INSIDE another attribute's quoted value must not win
    // over the real href, with or without a real href present
    // (judge finding, r10)
    val html =
      "<a data-x=\"see href=evil\" href=\"/real\">a</a>" +
        "<a title='do rel=nofollow here' href=\"/clean\">b</a>" +
        "<a data-x=\"only href=evil here\">c</a>" +
        "<a href=\"/first\" href=\"/second\">dup</a>" +
        "<a class=\"x\"href=/tight>tight</a>"
    val got = UrlOps.extractAnchors(
        Seq((1L, "https://h.example/", html))
          .toDF("doc_id", "url", "page_html"), "page_html", "url")
      .collect()
      .map(r => r.getAs[String]("anchor_text") ->
        ((r.getAs[String]("href"), r.getAs[Boolean]("nofollow"))))
      .toMap
    assert(got.keySet === Set("a", "b", "dup", "tight")) // c drops: no href
    assert(got("a") === (("/real", false)))
    assert(got("b") === (("/clean", false))) // quoted rel= text ignored
    assert(got("dup") === (("/first", false)))
    assert(got("tight") === (("/tight", false)))
    // same surface for the robots meta gate: a quoted payload naming
    // name=robots/content=noindex is data, not directives
    val d = Seq("<meta data-x='name=robots content=noindex' " +
        "name=viewport content=w>").toDF("h")
      .select(UrlOps.metaRobotsDirectives(col("h"))).head().getString(0)
    assert(d === "")
  }

  test("metaRobots: directives across metas, either attribute order, " +
      "unquoted/cased values, non-robots metas ignored") {
    def flags(html: String): (String, Boolean, Boolean) = {
      val r = Seq(html).toDF("h").select(
        UrlOps.metaRobotsDirectives(col("h")).as("d"),
        UrlOps.metaNoindex(col("h")).as("ni"),
        UrlOps.metaNofollow(col("h")).as("nf")).head()
      (r.getString(0), r.getBoolean(1), r.getBoolean(2))
    }
    assert(flags("<head><meta name=\"robots\" " +
      "content=\"noindex, nofollow\"></head>") ===
      (("noindex, nofollow", true, true)))
    // NONE implies both; uppercase attr names, single quotes, unquoted value
    assert(flags("<META NAME='ROBOTS' CONTENT=none>") ===
      (("none", true, true)))
    // content before name; only nofollow
    assert(flags("<meta content=\"nofollow\" name=robots />") ===
      (("nofollow", false, true)))
    // two robots metas join; most-restrictive union
    assert(flags("<meta name=robots content=noindex>" +
      "<meta name=robots content=nofollow>") ===
      (("noindex,nofollow", true, true)))
    // non-robots metas and substring tokens don't trigger
    assert(flags("<meta name=\"viewport\" content=\"noindex\">" +
      "<meta name=robots content=\"nofollowx,all\">") ===
      (("nofollowx,all", false, false)))
    assert(flags("<p>no metas</p>") === (("", false, false)))
  }

  test("bitextUrlPairs: language-segment pairing on the normalized key; " +
      "region suffixes, per-(key,lang) min-id dedup, no-lang drops") {
    val urls = Seq(
      (1L, "https://Site.example/en/about?utm_source=x"),
      (2L, "https://site.example/fr/about"),
      (3L, "https://site.example/de/about"),
      (4L, "https://site.example/en/about#frag"), // dup (key, en): id 1 wins
      (5L, "https://site.example/en-GB/about"),   // region suffix = own lang
      (6L, "https://site.example/docs/about"),    // not a lang segment
      (7L, "https://other.example/en/p"))         // lone lang: no pair
      .toDF("doc_id", "url")
    val got = UrlOps.bitextUrlPairs(urls, "url", "doc_id")
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(5), r.getLong(6)))).toMap
    // pairs among {en(id1), de, fr, en-gb} on the same key; doc 6/7 out
    assert(got.size === 6)
    assert(got(("en", "fr")) === ((1L, 2L))) // min-id rep for en
    assert(got(("de", "en")) === ((3L, 1L)))
    assert(got(("de", "fr")) === ((3L, 2L)))
    assert(got(("en", "en-gb")) === ((1L, 5L)))
    val keys = UrlOps.bitextUrlPairs(urls, "url", "doc_id")
      .select("pair_key").distinct().collect().map(_.getString(0))
    assert(keys === Array("https://site.example/{lang}/about"))
  }

  test("anchorTermIndex: per-target lowercased term counts over follow " +
      "edges; nofollow and empty anchors drop; targets canonicalize") {
    val pages = Seq(
      (1L, "https://a.example/p",
        "<a href=\"https://T.example:443/doc/\">Great Guide</a>" +
        "<a href=\"https://t.example/doc?utm_source=x\">guide</a>" +
        "<a href=\"/other\" rel=nofollow>spam words</a>" +
        "<a href=\"/img\"><img src=\"i.png\"/></a>"),
      (2L, "https://b.example/q",
        "<a href=\"https://t.example/doc#frag\">GREAT   guide</a>"))
      .toDF("doc_id", "url", "page_html")
    val got = UrlOps.anchorTermIndex(pages, "page_html", "url")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // T.example:443 and t.example?utm and #frag all canonicalize to
    // the same target; counts pool across pages
    assert(got === Map(
      ("https://t.example/doc", "great") -> 2L,
      ("https://t.example/doc", "guide") -> 3L))
  }

  test("domainCap keeps top-N per registered domain by score, ties to min id") {
    val docs = Seq(
      (1L, "https://a.com/1", 10.0), (2L, "https://a.com/2", 30.0),
      (3L, "https://www.a.com/3", 20.0), (4L, "https://a.com/4", 30.0),
      (5L, "https://b.org/1", 1.0))
      .toDF("doc_id", "url", "q")
    val kept = graft.text.UrlOps.domainCap(docs, "url", "doc_id",
        col("q"), maxPerDomain = 2)
      .select("doc_id").as[Long].collect().toSet
    // a.com (incl www subdomain): scores 30(id2), 30(id4), 20, 10 -> {2, 4}
    assert(kept === Set(2L, 4L, 5L))
  }
}
