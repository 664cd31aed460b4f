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
