package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation layer for web-crawl corpora.
  *
  * Web-scale training sets are keyed by URL long before they are keyed by
  * content: the first dedup any crawl pipeline runs is URL-level (the same
  * page is fetched through infinite tracking-parameter variants), and the
  * first quality gate is domain-level (blocklists, per-domain caps,
  * per-domain quality stats). The reference engine has no web layer, so
  * this module is beyond-parity surface built the same way as the rest of
  * the text package: pure Catalyst expressions (regexp + higher-order
  * array functions), no UDFs, map-only until the single domain-keyed
  * aggregate.
  *
  * Canonicalization rules (deliberately deterministic + oracle-replayable,
  * the common subset of the crawl-industry canonicalizers):
  *   - missing scheme → assume `https://`
  *   - scheme and host lowercased; trailing dot on host dropped;
  *     `userinfo@` dropped
  *   - default ports dropped (`:80` for http, `:443` for https)
  *   - empty path → `/`; trailing slashes trimmed on non-root paths
  *   - fragment dropped
  *   - tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
  *     mc_eid, igshid, ref); surviving query params sorted
  *     lexicographically
  *
  * Design note (100 TB): normalization, host and registered-domain
  * extraction are per-row scalar expressions — embarrassingly parallel,
  * zero shuffle, codegen-friendly. `urlDedup` and `domainStats` shuffle
  * once on the url/domain key with map-side partial aggregation; the
  * blocklist filter is a broadcast anti-join (real blocklists run to a
  * few million rows — still broadcastable; past that, the same call with
  * the hint removed becomes a shuffle join, no code change).
  */
object UrlOps {

  /** One regex splits the URL into (scheme, authority, path, query):
    * `^(scheme)://(authority)(path)(?:\?(query))?(?:#fragment)?$`.
    * RE2-portable (non-capturing groups only, no backrefs) so the DuckDB
    * oracle runs the identical pattern. */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Keys stripped by [[normalizeUrl]] — the ubiquitous click-tracking
    * parameters that multiply one page into thousands of crawl URLs. */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)(=|$)"

  /** `url` with a scheme guaranteed — schemeless crawl entries (host/path
    * fragments out of link extractors) are read as https. */
  private def withScheme(url: Column): Column = {
    val t = trim(url)
    when(t.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), t)
      .otherwise(concat(lit("https://"), t))
  }

  /** Lowercased host of `url` (userinfo and port stripped, trailing dot
    * dropped). Empty string when the URL does not parse. */
  def host(url: Column): Column = {
    val auth = regexp_extract(withScheme(url), UrlRe, 2)
    // strip userinfo, then port, then trailing dot
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth), "^[^@]*@", ""),
        ":[0-9]*$", ""),
      "\\.$", "")
  }

  /** Canonical form of `url` under the header's rule set. Pure scalar
    * expression tree — safe to call per-row at any scale. */
  def normalizeUrl(url: Column): Column = {
    val u = withScheme(url)
    val scheme = lower(regexp_extract(u, UrlRe, 1))
    val h = host(url)
    val port = regexp_extract(
      regexp_replace(regexp_extract(u, UrlRe, 2), "^[^@]*@", ""),
      ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val rawPath = regexp_extract(u, UrlRe, 3)
    val path = when(regexp_replace(rawPath, "/+$", "") === "",
      lit("/")).otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(u, UrlRe, 4)
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"),
        p => (p =!= "") && !p.rlike(TrackingParamRe))), "&")
    val queryPart =
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept))
    concat(scheme, lit("://"), h, portPart, path, queryPart)
  }

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * deliberately small, pinned subset of the public-suffix list (the
    * full list is data, not code: load it as a table and join when
    * fidelity matters; this built-in set keeps the common ccTLD pairs
    * from collapsing to the wrong level). */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "co.nz")

  /** eTLD+1 ("registered domain") of a host: the last two labels, or the
    * last three when the last two form a recognized multi-part suffix.
    * The grouping key for every domain-level curation decision. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n <= 2, hostCol)
      .otherwise(when(last2.isin(MultiPartSuffixes: _*), last3)
        .otherwise(last2))
  }

  /** Per-registered-domain corpus profile: document count, distinct
    * canonical URLs, total whitespace tokens, mean characters (rounded so
    * the cross-engine hash is stable). One shuffle on the domain key with
    * map-side partials; output is |domains| rows. */
  def domainStats(docs: DataFrame, urlCol: String, textCol: String)
      : DataFrame = {
    docs
      .withColumn("__norm", normalizeUrl(col(urlCol)))
      .withColumn("__domain", registeredDomain(host(col(urlCol))))
      .groupBy(col("__domain").as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__norm")).as("n_urls"),
        sum(TextAnalysis.wsTokenCount(col(textCol)).cast("long"))
          .as("total_tokens"),
        round(avg(length(col(textCol))), 6).as("avg_chars"))
  }

  /** Drop documents whose registered domain appears in `blocked` (one
    * column `domain`). Broadcast anti-join: the probe side never moves. */
  def filterBlockedDomains(docs: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val flagged = docs.withColumn("__domain",
      registeredDomain(host(col(urlCol))))
    flagged.join(broadcast(blocked.select(col("domain").as("__domain"))),
        Seq("__domain"), "left_anti")
      .drop("__domain")
  }

  /** Per-domain document cap — the RefinedWeb/FineWeb anti-spam policy:
    * keep at most `maxPerDomain` documents per registered domain, best
    * `score` first (ties to the lowest id). A single over-represented
    * domain (a link farm, a wiki mirror) otherwise dominates its
    * language's mixture.
    *
    * Scale: the bounded-heap top-k aggregate per domain — map-side
    * partials cap the exchange at partitions·k rows per domain, where a
    * rank window would shuffle EVERY row of the biggest domain into one
    * task. Kept ids semi-join back against the unmodified input. */
  def domainCap(docs: DataFrame, urlCol: String, idCol: String,
      score: Column, maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0,
      s"maxPerDomain must be positive, got $maxPerDomain")
    val keep = docs
      .withColumn("__domain", registeredDomain(host(col(urlCol))))
      .groupBy("__domain")
      .agg(graft.functions.TopKExpressions
        .topKByScore(score, col(idCol), maxPerDomain).as("__top"))
      .select(explode(col("__top")).as("__kept"))
      .select(col("__kept.neighbor_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** URL-level dedup: one representative (minimum `idCol`) per canonical
    * URL. The groupBy-min + semi-join shape instead of a window — the
    * aggregate gets map-side partials and AQE skew handling, and no
    * single task ever holds a whole URL group. */
  def urlDedup(docs: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val withNorm = docs.withColumn("norm_url", normalizeUrl(col(urlCol)))
    val keep = withNorm.groupBy("norm_url")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))
    withNorm.join(keep, Seq("norm_url", idCol))
  }

  /** Raw request target a robots rule matches against: path + optional
    * `?query` (fragment dropped, empty path → "/"). Robots matching is
    * on the RAW path, not the canonical form — `/p/1?a=1` and `/p/1`
    * are different match targets. */
  private[graft] def requestTarget(url: Column): Column = {
    val u = withScheme(url)
    val rawPath = regexp_extract(u, UrlRe, 3)
    val rawQ = regexp_extract(u, UrlRe, 4)
    concat(when(rawPath === "", lit("/")).otherwise(rawPath),
      when(rawQ === "", lit("")).otherwise(concat(lit("?"), rawQ)))
  }

  /** robots.txt (RFC 9309) parsed into an agent-resolved rule table:
    * one row per effective Allow/Disallow rule — (host, rule_type
    * ['allow'|'disallow'], pattern [as written], plen [octets, the
    * longest-match specificity], like_pat [the pattern compiled to a
    * SQL LIKE expression with `!` escape — `*` → `%`, a trailing `$`
    * anchors the end, everything else literal; LIKE is full-string so
    * the start anchor is implicit]).
    *
    * Group semantics per the RFC: consecutive `User-agent` lines form
    * a group header; `Allow`/`Disallow` lines that follow belong to
    * every named agent until the next header. The table keeps the
    * rules of the group(s) naming `agent` (case-insensitive product
    * token match) when any exist for a host, else the `*` group(s) —
    * the RFC's most-specific-group rule at the exact/wildcard
    * granularity. Comments (`#…`) strip first; unknown directives and
    * blank lines neither terminate groups nor become rules; rules
    * before any header have no group and drop; EMPTY patterns drop
    * (`Disallow:` = nothing disallowed). Keys are case-insensitive.
    *
    * Why LIKE and not regex: the wildcard grammar (`*`, final `$`)
    * compiles exactly to LIKE-with-escape, which both Spark and DuckDB
    * evaluate with identical semantics — no regex-dialect risk in the
    * oracle (the q_robots_gate oracle hand-derives decisions per
    * fixture template instead of replaying this parse — an independent
    * second implementation).
    *
    * Scale: robots.txt is per-host bounded (crawlers cap it at 500 KB);
    * the only window partitions by host over its OWN lines. One row
    * per rule comes out — a host-keyed dimension table for
    * [[robotsGate]]'s join. */
  /** Shared robots.txt group machinery: relevant lines with their
    * group ids, semi-joined to the group(s) the RFC resolves for
    * `agent` — the substrate of [[parseRobots]] and [[crawlDelays]]. */
  private def chosenGroupLines(robots: DataFrame, hostCol: String,
      txtCol: String, agent: String): DataFrame = {
    require(agent.nonEmpty, "agent must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("__i"))
    val kv = robots
      .select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(txtCol), lit("")), "\n"))
          .as(Seq("__i", "__raw")))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*$", "")))
      .filter(col("__line") =!= "")
      .withColumn("__key",
        lower(trim(substring_index(col("__line"), ":", 1))))
      .withColumn("__val",
        trim(expr("substring(__line, instr(__line, ':') + 1)")))
      .filter(col("__key").isin("user-agent", "allow", "disallow",
        "crawl-delay") && col("__line").contains(":"))
    val grouped = kv
      .withColumn("__isUa", col("__key") === "user-agent")
      .withColumn("__newGrp", (col("__isUa") &&
        !coalesce(lag(col("__isUa"), 1).over(w), lit(false))).cast("long"))
      .withColumn("__grp", sum(col("__newGrp")).over(w))
      .filter(col("__grp") > 0) // rules before any header: no group
    val groups = grouped.groupBy(col("host"), col("__grp"))
      .agg(
        max(when(col("__isUa") &&
          lower(col("__val")) === agent.toLowerCase, 1L)
          .otherwise(0L)).as("__agentHit"),
        max(when(col("__isUa") && col("__val") === "*", 1L)
          .otherwise(0L)).as("__wild"))
    val hostSpecific = groups.groupBy(col("host"))
      .agg(max(col("__agentHit")).as("__hasSpecific"))
    val chosen = groups.join(hostSpecific, Seq("host"))
      .filter(when(col("__hasSpecific") === 1L, col("__agentHit") === 1L)
        .otherwise(col("__wild") === 1L))
      .select(col("host"), col("__grp"))
    grouped.join(chosen, Seq("host", "__grp"), "left_semi")
  }

  def parseRobots(robots: DataFrame, hostCol: String = "host",
      txtCol: String = "robots_txt",
      agent: String = "*"): DataFrame = {
    val grouped = chosenGroupLines(robots, hostCol, txtCol, agent)
    val endAnchor = col("pattern").endsWith("$")
    val body = when(endAnchor,
        expr("substring(pattern, 1, length(pattern) - 1)"))
      .otherwise(col("pattern"))
    // LIKE compile: escape ! % _ first, then * -> % (never re-escaped)
    val esc = regexp_replace(regexp_replace(regexp_replace(body,
      "!", "!!"), "%", "!%"), "_", "!_")
    val likeBody = regexp_replace(esc, "\\*", "%")
    grouped
      .filter(col("__key").isin("allow", "disallow") &&
        col("__val") =!= "")
      .select(col("host"), col("__key").as("rule_type"),
        col("__val").as("pattern"))
      .withColumn("plen", length(col("pattern")).cast("long"))
      .withColumn("like_pat",
        concat(likeBody, when(endAnchor, lit("")).otherwise(lit("%"))))
  }

  /** Effective `Crawl-delay` (seconds) per host for `agent` — the
    * de-facto politeness directive (not in RFC 9309 but honored by
    * most commercial crawlers), resolved through the same group
    * selection as [[parseRobots]]; when a chosen group states several,
    * the MINIMUM wins (the conservative reading); unparsable values
    * drop. Returns (host, crawl_delay: double) — hosts without a
    * directive are simply absent (callers coalesce to their default,
    * see [[crawlSchedule]]). */
  def crawlDelays(robots: DataFrame, hostCol: String = "host",
      txtCol: String = "robots_txt", agent: String = "*"): DataFrame =
    chosenGroupLines(robots, hostCol, txtCol, agent)
      .filter(col("__key") === "crawl-delay")
      // try_cast: a malformed delay drops instead of failing the job
      // under ANSI mode
      .withColumn("__d", expr("try_cast(__val AS double)"))
      .filter(col("__d").isNotNull && col("__d") >= 0)
      .groupBy(col("host"))
      .agg(min(col("__d")).as("crawl_delay"))

  /** `Sitemap:` directives of a robots.txt column — the DISCOVERY step
    * the sitemaps.org protocol actually specifies: crawlers find a
    * host's sitemaps (leaf urlsets OR index files) from robots.txt,
    * then fetch and parse them ([[parseSitemapIndex]] /
    * [[parseSitemap]]). One row per directive — (host, sitemap_url).
    * Per the protocol the directive is GLOBAL (not group-scoped, so no
    * agent resolution), its value is an absolute URL, keys are
    * case-insensitive, comments strip first, and files may declare
    * several. Values that don't parse as absolute URLs drop (relative
    * values are undefined by the protocol). Map-only posexplode +
    * filters — the [[parseSitemap]] posture, no windows, no state. */
  def robotsSitemaps(robots: DataFrame, hostCol: String = "host",
      txtCol: String = "robots_txt"): DataFrame =
    robots
      .select(col(hostCol).as("host"),
        explode(split(coalesce(col(txtCol), lit("")), "\n")).as("__raw"))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*$", "")))
      .filter(col("__line").contains(":") &&
        lower(trim(substring_index(col("__line"), ":", 1))) === "sitemap")
      .withColumn("sitemap_url",
        trim(expr("substring(__line, instr(__line, ':') + 1)")))
      .filter(col("sitemap_url").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"))
      .select(col("host"), col("sitemap_url"))

  /** Outgoing links of an HTML column, RESOLVED against the page URL —
    * the crawl-graph EDGE EXTRACTOR: compose with
    * [[graft.graph.GraphRank.pageRankByKey]] over
    * `registeredDomain(host(...))` of both ends for the host-rank
    * quality prior END TO END from raw pages. One row per `<a href>`
    * per page: (…input id/url…, href [as written], link_url [resolved
    * absolute, fragment stripped], internal [same host as the page]).
    *
    * Resolution (RFC 3986 reference cases, map-only when/concat):
    * absolute `scheme://…` as-is; protocol-relative `//h/p` takes the
    * page scheme; root-relative `/p` takes scheme://host; other
    * relative paths join the page's base directory (WITHOUT
    * dot-segment normalization — `..` survives verbatim, the same
    * boundary [[normalizeUrl]] draws; canonicalize downstream).
    * Fragment-only, `javascript:`, `mailto:`, `tel:` and `data:` hrefs
    * drop — they are not fetchable edges. Entity-decoded (`&amp;` in
    * query strings) before resolution. Attribute values may be
    * double-quoted, single-quoted, or HTML5-legal UNQUOTED
    * (`href=/about`, terminated by whitespace or `>`) — real
    * CommonCrawl HTML is full of unquoted values, and skipping them
    * drops real crawl-graph edges. */
  def extractLinks(docs: DataFrame, htmlCol: String,
      urlCol: String): DataFrame = {
    // ONE capture group (RE2-portable): quoted arms keep their quotes
    // so the alternation stays single-group; de-quoting is the exact
    // substring(2, len-2) below (the regexp guarantees both quotes)
    val hrefs = regexp_extract_all(col(htmlCol),
      lit("(?is)<a[^>]*\\shref\\s*=\\s*" +
        "(\"[^\"]*\"|'[^']*'|[^\\s>\"'][^\\s>]*)"), lit(1))
    val deq = when(
      col("__href_q").startsWith("\"") || col("__href_q").startsWith("'"),
      expr("substring(__href_q, 2, length(__href_q) - 2)"))
      .otherwise(col("__href_q"))
    val raw = trim(xmlUnescape(col("__href_raw")))
    // fragment strip with ONE reference to __h (r14 codegen-size fix:
    // the former contains/substring/instr form referenced __h three
    // times, and filter pushdown + project collapse INLINE the whole
    // upstream unescape chain once per reference — multiplicatively):
    // prefix before the first '#', which is __h itself when no '#'.
    val noFrag = element_at(split(col("__h"), "#", 2), 1)
    // Page-level URL constants ONCE PER PAGE, BEFORE the link explode
    // (r14): resolveHref(h, pageUrl) inlines withScheme/host/baseDir
    // regexp chains of the PAGE url into every per-link expression —
    // per exploded row that re-ran the same per-page regexps ~8x, and
    // the fused chain under the link Generate codegen'd past the JVM's
    // 64 KB method limit, silently falling back to interpreted
    // execution on every q_crawl_frontier pass (ERROR CodeGenerator
    // "Code grows beyond 64 KB" in the r13/r14 bench logs). The
    // formulas below are resolveHref's, verbatim, over the
    // precomputed page columns — value-identical (oracle-checked).
    val base = withScheme(col(urlCol))
    val basePath = regexp_extract(base, UrlRe, 3)
    val h2 = col("__h2")
    val resolved =
      when(h2.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h2)
        .when(h2.startsWith("//"),
          concat(col("__pscheme"), lit(":"), h2))
        .when(h2.startsWith("/"),
          concat(col("__pscheme"), lit("://"), col("__phost"), h2))
        .otherwise(concat(col("__pscheme"), lit("://"), col("__phost"),
          col("__pdir"), h2))
    // `internal` WITHOUT re-deriving host(resolveHref(...)): on the
    // page-relative branches resolveHref's authority is host(urlCol)
    // by construction, so the host comparison is identically TRUE for
    // a non-null page URL — only the two absolute arms need a real
    // host extraction, and those see the raw href, not the resolved
    // chain. (host() ignores the scheme VALUE — it only locates the
    // authority — so the protocol-relative arm can use a fixed "x:"
    // prefix where resolveHref splices the page scheme.)
    val internal =
      when(h2.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        host(h2) === col("__phost"))
      .when(h2.startsWith("//"),
        host(concat(lit("x:"), h2)) === col("__phost"))
      .otherwise(when(col(urlCol).isNotNull, lit(true)))
    docs
      .withColumn("__pscheme", lower(regexp_extract(base, UrlRe, 1)))
      .withColumn("__phost", host(col(urlCol)))
      .withColumn("__pdir", when(basePath.contains("/"),
          regexp_replace(basePath, "/[^/]*$", "/"))
        .otherwise(lit("/")))
      .withColumn("__href_q", explode(hrefs))
      .withColumn("__href_raw", deq)
      // `__h` and `__h2` ride as 1-ELEMENT-EXPLODE OUTPUTS, not derived
      // columns (r14 codegen-size fix): generator outputs are plan
      // ATTRIBUTES, so downstream filters/projections reference a
      // variable instead of re-inlining the whole unescape chain —
      // filter pushdown + project collapse otherwise duplicated the
      // chain once per reference, multiplicatively (the fused stage
      // codegen'd a ~1 MB class whose consume method blew the JVM's
      // 64 KB limit and fell back to interpreted execution on every
      // q_crawl_frontier pass). explode(array(x)) is exactly one
      // output row per input row — never empty, null x included — so
      // the row set is unchanged (oracle-checked).
      .withColumn("__h", explode(array(raw)))
      // ONE __h reference: the former `=!= "" && !startsWith("#")`
      // arms are subsumed by the `__h2 =!= ""` filter below — an empty
      // or fragment-only href yields an empty pre-# prefix — so only
      // the scheme blacklist needs the raw string. Kept set identical.
      .filter(!lower(col("__h"))
        .rlike("^(javascript|mailto|tel|data):"))
      .withColumn("__h2", explode(array(noFrag)))
      .filter(col("__h2") =!= "")
      .withColumn("href", col("__href_raw"))
      .withColumn("link_url", resolved)
      .withColumn("internal", internal)
      .drop("__href_q", "__href_raw", "__h", "__h2", "__pscheme",
        "__phost", "__pdir", htmlCol)
  }

  /** RFC 3986 reference resolution of a cleaned href (trimmed,
    * entity-decoded, fragment already stripped) against the page URL —
    * the shared kernel of [[extractLinks]] and [[extractAnchors]]:
    * absolute as-is, `//h/p` takes the page scheme, `/p` takes
    * scheme://host, anything else joins the page's base directory
    * (dot-segments survive verbatim — [[normalizeUrl]]'s boundary). */
  private def resolveHref(h: Column, pageUrl: Column): Column = {
    val base = withScheme(pageUrl)
    val scheme = lower(regexp_extract(base, UrlRe, 1))
    val pageHost = host(pageUrl)
    val basePath = regexp_extract(base, UrlRe, 3)
    // base directory: path up to (and incl.) the last '/', else '/'
    val baseDir = when(basePath.contains("/"),
        regexp_replace(basePath, "/[^/]*$", "/"))
      .otherwise(lit("/"))
    when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"),
        concat(scheme, lit("://"), pageHost, h))
      .otherwise(concat(scheme, lit("://"), pageHost, baseDir, h))
  }

  /** One attribute's value out of an open-tag string, found by WALKING
    * the attribute list from the tag start (the HTML5 tokenizer's
    * order) rather than grepping for `name=` anywhere a quote or space
    * precedes it: a quoted value that happens to CONTAIN `name=` can no
    * longer match, so `<a data-x="see href=evil" href="/real">` yields
    * `/real`, and a quoted value containing `rel=nofollow` no longer
    * marks the edge. The lazy other-attribute loop stops at the FIRST
    * occurrence of the target (browser duplicate-attribute semantics,
    * and parity with the old regexp_extract). Attributes separate on
    * whitespace or directly on a closing quote (`class="x"href=/y` —
    * sloppy but common crawl HTML). Values are double-quoted,
    * single-quoted, or HTML5-legal unquoted, dequoted here. Empty
    * string when the attribute is absent or the list cannot be
    * tokenized from the tag start (regexp_extract's no-match value —
    * callers treat absent and empty alike: both mean "no usable
    * value"). */
  private def attrValue(openTag: Column, name: String): Column = {
    val quoted = "\"[^\"]*\"|'[^']*'"
    val anyVal = quoted + "|[^\\s>\"'][^\\s>]*"
    // Each skipped attribute consumes its OWN separation from what
    // follows instead of a lookbehind asserting it: a quoted value is
    // self-delimiting (trailing whitespace optional, so
    // `class="x"href=/y` still tokenizes), while a bare attribute or
    // an unquoted value must end in whitespace. No lookbehind keeps
    // the whole walk RE2-portable (the module's contract).
    val otherQ = "[^\\s>=]+\\s*=\\s*(?:" + quoted + ")\\s*"
    val otherU = "[^\\s>=]+(?:\\s*=\\s*[^\\s>\"'][^\\s>]*)?\\s+"
    val v = regexp_extract(openTag,
      "(?is)^<[a-z][^\\s>]*\\s+(?:" + otherQ + "|" + otherU + ")*?" +
        name + "\\s*=\\s*(" + anyVal + ")", 1)
    when(v.startsWith("\"") || v.startsWith("'"),
      v.substr(lit(2), length(v) - 2)).otherwise(v)
  }

  /** HTML entity decode for visible text — the [[HtmlExtract]] set
    * (`&nbsp;`/`&#39;` on top of the XML five) with `&amp;` LAST, the
    * same anti-double-decode ordering as [[xmlUnescape]]. */
  private def htmlEntityDecode(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(c, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&")

  /** Anchor ELEMENTS of an HTML column — the link-graph edge extractor
    * with the two signals [[extractLinks]] drops: the ANCHOR TEXT (the
    * classic relevance label for the TARGET page — search engines and
    * query-document training sets are built from it) and the `rel`
    * link-level crawl directive (rel="nofollow"/"ugc"/"sponsored" mark
    * edges a polite crawler must not follow and a rank pass must not
    * credit). One row per `<a …>…</a>` element pair (an unclosed `<a>`
    * has no inner text and drops — the extractLinks boundary for
    * malformed pages): input columns (minus `htmlCol`) plus
    * href [as written], link_url [RFC 3986-resolved, fragment
    * stripped], internal, rel [lowercased, as written], nofollow
    * [rel's space-separated token list contains nofollow/ugc/sponsored],
    * anchor_text [inner markup stripped, entities decoded, whitespace
    * collapsed]. Non-fetchable hrefs (fragment-only, javascript:,
    * mailto:, tel:, data:) drop, as in extractLinks.
    *
    * Scale: map-only explode — rows = anchors per page, no shuffle, no
    * window; compose with [[metaNofollow]] (page-level gate) and
    * [[graft.graph.GraphRank.pageRankByKey]] for a nofollow-respecting
    * rank, or aggregate anchor_text by link_url for target labels. */
  def extractAnchors(docs: DataFrame, htmlCol: String,
      urlCol: String): DataFrame = {
    val els = regexp_extract_all(col(htmlCol),
      lit("(?is)(<a(?:\\s[^>]*)?>.*?</a>)"), lit(1))
    val open = regexp_extract(col("__a_el"), "(?is)^(<a[^>]*>)", 1)
    val inner =
      regexp_extract(col("__a_el"), "(?is)^<a[^>]*>(.*)</a>$", 1)
    val hq = attrValue(col("__a_open"), "href")
    val cleaned = trim(xmlUnescape(col("__a_hq")))
    val noFrag = when(cleaned.contains("#"),
        expr("substring(__a_h, 1, instr(__a_h, '#') - 1)"))
      .otherwise(col("__a_h"))
    val relv = trim(lower(attrValue(col("__a_open"), "rel")))
    docs
      .withColumn("__a_el", explode(els))
      .withColumn("__a_open", open)
      .withColumn("__a_hq", hq)
      .withColumn("__a_h", cleaned)
      .filter(col("__a_h") =!= "" && !col("__a_h").startsWith("#") &&
        !lower(col("__a_h"))
          .rlike("^(javascript|mailto|tel|data):"))
      .withColumn("__a_h2", noFrag)
      .filter(col("__a_h2") =!= "")
      .withColumn("href", col("__a_hq"))
      .withColumn("link_url", resolveHref(col("__a_h2"), col(urlCol)))
      .withColumn("internal",
        host(col("link_url")) === host(col(urlCol)))
      .withColumn("rel", relv)
      .withColumn("nofollow", arrays_overlap(
        split(col("rel"), "\\s+"),
        array(lit("nofollow"), lit("ugc"), lit("sponsored"))))
      .withColumn("anchor_text", trim(regexp_replace(
        htmlEntityDecode(
          regexp_replace(inner, "<[^>]*>", " ")), "\\s+", " ")))
      .drop("__a_el", "__a_open", "__a_hq", "__a_h", "__a_h2", htmlCol)
  }

  /** The lowercased, comma-joined `content` values of every
    * `<meta name="robots" …>` element (either attribute order, quoted
    * or unquoted values, any case) — "" when the page has none. The
    * page-level crawl directives that complement robots.txt: robots.txt
    * gates the FETCH, the robots meta gates INDEXING (`noindex`) and
    * LINK-FOLLOWING (`nofollow`) of a page already fetched. Map-only
    * higher-order array expressions, no shuffle. */
  def metaRobotsDirectives(html: Column): Column = {
    val metas =
      regexp_extract_all(html, lit("(?is)(<meta\\s[^>]*>)"), lit(1))
    val robots = filter(metas,
      m => lower(attrValue(m, "name")) === "robots")
    lower(concat_ws(",",
      transform(robots, m => attrValue(m, "content"))))
  }

  /** `noindex` page directive (`noindex` or `none` token in any robots
    * meta — most-restrictive-wins, the crawler consensus). */
  def metaNoindex(html: Column): Column =
    metaRobotsDirectives(html)
      .rlike("(^|[,\\s])(noindex|none)($|[,\\s])")

  /** `nofollow` page directive (`nofollow` or `none`): a rank/crawl
    * pass must drop EVERY outgoing edge of such a page — compose as a
    * page filter before [[extractAnchors]]. */
  def metaNofollow(html: Column): Column =
    metaRobotsDirectives(html)
      .rlike("(^|[,\\s])(nofollow|none)($|[,\\s])")

  /** Bitext candidates from URL STRUCTURE — the CCAligned/ParaCrawl
    * seeding trick: multilingual sites serve translations at URLs that
    * differ only by a language path segment (`/en/about` vs
    * `/fr/about`), so pairing URLs on the language-stripped key yields
    * parallel-document candidates BEFORE any content is compared —
    * orders of magnitude cheaper than embedding every page (the
    * content-scoring stage, [[graft.similarity.BitextMining]],
    * verifies the survivors). One row per unordered language pair per
    * key: (pair_key, lang_a, lang_b, url_a, url_b, id_a, id_b),
    * lang_a < lang_b.
    *
    * Detection scope (documented): the FIRST path segment of the
    * normalized URL, matched case-insensitively against `langs`
    * (ISO 639-1 codes, optionally with a region suffix `en-gb`). URLs
    * without a recognized segment drop. Several URLs on the same
    * (key, lang) collapse to the min-id representative — the dedup
    * that bounds every key at ≤ |langs| rows.
    *
    * Scale: per-row key derivation (map-only) → one (key, lang)
    * aggregate with map-side partials → one self-join on the key whose
    * per-key fan-out is capped at |langs| choose 2 by construction; no
    * windows, nothing corpus-sized on the driver. */
  def bitextUrlPairs(docs: DataFrame, urlCol: String, idCol: String,
      langs: Seq[String] = Seq("en", "fr", "de", "es", "it", "pt",
        "nl", "pl", "ru", "ja", "zh")): DataFrame = {
    require(langs.nonEmpty, "langs must be non-empty")
    val norm = normalizeUrl(col(urlCol))
    val seg = lower(regexp_extract(norm,
      "^[a-z]+://[^/]*/([^/?#]+)", 1))
    val langSeg = when(
      seg.rlike("^(" + langs.map(java.util.regex.Pattern.quote)
        .mkString("|") + ")(-[a-z0-9]+)?$"), seg)
    val key = concat(
      regexp_extract(norm, "^([a-z]+://[^/]*)/", 1),
      lit("/{lang}"),
      regexp_replace(norm, "^[a-z]+://[^/]*/[^/?#]+", ""))
    val tagged = docs
      .withColumn("__bx_lang", langSeg)
      .filter(col("__bx_lang").isNotNull)
      .withColumn("__bx_key", key)
    // barrier: reps (≤ keys·|langs| rows) feeds BOTH sides of the
    // self-join — without it each side re-runs the corpus scan + key
    // derivation (the q_crawl_frontier multi-consumer discipline)
    val reps = tagged
      .groupBy(col("__bx_key").as("pair_key"),
        col("__bx_lang").as("lang"))
      .agg(min(struct(col(idCol).cast("long").as("id"),
        col(urlCol).as("url"))).as("rep"))
      .localCheckpoint(true)
    val a = reps.select(col("pair_key"), col("lang").as("lang_a"),
      col("rep.url").as("url_a"), col("rep.id").as("id_a"))
    val b = reps.select(col("pair_key"), col("lang").as("lang_b"),
      col("rep.url").as("url_b"), col("rep.id").as("id_b"))
    a.join(b, Seq("pair_key"))
      .filter(col("lang_a") < col("lang_b"))
      .select(col("pair_key"), col("lang_a"), col("lang_b"),
        col("url_a"), col("url_b"), col("id_a"), col("id_b"))
  }

  /** Anchor-term index: how the web DESCRIBES each page — lowercased
    * whitespace terms of every follow-edge anchor text, aggregated per
    * canonicalized target URL as (target_url, term, n_refs). The
    * classic off-page relevance signal: search rankers and
    * query-document training pairs are built from exactly this table
    * (anchor text is written by the LINKING page, so it labels the
    * target more honestly than the target labels itself). Link-level
    * nofollow/ugc/sponsored edges and empty anchor texts drop;
    * page-level gating composes upstream (filter on [[metaNofollow]]
    * BEFORE calling — the q_follow_graph shape).
    *
    * Scale: map-only extract/explode, then ONE shuffle on
    * (target_url, term) with map-side partial counts — no windows, no
    * per-URL state; cardinality is bounded by total anchor terms, and
    * the hottest (url, term) cells are exactly what hash aggregation
    * partially collapses before the exchange. */
  def anchorTermIndex(docs: DataFrame, htmlCol: String,
      urlCol: String): DataFrame =
    extractAnchors(docs, htmlCol, urlCol)
      .filter(!col("nofollow") && col("anchor_text") =!= "")
      .select(normalizeUrl(col("link_url")).as("target_url"),
        explode(split(lower(col("anchor_text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("target_url"), col("term"))
      .agg(count(lit(1)).as("n_refs"))

  /** Minimal XML entity decode for sitemap fields — the five
    * predefined entities, `&amp;` LAST (the HtmlExtract ordering
    * discipline: decoding `&` first would double-decode
    * `&amp;lt;`). */
  private def xmlUnescape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** sitemaps.org urlset parse — the crawl FRONTIER-SEEDING source
    * (robots.txt points at sitemaps; sitemaps enumerate the URLs a
    * host wants crawled, with freshness/priority hints): one row per
    * `<url>` block — (host, loc [entity-decoded, trimmed], lastmod,
    * changefreq [NULL when absent], priority [double, NULL when
    * absent/malformed]). Blocks missing `<loc>` drop. The extraction
    * is a RE2-portable lazy-dot regexp chain ((?s)<url>(.*?)</url> +
    * per-field lifts) — map-only, no shuffle, the HtmlExtract posture;
    * compose with [[robotsGate]] → [[crawlSchedule]] for the
    * seed-to-fetch-plan pipeline. Sitemap INDEX files (`<sitemap>`
    * blocks pointing at child sitemaps) parse with
    * [[parseSitemapIndex]] — point this at the leaf urlsets. */
  def parseSitemap(sitemaps: DataFrame, hostCol: String = "host",
      xmlCol: String = "sitemap_xml"): DataFrame = {
    def field(tag: String): Column =
      regexp_extract(col("__b"), s"(?s)<$tag>\\s*(.*?)\\s*</$tag>", 1)
    def opt(tag: String): Column =
      when(field(tag) === "", lit(null).cast("string"))
        .otherwise(field(tag))
    sitemaps
      .select(col(hostCol).as("host"),
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<url>(.*?)</url>"), lit(1))).as("__b"))
      .filter(field("loc") =!= "")
      .withColumn("loc", xmlUnescape(field("loc")))
      .withColumn("lastmod", opt("lastmod"))
      .withColumn("changefreq", opt("changefreq"))
      .withColumn("__pri_s", field("priority"))
      .withColumn("priority", expr("try_cast(__pri_s AS double)"))
      .select(col("host"), col("loc"), col("lastmod"),
        col("changefreq"), col("priority"))
  }

  /** sitemaps.org INDEX parse — the level [[parseSitemap]] deliberately
    * skips: real hosts' robots.txt points at a `<sitemapindex>` file
    * whose `<sitemap>` blocks name the child sitemaps, not at leaf
    * urlsets, so a frontier seeded from robots hits this on day one.
    * One row per `<sitemap>` block — (host, sitemap_url
    * [entity-decoded `<loc>`, trimmed], lastmod [NULL when absent]);
    * blocks missing `<loc>` drop, `<url>` blocks (a mixed or
    * mislabeled file) are ignored. PARSE only — fetching the child
    * sitemaps stays the caller's concern; feed the fetched leaves back
    * through [[parseSitemap]] for the two-level seed flow. Same
    * map-only RE2-portable regexp posture as [[parseSitemap]]. */
  def parseSitemapIndex(indexes: DataFrame, hostCol: String = "host",
      xmlCol: String = "sitemap_xml"): DataFrame = {
    def field(tag: String): Column =
      regexp_extract(col("__b"), s"(?s)<$tag>\\s*(.*?)\\s*</$tag>", 1)
    indexes
      .select(col(hostCol).as("host"),
        explode(regexp_extract_all(col(xmlCol),
          lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1))).as("__b"))
      .filter(field("loc") =!= "")
      .withColumn("sitemap_url", xmlUnescape(field("loc")))
      .withColumn("lastmod",
        when(field("lastmod") === "", lit(null).cast("string"))
          .otherwise(field("lastmod")))
      .select(col("host"), col("sitemap_url"), col("lastmod"))
  }

  /** Per-host POLITE FETCH SCHEDULE — the frontier-scheduling step
    * between the robots gate and the fetcher: URLs queue per host in
    * `(priority DESC, id ASC)` order and the i-th fetch of a host is
    * due at `i · crawl_delay` seconds (host's [[crawlDelays]] value,
    * else `defaultDelay`). Returns the id plus (host, position
    * [1-based within host], crawl_delay, fetch_at_s) — the columns a
    * scheduler partitions work by.
    *
    * Scale: per-host FETCHING is inherently sequential, but the
    * per-host POSITION is just a rank, and host sizes in a real
    * frontier are Zipf-distributed — `Window.partitionBy(host)` would
    * put a mega-host's 10⁷ URLs into ONE sort task that AQE cannot
    * split. Instead the rank is the two-phase bucket-offset plan (the
    * [[graft.operators.Sampling]] stratumBucketRank idiom) with a
    * bucket derived DETERMINISTICALLY from the data: exact global
    * `min/max(id)` (order-insensitive aggregates, two driver scalars)
    * quantize the id into one of `buckets` range slices — monotone in
    * id, equal ids share a bucket — and a priority column prepends an
    * exact distinct-rank dimension (collected to the driver, bounded
    * by [[MaxDistinctPriorities]]), so the composite bucket coarsens
    * the full `(priority DESC, id ASC)` order. Per-(host, bucket)
    * counts become exclusive per-host prefix offsets through a BOUNDED
    * window (≤ buckets rows per host, metadata not row data), and
    * `offset + row_number` partitioned by (host, bucket) equals the
    * single-window rank bit-for-bit by the alignment invariant.
    *
    * Determinism note: the bucket is a pure function of each row (no
    * `spark_partition_id`, no range-partitioner sampling), so the
    * counts pass and the rank pass agree by construction under ANY
    * execution — re-materialized exchanges, AQE read rewrites, task
    * retries. A mega-host is split ~uniformly when its ids spread over
    * the global id range (row-number/snowflake ids do); a
    * non-numeric id column degrades gracefully to one bucket (the
    * pre-r10 single-window behavior), never to wrong positions. The
    * delay table is a host-keyed broadcast dimension; callers with an
    * expensive upstream should barrier it first (the plan reads the
    * input three times: stats, counts, rank). */
  def crawlSchedule(urls: DataFrame, robots: DataFrame, urlCol: String,
      idCol: String, priorityCol: Option[String] = None,
      agent: String = "*", defaultDelay: Double = 1.0,
      hostCol: String = "host",
      txtCol: String = "robots_txt",
      buckets: Int = 256): DataFrame = {
    require(defaultDelay >= 0,
      s"defaultDelay must be >= 0, got $defaultDelay")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val delays = crawlDelays(robots, hostCol, txtCol, agent)
    val ordered = priorityCol
      .map(p => Seq(col(p).desc, col(idCol).asc))
      .getOrElse(Seq(col(idCol).asc))
    val keyed = urls
      .withColumn("host", host(col(urlCol)))
      .join(broadcast(delays), Seq("host"), "left")
      .withColumn("crawl_delay",
        coalesce(col("crawl_delay"), lit(defaultDelay)))
    // id-range bucket: exact min/max are order-insensitive, so the two
    // scalars are identical for every pass over the input; computed on
    // the RAW urls table so the stats pass skips the host-extraction
    // expressions and the delay join entirely
    val st = urls.agg(min(col(idCol).cast("double")),
      max(col(idCol).cast("double"))).head()
    val (mn, mx) =
      if (st.isNullAt(0)) (0.0, 0.0) else (st.getDouble(0), st.getDouble(1))
    val width = (mx - mn + 1.0) / buckets
    // least() skips NULL, so a non-numeric id (cast -> NULL) lands every
    // row in bucket buckets-1: degenerate but aligned, never wrong
    val idb = least(lit(buckets - 1L),
      floor((col(idCol).cast("double") - lit(mn)) / lit(width))
        .cast("long"))
    val bucketed = priorityCol match {
      case None => keyed.withColumn("__cb", idb)
      case Some(p) =>
        // exact distinct-rank of the priority: purity (one priority per
        // rank) is what makes the composite bucket order-aligned.
        // ONE driver job (r14): the former separate countDistinct
        // round-trip is folded into the collect itself — a LIMIT of
        // MaxDistinctPriorities+1 keeps the driver-memory guard (the
        // collect is bounded BEFORE it ships), and an over-limit
        // dimension still fails loudly below.
        val spark = urls.sparkSession
        import spark.implicits._
        val guarded = urls.select(col(p).cast("double").as("__pv"))
          .distinct().limit(MaxDistinctPriorities.toInt + 1).collect()
        require(guarded.length <= MaxDistinctPriorities,
          s"crawlSchedule: more than $MaxDistinctPriorities distinct " +
            "priorities — quantize the priority column " +
            "(the rank dimension is driver-collected)")
        val ranks = guarded
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
          // priority DESC matching Spark's sort-order semantics: NaN is
          // the largest double (first under desc), NULLs last
          .sortBy(o => (o.isEmpty, o.exists(v => !v.isNaN),
            o.map(v => if (v.isNaN) 0.0 else -v).getOrElse(0.0)))
          .zipWithIndex
          .map { case (o, i) => (o, i.toLong) }.toSeq
          .toDF("__pv", "__prank")
        keyed.join(broadcast(ranks),
            col(p).cast("double") <=> col("__pv"), "inner")
          .withColumn("__cb", col("__prank") * buckets + idb)
          .drop("__pv", "__prank")
    }
    // exclusive per-host prefix offsets over the (host, bucket) counts:
    // the window input is metadata (≤ buckets rows per host)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("__cb"))
    val offsets = bucketed.groupBy(col("host"), col("__cb"))
      .agg(count(lit(1)).as("__n"))
      .select(col("host"), col("__cb"),
        (sum(col("__n")).over(wOff) - col("__n")).as("__off"))
    // phase B: exact rank within (host, bucket) + the bucket's offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"), col("__cb")).orderBy(ordered: _*)
    bucketed.join(offsets, Seq("host", "__cb"))
      .withColumn("position",
        col("__off") + row_number().over(w).cast("long"))
      .withColumn("fetch_at_s",
        round((col("position") - 1).cast("double") *
          col("crawl_delay"), 6))
      .select(col(idCol), col("host"), col("position"),
        col("crawl_delay"), col("fetch_at_s"))
  }

  /** Cap on the exact priority-rank dimension [[crawlSchedule]]
    * collects to the driver — real frontier priorities are coarse
    * (sitemap priorities are an 11-value grid); a column with more
    * distinct values than this should be quantized by the caller. */
  val MaxDistinctPriorities: Long = 1L << 20

  /** Recrawl priority from sitemap freshness hints — the step that
    * makes `<lastmod>/<changefreq>/<priority>` actually DRIVE the
    * frontier instead of decorating it: a page is due in proportion to
    * how many expected-change periods have elapsed since its last
    * modification. `score = round(coalesce(priority, 0.5) · due, 6)`
    * where `due = min(2, age_days / period)` (capped so ancient pages
    * don't starve everything else), `period` comes from the changefreq
    * (always/hourly → 1/24 d, daily → 1, weekly → 7 [also the default
    * for absent/unknown], monthly → 30, yearly → 365), `never` pins
    * due = 0, and an absent/unparsable lastmod means UNKNOWN freshness
    * → due = 1 (crawl it, don't guess). `asOfDate` (ISO yyyy-MM-dd) is
    * an explicit parameter — determinism comes from the caller's
    * clock, not the engine's. Pure scalar expression (map-only); feed
    * the result to [[crawlSchedule]]'s `priorityCol`. */
  def recrawlPriority(lastmod: Column, changefreq: Column,
      priority: Column, asOfDate: String): Column = {
    val period = when(lower(changefreq).isin("always", "hourly"),
        lit(1.0 / 24))
      .when(lower(changefreq) === "daily", lit(1.0))
      .when(lower(changefreq) === "monthly", lit(30.0))
      .when(lower(changefreq) === "yearly", lit(365.0))
      .otherwise(lit(7.0)) // weekly and the absent/unknown default
    // try_to_date: real-world lastmod strings are often junk — junk
    // means unknown freshness, never a failed job (ANSI mode is on)
    val age = datediff(to_date(lit(asOfDate)),
      call_function("try_to_date", lastmod)).cast("double")
    val due = when(lower(changefreq) === "never", lit(0.0))
      .when(age.isNull || age < 0, lit(1.0)) // unknown freshness: due
      .otherwise(least(lit(2.0), age / period))
    round(coalesce(priority, lit(0.5)) * due, 6)
  }

  /** [[parseRobots]] collapsed to ONE row per host: (host, rules
    * array<struct{rule_type, pattern, plen, like_pat}>) — the
    * dimension-table shape for a 1:1 (stream-)static join followed by
    * a MAP-ONLY per-row winner fold ([[robotsVerdict]]), instead of
    * the fan-out join + aggregate [[robotsGate]] uses. Rules per host
    * are bounded (robots.txt is capped at 500 KB by every crawler), so
    * the array row is small by construction. */
  def robotsRulesByHost(robots: DataFrame, hostCol: String = "host",
      txtCol: String = "robots_txt", agent: String = "*"): DataFrame =
    parseRobots(robots, hostCol, txtCol, agent)
      .groupBy(col("host"))
      .agg(collect_list(struct(col("rule_type"), col("pattern"),
        col("plen"), col("like_pat"))).as("rules"))

  /** `str LIKE pat ESCAPE '!'` with a COLUMN pattern (the DataFrame
    * API's `Column.like` takes only literals) — needed inside the
    * [[robotsVerdict]] array lambda, where the pattern is a field of
    * the rules array element. */
  private def likeCol(str: Column, pat: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Like(
        org.apache.spark.sql.GraftSqlBridge.expression(str),
        org.apache.spark.sql.GraftSqlBridge.expression(pat), '!'))

  /** Per-row robots verdict from a [[robotsRulesByHost]] rules array:
    * (allowed, rule_type, rule_pattern) as a struct Column — the
    * longest-match / allow-wins-ties / default-allow fold run entirely
    * inside the row (one `filter` + one `aggregate` over the ≤ rules
    * array), so the whole gate is MAP-ONLY after the 1:1 host join:
    * the shape a STREAM can run statelessly, and the shape a 100 TB
    * batch prefers too (no per-rule row fan-out, no re-aggregation). */
  def robotsVerdict(target: Column, rules: Column): Column = {
    val matched = filter(rules, r =>
      likeCol(target, r.getField("like_pat")))
    // winner = max by (plen, allow-beats-disallow, pattern) — the same
    // total order robotsGate's max(struct) uses
    val winner = aggregate(matched,
      lit(null).cast(
        "struct<rule_type:string,pattern:string,plen:bigint,tr:bigint>"),
      (acc, r) => {
        val tr = when(r.getField("rule_type") === "allow", 1L)
          .otherwise(0L)
        val cand = struct(r.getField("rule_type").as("rule_type"),
          r.getField("pattern").as("pattern"),
          r.getField("plen").as("plen"), tr.as("tr"))
        when(acc.isNull, cand)
          .when(r.getField("plen") > acc.getField("plen"), cand)
          .when(r.getField("plen") === acc.getField("plen") &&
            tr > acc.getField("tr"), cand)
          .when(r.getField("plen") === acc.getField("plen") &&
            tr === acc.getField("tr") &&
            r.getField("pattern") > acc.getField("pattern"), cand)
          .otherwise(acc)
      })
    struct(
      (winner.isNull || winner.getField("rule_type") === "allow")
        .as("allowed"),
      winner.getField("rule_type").as("rule_type"),
      winner.getField("pattern").as("rule_pattern"))
  }

  /** RFC 9309 crawl-permission gate — the politeness stage of a crawl
    * corpus pipeline: each document URL is checked against its host's
    * parsed robots rules ([[parseRobots]]) under the LONGEST-MATCH
    * rule: the matching Allow/Disallow with the most pattern octets
    * wins; at equal length Allow wins; no matching rule (or no rules
    * for the host at all) means allowed — the RFC defaults. Returns
    * the input id plus (host, target, allowed, rule_type,
    * rule_pattern) with NULL rule columns on the default-allow path.
    *
    * Scale: the rules collapse to ONE array row per host
    * ([[robotsRulesByHost]] — bounded, robots.txt is size-capped), the
    * corpus joins that dimension table 1:1 on host (broadcast when
    * small), and the winner is the [[robotsVerdict]] per-row array
    * fold — ONE map-only pass after the join, no per-rule row fan-out,
    * no re-aggregation, no windows (`ScaleProbe robots` measures the
    * fold vs the exploded join+max(struct) alternative). Ties beyond
    * (plen, type) break on the lexicographically greatest pattern for
    * determinism. The same fold runs statelessly on a stream
    * ([[graft.streaming.Streaming.streamingRobotsGate]]). */
  def robotsGate(docs: DataFrame, robots: DataFrame, urlCol: String,
      idCol: String, hostCol: String = "host",
      txtCol: String = "robots_txt", agent: String = "*"): DataFrame = {
    val rules = robotsRulesByHost(robots, hostCol, txtCol, agent)
    val verdict = robotsVerdict(col("target"), col("rules"))
    docs.select(col(idCol),
        host(col(urlCol)).as("host"),
        requestTarget(col(urlCol)).as("target"))
      .join(rules, Seq("host"), "left")
      .withColumn("__v", verdict)
      .select(col(idCol), col("host"), col("target"),
        col("__v.allowed").as("allowed"),
        col("__v.rule_type").as("rule_type"),
        col("__v.rule_pattern").as("rule_pattern"))
  }
}
