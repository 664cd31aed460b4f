package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between the raw crawl and every
  * text operator in this library (CommonCrawl's WARC→WET conversion;
  * trafilatura/jusText's job in the C4/RefinedWeb/FineWeb pipelines).
  * The reference engine has no web layer; this module keeps the repo's
  * contract for one: pure Catalyst regexp expressions (no UDFs, no DOM
  * parser dependency), RE2-portable patterns so the DuckDB oracle runs
  * the IDENTICAL chain, map-only at any scale.
  *
  * Extraction rules (a deliberately deterministic, auditable subset of
  * the crawl-industry extractors — a real DOM parser is data-dependent
  * C; this is the regexp tier those tools fall back to):
  *
  *   1. `<script>`/`<style>` elements drop WITH their contents (code
  *      and CSS are not training text), as do `<!-- comments -->`;
  *   2. block-level tags (p/div/br/li/tr/h1-6/ul/ol/table/blockquote)
  *      become newlines — paragraph structure survives for the line
  *      filters downstream ([[HeuristicFilters.c4Clean]]);
  *   3. every remaining tag becomes a single space;
  *   4. the five XML entities + &nbsp; decode (&amp; LAST, so
  *      `&amp;lt;` decodes once, to `&lt;` — not twice);
  *   5. horizontal whitespace collapses, line edges trim, blank lines
  *      drop, the whole text trims.
  *
  * Scale: one scalar expression tree per row — embarrassingly parallel,
  * zero shuffle, codegen'd. At 100 TB this IS the ingest map stage. */
object HtmlExtract {

  /** Tags rendered as line breaks by [[extractText]]. */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|br|li|tr|h[1-6]|ul|ol|table|blockquote)\\b[^>]*>"

  /** The extracted text of one HTML column (see object doc for the rule
    * set). NULL in → NULL out. */
  def extractText(html: Column): Column = {
    // 1. script/style subtrees and comments drop entirely ((?is): case
    // fold + dot-matches-newline; lazy body so adjacent elements don't
    // fuse — both flags are RE2-portable)
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // 2. block tags → newline, 3. all other tags → space
    val blocks = regexp_replace(noComment, BlockTagRe, "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    // 4. entities; &amp; decodes LAST
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to)
      }
    // 5. collapse horizontal runs, trim line edges, drop blank lines,
    // regex-trim the ends (plain trim() leaves newlines, in both engines)
    val hws = regexp_replace(ent, "[ \\t]+", " ")
    val edges = regexp_replace(hws, "(?m)^ +| +$", "")
    val collapsed = regexp_replace(edges, "\\n{2,}", "\n")
    regexp_replace(collapsed, "^\\s+|\\s+$", "")
  }

  /** Markup-density signals computed on the RAW html — the gate crawl
    * pipelines run next to extraction (a page that is 95% tags has no
    * prose worth keeping): tag count, link (`<a`) count, script/style
    * element count, and the extracted-to-raw length ratio ("text
    * density", rounded 6; 0 for empty raw). */
  def htmlSignals(html: Column): Seq[(String, Column)] = {
    def cnt(pat: String): Column =
      coalesce(regexp_count(html, lit(pat)), lit(0)).cast("long")
    val extracted = extractText(html)
    Seq(
      "n_tags" -> cnt("<[^>]*>"),
      "n_links" -> cnt("(?i)<a\\b"),
      "n_script_blocks" -> cnt("(?is)<script\\b[^>]*>.*?</script>"),
      "text_density" -> when(coalesce(length(html), lit(0)) === 0,
          lit(0.0))
        .otherwise(round(length(extracted).cast("double") /
          length(html).cast("double"), 6)))
  }

  /** Dataframe form: (idCol, text [extracted], n_tags, n_links,
    * n_script_blocks, text_density). One map-only projection. */
  def extract(docs: DataFrame, htmlCol: String = "html",
      idCol: String = "doc_id"): DataFrame = {
    val sig = htmlSignals(col(htmlCol)).map { case (n, c) => c.as(n) }
    docs.select(col(idCol) +:
      extractText(col(htmlCol)).as("text") +: sig: _*)
  }

  // ------------------------------------------- paragraph boilerplate gate

  /** jusText-lite keep decision for ONE paragraph of extracted text
    * (one [[extractText]] output line): keep when it reads like prose —
    * ≥ `minWords` whitespace tokens AND a stopword fraction ≥
    * `minStopRatio` (the union of [[TextAnalysis.Stopwords]],
    * language-agnostic like [[TextAnalysis.stopwordRatio]]) — or when
    * it is long (`≥ longChars` characters; long runs are content even
    * when token-poor: tables, code, foreign scripts). What this drops
    * at web scale is exactly the nav/footer/copyright boilerplate the
    * block-tag newlines isolated into their own lines. Pure per-row
    * expression, deterministic, oracle-replayable. */
  def paragraphKeep(p: Column, minWords: Int = 10,
      minStopRatio: Double = 0.2, longChars: Int = 200): Column = {
    val all = TextAnalysis.Stopwords.flatMap(_._2).distinct.sorted
    val dict = array(all.map(lit): _*)
    val ts = when(trim(p) === "", array().cast("array<string>"))
      .otherwise(split(trim(lower(p)), "\\s+"))
    val nw = size(ts)
    val hits = size(filter(ts, t => array_contains(dict, t)))
    val ratio = when(nw === 0, lit(0.0))
      .otherwise(hits.cast("double") / nw.cast("double"))
    (nw >= minWords && ratio >= minStopRatio) ||
      length(p) >= longChars
  }

  /** Extracted text with boilerplate paragraphs REMOVED — the cleaned
    * per-document column (kept lines re-joined by newline). Map-only:
    * split + higher-order filter + join, no explode. */
  def dropBoilerplate(text: Column, minWords: Int = 10,
      minStopRatio: Double = 0.2, longChars: Int = 200): Column =
    array_join(
      filter(split(text, "\n"), p =>
        trim(p) =!= "" &&
          paragraphKeep(p, minWords, minStopRatio, longChars)),
      "\n")

  /** Per-paragraph classification table over extracted text: input
    * columns (minus `textCol`) plus para_idx [0-based over non-blank
    * lines], paragraph, n_chars, n_words, stop_ratio [6-dp], keep.
    * One posexplode — rows = paragraphs, no shuffle; feed `keep` back
    * through [[dropBoilerplate]] for the cleaned column, or aggregate
    * the flags for corpus boilerplate telemetry. */
  def paragraphs(docs: DataFrame, textCol: String, minWords: Int = 10,
      minStopRatio: Double = 0.2, longChars: Int = 200): DataFrame = {
    val all = TextAnalysis.Stopwords.flatMap(_._2).distinct.sorted
    val dict = array(all.map(lit): _*)
    val nonBlank =
      filter(split(col(textCol), "\n"), p => trim(p) =!= "")
    val p = col("paragraph")
    val ts = when(trim(p) === "", array().cast("array<string>"))
      .otherwise(split(trim(lower(p)), "\\s+"))
    val nw = size(ts)
    val hits = size(filter(ts, t => array_contains(dict, t)))
    val ratio = when(nw === 0, lit(0.0))
      .otherwise(hits.cast("double") / nw.cast("double"))
    docs
      .select(col("*"),
        posexplode(nonBlank).as(Seq("para_idx", "paragraph")))
      .withColumn("n_chars", length(p).cast("int"))
      .withColumn("n_words", nw.cast("int"))
      .withColumn("stop_ratio", round(ratio, 6))
      .withColumn("keep",
        paragraphKeep(p, minWords, minStopRatio, longChars))
      .drop(textCol)
  }

  // ----------------------------------------------- HTML → Markdown

  /** HTML → MARKDOWN conversion — the structure-preserving sibling of
    * [[extractText]] and the form modern pretraining corpora keep web
    * documents in (plain extraction flattens headings, emphasis,
    * links, lists and code to undifferentiated prose; markdown keeps
    * the structure tokens the model can learn). Same engineering
    * contract as the rest of the module: ONE scalar regexp-chain
    * expression per row, no UDFs, no DOM dependency, zero shuffle —
    * at 100 TB this replaces the WET map stage, at the same cost.
    *
    * Conversion rules (a deterministic, auditable subset of what a DOM
    * converter does — each a documented boundary, not a silent wrong
    * answer):
    *
    *   1. script/style/comments drop with contents ([[extractText]]);
    *   2. `<pre><code>…` and bare `<pre>` become ``` fences (inner
    *      markup inside a fence converts like everything else — the
    *      regexp tier has no protected regions; horizontal whitespace
    *      inside fences collapses under rule 12 the same way);
    *   3. `<h1>`–`<h6>` become `#`–`######` lines;
    *   4. `<img>` becomes `![alt](src)` (double-quoted attributes,
    *      either order; src-only images get an empty alt) — BEFORE
    *      links so a linked image nests as `[![alt](src)](href)`;
    *   5. `<a href="…">` becomes `[text](href)` (double- or
    *      single-quoted href; unquoted hrefs fall through to text —
    *      the [[graft.text.UrlOps.extractLinks]] lane exists for edge
    *      extraction, this is a RENDERING op);
    *   6. `<b>/<strong>` → `**…**`, `<i>/<em>` → `*…*`,
    *      `<code>` → `` ` ``-wrapped;
    *   7. lists KEEP their structure: `<ul>`/`<ol>`/`<li>` emit
    *      control-char markers the stateful line pass
    *      ([[graft.functions.MdExpressions.mdRestructure]]) turns
    *      into `- ` bullets, `1.`-numbered items, and two-space
    *      nesting indentation (an item's own continuation blocks stay
    *      unindented — boundary);
    *   8. `<blockquote>` spans mark open/close: every enclosed line
    *      gets its `> ` (nested quotes `> > `), blank lines between
    *      quoted paragraphs keep a bare `>` so a multi-paragraph
    *      quote stays ONE quote;
    *   9. `<hr>` → `---`, `<br>` → line break;
    *  10. `<table>`/`<tr>`/`<td>`/`<th>` mark rows and cells the line
    *      pass renders as a GFM pipe table — first row is the header,
    *      a `| --- |` delimiter row is synthesized at the header's
    *      width, literal `|` in cells escapes `\|` (so
    *      [[graft.text.Markdown.markdownTableCells]] round-trips) —
    *      while p/div/section/article boundaries become paragraph
    *      breaks and remaining tags become spaces (markdown `*_#`
    *      specials in prose are NOT escaped — boundary; tables/lists
    *      nested INSIDE a table cell flatten to cell text);
    *  11. entities decode (`&amp;` last);
    *  12. horizontal whitespace collapses, line edges trim, 3+
    *      newlines collapse to one blank line, ends trim;
    *  13. the stateful line pass renders the markers (one native
    *      codegen'd expression — the chain stays map-only).
    *
    * NULL in → NULL out. */
  def htmlToMarkdown(html: Column): Column = {
    def rep(c: Column, pat: String, to: String): Column =
      regexp_replace(c, pat, to)
    // 0. strip marker-range control chars (they're about to carry the
    // structure protocol — document text must not be able to forge it)
    val c0 = rep(html, "[\\u0001-\\u0008\\u000E\\u000F]", "")
    // 1. drop script/style/comments
    val c1 = rep(rep(rep(c0,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    // 2. fences: pre+code first (the dominant real markup), bare pre next
    val c2 = rep(rep(c1,
      "(?is)<pre\\b[^>]*>\\s*<code\\b[^>]*>(.*?)</code>\\s*</pre>",
      "\n```\n$1\n```\n"),
      "(?is)<pre\\b[^>]*>(.*?)</pre>", "\n```\n$1\n```\n")
    // 3. headings (level by tag digit; six fixed rules keep RE2 port)
    val c3 = (1 to 6).foldLeft(c2) { (c, i) =>
      rep(c, s"(?is)<h$i\\b[^>]*>(.*?)</h$i>",
        "\n\n" + "#" * i + " $1\n\n")
    }
    // 4. images (alt/src either order, then src-only)
    val c4 = rep(rep(rep(c3,
      "(?is)<img\\b[^>]*\\balt\\s*=\\s*\"([^\"]*)\"[^>]*" +
        "\\bsrc\\s*=\\s*\"([^\"]*)\"[^>]*>", "![$1]($2)"),
      "(?is)<img\\b[^>]*\\bsrc\\s*=\\s*\"([^\"]*)\"[^>]*" +
        "\\balt\\s*=\\s*\"([^\"]*)\"[^>]*>", "![$2]($1)"),
      "(?is)<img\\b[^>]*\\bsrc\\s*=\\s*\"([^\"]*)\"[^>]*>", "![]($1)")
    // 5. links (double- then single-quoted href)
    val c5 = rep(rep(c4,
      "(?is)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>",
      "[$2]($1)"),
      "(?is)<a\\b[^>]*\\bhref\\s*=\\s*'([^']*)'[^>]*>(.*?)</a>",
      "[$2]($1)")
    // 6. inline emphasis + code
    val c6 = rep(rep(rep(c5,
      "(?is)<(?:b|strong)\\b[^>]*>(.*?)</(?:b|strong)>", "**$1**"),
      "(?is)<(?:i|em)\\b[^>]*>(.*?)</(?:i|em)>", "*$1*"),
      "(?is)<code\\b[^>]*>(.*?)</code>", "`$1`")
    // 7. list structure markers (rendered by the line pass)
    val c7 = rep(rep(rep(rep(rep(rep(c6,
      "(?i)<li\\b[^>]*>", "\n\u0004"), "(?i)</li>", ""),
      "(?i)<ul\\b[^>]*>", "\n\u0001\n"), "(?i)</ul>", "\n\u0003\n"),
      "(?i)<ol\\b[^>]*>", "\n\u0002\n"), "(?i)</ol>", "\n\u0003\n")
    // 8.-9. blockquote span markers, hr, br
    val c7b = rep(rep(rep(rep(c7,
      "(?i)<blockquote\\b[^>]*>", "\n\u000E\n"),
      "(?i)</blockquote>", "\n\u000F\n"),
      "(?i)<hr\\b[^>]*>", "\n\n---\n\n"),
      "(?i)<br\\b[^>]*>", "\n")
    // 10a. table / row / cell markers
    val c7c = rep(rep(rep(rep(rep(rep(c7b,
      "(?i)<table\\b[^>]*>", "\n\u0005\n"),
      "(?i)</table>", "\n\u0006\n"),
      "(?i)<tr\\b[^>]*>", "\n\u0007"), "(?i)</tr>", ""),
      "(?i)<t[dh]\\b[^>]*>", "\u0008"), "(?i)</t[dh]>", "")
    // 10b. paragraph-level boundaries, then strip the rest
    val c8 = rep(rep(c7c,
      "(?i)</?(?:p|div|section|article)\\b[^>]*>", "\n\n"),
      "<[^>]*>", " ")
    // 11. entities, &amp; LAST
    val c9 = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c8) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to)
      }
    // 12. whitespace discipline (blank line = paragraph break survives)
    val hws = rep(c9, "[ \\t]+", " ")
    val edges = rep(hws, "(?m)^ +| +$", "")
    val collapsed = rep(edges, "\\n{3,}", "\n\n")
    val trimmed = rep(collapsed, "^\\s+|\\s+$", "")
    // 13. the stateful line pass: ol numbering, nesting, pipe tables,
    // quote spans
    graft.functions.MdExpressions.mdRestructure(trimmed)
  }

  /** Dataframe form of [[htmlToMarkdown]] plus the length ratio (the
    * structure-overhead telemetry: markdown keeps syntax characters
    * extraction drops, so md_ratio > text_density on structured
    * pages). One map-only projection. */
  def toMarkdown(docs: DataFrame, htmlCol: String = "html",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      htmlToMarkdown(col(htmlCol)).as("markdown"),
      when(coalesce(length(col(htmlCol)), lit(0)) === 0, lit(0.0))
        .otherwise(round(
          length(htmlToMarkdown(col(htmlCol))).cast("double") /
            length(col(htmlCol)).cast("double"), 6)).as("md_ratio"))
}
