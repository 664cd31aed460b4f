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
}
