package graft.text

import graft.text.TextAnalysis.{bind, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published heuristic filter rule sets for web-scale
  * training corpora, composed as single map-only operators:
  *
  *  - C4 line/page cleaning (Raffel et al. 2020, "Exploring the Limits of
  *    Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  *    keep only lines that end in terminal punctuation and have enough
  *    words, then drop whole pages that are too short or contain
  *    boilerplate markers ("lorem ipsum", curly braces).
  *  - Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
  *    Methods, Analysis & Insights from Training Gopher", Appendix A1) —
  *    document-level bounds on word count, mean word length, symbol-to-
  *    word ratio, bullet/ellipsis line fractions, alphabetic-word
  *    fraction and stopword hits.
  *
  * Both are pure per-row expression trees over built-in array/regexp
  * functions — no UDFs, no shuffle, no state — so they run inside
  * whole-stage codegen and compose with any scan. At 100 TB these are
  * exactly the operators you want map-only: they typically run FIRST in a
  * curation pipeline and discard the bulk of raw crawl text before
  * anything pays an exchange.
  *
  * The reference engine ([/root/reference], TAPE) has no text layer; these
  * belong to the beyond-parity training-data mandate (SURVEY.md §2.9).
  */
object HeuristicFilters {

  /** Physical lines of the raw text (blank lines kept — the C4 line rule
    * judges every line; blanks fail the word-count test anyway). */
  private def rawLines(c: Column): Column = split(c, "\n")

  /** A C4-keepable line: ends in terminal punctuation (`.`, `!`, `?` or a
    * closing double quote) and carries at least `minLineWords` whitespace
    * words. */
  private def c4LineKeep(line: Column, minLineWords: Int): Column =
    bind(trim(line)) { l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minLineWords
    }

  /** C4 page cleaning (Raffel et al. 2020 §2.2). Per document:
    *
    *  - `clean_text`: only the lines that end in terminal punctuation
    *    AND have ≥ `minLineWords` words, re-joined with newlines
    *    (the published line rules: "only retained lines that ended in a
    *    terminal punctuation mark" / "with at least 3 words").
    *  - `n_lines_kept` / `n_lines_total`: the line filter's bookkeeping.
    *  - `n_sentences`: terminal-punctuation marks (`[.!?]`) in the kept
    *    text — the sentence proxy for the "at least N sentences" page
    *    rule (C4 publishes 5; configurable here).
    *  - `has_lorem` / `has_brace`: the published page-drop markers —
    *    any occurrence of "lorem ipsum" (case-insensitive) or `{` in the
    *    RAW text (the brace rule targets leaked code/JSON).
    *  - `keep`: n_sentences ≥ minSentences ∧ ¬has_lorem ∧ ¬has_brace.
    *
    * Deterministic, fully SQL-expressible (the q_c4_filter oracle replays
    * every rule), and map-only. */
  def c4Clean(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minLineWords: Int = 3,
      minSentences: Int = 5): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1: $minLineWords")
    require(minSentences >= 0, s"minSentences must be >= 0: $minSentences")
    val kept = filter(rawLines(col(textCol)),
      l => c4LineKeep(l, minLineWords))
    docs.select(col(idCol), col(textCol),
        array_join(kept, "\n").as("clean_text"),
        size(kept).cast("long").as("n_lines_kept"),
        size(rawLines(col(textCol))).cast("long").as("n_lines_total"))
      .withColumn("n_sentences",
        size(regexp_extract_all(col("clean_text"), lit("[.!?]"), lit(0)))
          .cast("long"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("keep",
        col("n_sentences") >= minSentences &&
          !col("has_lorem") && !col("has_brace"))
      .drop(textCol)
  }

  /** The Gopher stopword list (Rae et al. 2021 Appendix A1: "contains at
    * least 2 of the following English words: the, be, to, of, and, that,
    * have, with"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, Appendix A1), every
    * signal surfaced as a column plus the composed `keep` verdict:
    *
    *  - `n_words` ∈ [minWords, maxWords]        (published 50 … 100 000)
    *  - `mean_word_len` ∈ [minMeanWordLen, maxMeanWordLen]   (3 … 10)
    *  - `symbol_word_ratio` ≤ maxSymbolRatio: (`#` + `...` occurrences)
    *    per word                                (published ≤ 0.1)
    *  - `bullet_line_frac` < maxBulletFrac: lines starting with a bullet
    *    (`•` or `- `)                           (published < 0.9)
    *  - `ellipsis_line_frac` ≤ maxEllipsisFrac: lines ending in `...`
    *                                            (published ≤ 0.3)
    *  - `alpha_word_frac` ≥ minAlphaWordFrac: words containing at least
    *    one alphabetic character                (published ≥ 0.8)
    *  - `n_stopword_hits` ≥ minStopwordHits over [[GopherStopwords]]
    *                                            (published ≥ 2)
    *
    * Ratio columns are rounded to 6 decimals (they are exact small-integer
    * divisions; rounding only pins the decimal representation for
    * cross-engine hashing). Empty documents fail the word-count bound and
    * emit 0-valued signals. Map-only, one expression tree per rule. */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2,
      passthrough: Seq[String] = Nil): DataFrame = {
    require(minWords >= 0 && maxWords >= minWords,
      s"bad word bounds [$minWords, $maxWords]")
    val stopDict = array(GopherStopwords.map(lit): _*)
    val pass = passthrough.map(col)
    docs.select(col(idCol) +: pass ++: Seq(
        tokens(col(textCol)).as("__ts"),
        rawLines(col(textCol)).as("__ls"),
        col(textCol).as("__text")): _*)
      .select(col(idCol) +: pass ++: Seq(
        size(col("__ts")).cast("long").as("n_words"),
        round(when(size(col("__ts")) === 0, lit(0.0)).otherwise(
          aggregate(col("__ts"), lit(0L), (acc, t) => acc + length(t))
            .cast("double") / size(col("__ts"))), 6).as("mean_word_len"),
        round(when(size(col("__ts")) === 0, lit(0.0)).otherwise(
          (size(regexp_extract_all(col("__text"), lit("#"), lit(0))) +
            size(regexp_extract_all(col("__text"), lit("\\.\\.\\."),
              lit(0)))).cast("double") / size(col("__ts"))), 6)
          .as("symbol_word_ratio"),
        round(when(size(col("__ls")) === 0, lit(0.0)).otherwise(
          size(filter(col("__ls"), l =>
            trim(l).startsWith("•") || trim(l).startsWith("- ")))
            .cast("double") / size(col("__ls"))), 6)
          .as("bullet_line_frac"),
        round(when(size(col("__ls")) === 0, lit(0.0)).otherwise(
          size(filter(col("__ls"), l => trim(l).endsWith("...")))
            .cast("double") / size(col("__ls"))), 6)
          .as("ellipsis_line_frac"),
        round(when(size(col("__ts")) === 0, lit(0.0)).otherwise(
          size(filter(col("__ts"), t => t.rlike("[a-z]")))
            .cast("double") / size(col("__ts"))), 6)
          .as("alpha_word_frac"),
        size(filter(col("__ts"), t => array_contains(stopDict, t)))
          .cast("long").as("n_stopword_hits")): _*)
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_word_ratio") <= maxSymbolRatio &&
          col("bullet_line_frac") < maxBulletFrac &&
          col("ellipsis_line_frac") <= maxEllipsisFrac &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("n_stopword_hits") >= minStopwordHits)
  }
}
