package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. Everything is composed from built-in Catalyst
  * expressions — no UDFs — so the whole pipeline stays inside whole-stage
  * codegen and parquet filter/column pushdown survives.
  *
  * Design note (100 TB): all functions are per-row scalar expressions, so
  * they scale embarrassingly — no shuffle, no state. The only collection
  * types used are small arrays (tokens/shingles of one document), bounded
  * by document length.
  */
object TextAnalysis {

  /** Evaluate `c` ONCE and use it many times: binds the value as a lambda
    * variable via a single-element `transform`. Essential inside
    * higher-order functions — a lambda body that references an outer
    * expression tree re-evaluates that tree per array element (HOFs are
    * interpreted, no common-subexpression elimination), turning an O(len)
    * shingle scan into O(len²). */
  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Lowercase, collapse runs of whitespace, trim — the canonical form used
    * for fingerprinting and exact dedup. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic document fingerprint: MD5 of the normalized text.
    * MD5 is a standard digest, so any engine (the DuckDB oracle included)
    * produces the identical key — the backbone of exact dedup. */
  def fingerprintMd5(c: Column): Column = md5(normalizeText(c))

  /** Ingest-grade unicode cleanup (ftfy-lite), run BEFORE any hashing /
    * dedup / tokenization so cross-encoding duplicates (precomposed `é`
    * vs `e`+combining acute) collapse: NFC-compose (native codegen
    * expression — see [[graft.functions.NormalizeExpression]]), strip C0
    * control characters (except `\t`/`\n`/`\r`, which the next step
    * absorbs as whitespace) and DEL, collapse whitespace runs to one
    * space, trim. Unlike [[normalizeText]] (a LOSSY lowercase
    * fingerprint KEY), cleanText is the text ITSELF after cleanup —
    * case preserved. Map-only; allocation-free on already-clean ASCII. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.functions.NormalizeExpression.nfcNormalize(c),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""), "\\s+", " "))

  /** Accent folding (NFD + combining-mark strip, native codegen
    * expression): the match-key normalization for accent-insensitive
    * dedup and search — `é`/`e`+acute/`É`-lowered all key as `e`.
    * Compose with [[normalizeText]] for a full accent-insensitive
    * fingerprint. */
  def foldAccents(c: Column): Column =
    graft.functions.NormalizeExpression.accentFold(c)

  /** One-pass char-class statistics struct (native kernel; see
    * graft.functions.TextStatsExpression for field semantics). */
  def textStats(c: Column): Column =
    graft.functions.TextStatsExpression.textStats(c)

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = textStats(c).getField("ws_tokens")

  /** BPE-ish token count: runs of alphanumerics count 1 each, every other
    * non-space char counts 1 — a cheap, deterministic proxy for subword
    * tokenizer counts. */
  def bpeTokenCount(c: Column): Column = textStats(c).getField("bpe_tokens")

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(c: Column): Column = bind(textStats(c)) { st =>
    when(st.getField("nchars") === 0, lit(0.0))
      .otherwise(st.getField("alpha").cast("double") / st.getField("nchars"))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(c: Column): Column = bind(textStats(c)) { st =>
    when(st.getField("nchars") === 0, lit(0.0))
      .otherwise(st.getField("punct").cast("double") / st.getField("nchars"))
  }

  /** Lower-cased whitespace tokens of a document. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(c)), "\\s+"))

  /** cp1252 mapping of the 0x80-0x9F control range — what a UTF-8
    * continuation byte DISPLAYS as when mis-decoded by Windows-1252
    * (the usual web mojibake path; plain Latin-1 bytes map to
    * themselves). */
  private val Cp1252: Map[Int, Char] = Map(
    0x80 -> '\u20ac', 0x82 -> '\u201a', 0x83 -> '\u0192',
    0x84 -> '\u201e', 0x85 -> '\u2026', 0x86 -> '\u2020',
    0x87 -> '\u2021', 0x88 -> '\u02c6', 0x89 -> '\u2030',
    0x8a -> '\u0160', 0x8b -> '\u2039', 0x8c -> '\u0152',
    0x8e -> '\u017d', 0x91 -> '\u2018', 0x92 -> '\u2019',
    0x93 -> '\u201c', 0x94 -> '\u201d', 0x95 -> '\u2022',
    0x96 -> '\u2013', 0x97 -> '\u2014', 0x98 -> '\u02dc',
    0x99 -> '\u2122', 0x9a -> '\u0161', 0x9b -> '\u203a',
    0x9c -> '\u0153', 0x9e -> '\u017e', 0x9f -> '\u0178')

  /** The mojibake artifact a character shows as after the
    * UTF-8-decoded-as-cp1252 round trip: each UTF-8 byte rendered as
    * its cp1252 glyph. */
  private def mojibakeOf(ch: Char): String =
    ch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map { b =>
        val u = b & 0xff
        if (u < 0x80) u.toChar else Cp1252.getOrElse(u, u.toChar)
      }.mkString

  /** The mojibake repair table — UTF-8 bytes mis-decoded as cp1252
    * (the single most common web-crawl encoding damage: "caf\u00e9"
    * shipped as "caf\u00c3\u00a9"), GENERATED from the target
    * characters so the artifacts are exact by construction. Ordered
    * longest-artifact-first so three-byte artifacts repair before any
    * two-byte prefix could mangle them; ties order by artifact string
    * for a fixed fold. Deliberately conservative: punctuation, western
    * accents and NBSP only — sequences that essentially never occur in
    * intentional text. NBSP repairs to a PLAIN space. */
  val MojibakePairs: Seq[(String, String)] = {
    val targets = Seq('\u2018', '\u2019', '\u201c', '\u201d',
      '\u2013', '\u2014', '\u2026', '\u00e1', '\u00e9', '\u00ed',
      '\u00f3', '\u00fa', '\u00f1', '\u00fc', '\u00f6', '\u00e4',
      '\u00e7', '\u00e0', '\u00e8', '\u00eb', '\u00ef', '\u00f4',
      '\u00fb', '\u00df', '\u00b0', '\u00b7')
    val pairs = targets.map(ch => mojibakeOf(ch) -> ch.toString) :+
      (mojibakeOf('\u00a0') -> " ")
    pairs.sortBy { case (from, _) => (-from.length, from) }
  }

  /** Count of mojibake artifact markers in the text — the detector the
    * repair decision and the telemetry share: occurrences of the
    * tell-tale lead characters U+00C3 and U+00C2 plus the U+00E2
    * U+20AC pair (computed by the length-difference idiom, one native
    * pass per marker). */
  def mojibakeCount(c: Column): Column = {
    def occurrences(marker: String): Column =
      (length(c) - length(regexp_replace(c,
        java.util.regex.Pattern.quote(marker), ""))) / marker.length
    (occurrences("\u00c3") + occurrences("\u00e2\u20ac") +
      occurrences("\u00c2")).cast("long")
  }

  /** Repair double-encoded UTF-8 (ftfy's core case, reduced to the
    * deterministic table of [[MojibakePairs]]): a left fold of literal
    * replaces in the table's fixed order — map-only, no shuffle, and
    * the DuckDB oracle replays the identical replace chain. Text
    * without artifacts passes through byte-identical. */
  def repairMojibake(c: Column): Column =
    MojibakePairs.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }

  /** Shannon entropy (nats) of the document's raw CHARACTER
    * distribution — the cheap gibberish detector: natural language sits
    * ≈ 2.8–3.3 nats, base64/hex blobs push toward ln(charset) with a
    * flat histogram, and template spam (repeated runs) collapses toward
    * 0. Computed as `ln(L) − (Σ_c n_c·ln n_c)/L` over character run
    * lengths of the SORTED character array — one map-only column
    * expression, no explode, no shuffle; the fold order (ascending char)
    * is deterministic so the value is engine-exact under a final
    * rounding. Empty text scores 0. */
  def charEntropy(c: Column): Column = {
    // NULL text scores 0 like empty text (missing content carries no
    // distribution — and the grouped-oracle formulation agrees)
    val chars = when(c.isNull || length(c) === 0,
        array().cast("array<string>"))
      .otherwise(array_sort(split(c, "")))
    bind(chars) { cs =>
      val n = size(cs).cast("double")
      // fold runs of equal chars: acc = (prev char, run length, Σ n_c·ln n_c)
      val acc = aggregate(cs,
        struct(lit("").as("prev"), lit(0.0).as("run"), lit(0.0).as("s")),
        (a, x) => {
          val closed = a.getField("s") +
            when(a.getField("run") > 0,
              a.getField("run") * log(a.getField("run"))).otherwise(lit(0.0))
          when(x === a.getField("prev"),
            struct(x.as("prev"), (a.getField("run") + 1).as("run"),
              a.getField("s").as("s")))
            .otherwise(struct(x.as("prev"), lit(1.0).as("run"),
              closed.as("s")))
        },
        a => a.getField("s") + when(a.getField("run") > 0,
          a.getField("run") * log(a.getField("run"))).otherwise(lit(0.0)))
      when(n === 0, lit(0.0)).otherwise(log(n) - acc / n)
    }
  }

  /** Mean token length (0 for empty documents): Σ token lengths equals the
    * non-whitespace char count of the trimmed text — one native stats pass,
    * no tokenization. */
  def meanWordLen(c: Column): Column = bind(textStats(c)) { st =>
    when(st.getField("ws_tokens") === 0, lit(0.0)).otherwise(
      st.getField("nonspace").cast("double") / st.getField("ws_tokens"))
  }

  /** Non-blank physical lines of the raw text — the unit of the
    * repetition-quality signals below. */
  def textLines(c: Column): Column =
    filter(split(c, "\n"), l => length(trim(l)) > 0)

  /** Fraction of non-blank lines that repeat an earlier line
    * (1 − distinct/total; 0 for ≤1 line) — the line-level member of the
    * Gopher-style repetition filter family (Rae et al. 2021, published
    * quality heuristics for web-scale training corpora): boilerplate,
    * navigation chrome and template spam score high. Pure array
    * functions, fully codegen'd, O(len) per row. */
  def duplicateLineFraction(c: Column): Column = bind(textLines(c)) { ls =>
    when(size(ls) <= 1, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** Raw (non-distinct, order-preserving) word n-grams — unlike
    * [[wordShingles]], repeats are kept so repetition fractions can count
    * them. */
  def rawWordNgrams(c: Column, n: Int): Column = bind(tokens(c)) { ts =>
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
  }

  /** Fraction of word n-grams that repeat (1 − distinct/total; 0 for ≤1
    * gram) — the n-gram member of the Gopher repetition family; high
    * values flag machine-generated or looping text that survives
    * line-level checks. */
  def duplicateNgramFraction(c: Column, n: Int): Column =
    bind(rawWordNgrams(c, n)) { gs =>
      when(size(gs) <= 1, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
    }

  /** Small function-word lists per language for the n-gram/stopword
    * language-ID heuristic and the stopword-ratio quality signal. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "you", "zai", "ta")
  )

  private def stopwordHits(ts: Column, words: Seq[String]): Column = {
    val dict = array(words.map(lit): _*)
    size(filter(ts, t => array_contains(dict, t)))
  }

  /** Fraction of tokens that are (any-language) stopwords. */
  def stopwordRatio(c: Column): Column = bind(tokens(c)) { ts =>
    val all = Stopwords.flatMap(_._2).distinct.sorted
    when(size(ts) === 0, lit(0.0))
      .otherwise(stopwordHits(ts, all).cast("double") / size(ts))
  }

  /** Language-ID heuristic: score each language by its function-word hit
    * count; return the best-scoring language (ties broken alphabetically,
    * zero hits → "und" for undetermined). Deterministic and fully
    * SQL-expressible, so it is oracle-checkable; a production system would
    * swap in a character-n-gram model behind the same column signature. */
  def langId(c: Column): Column = bind(tokens(c)) { ts =>
    // One scored struct per language; array_max compares fields in order,
    // so (score, -langIndex) ranks by score with alphabetically-first
    // tiebreak — a LINEAR expression tree. (A when/otherwise fold would
    // embed the accumulator twice per level → exponential tree → Catalyst
    // planning blow-up.)
    val scored = Stopwords.sortBy(_._1).zipWithIndex.map {
      case ((lang, words), i) =>
        struct(stopwordHits(ts, words).as("s"), lit(-i).as("ni"),
          lit(lang).as("l"))
    }
    bind(array_max(array(scored: _*))) { best =>
      when(size(ts) === 0 || best.getField("s") === 0, lit("und"))
        .otherwise(best.getField("l"))
    }
  }

  /** Composite quality score in [0,1]: mean of four bounded signals —
    * length sweet-spot, alpha ratio, low punctuation, plausible mean word
    * length. Mirrors the shape of C4/Gopher-style quality filters. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(200.0), lit(1.0))
    val alpha = alphaRatio(c)
    val punct = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 4.0)
    val mwlScore = bind(meanWordLen(c)) { mwl =>
      when(mwl >= 3.0 && mwl <= 10.0, lit(1.0))
        .otherwise(greatest(lit(0.0), lit(1.0) - abs(mwl - 6.5) / 10.0))
    }
    (lenScore + alpha + punct + mwlScore) / 4.0
  }

  /** Heuristic syllable count of one (lowercased) word: the number of
    * vowel groups (`[aeiouy]+` runs) — the standard readability-formula
    * approximation, deliberately simple so any regex engine reproduces
    * it exactly. */
  def syllables(word: Column): Column =
    size(regexp_extract_all(word, lit("[aeiouy]+"), lit(0)))

  /** Classic readability scores as columns — the long-standing
    * document-difficulty heuristics often used as cheap quality/register
    * signals in corpus curation (academic vs conversational vs spam
    * text separate cleanly on them):
    *
    *  - `flesch`: Reading Ease, 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    *  - `fk_grade`: Flesch–Kincaid grade, 0.39·(W/S) + 11.8·(Y/W) − 15.59
    *  - `lix`: W/S + 100·(long words > 6 chars)/W  (Björnsson's index)
    *
    * with W = tokens, S = sentence count (runs of `[.!?]+`, floor 1 so
    * punctuation-free text counts as one sentence), Y = total vowel-group
    * syllables. Every input is an exact integer count from shared
    * regexes, so the one float expression per score is engine-exact
    * before its 6-decimal rounding. Empty documents score NULL. */
  def readabilityScores(c: Column): Seq[(String, Column)] = {
    val w = bind(tokens(c)) { ts =>
      struct(size(ts).as("w"),
        greatest(lit(1),
          size(regexp_extract_all(c, lit("[.!?]+"), lit(0)))).as("s"),
        aggregate(ts, lit(0L), (acc, t) => acc + syllables(t)).as("y"),
        size(filter(ts, t => length(t) > 6)).as("lw"))
    }
    Seq(
      "n_words" -> bind(w)(x => x.getField("w").cast("long")),
      "n_sentences" -> bind(w)(x => x.getField("s").cast("long")),
      "n_syllables" -> bind(w)(x => x.getField("y").cast("long")),
      "flesch" -> bind(w) { x =>
        when(x.getField("w") === 0, lit(null).cast("double")).otherwise(
          round(lit(206.835) -
            lit(1.015) * (x.getField("w").cast("double") /
              x.getField("s")) -
            lit(84.6) * (x.getField("y").cast("double") /
              x.getField("w")), 6))
      },
      "fk_grade" -> bind(w) { x =>
        when(x.getField("w") === 0, lit(null).cast("double")).otherwise(
          round(lit(0.39) * (x.getField("w").cast("double") /
            x.getField("s")) +
            lit(11.8) * (x.getField("y").cast("double") /
              x.getField("w")) - lit(15.59), 6))
      },
      "lix" -> bind(w) { x =>
        when(x.getField("w") === 0, lit(null).cast("double")).otherwise(
          round(x.getField("w").cast("double") / x.getField("s") +
            lit(100.0) * (x.getField("lw").cast("double") /
              x.getField("w")), 6))
      })
  }

  /** PII detection patterns, shared VERBATIM by the Spark expressions and
    * the DuckDB oracle SQL (single source → the two regex engines must
    * agree; the patterns deliberately use only portable constructs —
    * char classes and counted repetition, no backrefs or lookaround,
    * which RE2-family engines reject). Order matters for [[redactPii]]:
    * patterns apply top-down. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+[0-9][0-9()\\- ]{6,}[0-9]",
    "ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}")

  /** Per-pattern PII match counts as columns `n_<name>`, computed on the
    * raw text (before any redaction). One regex scan per pattern —
    * map-only, codegen'd. */
  def piiCounts(c: Column): Seq[(String, Column)] =
    PiiPatterns.map { case (name, pat) =>
      s"n_$name" -> size(regexp_extract_all(c, lit(pat), lit(0)))
        .cast("long")
    }

  /** Redact every PII match with `replacement`, patterns applied in
    * [[PiiPatterns]] order (email first so the ipv4 pattern can't eat a
    * dotted mail host first). Linear regexp_replace chain — map-only. */
  def redactPii(c: Column, replacement: String = "<PII>"): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, pat)) =>
      regexp_replace(acc, pat, replacement)
    }

  /** Unicode script ranges for [[scriptCounts]] — the major writing
    * systems a multilingual curation pipeline routes on. Each entry is
    * (name, regex character class), portable across Java regex and RE2
    * (DuckDB) via explicit code-point ranges. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\u00C0-\\u024F]",
    "cyrillic" -> "[\\u0400-\\u04FF]",
    "greek" -> "[\\u0370-\\u03FF]",
    "arabic" -> "[\\u0600-\\u06FF]",
    "devanagari" -> "[\\u0900-\\u097F]",
    "cjk" -> "[\\u3040-\\u30FF\\u4E00-\\u9FFF]",
    "hangul" -> "[\\uAC00-\\uD7AF]")

  /** Per-script character counts as columns `n_<script>` — the script-mix
    * signal multilingual pipelines route on (wrong-script text in a
    * language bucket is the classic crawl-labeling failure). One regex
    * scan per script, map-only, codegen'd; the DuckDB oracle replays the
    * identical code-point classes. */
  def scriptCounts(c: Column): Seq[(String, Column)] =
    ScriptRanges.map { case (name, cls) =>
      s"n_$name" -> size(regexp_extract_all(c, lit(cls), lit(0)))
        .cast("long")
    }

  /** Dominant script of a document: the script with the highest character
    * count (ties → the [[ScriptRanges]] declaration order, which ranks
    * latin first), or "none" when no script character occurs. Linear
    * expression tree via the array_max struct-ordering idiom (the same
    * shape langId uses). */
  def dominantScript(c: Column): Column = {
    val scored = ScriptRanges.zipWithIndex.map { case ((name, cls), i) =>
      struct(
        size(regexp_extract_all(c, lit(cls), lit(0))).as("n"),
        lit(-i).as("ni"), lit(name).as("s"))
    }
    bind(array_max(array(scored: _*))) { best =>
      when(best.getField("n") === 0, lit("none"))
        .otherwise(best.getField("s"))
    }
  }

  /** Distinct character n-grams (shingles) of the normalized text. */
  def charShingles(c: Column, n: Int): Column =
    bind(normalizeText(c)) { norm =>
      when(length(norm) < n, array().cast("array<string>")).otherwise(
        array_distinct(transform(
          sequence(lit(1), length(norm) - lit(n - 1)),
          i => norm.substr(i, lit(n)))))
    }

  /** Word n-grams (space-joined) of the document. */
  def wordShingles(c: Column, n: Int): Column = bind(tokens(c)) { ts =>
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(0), size(ts) - lit(n)),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  /** Winnowing-style rolling-hash fingerprint (Schleimer et al. 2003,
    * "local algorithms for document fingerprinting"): hash every k-gram,
    * keep the minimum hash of each sliding window of `w` hashes, distinct.
    * Collisions of selected hashes between documents indicate shared
    * passages. xxhash64 is Spark-deterministic (seed 42), so results are
    * stable across runs/partitions; pass
    * `graft.functions.HashExpressions.md5Long` as `hasher` for a
    * DuckDB-reproducible fingerprint. */
  def winnowingFingerprint(c: Column, k: Int = 5, w: Int = 4,
      hasher: Column => Column = xxhash64(_)): Column =
    bind(normalizeText(c)) { norm =>
      val grams = when(length(norm) < k, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), length(norm) - lit(k - 1)),
          i => norm.substr(i, lit(k))))
      bind(transform(grams, g => hasher(g))) { hashes =>
        when(size(hashes) === 0, array().cast("array<bigint>"))
          .when(size(hashes) <= w, array(array_min(hashes)))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(hashes) - lit(w - 1)),
            j => array_min(slice(hashes, j, lit(w))))))
      }
    }

  /** Pinned homoglyph pairs — the high-traffic Cyrillic/Greek → Latin
    * confusables (a deliberately small, auditable subset of Unicode
    * TR39's confusables data; the full table is data, not code). Each
    * pair is (lookalike, latin); the aligned from/to strings for
    * `translate` derive from this single source of truth. */
  val HomoglyphPairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase lookalikes
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p', 'с' -> 'c',
    'х' -> 'x', 'у' -> 'y', 'і' -> 'i', 'ѕ' -> 's', 'ј' -> 'j',
    // Cyrillic uppercase
    'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K', 'М' -> 'M',
    'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P', 'С' -> 'C', 'Т' -> 'T',
    'Х' -> 'X',
    // Greek lookalikes
    'ο' -> 'o', 'ν' -> 'v', 'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E',
    'Ζ' -> 'Z', 'Η' -> 'H', 'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M',
    'Ν' -> 'N', 'Ο' -> 'O', 'Ρ' -> 'P', 'Τ' -> 'T', 'Υ' -> 'Y',
    'Χ' -> 'X')

  private val HomoglyphFrom: String = HomoglyphPairs.map(_._1).mkString
  private val HomoglyphTo: String = HomoglyphPairs.map(_._2).mkString

  /** Fold Cyrillic/Greek lookalike characters to their Latin targets —
    * the spoof-resistance normalization for dedup/match KEYS: "pаypal"
    * with a Cyrillic а hashes differently from "paypal" through every
    * fingerprint in this library, which is exactly how adversarial
    * near-duplicates and phishing templates evade content dedup. One
    * codepoint-wise `translate` — map-only, codegen'd, replayed by
    * DuckDB's own translate in the q_homoglyph oracle. Complements
    * [[cleanText]]/[[foldAccents]]/[[repairMojibake]]: NFC fixes
    * encodings, accent folding strips marks, THIS collapses
    * cross-script identity spoofing. */
  def foldHomoglyphs(c: Column): Column =
    translate(c, HomoglyphFrom, HomoglyphTo)

  /** Count of confusable (foldable) characters in the text — the spoof
    * SIGNAL: prose legitimately written in Cyrillic/Greek is dominated
    * by non-confusable letters too, while a spoofed Latin string has a
    * few confusables embedded in ASCII. Characters, exact. */
  def homoglyphCount(c: Column): Column =
    (length(c) - length(translate(c, HomoglyphFrom, ""))).cast("long")

  /** Compression-ratio quality signal (the Dolma / RedPajama-v2 "gzip
    * ratio"): deflate-compressed bytes / raw UTF-8 bytes, rounded 6.
    * LOW (≪ typical prose ~0.3-0.5) = templated/repetitive boilerplate;
    * NEAR/ABOVE 1 = random or already-compressed bytes masquerading as
    * text. The cheap scan-time companion to the LM-based quality
    * scores — map-only, codegen'd, no shuffle; empty text → 0.0.
    * Engine-version-dependent (zlib), so spec-pinned and thresholded,
    * never oracle-hashed ([[graft.functions.TextStatsExpression
    * .deflateSize]] documents the contract). */
  def compressionRatio(c: Column): Column =
    when(coalesce(octet_length(c), lit(0)) === 0, lit(0.0))
      .otherwise(round(
        graft.functions.TextStatsExpression.deflateSize(c)
          .cast("double") / octet_length(c).cast("double"), 6))
}
