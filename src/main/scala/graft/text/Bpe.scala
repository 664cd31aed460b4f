package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016) — the missing piece between the corpus and the `bpeTokenCount`
  * heuristics: learn the merge table itself from data.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
  * one corpus scan aggregates (word, count) — a vocabulary-sized
  * dimension table — and every merge round then runs on that table
  * alone. That is the scale story: a 100 TB corpus costs ONE tokenize +
  * groupBy pass; the T merge rounds touch only |vocab| rows each
  * (weighted pair count + argmax + map-only merge application), so
  * training cost is corpus-linear + T·|vocab|, never T·corpus.
  *
  * Representation: a word is its symbol sequence joined by single
  * spaces, initially the word's characters with a `</w>` end-of-word
  * marker; merging pair (a, b) rewrites `' a b '` to `' ab '` by plain
  * left-to-right non-overlapping string replacement — which IS standard
  * greedy BPE application, and is the identical primitive in Spark and
  * DuckDB, so the full merge sequence replays in the oracle with ZERO
  * float arithmetic (counts are longs; ties break on (freq DESC, a ASC,
  * b ASC)).
  *
  * The per-round argmax pair is collected to the driver (one row per
  * round — merge tables are driver metadata exactly like IVF
  * centroids). */
object Bpe {

  /** Lower-cased whitespace words of the corpus with counts — the BPE
    * training table. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol string of a word: its characters space-joined, plus
    * the `</w>` marker (e.g. "low" → "l o w </w>"). */
  private def initSymbols(word: org.apache.spark.sql.Column) =
    concat(array_join(split(word, ""), " "), lit(" </w>"))

  /** Learn `merges` BPE merges from the corpus. Returns the merge table
    * as (round, pair_a, pair_b, merged, freq) with round starting at 1;
    * stops early (fewer rows) when no pair occurs twice. */
  def trainMerges(docs: DataFrame, merges: Int,
      textCol: String = "text"): Seq[(Int, String, String, String, Long)] = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    // one corpus scan; everything after runs on the vocab table.
    // LAZY checkpoints: bestPair's argmax collect is the materializing
    // action each round (consumption is sequential), so the eager
    // count() job per round was pure driver-round-trip overhead — and
    // the FINAL round's merged table, which nothing consumes, is no
    // longer materialized at all.
    var words = wordCounts(docs, textCol)
      .select(initSymbols(col("word")).as("w"), col("n"))
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= merges && !done) {
      val top = bestPair(words)
      top match {
        case Some((a, b, freq)) if freq >= 2 =>
          val merged = a + b
          out += ((round, a, b, merged, freq))
          words = words
            .select(applyMerge(col("w"), a, b).as("w"), col("n"))
            .localCheckpoint(false)
        case _ => done = true
      }
      round += 1
    }
    out.toSeq
  }

  /** Left-to-right non-overlapping replacement of `' a b '` by
    * `' ab '` on the padded symbol string — greedy BPE application.
    * Exposed so tests and the tokenizer can share it. */
  def applyMerge(w: org.apache.spark.sql.Column, a: String,
      b: String): org.apache.spark.sql.Column =
    // LITERAL replace (all occurrences, left-to-right, non-overlapping —
    // identical semantics in DuckDB; no regex, so symbols containing
    // metacharacters are safe); trim the sentinel pad afterwards
    trim(org.apache.spark.sql.functions.replace(
      concat(lit(" "), w, lit(" ")), lit(s" $a $b "), lit(s" $a$b ")))

  /** The (a, b, weighted-freq) pair with the highest corpus frequency —
    * ties to the lexicographically smallest pair (integer counts: this
    * selection is EXACT, no float order sensitivity). */
  private def bestPair(words: DataFrame): Option[(String, String, Long)] = {
    val ts = split(col("w"), " ")
    val prs = words
      .select(col("w"), col("n"),
        posexplode(slice(ts, lit(1), size(ts) - 1)).as(Seq("__p", "__a")))
      .select(col("n"), col("__a"),
        element_at(split(col("w"), " "), col("__p") + 2).as("__b"))
    prs.groupBy(col("__a"), col("__b"))
      .agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("__a").asc, col("__b").asc)
      .limit(1)
      .collect()
      .headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Tokenize with a learned merge table: per-document EXACT piece count
    * under the trained tokenizer (the production replacement for the
    * regex-heuristic `bpeTokenCount`). The merge sequence is applied to
    * the DISTINCT-WORD table only (|vocab| rows × T map-only replaces),
    * then each document joins its words against the word→pieces map and
    * sums. The corpus is scanned twice (vocab build + scoring), never T
    * times. The pieces map is NOT force-broadcast: a web-scale vocab can
    * be 10⁸ rows, so the join is left to AQE (broadcast when small,
    * shuffled hash join on the word key otherwise — both sides
    * vocab-keyed, no skew beyond natural word frequency, and the
    * aggregate's map-side partials reduce the doc side to ~1 row/doc).
    *
    * Returns (idCol, n_words, n_pieces). Documents with no tokens get
    * (0, 0). */
  def tokenCounts(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val pieces = merges.foldLeft(
        wordCounts(docs, textCol).select(col("word"),
          initSymbols(col("word")).as("w"))) {
      case (df, (_, a, b, _, _)) =>
        df.select(col("word"), applyMerge(col("w"), a, b).as("w"))
    }.select(col("word"),
      size(split(col("w"), " ")).cast("long").as("__pieces"))
    val perDoc = docs
      .select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(pieces, Seq("word"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_words"), sum(col("__pieces")).as("n_pieces"))
    docs.select(col(idCol).as("__id")).join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  /** Top-k corpus vocabulary by count — tokenizer vocab building as a
    * TakeOrderedAndProject, ties to the lexicographically smaller word. */
  def vocabTopK(docs: DataFrame, k: Int,
      textCol: String = "text"): DataFrame =
    wordCounts(docs, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)
      .select(col("word"), col("n"))

  /** Distinct-word table with counts and the merged symbol string under
    * `merges` — the shared substrate of [[pieceVocab]]/[[encodeIds]]. */
  private def mergedWords(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)],
      textCol: String): DataFrame =
    merges.foldLeft(
        wordCounts(docs, textCol).select(col("word"), col("n"),
          initSymbols(col("word")).as("w"))) {
      case (df, (_, a, b, _, _)) =>
        df.select(col("word"), col("n"), applyMerge(col("w"), a, b).as("w"))
    }

  /** Piece vocabulary of the trained tokenizer: every distinct piece of
    * the merged word table with its corpus occurrence count (token
    * occurrences × per-word multiplicity), piece id = 0-based rank by
    * (count desc, piece asc) — the deterministic id assignment a real
    * tokenizer artifact pins. The global ranking window runs over the
    * PIECE VOCABULARY (metadata scale, like the BPE merge argmax), never
    * over corpus rows. */
  def pieceVocab(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)],
      textCol: String = "text"): DataFrame =
    pieceVocabFromWords(mergedWords(docs, merges, textCol))

  private def pieceVocabFromWords(words: DataFrame): DataFrame =
    // the piece table is bounded by construction: every piece is either
    // a single character or the product of one of the ≤|merges| learned
    // merges — a tokenizer-vocab-sized table, never corpus-sized
    words
      .select(col("n"), explode(split(col("w"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("n_occ"))
      .withColumn("pid", row_number().over(
        graft.functions.BoundedWindow
          .ordered(col("n_occ").desc, col("piece").asc))
        .cast("long") - 1)

  /** Per-document piece-ID SEQUENCE under the trained tokenizer — the
    * actual encode step a training pipeline materializes (ids in token
    * order, comma-joined). Two vocabulary-bounded maps do all the work:
    * word → its in-order piece-id CSV (pieces posexploded, ids joined,
    * reassembled per word), then documents posexplode their tokens and
    * reassemble per doc — each reassembly is one groupBy over
    * (position, fragment) structs, the removeRepeatedLines rebuild
    * pattern, with row width bounded by the word/document length. Empty
    * documents encode to ("", 0 pieces). */
  def encodeIds(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    encodeWithVocab(docs, merges, textCol, idCol)._1

  /** [[encodeIds]] plus the [[pieceVocab]] of the SAME trained
    * tokenizer, computed off ONE shared merged-word checkpoint — an
    * encode-then-decode round-trip otherwise re-runs the corpus
    * word-count scan and the full merge chain a second time just to
    * rebuild the identical vocabulary (the q_bpe_decode shape). The
    * returned frames are exactly `encodeIds(...)` and
    * `pieceVocab(...)` — both are pure functions of (docs, merges). */
  def encodeWithVocab(docs: DataFrame,
      merges: Seq[(Int, String, String, String, Long)],
      textCol: String = "text", idCol: String = "doc_id")
      : (DataFrame, DataFrame) = {
    val words = mergedWords(docs, merges, textCol).localCheckpoint(true)
    val fullVocab = pieceVocabFromWords(words)
    val vocab = fullVocab.select(col("piece"), col("pid"))
    val wordIds = words
      .select(col("word"), posexplode(split(col("w"), " "))
        .as(Seq("pos", "piece")))
      .join(vocab, Seq("piece"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_p"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("pid")))),
          s => s.getField("pid").cast("string")), ",").as("wids"))
    val perDoc = docs
      .select(col(idCol).as("__id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("tpos", "word")))
      .join(wordIds, Seq("word"))
      .groupBy(col("__id"))
      .agg(sum(col("n_p")).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("tpos"), col("wids")))),
          s => s.getField("wids")), ",").as("ids"))
    val encoded = docs.select(col(idCol).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("ids"), lit("")).as("ids"))
    (encoded, fullVocab)
  }

  /** DECODE — the inverse of [[encodeIds]], closing the tokenizer
    * round-trip a serving/inspection path needs: piece-id CSVs back to
    * text. Ids split and look their pieces up in the (broadcast,
    * vocabulary-bounded) id→piece table, reassemble in sequence order
    * (the removeRepeatedLines rebuild pattern — one groupBy over
    * (position, piece) structs, row width bounded by the sequence
    * length), then the `</w>` end-of-word markers become spaces.
    * Exact contract: `decode(encode(doc)) = the lower-cased whitespace-
    * normalized document` (tokenization is lossy by design — case and
    * whitespace runs don't survive; the PIECES round-trip losslessly).
    * Empty sequences decode to "". */
  def decodeIds(encoded: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", idsCol: String = "ids"): DataFrame = {
    val v = broadcast(vocab.select(col("pid"), col("piece")))
    val joined = encoded
      .filter(length(col(idsCol)) > 0)
      .select(col(idCol).as("__id"),
        posexplode(split(col(idsCol), ",")).as(Seq("__pos", "__pid_s")))
      .select(col("__id"), col("__pos"),
        col("__pid_s").cast("long").as("pid"))
      .join(v, Seq("pid"))
      .groupBy(col("__id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("piece")))),
        s => s.getField("piece")), "").as("__joined"))
    encoded.select(col(idCol).as("__id")).join(joined, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(trim(regexp_replace(col("__joined"), "</w>", " ")),
          lit("")).as("text"))
  }
}
