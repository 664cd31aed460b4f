package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/RAG preprocessing
  * step that turns long documents into fixed-size overlapping passages
  * (each chunk then flows into the embedding / ANN / BM25 operators this
  * library already has).
  *
  * Token basis is the same lower-cased whitespace tokenization as the
  * rest of the text layer ([[TextAnalysis.tokens]]); chunk text is the
  * tokens re-joined with single spaces, so internal whitespace runs are
  * normalized (documented — chunking is a *derived* view, byte-exact
  * reconstruction is not its contract).
  *
  * Chunk i (0-based) covers tokens [i·stride, i·stride + chunkTokens)
  * with stride = chunkTokens − overlapTokens; the last chunk may be
  * shorter but is never empty, and a document shorter than one chunk
  * yields exactly one chunk. Empty documents yield no rows.
  *
  * Scale design: one map-only pass — tokenize, build the per-doc chunk
  * array, posexplode. No shuffle, no window; output rows ≈ n_tokens /
  * stride per document regardless of document count. */
object Chunking {

  /** Sentence segmentation — the unit every bitext miner, dense
    * retriever and sentence-embedding pipeline actually operates on
    * (documents are too coarse for margin mining; tokens too fine).
    * Boundaries are runs of `[.!?]+` — the SAME definition the
    * readability scores count sentences with, so "n_sentences" and
    * "rows out of splitSentences" agree by construction. Segments are
    * space-trimmed; empty segments (leading punctuation, `..`) drop;
    * indices are 1-based in document order. Map-only: split +
    * higher-order filter + posexplode, no shuffle, no UDF.
    * Returns (idCol, sentence_idx, sentence, n_tokens). */
  def splitSentences(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val parts = filter(
      transform(split(col(textCol), "[.!?]+"), x => trim(x)),
      x => x =!= "")
    docs.select(col(idCol), posexplode(parts).as(Seq("__p", "sentence")))
      .select(col(idCol),
        (col("__p") + 1).cast("int").as("sentence_idx"),
        col("sentence"),
        TextAnalysis.wsTokenCount(col("sentence")).as("n_tokens"))
  }

  /** Per-document chunk rows: (idCol, chunk_id, n_chunk_tokens,
    * chunk_text). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val t = TextAnalysis.tokens(col(textCol))
    val n = size(t)
    // number of windows whose start < n and that add ≥1 NEW token:
    // 1 + ceil((n − chunk)/stride) for n > chunk, else 1 (n > 0)
    val nchunks = when(n === 0, lit(0))
      .when(n <= chunkTokens, lit(1))
      .otherwise((ceil((n - lit(chunkTokens)).cast("double") / stride) +
        1).cast("int"))
    val chunks = transform(sequence(lit(0), nchunks - 1),
      i => slice(t, i * stride + 1, lit(chunkTokens)))
    docs
      .select(col(idCol), posexplode(
        when(n === 0, array().cast("array<array<string>>"))
          .otherwise(chunks)).as(Seq("chunk_id", "__toks")))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        size(col("__toks")).cast("long").as("n_chunk_tokens"),
        array_join(col("__toks"), " ").as("chunk_text"))
  }

  /** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * with probability `rate`, a document is rewritten in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — by cutting at two
    * character positions, teaching an autoregressive model to infill.
    * The standard augmentation for code-model pretraining data.
    *
    * Everything is DETERMINISTIC from the seeded md5 uniforms of the
    * document id (the [[graft.operators.Sampling.hashUniform]] family —
    * apply decision on `seed`, the two cuts on `seed+1`/`seed+2`, cut
    * position = floor(u·(len+1)) ∈ [0, len]), so the augmentation is
    * reproducible across runs/layouts/engines and the q_fim oracle
    * replays every cut. Map-only — pure string arithmetic, no shuffle;
    * non-selected docs pass through with `fim_applied = false`.
    *
    * Returns (idCol, fim_applied, cut_a, cut_b, text_out). */
  def fimTransform(docs: org.apache.spark.sql.DataFrame,
      rate: Double = 0.5, seed: Long = 42L,
      textCol: String = "text", idCol: String = "doc_id",
      preTok: String = "<PRE>", sufTok: String = "<SUF>",
      midTok: String = "<MID>"): org.apache.spark.sql.DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    import graft.operators.Sampling.hashUniform
    val len = length(col(textCol))
    val applied = hashUniform(col(idCol), seed) < rate
    val u1 = hashUniform(col(idCol), seed + 1)
    val u2 = hashUniform(col(idCol), seed + 2)
    val cutA = floor(least(u1, u2) * (len + 1)).cast("long")
    val cutB = floor(greatest(u1, u2) * (len + 1)).cast("long")
    val prefix = col(textCol).substr(lit(1), cutA.cast("int"))
    val middle = col(textCol).substr((cutA + 1).cast("int"),
      (cutB - cutA).cast("int"))
    val suffix = col(textCol).substr((cutB + 1).cast("int"),
      (len - cutB).cast("int"))
    docs.select(col(idCol),
      applied.as("fim_applied"),
      when(applied, cutA).as("cut_a"),
      when(applied, cutB).as("cut_b"),
      when(applied, concat(lit(preTok), prefix, lit(sufTok), suffix,
        lit(midTok), middle)).otherwise(col(textCol)).as("text_out"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) with FIXED
    * span blocks: whitespace tokens group into consecutive blocks of
    * `spanLen`; each block masks independently with probability `rate`
    * (seeded md5 uniform of (doc, block) — deterministic, replayable);
    * the INPUT text replaces each masked block with an ordinal sentinel
    * `<extra_id_k>` and the TARGET lists each sentinel followed by the
    * tokens it hid, closed by the final sentinel — exactly the
    * denoising-objective input/target pair, with the reference's
    * variable-length span sampling simplified to fixed blocks so every
    * decision is a pure per-block expression (no sequential state) and
    * the q_span_corrupt oracle replays it token-for-token.
    *
    * Map-only: tokens, block flags, sentinel numbering (a prefix count
    * over ≤ blocks² lambda steps — document-bounded) and both
    * reassemblies are higher-order array expressions per row; nothing
    * shuffles. Returns (idCol, n_tokens, n_masked_tokens, input_text,
    * target_text). */
  def spanCorrupt(docs: org.apache.spark.sql.DataFrame,
      rate: Double = 0.15, spanLen: Int = 3, seed: Long = 42L,
      textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    require(spanLen >= 1, s"spanLen must be >= 1: $spanLen")
    import graft.operators.Sampling.hashUniform
    def bind(c: Column)(f: Column => Column): Column =
      element_at(transform(array(c), f), 1)
    val ts = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val out = bind(ts) { t =>
      val n = size(t)
      val nblocks = ceil(n.cast("double") / spanLen).cast("int")
      // empty docs: zero blocks — guard every sequence() behind it
      val blockIdx = when(nblocks === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), nblocks - 1, lit(1)))
      bind(transform(blockIdx,
        j => hashUniform(concat_ws("#", col(idCol), j), seed) <
          rate)) { flags =>
        // sentinel ordinal of block j = masked blocks before j
        val sentIdx = (j: Column) =>
          size(filter(slice(flags, lit(1), j), f => f))
        val blockToks = (j: Column) => slice(t, j * spanLen + 1,
          lit(spanLen))
        val inputToks = flatten(transform(blockIdx,
          j => when(element_at(flags, j + 1),
            array(concat(lit("<extra_id_"), sentIdx(j), lit(">"))))
            .otherwise(blockToks(j))))
        val targetToks = flatten(transform(blockIdx,
          j => when(element_at(flags, j + 1),
            concat(array(concat(lit("<extra_id_"), sentIdx(j),
              lit(">"))), blockToks(j)))
            .otherwise(array().cast("array<string>"))))
        val nMasked = size(filter(flags, f => f))
        struct(
          n.cast("long").as("n_tokens"),
          aggregate(blockIdx, lit(0L),
            (acc, j) => acc + when(element_at(flags, j + 1),
              size(blockToks(j)).cast("long")).otherwise(lit(0L)))
            .as("n_masked_tokens"),
          array_join(inputToks, " ").as("input_text"),
          when(nMasked === 0, array_join(targetToks, " "))
            .otherwise(concat(array_join(targetToks, " "), lit(" "),
              lit("<extra_id_"), nMasked, lit(">")))
            .as("target_text"))
      }
    }
    docs.select(col(idCol), out.as("__o"))
      .select(col(idCol), col("__o.n_tokens").as("n_tokens"),
        col("__o.n_masked_tokens").as("n_masked_tokens"),
        col("__o.input_text").as("input_text"),
        col("__o.target_text").as("target_text"))
  }

  /** BERT-style MLM masking (Devlin et al. 2018 §3.1) — the third
    * classic augmentation next to [[fimTransform]] and [[spanCorrupt]]:
    * each whitespace token is SELECTED with probability `rate`
    * (seeded md5 uniform of (doc, position) — deterministic,
    * replayable); a selected token becomes `maskTok` 80% of the time,
    * a RANDOM token 10% (drawn deterministically from the document's
    * own token multiset — the distributed stand-in for a vocab draw;
    * no broadcast, no shuffle), and stays itself 10% (the
    * keep-but-predict case). `labels` records every selected position
    * as `pos:original` — the MLM prediction targets.
    *
    * Map-only: every decision is a pure per-(doc, position) expression
    * over the token array; nothing shuffles, nothing is sequential.
    * Returns (idCol, n_tokens, n_selected, n_mask, n_random,
    * text_masked, labels). */
  def mlmMask(docs: org.apache.spark.sql.DataFrame, rate: Double = 0.15,
      seed: Long = 42L, textCol: String = "text",
      idCol: String = "doc_id", maskTok: String = "[MASK]")
      : org.apache.spark.sql.DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    import graft.operators.Sampling.hashUniform
    def bind(c: Column)(f: Column => Column): Column =
      element_at(transform(array(c), f), 1)
    val ts = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val out = bind(ts) { t =>
      val n = size(t)
      val idx = when(n === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(1), n, lit(1)))
      bind(transform(idx, i => {
        val key = concat_ws("#", col(idCol), i)
        val sel = hashUniform(key, seed) < rate
        val u2 = hashUniform(key, seed + 1)
        val u3 = hashUniform(key, seed + 2)
        val tok = element_at(t, i)
        struct(
          when(!sel, tok)
            .when(u2 < 0.8, lit(maskTok))
            .when(u2 < 0.9,
              element_at(t, (lit(1) + floor(u3 * n)).cast("int")))
            .otherwise(tok).as("out"),
          sel.as("sel"),
          (sel && u2 < 0.8).as("is_mask"),
          (sel && u2 >= 0.8 && u2 < 0.9).as("is_rand"),
          when(sel, concat(i.cast("string"), lit(":"), tok)).as("lab"))
      })) { dec =>
        struct(n.cast("long").as("n_tokens"),
          size(filter(dec, x => x.getField("sel"))).cast("long")
            .as("n_selected"),
          size(filter(dec, x => x.getField("is_mask"))).cast("long")
            .as("n_mask"),
          size(filter(dec, x => x.getField("is_rand"))).cast("long")
            .as("n_random"),
          array_join(transform(dec, x => x.getField("out")), " ")
            .as("text_masked"),
          array_join(filter(transform(dec, x => x.getField("lab")),
            x => x.isNotNull), " ").as("labels"))
      }
    }
    docs.select(col(idCol), out.as("__o"))
      .select(col(idCol), col("__o.n_tokens").as("n_tokens"),
        col("__o.n_selected").as("n_selected"),
        col("__o.n_mask").as("n_mask"),
        col("__o.n_random").as("n_random"),
        col("__o.text_masked").as("text_masked"),
        col("__o.labels").as("labels"))
  }
}
