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
}
