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
}
