package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Corpus interchange I/O: JSONL (one JSON object per line) is the
  * lingua franca of training-data pipelines — raw crawls, filtered
  * corpora and evaluation sets all ship as compressed JSONL shards.
  * Spark's JSON source handles the heavy lifting (splittable reads,
  * per-line parse, full string escaping); these wrappers pin the two
  * decisions that matter at 100 TB:
  *
  *  - **Never infer the schema.** `spark.read.json` without a schema
  *    SCANS THE WHOLE INPUT once just to guess types — at corpus scale
  *    that silently doubles the read. [[readJsonl]] requires an explicit
  *    `StructType` (malformed lines land in `_corrupt_record`-style
  *    nulls rather than poisoning the types of everything else).
  *  - **Write splittable-enough shards.** One JSONL object per line,
  *    default gzip per shard file (a shard is the parallelism unit —
  *    gzip is fine because shard count, not intra-file splitting,
  *    carries the parallelism; pick `partitions` ≈ the downstream read
  *    parallelism).
  *
  * Round-trip fidelity is exact for string/integral columns (JSON
  * escaping covers newlines, quotes and unicode) — pinned by the
  * CorpusAnalysisSpec round-trip and the q_jsonl_roundtrip oracle, which
  * hash-compares a through-JSONL copy of the corpus against the parquet
  * original. */
object CorpusIO {

  /** Write `df` as JSONL shards under `path`. `partitions` > 0
    * repartitions first (shard count = read parallelism downstream). */
  def writeJsonl(df: DataFrame, path: String,
      compression: String = "gzip", partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode("overwrite")
      .option("compression", compression)
      .json(path)
  }

  /** Read a JSONL corpus with a PINNED schema — no inference scan. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
