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

  /** Parse an embedded JSON-string column (event properties, crawl
    * metadata, API payloads — the semi-structured tail every corpus
    * drags along) against a PINNED schema, flattening the declared
    * fields to top-level columns plus a `json_valid` flag.
    *
    * The same two 100 TB contracts as [[readJsonl]]: the schema is
    * DECLARED (never inferred — no extra scan, no type drift between
    * batches), and malformed payloads degrade per-ROW instead of
    * poisoning the pipeline: a bad row gets NULL fields and
    * `json_valid = false` (detected via the PERMISSIVE corrupt-record
    * channel, so `{"k": null}` — parseable, null field — stays VALID
    * while `oops` does not). NULL payloads are invalid. Fields the
    * payload lacks parse to NULL without tripping validity; fields the
    * schema lacks are ignored. Map-only — `from_json` is a codegen'd
    * expression, no shuffle, no UDF. */
  def parseJsonColumn(df: DataFrame, jsonCol: String,
      schema: StructType): DataFrame = {
    val corrupt = "__corrupt"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not declare the reserved field $corrupt")
    require(!df.columns.contains("json_valid"),
      "input already has a json_valid column")
    val full = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = org.apache.spark.sql.functions.from_json(
      org.apache.spark.sql.functions.col(jsonCol), full,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> corrupt))
    import org.apache.spark.sql.functions.col
    val tmp = df.withColumn("__parsed", parsed)
    val fields = schema.fieldNames.toSeq.map(f =>
      col(s"__parsed.$f").as(f))
    tmp.select((df.columns.toSeq.map(col) ++ fields :+
        (col(jsonCol).isNotNull && col(s"__parsed.$corrupt").isNull)
          .as("json_valid")): _*)
  }
}
