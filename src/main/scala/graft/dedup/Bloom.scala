package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketch — the PRE-FILTER in front of every
  * incremental-dedup index probe at corpus scale: a new batch's keys
  * are checked against a compact bit-array snapshot of the seen-set
  * FIRST, and only the `maybe_seen` survivors pay the exact index
  * join. At 100 TB the exact index is tens of billions of rows; the
  * sketch is `m` BITS (2²⁵ bits = 4 MB covers 10⁸ keys at ~1% FP with
  * k=7) — broadcastable where the index is not. No false negatives by
  * construction; false positives only cost a wasted exact probe.
  *
  * Determinism contract (the library-wide md5 idiom): position i of a
  * key is `md5Long(key + "#" + i) & (m-1)` — `m` is required to be a
  * power of two so the unsigned modulus is a BITWISE AND, which signed
  * two's-complement longs evaluate identically in Spark and DuckDB
  * (no signed/unsigned `%` divergence). The whole sketch — every bit,
  * every false positive — is therefore bit-replayable cross-engine,
  * and the q_bloom_probe oracle rebuilds it from scratch in SQL.
  *
  * Scale shape: the BUILD is one explode (k rows per key) + one
  * map-side-partial `bit_or` aggregate onto ≤ m/64 rows — the grid is
  * metadata, never row data. The PROBE joins the (broadcast) grid on
  * the word index and folds `bool_and` over the k probes per key —
  * two map-side-partial aggregates, no windows, nothing key-count
  * sized on the driver.
  */
object Bloom {

  /** Bit positions of `key` in a size-`m` filter: array of k longs in
    * `[0, m)`. `m` must be a power of two (enforced by callers). */
  private def positions(key: Column, m: Long, k: Int): Column =
    array((0 until k).map(i =>
      graft.functions.HashExpressions
        .md5Long(concat(key, lit("#" + i)))
        .bitwiseAND(lit(m - 1L))): _*)

  private def requireParams(m: Long, k: Int): Unit = {
    require(m >= 64 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 64, got $m")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
  }

  /** Build the filter over `keyCol`: returns the word grid
    * (word_idx: long in [0, m/64), word: long) — only words with at
    * least one set bit appear (absent word = 0). One explode + one
    * bit_or aggregate; output ≤ m/64 rows regardless of key count. */
  def build(df: DataFrame, keyCol: String, m: Long = 1L << 22,
      k: Int = 7): DataFrame = {
    requireParams(m, k)
    df.select(explode(positions(col(keyCol), m, k)).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST((__pos & 63) AS INT))")
          .as("__mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__mask)").as("word"))
  }

  /** Probe the filter: adds `maybe_seen` (true iff ALL k bits are set
    * — no false negatives; false positives at the standard
    * `(1-e^{-kn/m})^k` rate). `bloom` is the [[build]] grid for the
    * SAME (m, k). The grid (≤ m/64 rows) broadcasts; each key folds
    * its k probes with bool_and. */
  def probe(df: DataFrame, keyCol: String, idCol: String,
      bloom: DataFrame, m: Long = 1L << 22, k: Int = 7): DataFrame = {
    requireParams(m, k)
    val probes = df
      .select(col(idCol), explode(positions(col(keyCol), m, k))
        .as("__pos"))
      .select(col(idCol), shiftright(col("__pos"), 6).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST((__pos & 63) AS INT))")
          .as("__mask"))
    val hits = probes
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .select(col(idCol),
        (coalesce(col("word"), lit(0L)).bitwiseAND(col("__mask")) =!=
          lit(0L)).as("__hit"))
      .groupBy(col(idCol))
      .agg(expr("bool_and(__hit)").as("maybe_seen"))
    df.join(hits, Seq(idCol), "left")
      .withColumn("maybe_seen", coalesce(col("maybe_seen"), lit(false)))
  }
}
