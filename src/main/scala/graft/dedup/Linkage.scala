package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StringSimilarityExpressions.jaroWinkler
import graft.text.TextAnalysis.normalizeText

/** Blocked fuzzy record linkage — entity resolution over short keys
  * (names, titles, addresses) where token/shingle dedup is the wrong
  * granularity and Levenshtein the wrong metric (length-biased, no
  * prefix weighting).
  *
  * Classic two-stage shape: a cheap deterministic BLOCKING key bounds the
  * candidate space (pairs only ever form inside a block — the shuffle is
  * one equi-join on the block key, linear in rows), then the native
  * Jaro-Winkler kernel verifies candidates. The quadratic term is
  * confined to single blocks, exactly like the LSH band buckets in
  * [[Dedup.minhashLshPairs]]; `maxBlockSize` drops degenerate blocks
  * (e.g. an empty-name block) the way the LSH path caps buckets.
  */
object Linkage {

  /** Blocking key: (first character, length bucket) of the normalized
    * key — the standard first-pass blocking for name linkage. */
  private def blockKey(norm: org.apache.spark.sql.Column,
      lenBucket: Int): org.apache.spark.sql.Column =
    concat_ws("|", substring(norm, 1, 1),
      floor(length(norm) / lenBucket).cast("string"))

  /** All within-block pairs (`id_a < id_b`) whose Jaro-Winkler similarity
    * (rounded to 6 decimals — the repo's cross-engine float convention)
    * reaches `threshold`. Output: (id_a, id_b, jw). */
  def fuzzyLinkPairs(df: DataFrame, keyCol: String, idCol: String,
      threshold: Double, lenBucket: Int = 4,
      maxBlockSize: Int = 100000): DataFrame = {
    require(threshold >= 0 && threshold <= 1,
      s"threshold must be in [0,1], got $threshold")
    val keyed = df.select(col(idCol).as("__id"),
        normalizeText(col(keyCol)).as("__k"))
      .withColumn("__blk", blockKey(col("__k"), lenBucket))
    val sized = keyed.join(
      keyed.groupBy("__blk").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockSize)
        .select("__blk"),
      "__blk")
    sized.as("a").join(sized.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        round(jaroWinkler(col("a.__k"), col("b.__k")), 6).as("jw"))
      .filter(col("jw") >= threshold)
  }
}
