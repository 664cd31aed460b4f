package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted keyword-taxonomy topic routing — the cheap first-stage domain
  * classifier curation pipelines run before any model-based scorer
  * (mixture bookkeeping, topic quotas, taxonomy-conditioned sampling all
  * key on it). Each topic is a list of (keyword, weight); a document's
  * topic score is `Σ weight · count(keyword)` on word boundaries over the
  * lowercased text, and its topic is the argmax (ties break to the
  * alphabetically-first topic; all-zero scores route to `unknown`).
  *
  * Scale: pure per-row scalar regex counting — map-only, zero shuffle,
  * codegen'd `regexp_count`, taxonomy compiled into the expression tree
  * (topics are dozens, not millions — a taxonomy that IS data-sized
  * should be a broadcast join against an exploded token stream instead).
  */
object Taxonomy {

  val UnknownTopic = "unknown"

  /** Manual metachar escape (no `\Q...\E` — kept to the RE2-portable
    * subset the DuckDB oracle shares). */
  private def regexEscape(kw: String): String =
    kw.flatMap(c =>
      if (c.isLetterOrDigit || c == '_') c.toString else "\\" + c)

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Word-boundary occurrence count of `kw` in lowercased text. `\b` only
    * binds where the keyword's own edge is a word character ("c++" gets a
    * leading boundary but no trailing one — a boundary after '+' can
    * never match). */
  private def kwCount(textC: Column, kw: String): Column = {
    require(kw.nonEmpty, "empty keyword")
    val pre = if (isWordChar(kw.head)) "\\b" else ""
    val suf = if (isWordChar(kw.last)) "\\b" else ""
    regexp_count(lower(textC), lit(pre + regexEscape(kw) + suf))
  }

  /** One integer score column per topic. */
  def scoreColumns(textC: Column,
      taxonomy: Seq[(String, Seq[(String, Int)])]): Seq[(String, Column)] =
    taxonomy.map { case (topic, kws) =>
      val score = kws.map { case (kw, w) => kwCount(textC, kw) * lit(w) }
        .reduce(_ + _).cast("long")
      (s"score_$topic", score)
    }

  /** Append `score_<topic>` columns and the argmax `topic` column. */
  def assignTopics(docs: DataFrame, textCol: String,
      taxonomy: Seq[(String, Seq[(String, Int)])]): DataFrame = {
    require(taxonomy.nonEmpty, "taxonomy must have at least one topic")
    require(taxonomy.map(_._1).distinct.size == taxonomy.size,
      "duplicate topic names")
    val scores = scoreColumns(col(textCol), taxonomy)
    val withScores = scores.foldLeft(docs) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
    val ordered = taxonomy.map(_._1).sorted
    val maxScore = ordered.map(t => col(s"score_$t"))
      .reduce((a, b) => greatest(a, b))
    // alphabetical first-match on the max keeps ties deterministic and
    // replayable as a SQL CASE
    val pick = ordered.foldRight(lit(UnknownTopic): Column) { (t, rest) =>
      when(col(s"score_$t") === maxScore, lit(t)).otherwise(rest)
    }
    withScores.withColumn("topic",
      when(maxScore === 0, lit(UnknownTopic)).otherwise(pick))
  }
}
