package graft

import graft.text.Indexing
import graft.operators.Retention
import org.apache.spark.sql.functions._

/** Corpus indexing (heavy hitters, inverted index) and cohort retention. */
class IndexingRetentionSpec extends SparkSuite {

  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a dog"),
    (4L, "   "), // whitespace-only → no tokens
    (5L, "THE The the")) // case-folds into 'the'
    .toDF("doc_id", "text")

  test("topKTerms: exact counts, tf-then-term order, k bound") {
    val got = Indexing.topKTerms(docs, "doc_id", "text", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // 'the': tf 2+1+3 = 6 across docs 1,2,5; 'sat' and 'cat' and 'a' and
    // 'dog' tie at tf 2 → term-ascending breaks ties
    assert(got === Seq(("the", 6L, 3L, 1L), ("a", 2L, 1L, 2L),
      ("cat", 2L, 2L, 3L)))
  }

  test("invertedIndex: exact df/tf, capped ascending postings, minDf") {
    val all = Indexing.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(all("the") === ((3L, 6L, "1,2,5")))
    assert(all("dog") === ((2L, 2L, "2,3")))
    assert(all("a") === ((1L, 2L, "3")))
    // cap keeps the LOWEST ids
    val capped = Indexing.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2)
      .filter(col("term") === "the").head.getString(3)
    assert(capped === "1,2")
    // minDf drops the tail; surviving rows unchanged
    val filtered = Indexing.invertedIndex(docs, "doc_id", "text",
        minDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(filtered === Set("the", "cat", "sat", "dog"))
  }

  test("invertedIndex plan uses the bounded-heap aggregate, not collect_list") {
    val plan = Indexing.invertedIndex(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by"), s"no bounded top-k in plan:\n$plan")
    assert(!plan.contains("collect_list"),
      s"unbounded collect_list in plan:\n$plan")
  }

  test("cohortRetention: first-bucket cohorts, per-bucket distinct users") {
    val events = Seq(
      // user 10: weeks 0,0,1,3 — cohort 0, offsets {0,1,3}
      (10L, 0L), (10L, 0L), (10L, 1L), (10L, 3L),
      // user 11: weeks 1,2 — cohort 1, offsets {0,1}
      (11L, 1L), (11L, 2L),
      // user 12: week 1 only — cohort 1, offset {0}
      (12L, 1L))
      .toDF("user_id", "week")
    val got = Retention.cohortRetention(events, "user_id", col("week"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 2L, (1L, 1L) -> 1L))
    // offset-0 row equals cohort size by construction
    assert(got((1L, 0L)) === 2L)
  }
}
