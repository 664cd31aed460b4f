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

  test("funnel: strict ordering, window bound, first-touch conversion") {
    val events = Seq(
      // user 1 converts fully: view@0 → click@1 → purchase@2
      (1L, 0.0, "view"), (1L, 1.0, "click"), (1L, 2.0, "purchase"),
      // user 2: click BEFORE view — not a conversion; no click after
      (2L, 1.0, "click"), (2L, 2.0, "view"),
      // user 3: click outside the 7-day window
      (3L, 0.0, "view"), (3L, 8.0, "click"),
      // user 4: click at the SAME ts as view — strict > excludes it;
      // a later in-window click converts (first-touch = min qualifying)
      (4L, 0.0, "view"), (4L, 0.0, "click"), (4L, 3.0, "click"),
      // user 5: purchase without click never counts for step 3
      (5L, 0.0, "view"), (5L, 1.0, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.Funnel.funnel(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), window = 7.0)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSet
    // all 5 users have a view (user 2's comes after their click, which
    // counts for step 1 but not the click-after-view conversion)
    assert(got === Set((1, "view", 5L), (2, "click", 2L),
      (3, "purchase", 1L)))
    // window boundary is inclusive: click exactly at t+7 converts
    val boundary = Seq((9L, 0.0, "view"), (9L, 7.0, "click"))
      .toDF("user_id", "ts", "event_type")
    val b = graft.operators.Funnel.funnel(boundary, "user_id", "ts",
        "event_type", Seq("view", "click"), window = 7.0)
      .filter(col("step") === 2).head.getLong(2)
    assert(b === 1L)
  }

  test("plan guards: heavy hitters take-ordered, retention expand-free, " +
      "corpus stats single-exchange") {
    val hh = SparkEntry.queries("q_heavy_hitters")(spark, sf0001)
    assert(hh.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "top-k terms must never globally sort the term table")
    val rt = SparkEntry.queries("q_retention")(spark, sf0001)
    assert(!rt.queryExecution.executedPlan.toString.contains("Expand"),
      "retention must count pre-distinct pairs, not plan a countDistinct " +
        "expand")
    val cs = SparkEntry.queries("q_corpus_stats")(spark, sf0001)
    assert("Exchange hashpartitioning".r
      .findAllIn(cs.queryExecution.executedPlan.toString).length === 1,
      "corpus stats is one aggregation exchange")
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
