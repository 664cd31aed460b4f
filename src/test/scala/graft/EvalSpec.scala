package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.Eval

/** Round-7 session-4 additions: classifier evaluation (tie-aware ROC AUC
  * + confusion metrics) and dedup telemetry (per-source duplication
  * profile, duplicate-cluster size histogram). */
class EvalSpec extends SparkSuite {

  // ------------------------------------------------- Eval.binaryMetrics

  test("eval: perfect separation scores auc 1 and a clean confusion") {
    import spark.implicits._
    val scored = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Long]("tp") === 2L)
    assert(r.getAs[Long]("fp") === 0L)
    assert(r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Double]("precision") === 1.0)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("f1") === 1.0)
    assert(r.getAs[Double]("accuracy") === 1.0)
  }

  test("eval: midrank tie handling matches the hand-computed rank-sum") {
    import spark.implicits._
    // pos scores {0.5, 0.7, 0.5}, neg {0.5, 0.3}:
    // pairwise wins 4 + one tie pair at 0.5 counted twice as 0.5 each
    // -> AUC = 5/6; at 0.5: tp=3 fp=1 tn=1 fn=0
    val scored = Seq((0.5, 1), (0.5, 0), (0.3, 0), (0.7, 1), (0.5, 1))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Double]("auc") === 0.833333)
    assert(r.getAs[Long]("tp") === 3L)
    assert(r.getAs[Long]("fp") === 1L)
    assert(r.getAs[Long]("tn") === 1L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Double]("precision") === 0.75)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("f1") === 0.857143)
    assert(r.getAs[Double]("accuracy") === 0.8)
  }

  test("eval: single-class input nulls the auc, not the confusion") {
    import spark.implicits._
    val allPos = Seq((0.9, 1), (0.2, 1)).toDF("score", "label")
    val r = Eval.binaryMetrics(allPos, "score", "label").collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")))
    assert(r.getAs[Long]("tp") === 1L)
    assert(r.getAs[Long]("fn") === 1L)
    assert(r.getAs[Double]("recall") === 0.5)
    // no predicted or actual negatives -> tn = fp = 0, accuracy still real
    assert(r.getAs[Double]("accuracy") === 0.5)
  }

  test("eval: NULL labels and scores are excluded, not counted") {
    import spark.implicits._
    val scored = Seq((Some(0.9), Some(1)), (Some(0.1), None),
        (None, Some(0)), (Some(0.2), Some(0)))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") === 1L)
    assert(r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Double]("auc") === 1.0)
  }

  test("eval: scores collapse onto the rounding grid before ranking") {
    import spark.implicits._
    // 1e-9 apart -> same grid cell -> a tie, AUC 0.5, not 1.0
    val scored = Seq((0.5000000001, 1), (0.5000000004, 0))
      .toDF("score", "label")
    val r = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("eval: layout-invariant (repartition changes nothing)") {
    import spark.implicits._
    val scored = (1 to 400).map { i =>
      (math.floor((i * 37 % 100) / 100.0 * 1e6) / 1e6,
        if (i * 53 % 7 < 3) 1 else 0)
    }.toDF("score", "label")
    val a = Eval.binaryMetrics(scored, "score", "label").collect()(0)
    val b = Eval.binaryMetrics(scored.repartition(13), "score", "label")
      .collect()(0)
    assert(a === b)
  }

  // -------------------------------------------- Dedup.duplicationProfile

  test("dup profile: per-source stats, sentinel for NULL sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello  World", Some("a")), // normalized-dup of 2
      (2L, "hello world", Some("a")),
      (3L, "hello world", Some("a")), // triple within a
      (4L, "unique one", Some("a")),
      (5L, "x", Some("b")),
      (6L, "y", Some("b")),
      (7L, "z", None),
      (8L, "z", None)).toDF("doc_id", "text", "source")
    val rows = Dedup.duplicationProfile(docs, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_docs") === 4L)
    assert(a.getAs[Long]("n_distinct") === 2L)
    assert(a.getAs[Long]("n_dup_docs") === 2L)
    assert(a.getAs[Double]("dup_rate") === 0.5)
    assert(a.getAs[Long]("max_group") === 3L)
    val b = rows("b")
    assert(b.getAs[Long]("n_dup_docs") === 0L)
    assert(b.getAs[Double]("dup_rate") === 0.0)
    val n = rows(graft.operators.Sampling.NullStratum)
    assert(n.getAs[Long]("n_docs") === 2L)
    assert(n.getAs[Long]("n_distinct") === 1L)
  }

  // ---------------------------------------------- Dedup.dupSizeHistogram

  test("dup histogram: cross-source groups count once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared", "a"), (2L, "shared", "b"), // one size-2 group
      (3L, "t", "a"), (4L, "t", "a"), (5L, "t", "b"), // one size-3 group
      (6L, "u1", "a"), (7L, "u2", "b")) // two singletons
      .toDF("doc_id", "text", "source")
    val rows = Dedup.dupSizeHistogram(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows(1L) === ((2L, 2L)))
    assert(rows(2L) === ((1L, 2L)))
    assert(rows(3L) === ((1L, 3L)))
    assert(rows.size === 3)
  }
}
