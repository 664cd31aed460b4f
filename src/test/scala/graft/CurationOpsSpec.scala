package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sessionize}
import graft.text.Chunking

/** Round-6 curation additions: DSIR importance resampling, RAG chunking,
  * gap sessionization. */
class CurationOpsSpec extends SparkSuite {

  // ----------------------------------------------------------------- DSIR

  test("dsir: buckets are in range and deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val b = docs.select(explode(Dsir.hashedBigramBuckets(col("text"))))
      .as[Long].collect()
    assert(b.length === 4) // 5 tokens -> 4 bigrams, multiplicity kept
    assert(b.forall(x => x >= 0 && x < 4096))
    // "a b" occurs twice -> identical bucket both times
    val again = docs.select(explode(Dsir.hashedBigramBuckets(col("text"))))
      .as[Long].collect()
    assert(b.toSeq === again.toSeq)
  }

  test("dsir: in-target-distribution doc outweighs out-of-distribution") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox leaps over the lazy cat"),
      (3L, "zzq qqz zqq qzz zqz qzq zzz qqq zq qz")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 1L)
    val w = Dsir.importanceLogWeights(docs, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L)) // target doc itself beats gibberish
    assert(w(2L) > w(3L)) // near-target beats gibberish
  }

  test("dsir: log weight matches a driver-side recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma delta"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") <= 2L)
    val feats = docs.select(col("doc_id"),
        explode(Dsir.hashedBigramBuckets(col("text"))).as("f"))
      .as[(Long, Long)].collect()
    val tgt = feats.filter(_._1 <= 2L)
    val rawC = feats.groupBy(_._2).map { case (f, xs) => f -> xs.length }
    val tgtC = tgt.groupBy(_._2).map { case (f, xs) => f -> xs.length }
    val rn = feats.length.toDouble; val tn = tgt.length.toDouble
    def lr(f: Long): Double =
      math.log((tgtC.getOrElse(f, 0) + 1.0) / (tn + 4096.0)) -
        math.log((rawC(f) + 1.0) / (rn + 4096.0))
    val expected = feats.filter(_._1 == 1L).map(x => lr(x._2)).sum
    val got = Dsir.importanceLogWeights(docs, target)
      .filter(col("doc_id") === 1L).collect().head.getDouble(2)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("dsir: empty and sub-bigram docs get weight 0; resample contract") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, ""), (3L, "two words"),
      (4L, "more words here")).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") === 4L)
    val w = Dsir.importanceLogWeights(docs, target).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w(1L) === ((0L, 0.0)))
    assert(w(2L) === ((0L, 0.0)))
    assert(w(3L)._1 === 1L)
    val sel = Dsir.resample(docs, target, k = 2)
    val rows = sel.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(3)).sorted.toSeq === Seq(1, 2))
    // deterministic: same seed, same selection and order
    val again = Dsir.resample(docs, target, k = 2).collect()
    assert(rows.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
  }

  // ------------------------------------------------------------- chunking

  test("chunking: exact windows, overlap, short tail") {
    import spark.implicits._
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    // chunk=3, overlap=1 -> stride 2; n=6 -> ceil((6-3)/2)+1 = 3 chunks
    val rows = Chunking.chunkDocuments(docs, 3, 1).orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      (0, 3L, "t0 t1 t2"), (1, 3L, "t2 t3 t4"), (2, 2L, "t4 t5")))
  }

  test("chunking: short, exact-size and empty docs") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c"), (3L, "   "), (4L, ""))
      .toDF("doc_id", "text")
    val rows = Chunking.chunkDocuments(docs, 3, 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(rows.toSeq.sorted === Seq((1L, 0, "a b"), (2L, 0, "a b c")))
  }

  test("chunking: every token covered; consecutive chunks share overlap") {
    import spark.implicits._
    val n = 53; val chunk = 8; val overlap = 3
    val text = (0 until n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.chunkDocuments(docs, chunk, overlap)
      .orderBy("chunk_id").collect().map(_.getString(3).split(" ").toSeq)
    assert(rows.flatten.distinct.length === n) // full coverage
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(overlap) === b.take(overlap))
      case _         => ()
    }
    assert(rows.last.nonEmpty) // never an empty tail chunk
  }

  test("chunking: argument validation") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunkDocuments(docs, 0, 0))
    intercept[IllegalArgumentException](Chunking.chunkDocuments(docs, 4, 4))
  }

  // ----------------------------------------------------------- sessionize

  test("sessionize: gap splits, boundary gap stays in-session") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, 0.0), ("u1", 2L, 0.1), ("u1", 3L, 0.3), // 0.2 gap: stays
      ("u1", 4L, 0.9), ("u1", 5L, 1.0),                  // 0.6 gap: splits
      ("u2", 6L, 5.0)).toDF("user_id", "event_id", "ts")
    val res = Sessionize.sessionize(ev, "user_id", "ts", 0.2, "event_id")
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(res.toSeq === Seq(
      ("u1", 0L, 3L, 0.0, 0.3), ("u1", 1L, 2L, 0.9, 1.0),
      ("u2", 0L, 1L, 5.0, 5.0)))
  }

  test("sessionize: equal timestamps are one session, deterministic") {
    import spark.implicits._
    val ev = Seq(("u1", 2L, 1.0), ("u1", 1L, 1.0), ("u1", 3L, 1.0))
      .toDF("user_id", "event_id", "ts")
    val res = Sessionize.sessionize(ev, "user_id", "ts", 0.0, "event_id")
      .collect()
    assert(res.length === 1)
    assert(res.head.getLong(2) === 3L) // n_events
    assert(res.head.getDouble(5) === 0.0) // duration
  }
}
