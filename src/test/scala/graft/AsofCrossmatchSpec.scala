package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Round-7 relational additions: as-of join (+ the zones crossmatch and
  * bigram LM tested in their own sections as they land). */
class AsofCrossmatchSpec extends SparkSuite {

  // ------------------------------------------------------------ as-of join

  private def trades = {
    import spark.implicits._
    // (key, t, left id)
    Seq(("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 10.0, 3L),
        ("b", 3.0, 4L), ("c", 2.0, 5L))
      .toDF("k", "t", "lid")
  }
  private def quotes = {
    import spark.implicits._
    // (key, t, right id, px) — includes a null payload value and an
    // equal-time pair on key "a" at t=5.0
    Seq(("a", 0.5, 10L, Some(100.0)), ("a", 5.0, 11L, Some(105.0)),
        ("a", 5.0, 12L, Some(106.0)), ("a", 9.0, 13L, None),
        ("b", 4.0, 14L, Some(200.0)))
      .toDF("k", "qt", "rid", "px")
  }

  test("asof backward: latest quote at-or-before each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "t", "qt",
        rightCols = Seq("px", "rid"), rightTiebreak = Some("rid"))
      .select("lid", "qt_matched", "px_matched", "rid_matched")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // t=1.0 -> quote at 0.5
    assert(out(1L) === ((Some(0.5), Some(100.0), Some(10L))))
    // t=5.0 -> inclusive equal-time match; greatest rid (12) wins the tie
    assert(out(2L) === ((Some(5.0), Some(106.0), Some(12L))))
    // t=10.0 -> quote at 9.0 whose px is NULL: the null payload value is
    // preserved (struct trick), not skipped back to an older quote
    assert(out(3L) === ((Some(9.0), None, Some(13L))))
    // key "b" trade at 3.0 precedes its only quote (4.0) -> no match
    assert(out(4L) === ((None, None, None)))
    // key "c" has no quotes at all -> no match
    assert(out(5L) === ((None, None, None)))
  }

  test("asof forward: earliest quote at-or-after, tolerance gates") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "t", "qt",
        rightCols = Seq("rid"), direction = "forward",
        tolerance = Some(1.5), rightTiebreak = Some("rid"))
      .select("lid", "qt_matched", "rid_matched")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    // trade t=5.0: forward inclusive -> equal-time quote; among the two
    // at qt=5.0 the greatest rid must still win deterministically
    assert(out(2L) === ((Some(5.0), Some(12L))))
    // trade t=1.0: next quote at 5.0 is 4.0 away > tolerance 1.5 -> nulls
    assert(out(1L) === ((None, None)))
    // trade t=3.0 key b: quote at 4.0, within 1.5
    assert(out(4L) === ((Some(4.0), Some(14L))))
    // trade t=10.0: no later quote
    assert(out(3L) === ((None, None)))
  }

  test("asof tolerance is inclusive and left rows are never dropped") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "t", "qt",
        rightCols = Seq("rid"), tolerance = Some(0.5),
        rightTiebreak = Some("rid"))
    assert(out.count() === trades.count()) // left-outer: all 5 rows
    val m = out.select("lid", "rid_matched").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // t=1.0 vs quote 0.5: distance exactly 0.5 -> inclusive, kept
    assert(m(1L) === Some(10L))
    // t=10.0 vs quote 9.0: distance 1.0 > 0.5 -> nulled
    assert(m(3L) === None)
  }

  test("asof plan: one key-partitioned window, no global window") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("k"), "t", "qt",
      rightCols = Seq("px"))
    val phys = out.queryExecution.executedPlan.toString
    // the window must carry a partition spec (no empty PARTITION BY —
    // a global single-task window would not survive scale)
    assert(phys.contains("Window"))
    assert(!phys.matches("(?s).*Window \\[[^\\]]*windowspecdefinition\\(\\s*\\Q__asof_t\\E.*"),
      "window should be partitioned by the key, not global")
  }
}
