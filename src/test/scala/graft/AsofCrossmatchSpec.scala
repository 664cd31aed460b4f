package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Crossmatch}

/** Round-7 relational additions: as-of join and the zones crossmatch. */
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

  // ------------------------------------------------------------ crossmatch

  private def leftCat = {
    import spark.implicits._
    Seq((1L, 10.0, 10.0),   // near r=100 (dist 1.0) and r=101 (dist 2.0)
        (2L, 50.0, -30.0),  // exactly radius away from r=102
        (3L, 200.0, 80.0),  // no neighbour within radius
        (4L, 120.0, 0.0))   // equidistant from r=103 and r=104
      .toDF("id", "ra", "dec")
  }
  private def rightCat = {
    import spark.implicits._
    Seq((100L, 10.0, 11.0), (101L, 10.0, 8.0), (102L, 50.0, -28.0),
        (103L, 119.0, 0.0), (104L, 121.0, 0.0), (105L, 300.0, -80.0))
      .toDF("id", "ra", "dec")
  }
  private def xm(radius: Double) = Crossmatch.crossmatch(
    leftCat, rightCat, "id", "id", "ra", "dec", "ra", "dec", radius)

  test("crossmatch: nearest within radius, inclusive edge, ties on id") {
    val out = xm(2.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((100L, 1.0, 2L))) // nearest of two candidates
    assert(out(2L) === ((102L, 2.0, 1L))) // dist exactly radius: inclusive
    assert(out(4L)._1 === 103L)           // equidistant -> smaller id wins
    assert(out(4L)._3 === 2L)             // both candidates counted
    assert(!out.contains(3L))             // unmatched left row absent
  }

  test("crossmatch: neighbour found across a cell boundary") {
    import spark.implicits._
    // left at the very top of cell dec-zone 0, right just inside zone 1:
    // only the 3x3 replication makes them meet
    val l = Seq((1L, 5.0, 9.9)).toDF("id", "ra", "dec")
    val r = Seq((2L, 5.0, 10.1)).toDF("id", "ra", "dec")
    val out = Crossmatch.crossmatch(l, r, "id", "id", "ra", "dec",
      "ra", "dec", radius = 10.0).collect()
    assert(out.length === 1 && out.head.getLong(1) === 2L)
    assert(math.abs(out.head.getDouble(2) - 0.2) < 1e-12)
  }

  test("crossmatch: zoneHeight below radius is rejected") {
    intercept[IllegalArgumentException] {
      Crossmatch.crossmatch(leftCat, rightCat, "id", "id", "ra", "dec",
        "ra", "dec", radius = 5.0, zoneHeight = 2.0)
    }
  }

  test("crossmatch plan: equi join on the cell key, never a cartesian") {
    val phys = xm(2.0).queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      "zones blocking must produce an equi join, not a cartesian")
    assert(!phys.contains("BroadcastNestedLoopJoin"),
      "zones blocking must produce an equi join, not a nested loop")
  }

  // -------------------------------------------------------- interval join

  private def pointsDf = {
    import spark.implicits._
    Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 7.5, 3L),
        ("b", 2.0, 4L), ("c", 0.5, 5L))
      .toDF("k", "t", "pid")
  }
  private def intervalsDf = {
    import spark.implicits._
    // [1.0, 2.0] tests inclusive bounds at BOTH ends; [5.0, 9.0] spans
    // many 0.5-wide cells (replication must not duplicate matches);
    // [3.0, 2.5] is degenerate (end < start — matches nothing); key "b"
    // interval excludes b's point
    Seq(("a", 1.0, 2.0, 100L), ("a", 5.0, 9.0, 101L),
        ("a", 3.0, 2.5, 102L), ("b", 3.0, 4.0, 103L))
      .toDF("k", "s", "e", "iid")
  }

  test("intervalJoin: inclusive containment, one row per match even " +
      "when the interval spans many cells") {
    val out = graft.operators.RangeJoin.intervalJoin(
        pointsDf, intervalsDf, "k", "t", "s", "e", bucket = 0.5)
      .select("pid", "iid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // points 1,2 hit [1,2] at its bounds; point 3 hits the wide interval
    // exactly once; b's and c's points match nothing
    assert(out === Set(1L -> 100L, 2L -> 100L, 3L -> 101L))
  }

  test("intervalJoin ≡ naive inequality join on the events sessions") {
    val ev = SparkEntry.eventsSource(spark, sf0001)
      .select("event_id", "user_id", "ts_days")
    val sess = graft.operators.Sessionize.sessionize(
        SparkEntry.eventsSource(spark, sf0001), "user_id", "ts_days",
        maxGap = 0.2, tiebreakCol = "event_id")
      .select(col("user_id"), col("session_id"),
        col("start_ts"), col("end_ts"))
    val bucketed = graft.operators.RangeJoin.intervalJoin(
        ev, sess, "user_id", "ts_days", "start_ts", "end_ts", 0.25)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val naive = ev.join(sess, Seq("user_id"))
      .filter(col("ts_days") >= col("start_ts") &&
        col("ts_days") <= col("end_ts"))
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(bucketed === naive)
    // every event lands in exactly the session it generated
    assert(bucketed.size === ev.count())
  }

  test("intervalJoin plan: equi join on (key, cell), never a nested loop") {
    val phys = graft.operators.RangeJoin.intervalJoin(
        pointsDf, intervalsDf, "k", "t", "s", "e", bucket = 0.5)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
    assert(!phys.contains("BroadcastNestedLoopJoin"))
  }
}
