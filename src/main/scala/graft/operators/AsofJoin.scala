package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join: every left row picks the single right
  * row of the same key with the greatest `rightTime` ≤ `leftTime`
  * (`direction = "backward"`, the default) or the least `rightTime` ≥
  * `leftTime` (`"forward"`), optionally within a `tolerance` window.
  * The operator Spark SQL lacks natively (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`): aligning observations with the latest calibration epoch,
  * clicks with the most recent purchase, a lightcurve with its closest
  * reference-catalog epoch.
  *
  * Built on composition, not a custom physical operator: both sides are
  * tagged and unioned, then ONE window per key — ordered by (time, tag,
  * tiebreak) with right rows sorting before left at equal times — carries
  * the last-seen right payload forward via `last(_, ignoreNulls)` over an
  * unbounded-preceding frame. That is a single shuffle on the key columns
  * and a linear merge within each partition; no join blow-up, no
  * per-left-row probe. At 100 TB this is the plan a range-interval join
  * would want anyway: co-partition by key, one ordered sweep. A
  * pathological single key serializes only its own partition (same
  * posture as `Sessionize`).
  *
  * Semantics pinned for determinism:
  *  - equal times match inclusively (a right row AT `leftTime` is
  *    eligible in both directions);
  *  - among right rows sharing the matched time, the one with the
  *    greatest `rightTiebreak` wins (pass a unique id);
  *  - the right payload rides in ONE struct, so legitimately-null payload
  *    values survive (the null-skipping of `last(ignoreNulls)` sees the
  *    non-null struct, not its fields);
  *  - a match farther than `tolerance` (in `leftTime` units, inclusive)
  *    nulls every matched column rather than dropping the left row —
  *    left-outer semantics, like pandas `merge_asof`.
  */
object AsofJoin {

  /** @param on        equi-key columns (present on both sides)
    * @param rightCols right payload columns to carry (each lands as
    *                  `<name><suffix>`); `rightTime` is always carried as
    *                  `<rightTime><suffix>`
    * @param rightTiebreak column ordering right rows that share a
    *                  timestamp (greatest wins); pass a unique id for a
    *                  deterministic result
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      direction: String = "backward", tolerance: Option[Double] = None,
      rightTiebreak: Option[String] = None,
      suffix: String = "_matched"): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val sign = if (direction == "backward") 1.0 else -1.0
    val payload = (rightTime +: rightCols).distinct
    val tb: Column = rightTiebreak.map(col).getOrElse(lit(0L))

    // Right side reduced to key + axis + one payload struct; left side
    // keeps all its columns. unionByName(allowMissing) nulls the struct on
    // left rows and the left-only columns on right rows.
    val r2 = right.select(
      on.map(col) ++ Seq(
        (col(rightTime) * lit(sign)).as("__asof_t"),
        lit(0).as("__asof_tag"),
        tb.cast("double").as("__asof_tb"),
        struct(payload.map(col): _*).as("__asof_p")): _*)
    val l2 = left
      .withColumn("__asof_t", col(leftTime) * lit(sign))
      .withColumn("__asof_tag", lit(1))
      .withColumn("__asof_tb", lit(null).cast("double"))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)

    // Right rows (tag 0) sort before left rows (tag 1) at equal times →
    // inclusive equal-time matches; among equal (t, tag) the greatest
    // tiebreak sorts last and wins last().
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__asof_t"), col("__asof_tag"), col("__asof_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof_m", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)

    // Tolerance gate on the ORIGINAL time values: sign·(lt − rt) ∈ [0, tol].
    val inTol: Column = tolerance match {
      case None => col("__asof_m").isNotNull
      case Some(t) =>
        col("__asof_m").isNotNull &&
          (col(leftTime) - col("__asof_m").getField(rightTime)) * lit(sign) <= lit(t)
    }
    val withCols = payload.foldLeft(matched) { (df, c) =>
      df.withColumn(c + suffix,
        when(inTol, col("__asof_m").getField(c)))
    }
    withCols.drop("__asof_t", "__asof_tag", "__asof_tb", "__asof_p", "__asof_m")
  }
}
