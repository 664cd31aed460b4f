package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog crossmatch: every left position picks its nearest right-catalog
  * neighbour within `radius`, using 2-D zone blocking (the "Zones"
  * algorithm of Gray, Nieto-Santisteban & Szalay 2004/2007 — the scalable
  * shape behind survey crossmatch services, and what the reference
  * delegates to LSDB for in `from_lsdb`, /root/reference/src/tape/
  * ensemble.py:1667). Coordinates are treated as PLANAR (small-angle
  * approximation, no RA wrap-around at 0/360) — the blocking machinery,
  * not spherical trigonometry, is what this operator contributes; a
  * haversine distance drops in by swapping one expression.
  *
  * Scale design: each right row is replicated into its 3×3 neighbourhood
  * of (dec-zone, ra-block) cells — a map-side 9× fan-out of the SMALLER
  * catalog, no shuffle of its own — and the join is an EQUI join on the
  * cell key, so Catalyst plans a hash/sort-merge join, never a cartesian
  * or broadcast-nested-loop. Candidate pairs are bounded by local density
  * × the 9·h² cell neighbourhood per left row: linear in the catalogs,
  * never all-pairs. Pathological density spikes (every survey has a
  * cluster) are one hot key — AQE skew-join splits them. Nearest-pick is
  * a lexicographic `min(struct(d², id))` aggregate — map-side partial,
  * no per-left-row window over the pair stream.
  *
  * Determinism: d² is the identical IEEE expression shape both engines
  * evaluate ((Δra)² + (Δdec)², no reduction-order ambiguity), matches at
  * exactly `radius` are inclusive, and equidistant candidates break ties
  * on the smaller right id.
  */
object Crossmatch {

  /** @param zoneHeight cell edge in coordinate units; must be ≥ `radius`
    *                   (the 3×3 neighbourhood guarantee). Default = radius.
    * @return one row per MATCHED left row: (<leftId>, matched_<rightId>,
    *         dist, n_candidates) — unmatched left rows are absent
    *         (inner-match semantics; count them via a left anti join). */
  def crossmatch(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      leftRa: String, leftDec: String,
      rightRa: String, rightDec: String,
      radius: Double, zoneHeight: Double = 0.0): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    val h = if (zoneHeight > 0) zoneHeight else radius
    require(h >= radius,
      s"zoneHeight ($h) must be >= radius ($radius): a match can then " +
        "only live in the 3x3 neighbourhood the right side is replicated to")

    def zoneOf(c: Column): Column = floor(c / lit(h)).cast("long")
    val l = left.select(col(leftId).as("__lid"), col(leftRa).as("__lra"),
        col(leftDec).as("__ldec"))
      .withColumn("__zd", zoneOf(col("__ldec")))
      .withColumn("__zr", zoneOf(col("__lra")))
    val offsets = for (dz <- -1 to 1; da <- -1 to 1) yield (dz, da)
    val r = right.select(col(rightId).as("__rid"), col(rightRa).as("__rra"),
        col(rightDec).as("__rdec"))
      .withColumn("__cell", explode(array(offsets.map { case (dz, da) =>
        struct((zoneOf(col("__rdec")) + dz).as("zd"),
          (zoneOf(col("__rra")) + da).as("zr"))
      }: _*)))
      .withColumn("__zd", col("__cell.zd"))
      .withColumn("__zr", col("__cell.zr"))
      .drop("__cell")

    val d2 = (col("__lra") - col("__rra")) * (col("__lra") - col("__rra")) +
      (col("__ldec") - col("__rdec")) * (col("__ldec") - col("__rdec"))
    val cand = l.join(r, Seq("__zd", "__zr"))
      .filter(abs(col("__ldec") - col("__rdec")) <= lit(radius) &&
        abs(col("__lra") - col("__rra")) <= lit(radius))
      .withColumn("__d2", d2)
      .filter(col("__d2") <= lit(radius * radius))

    cand.groupBy(col("__lid"))
      .agg(min(struct(col("__d2").as("d2"), col("__rid").as("rid")))
          .as("__best"),
        count(lit(1)).as("n_candidates"))
      .select(col("__lid").as(leftId),
        col("__best.rid").as("matched_" + rightId),
        sqrt(col("__best.d2")).as("dist"),
        col("n_candidates"))
  }
}
