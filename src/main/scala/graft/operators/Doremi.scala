package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "Doremi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining") — the Group-DRO
  * multiplicative-weights iteration that turns per-domain EXCESS LOSS
  * (proxy model loss − reference model loss) into a training mixture.
  * The published loop retrains the proxy each round; this operator
  * implements the reweighting skeleton over a fixed excess-loss table —
  * the part that is a DATA operator (the losses arrive as columns from
  * whatever eval produced them), with the published output ā = the
  * average of the per-round weight iterates.
  *
  * Determinism: the update is the linear MWU variant
  * `w ← w·(1 + η·excess)` (no `exp`, whose libm rounding differs across
  * engines) carried in INTEGER MICRO-UNITS — every multiply, sum, and
  * floor-divide is exact, so the whole trajectory is bit-identical in any
  * engine (the repo's quantized-trajectory convention, cf. GraphRank).
  *
  * Scale: ONE corpus aggregate (map-side partials) produces the
  * |domains|-row sufficient-statistics table; the T-step iteration is
  * driver metadata math on those ≤ dozens of rows — never a distributed
  * loop, never a corpus rescan per step.
  */
object Doremi {

  /** Run `steps` MWU rounds over per-domain mean excess loss.
    *
    * @param perDoc     one row per document
    * @param domainCol  mixture domain (NULL → [[Sampling.NullStratum]])
    * @param excessMicroCol integer column: the doc's excess loss in
    *                   micro-units (1e-6); negatives clamp to 0 (a domain
    *                   the proxy already beats the reference on gets no
    *                   upweight, per the published objective)
    * @param etaDiv     learning rate as a divisor: η = 1/etaDiv (10 → 0.1)
    * @return (step, domain, w_micro, weight): step 0 is the uniform
    *         init, 1..T the iterates, and step −1 the DoReMi output
    *         ā = floor-mean of the T iterates
    */
  def domainReweight(perDoc: DataFrame, domainCol: String,
      excessMicroCol: org.apache.spark.sql.Column, steps: Int,
      etaDiv: Int = 10): DataFrame = {
    require(steps > 0, s"steps must be positive, got $steps")
    require(etaDiv > 0, s"etaDiv must be positive, got $etaDiv")
    val spark = perDoc.sparkSession
    val stats = perDoc
      .groupBy(coalesce(col(domainCol).cast("string"),
        lit(Sampling.NullStratum)).as("domain"))
      .agg(sum(greatest(excessMicroCol.cast("long"), lit(0L))).as("e"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1) / r.getLong(2)))
      .sortBy(_._1)
    val k = stats.length
    require(k > 0, "no domains")
    val domains = stats.map(_._1)
    // per-step multiplier in micro-units: 1e6 + excess_micro / etaDiv
    val mult = stats.map(s => 1000000L + s._2 / etaDiv)
    require(mult.forall(_ <= 2000000L),
      "eta*excess must be <= 1 per step (integer overflow guard): " +
        "scale excessMicroCol or raise etaDiv")
    var w = Array.fill(k)(1000000L / k)
    val traj = Array.newBuilder[(Int, String, Long)]
    for (i <- 0 until k) traj += ((0, domains(i), w(i)))
    val avgAcc = new Array[Long](k)
    for (t <- 1 to steps) {
      val raw = Array.tabulate(k)(i => w(i) * mult(i))
      val z = raw.sum
      w = raw.map(r => r * 1000000L / z)
      for (i <- 0 until k) {
        traj += ((t, domains(i), w(i)))
        avgAcc(i) += w(i)
      }
    }
    for (i <- 0 until k) traj += ((-1, domains(i), avgAcc(i) / steps))
    import spark.implicits._
    traj.result().toSeq.toDF("step", "domain", "w_micro")
      .withColumn("weight", col("w_micro").cast("double") / 1000000.0)
  }
}
