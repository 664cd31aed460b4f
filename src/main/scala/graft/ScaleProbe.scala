package graft

import org.apache.spark.sql.functions._

/** Giant-lightcurve scale probe (manual tool, not part of the driver
  * contract): push one synthetic n-observation lightcurve through the
  * relational SF² plan and report wall time and bin count. The batch
  * path would materialize n·(n−1)/2 pair triples inside ONE task — at
  * n = 2·10⁴ that is 2·10⁸ triples (~5 GB of boxed doubles); the
  * relational plan streams them through the distributed self-join
  * instead. Usage:
  *
  *   SPARK_GRAFT_PROBE_N=20000 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "20000").toInt
    val spark = Spark.session()
    val src = spark.range(n).select(
      lit(1L).as("user_id"),
      (col("id") * 0.37 + pmod(col("id") * 7919, lit(97)) / 100.0).as("ts_days"),
      (sin(col("id") / 50.0) * 10 + pmod(col("id"), lit(13))).as("value"),
      lit(0.1).as("err"),
      lit("g").as("event_type"),
      col("id").as("event_id"))
    val ens = graft.sources.EnsembleIO.fromDataFrame(spark, src,
      graft.core.ColumnMap.events)
    val t0 = System.nanoTime()
    val bins = graft.analysis.SF2Relational.SF2RelationalOps(ens)
      .sf2Relational(graft.analysis.sf.SFArgs(
        binMethod = "length", binCountTarget = 100000))
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    val pairs = n.toLong * (n - 1) / 2
    println(f"SCALE_PROBE n=$n pairs=$pairs bins=$bins $secs%.1f s")
    spark.stop()
  }
}
