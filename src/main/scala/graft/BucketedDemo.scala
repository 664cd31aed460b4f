package graft

import graft.core.ColumnMap
import graft.sources.EnsembleIO

/** Demonstrates the bucketed-persistence layout: save the events ensemble
  * bucketed+sorted by id, reload, and show that the object↔source join
  * and the per-id aggregation plan with ZERO shuffle exchanges. */
object BucketedDemo {
  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val ens = SparkEntry.eventsEnsemble(spark, dir)
    EnsembleIO.saveEnsembleBucketed(ens, "demo_bucketed", nBuckets = 16)
    val back = EnsembleIO.fromBucketedTables(spark, "demo_bucketed",
      ColumnMap.events)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = back.source.join(back.objectFrame, "user_id")
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"BUCKETED_DEMO rows=$n shuffle_exchanges=$shuffles")
    assert(shuffles == 0, "bucketed join should not shuffle")
    spark.stop()
  }
}
