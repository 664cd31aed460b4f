package graft

/** Plan-audit tool: print the formatted physical plan of selected driver
  * queries (all of them with no args). The things to look for at 100 TB —
  * PushedFilters reaching the scan, ReadSchema pruned to used columns,
  * broadcast joins on small sides, WholeStageCodegen spans, no stray
  * Exchange — are all visible in this output.
  *
  * Usage: sbt "runMain graft.Explain [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      println(s"\n########## $name ##########")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
