package graft

/** Timing-audit tool: run the named driver queries `GRAFT_PROF_N` times
  * (default 7) each, in the given order, and print per-run seconds plus the
  * median. Isolates one query from suite effects (GC pressure, cache churn,
  * codegen warmup landing elsewhere) that Bench's full-suite passes sample.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Prof q_dedup_exact ..."
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.get("GRAFT_PROF_N").flatMap(_.toIntOption).getOrElse(7)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_exact")
    // same warmup families as Bench; same evaluation-complete noop-write
    // action (count() would let Catalyst prune the projected expressions)
    try Bench.run(SparkEntry.queries("q_select")(spark, sfDir))
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        try Bench.run(fn(spark, sfDir)) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"PROF $name%-24s median=$med%7.3f  runs=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
