package graft

/** Timing-audit tool: run the named driver queries `GRAFT_PROF_N` times
  * (default 7) each, in the given order, and print per-run seconds plus the
  * median. Isolates one query from suite effects (GC pressure, cache churn,
  * codegen warmup landing elsewhere) that Bench's full-suite passes sample.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Prof q_dedup_exact ..."
  */
object Prof {

  /** Per-query job/stage/task accounting (GRAFT_PROF_JOBS=1): attributes
    * wall time to driver round-trips (many tiny sequential jobs) vs task
    * compute — the split the optimization guide §1 asks for before
    * touching anything. Counters reset per timed run. */
  private class Stats extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
    }
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0) }
    def line: String = f"jobs=${jobs.get}%3d stages=${stages.get}%3d " +
      f"tasks=${tasks.get}%4d taskTime=${taskTimeMs.get / 1e3}%7.2fs"
  }

  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.get("GRAFT_PROF_N").flatMap(_.toIntOption).getOrElse(7)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_exact")
    val stats = if (sys.env.get("GRAFT_PROF_JOBS").contains("1")) {
      val st = new Stats
      spark.sparkContext.addSparkListener(st)
      Some(st)
    } else None
    // same warmup families as Bench; same evaluation-complete noop-write
    // action (count() would let Catalyst prune the projected expressions)
    try Bench.run(SparkEntry.queries("q_select")(spark, sfDir))
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to n).map { i =>
        stats.foreach(_.reset())
        val t0 = System.nanoTime()
        try Bench.run(fn(spark, sfDir)) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        stats.foreach { st =>
          // deterministic drain (ADVICE r13): wait until the async
          // listener bus has dispatched every queued event instead of a
          // fixed sleep that tail events can outlive under load
          try org.apache.spark.GraftCoreBridge
            .waitListenerBusEmpty(spark.sparkContext, 10000L)
          catch { case _: java.util.concurrent.TimeoutException => () }
          println(f"PROFJOBS $name%-24s run$i dt=$dt%7.3f ${st.line}")
        }
        dt
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"PROF $name%-24s median=$med%7.3f  runs=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
