package graft

/** End-to-end smoke: the flagship batch query (driver contract `entry`)
  * plus a live Structured Streaming micro-batch run over a rate-limited
  * replay of the events table. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Spark.session()
    val df = SparkEntry.entry(spark)
    println(s"SMOKE rows=${df.count()} cols=${df.columns.mkString(",")}")
    df.show(3)
    streamingSmoke(spark)
    spark.stop()
  }

  /** Drive binSourcesStream + runningLightcurveStats on a real stream:
    * file-source replay of the sf0.001 events parquet. */
  def streamingSmoke(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      // file stream sources take a directory; glob-filter to one table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // event-time needs a real timestamp: TIMESTAMP(NANOS) generations
      // arrive as an epoch-nanos long (graft.Spark's nanos-as-long) and
      // need converting; TIMESTAMP(MICROS) generations arrive as a
      // timestamp already and pass through
      .withColumn("ts",
        if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withColumn("err", abs(col("value")) * lit(0.05) + lit(0.01))
    val cm = graft.core.ColumnMap(id = "user_id", time = "ts",
      flux = "value", err = "err", band = "event_type")

    val binned = graft.streaming.Streaming.binSourcesStream(
      src, cm, "ts", windowDur = "1 day", watermark = "1 day")
    val q1 = binned.writeStream.format("memory").queryName("smoke_binned")
      .outputMode(OutputMode.Update).start()
    val stats = graft.streaming.Streaming.runningLightcurveStats(src, cm)
    val q2 = stats.writeStream.format("memory").queryName("smoke_running")
      .outputMode(OutputMode.Update).start()
    val deduped = graft.streaming.Streaming.streamingExactDedup(
      src, textCol = "props", tsCol = "ts")
    val q3 = deduped.writeStream.format("memory").queryName("smoke_dedup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    // live funnel + retention twins over the same replay (ts as epoch
    // days / weeks so the window arithmetic is scale-meaningful)
    val days = src.withColumn("__td",
      unix_micros(col("ts")) / lit(86400e6))
    val funnel = graft.streaming.Streaming.streamingFunnel(days,
      "user_id", "__td", "event_type",
      Seq("view", "click", "purchase"), window = 7.0)
    val q4 = funnel.writeStream.format("memory").queryName("smoke_funnel")
      .outputMode(OutputMode.Append).start()
    val retention = graft.streaming.Streaming.streamingRetention(days,
      "user_id", floor(col("__td") / lit(7.0)))
    val q5 = retention.writeStream.format("memory")
      .queryName("smoke_retention").outputMode(OutputMode.Append).start()
    // live corpus-side twins over a documents file stream: the quality /
    // drift monitor (event time synthesized from doc_id) and the
    // order-independent exact-k sample per language
    val dschema = spark.read.parquet(s"$dir/documents.parquet").schema
    val dsrc = spark.readStream.schema(dschema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .withColumn("__ts",
        timestamp_micros(col("doc_id") * lit(3600000000L)))
    val monitor = graft.streaming.Streaming.streamingQualityMonitor(dsrc,
      "text", "__ts", Map("the" -> 100L, "a" -> 80L, "of" -> 60L),
      windowDur = "1 day", watermark = "1 day")
    val q6 = monitor.writeStream.format("memory").queryName("smoke_qmon")
      .outputMode(OutputMode.Update).start()
    val sample = graft.streaming.Streaming.streamingStratifiedExactK(
      dsrc, "doc_id", "lang", k = 5)
    val q7 = sample.writeStream.format("memory").queryName("smoke_sample")
      .outputMode(OutputMode.Update).start()
    // live PSI drift gate over a squashed-length score vs a uniform
    // reference — the distribution-shift alarm next to the CE monitor
    val psiSrc = dsrc.withColumn("__s",
      col("n_chars").cast("double") /
        (col("n_chars") + lit(500)).cast("double"))
    val psiMon = graft.streaming.Streaming.streamingPsiMonitor(
      psiSrc, "__s", "__ts", Seq.fill(10)(10L),
      windowDur = "1 day", watermark = "1 day")
    val q8 = psiMon.writeStream.format("memory").queryName("smoke_psi")
      .outputMode(OutputMode.Update).start()
    // live near-dup ingest gate over the same documents replay (band-key
    // state) — the crawl pipeline's first content-level stage
    val nearDup = graft.streaming.Streaming.streamingNearDupDedup(
      dsrc, "text", "__ts")
    val q9 = nearDup.writeStream.format("memory")
      .queryName("smoke_neardup").outputMode(OutputMode.Append).start()
    // the 2-band recall variant: two chained band-key state stores
    val nearDup2 = graft.streaming.Streaming.streamingNearDupDedup(
      dsrc, "text", "__ts", bandRows = 8, bands = 2)
    val q10 = nearDup2.writeStream.format("memory")
      .queryName("smoke_neardup2").outputMode(OutputMode.Append).start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      q3.processAllAvailable(); q4.processAllAvailable()
      q5.processAllAvailable(); q6.processAllAvailable()
      q7.processAllAvailable(); q8.processAllAvailable()
      q9.processAllAvailable(); q10.processAllAvailable()
      val nBins = spark.table("smoke_binned").count()
      val nStats = spark.table("smoke_running").count()
      val nDedup = spark.table("smoke_dedup").count()
      val nFunnel = spark.table("smoke_funnel").count()
      val nRet = spark.table("smoke_retention").count()
      val nMon = spark.table("smoke_qmon").count()
      val nSamp = spark.table("smoke_sample").count()
      val nPsi = spark.table("smoke_psi").count()
      val nNearDup = spark.table("smoke_neardup").count()
      val nNearDup2 = spark.table("smoke_neardup2").count()
      println(s"SMOKE_STREAMING bins=$nBins running_stats=$nStats " +
        s"dedup_kept=$nDedup funnel_steps=$nFunnel retention_rows=$nRet " +
        s"monitor_windows=$nMon sample_rows=$nSamp psi_windows=$nPsi " +
        s"neardup_kept=$nNearDup neardup_kept_2band=$nNearDup2")
      assert(nBins > 0 && nStats > 0 && nDedup > 0 && nFunnel > 0 &&
        nRet > 0 && nMon > 0 && nSamp > 0 && nPsi > 0 && nNearDup > 0 &&
        nNearDup2 > 0)
    } finally {
      q1.stop(); q2.stop(); q3.stop(); q4.stop(); q5.stop()
      q6.stop(); q7.stop(); q8.stop(); q9.stop(); q10.stop()
    }
  }
}
