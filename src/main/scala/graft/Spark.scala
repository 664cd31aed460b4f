package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory: every entry point (Verify, Bench, tests)
  * gets the same scale-oriented defaults.
  *
  *  - shuffle.partitions = cpu count (local mode; a real cluster deploy
  *    would size this to 2-3x total cores — it is a config, not code).
  *  - AQE on: runtime coalescing + skew-join handling, the knobs SURVEY §4
  *    calls out for the 100 TB path.
  *  - parquet timestamp handling: driver testdata timestamps have been
  *    TIMESTAMP(NANOS) (needs nanos-as-long to read at all) in some
  *    generations and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) in
  *    others. nanos-as-long covers the former; disabling TIMESTAMP_NTZ
  *    inference reads the latter as a regular TIMESTAMP, which under the
  *    UTC session zone carries exactly the file's naive micros — the same
  *    integers DuckDB's `epoch_us(ts)` sees, keeping oracle parity
  *    bit-exact. `SparkEntry.eventsSource` dispatches on whichever dtype
  *    actually arrives.
  */
object Spark {
  def session(master: Option[String] = None): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(master.getOrElse(s"local[$cpus]"))
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Generated-class cache (STATIC conf, default 100 entries): a
      // multi-query driver compiles thousands of distinct codegen units
      // per suite pass, so the default LRU thrashes and every pass
      // re-pays Janino compilation for almost every stage. Sized for a
      // few thousand cached classes (bounded driver memory, scale-
      // independent — any long-running multi-query driver wants this);
      // override via SPARK_GRAFT_CODEGEN_CACHE.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spark noise stays at WARN, but graft's own telemetry (e.g.
    // connectedComponents' per-round convergence lines) logs at INFO —
    // let it through so a pathological run is diagnosable from the
    // driver log alone.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft", org.apache.logging.log4j.Level.INFO)
    spark
  }
}
