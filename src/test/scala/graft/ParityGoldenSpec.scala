package graft

import graft.core.ColumnMap
import graft.operators.Photometry._
import graft.sources.EnsembleIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operator goldens from the reference's own test expectations
  * (test_ensemble.py bin_sources and convert_flux_to_mag). */
class ParityGoldenSpec extends SparkSuite {

  val cmap = ColumnMap(id = "id", time = "time", flux = "flux",
    err = "err", band = "band")

  def binEnsemble() = {
    // test_ensemble.py:1834-1841 fixture
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("band", StringType),
      StructField("err", DoubleType)))
    val t = Seq(10.1, 10.2, 10.2, 11.1, 11.2, 10.9, 11.1, 15.0, 15.1)
    val f = Seq(1.0, 2.0, 5.0, 3.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    val b = Seq("g", "g", "b", "g", "b", "g", "g", "g", "g")
    val e = Seq(1.0, 2.0, 1.0, 3.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val ids = Seq(8001L, 8001L, 8001L, 8001L, 8002L, 8002L, 8002L, 8002L, 8002L)
    val rows = ids.indices.map(i => Row(ids(i), t(i), f(i), b(i), e(i)))
    EnsembleIO.fromRows(spark, rows, schema, cmap)
  }

  test("bin_sources golden: offset window, custom time aggr, count col") {
    // test_ensemble.py:1849-1878: window=1.0, offset=0.5, time->min
    val ens = binEnsemble()
    ens.binSources(timeWindow = 1.0, offset = 0.5,
      countCol = Some("aggregated_bin_count"),
      customAggr = Map("time" -> min(col("time"))))
    val out = ens.source.collect().map { r =>
      (r.getAs[Long]("id"), r.getAs[String]("band"),
        r.getAs[Double]("time")) ->
        (r.getAs[Double]("flux"), r.getAs[Double]("err"),
          r.getAs[Long]("aggregated_bin_count"))
    }.toMap
    assert(out.size === 6)
    val expected = Map(
      (8001L, "g", 10.1) -> (1.5, 1.118033988749895, 2L),
      (8001L, "b", 10.2) -> (5.0, 1.0, 1L),
      (8001L, "g", 11.1) -> (3.0, 3.0, 1L),
      (8002L, "b", 11.2) -> (1.0, 2.0, 1L),
      (8002L, "g", 10.9) -> (2.5, 2.5, 2L),
      (8002L, "g", 15.0) -> (4.5, 3.905124837953327, 2L))
    expected.foreach { case (k, (ef, ee, ec)) =>
      val (gf, ge, gc) = out(k)
      assert(math.abs(gf - ef) < 1e-6, s"$k flux")
      assert(math.abs(ge - ee) < 1e-6, s"$k err")
      assert(gc === ec, s"$k count")
    }
  }

  test("bin_sources column order is deterministic with many custom aggs") {
    val ens = binEnsemble()
    ens.binSources(timeWindow = 1.0, countCol = Some("n"),
      customAggr = Seq(
        "fmax" -> max(col("flux")), "fmin" -> min(col("flux")),
        "tspan" -> (max(col("time")) - min(col("time"))),
        "esum" -> sum(col("err"))))
    // reference dict order: time, flux, err, count, then customs in order
    assert(ens.source.columns.toSeq ===
      Seq("id", "band", "time", "flux", "err", "n",
        "fmax", "fmin", "tspan", "esum"))
  }

  test("bin_sources re-binning sums an existing count column (ensemble.py:1027-1031)") {
    val ens = binEnsemble()
    ens.binSources(timeWindow = 1.0, offset = 0.5, countCol = Some("bc"))
    val firstPass = ens.source.collect()
      .map(r => r.getAs[Long]("bc")).sum
    // re-bin with a coarser window: counts must accumulate, not recount bins
    ens.binSources(timeWindow = 10.0, countCol = Some("bc"))
    val rebinned = ens.source.collect().map(r => r.getAs[Long]("bc")).sum
    assert(firstPass === 9L) // all original observations
    assert(rebinned === 9L, s"re-binned total $rebinned lost observations")
  }

  test("bin_sources two-day window golden (test_ensemble.py:1881-1918)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("band", StringType),
      StructField("err", DoubleType)))
    val t = Seq(10.1, 10.2, 10.2, 11.1, 11.2, 10.9, 11.1, 15.0, 15.1, 14.0)
    val f = Seq(1.0, 2.0, 5.0, 3.0, 1.0, 2.0, 3.0, 4.0, 5.0, 5.0)
    val b = Seq("g", "g", "b", "g", "b", "g", "g", "g", "g", "g")
    val e = Seq(1.0, 2.0, 1.0, 3.0, 2.0, 3.0, 4.0, 5.0, 6.0, 5.0)
    val ids = Seq(8001L, 8001L, 8001L, 8001L, 8002L, 8002L, 8002L, 8002L,
      8002L, 8002L)
    val rows = ids.indices.map(i => Row(ids(i), t(i), f(i), b(i), e(i)))
    val ens = EnsembleIO.fromRows(spark, rows, schema, cmap)
    ens.binSources(timeWindow = 2.0, offset = 0.5)
    val out = ens.source.collect().map { r =>
      (r.getAs[Long]("id"), r.getAs[String]("band"),
        math.round(r.getAs[Double]("time") * 1e4) / 1e4.toDouble) ->
        r.getAs[Double]("flux")
    }.toMap
    assert(out.size === 5)
    // expected_flux/time/band from test_ensemble.py:1908-1911
    val expected = Map(
      (8001L, "g", 10.4667) -> 2.0, (8001L, "b", 10.2) -> 5.0,
      (8002L, "b", 11.2) -> 1.0, (8002L, "g", 11.0) -> 2.5,
      (8002L, "g", 14.7) -> 4.666666666666667)
    expected.foreach { case (k, ef) =>
      assert(out.contains(k), s"missing bin $k in ${out.keys}")
      assert(math.abs(out(k) - ef) < 1e-3, s"$k flux")
    }
  }

  test("find_day_gap_offset golden: 13/24 on the bin fixture; None when covered") {
    // reference test_find_day_gap_offset
    val ens = binEnsemble()
    val gap = ens.findDayGapOffset()
    assert(gap.isDefined)
    assert(math.abs(gap.get - 13.0 / 24.0) < 1e-6, s"gap=$gap")

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("band", StringType),
      StructField("err", DoubleType)))
    val covered = (0 until 100).map(i =>
      Row(8001L, 24.0 * i / 100.0, 1.0, "g", 1.0))
    val ens2 = EnsembleIO.fromRows(spark, covered, schema, cmap)
    assert(ens2.findDayGapOffset().isEmpty) // reference returns -1
  }

  test("checkSorted detects global id order") {
    val ens = binEnsemble()
    assert(ens.checkSorted()) // fixture rows are id-ascending
    val shuffled = ens.source.orderBy(rand(7))
    ens.setSource(shuffled)
    // a randomly permuted source is (almost surely) not globally sorted
    assert(!ens.checkSorted())
  }

  test("checkSorted is multi-partition correct and never plans a global window") {
    import spark.implicits._
    val cm = graft.core.ColumnMap("id", "time", "flux", "err", "band")
    def mk(ids: Seq[Long], nPart: Int) = {
      val df = spark.createDataset(ids).toDF("id")
        .withColumn("time", lit(1.0)).withColumn("flux", lit(1.0))
        .withColumn("err", lit(1.0)).withColumn("band", lit("g"))
        // preserve the given row order across nPart partitions
        .repartitionByRange(nPart, monotonically_increasing_id())
      val e = new graft.core.Ensemble(spark, cm)
      e.setSource(df); e.setObject(df.select("id").distinct()); e
    }
    // globally sorted across partition boundaries
    assert(mk(1L to 100L, 4).checkSorted())
    // sorted within each partition but boundaries overlap out of order
    val within = mk((51L to 100L) ++ (1L to 50L), 2)
    // unsorted inside a partition
    assert(!mk(Seq(1L, 3L, 2L) ++ (4L to 50L), 2).checkSorted())
    // duplicates (non-decreasing) still count as sorted
    assert(mk(Seq(1L, 1L, 2L, 2L, 3L), 2).checkSorted())

    val plan = within.checkSortedPerPartition("source")
      .queryExecution.executedPlan.toString
    // the window must be partitioned: no single-task global exchange anywhere
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition"),
      s"plan funnels the table through one task:\n$plan")
    assert(!within.checkSorted())
  }

  test("convert_flux_to_mag goldens: zp as mag and as flux") {
    // test_convert_flux_to_mag: flux 30.5, zp 25 mag / 1e10 flux
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("time", DoubleType),
      StructField("flux", DoubleType), StructField("band", StringType),
      StructField("err", DoubleType)))
    val rows = Seq(Row(0L, 1.0, 30.5, "g", 10.0))
    val ensMag = EnsembleIO.fromRows(spark, rows, schema, cmap)
    ensMag.convertFluxToMag(Right(25.0), zpForm = "mag")
    val r1 = ensMag.source.select("flux_mag", "flux_mag_err").collect()(0)
    assert(math.abs(r1.getDouble(0) - 21.28925) < 1e-3 * 21.28925)
    assert(math.abs(r1.getDouble(1) - 0.355979) < 1e-3)

    val ensFlux = EnsembleIO.fromRows(spark, rows, schema, cmap)
    ensFlux.convertFluxToMag(Right(1e10), zpForm = "flux",
      outColName = Some("my_mag"))
    val r2 = ensFlux.source.select("my_mag", "my_mag_err").collect()(0)
    assert(math.abs(r2.getDouble(0) - 21.28925) < 1e-3 * 21.28925)
    assert(math.abs(r2.getDouble(1) - 0.355979) < 1e-3)

    intercept[IllegalArgumentException] {
      ensFlux.convertFluxToMag(Right(25.0), zpForm = "bogus")
    }
  }

  test("binSources with an all-null err bin yields NULL, not an ANSI abort") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.assign("err" -> lit(null).cast("double"))
    ens.binSources(timeWindow = 1.0)
    val errs = ens.source.select("err").limit(5).collect()
    assert(errs.nonEmpty && errs.forall(_.isNullAt(0)))
  }

  test("flux2mag on zero/negative flux yields NULL, not an ANSI abort") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.assign("value" ->
      when(col("event_id") % 3 === 0, lit(0.0))
        .when(col("event_id") % 3 === 1, lit(-5.0)).otherwise(col("value")))
    ens.convertFluxToMag(Right(25.0), zpForm = "mag")
    val rows = ens.source
      .select(col("event_id") % 3, col("value_mag"), col("value_mag_err"))
      .collect()
    rows.foreach { r =>
      if (r.getLong(0) <= 1) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(!r.isNullAt(1))
    }
  }

  test("info/frameInfo are job-free by default (counts only on request)") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.source.count() // force the sync + any lazy setup beforehand
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = ens.info()
      Thread.sleep(300) // let any stray async job-start events drain
      assert(jobs.get() === 0, "default info() must not run a Spark job")
      assert(out.contains("source Frame") && !out.contains("rows:"))
      assert(ens.info(countRows = true).contains("rows:"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("partitions(i) slices one physical partition, no shuffle") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.repartition(4)
    val total = ens.source.count()
    val slices = (0 until 4).map(i => ens.partitions(i).count())
    assert(slices.sum === total)
    assert(slices.count(_ > 0) >= 2, s"degenerate layout: $slices")
    // the slice adds a filter but no NEW exchange beyond what the source
    // layout (the explicit repartition above) already has
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(ens.partitions(0)) === exchanges(ens.source),
      "partition slice must not add a shuffle")
    intercept[IllegalArgumentException] { ens.partitions(99) }
  }
}
