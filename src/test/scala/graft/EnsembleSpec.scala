package graft

import graft.core.{ColumnMap, Ensemble}
import graft.operators.Photometry._
import graft.sources.EnsembleIO
import org.apache.spark.sql.functions._

/** Core data-model semantics: sync/dirty protocol, temporary columns,
  * relational surface (mirrors reference test_ensemble.py sync/dirty and
  * filter sections, SURVEY §5). */
class EnsembleSpec extends SparkSuite {

  def freshEnsemble(): Ensemble =
    SparkEntry.eventsEnsemble(spark, sf0001)

  test("object table generated from distinct source ids") {
    val ens = freshEnsemble()
    val nObj = ens.objectFrame.count()
    val nDistinct = ens.source.select("user_id").distinct().count()
    assert(nObj === nDistinct)
    assert(nObj > 0)
  }

  test("source-side filter syncs object table (source dirty -> object trimmed)") {
    val ens = freshEnsemble()
    val before = ens.objectFrame.count()
    ens.query("user_id < 5") // source filter
    assert(ens.isDirty("source"))
    val after = ens.objectFrame.count() // read triggers sync
    assert(!ens.isDirty("source"))
    assert(after < before)
    assert(after === ens.source.select("user_id").distinct().count())
  }

  test("object-side filter syncs source table (object dirty -> source trimmed)") {
    val ens = freshEnsemble()
    ens.filterFrom(col("user_id") < 5, "object")
    assert(ens.isDirty("object"))
    val srcIds = ens.source.select("user_id").distinct()
      .collect().map(_.getLong(0))
    assert(!ens.isDirty("object"))
    assert(srcIds.forall(_ < 5))
  }

  test("temporary columns are dropped at sync") {
    val ens = freshEnsemble()
    ens.calcNobs(byBand = false, temporary = true)
    assert(ens.objectFrame.columns.contains("nobs_total"))
    ens.query("value > 100") // dirty source
    val objCols = ens.objectFrame.columns // triggers sync, drops temps
    assert(!objCols.contains("nobs_total"))
  }

  test("both tables dirty in one sync: object-side filter applies to source, then source-side to object") {
    // reference _sync_tables checks the second flag with `if`, not `elif`
    // (ensemble.py:2266) — both directions run in one call
    val ens = freshEnsemble()
    ens.filterFrom(col("user_id") < 8, "object") // object dirty
    // query() touches the source table -> lazy sync applies the object
    // filter first (reference: query goes through _lazy_sync_tables)
    ens.query("value > 50") // then marks source dirty
    assert(!ens.isDirty("object") && ens.isDirty("source"))
    val ids = ens.source.select("user_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.forall(_ < 8))
    // reading source does NOT clear the source-dirty flag — it is pending
    // for the next OBJECT read (reference _lazy_sync_tables direction)
    assert(ens.isDirty("source"))
    val objIds = ens.objectFrame.select("user_id").collect().map(_.getLong(0))
    assert(!ens.isDirty("source"))
    assert(objIds.toSet === ids.toSet)
  }

  test("compute() triggers the sync like any read") {
    val ens = freshEnsemble()
    ens.filterFrom(col("user_id") < 3, "object")
    assert(ens.isDirty("object"))
    val rows = ens.compute() // reference compute auto-sync
    assert(!ens.isDirty("object"))
    assert(rows.map(_.getAs[Long]("user_id")).forall(_ < 3))
  }

  test("keepEmptyObjects preserves childless objects") {
    val ev = SparkEntry.eventsSource(spark, sf0001)
    val ens = EnsembleIO.fromDataFrame(spark, ev, ColumnMap.events,
      keepEmptyObjects = true)
    val before = ens.objectFrame.count()
    ens.query("user_id < 5")
    assert(ens.objectFrame.count() === before) // objects kept
  }

  test("select keeps id plus requested columns") {
    val ens = freshEnsemble()
    ens.select(Seq("value", "event_type"))
    assert(ens.source.columns.sorted.toSeq ===
      Seq("event_type", "user_id", "value"))
  }

  test("assign adds computed column; insertSources unions") {
    val ens = freshEnsemble()
    val n0 = ens.source.count()
    ens.assign("v2" -> (col("value") * 2))
    assert(ens.source.columns.contains("v2"))
    val extra = ens.source.limit(10)
    ens.insertSources(extra)
    assert(ens.source.count() === n0 + 10)
  }

  test("sample returns a new ensemble with a subset of objects") {
    val ens = freshEnsemble()
    val sampled = ens.sample(0.3, seed = 7L)
    val nSampObj = sampled.objectFrame.count()
    assert(nSampObj < ens.objectFrame.count())
    // sources trimmed lazily by sync
    assert(sampled.source.select("user_id").distinct().count() === nSampObj)
  }

  test("sortLightcurves gives lightcurve cohesion and in-partition time order") {
    val ens = freshEnsemble()
    ens.sortLightcurves(numPartitions = Some(8))
    assert(ens.checkLightcurveCohesion())
  }

  test("save/load round-trip preserves frames and column map") {
    val ens = freshEnsemble()
    ens.calcNobs(byBand = false, temporary = false)
    val dir = java.nio.file.Files.createTempDirectory("ens_save").toString
    EnsembleIO.saveEnsemble(ens, dir)
    val back = EnsembleIO.fromEnsemble(spark, dir)
    assert(back.colMap === ens.colMap)
    assert(back.source.count() === ens.source.count())
    assert(back.objectFrame.columns.contains("nobs_total"))
  }

  test("toTimeseries collects one object sorted by time") {
    import graft.core.TimeSeries._
    val ens = freshEnsemble()
    val anyId = ens.objectFrame.select("user_id").limit(1)
      .collect()(0).getLong(0)
    val ts = ens.toTimeseries(anyId)
    assert(ts.length > 0)
    val t = ts.time
    assert(t.zip(t.tail).forall { case (a, b) => a <= b })
  }
}
