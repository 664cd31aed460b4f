package graft

import graft.analysis.{sf, StructureFunction2}
import graft.operators.Photometry._
import graft.text.TextAnalysis._
import org.apache.spark.sql.functions._

/** Regressions from the round-1 code review. */
class RegressionSpec extends SparkSuite {

  test("prune recomputes counts after a source filter (no stale nobs)") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.calcNobs(byBand = false, temporary = false)
    ens.query("value > 100") // shrink the source
    ens.prune(7)             // must use post-filter counts
    val counts = ens.source.groupBy("user_id").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getLong(1) >= 7),
      "an object with < 7 post-filter observations survived prune")
  }

  test("prune with an explicit missing column fails fast") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    val e = intercept[IllegalArgumentException] {
      ens.prune(5, colName = Some("no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("ws token count matches split semantics on exotic whitespace") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq("\tfoo bar", "foo\tbar ", "a  b", "", "   ")
        .map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(wsTokenCount(col("text")),
      when(length(trim(col("text"))) === 0, lit(0))
        .otherwise(size(split(trim(col("text")), "\\s+"))))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("sf2 labels stay correct when a short lightcurve is skipped") {
    // id A has 2 obs (skipped, min is 3); B and C have 4
    val t = Array(1.0, 2.0, 1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0)
    val f = Array(1.0, 2.0, 1.0, 3.0, 2.0, 4.0, 5.0, 1.0, 2.0, 3.0)
    val e = Array.fill(10)(0.1)
    val b = Array.fill(10)("r")
    val ids = Array("A", "A", "B", "B", "B", "B", "C", "C", "C", "C")
    val rows = StructureFunction2(sf.SFArgs()).compute(t, f, e, b, ids)
    val labels = rows.map(_.getString(0)).distinct.sorted
    assert(labels.toSeq === Seq("B", "C"), s"labels were ${labels.toSeq}")
  }

  test("day-gap offset handles negative (pre-epoch) times") {
    val ens = SparkEntry.eventsEnsemble(spark, sf0001)
    ens.assign("ts_days" -> (col("ts_days") - lit(30000.0))) // pre-1970
    val res = ens.findDayGapOffset()
    res.foreach(v => assert(v >= 0.0 && v < 1.0))
  }

  test("IVF centroid training accepts double-typed embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val cs = graft.similarity.Similarity.trainCentroids(emb, k = 4, dim = 64)
    assert(cs.length === 4)
  }

  test("bootstrap without equal weighting resamples each curve at its own count") {
    val lc1 = new sf.SFLightCurve(Array(1.0, 2.0, 3.0),
      Array(1.0, 2.0, 3.0), Array(0.1, 0.1, 0.1)) // 3 pairs
    val lc2 = new sf.SFLightCurve(Array(1.0, 2.0, 3.0, 4.0, 5.0),
      Array(1.0, 2.0, 3.0, 4.0, 5.0), Array.fill(5)(0.1)) // 10 pairs
    val calc = new sf.BasicCalculator(Seq(lc1, lc2), sf.SFArgs())
    calc.bootstrap(new java.util.Random(42))
    assert(lc1.sampleDTimes.length === 3)
    assert(lc2.sampleDTimes.length === 10) // was min(3,10)=3 before fix
  }
}
