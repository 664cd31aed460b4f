package graft

import graft.multimodal.Multimodal
import graft.text.TextAnalysis._
import org.apache.spark.sql.functions._

/** Text-analysis functions on hand-built strings + multimodal stub
  * plumbing. */
class TextMultimodalSpec extends SparkSuite {

  import scala.jdk.CollectionConverters._
  def one(s: String) = spark.createDataFrame(
    Seq(org.apache.spark.sql.Row(s)).asJava,
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType))))

  def eval(s: String, c: org.apache.spark.sql.Column): Any =
    one(s).select(c).collect()(0).get(0)

  test("token counts") {
    assert(eval("hello world  foo", wsTokenCount(col("text"))) === 3)
    assert(eval("", wsTokenCount(col("text"))) === 0)
    assert(eval("   ", wsTokenCount(col("text"))) === 0)
    // don't, it's → [don, ', t] [it, ', s] = 3+3, plus "ok." = 2
    assert(eval("don't it's ok.", bpeTokenCount(col("text"))) === 8)
  }

  test("language id picks the language with most function words") {
    assert(eval("the cat is on the mat and a dog", langId(col("text"))) === "en")
    assert(eval("der Hund ist nicht ein Katze mit", langId(col("text"))) === "de")
    assert(eval("el perro es un gato que y la", langId(col("text"))) === "es")
    assert(eval("zzz qqq www", langId(col("text"))) === "und")
    assert(eval("", langId(col("text"))) === "und")
  }

  test("quality score bounded and ordered sensibly") {
    val good = eval("The quick brown fox jumps over the lazy dog. " * 5,
      qualityScore(col("text"))).asInstanceOf[Double]
    val bad = eval("!!! ??? *** ### $$$ %%%",
      qualityScore(col("text"))).asInstanceOf[Double]
    assert(good > 0.8 && good <= 1.0)
    assert(bad < 0.5)
    assert(good > bad)
  }

  test("fingerprint is whitespace/case insensitive") {
    val a = eval("Hello   World", fingerprintMd5(col("text")))
    val b = eval("hello world", fingerprintMd5(col("text")))
    val c = eval("hello worlds", fingerprintMd5(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("char shingles distinct and of length n") {
    val sh = eval("abcabc", charShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq === Seq("abc", "bca", "cab"))
    assert(eval("ab", charShingles(col("text"), 3))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
  }

  test("multimodal: decode stub produces histogram + thumbnail") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    // same shape modulo nullability (Catalyst infers its own nullability)
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      === Multimodal.mediaSchema.fields
        .map(f => (f.name, f.dataType.simpleString)).toSeq)
    val feats = Multimodal.decodeStub(media, thumbBytes = 16)
    val row = feats.filter(col("media_id") === 0).collect()(0)
    val hist = row.getSeq[Double](2)
    assert(hist.length === 16)
    assert(math.abs(hist.sum - 1.0) < 1e-9) // normalized
    assert(row.getAs[Array[Byte]](3).length <= 16)
    assert(feats.count() === docs.count())
  }

  test("multimodal: frame sampling explodes rows deterministically") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val frames = Multimodal.frameSampleStub(media, chunk = 32, stride = 4)
    val n0 = media.filter(col("media_id") === 0)
      .select(length(col("bytes"))).collect()(0).getInt(0)
    val expected = (0 until n0 / 32 by 4).size
    assert(frames.filter(col("media_id") === 0).count() === expected)
    frames.collect().foreach(r => assert(r.getAs[Array[Byte]](2).length == 32))
  }

  test("multimodal: size-aware repartition balances byte load") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val parts = Multimodal.repartitionBySize(media, 8)
    assert(parts.rdd.getNumPartitions === 8)
    assert(parts.count() === media.count())
  }
}
