package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extraction / resize / frame-sampling
  * run as partition-batched transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives deterministic fake features from
  * the bytes. Everything around it — schema, batching, partitioning,
  * output shape — is real and tested; swapping a JNI/javacv decoder into
  * [[transformBinary]] changes no plan shape.
  *
  * Scale design (100 TB): media rows are fat (MBs each), so the
  * partitioner must balance *bytes*, not row counts —
  * [[repartitionBySize]] buckets by cumulative size class. The transform
  * itself is `mapPartitions` (the Scala analog of `mapInPandas`): one
  * iterator pass, no shuffle, decode amortized per batch. Filters on
  * metadata (format, dims) push down to parquet before any byte is read
  * when the metadata lives in its own columns — keep meta OUT of the
  * binary blob.
  */
object Multimodal {

  /** Canonical media schema: id, modality tag, raw bytes, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)
  ))

  /** Wrap any table into the media schema for testing: bytes = utf-8 of a
    * string column, deterministic fake metadata derived from the id. */
  def syntheticMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      struct(
        lit("png").as("format"),
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        (col(idCol) * 40L).as("duration_ms")).as("meta"))

  /** Output schema of the stub feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_histogram", ArrayType(DoubleType), nullable = true),
    StructField("thumb_bytes", BinaryType, nullable = true)
  ))

  /** STUB decode + feature extraction: 16-bin byte histogram (stands in
    * for pixel statistics) and a truncated-bytes "thumbnail" (stands in
    * for resize). A real build replaces the body of the per-row closure
    * with an actual codec; the batching/schema contract is unchanged. */
  def decodeStub(media: DataFrame, thumbBytes: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      // per-partition setup (a real decoder opens its context once here)
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val hist = new Array[Double](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(bytes.length, 1)
        val normed = hist.map(_ / n)
        Row(id, bytes.length, normed.toSeq, bytes.take(thumbBytes))
      }
    }(enc).toDF()
  }

  /** Frame sampling stub: every `stride`-th chunk of `chunk` bytes —
    * the plumbing shape of video frame extraction (one input row → many
    * output rows, flatMap, no shuffle). */
  def frameSampleStub(media: DataFrame, chunk: Int = 32,
      stride: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idIdx = media.schema.fieldIndex("media_id")
    val byIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(byIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](byIdx)
        val nChunks = bytes.length / chunk
        (0 until nChunks by stride).map { f =>
          Row(id, f, bytes.slice(f * chunk, f * chunk + chunk))
        }
      }
    }(enc).toDF()
  }

  /** Byte-size-aware repartition: assign each row a size class
    * (log2 of payload length) and hash-distribute within class, so a few
    * giant videos don't land on one executor while thumbnails pile up on
    * another. For real pipelines prefer writing with
    * `sortWithinPartitions(size_class)` + parquet so scans stay balanced. */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame = {
    val sized = media.withColumn("__size_class",
      floor(log2(greatest(length(col("bytes")).cast("long"), lit(1L)))))
    sized.repartition(partitions, col("__size_class"),
      pmod(hash(col("media_id")), lit(partitions)))
      .drop("__size_class")
  }
}
