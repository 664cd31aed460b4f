package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) writer/reader — the NATIVE container of every
  * CommonCrawl-derived corpus: before a crawl is parquet, it is WARC.
  * The writer emits standard `response` records (version line, named
  * headers including the ISO-mandatory WARC-Date, Content-Length in
  * octets, double-CRLF separator, payload, double-CRLF trailer), both
  * UNCOMPRESSED (`.warc`) and PER-MEMBER-GZIP (`.warc.gz` — one gzip
  * member per record, CommonCrawl's actual distribution layout).
  * Writes are ATOMIC per file: the stream goes to a dot-prefixed
  * `.tmp` path and renames onto the final name at close, so a failed
  * task never leaves a truncated part file where the readers glob.
  *
  * Two readers, two trade-offs:
  *  - [[readWarc]] (uncompressed): the classic splittable-Spark recipe
  *    — Hadoop TextInputFormat with `textinputformat.record.delimiter
  *    = "WARC/1.0\r\n"` — one big .warc fans out across input splits
  *    WITHOUT a custom InputFormat. Honest limit (documented,
  *    standard): a payload CONTAINING the delimiter bytes would split
  *    early; the reader flags the damage (`length_ok = false`) instead
  *    of walking Content-Length.
  *  - [[readWarcGz]] (.warc.gz): the CONTENT-LENGTH WALK over the
  *    decompressed stream — JDK GZIPInputStream reads concatenated
  *    members transparently, and each record is consumed by parsing
  *    its headers and reading exactly Content-Length payload octets,
  *    so delimiter bytes inside payloads CANNOT split a record (the
  *    walk is what real WARC tooling does). Parallelism is per FILE
  *    (gzip members are not seekable without an index) — exactly how
  *    CommonCrawl ships: ~1 GB .warc.gz files in the thousands, so a
  *    cluster parallelizes across files, not within them. When the
  *    writer's `.warc.gz.idx` member-offset sidecar is present,
  *    [[readWarcGzSplit]] lifts that limit and splits WITHIN a file at
  *    member boundaries (the cdx-index idea).
  *
  * Text corpora write/read round-trip exactly through BOTH containers
  * (q_warc_roundtrip pins every header AND the payload bytes via
  * length + content equality, per container).
  *
  * Scale: the writer is one sequential stream per partition through the
  * Hadoop FileSystem API (local/HDFS/object store alike); the readers
  * are input splits (plain) or one-task-per-file streams (gz) — no
  * shuffle anywhere. */
object Warc {

  private val Delim = "WARC/1.0\r\n"

  /** Deterministic default for the mandatory WARC-Date header: the
    * epoch, so disk artifacts stay byte-replayable under the oracle.
    * Callers with a real crawl timestamp pass it through `warcDate`. */
  val EpochWarcDate = "1970-01-01T00:00:00Z"

  /** Write one `part_<pid>.warc` (or `.warc.gz` when `gzip`) per
    * partition under `dir`: one record per row of `warcType`
    * (default `response`; `WARC-Refers-To: <prefix:id>` is emitted
    * when `refersToPrefix` is set — the conversion-record linkage,
    * see [[writeWet]]) — (idCol long,
    * uriCol string, textCol string payload, UTF-8). Each gzip record is
    * its OWN gzip member (JDK GZIPOutputStream writes a fixed header —
    * MTIME 0 — so the bytes are deterministic given the JDK's zlib, the
    * compressionRatio kernel's contract), and every `.warc.gz` gets a
    * `.warc.gz.idx` SIDECAR listing each member's byte offset (one
    * decimal per line, then the file length) — the cdx-style index that
    * lets [[readWarcGz]] split ONE gz file across tasks at member
    * boundaries, gzip's only splittable points. Files appear atomically
    * via tmp-write + rename (sidecar too). Returns one row per file:
    * (file, n_records, n_bytes) — n_bytes counts bytes ON DISK
    * (compressed when gzip). */
  def writeWarc(df: DataFrame, dir: String, idCol: String = "doc_id",
      uriCol: String = "url", textCol: String = "text",
      gzip: Boolean = false,
      warcDate: String = EpochWarcDate,
      warcType: String = "response",
      refersToPrefix: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ship the session's Hadoop configuration into the task closure —
    // a bare `new Configuration()` would drop filesystem settings and
    // credentials (e.g. s3a) set on the SparkContext, so writes work on
    // local/HDFS defaults but fail on configured object stores
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // a BINARY payload column writes its octets verbatim — the path
    // that preserves non-UTF-8 wire bodies end-to-end (a string column
    // is necessarily UTF-8 inside Spark, so windows-1252/Shift-JIS
    // responses must travel as bytes)
    val binaryPayload = df.schema(textCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    df.select(col(idCol).cast("long"), col(uriCol), col(textCol))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conf = hconf.value
        val ext = if (gzip) ".warc.gz" else ".warc"
        val finalPath =
          new org.apache.hadoop.fs.Path(dir, f"part_$pid%05d$ext")
        val tmpPath =
          new org.apache.hadoop.fs.Path(dir, f".part_$pid%05d$ext.tmp")
        val fs = finalPath.getFileSystem(conf)
        val out = new java.io.BufferedOutputStream(fs.create(tmpPath, true))
        var n = 0L
        var bytes = 0L
        val counted = new java.io.OutputStream {
          override def write(b: Int): Unit = { out.write(b); bytes += 1 }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            out.write(b, off, len); bytes += len
          }
        }
        val memberOffsets = scala.collection.mutable.ArrayBuffer[Long]()
        it.foreach { r =>
          if (gzip) memberOffsets += bytes
          val pBytes =
            if (r.isNullAt(2)) Array.emptyByteArray
            else if (binaryPayload) r.getAs[Array[Byte]](2)
            else r.getString(2)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val sb = new StringBuilder
          sb.append(Delim)
          sb.append(s"WARC-Type: $warcType\r\n")
          sb.append(s"WARC-Record-ID: <urn:graft:${r.getLong(0)}>\r\n")
          refersToPrefix.foreach(p =>
            sb.append(s"WARC-Refers-To: <$p:${r.getLong(0)}>\r\n"))
          sb.append(s"WARC-Date: $warcDate\r\n")
          sb.append("WARC-Target-URI: ")
            .append(if (r.isNullAt(1)) "" else r.getString(1))
            .append("\r\n")
          sb.append("Content-Type: text/plain\r\n")
          sb.append(s"Content-Length: ${pBytes.length}\r\n")
          sb.append("\r\n")
          val head =
            sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val trailer = "\r\n\r\n"
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          if (gzip) {
            // one member per record: finish() flushes the gzip trailer
            // without closing the underlying stream
            val gz = new java.util.zip.GZIPOutputStream(counted)
            gz.write(head); gz.write(pBytes); gz.write(trailer)
            gz.finish()
          } else {
            counted.write(head); counted.write(pBytes)
            counted.write(trailer)
          }
          n += 1
        }
        out.close()
        if (n == 0) { fs.delete(tmpPath, false); Iterator.empty }
        else {
          fs.delete(finalPath, false)
          require(fs.rename(tmpPath, finalPath),
            s"atomic rename failed: $tmpPath -> $finalPath")
          if (gzip) {
            // member-offset sidecar: start offsets + total length,
            // same tmp-write + rename discipline
            val idxFinal = new org.apache.hadoop.fs.Path(
              finalPath.toString + ".idx")
            val idxTmp = new org.apache.hadoop.fs.Path(dir,
              f".part_$pid%05d$ext.idx.tmp")
            val io = fs.create(idxTmp, true)
            io.write((memberOffsets.mkString("\n") + "\n" + bytes + "\n")
              .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            io.close()
            fs.delete(idxFinal, false)
            require(fs.rename(idxTmp, idxFinal),
              s"atomic rename failed: $idxTmp -> $idxFinal")
          }
          Iterator((finalPath.toString, n, bytes))
        }
      }
      .toDF("file", "n_records", "n_bytes")
  }

  /** WET-style conversion records (the CommonCrawl WARC→WET step:
    * extracted plain text stored back into the WARC container with
    * `WARC-Type: conversion` and a `WARC-Refers-To` pointer at the
    * response record it was derived from). Same splittable layouts,
    * sidecars and atomic-rename discipline as [[writeWarc]]; extract
    * text FIRST (e.g. [[graft.text.HtmlExtract.extractText]]) and pass
    * it as `textCol`. */
  def writeWet(df: DataFrame, dir: String, idCol: String = "doc_id",
      uriCol: String = "url", textCol: String = "text",
      gzip: Boolean = false,
      warcDate: String = EpochWarcDate): DataFrame =
    writeWarc(df, dir, idCol, uriCol, textCol, gzip, warcDate,
      warcType = "conversion", refersToPrefix = Some("urn:graft"))

  private val OutSchema = Seq("record_id", "warc_type", "target_uri",
    "content_length", "payload", "payload_bytes", "length_ok",
    "warc_date")

  private type RecTuple =
    (Long, String, String, Long, String, Array[Byte], Boolean, String)

  /** Both readers emit the payload TWICE: `payload` (UTF-8 decode,
    * replacement-charred when the wire bytes were another charset —
    * the convenient column for known-UTF-8 corpora) and
    * `payload_bytes` (the verbatim octets, the column charset-driven
    * transcode and binary media walks must start from). Keeping both
    * costs one array the scan already holds; dropping the bytes at
    * read time was the r11 ingest boundary this closes. */
  private def headerTuple(headers: Map[String, String],
      payloadBytes: Array[Byte], lengthOk: Boolean): RecTuple = {
    val declared = headers.get("Content-Length")
      .flatMap(_.toLongOption).getOrElse(-1L)
    val id = headers.get("WARC-Record-ID")
      .flatMap("<urn:graft:(\\d+)>".r.findFirstMatchIn(_))
      .map(_.group(1).toLong)
    (id.getOrElse(-1L),
      headers.getOrElse("WARC-Type", ""),
      headers.getOrElse("WARC-Target-URI", ""),
      declared,
      new String(payloadBytes,
        java.nio.charset.StandardCharsets.UTF_8),
      payloadBytes,
      lengthOk,
      headers.getOrElse("WARC-Date", ""))
  }

  /** Read every `.warc` under `dir` back as one row per record:
    * (record_id, warc_type, target_uri, content_length [the header],
    * payload, length_ok [parsed payload octets == header], warc_date).
    * Splittable: records are delimited by the version line, so a 100 GB
    * .warc fans out across input splits like any text file. */
  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Delim)
    // Text is a raw byte holder — copyBytes() (NOT toString) keeps the
    // record's verbatim octets, so a windows-1252 payload survives to
    // the payload_bytes column instead of being replacement-charred by
    // an eager UTF-8 decode at the split boundary
    val records = spark.sparkContext.newAPIHadoopFile(
        s"$dir/*.warc",
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.copyBytes())
      .filter(_.nonEmpty) // the empty split before the first delimiter
    records.flatMap { rec =>
      // first CRLF CRLF in BYTES = header/payload separator
      var sep = -1
      var i = 0
      while (sep < 0 && i + 3 < rec.length) {
        if (rec(i) == '\r' && rec(i + 1) == '\n' &&
            rec(i + 2) == '\r' && rec(i + 3) == '\n') sep = i
        i += 1
      }
      if (sep < 0) None
      else {
        // WARC named headers are ASCII; URIs may carry UTF-8 — decode
        // the header block alone as UTF-8 (payload bytes stay raw)
        val headers = new String(rec, 0, sep,
            java.nio.charset.StandardCharsets.UTF_8)
          .split("\r\n").iterator
          .map(_.split(": ", 2))
          .collect { case Array(k, v) => k -> v }
          .toMap
        // payload = between the header separator and the record trailer
        var end = rec.length
        if (end - (sep + 4) >= 4 && rec(end - 4) == '\r' &&
            rec(end - 3) == '\n' && rec(end - 2) == '\r' &&
            rec(end - 1) == '\n') end -= 4
        val payload = java.util.Arrays.copyOfRange(rec, sep + 4, end)
        val declared = headers.get("Content-Length")
          .flatMap(_.toLongOption).getOrElse(-1L)
        Some(headerTuple(headers, payload, payload.length == declared))
      }
    }.toDF(OutSchema: _*)
  }

  /** Read every `.warc.gz` under `dir` (one gzip MEMBER per record —
    * the CommonCrawl layout; JDK GZIPInputStream concatenates members
    * transparently) via the CONTENT-LENGTH WALK: headers parse up to
    * the blank line, then exactly Content-Length payload octets are
    * consumed, then the CRLF CRLF trailer — so payloads containing the
    * version-line bytes can never split a record, the failure mode the
    * uncompressed delimiter recipe flags instead. A record whose
    * payload truncates early (damaged member) is emitted with
    * `length_ok = false` and the file walk stops there. Same schema as
    * [[readWarc]]. One task per FILE (gzip is not seekable) — match
    * the CommonCrawl shard layout: thousands of ~1 GB files. */
  def readWarcGz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(s"$dir/*.warc.gz")
      .flatMap { case (_, pds) =>
        val in = new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(
            new java.io.BufferedInputStream(pds.open())))
        walkRecords(in)
      }.toDF(OutSchema: _*)
  }

  /** [[readWarcGz]] with WITHIN-FILE splits from the `.warc.gz.idx`
    * member-offset sidecars [[writeWarc]] emits: each file's members
    * are grouped into up to `tasksPerFile` contiguous byte ranges
    * (member starts are gzip's only split points), and every range is
    * an independent task that seeks to its start offset and walks its
    * slice — so ONE multi-GB .warc.gz no longer pins one task, the
    * exact reason CommonCrawl publishes cdx offset indexes next to its
    * crawls. Files WITHOUT a sidecar degrade to one whole-file range
    * (never wrong, just unsplit). Range metadata is driver-side and
    * tiny (files × tasksPerFile). Same schema and row set as
    * [[readWarcGz]] — spec-pinned equal. */
  def readWarcGzSplit(spark: SparkSession, dir: String,
      tasksPerFile: Int = 8): DataFrame = {
    import spark.implicits._
    require(tasksPerFile >= 1,
      s"tasksPerFile must be >= 1, got $tasksPerFile")
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val files = fs.globStatus(
      new org.apache.hadoop.fs.Path(dir, "*.warc.gz"))
    val ranges: Seq[(String, Long, Long)] = files.toSeq.flatMap { st =>
      val p = st.getPath
      val idx = new org.apache.hadoop.fs.Path(p.toString + ".idx")
      if (!fs.exists(idx)) Seq((p.toString, 0L, st.getLen))
      else {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(fs.open(idx), bos, 4096,
          true)
        val raw = new String(bos.toByteArray,
          java.nio.charset.StandardCharsets.US_ASCII)
        val nums = raw.split("\n").iterator
          .map(_.trim).filter(_.nonEmpty).map(_.toLong).toIndexedSeq
        // lines = member start offsets ascending, then the file length
        val starts = nums.dropRight(1)
        val fileLen = nums.last
        if (starts.isEmpty) Seq((p.toString, 0L, fileLen))
        else {
          val perRange =
            math.max(1, (starts.size + tasksPerFile - 1) / tasksPerFile)
          starts.grouped(perRange).toSeq.map { g =>
            val from = g.head
            (p.toString, from, from) // end filled below
          }.zipWithIndex.map { case ((f, from, _), i) =>
            val nextStart = (i + 1) * perRange
            val to =
              if (nextStart < starts.size) starts(nextStart) else fileLen
            (f, from, to)
          }
        }
      }
    }
    if (ranges.isEmpty) {
      return Seq
        .empty[RecTuple]
        .toDF(OutSchema: _*)
    }
    // ship the session's Hadoop configuration into the task closure
    // (a bare `new Configuration()` loses object-store settings set on
    // the SparkContext — the writeWarc pattern)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.sparkContext.parallelize(ranges, ranges.size)
      .flatMap { case (file, from, to) =>
        val c = hconf.value
        val path = new org.apache.hadoop.fs.Path(file)
        val in = path.getFileSystem(c).open(path)
        in.seek(from)
        val bounded = new java.io.InputStream {
          private var remaining = to - from
          override def read(): Int =
            if (remaining <= 0) -1
            else { val b = in.read(); if (b >= 0) remaining -= 1; b }
          override def read(b: Array[Byte], off: Int, len: Int): Int = {
            if (remaining <= 0) -1
            else {
              val r = in.read(b, off,
                math.min(len.toLong, remaining).toInt)
              if (r > 0) remaining -= r
              r
            }
          }
          override def close(): Unit = in.close()
        }
        walkRecords(new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(
            new java.io.BufferedInputStream(bounded))))
      }.toDF(OutSchema: _*)
  }

  /** The Content-Length walk over a decompressed WARC byte stream. */
  private def walkRecords(in: java.io.InputStream)
      : Iterator[RecTuple] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    // CRLF-terminated line as bytes (WARC headers are ASCII); None = EOF
    def readLine(): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream(96)
      var b = in.read()
      if (b < 0) return None
      while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
      val arr = buf.toByteArray
      val len = if (arr.nonEmpty && arr(arr.length - 1) == '\r')
        arr.length - 1 else arr.length
      Some(new String(arr, 0, len, ascii))
    }
    def readFully(n: Long): (Array[Byte], Boolean) = {
      require(n <= Int.MaxValue, s"payload too large for one record: $n")
      val arr = new Array[Byte](n.toInt)
      var off = 0
      var eof = false
      while (off < arr.length && !eof) {
        val r = in.read(arr, off, arr.length - off)
        if (r < 0) eof = true else off += r
      }
      (java.util.Arrays.copyOf(arr, off), off == arr.length)
    }
    new Iterator[RecTuple] {
      // `damaged` MUST initialize before `nextRec`: the nextRec
      // initializer calls advance(), and Scala constructor ordering
      // would otherwise reset a damage flag set while reading the
      // FIRST record back to false
      private var damaged = false
      private var nextRec
          : Option[RecTuple] =
        advance()
      private def advance()
          : Option[RecTuple] = {
        if (damaged) return None
        // version line (skip blank inter-record lines defensively)
        var line = readLine()
        while (line.exists(_.isEmpty)) line = readLine()
        line match {
          case None => None
          case Some(v) if !v.startsWith("WARC/") =>
            damaged = true; None // stream damage: stop, don't guess
          case Some(_) =>
            val hdrs = scala.collection.mutable.Map[String, String]()
            var h = readLine()
            while (h.exists(_.nonEmpty)) {
              h.get.split(": ", 2) match {
                case Array(k, v) => hdrs(k) = v
                case _ => ()
              }
              h = readLine()
            }
            val declared = hdrs.get("Content-Length")
              .flatMap(_.toLongOption).getOrElse(-1L)
            if (declared < 0) { damaged = true; None }
            else {
              val (payload, full) = readFully(declared)
              // consume the CRLF CRLF record trailer
              if (full) readFully(4L)
              else damaged = true
              Some(headerTuple(hdrs.toMap, payload, full))
            }
        }
      }
      override def hasNext: Boolean = nextRec.isDefined
      override def next()
          : RecTuple = {
        val r = nextRec.get
        nextRec = advance()
        r
      }
    }
  }

  // --------------------------------------------- HTTP response parsing

  /** HTTP/1.x response metadata out of a WARC `response` payload — the
    * step between [[readWarc]] and HTML extraction that real pipelines
    * gate on (CommonCrawl stores the FULL response: status line +
    * headers + body; a corpus keeps 200s of textual media types and
    * routes the rest by Content-Type). Adds to the input columns:
    * is_http [payload starts with an HTTP/1.x status line], status
    * [int, NULL when not HTTP], reason, content_type [the lowercased
    * media type alone], charset [from the Content-Type parameters,
    * lowercased], content_length_hdr [the header value — the DECLARED
    * length, callers compare with the actual body], location [the
    * redirect target of 3xx responses — feed it back into the crawl
    * frontier as a candidate edge], http_body [bytes
    * after the first blank line; NULL when not HTTP]. Header names
    * match case-insensitively anywhere in the header block; values
    * trim. Pure per-row regexp expressions, zero shuffle — the
    * [[graft.text.HtmlExtract]] posture.
    *
    * Boundary (documented): HTTP/1.1 transfer-encoding chunked bodies
    * are returned raw (chunk-size lines included) — WARC captures the
    * wire form; de-chunking is a separate concern a caller opts into.
    *
    * Truncation is DISTINGUISHABLE from emptiness: `headers_ok` is
    * true only when the header block actually terminates in a blank
    * line; a truncated capture gets `headers_ok = false` and a NULL
    * `http_body` (not ''), and a malformed status line leaves `reason`
    * NULL rather than '' — so no downstream gate can mistake damage
    * for a genuine empty-bodied 204.
    *
    * When `bytesCol` names the reader's `payload_bytes` column, the
    * frame also gets `http_body_bytes`: the body OCTETS after the
    * header terminator, the column [[decodeHttpBody]] transcodes with
    * the detected charset (status/header detection stays on the string
    * payload — HTTP headers are ASCII, so they survive any charset). */
  def httpResponseMeta(df: DataFrame,
      payloadCol: String = "payload",
      bytesCol: Option[String] = None): DataFrame = {
    val p = col(payloadCol)
    val isHttp = p.rlike("^HTTP/[0-9.]+ ")
    val headersOk = p.rlike("(?s)\r?\n\r?\n")
    // header block = status line through the first blank line (tolerant
    // of bare-LF separators some archives carry)
    val headerBlock =
      regexp_extract(p, "(?s)^(.*?)\r?\n\r?\n", 1)
    def header(name: String): org.apache.spark.sql.Column = {
      val v = regexp_extract(headerBlock,
        "(?im)^" + name + ":[ \t]*([^\r\n]*)", 1)
      when(!isHttp || trim(v) === "", lit(null).cast("string"))
        .otherwise(trim(v))
    }
    val ctype = header("Content-Type")
    val body = regexp_extract(p, "(?s)^.*?\r?\n\r?\n(.*)$", 1)
    val statusCol = regexp_extract(p, "^HTTP/[0-9.]+ (\\d{3})", 1)
    val withBase = df
      .withColumn("is_http", isHttp)
      .withColumn("headers_ok",
        when(isHttp, headersOk).otherwise(lit(null).cast("boolean")))
      .withColumn("status",
        when(isHttp && statusCol =!= "", statusCol.cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("reason",
        when(isHttp && statusCol =!= "", trim(regexp_extract(p,
          "^HTTP/[0-9.]+ \\d{3}([^\r\n]*)", 1)))
          .otherwise(lit(null).cast("string")))
    withBase
      .withColumn("content_type",
        lower(trim(regexp_extract(coalesce(ctype, lit("")),
          "^([^;]*)", 1))))
      .withColumn("content_type",
        when(col("content_type") === "", lit(null).cast("string"))
          .otherwise(col("content_type")))
      .withColumn("charset",
        when(ctype.isNotNull,
          lower(regexp_extract(ctype,
            "(?i)charset=\"?([A-Za-z0-9_][A-Za-z0-9._-]*)", 1)))
          .otherwise(lit(null).cast("string")))
      .withColumn("charset",
        when(col("charset") === "", lit(null).cast("string"))
          .otherwise(col("charset")))
      .withColumn("content_length_hdr",
        header("Content-Length").cast("long"))
      .withColumn("location", header("Location"))
      .withColumn("chunked",
        coalesce(header("Transfer-Encoding"), lit(""))
          .rlike("(?i)\\bchunked\\b"))
      .withColumn("http_body",
        when(isHttp && headersOk, body)
          .otherwise(lit(null).cast("string")))
      .transform { base =>
        bytesCol match {
          case None => base
          case Some(bc) =>
            base.withColumn("http_body_bytes",
              when(isHttp,
                graft.functions.HttpBytesExpressions
                  .httpBodyBytesCol(col(bc)))
                .otherwise(lit(null).cast("binary")))
        }
      }
  }

  /** Charset-driven body decode over [[httpResponseMeta]]'s
    * `http_body_bytes` — the transcode that closes the UTF-8-at-read
    * ingest boundary: chunked bodies are reassembled FIRST over octets
    * (RFC 9112 sizes count bytes; malformed framing keeps the raw
    * bytes and lowers `dechunk_ok`), then the octets decode with the
    * charset the wire metadata detected (unknown labels and missing
    * charset parameters fall back to UTF-8, the HTML5 default;
    * unmappable bytes become U+FFFD, never an error). Adds
    * `http_text` (the correctly-transcoded body — what every
    * downstream text operator should consume instead of `http_body`)
    * and `dechunk_ok`. Pure native-expression columns: map-only,
    * whole-stage-codegen'd, zero shuffle. */
  def decodeHttpBody(df: DataFrame,
      bytesCol: String = "http_body_bytes",
      charsetCol: String = "charset",
      chunkedCol: String = "chunked",
      outCol: String = "http_text"): DataFrame = {
    import graft.functions.HttpBytesExpressions._
    val raw = col(bytesCol)
    val dech = dechunkBytesCol(raw)
    val eff = when(coalesce(col(chunkedCol), lit(false)),
      coalesce(dech, raw)).otherwise(raw)
    df
      .withColumn("dechunk_ok",
        when(raw.isNull, lit(true))
          .otherwise(!coalesce(col(chunkedCol), lit(false)) ||
            dech.isNotNull))
      .withColumn(outCol,
        charsetDecode(eff, coalesce(col(charsetCol), lit("utf-8"))))
  }

  /** Decode `Transfer-Encoding: chunked` bodies in place — closing the
    * boundary [[httpResponseMeta]] documents: rows whose `chunked`
    * column is true get their `bodyCol` replaced by the reassembled
    * payload (hex chunk-size lines walked over the UTF-8 BYTES — sizes
    * count octets, not chars — chunk extensions after `;` ignored,
    * trailers after the 0-chunk dropped, per RFC 9112 §7.1), plus a
    * `dechunk_ok` flag: malformed chunk framing (non-hex size, size
    * past the buffer, missing CRLF) keeps the RAW body and flips the
    * flag — the poisoned-row containment of the multimodal walks.
    * Non-chunked rows pass through with `dechunk_ok = true`. One
    * `mapPartitions` pass, no shuffle. */
  def dechunkHttpBodies(df: DataFrame,
      bodyCol: String = "http_body",
      chunkedCol: String = "chunked"): DataFrame = {
    val schema = df.schema
      .add(org.apache.spark.sql.types.StructField("dechunk_ok",
        org.apache.spark.sql.types.BooleanType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val bIdx = df.schema.fieldIndex(bodyCol)
    val cIdx = df.schema.fieldIndex(chunkedCol)
    df.mapPartitions { it =>
      it.map { r =>
        val vals = r.toSeq.toArray
        var ok = true
        if (!r.isNullAt(cIdx) && r.getBoolean(cIdx) &&
            !r.isNullAt(bIdx)) {
          dechunkOne(r.getString(bIdx)) match {
            case Some(decoded) => vals(bIdx) = decoded
            case None => ok = false // raw body kept
          }
        }
        org.apache.spark.sql.Row.fromSeq(
          vals.toIndexedSeq :+ Boolean.box(ok))
      }
    }(enc).toDF()
  }

  /** One chunked body → reassembled payload; None when the framing is
    * malformed. String facade over the shared OCTET kernel
    * ([[graft.functions.HttpBytesExpressions.dechunkBytes]]) — valid
    * only for char-aligned (UTF-8-representable) bodies; the byte path
    * [[decodeHttpBody]] is the charset-correct one. */
  private[graft] def dechunkOne(body: String): Option[String] =
    Option(graft.functions.HttpBytesExpressions.dechunkBytes(
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
}
