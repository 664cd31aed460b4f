package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: place variable-length
  * documents into fixed-capacity token windows ("sequences") so training
  * steps waste as little padding as possible.
  *
  * Two published strategies:
  *  - [[packConcat]] — GPT-style concat-and-chunk: documents are laid out
  *    back-to-back in a deterministic order and the token stream is cut
  *    every `capacity` tokens; documents may straddle a cut. Zero padding
  *    by construction.
  *  - [[packNextFit]] — no-split next-fit: a document that would overflow
  *    the current sequence starts a new one (documents are never split —
  *    the "fewer truncations" family of packing schemes). Fill ratio is
  *    traded for document integrity.
  *
  * Scale design (100 TB): both operators shard the corpus by
  * `pmod(id, shards)` and do ALL sequential work per shard — the cumsum
  * window and the next-fit scan are partitioned by shard, so no task ever
  * sees more than ~N/shards rows and no global sort or single-partition
  * window exists in either plan. Pick `shards` ≈ a few × total cores;
  * sequence addresses are (shard, seq-within-shard) pairs so shards never
  * coordinate.
  */
object Packing {

  /** Concat-and-chunk packing. Returns one row per document:
    * (idCol, shard, n_tokens, tok_start, seq_first, seq_last,
    * offset_in_seq) where `tok_start` is the document's offset in its
    * shard's concatenated token stream, `seq_first`/`seq_last` the
    * 0-based indices of the sequences it lands in (equal unless it
    * straddles a cut), and `offset_in_seq` its offset inside
    * `seq_first`. Deterministic: layout order is ascending id within a
    * shard. `tokenCol` is any integer token-count expression (e.g.
    * [[graft.text.TextAnalysis.wsTokenCount]] or `bpeTokenCount` of the
    * text column). */
  def packConcat(df: DataFrame, idCol: String, tokenCol: Column,
      capacity: Long, shards: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    require(shards > 0, s"shards must be > 0, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    // integral `div`, not double division: a shard's token stream can
    // pass 2^53 at real scale, where double division silently rounds
    df.select(col(idCol) +: pmod(col(idCol), lit(shards)).as("shard") +:
        tokenCol.cast("long").as("n_tokens") +: carry.map(col): _*)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("__cum") - col("n_tokens"))
      .withColumn("seq_first", expr(s"tok_start div ${capacity}L"))
      // an empty document "lands" where it starts; the straddle formula
      // (cum−1) would look at the previous token and go negative at
      // cum=0, where integer-div semantics diverge across engines
      .withColumn("seq_last",
        when(col("n_tokens") === 0, col("seq_first"))
          .otherwise(expr(s"(__cum - 1) div ${capacity}L")))
      .withColumn("offset_in_seq", col("tok_start") % capacity)
      .select(col(idCol) +: col("shard") +: col("n_tokens") +:
        col("tok_start") +: col("seq_first") +: col("seq_last") +:
        col("offset_in_seq") +: carry.map(col): _*)
  }

  /** No-split next-fit packing: within each shard, documents are visited
    * in ascending id order and appended to the current sequence unless
    * they would push it past `capacity`, in which case a new sequence
    * starts. A single document longer than `capacity` gets a sequence of
    * its own (callers should filter or truncate upstream). Returns
    * (idCol, shard, n_tokens, seq_id, offset_in_seq).
    *
    * The per-shard scan is a genuine sequential recurrence (each
    * placement depends on the running fill), so it runs as imperative
    * per-group code — `groupByKey(shard).flatMapGroups` with an in-group
    * sort, the same bounded-by-group pattern as the batch science engine.
    * Next-fit's classical guarantee: at most 2× the optimal number of
    * bins, i.e. fill ratio > 50% whenever all documents fit capacity. */
  def packNextFit(df: DataFrame, idCol: String, tokenCol: Column,
      capacity: Long, shards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    require(shards > 0, s"shards must be > 0, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(idCol).cast("long"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"),
        tokenCol.cast("long").as("n_tokens"))
      .as[(Long, Int, Long)]
    keyed.groupByKey(_._2)
      .flatMapGroups { (shard, rows) =>
        // group = one shard (~N/shards docs); sort once, scan once
        val sorted = rows.toArray.sortBy(_._1)
        var seq = 0L; var fill = 0L
        sorted.iterator.map { case (id, _, n) =>
          if (fill > 0 && fill + n > capacity) { seq += 1; fill = 0L }
          val off = fill
          fill += n
          (id, shard, n, seq, off)
        }
      }
      .toDF(idCol, "shard", "n_tokens", "seq_id", "offset_in_seq")
  }

  /** Packing efficiency rollup per shard: sequences used, tokens packed,
    * fill ratio = tokens / (sequences × capacity). For [[packConcat]]
    * output pass `seqCol = "seq_last"`; for [[packNextFit]],
    * `seqCol = "seq_id"`. */
  def packingStats(packed: DataFrame, capacity: Long,
      seqCol: String): DataFrame =
    packed.groupBy(col("shard"))
      .agg((max(col(seqCol)) + 1).as("n_seqs"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fill_ratio",
        col("n_tokens").cast("double") / (col("n_seqs") * capacity))

  /** Global training-shard assignment: lay the whole corpus out in ONE
    * deterministic shuffled order (the seeded md5 uniform of
    * [[Sampling.deterministicShuffle]]) and cut the concatenated token
    * stream every `tokensPerShard` tokens — the step that turns a curated
    * corpus into the fixed-size training files a data loader consumes.
    * A document belongs to the shard where it STARTS (concat-and-chunk
    * start rule, the same convention as [[packConcat]]'s `seq_first`).
    *
    * Returns one row per document:
    * (idCol, u, bucket, n_tokens, global_start, shard).
    *
    * Scale design (100 TB): the global running sum is NEVER a global
    * window. The order key u is bucketed by its top bits
    * (`floor(u·nBuckets)` — order-aligned: every u in bucket i sorts
    * before every u in bucket i+1, and equal u implies equal bucket), a
    * per-bucket token-sum aggregate comes back to the driver (nBuckets
    * rows), exclusive prefix offsets ship back as a broadcast dimension
    * table, and the cumsum window runs PARTITIONED BY BUCKET — the same
    * two-phase posture as [[Sampling.tokenBudgetSample]]. Shard division
    * is integral `div` (a corpus token stream passes 2^53 at real scale).
    *
    * Cross-engine determinism: u is the exact 53-bit md5 uniform, token
    * counts and cumsums are exact longs — every output column hash-matches
    * with NO rounding, and the oracle may replay the naive single-window
    * formulation (provably equal by the bucket order-alignment above). */
  def assignShards(df: DataFrame, idCol: String, tokenCol: Column,
      tokensPerShard: Long, seed: Long = 42L,
      nBuckets: Int = 1024): DataFrame = {
    require(tokensPerShard > 0,
      s"tokensPerShard must be > 0, got $tokensPerShard")
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val u = Sampling.hashUniform(col(idCol), seed)
    val keyed = df.select(col(idCol), u.as("u"),
      floor(u * nBuckets).cast("long").as("bucket"),
      tokenCol.cast("long").as("n_tokens"))
    val bucketSums = keyed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // driver-side exclusive prefix over ≤ nBuckets rows
    var acc = 0L
    val offsets = bucketSums.map { case (b, t) =>
      val o = acc; acc += t; (b, o)
    }
    val offsetDf = broadcast(offsets.toSeq.toDF("bucket", "__offset"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("u"), col(idCol))
    keyed.join(offsetDf, Seq("bucket"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("global_start",
        col("__offset") + col("__cum") - col("n_tokens"))
      .withColumn("shard",
        expr(s"global_start div ${tokensPerShard}L"))
      .select(col(idCol), col("u"), col("bucket"), col("n_tokens"),
        col("global_start"), col("shard"))
  }

  /** Materialize [[assignShards]] as the training layout on disk: parquet
    * partitioned by shard (a loader reads `shard=i/` directories in
    * order) plus a `_manifest.json` recording the layout parameters and
    * per-shard document/token counts — the artifact a training job points
    * at. Returns the manifest as a DataFrame (shard, n_docs, n_tokens). */
  /** Length-grouped batch assignment (the HF `group_by_length` /
    * dynamic-batching recipe): order documents by (token count asc,
    * id) and cut consecutive runs of `batchSize` into batches, so each
    * padded batch wastes `n·max − Σ` tokens on near-equal lengths
    * instead of the random-order worst case (a batch's pad cost is set
    * by its LONGEST member — mixing a 2k-token doc into a batch of
    * 100-token docs pads every row to 2k).
    *
    * Scale design: the global length rank uses the
    * [[Sampling.stratumBucketRank]] two-phase bucket-offset pattern
    * (bucket = tokens >> 4, order-aligned with the rank; driver prefix
    * offsets; window partitioned by (stratum, bucket)) — never a
    * single-task global window. The per-batch rollup is ONE keyed
    * aggregate on batch_id. Returns one row per batch: (batch_id, n,
    * min_tokens, max_tokens, sum_tokens, padding); the last batch may
    * be short. */
  def lengthGroupedBatches(df: DataFrame, batchSize: Int,
      tokenCol: Column, idCol: String = "doc_id"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // NULL token counts coalesce to 0 — a NULL bucket key would
    // silently drop the row at the two-phase offset join
    val t = df.select(col(idCol).cast("long").as("__id"),
        coalesce(tokenCol.cast("long"), lit(0L)).as("__n"))
      .withColumn("__s", lit("_"))
      .withColumn("__b", shiftright(col("__n"), 4))
    val ranked = Sampling.stratumBucketRank(t, "__s", "__b",
      Seq(col("__n").asc, col("__id").asc), "__rk")
    ranked
      .select((floor((col("__rk") - 1) / batchSize)).cast("long")
        .as("batch_id"), col("__n"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n"),
        min(col("__n")).as("min_tokens"),
        max(col("__n")).as("max_tokens"),
        sum(col("__n")).as("sum_tokens"))
      .withColumn("padding",
        col("n") * col("max_tokens") - col("sum_tokens"))
  }

  def writeTrainingShards(df: DataFrame, outDir: String, idCol: String,
      tokenCol: Column, tokensPerShard: Long, seed: Long = 42L,
      nBuckets: Int = 1024, carry: Seq[String] = Nil): DataFrame = {
    val assigned = assignShards(df, idCol, tokenCol, tokensPerShard, seed,
      nBuckets)
    val rows = df.join(assigned.select(col(idCol), col("u"),
        col("global_start"), col("shard")), Seq(idCol))
    rows.select(col(idCol) +: col("u") +: col("global_start") +:
        col("shard") +: carry.map(col): _*)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("u"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val manifest = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("shard"))
    val spec = manifest.collect().map(r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""n_tokens":${r.getLong(2)}}""").mkString(",\n  ")
    val meta =
      s"""{"tokens_per_shard":$tokensPerShard,"seed":$seed,
         |"n_buckets":$nBuckets,"shards":[
         |  $spec
         |]}""".stripMargin
    val path = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write(meta.getBytes("UTF-8")); out.close()
    manifest
  }

  /** Context-length planning table: for each candidate context window
    * `L`, how much of the corpus fits — the table that decides a
    * training run's sequence length BEFORE committing to it (too short
    * truncates long documents; too long pads or starves the batch):
    * per L, docs fitting whole, the doc fraction, total corpus tokens,
    * tokens surviving truncate-at-L, and the surviving fraction. All
    * integer-exact except the two rounded fractions.
    *
    * Scale: the corpus expands ×|contexts| in a MAP-ONLY explode (no
    * data is materialized — it feeds straight into map-side partial
    * aggregation), and |contexts| rows come out. One pass. */
  def contextBudgetCurve(df: DataFrame, tokenCol: Column,
      contexts: Seq[Int]): DataFrame = {
    require(contexts.nonEmpty, "contexts must be non-empty")
    require(contexts.forall(_ > 0), s"contexts must be positive: $contexts")
    require(contexts.distinct.size == contexts.size,
      s"duplicate context lengths: $contexts")
    val ctxLit = array(contexts.map(c => lit(c.toLong)): _*)
    df.select(tokenCol.cast("long").as("__tok"))
      .select(explode(ctxLit).as("context_len"), col("__tok"))
      .groupBy(col("context_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__tok") <= col("context_len"), 1L).otherwise(0L))
          .as("n_docs_fit"),
        sum(col("__tok")).as("total_tokens"),
        sum(least(col("__tok"), col("context_len")))
          .as("tokens_kept_truncate"))
      .select(col("context_len"), col("n_docs"), col("n_docs_fit"),
        round(col("n_docs_fit").cast("double") /
          col("n_docs").cast("double"), 6).as("frac_docs_fit"),
        col("total_tokens"), col("tokens_kept_truncate"),
        round(col("tokens_kept_truncate").cast("double") /
          col("total_tokens").cast("double"), 6).as("frac_tokens_kept"))
  }

  /** Document-boundary segments of a [[packConcat]] manifest — the
    * ATTENTION-MASK table for packed training: concat-and-chunk puts
    * several documents (and document fragments) into one
    * `capacity`-token sequence, and a correct packed-attention setup
    * must not attend across the boundaries (the "packing without
    * cross-contamination" construction). One row per (shard, seq,
    * document segment): the segment's [seg_start, seg_end) token range
    * inside the sequence, its position among the sequence's segments,
    * and the sequence's segment count / occupied tokens / padding —
    * everything a loss-mask or block-diagonal attention builder needs.
    * Zero-token documents occupy no tokens and emit no segment.
    *
    * Scale: the manifest (≤1 row/doc) explodes to ≤1 row per (doc,
    * spanned sequence); the only windows partition by (shard, seq) —
    * bounded by the ≤capacity documents a sequence can contain. */
  def sequenceBoundaries(manifest: DataFrame, capacity: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val seg = manifest.filter(col("n_tokens") > 0)
      .select(col(idCol), col("shard"), col("tok_start"), col("n_tokens"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .select(col("shard"), col("seq"), col(idCol),
        greatest(lit(0L), col("tok_start") - col("seq") * capacity)
          .as("seg_start"),
        least(lit(capacity), col("tok_start") + col("n_tokens") -
          col("seq") * capacity).as("seg_end"))
    val bySeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("seq"))
    val ordered = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("seq"))
      .orderBy(col("seg_start").asc, col(idCol).asc)
    seg
      .withColumn("segment", row_number().over(ordered).cast("int"))
      .withColumn("n_segments", count(lit(1)).over(bySeq))
      .withColumn("seq_tokens",
        sum(col("seg_end") - col("seg_start")).over(bySeq))
      .withColumn("padding", lit(capacity) - col("seq_tokens"))
  }
}
