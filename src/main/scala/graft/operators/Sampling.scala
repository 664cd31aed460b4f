package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture construction:
  * per-stratum (domain/language/source) keep-rates applied via a
  * content-derived hash uniform, so the sample is reproducible across
  * runs, engines and cluster layouts — no RNG state, no partition-order
  * dependence, and the SAME rows are kept when the job reruns or the
  * table is re-partitioned.
  *
  * Scale design (100 TB): the filter is a map-only scan — one md5 per
  * row, no shuffle, no sort, full predicate/projection pushdown around
  * it. Temperature-mixture rates derive from one tiny per-stratum count
  * aggregate whose result (|strata| rows) rides along as a broadcast
  * join.
  */
object Sampling {

  /** Deterministic uniform in [0, 1): the top 53 bits of an md5-derived
    * 64-bit hash of (key, seed) — the same construction as the SF²
    * Poisson-bootstrap uniforms (SF2Relational), so the DuckDB oracle
    * replays it bit-for-bit with
    * `(('0x' || substr(md5(...), 1, 16))::UBIGINT >> 11) / 2^53`. */
  def hashUniform(key: Column, seed: Long): Column =
    shiftrightunsigned(
      graft.functions.HashExpressions.md5Long(
        concat_ws("|", key, lit(seed))), 11).cast("double") /
      lit(9007199254740992.0) // 2^53

  /** Sentinel stratum for NULL values of the stratum column, so
    * [[temperatureRates]] and [[stratifiedSample]] agree on where
    * NULL-stratum rows land (a plain `===` match would silently send
    * them to `defaultRate` while the rate map counted them).
    *
    * RESERVED KEY: a stratum column whose *data* legitimately contains
    * the string `"__null__"` is indistinguishable from NULL rows — both
    * [[temperatureRates]] counting and [[stratifiedSample]] matching
    * merge the two into one stratum. Callers with free-form string
    * strata must rename or escape that value first. */
  val NullStratum = "__null__"

  /** Keep each row iff hashUniform(id) < rate(stratum). Strata absent
    * from `rates` fall back to `defaultRate`. NULL strata match the
    * [[NullStratum]] sentinel key (the key [[temperatureRates]] emits
    * for them; reserved — see its caveat). Exact-rate-1 strata keep every row (u < 1.0 always
    * holds since u < 1 by construction). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val stratum = coalesce(col(stratumCol).cast("string"), lit(NullStratum))
    val rateCol = rates.foldLeft(lit(defaultRate)) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), seed) < rateCol)
  }

  /** Deterministic global shuffle for training-order randomization:
    * orders the corpus by an md5-derived key of (id, seed) — a total
    * order that is reproducible across reruns, engines and physical
    * layouts, unlike `orderBy(rand())`. Planned as a range partition on
    * the key + per-partition sort: no single-task stage, and writers
    * preserve the global order across output files (partition i's rows
    * all precede partition i+1's). Returns the rows with a
    * `__shuffle_key` column so callers/tests can assert the order;
    * drop it before writing if not wanted. Epoch reshuffles = new seed. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
      numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__shuffle_key",
      hashUniform(col(idCol), seed))
    val ranged =
      if (numPartitions > 0)
        keyed.repartitionByRange(numPartitions, col("__shuffle_key"))
      else keyed.repartitionByRange(col("__shuffle_key"))
    ranged.sortWithinPartitions(col("__shuffle_key"))
  }

  /** EXACT-k per-stratum sample: the k rows of each stratum with the
    * highest md5 uniform of (id, seed) — complements [[stratifiedSample]]
    * (rate-based, approximate counts) when a mixture recipe demands
    * exact per-stratum counts. Deterministic and engine-replayable
    * (the selection order is `row_number() over (partition by stratum
    * order by u desc, id asc) <= k`), but planned as the bounded-heap
    * top-k AGGREGATE with map-side partials — a giant stratum reduces to
    * ≤ partitions·k heap entries before the exchange, where the window
    * formulation would drag the whole stratum through one task.
    * Strata smaller than k keep all their rows. NULL strata fall under
    * the reserved [[NullStratum]] key. `idCol` must be integral (the
    * heap keys on long ids). Returns (stratum, rank, idCol, u) with
    * rank 1 = highest uniform. */
  def stratifiedExactK(df: DataFrame, idCol: String, stratumCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = hashUniform(col(idCol), seed)
    df.select(
        coalesce(col(stratumCol).cast("string"), lit(NullStratum))
          .as("stratum"),
        col(idCol).cast("long").as("__id"), u.as("__u"))
      .groupBy(col("stratum"))
      .agg(graft.functions.TopKExpressions
        .topKByScore(col("__u"), col("__id"), k).as("__top"))
      .select(col("stratum"), posexplode(col("__top")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as(idCol), col("col.cosine").as("u"))
  }

  /** Curation FRONTIER: the quality-vs-quantity table behind choosing a
    * filter operating point — for every candidate threshold, how many
    * documents AND tokens survive `score ≥ t`. Reading this next to a
    * benchmark-vs-threshold curve is how the keep/drop line actually
    * gets picked; computing it in one pass beats re-running the filter
    * per candidate.
    *
    * ONE corpus aggregate builds every threshold's conditional sums as
    * columns (map-side partials); the per-threshold rows then unfold
    * from a T-element struct array — the corpus is scanned once no
    * matter how many thresholds. All integers + two rounded divisions.
    * NULL scores count as kept by no threshold (they appear in the
    * totals — visible, not vanished). Returns one row per threshold:
    * (threshold, n_docs, n_kept, frac_docs, total_tokens, tokens_kept,
    * frac_tokens). */
  def thresholdFrontier(df: DataFrame, scoreCol: String,
      tokenCol: Column, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val ts = thresholds.distinct.sorted
    val tok = coalesce(tokenCol.cast("long"), lit(0L))
    val aggs = Seq(count(lit(1)).as("__n"), sum(tok).as("__tok")) ++
      ts.zipWithIndex.flatMap { case (t, i) =>
        Seq(sum(when(col(scoreCol) >= t, 1L).otherwise(0L))
            .as(s"__k$i"),
          sum(when(col(scoreCol) >= t, tok).otherwise(0L))
            .as(s"__kt$i"))
      }
    val one = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val rows = explode(array(ts.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"__k$i").as("n_kept"),
        col(s"__kt$i").as("tokens_kept"))
    }: _*))
    one.select(col("__n"), col("__tok"), rows.as("__r"))
      .select(col("__r.threshold").as("threshold"),
        col("__n").as("n_docs"), col("__r.n_kept").as("n_kept"),
        round(col("__r.n_kept").cast("double") / col("__n"), 6)
          .as("frac_docs"),
        col("__tok").as("total_tokens"),
        col("__r.tokens_kept").as("tokens_kept"),
        round(col("__r.tokens_kept").cast("double") / col("__tok"), 6)
          .as("frac_tokens"))
  }

  /** Data mixing by EPOCHS-PER-SOURCE — the GPT-3-table-2.2 primitive
    * ("Wikipedia ×3.4 epochs, CommonCrawl ×0.44"): each stratum's
    * documents repeat `e_s` times in the training stream, with
    * fractional epochs realized per document (a doc repeats ⌊e_s⌋
    * times plus once more with probability frac(e_s), decided by its
    * seeded uniform — so EXACTLY the requested token share in
    * expectation, deterministic per document, and replay-stable).
    * Copies shuffle globally by the seeded uniform of (doc, copy), so
    * repeats spread through the run instead of clustering; `step` is
    * the 0-based global order via the two-phase bucket rank.
    *
    * Map-only expansion (explode of a ≤⌈e_max⌉-element sequence per
    * row) + the [[stratumBucketRank]] two-phase global rank — no
    * single-task window. Strata absent from the map use
    * `defaultEpochs`; epochs 0 drops the stratum. NULL strata key on
    * [[NullStratum]]. Returns (stratum, idCol, copy, u, step). */
  def mixtureEpochs(df: DataFrame, idCol: String, stratumCol: String,
      epochsPerStratum: Map[String, Double], defaultEpochs: Double = 1.0,
      seed: Long = 42L, nBuckets: Int = 1024): DataFrame = {
    require((epochsPerStratum.values ++ Seq(defaultEpochs))
      .forall(e => e >= 0 && e <= 100), "epochs must be in [0, 100]")
    val st = coalesce(col(stratumCol).cast("string"), lit(NullStratum))
    val eCol = epochsPerStratum.foldLeft(lit(defaultEpochs)) {
      case (acc, (s, e)) => when(st === s, lit(e)).otherwise(acc)
    }
    val base = floor(eCol).cast("long")
    val frac = eCol - floor(eCol)
    val reps = base +
      when(hashUniform(col(idCol), seed) < frac, 1L).otherwise(0L)
    val exploded = df
      .select(st.as("stratum"), col(idCol).cast("long").as(idCol),
        reps.as("__r"))
      .filter(col("__r") > 0)
      .select(col("stratum"), col(idCol),
        explode(sequence(lit(0L), col("__r") - 1)).as("copy"))
      .withColumn("u", hashUniform(
        concat_ws("#", col(idCol), col("copy")), seed + 1))
    val bucketed = exploded
      .withColumn("__s", lit("_"))
      .withColumn("__b", floor(col("u") * nBuckets).cast("long"))
    stratumBucketRank(bucketed, "__s", "__b",
      Seq(col("u").asc, col(idCol).asc, col("copy").asc), "__rk")
      .select(col("stratum"), col(idCol), col("copy"), col("u"),
        (col("__rk") - 1).as("step"))
  }

  /** Two-stage CLUSTER sampling (the survey-statistics design, applied
    * to corpus audits): stage 1 samples `kStrata` whole strata
    * (sources/domains/shards) by seeded uniform, stage 2 draws an
    * exact-`kPerStratum` sample inside each selected stratum — the
    * audit-sample shape when inspecting a stratum has fixed overhead
    * (fetch a crawl segment, brief an annotator) and spreading k·m rows
    * over every stratum would be wasteful. Fully deterministic: both
    * stages key on md5 uniforms (stratum at `seed`, rows at `seed+1`),
    * so the audit sample is reproducible and append-stable.
    *
    * Scale: stage 1 ranks the |strata|-bounded distinct table
    * (metadata); stage 2 is [[stratifiedExactK]]'s bounded heap after a
    * broadcast semi-join on the selected strata. Returns
    * (stratum, stratum_u, rank, idCol, u). */
  def clusterSample(df: DataFrame, idCol: String, stratumCol: String,
      kStrata: Int, kPerStratum: Int, seed: Long = 42L): DataFrame = {
    require(kStrata > 0, s"kStrata must be positive, got $kStrata")
    require(kPerStratum > 0,
      s"kPerStratum must be positive, got $kPerStratum")
    val st = coalesce(col(stratumCol).cast("string"), lit(NullStratum))
    val strata = df.select(st.as("stratum")).distinct()
      .withColumn("stratum_u", hashUniform(col("stratum"), seed))
    val picked = broadcast(strata
      .orderBy(col("stratum_u").desc, col("stratum").asc)
      .limit(kStrata))
    // semi-join BEFORE the heap: unselected strata never enter
    // per-partition heap state
    val filtered = df.withColumn("__st", st)
      .join(picked.select(col("stratum").as("__st")), Seq("__st"),
        "left_semi")
    stratifiedExactK(filtered, idCol, "__st", kPerStratum, seed + 1)
      .join(picked, Seq("stratum"))
      .select(col("stratum"), col("stratum_u"), col("rank"), col(idCol),
        col("u"))
  }

  /** Multi-epoch training order: the complete data order of an E-epoch
    * run — each epoch is an INDEPENDENT deterministic shuffle (the
    * seeded md5 uniform at `seed + epoch`, so no two epochs repeat a
    * permutation — the "reshuffle each epoch" contract every serious
    * training loop wants, made reproducible), concatenated with a
    * global 0-based `step` = epoch·N + rank-in-epoch. A data-loader
    * ordering by `step` replays the exact run; a checkpoint at step s
    * resumes mid-epoch by filtering `step >= s`.
    *
    * Scale: the per-epoch rank uses the [[stratumBucketRank]] two-phase
    * bucket-offset pattern (stratum = epoch, bucket = the uniform's top
    * bits — order-aligned) — never a per-epoch single-task window; the
    * output is E·N rows, the run's actual schedule. Returns
    * (epoch, idCol, u, step). */
  def multiEpochOrder(df: DataFrame, epochs: Int,
      idCol: String = "doc_id", seed: Long = 42L,
      nBuckets: Int = 1024): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    val n = df.count()
    val perEpoch = (0 until epochs).map { e =>
      df.select(lit(e.toLong).as("epoch"),
        col(idCol).cast("long").as(idCol),
        hashUniform(col(idCol), seed + e).as("u"))
    }.reduce(_ unionByName _)
    val bucketed = perEpoch
      .withColumn("__s", col("epoch").cast("string"))
      .withColumn("__b", floor(col("u") * nBuckets).cast("long"))
    stratumBucketRank(bucketed, "__s", "__b",
      Seq(col("u").asc, col(idCol).asc), "__rk")
      .select(col("epoch"), col(idCol), col("u"),
        (col("epoch") * n + col("__rk") - 1).as("step"))
  }

  /** Exact score threshold for a TARGET KEEP RATE — calibrating a
    * curation gate ("keep the best 30%") without guessing: the largest
    * ROUNDED-grid threshold `t` such that `count(score ≥ t) ≥
    * ⌈keepRate·N⌉`. Grid ties mean the actual kept count can exceed the
    * target by at most one grid cell's population — the exact guarantee
    * a threshold on a rounded score can make (reported, not hidden).
    *
    * The [[graft.text.Eval]] distinct-score pattern: ONE corpus
    * aggregate onto the rounded-score grid (map-side partials), then the
    * cumulative window runs over the grid-bounded distinct-score table
    * (≤ 10^roundDecimals + 1 rows for a [0,1] score — never the
    * corpus). NULL scores are excluded. Returns one row:
    * (n, n_target, threshold, n_kept, actual_rate). */
  def keepRateThreshold(df: DataFrame, scoreCol: String,
      keepRate: Double, roundDecimals: Int = 6): DataFrame = {
    require(keepRate > 0 && keepRate <= 1,
      s"keepRate must be in (0, 1], got $keepRate")
    require(roundDecimals >= 1 && roundDecimals <= 9,
      s"roundDecimals must be in [1, 9], got $roundDecimals")
    val ps = df.filter(col(scoreCol).isNotNull)
      .select(round(col(scoreCol), roundDecimals).as("__s"))
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    // cumulative over the DISTINCT rounded-score grid — bounded by the
    // 10^roundDecimals value resolution, never the corpus
    val w = graft.functions.BoundedWindow.ordered(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = ps.withColumn("__cum", sum(col("__c")).over(w))
    val tot = cum.groupBy().agg(sum(col("__c")).as("n"))
    val j = cum.crossJoin(broadcast(tot))
      .withColumn("__target",
        ceil(lit(keepRate) * col("n").cast("double")).cast("long"))
    val best = j.filter(col("__cum") >= col("__target"))
      .groupBy().agg(max(col("__s")).as("threshold"))
    j.join(broadcast(best), col("__s") === col("threshold"))
      .select(col("n"), col("__target").as("n_target"),
        col("threshold"), col("__cum").as("n_kept"),
        round(col("__cum").cast("double") / col("n"), 6)
          .as("actual_rate"))
  }

  /** Curriculum training order (Bengio et al. 2009 made operational):
    * examples grouped into `buckets` equal-frequency DIFFICULTY buckets
    * by a score (easy = low score first), seeded-shuffled WITHIN each
    * bucket (a strict score sort would correlate every batch with
    * whatever the score proxies — shuffling inside the bucket keeps
    * batches diverse while the difficulty ramp survives), and assigned
    * a global `step`. Deterministic end to end: bucket edges come from
    * the rounded-score distinct-value grid (bucket = ⌊countBelow·B/n⌋ —
    * integer-exact equal-frequency assignment, no sort), the shuffle
    * key is the seeded md5 uniform, and the global step is the
    * two-phase bucket-offset rank (the interleave/epoch-order plan — a
    * dominant bucket never sorts in one task... buckets are
    * near-equal-frequency by construction, but score TIES can still
    * pool: the window partitions by bucket, the offsets ride a
    * broadcast). Returns (idCol, score, bucket, u, step). */
  def curriculumOrder(df: DataFrame, idCol: String, score: Column,
      buckets: Int = 10, seed: Long = 42L,
      roundDecimals: Int = 6): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // NULL difficulty = no place on the ramp: excluded EXPLICITLY here
    // (a null score would silently vanish at the bucket equi-join
    // below — null keys never match — so the exclusion is stated, not
    // accidental)
    val scored = df.select(col(idCol),
        round(score.cast("double"), roundDecimals).as("score"))
      .filter(col("score").isNotNull)
      .localCheckpoint(true) // feeds the grid AND the final assignment
    val grid = scored.groupBy(col("score")).agg(count(lit(1)).as("__c"))
    // distinct rounded-score grid (≤ 10^roundDecimals-resolution rows)
    val cw = graft.functions.BoundedWindow.ordered(col("score").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val tot = grid.groupBy().agg(sum(col("__c")).as("__n"))
    val mapped = grid.withColumn("__cum", sum(col("__c")).over(cw))
      .crossJoin(broadcast(tot))
      .select(col("score"),
        floor(((col("__cum") - col("__c")) * buckets).cast("double") /
          col("__n").cast("double")).cast("int").as("bucket"))
    val withB = scored.join(mapped, Seq("score"))
      .withColumn("u", hashUniform(col(idCol), seed))
    val sizes = withB.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__bn"))
    // per-bucket size table: ≤ `buckets` rows by construction
    val ow = graft.functions.BoundedWindow.ordered(col("bucket").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = sizes
      .withColumn("__off", coalesce(sum(col("__bn")).over(ow), lit(0L)))
      .select(col("bucket"), col("__off"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("u").asc, col(idCol).asc)
    withB.join(broadcast(offsets), Seq("bucket"))
      .withColumn("step",
        (row_number().over(rw).cast("long") - 1) + col("__off"))
      .select(col(idCol), col("score"), col("bucket"), col("u"),
        col("step"))
  }

  /** UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): apportion a total token `budget` across strata as
    * UNIFORMLY as possible subject to a per-stratum repeat cap —
    * stratum s may contribute at most ⌊maxEpochs · tokens_s⌋ tokens.
    * Temperature sampling over-weights head languages at any
    * temperature; UniMax instead gives every language an equal share
    * until a language EXHAUSTS its cap (hits `maxEpochs` repeats), then
    * redistributes that language's unused share uniformly over the
    * rest — the classic waterfilling allocation.
    *
    * Closed form instead of the paper's loop: sort strata by capacity
    * ascending; a stratum is CAPPED iff every stratum up to it (in that
    * order) satisfies `cap_r · (n − r + 1) ≤ budget − Σ_{j<r} cap_j`
    * (a running AND — the capped set is a prefix of the sort); capped
    * strata take their full capacity, the rest split the remaining
    * budget evenly (floor). All integer arithmetic on exact longs —
    * the one float op is the final epochs ratio, rounded — so the
    * whole allocation replays bit-for-bit in the oracle.
    *
    * Scale: ONE token aggregate over the corpus (|strata| rows); the
    * waterfilling windows run on the |strata|-row grid only (global
    * orderBy windows over a dimension table — the keepRateThreshold
    * discipline). Returns (stratum, n_tokens, capacity, allocated,
    * epochs); NULL strata under the [[NullStratum]] sentinel. Feed
    * `allocated / n_tokens` into [[mixtureEpochs]] to realize the
    * schedule. */
  def unimaxAllocation(df: DataFrame, stratumCol: String, tokens: Column,
      budget: Long, maxEpochs: Double,
      roundDecimals: Int = 6): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val per = df.groupBy(coalesce(col(stratumCol).cast("string"),
        lit(NullStratum)).as("stratum"))
      // a stratum whose every token count is NULL sums to NULL —
      // coalesce to 0 so it waterfills as an (empty) capacity-0 row
      // instead of poisoning the prefix rule with NULL comparisons
      .agg(coalesce(sum(tokens.cast("long")), lit(0L)).as("n_tokens"))
      .select(col("stratum"), col("n_tokens"),
        floor(col("n_tokens").cast("double") * lit(maxEpochs))
          .cast("long").as("capacity"))
    // per-stratum capacity table: ≤ |strata| (languages) rows
    val ord = graft.functions.BoundedWindow
      .ordered(col("capacity").asc, col("stratum").asc)
    val before = ord.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, -1)
    val upTo = ord.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    val tot = per.groupBy().agg(count(lit(1)).as("__n"))
    val ranked = per
      .withColumn("__r", row_number().over(ord).cast("long"))
      .withColumn("__cumBefore",
        coalesce(sum(col("capacity")).over(before), lit(0L)))
      .crossJoin(broadcast(tot))
    val fits = when(col("capacity") * (col("__n") - col("__r") + 1) <=
      lit(budget) - col("__cumBefore"), 1).otherwise(0)
    val flagged = ranked
      .withColumn("__capped", min(fits).over(upTo) === 1)
    val cut = flagged.groupBy().agg(
      sum(when(col("__capped"), col("capacity")).otherwise(0L))
        .as("__cutCap"),
      sum(when(col("__capped"), 1L).otherwise(0L)).as("__cutN"))
    flagged.crossJoin(broadcast(cut))
      .withColumn("allocated", when(col("__capped"), col("capacity"))
        .otherwise(floor((lit(budget) - col("__cutCap")).cast("double") /
          (col("__n") - col("__cutN")).cast("double")).cast("long")))
      .select(col("stratum"), col("n_tokens"), col("capacity"),
        col("allocated"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("allocated").cast("double") /
            col("n_tokens").cast("double"), roundDecimals)).as("epochs"))
  }

  /** Largest-remainder (Hamilton) QUOTA sampling: apportion a single
    * overall budget `totalK` across strata proportionally to their row
    * counts — `quota_s = ⌊K·n_s/N⌋` plus one extra for the largest
    * remainders until the budget is spent (ties on remainder break by
    * ascending stratum name) — then draw exactly `quota_s` rows per
    * stratum with [[stratifiedExactK]]'s seeded-uniform bounded heap.
    * This is the "sample exactly 10M docs, proportionally by language"
    * operator: rate-based sampling only hits the budget in expectation,
    * and a flat per-stratum k over-samples small strata.
    *
    * Scale: one count aggregate (|strata| rows to the driver — the
    * apportionment is integer metadata arithmetic), then ONE bounded-
    * heap pass at k = max quota and a broadcast quota join that trims
    * each stratum to its own quota. Quotas cap at n_s (a stratum cannot
    * supply more rows than it has; the shortfall is NOT redistributed —
    * documented, callers wanting exact totals at K > N have no valid
    * ask). NULL strata fall under [[NullStratum]].
    * Returns (stratum, quota, rank, idCol, u), rank ≤ quota. */
  def quotaExactK(df: DataFrame, idCol: String, stratumCol: String,
      totalK: Int, seed: Long = 42L): DataFrame = {
    require(totalK > 0, s"totalK must be positive, got $totalK")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(
        coalesce(col(stratumCol).cast("string"), lit(NullStratum))
          .as("stratum"))
      .groupBy(col("stratum")).agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val n = counts.map(_._2).sum
    require(n > 0, "empty input")
    val base = counts.map { case (s, ns) =>
      (s, ns, totalK * ns / n, totalK * ns % n)
    }
    var left = totalK - base.map(_._3).sum
    val bump = scala.collection.mutable.Set[String]()
    for ((s, _, _, _) <- base.sortBy { case (s, _, _, rem) => (-rem, s) }
         if left > 0) {
      bump += s; left -= 1
    }
    val quotas = base.map { case (s, ns, q, _) =>
      (s, math.min(q + (if (bump(s)) 1L else 0L), ns))
    }
    val maxQ = quotas.map(_._2).max.toInt
    val qDf = broadcast(quotas.toDF("stratum", "quota"))
    stratifiedExactK(df, idCol, stratumCol, math.max(maxQ, 1), seed)
      .join(qDf, Seq("stratum"))
      .filter(col("rank") <= col("quota"))
      .select(col("stratum"), col("quota"), col("rank"), col(idCol),
        col("u"))
  }

  /** WEIGHTED exact-k per-stratum sample without replacement — the
    * Efraimidis–Spirakis A-ES scheme ("Weighted random sampling with a
    * reservoir", IPL 2006): each row keys on `ln(u)/w` for the seeded
    * md5 uniform u and weight w, and the k LARGEST keys per stratum are
    * a weighted sample without replacement (equivalent to drawing
    * without replacement with probability ∝ w at every step — the
    * quality-weighted complement of [[stratifiedExactK]]'s uniform
    * draw). Deterministic and engine-replayable: keys are quantized to
    * 6 decimals with the floor(x·1e6 + 0.5)/1e6 chain BEFORE selection
    * (ln is only ulp-reproducible cross-engine — the bm25 ranking
    * convention), ties keep the LOWER id.
    *
    * Planned as the bounded-heap top-k AGGREGATE with map-side partials
    * (never a per-stratum window — the [[stratifiedExactK]] posture):
    * a giant stratum reduces to ≤ partitions·k heap entries before the
    * exchange. Rows with NULL or non-positive weight never sample
    * (weight 0 = excluded, matching [[interleaveByWeight]]). NULL
    * strata fall under the reserved [[NullStratum]] key. `idCol` must
    * be integral. Returns (stratum, rank, idCol, key), rank 1 = largest
    * key. */
  def weightedExactK(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: Column, k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = hashUniform(col(idCol), seed)
    val w = weightCol.cast("double")
    val key = floor((log(u) / w) * 1e6 + lit(0.5)) / 1e6
    df.filter(w.isNotNull && w > 0)
      .select(
        coalesce(col(stratumCol).cast("string"), lit(NullStratum))
          .as("stratum"),
        col(idCol).cast("long").as("__id"), key.as("__key"))
      .groupBy(col("stratum"))
      .agg(graft.functions.TopKExpressions
        .topKByScore(col("__key"), col("__id"), k).as("__top"))
      .select(col("stratum"), posexplode(col("__top")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as(idCol), col("col.cosine").as("key"))
  }

  /** Temperature-scaled mixture rates (the multilingual-sampling scheme of
    * mBERT/XLM-R, p_s ∝ share_s^τ): given per-stratum row counts n_s,
    * target sampled sizes m_s = F·N·(n_s^τ / Σ n_s'^τ) for overall target
    * fraction F, returning keep-rates m_s/n_s capped at 1. τ = 1
    * reproduces proportional sampling (every rate = F); τ < 1 upsamples
    * small strata relative to large ones. Rates capped at 1 deliver
    * fewer than F·N rows — rescale F upward if exact totals matter
    * (documented, not hidden). The per-stratum counts are ONE aggregate
    * over the table; the returned map is |strata|-sized driver metadata,
    * like IVF centroids. NULL strata are keyed under the reserved
    * [[NullStratum]] sentinel — see its caveat about data that contains
    * the literal string. */
  def temperatureRates(df: DataFrame, stratumCol: String,
      temperature: Double, targetFraction: Double): Map[String, Double] = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    // NULL strata are counted under the NullStratum sentinel (the raw
    // r.get(0).toString would NPE, and stratifiedSample's === match
    // could never send rows back to a null key anyway)
    val counts = df
      .groupBy(coalesce(col(stratumCol).cast("string"),
        lit(NullStratum)).as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val powSum = counts.map { case (_, n) =>
      math.pow(n.toDouble, temperature) }.sum
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (s, n) =>
      val m = targetFraction * total *
        math.pow(n.toDouble, temperature) / powSum
      s -> math.min(1.0, m / n.toDouble)
    }.toMap
  }

  /** Two-phase per-stratum `row_number` that never sorts a whole stratum
    * in one task — the bucket-offset pattern of
    * [[Packing.assignShards]] generalized to PER-STRATUM ranks.
    *
    * `Window.partitionBy(stratum)` hash-partitions by the stratum key, so
    * ALL rows of one stratum land in ONE task and sort there — at corpus
    * scale a dominant stratum (e.g. English at half a 100 TB corpus) is
    * a single-task stage. Instead the caller supplies `bucketCol`, any
    * long column ORDER-ALIGNED with `orderCols` inside each stratum
    * (x before y ⇒ bucket(x) ≤ bucket(y), and equal order keys ⇒ equal
    * bucket — e.g. the top bits of the order key). Phase A aggregates
    * per-(stratum, bucket) row counts to the driver (|strata|·|buckets|
    * rows of bounded metadata, the [[tokenBudgetSample]] histogram
    * posture), computes each bucket's exclusive prefix offset within its
    * stratum, and broadcasts the offsets back. Phase B runs the exact
    * `row_number` window PARTITIONED BY (stratum, bucket) — every task
    * sorts ~1/|buckets| of a stratum — and adds the offset.
    *
    * The result is BIT-IDENTICAL to
    * `row_number().over(Window.partitionBy(stratum).orderBy(orderCols))`
    * by the order-alignment contract: all rows of bucket i precede all
    * rows of bucket i+1 in the stratum's total order, so
    * global rank = (# rows in earlier buckets) + rank-in-bucket.
    *
    * Output = input columns + `outCol` (long, 1-based). The stratum
    * column must be non-NULL (coalesce to [[NullStratum]] first — a NULL
    * key would silently drop rows at the offset join). */
  private[graft] def stratumBucketRank(df: DataFrame, stratumCol: String,
      bucketCol: String, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Phase A: (stratum, bucket) histogram -> driver-side exclusive
    // prefix offsets within each stratum (bounded metadata, like the
    // tokenBudgetSample cutoffs and assignShards offsets)
    val counts = df.groupBy(col(stratumCol), col(bucketCol))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offsets: Seq[(String, Long, Long)] = counts
      .groupBy(_._1).toSeq.flatMap { case (s, rows) =>
        var acc = 0L
        rows.sortBy(_._2).map { case (_, b, n) =>
          val o = acc; acc += n; (s, b, o)
        }
      }
    val offsetDf = broadcast(
      offsets.toDF(stratumCol, bucketCol, "__sbr_offset"))
    // Phase B: exact window over (stratum, bucket) — never a full stratum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col(bucketCol))
      .orderBy(orderCols: _*)
    df.join(offsetDf, Seq(stratumCol, bucketCol))
      .withColumn(outCol,
        col("__sbr_offset") + row_number().over(w).cast("long"))
      .drop("__sbr_offset")
  }

  /** Deterministic weighted interleave — the data-MIXING twin of
    * [[deterministicShuffle]]: order the corpus so that sources appear
    * in proportion to their weights throughout training (a weight-2
    * source contributes ~2 rows for every 1 of a weight-1 source, evenly
    * spread, not front-loaded). Each row gets the interleave key
    * `(rank_in_stratum + u) / weight` where `rank_in_stratum` orders the
    * stratum by the seeded md5 uniform (a deterministic within-source
    * shuffle) and `u` is that uniform (a deterministic fractional jitter
    * breaking cross-source phase lock); ascending key order IS the
    * training order, exactly as q_train_order's contract.
    *
    * Scale: `rank_in_stratum` is the [[stratumBucketRank]] two-phase
    * plan — bucket = the top bits of the uniform (order-aligned with
    * `u DESC`: higher u ⇒ lower bucket, equal u ⇒ equal bucket), so no
    * stratum ever sorts in a single task even when one source is half
    * the corpus. Bit-identical to the naive per-stratum window (the
    * uniform order is unchanged — a spec property). Strata missing from
    * `weights` use `defaultWeight`; weight 0 drops the stratum. NULL
    * strata fall under the reserved [[NullStratum]] key. */
  def interleaveByWeight(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      seed: Long = 42L, nBuckets: Int = 1024): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "weights must be non-negative")
    require(nBuckets > 0, "nBuckets must be positive")
    val wExpr = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col("__stratum") === k, lit(v))
        .otherwise(acc)
    }
    val keyed = df.withColumn("__stratum",
        coalesce(col(stratumCol).cast("string"), lit(NullStratum)))
      .withColumn("__u", hashUniform(col(idCol), seed))
      .withColumn("__w", wExpr)
      .filter(col("__w") > 0)
      // descending-order-aligned bucket: u ∈ [0,1) ⇒ floor(u·B) ∈ [0,B),
      // reversed so bucket 0 holds the HIGHEST uniforms (the rank order)
      .withColumn("__b",
        (lit(nBuckets - 1) - floor(col("__u") * nBuckets)).cast("long"))
    stratumBucketRank(keyed, "__stratum", "__b",
        Seq(col("__u").desc, col(idCol)), "__rank")
      .withColumn("__interleave_key",
        ((col("__rank").cast("double") - 1) + col("__u")) / col("__w"))
      .drop("__stratum", "__w", "__b", "__rank")
  }

  /** Deterministic train/validation/test assignment: each row lands in
    * the split whose cumulative-fraction interval contains its seeded
    * md5 uniform — map-only, zero exchange, layout- and engine-stable
    * (the same id always lands in the same split, across runs AND across
    * incremental ingests — the property random splits lose). Fractions
    * must sum to ≤ 1; any remainder falls into the LAST split, so pass
    * fractions for all splits (e.g. 0.8/0.1/0.1). */
  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 42L,
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0), "split fractions must be >= 0")
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val u = hashUniform(col(idCol), seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // u < cum(i) picks the first interval containing u; the last split
    // absorbs u >= last bound (incl. any unassigned remainder)
    val expr = splits.init.zip(cum.init).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), bound)) =>
        when(u < lit(bound), lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }

  /** LEAKAGE-SAFE train/val/test assignment: split by DEDUP COMPONENT,
    * not by document — near-duplicate pairs straddling a random split
    * leak training content into evaluation (the classic benchmark-
    * inflation failure), so every document in one duplicate component
    * must land in the same split. `edges` is any detector's (id_a,
    * id_b) pair set (exact, MinHash, SemDeDup, or their
    * [[graft.dedup.Dedup.multiSignalDedup]] union); components come
    * from the exact CC fixpoint, isolated docs are their own singleton
    * component, and the split decision keys the seeded md5 uniform on
    * the COMPONENT REPRESENTATIVE (min id) — the [[assignSplits]]
    * interval walk otherwise unchanged.
    *
    * Scale: CC is the alternating large/small-star plan (edge-set
    * sized); the corpus pays one left join against the component map
    * and a map-only uniform — no window, no skew point. Returns
    * (idCol, component, split). */
  def leakSafeSplits(df: DataFrame, edges: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    val comp = graft.dedup.Dedup.connectedComponents(edges)
      .select(col("id").as(idCol), col("component"))
    val withComp = df.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
    assignSplits(withComp, "component", splits, seed)
      .select(col(idCol), col("component"), col("split"))
  }

  /** TOKEN-budget corpus construction: per stratum, keep documents in
    * seeded md5-uniform order until the cumulative token count reaches
    * `budgetTokens` — mixture recipes are written in tokens, not document
    * counts, and a doc-count sample over sources with different length
    * distributions silently skews the token mixture. Semantics are the
    * window formulation `sum(tokens) OVER (PARTITION BY stratum ORDER BY
    * u, id) <= budget` (integer cumsum — engine-exact); rows keep their
    * uniform, token count and cumulative count for auditability.
    *
    * Scale shape: the naive window drags ENTIRE strata through single
    * tasks, so the plan is histogram-pruned instead. Pass A aggregates
    * per-(stratum, uniform-bucket) token sums — |strata|·`buckets` rows of
    * driver metadata, like IVF centroids — from which the driver derives
    * each stratum's cutoff bucket (the first whose cumulative total
    * crosses the budget). Pass B keeps every row BELOW its stratum's
    * cutoff bucket map-only, and runs the exact cumsum window over the
    * cutoff bucket's rows alone (~1/`buckets` of the stratum, budget's
    * boundary only). Equivalence to the naive window is a spec property:
    * the prefix sum is monotone (tokens ≥ 0), so below-cutoff rows always
    * satisfy the bound and above-cutoff rows never do. */
  def tokenBudgetSample(df: DataFrame, idCol: String, stratumCol: String,
      tokenCol: Column, budgetTokens: Long, seed: Long = 42L,
      buckets: Int = 1024): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be >= 0")
    require(buckets > 0, "buckets must be positive")
    val base = df.select(
      coalesce(col(stratumCol).cast("string"), lit(NullStratum))
        .as("stratum"),
      col(idCol).cast("long").as(idCol),
      hashUniform(col(idCol), seed).as("u"),
      tokenCol.cast("long").as("n_tokens"))
    // u < 1 by construction, so bucket <= buckets - 1
    val bucketed = base.withColumn("__b",
      floor(col("u") * buckets).cast("int"))
    // Pass A: (stratum, bucket) token histogram -> driver-side cutoffs.
    // cutoff(s) = first bucket where the running total crosses the
    // budget; consumed(s) = tokens in the buckets before it.
    val hist = bucketed.groupBy(col("stratum"), col("__b"))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect()
      .groupBy(_.getString(0))
    val cutoffs: Map[String, (Int, Long)] = hist.map { case (s, rows) =>
      val byBucket = rows.map(r => r.getInt(1) -> r.getLong(2))
        .sortBy(_._1)
      var cum = 0L
      var cut = buckets // past the last bucket = whole stratum fits
      var consumed = 0L
      byBucket.foreach { case (b, t) =>
        if (cut == buckets) {
          if (cum + t > budgetTokens) { cut = b; consumed = cum }
          else cum += t
        }
      }
      s -> (cut, consumed)
    }
    val cutCol = cutoffs.foldLeft(lit(buckets)) {
      case (acc, (s, (cut, _))) =>
        when(col("stratum") === lit(s), lit(cut)).otherwise(acc)
    }
    val consumedCol = cutoffs.foldLeft(lit(0L)) {
      case (acc, (s, (_, consumed))) =>
        when(col("stratum") === lit(s), lit(consumed)).otherwise(acc)
    }
    val marked = bucketed.withColumn("__cut", cutCol)
      .withColumn("__consumed", consumedCol)
    // below the cutoff bucket: kept outright, cum = consumed-so-far needs
    // the in-bucket prefix too — recompute the full cum for the OUTPUT
    // column via a window over the KEPT rows only (bounded by the budget,
    // not the stratum; the heavy filtering already happened map-only).
    val boundary = marked.filter(col("__b") === col("__cut"))
      .withColumn("__cum_in",
        sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"))
          .orderBy(col("u"), col(idCol))))
      .filter(col("__consumed") + col("__cum_in") <= budgetTokens)
    val kept = marked.filter(col("__b") < col("__cut"))
      .unionByName(boundary.drop("__cum_in"))
    kept
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"))
          .orderBy(col("u"), col(idCol))))
      .select(col("stratum"), col(idCol), col("u"), col("n_tokens"),
        col("cum_tokens"))
  }

}
