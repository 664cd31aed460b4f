package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
  * LASER/CCMatrix/NLLB recipe that built the largest public parallel
  * corpora): score a candidate pair (x, y) not by raw cosine but by the
  * RATIO margin
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
  *
  * where `avgNN_k` is the mean cosine to the k nearest neighbors in the
  * OTHER side. Dividing by the local density cancels hubness — a vector
  * that is "close to everything" stops winning every match — which is
  * why margin mining finds translation pairs plain cosine thresholds
  * drown in noise. Pairs are kept when x's best margin passes
  * `threshold`, and flagged `mutual` when x and y pick each other (the
  * max-margin mutual criterion — the highest-precision setting).
  *
  * Scale design: two knn passes — [[marginPairs]] uses
  * [[Similarity.knnBruteForce]] (the exact oracle baseline, for
  * driver-sized sides), [[marginPairsAnn]] uses cell-blocked candidates
  * (the 100 TB path: shuffle join on the IVF cell id, nothing
  * corpus-sized broadcast); both feed [[marginPairsFrom]] — then two
  * per-query mean aggregates, keyed joins and ONE
  * argmax aggregate per side — no windows, no all-pairs materialization
  * beyond the k-bounded candidate lists. Determinism: margins are
  * quantized to 1e-6 with the floor(x·10⁶ + 0.5)/10⁶ chain BEFORE the
  * argmax (the weightedExactK convention — raw float sums are only
  * ulp-reproducible), ties keep the LOWER counterpart id.
  */
object BitextMining {

  /** Mine max-margin pairs from `x` into `y` (both `(idCol, vecCol)`
    * tables). Returns one row per x whose best margin ≥ `threshold`:
    * `(x_id, y_id, cosine, margin, mutual)` — cosine rounded to 6,
    * margin on the 1e-6 grid, `mutual` true when y's best margin
    * partner is x. */
  def marginPairs(x: DataFrame, y: DataFrame, k: Int = 4,
      threshold: Double = 1.0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val xq = x.select(col(idCol).as("query_id"), col(vecCol))
    val yq = y.select(col(idCol).as("query_id"), col(vecCol))
    val fwd = Similarity.knnBruteForce(y, xq, k, idCol, vecCol)
      .select(col("query_id").as("x_id"),
        col("neighbor_id").as("y_id"), col("cosine"))
    val bwd = Similarity.knnBruteForce(x, yq, k, idCol, vecCol)
      .select(col("query_id").as("y_id"),
        col("neighbor_id").as("x_id"), col("cosine"))
    marginPairsFrom(fwd, bwd, threshold)
  }

  /** [[marginPairs]] through IVF cell blocking — the shape that survives
    * corpus-sized sides (CCMatrix mined BILLIONS of sentences per side;
    * the exact path's broadcast-the-queries kNN is an executor OOM plus
    * an O(|x|·|y|) sweep there). Candidates come from
    * [[Similarity.cellCandidates]] — each side is assigned to the shared
    * codebook's cells once, the other side probes its `nprobe` nearest
    * cells, and the candidate join is SHUFFLE-keyed on the cell id, so
    * nothing corpus-sized is broadcast (measured by `graft.ScaleProbe
    * triplets`: the exact path's per-query work grows with the corpus,
    * this path's stays cell-bounded). Neighborhoods beyond the probed
    * cells are missed — the ANN recall trade, pinned vs the exact
    * baseline in SimilaritySpec. Margin arithmetic, quantization and
    * tie-breaks are IDENTICAL to the exact path (shared
    * [[marginPairsFrom]]); note avgNN_k averages over the ≤ k
    * candidates actually found, the natural ANN-margin semantics. */
  def marginPairsAnn(x: DataFrame, y: DataFrame,
      centroids: Array[Array[Double]], k: Int = 4,
      threshold: Double = 1.0, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fwd = Similarity.topKPerQuery(
        Similarity.cellCandidates(y, x, centroids, nprobe, idCol, vecCol,
          idCol, excludeSelf = false, roundDecimals = -1), k)
      .select(col("query_id").as("x_id"),
        col("neighbor_id").as("y_id"), col("cosine"))
    val bwd = Similarity.topKPerQuery(
        Similarity.cellCandidates(x, y, centroids, nprobe, idCol, vecCol,
          idCol, excludeSelf = false, roundDecimals = -1), k)
      .select(col("query_id").as("y_id"),
        col("neighbor_id").as("x_id"), col("cosine"))
    marginPairsFrom(fwd, bwd, threshold)
  }

  /** Margin scoring over explicit k-bounded candidate lists — the core
    * shared by the exact and ANN entry points. `fwd` is (x_id, y_id,
    * cosine) with ≤ k rows per x; `bwd` is (y_id, x_id, cosine) with
    * ≤ k rows per y. Margins are quantized to the 1e-6 grid BEFORE the
    * per-side argmax (ties keep the lower counterpart id), exactly the
    * header's determinism contract. */
  def marginPairsFrom(fwd: DataFrame, bwd: DataFrame,
      threshold: Double): DataFrame = {
    val avgX = fwd.groupBy(col("x_id"))
      .agg((sum(col("cosine")) / count(lit(1))).as("__ax"))
    val avgY = bwd.groupBy(col("y_id"))
      .agg((sum(col("cosine")) / count(lit(1))).as("__ay"))
    def withMargin(cand: DataFrame): DataFrame = cand
      .join(avgX, Seq("x_id")).join(avgY, Seq("y_id"))
      .withColumn("__m", floor(col("cosine") /
        ((col("__ax") + col("__ay")) / lit(2.0)) * 1e6 + lit(0.5)) / 1e6)
    // best partner per side: max (margin, lower-id tiebreak) argmax
    val bestX = withMargin(fwd)
      .groupBy(col("x_id"))
      .agg(max(struct(col("__m"), (-col("y_id")).as("__ny"),
        col("cosine"))).as("__b"))
      .select(col("x_id"), (-col("__b.__ny")).as("y_id"),
        col("__b.__m").as("margin"), col("__b.cosine").as("cosine"))
    val bestY = withMargin(bwd)
      .groupBy(col("y_id"))
      .agg(max(struct(col("__m"), (-col("x_id")).as("__nx"))).as("__b"))
      .select(col("y_id"), (-col("__b.__nx")).as("__bx"))
    bestX.join(bestY, Seq("y_id"), "left")
      .filter(col("margin") >= threshold)
      .select(col("x_id"), col("y_id"), round(col("cosine"), 6)
        .as("cosine"), col("margin"),
        (col("__bx").isNotNull && col("__bx") === col("x_id"))
          .as("mutual"))
  }
}
