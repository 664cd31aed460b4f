package graft.similarity

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the standard preprocessing
  * step for embedding pipelines (whitening before ANN indexing,
  * 2-D corpus maps, variance-based dimensionality reduction à la
  * OPQ/PCA-rotated product quantization).
  *
  * Architecture (the only shape that survives 100 TB): the CORPUS is
  * touched by exactly two aggregate passes —
  *
  *   1. per-dimension means (d values to the driver),
  *   2. the d×d covariance as ONE exploded-outer-product aggregation:
  *      each row emits its centered outer product as (k, value) pairs and
  *      `groupBy(k).sum` combines them MAP-SIDE, so the exchange carries
  *      ≤ d² rows per partition regardless of corpus size
  *
  * — and one final map-only projection. Eigenvectors are extracted on the
  * DRIVER from the collected d²-entry covariance (model = driver
  * metadata, exactly like IVF centroids or classifier weights) by fixed-
  * iteration POWER ITERATION with deflation: `iters` matvec steps per
  * component, starting from the basis vector of the largest-variance
  * dimension. No linear-algebra dependency, and — because every
  * intermediate (covariance, each normalized iterate, each eigenvalue) is
  * quantized with the floor(x·10ᵈ + 0.5)/10ᵈ idiom — the whole
  * trajectory is deterministic across engines, partitionings and
  * layouts, so the DuckDB oracle replays ALL iterations bit-for-bit
  * (q_pca). The fixed iteration count is part of the operator's
  * definition: the output is "what `iters` quantized power steps
  * produce", which converges to the top eigenvectors for any
  * non-degenerate spectrum.
  *
  * Cost: the covariance pass is O(n·d²) compute (inherent to exact
  * covariance) with an O(partitions·d²) shuffle. For very large d,
  * sample the corpus first (`df.sample`) — the estimator, not the plan,
  * is the knob.
  *
  * Beyond-parity training-data mandate (SURVEY.md §2.9); the reference
  * engine has no embedding layer.
  */
object Pca {

  /** The fitted model: per-dimension means, one row-vector per principal
    * component (unit length, quantized), and the matching eigenvalue
    * estimates (the final pre-normalization matvec norms). */
  final case class PcaModel(means: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double])

  private def quantize(x: Double, p: Double): Double =
    math.floor(x * p + 0.5) / p

  /** Fit the top `nComponents` principal components with `iters` power-
    * iteration steps each. Two corpus aggregates + driver math; see the
    * object doc for the determinism contract. */
  def fit(df: DataFrame, vecCol: String = "embedding",
      nComponents: Int = 2, iters: Int = 8,
      roundDecimals: Int = 6): PcaModel = {
    require(nComponents >= 1, s"nComponents must be >= 1: $nComponents")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val p = math.pow(10, roundDecimals)
    val d = df.select(size(col(vecCol))).head.getInt(0)
    require(nComponents <= d, s"nComponents $nComponents > dim $d")

    // pass 1: quantized per-dimension means
    val muRow = df.select((0 until d).map(j =>
      avg(element_at(col(vecCol), j + 1).cast("double")).as(s"m$j")): _*)
      .head()
    val mu = Array.tabulate(d)(j => quantize(muRow.getDouble(j), p))

    // pass 2: covariance via exploded centered outer products; the two
    // posexplodes evaluate the centered array ONCE per input row (it is
    // materialized by the first projection), and partial aggregation
    // bounds the exchange at d² rows per partition
    val muLit = array(mu.map(lit): _*)
    val centered = df.select(
      zip_with(col(vecCol).cast("array<double>"), muLit,
        (x, m) => x - m).as("__c"))
    val n = df.count().toDouble
    val covRows = centered
      .select(posexplode(col("__c")).as(Seq("i", "xi")), col("__c"))
      .select(col("i"), col("xi"), posexplode(col("__c")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("s"))
      .collect()
    val cov = Array.ofDim[Double](d, d)
    covRows.foreach { r =>
      cov(r.getInt(0))(r.getInt(1)) = quantize(r.getDouble(2) / n, p)
    }

    // driver: power iteration + deflation on the quantized matrix
    val comps = Array.ofDim[Double](nComponents, d)
    val eigs = new Array[Double](nComponents)
    val c = cov.map(_.clone())
    for (k <- 0 until nComponents) {
      // start at the basis vector of the largest remaining diagonal
      // (argmax on QUANTIZED values — engine-exact; ties → lowest index)
      var m = 0
      var best = c(0)(0)
      var i = 1
      while (i < d) { if (c(i)(i) > best) { best = c(i)(i); m = i }; i += 1 }
      var v = Array.tabulate(d)(j => if (j == m) 1.0 else 0.0)
      var lastNorm = 0.0
      for (_ <- 0 until iters) {
        val w = Array.tabulate(d) { row =>
          var s = 0.0; var j = 0
          while (j < d) { s += c(row)(j) * v(j); j += 1 }
          s
        }
        var s2 = 0.0; var j = 0
        while (j < d) { s2 += w(j) * w(j); j += 1 }
        lastNorm = math.sqrt(s2)
        require(lastNorm > 0, s"power iteration collapsed on component $k")
        v = w.map(x => quantize(x / lastNorm, p))
      }
      comps(k) = v
      eigs(k) = quantize(lastNorm, p)
      // deflate: C ← q(C − λ v vᵀ)
      var r = 0
      while (r < d) {
        var cjj = 0
        while (cjj < d) {
          c(r)(cjj) = quantize(c(r)(cjj) - eigs(k) * v(r) * v(cjj), p)
          cjj += 1
        }
        r += 1
      }
    }
    PcaModel(mu, comps, eigs)
  }

  /** Map-only projection of every vector onto the fitted components:
    * (idCol, pc1 … pcN), each the strict left-to-right dot product of the
    * centered vector with the component (the native
    * [[VectorExpressions.dotProduct]] kernel), rounded to
    * `roundDecimals`. */
  def project(df: DataFrame, model: PcaModel, idCol: String = "vec_id",
      vecCol: String = "embedding", roundDecimals: Int = 6): DataFrame = {
    val muLit = array(model.means.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), muLit,
      (x, m) => x - m)
    val projCols = model.components.zipWithIndex.map { case (comp, k) =>
      round(VectorExpressions.dotProduct(centered,
        array(comp.map(lit): _*)), roundDecimals).as(s"pc${k + 1}")
    }
    df.select(col(idCol) +: projCols.toSeq: _*)
  }

  /** WHITENED projection — each component score scaled to unit variance
    * (`z_k = (x−μ)·v_k / sqrt(λ_k)`): the standard embedding
    * preprocessing before cosine ANN or OPQ-style quantization, where
    * a dominant variance direction would otherwise swamp every
    * distance. Same map-only plan as [[project]]; `sqrt(λ)` is DRIVER
    * arithmetic on the model's quantized eigenvalue (one IEEE sqrt —
    * correctly rounded, hence engine-exact), so the whole output
    * replays in the oracle. A degenerate component (λ ≤ 0, possible
    * only on near-zero-variance data) yields NULL rather than an
    * unstable blow-up. */
  def whitenProject(df: DataFrame, model: PcaModel,
      idCol: String = "vec_id", vecCol: String = "embedding",
      roundDecimals: Int = 6): DataFrame = {
    val muLit = array(model.means.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), muLit,
      (x, m) => x - m)
    val cols = model.components.zipWithIndex.map { case (comp, k) =>
      val lam = model.eigenvalues(k)
      val raw = VectorExpressions.dotProduct(centered,
        array(comp.map(lit): _*))
      (if (lam > 0) round(raw / lit(math.sqrt(lam)), roundDecimals)
       else lit(null).cast("double")).as(s"wpc${k + 1}")
    }
    df.select(col(idCol) +: cols.toSeq: _*)
  }

  /** fit + project in one call — the common path for 2-D corpus maps. */
  def fitProject(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", nComponents: Int = 2,
      iters: Int = 8, roundDecimals: Int = 6): DataFrame =
    project(df, fit(df, vecCol, nComponents, iters, roundDecimals),
      idCol, vecCol, roundDecimals)
}
