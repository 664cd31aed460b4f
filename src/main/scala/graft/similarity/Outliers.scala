package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space outlier detection: flag the vectors farthest (by cosine
  * distance) from their own group's centroid. The data-cleaning pass that
  * surfaces mislabeled examples, encoder failures, and off-topic documents
  * inside a labeled/clustered corpus — the per-class complement of
  * SemDeDup's "too close" criterion (Abbas et al. 2023 prune both ends of
  * the similarity range for exactly this reason).
  *
  * Scale design (100 TB): the centroid table is ONE groupBy(label) with a
  * per-dimension `avg` — map-side partial sums, |labels|·dim cells of
  * output, the same distributed-mean kernel as
  * [[Similarity.kmeansRefine]]. Centroids broadcast back (a |labels|-row
  * dimension table) and the distance pass is map-only on the native
  * dot-product kernel. The top-k farthest per label use the bounded-heap
  * [[graft.functions.TopKExpressions.TopKByScore]] aggregate — map-side
  * partial heaps, ≤ partitions·k rows shuffled, never a full-label window.
  *
  * Cross-engine determinism: centroids are quantized to `roundDecimals`
  * with the floor(x·10^d + 0.5)/10^d chain (the kmeansRefine convention),
  * distances are computed FROM the quantized centroid and quantized with
  * the same chain before the heap, so selection and ties (lower id wins)
  * replay exactly in the DuckDB oracle.
  */
object Outliers {

  /** Distributed per-label centroids as (label, centroid array<double>),
    * quantized. */
  def labelCentroids(df: DataFrame, dim: Int, labelCol: String = "label",
      vecCol: String = "embedding",
      roundDecimals: Int = 6): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val p = math.pow(10, roundDecimals)
    val avgs = (0 until dim).map(j =>
      (floor(avg(element_at(col(vecCol), j + 1).cast("double")) * p +
        lit(0.5)) / p).as(s"__m$j"))
    df.groupBy(col(labelCol).as("label"))
      .agg(avgs.head, avgs.tail: _*)
      .select(col("label"),
        array((0 until dim).map(j => col(s"__m$j")): _*).as("centroid"))
  }

  /** Top-k outliers per label: (label, id, dist, rank) with
    * dist = round(1 − cosine(vec, centroid)) and rank 1 = farthest.
    * Ties on dist keep the LOWER id (the TopKByScore contract).
    *
    * NULL labels form their own group: the centroid groupBy keeps the
    * NULL group natively, and the centroid join is NULL-SAFE (`<=>`,
    * still a broadcast hash join) — a plain equi-join would silently
    * drop every unlabeled vector, which are exactly the rows an outlier
    * detector should surface. */
  def centroidOutliers(df: DataFrame, dim: Int, k: Int,
      labelCol: String = "label", vecCol: String = "embedding",
      idCol: String = "vec_id", roundDecimals: Int = 6): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p = math.pow(10, roundDecimals)
    val cents = labelCentroids(df, dim, labelCol, vecCol, roundDecimals)
      .withColumnRenamed("label", "__clabel")
    val dist = (floor(
      (lit(1.0) - Similarity.cosine(col(vecCol), col("centroid"))) * p +
        lit(0.5)) / p).as("__dist")
    df.select(col(labelCol).as("label"), col(idCol).cast("long").as("__id"),
        col(vecCol))
      .join(broadcast(cents), col("label") <=> col("__clabel"))
      .drop("__clabel")
      .select(col("label"), col("__id"), dist)
      .groupBy(col("label"))
      .agg(graft.functions.TopKExpressions
        .topKByScore(col("__dist"), col("__id"), k).as("__top"))
      .select(col("label"), posexplode(col("__top")))
      .select(col("label"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as(idCol), col("col.cosine").as("dist"))
  }
}
