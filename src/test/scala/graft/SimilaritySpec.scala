package graft

import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search: brute-force correctness, LSH/IVF recall. */
class SimilaritySpec extends SparkSuite {

  lazy val emb: DataFrame = spark.read.parquet(s"$sf0001/embeddings.parquet")
  lazy val queries: DataFrame = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  def topIds(df: DataFrame): Map[Long, Seq[Long]] =
    df.select("query_id", "neighbor_id", "rank").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap

  test("brute-force knn: self is rank 1 with cosine 1") {
    val knn = Similarity.knnBruteForce(emb, queries, k = 5)
    val r1 = knn.filter(col("rank") === 1).collect()
    assert(r1.length === 5)
    r1.foreach { r =>
      assert(r.getLong(0) === r.getLong(1)) // self
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    val perQuery = topIds(knn)
    assert(perQuery.values.forall(_.size == 5))
  }

  test("knn is deterministic across runs") {
    val a = topIds(Similarity.knnBruteForce(emb, queries, k = 5))
    val b = topIds(Similarity.knnBruteForce(
      emb.repartition(7), queries, k = 5))
    assert(a === b)
  }

  test("IVF knn achieves high recall vs brute force") {
    val exact = topIds(Similarity.knnBruteForce(emb, queries, k = 5))
    val centroids = Similarity.trainCentroids(emb, k = 8, dim = 64)
    assert(centroids.length === 8 && centroids.head.length === 64)
    val approx = topIds(Similarity.knnIvf(emb, queries, k = 5, centroids,
      nprobe = 4))
    val recalls = exact.map { case (q, ids) =>
      approx.getOrElse(q, Nil).toSet.intersect(ids.toSet).size / 5.0
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"IVF mean recall $meanRecall")
    // self always lands in the probed (nearest) cell
    approx.foreach { case (q, ids) => assert(ids.head === q) }
  }

  test("on-disk IVF index: partition pruning at the scan, knnIvf parity") {
    val centroids = Similarity.trainCentroids(emb, k = 8, dim = 64)
    val path = java.nio.file.Files.createTempDirectory("ivf_index")
      .resolve("idx").toString
    Similarity.writeIvfIndex(emb, centroids, path)
    // one directory per non-empty cell
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.nonEmpty && cellDirs.length <= 8, cellDirs.toSeq)

    val res = Similarity.knnIvfIndexed(spark, path, queries, k = 5,
      centroids, nprobe = 2)
    // the probe filter must reach the scan as a PARTITION filter — only
    // probed cell directories are read
    val plan = res.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")),
      s"cell filter did not reach PartitionFilters:\n$plan")

    // identical output to the in-memory knnIvf at the same nprobe
    val mem = Similarity.knnIvf(emb, queries, k = 5, centroids, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val idx = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(idx === mem)
  }

  test("LSH knn returns bucket-mates ranked by exact cosine") {
    val res = Similarity.knnLsh(emb, queries, k = 5, dim = 64, nPlanes = 4)
    val perQuery = topIds(res)
    // every query matches its own bucket → at least itself returned
    assert(perQuery.keySet.size === 5)
    perQuery.foreach { case (q, ids) => assert(ids.head === q) }
  }

  test("knn top-k plan has no Window over the pair set") {
    val plan = Similarity.knnBruteForce(emb, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in knn plan:\n$plan")
    assert(plan.contains("top_k_by"))
  }

  test("top-k ties break on ascending neighbor_id (window parity)") {
    import spark.implicits._
    // two corpus vectors identical to the query → identical cosine; the
    // lower id must rank first, as row_number(cosine desc, id asc) would.
    val corpus = Seq(
      (30L, Array(1.0f, 0.0f)), (10L, Array(1.0f, 0.0f)),
      (20L, Array(1.0f, 0.0f)), (40L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("query_id", "embedding")
    val got = Similarity.knnBruteForce(corpus, q, k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(10L, 20L, 30L))
  }

  test("centroid training is unbiased on label-clustered storage") {
    // corpus written sorted by label: limit()-style sampling would see only
    // the first label's cluster and IVF recall on other labels collapses.
    val clustered = emb.orderBy("label").coalesce(1).cache()
    try {
      val centroids = Similarity.trainCentroids(clustered, k = 8, dim = 64)
      val exact = topIds(Similarity.knnBruteForce(clustered, queries, k = 5))
      val approx = topIds(
        Similarity.knnIvf(clustered, queries, k = 5, centroids, nprobe = 4))
      val recalls = exact.map { case (q, ids) =>
        approx.getOrElse(q, Nil).toSet.intersect(ids.toSet).size / 5.0
      }
      val meanRecall = recalls.sum / recalls.size
      assert(meanRecall >= 0.5, s"clustered-storage IVF mean recall $meanRecall")
    } finally clustered.unpersist()
  }

  test("near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.nearDupPairs(emb, 0.3, col("label")).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }
}
