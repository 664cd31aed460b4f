package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the measurement half of the retrieval
  * stack ([[Bm25]], [[graft.similarity.Similarity]] knn/ANN produce
  * ranked runs; this grades them). A pipeline that mines training pairs
  * with dense retrieval or gates an index rollout on quality needs
  * nDCG/MRR/recall computed ON the cluster over however many queries the
  * eval set holds — per-query rows, so regressions localize.
  *
  * Beyond-parity training-data mandate (SURVEY.md §2.9); the reference
  * engine has no retrieval layer at all.
  *
  * Inputs are the TREC shapes: a RUN `(query_id, doc_id, rank)` (rank
  * 1-based within query; rows beyond `k` are ignored) and QRELS
  * `(query_id, doc_id, rel)` with graded relevance (`rel > 0` =
  * relevant; `<= 0`/absent = not). Qrels are assumed human-labeled —
  * metadata scale PER QUERY (hundreds, not millions); the per-query
  * grade list is collected under that contract, exactly the bounded-
  * cardinality argument the vocab aggregates make.
  *
  * Scale design: one `(query_id, doc_id)`-keyed left join of the
  * k-bounded run against qrels, then ONE groupBy(query) collecting the
  * ≤k `(rank, rel)` list — every metric folds over that sorted bounded
  * list, so nothing windows over the corpus and queries evaluate
  * embarrassingly parallel. Exactness: the folds run in ascending-rank
  * order on both engines (the ECE sorted-fold idiom), integer counts
  * stay integers, and every float output is one rounded expression —
  * hash-stable cross-engine.
  */
object RankingEval {

  /** Per-query ranking metrics at cutoff `k`:
    *
    *   - `n_rel`   — relevant docs in qrels (any rank, the recall base)
    *   - `hits`    — relevant docs retrieved in the top k
    *   - `precision_k` = hits / k
    *   - `recall_k`    = hits / n_rel (NULL when n_rel = 0)
    *   - `rr`      — reciprocal rank of the first relevant hit (0 if none)
    *   - `ap_k`    — average precision at k, binary relevance
    *                 (Σ_{rel hits} P@rank) / min(n_rel, k); NULL if n_rel=0
    *   - `dcg_k`   — Σ rel / log2(rank + 1) over the top k (graded)
    *   - `idcg_k`  — the ideal DCG from the k best qrels grades
    *   - `ndcg_k`  = dcg / idcg (NULL when idcg = 0)
    *
    * Queries are the run's queries: a query with qrels but no run rows
    * does not appear (the caller's run generator defines the query set).
    * Duplicate (query, doc) qrels rows are the caller's bug — the join
    * would multiply run rows.
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, k: Int,
      queryIdCol: String = "query_id", docIdCol: String = "doc_id",
      rankCol: String = "rank", relCol: String = "rel"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ln2 = log(lit(2.0))
    val r = run.filter(col(rankCol) <= k)
      .select(col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"),
        col(rankCol).cast("int").as("rank"))
    val qr = qrels.filter(col(relCol) > 0)
      .select(col(queryIdCol).as("query_id"), col(docIdCol).as("doc_id"),
        col(relCol).cast("double").as("rel"))
    // k-bounded per-query (rank, rel) list, ascending rank — all run
    // metrics fold over it in this fixed order
    val perQ = r.join(qr, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("rel"), lit(0.0)).as("rel"))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("rel"))))
        .as("__l"))
    // qrels side: recall base + the k best grades (ideal ranking)
    val ideal = qr.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"),
        slice(sort_array(collect_list(col("rel")), asc = false), 1, k)
          .as("__g"))
    val m = perQ.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("__l"),
        coalesce(col("__g"),
          array().cast("array<double>")).as("__g"))
    val l = col("__l")
    val hits = size(filter(l, x => x.getField("rel") > 0)).cast("long")
    val firstRel = array_min(transform(
      filter(l, x => x.getField("rel") > 0), x => x.getField("rank")))
    val dcg = aggregate(l, lit(0.0), (a, x) =>
      a + x.getField("rel") /
        (log(x.getField("rank").cast("double") + 1.0) / ln2))
    // positional fold for the ideal DCG: element i (0-based) discounts
    // by log2(i + 2)
    val idcg = aggregate(col("__g"),
      struct(lit(0).as("i"), lit(0.0).as("s")),
      (acc, x) => struct((acc.getField("i") + 1).as("i"),
        (acc.getField("s") + x /
          (log(acc.getField("i").cast("double") + 2.0) / ln2)).as("s")),
      acc => acc.getField("s"))
    // AP@k, binary relevance: for each relevant hit, precision at its
    // rank = |relevant with rank ≤ r| / r — O(k²) on the bounded list
    val apSum = aggregate(l, lit(0.0), (a, x) =>
      a + when(x.getField("rel") > 0,
        size(filter(l, y => y.getField("rel") > 0 &&
          y.getField("rank") <= x.getField("rank"))).cast("double") /
          x.getField("rank")).otherwise(lit(0.0)))
    m.select(col("query_id"), col("n_rel"), hits.as("hits"),
      round(hits.cast("double") / k, 6).as("precision_k"),
      when(col("n_rel") > 0,
        round(hits.cast("double") / col("n_rel"), 6)).as("recall_k"),
      round(coalesce(lit(1.0) / firstRel.cast("double"), lit(0.0)), 6)
        .as("rr"),
      when(col("n_rel") > 0,
        round(apSum / least(col("n_rel"), lit(k.toLong)).cast("double"),
          6)).as("ap_k"),
      round(dcg, 6).as("dcg_k"),
      round(idcg, 6).as("idcg_k"),
      when(idcg > 0, round(dcg / idcg, 6)).as("ndcg_k"))
  }

  /** ANN index quality: per-query recall@k of an APPROXIMATE run against
    * the EXACT ground-truth run — the acceptance metric of every ANN
    * rollout (an IVF/LSH/PQ index is "good" when recall@k ≥ target at
    * the achieved speedup). Both inputs are knn outputs
    * `(query_id, neighbor_id, rank)`; rows beyond `k` are ignored.
    * Output: `(query_id, n_exact, n_approx, n_overlap, recall)` with
    * `recall = n_overlap / n_exact` — the query universe is the exact
    * side (ground truth defines what should have been found; an
    * approximate run may legitimately return < k rows, e.g. an LSH
    * bucket miss).
    *
    * Scale: two k-bounded per-query counts plus one
    * `(query_id, neighbor_id)`-keyed join — ≤ k rows per query on every
    * side, no windows, queries independent. */
  def annRecallAtK(exact: DataFrame, approx: DataFrame, k: Int,
      queryIdCol: String = "query_id", neighborIdCol: String = "neighbor_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def topk(df: DataFrame) = df.filter(col(rankCol) <= k)
      .select(col(queryIdCol).as("query_id"),
        col(neighborIdCol).as("neighbor_id"))
    val ex = topk(exact)
    val ap = topk(approx)
    val nEx = ex.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"))
    val nAp = ap.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_approx"))
    val nOv = ex.join(ap, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_overlap"))
    nEx.join(nAp, Seq("query_id"), "left")
      .join(nOv, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_exact"), 6).as("recall"))
  }
}
