package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: corpus-wide pointwise mutual information over
  * adjacent token pairs — the classic distributional-statistics pass a
  * training-data pipeline runs to find multi-word expressions ("new york",
  * "machine learning") worth protecting from tokenizer splits, and to
  * sanity-check a crawl snapshot (boilerplate n-grams surface instantly as
  * top-PMI pairs).
  *
  * PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with P(a,b) from the
  * adjacent-bigram event space (c_ab / N_bigrams) and P(a), P(b) from the
  * unigram space (c_a / N_unigrams) — the standard Church & Hanks (1990)
  * estimator. Rare pairs dominate raw PMI, so `minCount` gates the pair
  * table BEFORE the joins, exactly the published practice.
  *
  * Scale design (100 TB): two exact count aggregates (bigram, unigram) with
  * map-side partials are the only passes over the corpus; everything after
  * operates on the vocabulary-bounded count tables. The unigram table joins
  * the (minCount-filtered) bigram table twice on term — AQE broadcasts it
  * when it fits, shuffles vocab-sized (not corpus-sized) rows otherwise.
  * Top-k is a TakeOrderedAndProject: the full pair table is never sorted.
  *
  * Cross-engine determinism: counts are exact longs; the PMI expression is
  * ONE shared IEEE shape (`ln((c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)))`),
  * and ranking uses the 6-decimal-rounded score with (a, b) ascending as
  * the tiebreak — the same convention as q_bm25.
  */
object Collocations {

  /** Top-k adjacent-token collocations by PMI.
    * Output: (a, b, c_ab, c_a, c_b, pmi, rank), rank 1 = highest PMI. */
  def pmiTopK(docs: DataFrame, k: Int, minCount: Long = 5L,
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val toks = TextAnalysis.tokens(col(textCol))
    // both count tables are vocab-bounded and read multiple times (uni
    // twice via the two joins, each once more for the totals) — an eager
    // localCheckpoint barrier makes each corpus scan happen ONCE (the
    // DSIR model-table idiom) instead of replaying the explode per branch
    val bi = docs.select(explode(UnigramLm.bigrams(toks)).as("bg"))
      .groupBy(col("bg.a").as("a"), col("bg.b").as("b"))
      .agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val uni = docs.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("tc"))
      .localCheckpoint(true)
    val stats = broadcast(
      bi.agg(sum(col("c_ab")).as("n_bi"))
        .crossJoin(uni.agg(sum(col("tc")).as("n_uni"))))
    val scored = bi.filter(col("c_ab") >= minCount)
      .join(uni.select(col("term").as("a"), col("tc").as("c_a")), Seq("a"))
      .join(uni.select(col("term").as("b"), col("tc").as("c_b")), Seq("b"))
      .crossJoin(stats)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        round(log(
          (col("c_ab").cast("double") / col("n_bi")) /
            ((col("c_a").cast("double") / col("n_uni")) *
              (col("c_b").cast("double") / col("n_uni")))), 6).as("pmi"))
    scored.orderBy(col("pmi").desc, col("a"), col("b")).limit(k)
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow
          .ordered(col("pmi").desc, col("a"), col("b"))).cast("int"))
  }
}
