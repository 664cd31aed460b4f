package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Linkage}
import graft.functions.StringSimilarityExpressions.{jaroWinkler, jaroWinklerImpl}

/** Jaro-Winkler kernel + blocked fuzzy linkage + soft-dedup weights. */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  test("jaroWinklerImpl matches the classic published values") {
    // canonical Winkler test vectors (also DuckDB's outputs, probed)
    assert(math.abs(jaroWinklerImpl("martha", "marhta") -
      0.9611111111111111) < 1e-15)
    assert(math.abs(jaroWinklerImpl("dwayne", "duane") -
      0.8400000000000001) < 1e-15)
    assert(math.abs(jaroWinklerImpl("dixon", "dicksonx") -
      0.8133333333333332) < 1e-15)
    assert(jaroWinklerImpl("abcdef", "abcdef") === 1.0)
    assert(jaroWinklerImpl("", "") === 0.0) // DuckDB convention
    assert(jaroWinklerImpl("a", "") === 0.0)
    assert(jaroWinklerImpl("abcd", "dcba") === 0.5)
  }

  test("jaroWinklerImpl: 0.7 boost threshold and floor'd transpositions") {
    // jaro 0.5619 < 0.7 → NO prefix bonus despite 4-char common prefix
    assert(math.abs(jaroWinklerImpl("abcdxxxxxx", "abcdyyyyyyyyyy") -
      0.5619047619047619) < 1e-15)
    // 3-cycle → 3 mismatched positions → t = floor(3/2) = 1 (DuckDB-probed)
    assert(math.abs(jaroWinklerImpl("xyzQQQQ", "yzxQQQQ") -
      0.9523809523809524) < 1e-15)
  }

  test("jaroWinkler column is null-safe and symmetric") {
    val got = Seq(("martha", "marhta"), (null, "x"), ("frog", "fog"))
      .toDF("a", "b")
      .select(round(jaroWinkler(col("a"), col("b")), 6).as("jw"),
        round(jaroWinkler(col("b"), col("a")), 6).as("wj"))
      .collect()
    assert(got(0).getDouble(0) === 0.961111)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(got(2).getDouble(0) === got(2).getDouble(1))
  }

  test("fuzzyLinkPairs links corrupted variants inside blocks only") {
    val rows = Seq(
      (1L, "Amelia Watson"), (2L, "amleia watson"), // swap -> links to 1
      (3L, "arthur clarke"), // same block letter, different name
      (4L, "zoe quinn"), (5L, "zoe quinn")) // exact pair, own block
      .toDF("id", "name")
    val pairs = Linkage.fuzzyLinkPairs(rows, "name", "id", 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((4L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fuzzyLinkPairs: maxBlockSize drops degenerate blocks") {
    val big = (1L to 50L).map(i => (i, "same name")).toDF("id", "name")
    assert(Linkage.fuzzyLinkPairs(big, "name", "id", 0.9,
      maxBlockSize = 10).count() === 0L)
    assert(Linkage.fuzzyLinkPairs(big, "name", "id", 0.9,
      maxBlockSize = 100).count() === 50L * 49 / 2)
  }

  test("softDedupWeights: weight = n^-alpha, all rows survive") {
    val docs = Seq((1L, "aaa"), (2L, "aaa"), (3L, "aaa"), (4L, "bbb"))
      .toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs, "text", "doc_id", alpha = 1.0)
      .select("doc_id", "n_dups", "weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(w.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(w.take(3).forall(r => r._2 === 3L && r._3 === 0.333333))
    assert(w(3) === ((4L, 1L, 1.0)))
    // alpha = 0 recovers uniform weights
    val u = Dedup.softDedupWeights(docs, "text", "doc_id", alpha = 0.0)
      .select("weight").as[Double].collect()
    assert(u.forall(_ === 1.0))
  }
}
