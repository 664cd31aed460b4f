package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — PageRank over a directed
  * edge set. Web-scale training pipelines weight sources by crawl-graph
  * centrality (host-level ranks are a standard quality prior for
  * Common-Crawl-derived corpora: heavily-linked hosts are rarely spam),
  * and the same operator ranks citation/reference graphs extracted from
  * the corpus itself.
  *
  * Standard damped iteration with dangling-mass redistribution:
  *
  *   r'(v) = (1−d)/N + d · ( Σ_{u→v} r(u)/outdeg(u) + D/N )
  *
  * where D is the total rank of dangling nodes (no out-edges). Fixed
  * `iters` rounds; every iterate AND the dangling scalar are quantized
  * with the floor(x·10ᵈ + 0.5)/10ᵈ idiom, so — like the k-means,
  * classifier and PCA trajectories — the whole computation is
  * deterministic across engines, partitionings and layouts, and the
  * q_pagerank oracle replays all rounds in generated SQL.
  *
  * Scale design (100 TB graph): per round exactly (a) one join of the
  * edge table against the N-row rank table on src (AQE-planned), (b)
  * one groupBy(dst) sum with map-side partials, (c) one scalar dangling
  * aggregate to the driver, (d) one left join building the next rank
  * table — all edge-/node-linear, no windows, no collects beyond the
  * one scalar. Lineage truncates per round with an eager
  * localCheckpoint (the CC pattern). Rank mass is NOT renormalized —
  * quantization drift stays below 10^-d·N per round by construction. */
object GraphRank {

  /** The prepared graph every trajectory starts from: deduped
    * self-loop-free edges, the node table, and out-degrees — each
    * behind an eager localCheckpoint (they are read every round by
    * every consumer). Built ONCE per public call; [[spamMass]] threads
    * one prep through BOTH its PageRank and TrustRank trajectories
    * instead of paying the three checkpoints twice. */
  private final case class PreppedGraph(e: DataFrame, nodes: DataFrame,
      outdeg: DataFrame)

  private def prepGraph(edges: DataFrame, srcCol: String,
      dstCol: String): PreppedGraph = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    PreppedGraph(e, nodes, outdeg)
  }

  def pageRank(edges: DataFrame, iters: Int = 8, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      roundDecimals: Int = 9): DataFrame =
    pageRankPrepped(prepGraph(edges, srcCol, dstCol), iters, damping,
      roundDecimals)

  private def pageRankPrepped(g: PreppedGraph, iters: Int,
      damping: Double, roundDecimals: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    val p = math.pow(10, roundDecimals)
    def q(c: org.apache.spark.sql.Column) =
      floor(c * p + lit(0.5)) / p
    val e = g.e
    val nodes = g.nodes
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outdeg = g.outdeg
    val base = (1.0 - damping) / n
    var rank = nodes.select(col("id"),
      q(lit(1.0) / n).as("rank")).localCheckpoint(true)
    for (_ <- 0 until iters) {
      // dangling mass stays IN-PLAN as a one-row cross-joined aggregate
      // (same floor-quantization chain the former driver round-trip
      // applied — floor/divide on doubles is the identical IEEE op
      // sequence either side, so the trajectory is bit-unchanged): the
      // whole round is then ONE job — the r12 shape paid a full
      // scalar-collect job per round just to re-broadcast the number
      val dang = rank.join(outdeg, Seq("id"), "left")
        .filter(col("outdeg").isNull)
        .agg((floor(coalesce(sum(col("rank")), lit(0.0)) * p + lit(0.5)) / p)
          .as("__dang"))
      val contrib = e
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          (col("rank") / col("outdeg")).as("__c"))
        .groupBy(col("id"))
        .agg(sum(col("__c")).as("__in"))
      rank = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(dang)
        .select(col("id"),
          q(lit(base) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dang") / lit(n.toDouble)))
            .as("rank"))
        .localCheckpoint(true)
    }
    rank
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — biased
    * PageRank whose teleport goes to a CURATED TRUSTED SEED set instead
    * of uniformly everywhere: trust flows out from known-good hosts
    * along links, so pages unreachable from any trusted host score ~0
    * no matter how many spam farms link them — the complement to raw
    * [[pageRank]] (which spam link-farms can inflate). The classic
    * combination is spam mass: compare a page's PageRank against its
    * TrustRank — high PR with low trust = link spam.
    *
    *   t'(v) = (1−d)·s(v) + d·( Σ_{u→v} t(u)/outdeg(u) + D·s(v) )
    *
    * with s = 1/|seeds| on the seed set (0 elsewhere), D the dangling
    * trust mass (teleports back to seeds), t₀ = s. Same quantized-
    * trajectory contract as [[pageRank]] — every iterate and the
    * dangling scalar on the floor(x·10ᵈ + 0.5) grid, so the q_trust_rank
    * oracle replays all rounds. Seeds are a driver-side list BY
    * DEFINITION (trust seeds are human-curated — dozens to thousands).
    * Shares [[prepGraph]] with [[pageRank]], so [[spamMass]] preps the
    * graph exactly once for both trajectories.
    *
    * Scale design identical to [[pageRank]]: per round one edge join,
    * one dst-keyed sum, one scalar collect, localCheckpoint lineage
    * cuts; node-/edge-linear. */
  def trustRank(edges: DataFrame, seeds: Seq[Long], iters: Int = 8,
      damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", roundDecimals: Int = 9): DataFrame =
    trustRankPrepped(prepGraph(edges, srcCol, dstCol), seeds, iters,
      damping, roundDecimals)

  private def trustRankPrepped(g: PreppedGraph, seeds: Seq[Long],
      iters: Int, damping: Double, roundDecimals: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    require(seeds.nonEmpty, "trust seeds must be non-empty")
    require(seeds.distinct.size == seeds.size, "duplicate trust seeds")
    val p = math.pow(10, roundDecimals)
    def q(c: org.apache.spark.sql.Column) = floor(c * p + lit(0.5)) / p
    val e = g.e
    val nodes = g.nodes
    val outdeg = g.outdeg
    val sInv = 1.0 / seeds.size
    val sv = when(col("id").isin(seeds.map(Long.box): _*), lit(sInv))
      .otherwise(lit(0.0))
    var trust = nodes.select(col("id"), q(sv).as("trust"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      // in-plan dangling scalar (the pageRankPrepped fusion): identical
      // floor-quantization chain, one job per round instead of two
      val dang = trust.join(outdeg, Seq("id"), "left")
        .filter(col("outdeg").isNull)
        .agg((floor(coalesce(sum(col("trust")), lit(0.0)) * p + lit(0.5)) / p)
          .as("__dang"))
      val contrib = e
        .join(trust.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          (col("trust") / col("outdeg")).as("__c"))
        .groupBy(col("id"))
        .agg(sum(col("__c")).as("__in"))
      trust = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(dang)
        .select(col("id"),
          q(lit(1.0 - damping) * sv + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dang") * sv))
            .as("trust"))
        .localCheckpoint(true)
    }
    trust
  }

  /** Spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen 2006, "Link
    * Spam Detection Based on Mass Estimation"): the fraction of a
    * page's PageRank NOT backed by trusted sources —
    * `sm = max(0, PR − TR) / PR` — the operational combination of
    * [[pageRank]] and [[trustRank]]: link farms inflate PR but cannot
    * manufacture trust, so high-PR/low-trust pages surface with spam
    * mass near 1. Both trajectories run with the shared quantization
    * contract OVER ONE SHARED [[prepGraph]] — the edge dedup, node
    * table and out-degree checkpoints are built once and threaded
    * through both fixpoints (they are pure functions of the edge set,
    * so the trajectories, and hence the hashes, are unchanged vs
    * independent calls); the final ratio is one IEEE division of two
    * on-grid values, rounded 6 (oracle-replayed end to end in
    * q_spam_mass). Returns (id, rank, trust, spam_mass). */
  def spamMass(edges: DataFrame, seeds: Seq[Long], iters: Int = 8,
      damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", roundDecimals: Int = 9): DataFrame = {
    val g = prepGraph(edges, srcCol, dstCol)
    // The two trajectories are independent given the shared prep (pure
    // functions of the edge set), and each one is a chain of small
    // sequential per-round jobs — run them from two driver threads so
    // one trajectory's stages back-fill the scheduler gaps of the other
    // (optimization guide §2.6, "overlap independent jobs"). Results
    // are the identical per-trajectory quantized fixpoints.
    // DAEMON threads + shutdownNow (ADVICE r13): a hung trajectory must
    // not pin the JVM open via non-daemon pool threads, and the finally
    // must interrupt, not just stop accepting work. Await stays
    // unbounded on purpose — a 100 TB trajectory has no meaningful
    // static timeout, and the threads can no longer leak.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
      r => { val t = new Thread(r, "graft-spamMass")
        t.setDaemon(true); t })
    val (pr, tr) = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val prF = scala.concurrent.Future(
        pageRankPrepped(g, iters, damping, roundDecimals))
      val trF = scala.concurrent.Future(
        trustRankPrepped(g, seeds, iters, damping, roundDecimals))
      val d = scala.concurrent.duration.Duration.Inf
      (scala.concurrent.Await.result(prF, d),
        scala.concurrent.Await.result(trF, d))
    } finally pool.shutdownNow()
    // floor(x·10⁶ + 0.5) instead of round(): the ratio of two on-grid
    // values frequently LANDS on .5 boundaries at 1e-6, where the two
    // engines' round() implementations differ by an ulp — the floor
    // chain is the same IEEE ops on both sides, boundary included
    pr.join(tr, Seq("id"))
      .select(col("id"), col("rank"), col("trust"),
        (floor(greatest(lit(0.0), col("rank") - col("trust")) /
          col("rank") * lit(1e6) + lit(0.5)) / lit(1e6)).as("spam_mass"))
  }

  /** [[pageRank]] over STRING-keyed edges — the operational host-graph
    * shape: crawl pipelines rank REGISTERED DOMAINS (the CommonCrawl
    * host-rank quality prior), and domains are strings, not ids. Keys
    * are hashed to signed-64 ids with the md5 kernel (map-only,
    * engine-exact — the q_host_rank oracle replays it; collision odds
    * ~n²/2⁶⁵, negligible below ~10⁹ distinct keys), ranked by
    * [[pageRank]], and the |nodes|-row rank table joins back to the
    * distinct keys. Returns (key, rank).
    *
    * Compose with [[graft.text.UrlOps.registeredDomain]] /
    * [[graft.text.UrlOps.host]] for the end-to-end crawl prior:
    * `pageRankByKey(links.select(regDomain(src_url), regDomain(dst_url)))`. */
  def pageRankByKey(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iters: Int = 8, damping: Double = 0.85,
      roundDecimals: Int = 9): DataFrame =
    pageRankByKeyHashed(edges, srcCol, dstCol, iters, damping,
      c => graft.functions.HashExpressions.md5Long(c))

  /** [[pageRankByKey]] with an injectable key-hash — the test seam the
    * collision guard is pinned through (a spec forces two keys onto
    * one id and expects the loud failure instead of silently merged
    * ranks). */
  private[graft] def pageRankByKeyHashed(edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int, damping: Double,
      h: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    // barrier: the string edge list feeds the hashed edge set AND both
    // key projections — without it an expensive upstream (e.g. the
    // q_host_rank_html extractLinks chain over raw HTML) would be
    // re-scanned three times
    val ek = edges.select(col(srcCol).cast("string").as("sk"),
        col(dstCol).cast("string").as("dk"))
      .localCheckpoint(true)
    val e = ek.select(h(col("sk")).as("src"), h(col("dk")).as("dst"))
    // barrier: the guard aggregate AND the rank join both read keys —
    // checkpoint so the distinct runs once
    val keys = ek.select(col("sk").as("key"))
      .union(ek.select(col("dk").as("key")))
      .distinct()
      .select(col("key"), h(col("key")).as("id"))
      .localCheckpoint(true)
    // collision guard: hash collision odds are ~n²/2⁶⁵ (negligible
    // below ~10⁹ distinct keys) but a SILENT collision would merge two
    // keys' ranks — one cheap aggregate on the |keys| table the op
    // already materializes converts the tail risk into a loud failure
    val g = keys.agg(count(lit(1)).as("nk"),
      countDistinct(col("id")).as("ni")).head()
    require(g.getLong(0) == g.getLong(1),
      s"pageRankByKey: key-hash collision — ${g.getLong(0)} distinct " +
        s"keys map to ${g.getLong(1)} distinct ids; rank would " +
        "silently merge the colliding keys")
    pageRank(e, iters, damping).join(keys, Seq("id"))
      .select(col("key"), col("rank"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the second classic
    * link-graph prior: an AUTHORITY is a page many good hubs point to,
    * a HUB points to many good authorities. For corpus curation the
    * authority score complements [[pageRank]]: link-directory/spam-farm
    * pages rank high as hubs but low as authorities, which a single
    * PageRank score cannot separate.
    *
    * Standard mutual-reinforcement iteration, L2-normalized each half
    * step: `a ∝ Eᵀh`, `h ∝ E a`, fixed `iters` rounds from the uniform
    * start. Determinism contract as [[pageRank]]: every per-node sum,
    * both norm scalars and both normalized iterates are quantized with
    * the floor(x·10ᵈ + 0.5)/10ᵈ idiom, so the whole trajectory is
    * engine-/partitioning-/layout-exact and the q_hits oracle replays
    * all rounds in generated SQL.
    *
    * Scale design: per round two edge-table joins (src then dst), two
    * map-side-partial groupBy sums, two SCALAR norm aggregates to the
    * driver — node-/edge-linear, no windows, localCheckpoint per half
    * step (the PageRank barrier pattern). Nodes with no in-edges
    * (resp. out-edges) score authority 0 (resp. hub 0). */
  def hits(edges: DataFrame, iters: Int = 8,
      srcCol: String = "src", dstCol: String = "dst",
      roundDecimals: Int = 9): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val p = math.pow(10, roundDecimals)
    def q(c: org.apache.spark.sql.Column) =
      floor(c * p + lit(0.5)) / p
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    var hub = nodes.select(col("id"), q(lit(1.0 / n)).as("hub"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    // Each half step runs as ONE job: the L2-norm scalar stays in-plan as
    // a one-row cross-joined aggregate over the SAME raw-score subtree
    // (ReuseExchange dedups the shared exchanges), with the identical
    // floor(sqrt(Σx²)·10ᵈ + 0.5)/10ᵈ quantization the former
    // collect-to-driver round trip applied — IEEE-identical, so the
    // trajectory (and the q_hits oracle hash) is bit-unchanged. The r12
    // shape paid 3 sequential jobs per half step (raw checkpoint, norm
    // collect, normalized checkpoint).
    def normalized(raw: DataFrame, rawCol: String, outCol: String,
        what: String): DataFrame = {
      val nf = raw.agg(
        (floor(sqrt(sum(col(rawCol) * col(rawCol))) * p + lit(0.5)) / p)
          .as("__norm"))
      raw.crossJoin(nf)
        .select(col("id"), q(col(rawCol) /
          when(col("__norm") > 0, col("__norm"))
            .otherwise(raise_error(lit(s"$what vector collapsed"))))
          .as(outCol))
        .localCheckpoint(true)
    }
    for (_ <- 0 until iters) {
      // authority half step: a(v) = q(Σ_{u→v} h(u)), then L2-normalize
      val aRaw = nodes.join(
          e.join(hub.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("hub")).as("__s")),
          Seq("id"), "left")
        .select(col("id"), q(coalesce(col("__s"), lit(0.0))).as("__ar"))
      auth = normalized(aRaw, "__ar", "authority", "authority")
      // hub half step: h(u) = q(Σ_{u→v} a(v)), then L2-normalize
      val hRaw = nodes.join(
          e.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(sum(col("authority")).as("__s")),
          Seq("id"), "left")
        .select(col("id"), q(coalesce(col("__s"), lit(0.0))).as("__hr"))
      hub = normalized(hRaw, "__hr", "hub", "hub")
    }
    hub.join(auth, Seq("id"))
  }
}
