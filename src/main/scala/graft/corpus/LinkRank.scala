package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking (PageRank power iteration) over the crawl edge table —
  * the classic web-search static ranking signal the reference's category
  * implies but its per-site engine never computes (the reference ranks purely
  * by query-time relevance, SearcherPage.java:91-107; a whole-web index needs
  * a query-independent authority prior).
  *
  * Numerics: FIXED-POINT BIGINT arithmetic (`scale` = 10^12 units of mass),
  * not doubles. Every per-iteration quantity is an integer, so sums are
  * order-independent and the result is bit-exact at ANY partitioning /
  * parallelism — the same cross-engine-parity device as the A5 integer-
  * division prune (QueryFrontend) and the IVF ordered float sums (Ann).
  * Truncation in `div` loses < 1 unit of 10^-12 mass per node per iteration —
  * irrelevant for ranking, essential for determinism.
  *
  * Update rule (damping d = 85/100, teleport uniform):
  *
  *   pr_0(v)    = scale div N
  *   pr_{t+1}(v) = (15 · (scale div N)) div 100
  *               + (85 · Σ_{(u,v)∈E} (pr_t(u) div outdeg(u))) div 100
  *
  * Dangling nodes (no out-edges) simply leak their mass — a documented
  * simplification (ranking order is unaffected for the connected component;
  * redistribute-to-all would add an extra global aggregate per iteration).
  *
  * Scale shape: per iteration ONE equi-join of pr (N rows) with edges on src
  * (shuffle on the join key) + ONE hash aggregate on dst + a left join back
  * to the node set. No collect, no windows, no per-node arrays; a hot page
  * (high in-degree) is just a large aggregate group — partial aggregation
  * absorbs it map-side. Lineage is cut per iteration with an eager
  * `localCheckpoint` (the iterative-Spark pitfall: plan growth otherwise
  * dominates past ~10 iterations). At 100 TB, pre-partition `edges` by src
  * once and every iteration's join reuses that layout shuffle-free.
  */
object LinkRank {

  /** Power iteration over `edges` (src, dst) for the node set `nodes`
    * (doc_id). Returns (doc_id, pr) with pr in fixed-point `scale` units.
    * `nNodes` is passed by the caller (generated corpora know it; a count
    * here would force an extra job). */
  def pagerank(edges: DataFrame, nodes: DataFrame, nNodes: Long, iters: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    require(nNodes > 0, "pagerank needs a non-empty node set")
    require(iters >= 0)
    val init = scale / nNodes
    val teleport = 15L * init / 100L
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var pr = nodes.select(col("doc_id"), lit(init).as("pr"))
    for (_ <- 1 to iters) {
      // contribution of each node: its mass split over its out-edges
      // (integer div; dangling nodes drop out of the inner join and leak)
      val contrib = pr.join(outdeg, pr("doc_id") === outdeg("src"))
        .select(col("src"), expr("pr div outdeg").as("contrib"))
      val in = edges.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
      pr = nodes.join(in, nodes("doc_id") === in("dst"), "left")
        .select(nodes("doc_id"),
          (lit(teleport) + expr("(85 * coalesce(acc, 0L)) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Personalized PageRank over a trusted seed set — TrustRank (Gyöngyi,
    * Garcia-Molina & Pedersen, VLDB 2004 — public literature), the
    * classic spam-demotion prior: teleport mass returns ONLY to the seeds,
    * so authority decays with link distance from trusted pages and a spam
    * farm unreachable from them scores exactly 0 (uniform PageRank gives
    * every page the teleport floor; this gives it nothing). Same
    * fixed-point BIGINT arithmetic as [[pagerank]] — bit-exact at any
    * parallelism — with the teleport term gated by a per-node seed flag.
    * `seeds` stays a relation (one left join, checkpointed once and reused
    * every iteration); nothing collects. */
  def trustRank(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                nSeeds: Long, iters: Int = 3,
                scale: Long = 1000000000000L): DataFrame = {
    require(nSeeds > 0, "trustRank needs a non-empty seed set")
    require(iters >= 0)
    val init = scale / nSeeds
    val teleport = 15L * init / 100L
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = nodes.join(seeds.select(col("doc_id"), lit(1L).as("is_seed")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint(true) // probed every iteration
    var pr = base.select(col("doc_id"), (col("is_seed") * lit(init)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = pr.join(outdeg, pr("doc_id") === outdeg("src"))
        .select(col("src"), expr("pr div outdeg").as("contrib"))
      val in = edges.join(contrib, "src")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
      pr = base.join(in, base("doc_id") === in("dst"), "left")
        .select(base("doc_id"),
          (col("is_seed") * lit(teleport)
            + expr("(85 * coalesce(acc, 0L)) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Top-k authority pages: (rank, doc_id, pr), ties broken by doc_id. */
  def topK(pr: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pr.orderBy(desc("pr"), asc("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("pr"), asc("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("pr"))
  }

  /** HITS hubs/authorities (Kleinberg 1999) — the query-independent link
    * signal complementary to PageRank: a page is a good AUTHORITY if good
    * hubs link to it, a good HUB if it links to good authorities. Same
    * fixed-point BIGINT design as `pagerank` (order-independent integer
    * sums → bit-exact at any parallelism); the ℓ1 normalization each
    * half-step is `raw div (Σraw div scale)` — dividing the SUM down first
    * keeps every intermediate ≤ Σraw ≈ N·scale, so with the default scale
    * 10^9 the arithmetic stays in BIGINT range up to N ≈ 10^9 nodes.
    *
    * Scale shape per iteration: two (join + hash aggregate) passes shuffled
    * on the edge endpoint plus two broadcast 1-row sums — no windows, no
    * collect; lineage cut per iteration like `pagerank`. Returns
    * (doc_id, auth, hub). */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int = 2,
           scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1)
    // one ℓ1-normalized half-step: scores flow across `edges` from
    // `fromCol` to `toCol`, then the whole vector is rescaled to Σ ≈ scale·N/N
    def halfStep(score: DataFrame, fromCol: String, toCol: String,
                 outName: String): DataFrame = {
      val raw = edges.join(score, edges(fromCol) === score("doc_id"))
        .groupBy(col(toCol).as("doc_id")).agg(sum(col("s")).as("raw"))
      val filled = nodes.join(raw, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("raw"), lit(0L)).as("raw"))
      val total = filled.agg(greatest(expr(s"sum(raw) div ${scale}L"), lit(1L)).as("denom"))
      filled.crossJoin(broadcast(total))
        .select(col("doc_id"), expr("raw div denom").as(outName))
    }
    var auth = nodes.select(col("doc_id"), lit(scale).as("auth"))
    var hub = nodes.select(col("doc_id"), lit(scale).as("hub"))
    for (_ <- 1 to iters) {
      auth = halfStep(hub.withColumnRenamed("hub", "s"), "src", "dst", "auth")
        .localCheckpoint(true)
      hub = halfStep(auth.withColumnRenamed("auth", "s"), "dst", "src", "hub")
        .localCheckpoint(true)
    }
    auth.join(hub, Seq("doc_id"))
  }

  /** Co-citation similarity (Small 1973): two pages are related when the
    * same third pages cite BOTH — the link-graph analog of "customers who
    * bought X also bought Y", and the classic related-pages signal that
    * needs no text at all. Returns (a_id, b_id, cocite) with a_id < b_id
    * and cocite = number of distinct citing pages.
    *
    * Scale shape: the pair generator is a self-join of each citing page's
    * out-list with itself — outdeg² pairs per citer, so `maxOutDeg` drops
    * hub pages above the bound BEFORE the join (the same hot-key prune as
    * Dedup's `maxShingleDf`: a directory page citing 10^5 targets would
    * alone emit 10^10 pairs and dominates nothing but the shuffle). Edges
    * are deduped first so cocite counts citers, not parallel edges.
    * Bibliographic coupling (Kessler 1963) — pages CITING the same targets
    * are related — is the exact dual: call this with (src, dst) swapped. */
  def cocitation(edges: DataFrame, maxOutDeg: Long = 64L,
                 minCocite: Long = 1L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val kept = e.join(deg.filter(col("odeg") <= maxOutDeg).select("src"), "src")
    val a = kept.select(col("src"), col("dst").as("a_id"))
    val b = kept.select(col("src"), col("dst").as("b_id"))
    a.join(b, "src").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("cocite"))
      .filter(col("cocite") >= minCocite)
  }

  /** Bibliographic coupling (Kessler 1963): pages CITING the same targets
    * are related — the exact dual of [[cocitation]], realized by swapping
    * the edge orientation. The hot-key prune here bounds IN-degree (a page
    * cited by 10^5 others would emit 10^10 coupled pairs), the mirror of
    * cocitation's out-degree bound. Returns (a_id, b_id, couple). */
  def coupling(edges: DataFrame, maxInDeg: Long = 64L,
               minCouple: Long = 1L): DataFrame =
    cocitation(edges.select(col("dst").as("src"), col("src").as("dst")),
        maxInDeg, minCouple)
      .withColumnRenamed("cocite", "couple")

  /** Top-k by authority: (rank, doc_id, auth, hub), ties by doc_id. */
  def hitsTopK(ah: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ah.orderBy(desc("auth"), asc("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("auth"), asc("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("auth"), col("hub"))
  }

  /** OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    * Cobena, WWW 2003 — public literature): the crawl-frontier
    * prioritizer. Each page holds CASH; visiting a page banks its cash
    * into HISTORY and ships it in equal parts to its out-links; importance
    * = history + cash, and the frontier crawls highest-importance next.
    * Unlike PageRank it needs no damping and converges while the crawl
    * runs — this is the batch-synchronized variant (every page "visited"
    * each round), which keeps the per-round plan one join + one aggregate.
    *
    * Dangling pages ship their cash to the virtual root page, which
    * redistributes it equally to everyone (Σ dangling cash div N — one
    * integer division on the total, remainder leaks, mirroring pagerank's
    * leak-not-redistribute convention).
    *
    * Same BIGINT fixed-point arithmetic as [[pagerank]]: integer `div`
    * everywhere, so results are bit-exact at any parallelism and the
    * DuckDB twin unrolls the identical recurrence. Scale shape per round:
    * one co-partitioned join of cash against out-degrees + one edge join +
    * one dst aggregate; the dangling share is a broadcast 1-row aggregate.
    * localCheckpoint truncates the growing lineage each round. */
  def opic(edges: DataFrame, nodes: DataFrame, nNodes: Long, iters: Int = 3,
           scale: Long = 1000000000000L): DataFrame = {
    require(nNodes > 0, "opic needs a non-empty node set")
    require(iters >= 0)
    val init = scale / nNodes
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    var state = nodes.select(col("doc_id"), lit(0L).as("hist"), lit(init).as("cash"))
    for (_ <- 1 to iters) {
      val withDeg = state.join(outdeg, state("doc_id") === outdeg("src"), "left")
        .select(col("doc_id"), col("cash"), col("odeg"))
      val inflow = edges.join(
          withDeg.filter(col("odeg").isNotNull)
            .select(col("doc_id").as("src"), expr("cash div odeg").as("contrib")),
          "src")
        .groupBy(col("dst")).agg(sum("contrib").as("acc"))
      val dangShare = withDeg.filter(col("odeg").isNull)
        .agg(coalesce(sum("cash"), lit(0L)).as("dtot"))
        .select(expr(s"dtot div CAST($nNodes AS BIGINT)").as("share"))
      val banked = state.select(col("doc_id"), (col("hist") + col("cash")).as("hist"))
      state = banked
        .join(inflow, banked("doc_id") === inflow("dst"), "left")
        .crossJoin(broadcast(dangShare))
        .select(banked("doc_id"), col("hist"),
          (coalesce(col("acc"), lit(0L)) + col("share")).as("cash"))
        .localCheckpoint(true)
    }
    state.select(col("doc_id"), (col("hist") + col("cash")).as("importance"),
      col("cash"))
  }

  /** SALSA authority scores (Lempel & Moran, WWW 2000, "The stochastic
    * approach for link-structure analysis" — public literature; the
    * algorithm behind Twitter's GraphJet who-to-follow). HITS's mutual
    * reinforcement without its TKC bias: the walk alternates backward
    * (authority → a hub that cites it, uniform over in-links) and forward
    * (hub → one of its citations, uniform over out-links), so both steps
    * are DEGREE-NORMALIZED — a tightly-knit spam community cannot
    * concentrate mass the way it does under HITS.
    *
    *   h(i)  = Σ_{i→k} a(k) div indeg(k)
    *   a'(j) = Σ_{i→j} h(i) div outdeg(i)
    *
    * Same BIGINT micro-unit arithmetic as [[pagerank]] (two integer
    * divisions per round, remainders leak) — bit-exact at any parallelism,
    * and the DuckDB twin unrolls the identical recurrence. Per round: two
    * co-partitioned joins + two aggregates, lineage truncated. */
  def salsa(edges: DataFrame, nodes: DataFrame, iters: Int = 2,
            scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1)
    val nNodes = nodes.count()
    require(nNodes > 0, "salsa needs a non-empty node set")
    val init = scale / nNodes
    val indeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("ideg"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    var a = nodes.select(col("doc_id"), lit(init).as("auth"))
    for (_ <- 1 to iters) {
      val back = a.join(indeg, a("doc_id") === indeg("dst"))
        .select(col("dst").as("k"), expr("auth div ideg").as("share"))
      val hub = edges.join(back, edges("dst") === back("k"))
        .groupBy(col("src")).agg(sum("share").as("hubm"))
        .join(outdeg, "src")
        .select(col("src"), expr("hubm div odeg").as("hshare"))
      val acc = edges.join(hub, "src")
        .groupBy(col("dst")).agg(sum("hshare").as("acc"))
      a = nodes.join(acc, nodes("doc_id") === acc("dst"), "left")
        .select(nodes("doc_id"), coalesce(col("acc"), lit(0L)).as("auth"))
        .localCheckpoint(true)
    }
    a
  }
}
