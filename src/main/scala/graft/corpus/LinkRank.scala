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

  /** Top-k authority pages: (rank, doc_id, pr), ties broken by doc_id. */
  def topK(pr: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pr.orderBy(desc("pr"), asc("doc_id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("pr"), asc("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("pr"))
  }
}
