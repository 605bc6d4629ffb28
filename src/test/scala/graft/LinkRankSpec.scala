package graft

import graft.corpus.{Crawl, LinkRank}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank ≡ scalar fixed-point power iteration: bit-exact
  * integer masses (the whole point of the fixed-point design), teleport-only
  * nodes, dangling leak semantics, and partitioning-invariance. */
class LinkRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** scalar twin of LinkRank.pagerank — same truncating integer arithmetic */
  def scalarPr(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
               scale: Long = 1000000000000L): Map[Long, Long] = {
    val n = nodes.size
    val init = scale / n
    val teleport = 15L * init / 100L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges if outdeg.contains(u))
        acc(v) += pr(u) / outdeg(u)
      pr = nodes.map(v => v -> (teleport + 85L * acc(v) / 100L)).toMap
    }
    pr
  }

  test("pagerank ≡ scalar fixed-point iteration on the synthetic graph (bit-exact)") {
    val n = 60L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    val got = LinkRank.pagerank(edges.toDF("src", "dst"), nodes.toDF("doc_id"), n, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarPr(edges, nodes, 3))
  }

  /** scalar twin of LinkRank.trustRank — seed-gated teleport */
  def scalarTrust(edges: Seq[(Long, Long)], nodes: Seq[Long], seeds: Set[Long],
                  iters: Int, scale: Long = 1000000000000L): Map[Long, Long] = {
    val init = scale / seeds.size
    val teleport = 15L * init / 100L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(v => v -> (if (seeds(v)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges if outdeg.contains(u))
        acc(v) += pr(u) / outdeg(u)
      pr = nodes.map(v => v ->
        ((if (seeds(v)) teleport else 0L) + 85L * acc(v) / 100L)).toMap
    }
    pr
  }

  test("trustRank ≡ scalar; unreachable-from-seeds pages score exactly 0") {
    // seeds {0}; chain 0→1→2; spam pair 10↔11 links only to itself
    val nodes = Seq(0L, 1L, 2L, 10L, 11L)
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 10L))
    val got = LinkRank.trustRank(edges.toDF("src", "dst"), nodes.toDF("doc_id"),
        Seq(0L).toDF("doc_id"), nSeeds = 1L, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarTrust(edges, nodes, Set(0L), 3))
    assert(got(10L) == 0L && got(11L) == 0L) // spam farm: no teleport floor
    assert(got(0L) > 0L && got(1L) > 0L && got(2L) > 0L)
    // trust decays with distance from the seed
    assert(got(0L) > got(1L) && got(1L) > got(2L))
  }

  test("node with no in-edges holds exactly the teleport mass") {
    // 0 -> 1 -> 2 -> 0 cycle plus isolated-source 3 -> 0: node 3 gets no
    // in-links, so after any iteration pr(3) = teleport exactly
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val pr = LinkRank.pagerank(edges, nodes, 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val init = 1000000000000L / 4
    assert(pr(3L) == 15L * init / 100L)
    // the cycle nodes outrank the in-link-free node
    assert(pr(0L) > pr(3L) && pr(1L) > pr(3L) && pr(2L) > pr(3L))
  }

  test("dangling node contributes nothing (documented leak), result matches scalar") {
    // 2 is dangling (no out-edges): its mass leaks; everyone else unaffected
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val nodes = Seq(0L, 1L, 2L)
    val got = LinkRank.pagerank(edges.toDF("src", "dst"), nodes.toDF("doc_id"), 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarPr(edges, nodes, 3))
  }

  test("partitioning-invariant: same bits at 1 and 13 partitions") {
    val n = 40L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    def run(parts: Int) = LinkRank.pagerank(
      edges.toDF("src", "dst").repartition(parts), nodes.toDF("doc_id"), n, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("topK ranks by pr desc with doc_id ties deterministic") {
    val pr = Seq((5L, 100L), (1L, 300L), (2L, 100L), (9L, 300L)).toDF("doc_id", "pr")
    val top = LinkRank.topK(pr, 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((1L, 1L), (2L, 9L), (3L, 2L)))
  }

  test("cocitation ≡ scalar recompute; duplicate edges deduped; hot citers pruned") {
    // src 0 cites {1,2,3}; src 5 cites {1,2} (one edge duplicated); src 6
    // cites {2,3}; src 9 cites 70 targets -> dropped by maxOutDeg=64
    val edges = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (5L, 1L), (5L, 2L), (5L, 1L),
      (6L, 2L), (6L, 3L)) ++ (1L to 70L).map(i => (9L, i))).toDF("src", "dst")
    val got = LinkRank.cocitation(edges, maxOutDeg = 64).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 2L))
  }

  test("coupling ≡ scalar recompute; duality with cocitation on swapped edges") {
    // 1 and 5 both cite {2,3}; 1 and 6 share {3}; dst 9 has 70 citers ->
    // every pair THROUGH 9 is dropped by maxInDeg=64
    val edges = (Seq((1L, 2L), (1L, 3L), (5L, 2L), (5L, 3L), (5L, 3L),
      (6L, 3L)) ++ (10L to 79L).map(i => (i, 9L))).toDF("src", "dst")
    val got = LinkRank.coupling(edges, maxInDeg = 64).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 5L) -> 2L, (1L, 6L) -> 1L, (5L, 6L) -> 1L))
    // exact dual: coupling(E) == cocitation(E with src/dst swapped)
    val dual = LinkRank.cocitation(
        edges.select(col("dst").as("src"), col("src").as("dst")), maxOutDeg = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == dual)
  }

  /** scalar twin of LinkRank.hits — same truncating integer normalization */
  def scalarHits(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
                 scale: Long = 1000000000L): Map[Long, (Long, Long)] = {
    var auth = nodes.map(_ -> scale).toMap
    var hub = nodes.map(_ -> scale).toMap
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val d = math.max(raw.values.sum / scale, 1L)
      raw.map { case (k, v) => k -> v / d }
    }
    for (_ <- 1 to iters) {
      auth = norm(nodes.map(v => v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap)
      hub = norm(nodes.map(v => v -> edges.filter(_._1 == v).map(e => auth(e._2)).sum).toMap)
    }
    nodes.map(v => v -> ((auth(v), hub(v)))).toMap
  }

  test("hits ≡ scalar fixed-point iteration on the synthetic graph (bit-exact)") {
    val n = 60L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    val got = LinkRank.hits(edges.toDF("src", "dst"), nodes.toDF("doc_id"), iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == scalarHits(edges, nodes, 2))
  }

  test("hits: star graph — center is the hub, leaves are the authorities") {
    val edges = (1L to 5L).map(i => (0L, i))
    val nodes = 0L to 5L
    val got = LinkRank.hits(edges.toDF("src", "dst"), nodes.toDF("doc_id"), iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == scalarHits(edges, nodes, 2))
    // center: zero authority (nothing links to it), dominant hub
    assert(got(0L)._1 == 0L && got(0L)._2 > got(1L)._2)
    // every leaf: positive equal authority, zero hub (no out-links)
    assert((1L to 5L).map(got(_)._1).toSet.size == 1 && got(1L)._1 > 0L)
    assert((1L to 5L).forall(got(_)._2 == 0L))
  }

  /** scalar twin of LinkRank.opic — banked history + equal cash split,
    * dangling total redistributed by one integer division */
  def scalarOpic(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
                 scale: Long = 1000000000000L): Map[Long, Long] = {
    val n = nodes.size
    val init = scale / n
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var hist = nodes.map(_ -> 0L).toMap
    var cash = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) acc(v) += cash(u) / outdeg(u)
      val dangShare = nodes.filterNot(outdeg.contains).map(cash).sum / n
      hist = nodes.map(v => v -> (hist(v) + cash(v))).toMap
      cash = nodes.map(v => v -> (acc(v) + dangShare)).toMap
    }
    nodes.map(v => v -> (hist(v) + cash(v))).toMap
  }

  test("opic ≡ scalar cash/history recurrence on the synthetic graph (bit-exact)") {
    val n = 60L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    val got = LinkRank.opic(edges.toDF("src", "dst"), nodes.toDF("doc_id"), n, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarOpic(edges, nodes, 3))
    // cash is conserved up to integer-division leaks: total importance
    // after G rounds is ≤ (G+1)·scale and > 0
    assert(got.values.sum > 0L && got.values.sum <= 4L * 1000000000000L)
  }

  test("opic: dangling cash is pooled and redistributed equally") {
    // 0→1, 1→0; node 2 dangling. After round 1: node 2's init cash is
    // split n-ways back to everyone (scalar twin asserts exact values)
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (1L, 0L))
    val got = LinkRank.opic(edges.toDF("src", "dst"), nodes.toDF("doc_id"), 3L, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarOpic(edges, nodes, 2))
    // the dangling node keeps banking history but only ever receives the
    // redistributed share — strictly less important than the cycle nodes
    assert(got(2L) < got(0L) && got(2L) < got(1L))
  }

  /** scalar twin of LinkRank.salsa — two integer divisions per round */
  def scalarSalsa(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int,
                  scale: Long = 1000000000000L): Map[Long, Long] = {
    val init = scale / nodes.size
    val ideg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var a = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val hub = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((i, k) <- edges) hub(i) += a(k) / ideg(k)
      val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((i, j) <- edges) acc(j) += hub(i) / odeg(i)
      a = nodes.map(v => v -> acc(v)).toMap
    }
    a
  }

  test("salsa ≡ scalar two-division recurrence on the synthetic graph (bit-exact)") {
    val n = 60L
    val nodes = (0L until n)
    val edges = nodes.flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    val got = LinkRank.salsa(edges.toDF("src", "dst"), nodes.toDF("doc_id"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarSalsa(edges, nodes, 2))
  }

  test("salsa: a node nothing links to holds zero authority") {
    // 0->1, 0->2, 1->2: node 0 has indeg 0
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val got = LinkRank.salsa(edges.toDF("src", "dst"), nodes.toDF("doc_id"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarSalsa(edges, nodes, 2))
    assert(got(0L) == 0L && got(2L) > got(1L)) // indeg 2 beats indeg 1
  }
}
