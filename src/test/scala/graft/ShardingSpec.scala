package graft

import graft.index.Sharding
import graft.textan.TextHash
import org.scalatest.funsuite.AnyFunSuite

/** Rendezvous routing: placement ≡ scalar HRW argmax, the minimal-disruption
  * property under shard addition, and the load ledger partitioning. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def terms = (0 until 200).map(i => (s"term$i", (i % 7 + 1).toLong)).toDF("term", "df")

  /** scalar twin: shards ranked by (weight desc, shard asc) for one term */
  private def hrw(t: String, nShards: Int): Seq[Int] = {
    val h = TextHash.tokenHash(t)
    (0 until nShards)
      .map(s => { val (a, b) = TextHash.mixer(s); (s, (h * a + b) % TextHash.P) })
      .sortBy { case (s, w) => (-w, s) }.map(_._1)
  }

  test("route: top-2 placement equals the scalar HRW ranking for every term") {
    val got = Sharding.route(terms, nShards = 8, replicas = 2).collect()
      .map(r => ((r.getString(0), r.getLong(3)), r.getLong(2))).toMap
    assert(got.size == 400)
    (0 until 200).foreach { i =>
      val ranked = hrw(s"term$i", 8)
      assert(got((s"term$i", 1L)) == ranked(0).toLong)
      assert(got((s"term$i", 2L)) == ranked(1).toLong)
    }
  }

  test("route: adding a 9th shard only moves terms the NEW shard wins") {
    val p8 = Sharding.route(terms, nShards = 8, replicas = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val p9 = Sharding.route(terms, nShards = 9, replicas = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val moved = p8.keys.filter(t => p9(t) != p8(t)).toSeq
    // existing shards' weights are untouched: a term moves iff shard 8 wins
    moved.foreach(t => assert(p9(t) == 8L))
    // expected movement = 1/9 of the dictionary (~22 of 200), not most of it
    assert(moved.nonEmpty && moved.size < 60)
  }

  test("loadSummary: the ledger partitions the dictionary, nothing lost") {
    val ls = Sharding.loadSummary(terms, nShards = 8, replicas = 2).collect()
    assert(ls.map(_.getLong(2)).sum == 400L) // 200 terms × 2 replicas
    assert(ls.map(r => (r.getLong(0), r.getLong(1))).distinct.length == ls.length)
    val dfMass = ls.filter(_.getLong(1) == 1L).map(_.getLong(3)).sum
    assert(dfMass == (0 until 200).map(i => (i % 7 + 1).toLong).sum)
  }

  test("partitionStudy: probes/rows/max-load match a scalar recompute") {
    import spark.implicits._
    import graft.textan.TextHash
    val ts = Seq(("a", 10L), ("b", 2L)).toDF("term", "df")
    val posts = ((0L until 10L).map(d => ("a", d, 1L)) ++
      (0L until 2L).map(d => ("b", d, 1L))).toDF("term", "doc_id", "tf")
    val qs = Seq((0L, "a"), (1L, "a"), (1L, "b")).toDF("query_id", "term")
    val got = graft.index.Sharding.partitionStudy(ts, posts, qs, nShards = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // scalar rendezvous owners
    def owner(t: String) = (0 until 2).map(s =>
      (TextHash.mix(s, TextHash.tokenHash(t)), -s)).zipWithIndex
      .maxBy(x => (x._1._1, x._1._2))._2
    val (sa, sb) = (owner("a"), owner("b"))
    val tpProbes = Set((0L, sa), (1L, sa), (1L, sb)).size.toLong
    val rows = 10L + 10L + 2L
    val tpLoad = Map(sa -> 20L).foldLeft(Map.empty[Int, Long].withDefaultValue(0L)) {
      case (m, (k, v)) => m.updated(k, m(k) + v) } // q0+q1 on a
    val tpMax = (Map(sa -> 20L) ++ (if (sb == sa) Map(sa -> 22L) else Map(sa -> 20L, sb -> 2L)))
      .values.max
    assert(got("term_part") == ((tpProbes, rows, tpMax)))
    // doc-partitioned: 2 queries x 2 shards; per-shard rows via mix(7, doc)
    def dshard(d: Long) = (TextHash.mix(7, d) % 2).toInt
    val perShard = (0 until 2).map { sh =>
      val aRows = (0L until 10L).count(dshard(_) == sh).toLong
      val bRows = (0L until 2L).count(dshard(_) == sh).toLong
      2 * aRows + bRows // a queried twice, b once
    }
    assert(got("doc_part") == ((4L, rows, perShard.max)))
  }

  test("ringBalance: successor/wrap owners match a scalar ring walk; growth only cedes to the new shard") {
    import spark.implicits._
    import graft.textan.TextHash
    import graft.index.Sharding
    val ts = Seq(("alpha", 3L), ("beta", 5L), ("gamma", 2L), ("delta", 7L))
      .toDF("term", "df")
    def ring(nS: Int, v: Int) = (0 until nS).flatMap(s => (0 until v).map(w =>
      (s, TextHash.mix(s * v + w, Sharding.RingSeed))))
    def owner(t: String, r: Seq[(Int, Long)]): Int = {
      val h = TextHash.tokenHash(t)
      val succ = r.filter(_._2 >= h)
      val pick = if (succ.nonEmpty) succ.minBy(x => (x._2, x._1))
                 else r.minBy(x => (x._2, x._1))
      pick._1
    }
    val terms = Seq("alpha", "beta", "gamma", "delta")
    val o2 = terms.map(t => t -> owner(t, ring(2, 2))).toMap
    val o3 = terms.map(t => t -> owner(t, ring(3, 2))).toMap
    val got = Sharding.ringBalance(ts, nShards = 2, vnodes = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val wantCounts = terms.groupBy(t => o2(t).toLong).map { case (s, g) =>
      s -> ((g.size.toLong,
        g.map(t => Map("alpha" -> 3L, "beta" -> 5L, "gamma" -> 2L, "delta" -> 7L)(t)).sum,
        g.count(t => o3(t) != o2(t)).toLong))
    }
    assert(got == wantCounts)
    // consistent hashing: a moved term's NEW owner is the new shard
    terms.filter(t => o3(t) != o2(t)).foreach(t => assert(o3(t) == 2))
  }
}
