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
}
