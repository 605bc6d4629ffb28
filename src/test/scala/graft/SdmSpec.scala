package graft

import graft.query.Sdm
import org.scalatest.funsuite.AnyFunSuite

class SdmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // d1 = "join spark join", d2 = "spark join", d3 = "join <8 fillers> spark"
  def tokenPos = {
    import spark.implicits._
    (Seq((1L, "join", 0L), (1L, "spark", 1L), (1L, "join", 2L),
      (2L, "spark", 0L), (2L, "join", 1L)) ++
      Seq((3L, "join", 0L), (3L, "spark", 9L)) ++
      (1L to 8L).map(i => (3L, s"f$i", i)))
      .toDF("doc_id", "term", "pos")
  }

  test("pairCounts: ordered adjacency and unordered window edge (Δ<8)") {
    import spark.implicits._
    val ow = Sdm.pairCounts(tokenPos, "join", "spark", ordered = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ow == Map(1L -> 1L)) // d2 has spark BEFORE join; d3 gap 9
    val uw = Sdm.pairCounts(tokenPos, "join", "spark", ordered = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uw == Map(1L -> 2L, 2L -> 1L)) // d1: (0,1)+(2,1); d3 Δ=9 ≥ 8
    // boundary: Δ=7 in, Δ=8 out
    val edge = Seq((9L, "a", 0L), (9L, "b", 7L), (10L, "a", 0L), (10L, "b", 8L))
      .toDF("doc_id", "term", "pos")
    val e = Sdm.pairCounts(edge, "a", "b", ordered = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == Map(9L -> 1L))
  }

  test("sdmTopK: closed-form three-doc scores; unmatched docs still pay smoothing") {
    import spark.implicits._
    val postings = Seq(
      ("join", 1L, 2L), ("spark", 1L, 1L),
      ("join", 2L, 1L), ("spark", 2L, 1L),
      ("join", 3L, 1L), ("spark", 3L, 1L)) ++
      (1L to 8L).map(i => (s"f$i", 3L, 1L))
    val post = postings.toDF("term", "doc_id", "tf")
    val ds = Seq((1L, 3L), (2L, 2L), (3L, 10L)).toDF("doc_id", "dl")
    val cfs = Map("join" -> 4L, "spark" -> 3L)
    val c = 15.0; val mu = 2000.0
    val got = Sdm.sdmTopK(post, tokenPos, ds, Seq("join", "spark"), cfs, 15L, k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    def mp(cf: Long) = mu * (cf / c)
    val constT = math.log(mp(4)) + math.log(mp(3))
    def sT(tj: Long, ts: Long) =
      math.log(1 + tj / mp(4)) + math.log(1 + ts / mp(3))
    val cfO = 1L; val cfU = 3L
    def score(tj: Long, ts: Long, ow: Long, uwn: Long, dl: Long) = {
      val ld = math.log(dl + mu)
      0.85 * (sT(tj, ts) + constT - 2 * ld) +
        0.10 * (math.log(1 + ow / mp(cfO)) + math.log(mp(cfO)) - ld) +
        0.05 * (math.log(1 + uwn / mp(cfU)) + math.log(mp(cfU)) - ld)
    }
    assert(math.abs(got(1L) - score(2, 1, 1, 2, 3)) < 1e-12)
    assert(math.abs(got(2L) - score(1, 1, 0, 1, 2)) < 1e-12)
    assert(math.abs(got(3L) - score(1, 1, 0, 0, 10)) < 1e-12)
    // dependence signal: d1 (adjacent phrase, twice-matched windows) wins
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("sdmTopK: zero-cf pair families drop; score reduces to λT·QL") {
    import spark.implicits._
    val tp = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("doc_id", "term", "pos")
    val post = Seq(("a", 1L, 1L), ("b", 2L, 1L)).toDF("term", "doc_id", "tf")
    val ds = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "dl")
    val cfs = Map("a" -> 1L, "b" -> 1L)
    val got = Sdm.sdmTopK(post, tp, ds, Seq("a", "b"), cfs, 2L, k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val mu = 2000.0; val mp = mu * (1 / 2.0)
    val exp = 0.85 * (math.log(1 + 1 / mp) + 2 * math.log(mp) - 2 * math.log(1 + mu))
    assert(math.abs(got(1L) - exp) < 1e-12)
    assert(got(1L) == got(2L)) // symmetric docs
  }
}
