package graft

import graft.query.{Bm25, Dfr, Impact}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the impact-ordered quantized index (Anh & Moffat)
  * and the DFR PL2 scorer (Amati & van Rijsbergen). */
class ImpactDfrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3-doc fixture: a is rarer than b; doc 3 lacks a
  private def fixture = {
    val postings = Seq(("a", 1L, 2L), ("a", 2L, 1L),
      ("b", 1L, 1L), ("b", 2L, 3L), ("b", 3L, 1L)).toDF("term", "doc_id", "tf")
    val docStats = Seq((1L, 3L), (2L, 4L), (3L, 1L)).toDF("doc_id", "dl")
    val termStats = Seq(("a", 2L), ("b", 3L)).toDF("term", "df")
    (postings, docStats, termStats, 3L, 8.0 / 3.0)
  }

  test("quantize: extremes land on impact 1 and 2^bits, middles on the scalar formula") {
    val (p, ds, ts, n, avgDl) = fixture
    val dl = Map(1L -> 3L, 2L -> 4L, 3L -> 1L)
    val df = Map("a" -> 2L, "b" -> 3L)
    val ws = Seq(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 1L), ("b", 2L, 3L), ("b", 3L, 1L))
      .map { case (t, d, tf) => (t, d) -> Bm25.scoreS(tf, df(t), dl(d), n, avgDl) }.toMap
    val (wmin, wmax) = (ws.values.min, ws.values.max)
    val want = ws.map { case (k, w) =>
      k -> (math.floor((w - wmin) / (wmax - wmin) * 255.0).toLong + 1L)
    }
    val got = Impact.quantize(p, ds, ts, n, avgDl, bits = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got(ws.minBy(_._2)._1) == 1L && got(ws.maxBy(_._2)._1) == 256L)
  }

  test("impactTopK: conjunctive integer ranking, doc 3 excluded, ties impossible") {
    val (p, ds, ts, n, avgDl) = fixture
    val qz = Impact.quantize(p, ds, ts, n, avgDl)
    val got = Impact.impactTopK(qz, Seq("a", "b"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).toSet == Set(1L, 2L))          // doc 3 lacks a
    assert(got.sortBy(_._1).map(_._3).reverse.sorted.sameElements(
      got.sortBy(_._1).map(_._3).reverse))              // impact desc by rank
  }

  test("impactTopK: duplicate query terms dedupe instead of silently matching nothing") {
    val (p, ds, ts, n, avgDl) = fixture
    val qz = Impact.quantize(p, ds, ts, n, avgDl)
    val dup = Impact.impactTopK(qz, Seq("a", "b", "a"), k = 10).collect()
    val uni = Impact.impactTopK(qz, Seq("a", "b"), k = 10).collect()
    assert(dup.nonEmpty && dup.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      uni.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("impact serve plan: no stats joins — one scan + one integer aggregate") {
    val (p, ds, ts, n, avgDl) = fixture
    val qz = Impact.quantize(p, ds, ts, n, avgDl).cache()
    qz.count()
    // the serve plan ends at the cached-index scan; the quantize BUILD
    // plan nested inside InMemoryRelation is allowed its joins
    val plan = Impact.impactTopK(qz, Seq("a", "b"), 10)
      .queryExecution.executedPlan.toString
      .split("InMemoryRelation").head
    assert(!plan.contains("Join"), s"serve path must not join stats:\n$plan")
    qz.unpersist(): Unit
  }

  test("degenerate one-weight index quantizes to impact 1") {
    val p = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("term", "doc_id", "tf")
    val ds = Seq((1L, 2L), (2L, 2L)).toDF("doc_id", "dl")
    val ts = Seq(("a", 2L)).toDF("term", "df")
    val got = Impact.quantize(p, ds, ts, 2L, 2.0).collect().map(_.getLong(2))
    assert(got.forall(_ == 1L))
  }

  test("pl2TopK matches the scalar PL2 twin and prefers the rarer term") {
    val (p, ds, _, n, avgDl) = fixture
    val cfs = Map("a" -> 3L, "b" -> 5L) // Σtf per term from the fixture
    val got = Dfr.pl2TopK(p, ds, cfs, n, avgDl, k = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val tfs = Map(
      1L -> Map("a" -> 2L, "b" -> 1L),
      2L -> Map("a" -> 1L, "b" -> 3L),
      3L -> Map("b" -> 1L))
    val dl = Map(1L -> 3L, 2L -> 4L, 3L -> 1L)
    for ((d, s) <- got)
      assert(math.abs(s - Dfr.scoreS(tfs(d), dl(d), cfs.filter(c => tfs(d).contains(c._1)), n, avgDl)) < 1e-9,
        s"doc $d")
    // doc 1 carries double evidence of the RARE term a on a short doc —
    // it must beat doc 3 (one hot-term occurrence)
    assert(got(1L) > got(3L))
  }

  test("pl2TopK rejects zero collection frequency") {
    val (p, ds, _, n, avgDl) = fixture
    intercept[IllegalArgumentException] {
      Dfr.pl2TopK(p, ds, Map("a" -> 0L), n, avgDl, k = 1)
    }
  }
}
