package graft

import graft.query.{Bm25, Passage}
import org.scalatest.funsuite.AnyFunSuite

class PassageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("passagePostings: exact window coverage (w=4, stride=2)") {
    import spark.implicits._
    // doc 1: a@0 b@1 a@2 b@3 a@4 → s=0 {a:2,b:2}, s=2 {a:2,b:1}, s=4 {a:1}
    val tp = Seq((1L, "a", 0L), (1L, "b", 1L), (1L, "a", 2L), (1L, "b", 3L), (1L, "a", 4L))
      .toDF("doc_id", "term", "pos")
    val got = Passage.passagePostings(tp, window = 4, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, "a", 2L), (1L, 0L, "b", 2L),
      (1L, 2L, "a", 2L), (1L, 2L, "b", 1L),
      (1L, 4L, "a", 1L)))
    val pl = Passage.passageLengths(Passage.passagePostings(tp, 4, 2)).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(pl == Map(0L -> 4L, 2L -> 3L, 4L -> 1L))
  }

  test("maxpTopK: concentrated window beats spread occurrences; scalar recompute") {
    import spark.implicits._
    // doc 1: x at 0 and 10 (different windows); doc 2: x,x adjacent
    def fill(d: Long, ps: Seq[Long], xs: Seq[Long]) =
      xs.map(p => (d, "x", p)) ++ ps.map(p => (d, s"f$d$p", p))
    val tp = (fill(1L, Seq(1L, 2L, 3L, 11L, 12L, 13L), Seq(0L, 10L)) ++
      fill(2L, Seq(2L, 3L), Seq(0L, 1L)))
      .toDF("doc_id", "term", "pos")
    val pp = Passage.passagePostings(tp, window = 4, stride = 2)
    val pl = Passage.passageLengths(pp)
    val st = pl.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.avg("pl")).head()
    val np = st.getLong(0); val avgPl = st.getDouble(1)
    val dfs = Map("x" -> pp.filter($"term" === "x").count())
    val got = Passage.maxpTopK(pp, pl, dfs, np, avgPl, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.head._1 == 2L) // tf=2 window wins over two tf=1 windows
    // scalar recompute of doc 2's winning passage: s=0, tf=2, pl=4
    val exp = Bm25.scoreS(2L, dfs("x"), 4L, np, avgPl)
    assert(math.abs(got.head._3 - exp) < 1e-12)
    assert(got.map(_._1).toSeq == Seq(2L, 1L))
  }

  test("chunkText: winner window sliced from the analyzer array; tail clamps") {
    import spark.implicits._
    val corpus = Seq((1L, "en", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "lang", "content")
    val winners = Seq((1L, 1L, 2L), (2L, 1L, 3L)).toDF("rank", "doc_id", "s")
    val got = Passage.chunkText(corpus, winners, window = 3).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) == "gamma delta epsilon")
    assert(got(2L) == "delta epsilon") // window past the end clamps
  }
}
