package graft

import graft.query.Eval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranking-eval harness: metrics pinned on a hand-crafted fixture where
  * nDCG/MAP are known in closed form, plus qrels synthesis semantics on a
  * tiny postings relation. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("RBP and ERR match closed-form values on a crafted fixture") {
    import spark.implicits._
    // one query, retrieved [1,2,3] with grades 3, 0, 1 (doc 2 unjudged)
    val ranking = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, 1L, 3L), (1L, 3L, 1L)).toDF("query_id", "doc_id", "grade")
    val got = Eval.rbpErr(ranking, qrels, k = 10).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // RBP(0.8) = 0.2·(1·1 + 0·0.8 + (1/3)·0.64)
    val rbp = (1.0 - 0.8) * (1.0 + (1.0 / 3.0) * math.pow(0.8, 2.0))
    // ERR: R = [7/8, 0, 1/8]; ERR = 7/8 + 0 + (1/3)·(1/8)·(1/8)
    val err = 7.0 / 8.0 + (1.0 / 3.0) * (1.0 / 8.0) * (1.0 - 7.0 / 8.0)
    assert(math.abs(got(1L)._1 - rbp) < 1e-12)
    assert(math.abs(got(1L)._2 - err) < 1e-12)
  }

  test("nDCG@k and MAP@k match closed-form values on a crafted fixture") {
    import spark.implicits._
    // q1: retrieved [1,2,3]; qrels 1→3, 3→2, 9→2 (9 NOT retrieved), 2 absent
    // q2: retrieved [5,6]; qrels 6→1 only (below the rel threshold)
    val ranking = Seq(
      (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L),
      (2L, 1L, 5L), (2L, 2L, 6L)
    ).toDF("query_id", "rank", "doc_id")
    val qrels = Seq(
      (1L, 1L, 3L), (1L, 3L, 2L), (1L, 9L, 2L),
      (2L, 6L, 1L)
    ).toDF("query_id", "doc_id", "grade")
    val got = Eval.rankingMetrics(ranking, qrels, k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val ln = (x: Double) => math.log(x)
    // q1 closed form
    val dcg1 = 7.0 / ln(2.0) + 0.0 + 3.0 / ln(4.0)
    val idcg1 = 7.0 / ln(2.0) + 3.0 / ln(3.0) + 3.0 / ln(4.0)
    val ap1 = (1.0 / 1.0 + 2.0 / 3.0) / 3.0 // rel hits at ranks 1,3; |relevant|=3
    assert(math.abs(got(1L)._1 - dcg1 / idcg1) < 1e-12)
    assert(math.abs(got(1L)._2 - ap1) < 1e-12)
    // q2: single grade-1 doc at rank 2; no doc ≥ threshold → AP = 0
    val ndcg2 = (1.0 / ln(3.0)) / (1.0 / ln(2.0))
    assert(math.abs(got(2L)._1 - ndcg2) < 1e-12)
    assert(got(2L)._2 == 0.0)
  }

  test("sumTfQrels: conjunctive only, Σtf capped at 3, one row per (query, doc)") {
    import spark.implicits._
    val postings = Seq(
      (10L, "a", 1L), (10L, "b", 5L),  // doc 10 matches both a+b, Σtf=6 → cap 3
      (11L, "a", 2L),                  // doc 11 misses b → excluded for q0
      (12L, "a", 1L), (12L, "b", 1L)   // Σtf=2 → grade 2
    ).toDF("doc_id", "term", "tf")
    val queries = Seq((0L, "a"), (0L, "b"), (0L, "b"), (1L, "a")).toDF("query_id", "term")
    val got = Eval.sumTfQrels(postings, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 10L) -> 3L, (0L, 12L) -> 2L,        // conjunctive, capped
      (1L, 10L) -> 1L, (1L, 11L) -> 2L, (1L, 12L) -> 1L)) // single-term query
  }

  test("pairedBootstrap: endpoint pins — all-positive p=0/significant, flipped p=1") {
    import spark.implicits._
    val mA = (0L until 6L).map(q => (q, 0.9)).toDF("query_id", "ndcg")
    val mB = (0L until 6L).map(q => (q, 0.8)).toDF("query_id", "ndcg")
    val r = Eval.pairedBootstrap(mA, mB, "ndcg", b = 50, seed = 11).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 50L)
    assert(r.getDouble(2) == 0.1)            // exact: integer micro-units
    assert(r.getDouble(3) == 0.0 && r.getLong(4) == 1L)
    val n = Eval.pairedBootstrap(mB, mA, "ndcg", b = 50, seed = 11).collect().head
    assert(n.getDouble(2) == -0.1 && n.getDouble(3) == 1.0 && n.getLong(4) == 0L)
    // identical systems: every resample sum is exactly 0 -> p = 1, not noise
    val z = Eval.pairedBootstrap(mA, mA, "ndcg", b = 50, seed = 11).collect().head
    assert(z.getDouble(2) == 0.0 && z.getDouble(3) == 1.0 && z.getLong(4) == 0L)
  }

  test("balancedInterleave: closed-form slot merge, keep-first dedup, team credit") {
    import spark.implicits._
    import graft.textan.TextHash
    val qid = 7L
    val aLeads = TextHash.mix(13, TextHash.tokenHash(qid.toString)) % 2 == 0
    val rankA = Seq((qid, 1L, 101L), (qid, 2L, 102L), (qid, 3L, 103L))
      .toDF("query_id", "rank", "doc_id")
    val rankB = Seq((qid, 1L, 102L), (qid, 2L, 104L))
      .toDF("query_id", "rank", "doc_id")
    val got = Eval.balancedInterleave(rankA, rankB, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // Joachims's pointer walk: leader/follower alternate, dups skipped —
    // e.g. A leads: A1=101, B1=102, A2=102 (dup, skip), B2=104, A3=103
    val want =
      if (aLeads) Seq((1L, 101L, "A"), (2L, 102L, "B"), (3L, 104L, "B"), (4L, 103L, "A"))
      else Seq((1L, 102L, "B"), (2L, 101L, "A"), (3L, 104L, "B"), (4L, 103L, "A"))
    assert(got.toSeq == want, s"aLeads=$aLeads")
    // shared doc appears exactly once
    assert(got.map(_._2).distinct.length == got.length)
    // k truncation
    assert(Eval.balancedInterleave(rankA, rankB, k = 2).count() == 2)
  }

  test("nqc: closed-form coefficient of score dispersion") {
    import spark.implicits._
    val ranking = Seq((1L, 1L, 10L, 3.0), (1L, 2L, 11L, 2.0), (1L, 3L, 12L, 1.0))
      .toDF("query_id", "rank", "doc_id", "score")
    val r = Eval.nqc(ranking, k = 10).collect().head
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - math.sqrt(2.0 / 3.0) / 2.0) < 1e-12)
  }
}
