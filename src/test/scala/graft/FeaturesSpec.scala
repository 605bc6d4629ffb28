package graft

import graft.corpus.Corpus
import graft.index.InvertedIndex
import graft.pipeline.Features
import graft.query.{Bm25, Oracle, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LTR feature export: every feature recomputed scalar-side from the
  * committed oracle index; ranking consistency with the batch BM25 scorer;
  * plan-shape guards for the one-postings-pass contract. */
class FeaturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val (corpus, tables, oracle) = {
    val c = Corpus.fromDocuments(spark, "/root/testdata/sf0.001").cache()
    val t = InvertedIndex.build(c)
    val docs = c.select("doc_id", "repo", "lang", "content").collect()
      .map(r => Oracle.Doc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    (c, t, new Oracle.Index(docs.toIndexedSeq))
  }

  val batch = Seq(
    (0L, "dup"), (1L, "join"), (1L, "spark"),
    (2L, "hash"), (2L, "join"), (2L, "merge"))

  private def runLtr(prior: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    Features.ltr(tables.postings, tables.docStats, tables.termStats,
        batch.toDF("query_id", "term"), prior, tables.nDocs, tables.avgDl, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8), r.getDouble(9), r.getLong(10)))
  }

  /** scalar recompute of the whole feature matrix from the oracle index */
  private def scalarLtr(prior: Map[Long, Long]): Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Double, Double, Long)] =
    batch.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      val terms = rows.map(_._2).distinct
      val cands = terms.flatMap(t => oracle.postingList(t)).distinct
      cands.map { id =>
        val present = terms.filter(t => oracle.tf.contains((id, t)))
        val fBm25 = present.map(t =>
          Bm25.scoreS(oracle.tf((id, t)), oracle.df(t), oracle.dl(id), oracle.nDocs, oracle.avgDl)).sum
        (id, present.size.toLong, terms.size.toLong,
          present.map(t => oracle.tf((id, t))).sum,
          present.map(t => oracle.tf((id, t))).max,
          oracle.dl(id),
          present.map(t => Bm25.idfS(oracle.df(t), oracle.nDocs)).sum,
          fBm25, prior.getOrElse(id, 0L))
      }.sortBy { case (id, _, _, _, _, _, _, b, _) => (-b, id) }
        .take(10).zipWithIndex.map { case ((id, m, qn, st, mt, dl, idf, b, pr), i) =>
          (qid, (i + 1).toLong, id, m, qn, st, mt, dl, idf, b, pr)
        }
    }

  test("ltr feature matrix == scalar recompute from the oracle index (empty prior)") {
    import spark.implicits._
    val got = runLtr(Seq.empty[(Long, Long)].toDF("doc_id", "pr"))
      .sortBy(r => (r._1, r._2))
    val want = scalarLtr(Map.empty).sortBy(r => (r._1, r._2))
    assert(got.length == want.length, s"sizes ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"id cols: $g vs $w")
      assert(g._4 == w._4 && g._5 == w._5 && g._6 == w._6 && g._7 == w._7 && g._8 == w._8,
        s"int features: $g vs $w")
      assert(math.abs(g._9 - w._9) < 1e-9 && math.abs(g._10 - w._10) < 1e-9,
        s"double features: $g vs $w")
      assert(g._11 == w._11, s"prior: $g vs $w")
    }
  }

  test("prior feature: docs in the prior carry its mass, absent docs get 0") {
    import spark.implicits._
    // take two real candidate docs for query 0 and give them prior mass
    val cand = oracle.postingList("dup").take(2)
    assert(cand.size == 2, "fixture needs >=2 docs matching 'dup'")
    val prior = cand.zipWithIndex.map { case (id, i) => (id, 100L * (i + 1)) }
    val got = runLtr(prior.toDF("doc_id", "pr"))
    val want = scalarLtr(prior.toMap)
    assert(got.sortBy(r => (r._1, r._2)).map(r => (r._1, r._3, r._11)).toSeq ==
      want.sortBy(r => (r._1, r._2)).map(r => (r._1, r._3, r._11)),
      "prior column must match the scalar join")
    assert(got.exists(_._11 > 0L) && got.exists(_._11 == 0L))
  }

  test("f_bm25 ordering == disjunctive batch scorer ordering per query") {
    import spark.implicits._
    val ltr = runLtr(Seq.empty[(Long, Long)].toDF("doc_id", "pr"))
      .map(r => (r._1, r._2, r._3)).sorted
    val bb = Search.bm25TopKBatch(tables.postings, tables.docStats, tables.termStats,
        batch.toDF("query_id", "term"), tables.nDocs, tables.avgDl, k = 10,
        conjunctive = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(ltr.toSeq == bb.toSeq)
  }

  test("plan shape: WindowGroupLimit heap + broadcast query-side joins") {
    import spark.implicits._
    val df = Features.ltr(tables.postings, tables.docStats, tables.termStats,
      batch.toDF("query_id", "term"),
      Seq((1L, 5L)).toDF("doc_id", "pr"), tables.nDocs, tables.avgDl, k = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
  }

  test("hardNegatives: anti-join qrels, per-query top-n by rank") {
    import spark.implicits._
    import graft.pipeline.Features
    val ranking = Seq(
      (0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L), (0L, 4L, 13L),
      (1L, 1L, 20L), (1L, 2L, 21L)
    ).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((0L, 10L, 2L), (0L, 12L, 1L), (1L, 20L, 3L), (1L, 21L, 3L))
      .toDF("query_id", "doc_id", "grade")
    val got = Features.hardNegatives(ranking, qrels, n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // q0: relevant {10, 12} -> negatives in rank order: 11 (rank 2), 13 (rank 4)
    // q1: everything relevant -> no negatives at all
    assert(got.toSet == Set((0L, 1L, 11L, 2L), (0L, 2L, 13L, 4L)), s"got ${got.toSet}")
  }
}
