package graft

import graft.corpus.Corpus
import graft.index.{IndexWriter, InvertedIndex}
import graft.query.{Bm25, QueryFrontend, Search, Wand}
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** The committed reference query set (FIXTURES.md §3): 20 queries over
  * sf0.001 covering rare/hot/multi-term/camelCase/duplicate-surface/missing/
  * stopword-only/repo-scoped cases, with expected top-10 (docId, BM25, Σtf)
  * generated ONCE by the in-memory scalar oracle and checked into
  * src/test/resources. The engine must reproduce the files exactly — this
  * pins behavior against silent engine+oracle co-drift. */
class GoldenQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  case class GoldenRow(rank: Int, docId: Long, bm25: Double, sumTf: Long)

  lazy val queries: Seq[(String, String, String)] =
    Source.fromResource("golden_queries.tsv").getLines().drop(1).map { l =>
      val a = l.split("\t"); (a(0), a(1), a(2))
    }.toSeq
  lazy val golden: Map[String, Seq[GoldenRow]] =
    Source.fromResource("golden_topk.tsv").getLines().drop(1).map { l =>
      val a = l.split("\t")
      a(0) -> GoldenRow(a(1).toInt, a(2).toLong, a(3).toDouble, a(4).toLong)
    }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.rank)).toMap

  lazy val (corpus, t) = {
    val c = Corpus.fromDocuments(spark, "/root/testdata/sf0.001").cache()
    (c, InvertedIndex.build(c))
  }

  test("queries file covers the fixture plan: 20 queries, 18 with results") {
    assert(queries.size == 20)
    assert(golden.size == 18) // q09 (missing term) and q10 (stop-only) are empty
    assert(!golden.contains("q09") && !golden.contains("q10"))
  }

  test("engine full search path reproduces every committed golden top-10") {
    queries.foreach { case (id, q, repoF) =>
      val res = Search.search(corpus, t.postings, t.docStats, t.termStats,
        t.nDocs, t.avgDl, query = q, lang = "en",
        repoFilter = if (repoF == "-101") None else Some(repoF), limit = 10)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(6)))
      golden.get(id) match {
        case None => assert(res.isEmpty, s"$id should be empty")
        case Some(rows) =>
          assert(res.length == rows.length, s"$id size ${res.length} vs ${rows.length}")
          res.zip(rows).foreach { case ((rk, docId, score), g) =>
            assert(rk == g.rank, s"$id rank")
            assert(docId == g.docId, s"$id doc at rank ${g.rank}: $docId vs ${g.docId}")
            assert(math.abs(score - g.bm25) < 1e-9, s"$id score at rank ${g.rank}")
          }
      }
    }
  }

  test("WAND compressed path reproduces the unscoped goldens") {
    val cfg = IndexWriter.Config(docsPerShard = 128, nBuckets = 8, saltWidth = 4)
    val shardsDs = IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl, cfg).cache()
    queries.filter(_._3 == "-101").foreach { case (id, q, _) =>
      val p = QueryFrontend.plan(t.termStats, "en", q)
      if (golden.contains(id)) {
        assert(!p.isEmpty, s"$id planned empty but golden nonempty")
        val idfs = p.terms.map(ti => ti.term -> Bm25.idfS(ti.df, t.nDocs)).toMap
        val got = Wand.topK(shardsDs.filter(sp => idfs.contains(sp.term)), idfs, t.avgDl, 10)
          .collect().map(r => (r.getLong(1), r.getDouble(2)))
        val rows = golden(id)
        assert(got.map(_._1).toSeq == rows.map(_.docId), s"$id WAND docIds")
        got.zip(rows).foreach { case ((_, s), g) =>
          assert(math.abs(s - g.bm25) < 1e-9, s"$id WAND score at rank ${g.rank}")
        }
      }
    }
  }

  test("Σtf parity column matches the goldens' sum_tf") {
    queries.filter(_._3 == "-101").foreach { case (id, q, _) =>
      golden.get(id).foreach { rows =>
        val p = QueryFrontend.plan(t.termStats, "en", q)
        val byDoc = Search.sumTfTopK(t.postings, p.terms.map(_.term), 100000)
          .collect().map(r => r.getLong(1) -> r.getInt(2).toLong).toMap
        rows.foreach { g =>
          assert(byDoc.get(g.docId).contains(g.sumTf),
            s"$id doc ${g.docId}: sumTf ${byDoc.get(g.docId)} vs ${g.sumTf}")
        }
      }
    }
  }
}
