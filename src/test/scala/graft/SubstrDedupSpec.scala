package graft

import graft.dedup.SubstrDedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Lee et al. 2022 ExactSubstr keep-one semantics on closed
  * fixtures: spans of ≥ w tokens repeated anywhere drop everywhere except
  * their first (min (doc_id, pos)) occurrence; overlapping marked ranges
  * union into the maximal span. Tokens avoid Analyzer.naturalStop. */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] =
    SubstrDedup.rewrite(docs.toDF("doc_id", "content"), w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("cross-doc duplicated span: first doc keeps it, second doc drops it") {
    val got = run(Seq(1L -> "p q r s t u", 2L -> "v q r s t w"), w = 4)
    assert(got(1L) == ((6L, 0L, "p q r s t u")))   // keep-first: doc 1 intact
    assert(got(2L) == ((6L, 4L, "v w")))           // span q r s t dropped
  }

  test("within-doc repeat: overlapping anchor ranges union to the maximal second copy") {
    // m n o p z m n o p z : anchors 'm n o p'@{0,5} and 'n o p z'@{1,6};
    // removals 5..8 ∪ 6..9 = 5..9 — the ENTIRE second copy, exactly
    val got = run(Seq(3L -> "m n o p z m n o p z"), w = 4)
    assert(got(3L) == ((10L, 5L, "m n o p z")))
  }

  test("keep-first is deterministic by (doc_id, pos), not arrival order") {
    // same span in three docs: only the lowest doc_id keeps it
    val got = run(Seq(9L -> "c d e f", 7L -> "c d e f", 8L -> "c d e f"), w = 4)
    assert(got(7L)._2 == 0L && got(7L)._3 == "c d e f")
    assert(got(8L)._2 == 4L && got(8L)._3 == "")
    assert(got(9L)._2 == 4L && got(9L)._3 == "")
  }

  test("docs with no duplicated span and docs shorter than w pass through") {
    val got = run(Seq(1L -> "u v w x y z", 2L -> "g h"), w = 4)
    assert(got(1L) == ((6L, 0L, "u v w x y z")))
    assert(got(2L) == ((2L, 0L, "g h")))
  }

  test("anchors/removals agree with the rewrite's removed-token count") {
    val docs = Seq(1L -> "p q r s t u", 2L -> "v q r s t w").toDF("doc_id", "content")
    val rm = SubstrDedup.removals(SubstrDedup.anchors(docs, 4)).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rm == Set((2L, 1)))                      // one removed anchor @ doc 2 pos 1
  }
}
