package graft

import graft.index.IndexLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("varintBytes: exact LEB128 thresholds") {
    val vs = Seq(1L, 127L, 128L, 16383L, 16384L, 2097151L, 2097152L,
      268435455L, 268435456L, 34359738367L, 34359738368L)
    val got = vs.toDF("v").select(col("v"), IndexLayout.varintBytes(col("v")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 127L -> 1L, 128L -> 2L, 16383L -> 2L, 16384L -> 3L,
      2097151L -> 3L, 2097152L -> 4L, 268435455L -> 4L, 268435456L -> 5L,
      34359738367L -> 5L, 34359738368L -> 6L)
    assert(got == want)
  }

  test("staticPruneStudy: top-N-by-tf keeps the index's hot postings and the overlap counts the damage") {
    // term x over docs 1..3 (tf 3,2,1) + term y on doc 1; prune n=1 keeps
    // x@1 and y@1 only → pruned top-2 for q={x} is just doc 1, overlap 1
    val postings = Seq(("x", 1L, 3L), ("x", 2L, 2L), ("x", 3L, 1L), ("y", 1L, 1L))
      .toDF("term", "doc_id", "tf")
    val docStats = Seq((1L, 4L), (2L, 2L), (3L, 1L)).toDF("doc_id", "dl")
    val got = IndexLayout.staticPruneStudy(postings, docStats,
        Map("x" -> 3L), nDocs = 3L, avgDl = 7.0 / 3.0, n = 1, k = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("original") == ((4L, 2L)))
    assert(got("pruned") == ((2L, 1L)))
  }

  test("remapStudy: URL-sorted ids shrink gap bytes on a clustered corpus") {
    // one term spread across docs 0, 200, 400 (same repo): raw gaps
    // 1,200,200 → 1+2+2 = 5 bytes; remapped ids 0,1,2 → 3 bytes
    val postings = Seq(("x", 0L), ("x", 200L), ("x", 400L)).toDF("term", "doc_id")
      .withColumn("tf", lit(1L))
    val corpus = Seq((0L, "r", "a"), (200L, "r", "b"), (400L, "r", "c"))
      .toDF("doc_id", "repo", "path")
    val got = IndexLayout.remapStudy(postings, corpus).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("original") == ((3L, 5L)))
    assert(got("url_sorted") == ((3L, 3L)))
  }

  test("diagnostic guard: remapByUrl and faginTaStudy refuse over-cap inputs, pass under-cap") {
    val corpus = (0L until 10L).map(i => (i, "r", s"p$i")).toDF("doc_id", "repo", "path")
    // under the cap: plans fine
    assert(IndexLayout.remapByUrl(corpus, maxRows = 10L).count() == 10L)
    // over the cap: require fires before any window is planned
    val e1 = intercept[IllegalArgumentException] {
      IndexLayout.remapByUrl(corpus, maxRows = 9L)
    }
    assert(e1.getMessage.contains("remapByUrl"))
    val attrs = (0L until 10L).map(i => (i, i, 10L - i)).toDF("doc_id", "a", "b")
    assert(graft.query.Search.faginTaStudy(attrs, wB = 10L, maxRows = 10L).count() == 1L)
    val e2 = intercept[IllegalArgumentException] {
      graft.query.Search.faginTaStudy(attrs, wB = 10L, maxRows = 9L)
    }
    assert(e2.getMessage.contains("faginTaStudy"))
  }

  test("frontCodeStudy: block=1 makes every term a restart head (no front coding)") {
    // regression for the (rn−1) % block head rule: with block=1 front bytes
    // must equal raw bytes exactly — the old rn % 1 == 1 test never marked
    // a head and front-coded everything
    val dict = Seq("beta", "alpha", "alphabet").toDF("term")
    val r = IndexLayout.frontCodeStudy(dict, "t", block = 1).collect().head
    assert(r.getLong(2) == r.getLong(3))
    assert(r.getDouble(4) == 0.0)
  }

  test("frontCodeStudy: exact byte model with block restarts and full-prefix lcp") {
    import spark.implicits._
    // sorted: alpha(head, 6B) | alphabet(lcp 5, 1+1+3=5B) | beta(head, 5B)
    val dict = Seq("beta", "alpha", "alphabet").toDF("term")
    val r = IndexLayout.frontCodeStudy(dict, "t", block = 2).collect().head
    assert(r.getString(0) == "t" && r.getLong(1) == 3L)
    assert(r.getLong(2) == (6L + 9L + 5L))  // raw: 1+5, 1+8, 1+4
    assert(r.getLong(3) == (6L + 5L + 5L))  // front: head, lcp5+suf3, head
    assert(r.getDouble(4) == 0.2)
  }

  test("Elias gamma/delta bit costs: exact closed forms on known values") {
    // γ(v) = 2·bitlen − 1; δ(v) = γ(bitlen) + bitlen − 1; δ wins from L ≥ 6
    val got = Seq(1L, 2L, 5L, 16L, 31L, 32L).toDF("v")
      .select(col("v"), IndexLayout.gammaBits(col("v")).as("g"),
        IndexLayout.deltaBits(col("v")).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((3L, 4L)), 5L -> ((5L, 5L)),
      16L -> ((9L, 9L)), 31L -> ((9L, 9L)), 32L -> ((11L, 10L))))
  }

  test("codecStudy: dense gap-1 stream — bit codes beat byte-aligned varint 8×") {
    // one term on docs 0..9: remap is identity (single repo, path = doc order)
    val postings = (0L until 10L).map(d => ("x", d, 1L)).toDF("term", "doc_id", "tf")
    val corpus = (0L until 10L).map(d => (d, "r", f"doc/$d%03d")).toDF("doc_id", "repo", "path")
    val got = IndexLayout.codecStudy(postings, corpus).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // gaps: first = 0−(−1) = 1, then nine 1s → γ/δ = 10 bits, varint = 80
    assert(got("original") == ((10L, 80L, 10L, 10L)))
    assert(got("url_sorted") == ((10L, 80L, 10L, 10L)))
  }

  test("mergePolicyStudy: closed-form write amplification on sizes 1..5") {
    import spark.implicits._
    val corpus = (1 to 5).flatMap(i => Seq.fill(i)(s"r$i")).toDF("repo")
    val got = IndexLayout.mergePolicyStudy(corpus, fanout = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // leveled: cums 1,3,6,10,15 -> 35 written over 15 input
    assert(got("leveled") == ((15L, 35L, 35L * 1000L / 15L)))
    // tiered F=4, N=5: flush 15 + level-1 rewrites batches 0..3 (1+2+3+4)
    assert(got("tiered_f4") == ((15L, 25L, 25L * 1000L / 15L)))
  }

  test("skipStudy: closed-form costs for m=4, n=100") {
    import spark.implicits._
    val ts = Seq(("a", 4L), ("b", 100L)).toDF("term", "df")
    val r = IndexLayout.skipStudy(ts, Seq(("a", "b"))).collect().head
    // k = 10; skip = 100/10 + 4*10 = 50; gallop = 2*4*bitlen(25) = 40
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      == ((4L, 100L, 104L, 50L, 40L)))
  }
}
