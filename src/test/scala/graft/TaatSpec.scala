package graft

import graft.query.{Bm25, ResultCache, Taat}
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for TAAT Quit/Continue accumulator limiting and the
  * static result-cache study. */
class TaatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val nDocs = 4L
  private val avgDl = 2.5
  // a (df 1) → d1; b (df 2) → d1, d2; c (df 3) → d2, d3, d4
  private val postings = Seq(
    ("a", 1L, 1L), ("b", 1L, 1L), ("b", 2L, 2L),
    ("c", 2L, 1L), ("c", 3L, 1L), ("c", 4L, 3L)
  ).toDF("term", "doc_id", "tf")
  private val docStats = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 4L)).toDF("doc_id", "dl")
  private val dfs = Map("a" -> 1L, "b" -> 2L, "c" -> 3L)
  private def w(term: String, tf: Long, dl: Long) =
    Bm25.scoreS(tf, dfs(term), dl, nDocs, avgDl)

  test("L=2 admits terms a,b only; quit drops c's evidence, continue keeps it for admitted docs") {
    // first_idx: d1=1, d2=2, d3=d4=3; acc = 1,2,4 → i* = 2, admitted {d1,d2}
    val got = Taat.quitContinueTopK(postings, docStats, dfs, nDocs, avgDl, limit = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.keys.map(_._2).toSet == Set(1L, 2L))
    assert(math.abs(got(("quit", 1L)) - (w("a", 1L, 2L) + w("b", 1L, 2L))) < 1e-12)
    assert(math.abs(got(("quit", 2L)) - w("b", 2L, 3L)) < 1e-12)
    assert(math.abs(got(("continue", 1L)) - (w("a", 1L, 2L) + w("b", 1L, 2L))) < 1e-12)
    assert(math.abs(got(("continue", 2L)) - (w("b", 2L, 3L) + w("c", 1L, 3L))) < 1e-12)
    assert(got(("continue", 2L)) > got(("quit", 2L)))
  }

  test("a term creating no new accumulators still advances i (densified window)") {
    // a → d1, d2; b → d1 (no new); c → d3..d5. L = 2: acc = 2,2,5 → i* = 2,
    // so b's weight must be in d1's quit score
    val p = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 1L),
      ("c", 3L, 1L), ("c", 4L, 1L), ("c", 5L, 1L)).toDF("term", "doc_id", "tf")
    val ds = Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)).toDF("doc_id", "dl")
    val dfs2 = Map("a" -> 2L, "b" -> 1L, "c" -> 3L)
    // order is (df, term): b(1) < a(2) < c(3) — first_idx d1=1? No: b is idx 1
    // and matches d1 only → first_idx d1=1, d2=2, rest 3; acc = 1,2,5 → i* = 2
    val got = Taat.quitContinueTopK(p, ds, dfs2, 5L, 1.2, limit = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val wq = Bm25.scoreS(1L, 1L, 2L, 5L, 1.2) + Bm25.scoreS(1L, 2L, 2L, 5L, 1.2)
    assert(math.abs(got(("quit", 1L)) - wq) < 1e-12)
    assert(got.keys.map(_._2).toSet == Set(1L, 2L))
  }

  test("a budget nothing fits under yields empty rankings") {
    val got = Taat.quitContinueTopK(postings, docStats, dfs, nDocs, avgDl, limit = 0L, k = 10)
    assert(got.count() == 0L)
  }

  test("static cache study: top-C train frequency cut and both hit counts") {
    // train (even ids): x,x,y,z — top-1 cache = {x}
    // eval (odd ids): x,y,w — static hit 1, infinite 2 (w never trained)
    val stream = Seq((0L, "x"), (2L, "x"), (4L, "y"), (6L, "z"),
      (1L, "x"), (3L, "y"), (5L, "w")).toDF("event_id", "query")
    val r = ResultCache.staticCacheStudy(stream, c = 1).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 3L, 1L, 2L)))
  }

  test("argmax-term stream: highest-tf term per doc, lexicographic ties") {
    val p = Seq(("b", 1L, 2L), ("a", 1L, 1L), ("b", 2L, 1L), ("a", 2L, 1L))
      .toDF("term", "doc_id", "tf")
    val got = ResultCache.argmaxTermStream(p).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "a"))
  }

  test("posting-cache study: QTF/DF prefix under the df budget") {
    // stream x,x,x,y; dfs x=2, y=2, z=16 -> budget 20/10 = 2: only x fits
    val stream = Seq((0L, "x"), (1L, "x"), (2L, "x"), (3L, "y"))
      .toDF("event_id", "query")
    val ts = Seq(("x", 2L), ("y", 2L), ("z", 16L)).toDF("term", "df")
    val r = ResultCache.postingCacheStudy(stream, ts).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((2L, 1L, 2L, 3L, 4L)))
  }

  test("trafficGini: closed form on frequencies [1,1,2]; uniform traffic scores 0") {
    val stream = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "c"))
      .toDF("event_id", "query")
    val r = ResultCache.trafficGini(stream).collect().head
    // x asc = [1,1,2], n=3, tot=4: num = -2 + 0 + 4 = 2 -> G = 2/12
    assert((r.getLong(0), r.getLong(1)) == ((4L, 3L)))
    assert(r.getDouble(2) == BigDecimal(2.0 / 12.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val flat = Seq((0L, "a"), (1L, "b")).toDF("event_id", "query")
    assert(ResultCache.trafficGini(flat).collect().head.getDouble(2) == 0.0)
  }
}
