package graft

import graft.corpus.Crawl
import org.scalatest.funsuite.AnyFunSuite

/** Iterative BFS crawl frontier ≡ scalar BFS: exact min depths, visited-set
  * semantics (each doc once), depth bound, early stop on an exhausted
  * frontier. */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def scalarBfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxDepth: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var depth = 0L
    var visited = seeds.map(_ -> 0L).toMap
    var front = seeds.toSet
    while (depth < maxDepth && front.nonEmpty) {
      depth += 1
      val next = front.flatMap(s => adj.getOrElse(s, Nil)).diff(visited.keySet)
      visited = visited ++ next.map(_ -> depth)
      front = next
    }
    visited
  }

  test("frontier ≡ scalar BFS on the synthetic cyclic graph (min depths)") {
    val n = 60L
    val edges = (0L until n).flatMap(i => Seq((i, (i * 2 + 1) % n), (i, (i * 3 + 7) % n)))
    val got = Crawl.frontier(edges.toDF("src", "dst"), Seq(0L).toDF("doc_id"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarBfs(edges, Seq(0L), 8))
    assert(got(0L) == 0L && got.values.max <= 8L)
  }

  test("early stop: a finite chain halts before maxDepth; nodes visited once") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rows = Crawl.frontier(edges, Seq(0L).toDF("doc_id"), 100).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    assert(rows.length == 4) // no duplicate visits despite 100 allowed levels
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("yearSane mirrors the reference dontCrazyYear semantics (F3)") {
    import org.apache.spark.sql.functions.col
    val now = 2026
    val cases = Seq(
      ("plain/path", true),                    // no query string: passes
      ("a?b=c", true),                         // query string, no year param
      ("a?x&year=2026", true),                 // current year
      ("a?x&year=2025", true),                 // now - 1
      ("a?x&year=2027", true),                 // now + 1
      ("a?x&year=2028", false),                // > now + 1
      ("a?x&year=2024", false),                // < now - 1
      ("a?x&year=999", true),                  // 3 digits: regex doesn't match
      ("year=1800", true),                     // no '?': whole-string regex fails
      ("?year=2030", true),                    // nothing before '?': `.+\?` fails
      ("a?year=2030", true),                   // nothing between '?' and year=: `.+` fails
      ("a?xyear=2030&year=2026", false)        // leftmost 4-digit year= wins (2030)
    )
    val got = cases.map(_._1).toDF("link")
      .select(col("link"), Crawl.yearSane(col("link"), now).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (l, want) => assert(got(l) == want, s"link=$l") }
  }

  test("recrawlDelta classifies added/removed/changed/unchanged by content hash") {
    val old = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "content")
    val neu = Seq((0L, "alpha"),            // unchanged
                  (1L, "beta v2"),          // changed
                                            // 2 removed
                  (3L, "delta"),            // unchanged
                  (9L, "epsilon"))          // added
      .toDF("doc_id", "content")
    val got = Crawl.recrawlDelta(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "unchanged", 1L -> "changed", 2L -> "removed",
      3L -> "unchanged", 9L -> "added"))
    // identical versions -> all unchanged (idempotent recrawl costs nothing)
    val same = Crawl.recrawlDelta(old, old).collect().map(_.getString(1)).toSet
    assert(same == Set("unchanged"))
    // the join carries hashes only: no content column survives the plan's output
    assert(Crawl.recrawlDelta(old, neu).columns.toSeq == Seq("doc_id", "status"))
  }

  test("multiple seeds crawl in one pass; shared descendants get the min depth") {
    val edges = Seq((0L, 5L), (9L, 5L), (5L, 6L)).toDF("src", "dst")
    // duplicate seed must not duplicate output rows
    val rows = Crawl.frontier(edges, Seq(0L, 9L, 0L).toDF("doc_id"), 10).collect()
    assert(rows.length == 4)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 0L, 9L -> 0L, 5L -> 1L, 6L -> 2L))
  }

  test("canonicalUrl: fragment, tracking params, host case, trailing slash") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // host+scheme lowered, path case preserved
      ("HTTPS://Site.Example.COM/Path/Page", "https://site.example.com/Path/Page"),
      // fragment stripped
      ("https://a.com/p#sec2", "https://a.com/p"),
      // lone tracking param takes its '?' with it
      ("https://a.com/p?utm_source=x", "https://a.com/p"),
      // mid tracking param collapses, '?' kept for the survivor
      ("https://a.com/p?utm_a=1&id=2", "https://a.com/p?id=2"),
      // trailing tracking param takes its '&'
      ("https://a.com/p?id=2&utm_b=3", "https://a.com/p?id=2"),
      // several tracking params, gclid/fbclid included
      ("https://a.com/p?utm_a=1&gclid=g&fbclid=f", "https://a.com/p"),
      // tracking param before a fragment
      ("https://a.com/p?utm_a=1#x", "https://a.com/p"),
      // trailing slash trimmed; non-tracking params untouched
      ("http://a.com/", "http://a.com"),
      ("https://a.com/p?x=1&y=2", "https://a.com/p?x=1&y=2"))
    val got = cases.zipWithIndex
      .map { case ((u, _), i) => (i.toLong, u) }
      .toDF("url_id", "url")
      .select(col("url_id"), Crawl.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"canon($u)")
    }
  }

  test("urlDedup: clean and noised variants collapse; keeper is the first fetch") {
    val urls = Seq(
      (0L, "https://a.com/page"),
      (1L, "HTTPS://A.COM/page?utm_source=x#frag"),
      (2L, "https://a.com/page/"),
      (3L, "https://a.com/other")).toDF("url_id", "url")
    val got = Crawl.urlDedup(urls).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("https://a.com/other", 1L, 3L),
      ("https://a.com/page", 3L, 0L)))
  }

  test("politeSchedule: one fetch per host per slot, priority desc then path asc") {
    val f = Seq(
      ("a.com", "/p1", 5L), ("a.com", "/p2", 9L), ("a.com", "/p0", 9L),
      ("b.com", "/x", 1L)).toDF("host", "path", "priority")
    val got = Crawl.politeSchedule(f, limit = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // within a.com: ties at priority 9 break path-asc → /p0 first
    assert(got.toSeq == Seq(
      (1L, "a.com", "/p0", 9L), (1L, "b.com", "/x", 1L),
      (2L, "a.com", "/p2", 9L), (3L, "a.com", "/p1", 5L)))
    // the politeness invariant: at most one fetch per (host, slot)
    assert(got.map(g => (g._1, g._2)).distinct.length == got.length)
  }

  test("changeRates: Poisson MLE per site; all-changed site reports NULL lambda") {
    import spark.implicits._
    val old = Seq((1L, "r1", "a"), (2L, "r1", "b"), (3L, "r2", "c"))
      .toDF("doc_id", "repo", "content")
    val neu = Seq((1L, "a"), (2L, "B"), (3L, "C"), (9L, "new"))
      .toDF("doc_id", "content")
    val got = Crawl.changeRates(old, neu).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val l1 = BigDecimal(-math.log(0.5)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("r1") == ((2L, 1L, 0.5, Some(l1))))
    assert(got("r2") == ((1L, 1L, 1.0, None))) // c=1: interval uninformative
    // the added page (id 9) joins to nothing and influences no site
    assert(got.size == 2)
  }

  test("robotsFilter: RFC 9309 longest match, allow wins ties, unmatched pass") {
    import spark.implicits._
    val frontier = Seq(
      (1L, "h", "doc/10"),  // matched by disallow doc/1 only -> blocked
      (2L, "h", "doc/12"),  // doc/12 allow is LONGER than doc/1 -> allowed
      (3L, "h", "doc/9"),   // no rule matches -> allowed
      (4L, "h", "doc/5"),   // equal-length allow+disallow tie -> allow wins
      (5L, "g", "doc/10")   // other host: no rules -> allowed
    ).toDF("doc_id", "repo", "path")
    val rules = Seq(
      ("h", "doc/1", 0L), ("h", "doc/12", 1L),
      ("h", "doc/5", 0L), ("h", "doc/5", 1L)
    ).toDF("repo", "prefix", "allow")
    val got = Crawl.robotsFilter(frontier, rules).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}
