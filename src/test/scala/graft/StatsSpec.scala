package graft

import graft.corpus.Corpus
import graft.index.{IndexWriter, InvertedIndex}
import graft.stats.Stats
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("statistics rollup: per-repo rows + ALL total (A8)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "r0", "en", "spark join"), (1L, "r0", "en", "spark"),
      (2L, "r1", "en", "query plan scan")
    ).toDF("doc_id", "repo", "lang", "content")
    val got = Stats.statistics(corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("r0") == ((2L, 2L))) // 2 pages; lemmas {spark, join}
    assert(got("r1") == ((1L, 3L)))
    assert(got("ALL") == ((3L, 5L)))
  }

  test("run status from snapshot history; in-flight guard (A9/S6)") {
    val dir = Files.createTempDirectory("graft-stats").toString
    assert(!Stats.indexingInFlight(dir))
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus, cacheTokens = false)
    val cfg = IndexWriter.Config(docsPerShard = 64, nBuckets = 4)
    val shards = IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl, cfg)
    IndexWriter.write(shards, dir, 1L, cfg)
    val st1 = Stats.runStatus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st1 == Map(1L -> "INDEXED"))
    assert(!Stats.indexingInFlight(dir))
    IndexWriter.write(shards, dir, 2L, cfg, statusTime = 1723900000000L)
    val st2 = Stats.runStatus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st2 == Map(1L -> "SUPERSEDED", 2L -> "INDEXED"))
    // statusTime recorded at commit is surfaced per run (site.status_time)
    val byId = Stats.runStatus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("statusTime")).toMap
    assert(byId(2L) == 1723900000000L && byId(1L) == 0L)
    // a driver-recorded abort shows as FAILED with the error payload
    // (site.last_error, model/Site.java:26-30)
    graft.io.TableIO.recordFailure(dir, 3L, 1723900000001L, "boom: executor lost")
    val failed = Stats.runStatus(spark, dir).collect()
      .filter(_.getAs[String]("status") == "FAILED")
    assert(failed.length == 1)
    assert(failed.head.getLong(0) == 3L)
    assert(failed.head.getAs[String]("lastError") == "boom: executor lost")
    assert(failed.head.getAs[Long]("statusTime") == 1723900000001L)
  }

  test("skew report: per-bucket blob metrics over a written index") {
    val dir = Files.createTempDirectory("graft-skew").toString
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus, cacheTokens = false)
    val cfg = IndexWriter.Config(docsPerShard = 64, nBuckets = 4)
    IndexWriter.write(IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl, cfg), dir, 1L, cfg)
    val rep = Stats.skewReport(spark, dir).collect()
    assert(rep.nonEmpty && rep.length <= 4)
    rep.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getInt(3).toLong <= r.getLong(2)) // max blob <= total bytes
      assert(r.getInt(4) <= 64)                  // bounded by docsPerShard
    }
  }

  test("topTermsPerRepo: scalar recompute + WindowGroupLimit plan (no full per-repo sort)") {
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val byRepo = graft.index.InvertedIndex.termStatsByRepo(
      graft.index.InvertedIndex.tokens(corpus)).cache()
    val got = Stats.topTermsPerRepo(byRepo, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val all = byRepo.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    all.groupBy(_._1).foreach { case (repo, rows) =>
      val want = rows.sortBy { case (_, t, df) => (-df, t) }.take(3)
      val g = got.filter(_._1 == repo).sortBy(_._2)
      assert(g.length == want.length, s"$repo size")
      g.zip(want).zipWithIndex.foreach { case (((_, rk, t, df), (_, wt, wdf)), i) =>
        assert(rk == i + 1 && t == wt && df == wdf, s"$repo rank ${i + 1}")
      }
    }
    val plan = Stats.topTermsPerRepo(byRepo, 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    byRepo.unpersist(): Unit
  }

  test("keywords: per-doc tf-idf top-j == scalar recompute; WindowGroupLimit plan") {
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus, cacheTokens = false)
    val res = Stats.keywords(t.postings, t.termStats, t.nDocs, j = 3, minDf = 2)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val dfm = t.termStats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val posts = t.postings.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    posts.groupBy(_._1).foreach { case (doc, rows) =>
      val want = rows.filter(p => dfm(p._2) >= 2)
        .map { case (_, term, tf) => (term, tf * math.log(t.nDocs.toDouble / dfm(term))) }
        .sortBy { case (term, w) => (-w, term) }.take(3)
      val g = got.filter(_._1 == doc).sortBy(_._2)
      assert(g.length == want.length, s"doc $doc size")
      g.zip(want).zipWithIndex.foreach { case (((_, rk, term, wr), (wt, ww)), i) =>
        assert(rk == i + 1 && term == wt, s"doc $doc rank ${i + 1}: got $term want $wt")
        assert(math.abs(wr - BigDecimal(ww).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      }
    }
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("lengthQuantiles: exact interpolated percentiles per repo + ALL") {
    import spark.implicits._
    val ds = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 100L))
      .toDF("doc_id", "dl")
    val corpus = Seq((0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "repo")
    val got = Stats.lengthQuantiles(ds, corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toMap
    // repo a, dl [1,2,3,4]: p50 at (n-1)*0.5 = 1.5 -> 2.5; p90 at 2.7 -> 3.7;
    // p99 at 2.97 -> 3.97
    val (ad, a50, a90, a99, amax) = got("a")
    assert(ad == 4L && amax == 4L)
    assert(math.abs(a50 - 2.5) < 1e-12 && math.abs(a90 - 3.7) < 1e-12 &&
      math.abs(a99 - 3.97) < 1e-12)
    // singleton repo: every quantile IS the value
    assert(got("b") == ((1L, 100.0, 100.0, 100.0, 100L)))
    // ALL spans both repos; max comes from the outlier
    val (td, t50, _, _, tmax) = got("ALL")
    assert(td == 5L && tmax == 100L && math.abs(t50 - 3.0) < 1e-12)
  }

  test("zipfFit: perfect power law recovers slope -1, r2 = 1") {
    import spark.implicits._
    // cf = 840 / rank exactly for ranks 1..8 -> ln cf = ln 840 - ln rank
    val cfs = Seq(840L, 420L, 280L, 210L, 168L, 140L, 120L, 105L)
    val postings = cfs.zipWithIndex
      .map { case (c, i) => (i.toLong, s"t$i", c) }
      .toDF("doc_id", "term", "tf")
    val r = Stats.zipfFit(postings, topN = 1000).collect().head
    assert(r.getLong(0) == 8L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(840.0)) < 1e-9, s"intercept ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, s"r2 ${r.getDouble(3)}")
    // topN caps the fit window: with topN=4 only the head is fitted
    val head = Stats.zipfFit(postings, topN = 4).collect().head
    assert(head.getLong(0) == 4L && math.abs(head.getDouble(1) - (-1.0)) < 1e-9)
  }

  test("heapsFit: prefix (N, V) points and regression match a scalar recompute") {
    import spark.implicits._
    val tokens = Seq(
      (0L, "a", "x"), (0L, "a", "y"), (1L, "a", "x"),
      (2L, "b", "y"), (2L, "b", "z"),
      (3L, "c", "w")
    ).toDF("doc_id", "repo", "term")
    val r = Stats.heapsFit(tokens, thresholds = Seq(1L, 2L, 4L)).collect().head
    // prefixes doc_id < 1/2/4: N = [2, 3, 6]; V = [2, 2, 4]
    // (x,y first in doc 0; z in doc 2; w in doc 3)
    val pts = Seq((2.0, 2.0), (3.0, 2.0), (6.0, 4.0))
      .map { case (n, v) => (math.log(n), math.log(v)) }
    val mx = pts.map(_._1).sum / 3; val my = pts.map(_._2).sum / 3
    val cxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum / 3
    val vx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum / 3
    val vy = pts.map { case (_, y) => (y - my) * (y - my) }.sum / 3
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - cxy / vx) < 1e-9, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - (my - (cxy / vx) * mx)) < 1e-9)
    assert(math.abs(r.getDouble(3) - (cxy * cxy) / (vx * vy)) < 1e-9)
    // a threshold past the corpus end duplicates the saturation point but
    // stays well-defined (no zero-variance crash on saturated vocabularies)
    val sat = Stats.heapsFit(tokens, thresholds = Seq(1L, 2L, 4L, 8L, 16L)).collect().head
    assert(sat.getLong(0) == 5L && !sat.getDouble(1).isNaN)
  }

  test("facetRollup: one aggregate yields (repo,lang), (repo), and grand total") {
    import spark.implicits._
    val c = Seq((0L, "a", "en"), (1L, "a", "ru"), (2L, "a", "en"), (3L, "b", "en"))
      .toDF("doc_id", "repo", "lang")
    val got = Stats.facetRollup(c).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "en") -> 2L, ("a", "ru") -> 1L, ("b", "en") -> 1L,
      ("a", "ALL") -> 3L, ("b", "ALL") -> 1L,
      ("ALL", "ALL") -> 4L))
  }

  test("CMS: engine estimates ≡ scalar sketch twin; always an overestimate") {
    import spark.implicits._
    import graft.stats.Sketches
    val counts = Map("alpha" -> 100L, "beta" -> 40L, "gamma" -> 7L,
      "delta" -> 3L, "epsilon" -> 1L)
    val items = counts.toSeq.toDF("term", "tf")
    val terms = counts.keys.toSeq.sorted :+ "missing"
    for (width <- Seq(2, 8, 64)) {
      val cms = Sketches.cmsBuild(items, "term", "tf", width)
      val got = Sketches.cmsEstimate(spark, cms, terms, width).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.foreach { t =>
        assert(got(t) == Sketches.cmsEstimateS(counts, t, width),
          s"width=$width term=$t")
        assert(got(t) >= counts.getOrElse(t, 0L), s"CMS must overestimate: $t")
      }
    }
    // sketch size is bounded by depth·width regardless of vocabulary
    assert(Sketches.cmsBuild(items, "term", "tf", 8).count() <= 4L * 8)
  }

  test("bloom filter: membership ≡ scalar bit set; no false negatives; absent term rejected at m=2^16") {
    import spark.implicits._
    import graft.textan.TextHash
    val vocab = Seq("join", "spark", "dup", "hash").toDF("term")
    val m = 65536
    val bits = graft.stats.Sketches.bloomBits(vocab, "term", m, kh = 4)
      .collect().map(_.getLong(0)).toSet
    val want = (for (t <- Seq("join", "spark", "dup", "hash"); i <- 0 until 4)
      yield TextHash.mix(i, TextHash.tokenHash(t)) % m).toSet
    assert(bits == want)
    val probes = Seq("join", "spark", "warpdrive").toDF("term")
    val got = graft.stats.Sketches.probeBloom(
        graft.stats.Sketches.bloomBits(vocab, "term", m, kh = 4), probes, "term", m, kh = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("join") == 1L && got("spark") == 1L) // false negatives impossible
    // scalar expectation for the absent probe (collisions possible in
    // principle; at m=2^16 with 16 set bits the scalar twin decides)
    val absent = (0 until 4).map(i => TextHash.mix(i, TextHash.tokenHash("warpdrive")) % m)
      .forall(b => want.contains(b))
    assert(got("warpdrive") == (if (absent) 1L else 0L))
  }

  test("bloom filter: a tiny m forces a deterministic false positive") {
    import spark.implicits._
    import graft.textan.TextHash
    val vocab = Seq("join", "spark", "dup", "hash").toDF("term")
    val m = 2 // every bit set with near-certainty → absent term collides
    val setBits = (for (t <- Seq("join", "spark", "dup", "hash"); i <- 0 until 4)
      yield TextHash.mix(i, TextHash.tokenHash(t)) % m).toSet
    assume(setBits == Set(0L, 1L)) // holds for this vocab/mixer family
    val got = graft.stats.Sketches.probeBloom(
        graft.stats.Sketches.bloomBits(vocab, "term", m, kh = 4),
        Seq("warpdrive").toDF("term"), "term", m, kh = 4)
      .collect().head
    assert(got.getLong(1) == 1L) // in_bloom, yet absent: the FP case exists
  }

  test("kmvDistinct: exact below k, estimate formula at k, duplicate-invariant") {
    import spark.implicits._
    import graft.textan.TextHash
    import graft.stats.Sketches
    // 10 distinct values, k=256 -> sketch IS the exact count
    val small = (0 until 10).flatMap(i => Seq.fill(3)(s"v$i")).toDF("v")
    val r = Sketches.kmvDistinct(small, "v", 256).collect().head
    assert(r.getLong(0) == 10L && r.getDouble(1) == 10.0)
    // 50 distinct, k=8 -> est = 7*P/h_(8), h_(8) the 8th smallest hash
    val vals = (0 until 50).map(i => s"w$i")
    val big = vals.flatMap(v => Seq.fill(2)(v)).toDF("v")
    val got = Sketches.kmvDistinct(big, "v", 8).collect().head
    val h8 = vals.map(v => TextHash.mix(5, TextHash.tokenHash(v))).distinct.sorted.apply(7)
    assert(got.getLong(0) == 8L)
    assert(math.abs(got.getDouble(1) - 7.0 * TextHash.P.toDouble / h8) < 1e-9)
    // duplicates never change the sketch
    val once = vals.toDF("v")
    assert(Sketches.kmvDistinct(once, "v", 8).collect().head.getDouble(1)
      == got.getDouble(1))
  }

  test("kmvDistinctBy: exact below k per group, estimator at k, group isolation") {
    import spark.implicits._
    import graft.textan.TextHash
    // group a: 3 distinct values (< k=4 -> exact); group b: 6 distinct (at k)
    val rows = (Seq("x", "y", "z", "x").map(("a", _)) ++
      (1 to 6).map(i => ("b", s"v$i"))).toDF("grp", "v")
    val got = graft.stats.Sketches.kmvDistinctBy(rows, "grp", "v", k = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("a") == ((3L, 3.0)))
    val hs = (1 to 6).map(i => TextHash.mix(5, TextHash.tokenHash(s"v$i"))).sorted
    assert(got("b") == ((4L, 3.0 * TextHash.P.toDouble / hs(3).toDouble)))
  }
}
