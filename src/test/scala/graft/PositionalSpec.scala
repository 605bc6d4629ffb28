package graft

import graft.index.Positional
import graft.pipeline.Splits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positional index, exact phrase matching, and deterministic splits. */
class PositionalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def docs = Seq(
    (0L, "r", "en", "spark join spark join fast"), // "spark join" twice
    (1L, "r", "en", "join spark"),                 // reversed: no match
    (2L, "r", "en", "spark the join"),             // stopword removed -> adjacent!
    (3L, "r", "en", "spark fast join"),            // gap: no match
    (4L, "r", "en", "alpha alpha alpha"))          // repeated-term phrase
    .toDF("doc_id", "repo", "lang", "content")

  test("positions index the analyzed (stop-filtered) sequence") {
    val got = Positional.positionalPostings(docs)
      .filter(col("doc_id") === 2L).collect()
      .map(r => r.getString(1) -> r.getSeq[Long](3).toList).toMap
    // "the" removed => spark at 0, join at 1
    assert(got == Map("spark" -> List(0L), "join" -> List(1L)))
  }

  test("exact adjacent phrase: counts occurrences, respects order and analysis") {
    val tp = Positional.tokenPositions(docs)
    val got = Positional.phraseMatches(tp, Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 2L -> 1L), s"got $got")
    // repeated-term phrase needs genuinely consecutive occurrences
    val rep = Positional.phraseMatches(tp, Seq("alpha", "alpha"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(4L -> 2L)) // positions 0,1,2 -> starts 0 and 1
  }

  test("phraseTopK ranks by occurrences then doc_id") {
    val tp = Positional.tokenPositions(docs)
    val got = Positional.phraseTopK(tp, Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toList == List((1L, 0L, 2L), (2L, 2L, 1L)))
  }

  test("biword index ≡ positional phrase for EVERY bigram of the fixture; map-only build") {
    val bi = Positional.biwordPostings(docs)
    val tp = Positional.tokenPositions(docs)
    // relation equality over the full bigram vocabulary, not a sample
    val pairs = bi.select("w1", "w2").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (w1, w2) =>
      val viaBi = Positional.biwordPhrase(bi, w1, w2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaPos = Positional.phraseMatches(tp, Seq(w1, w2))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBi == viaPos, s"bigram ($w1,$w2): biword $viaBi vs positional $viaPos")
    }
    // a bigram never adjacent (order matters) probes to empty
    assert(Positional.biwordPhrase(bi, "fast", "spark").isEmpty)
    // build plan: no Window (pairs come off the token array, not a sort)
    val plan = bi.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"biword build must not window-sort:\n$plan")
  }

  test("proximity: slop=0 equals exact phrase; slop admits bounded gaps") {
    val tp = Positional.tokenPositions(docs)
    val phrase = Positional.phraseMatches(tp, Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prox0 = Positional.proximityMatches(tp, Seq("spark", "join"), slop = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prox0 == phrase, s"slop=0 must equal exact phrase: $prox0 vs $phrase")
    // slop=1 admits the one-token gap in doc 3 ("spark fast join")
    val prox1 = Positional.proximityMatches(tp, Seq("spark", "join"), slop = 1)
      .collect().map(_.getLong(0)).toSet
    assert(prox1.contains(3L) && prox1.contains(0L) && prox1.contains(2L))
    assert(!prox1.contains(1L), "reversed order must NOT match ordered proximity")
  }

  test("proximity matches a scalar oracle on a generated corpus (property)") {
    val corpus = graft.corpus.Corpus.generateDistributed(spark, 120, 4)
      .select(col("doc_id"), col("repo"), col("lang"), col("content"))
    val terms = Seq("tok0", "tok2")
    val slop = 2
    // scalar oracle: brute-force window scan over the analyzed token seq
    def scalarProx(tokens: Seq[String]): Long = {
      val pos = tokens.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2.toLong)).toMap
      val starts = for {
        p0 <- pos.getOrElse(terms.head, Nil)
        s <- (p0 - slop) to p0 // starts witnessed by term 0
        if terms.zipWithIndex.forall { case (t, i) =>
          pos.getOrElse(t, Nil).exists(p => p >= s + i && p <= s + i + slop)
        }
      } yield s
      starts.distinct.size.toLong
    }
    val rows = corpus.collect()
    val want = rows.map { r =>
      val lang = r.getString(2)
      r.getLong(0) -> scalarProx(graft.analyze.Analyzer.analyze(lang, r.getString(3)))
    }.filter(_._2 > 0).toMap
    val got = Positional.proximityMatches(Positional.tokenPositions(corpus), terms, slop)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("unordered NEAR: reversed order matches; window width = |q| + slop") {
    val tp = Positional.tokenPositions(docs)
    // slop=0, w=2: adjacency up to permutation
    val near0 = Positional.nearMatches(tp, Seq("spark", "join"), slop = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc0 [spark join spark join fast]: starts 0,1,2; doc1 [join spark]:
    // REVERSED order matches (the semantic delta vs ordered proximity);
    // doc2 analyzed [spark join]: start 0; doc3 has a gap: none at slop=0
    assert(near0 == Map(0L -> 3L, 1L -> 1L, 2L -> 1L), s"got $near0")
    // slop=1 (w=3) admits doc3's one-token gap
    val near1 = Positional.nearMatches(tp, Seq("spark", "join"), slop = 1)
      .collect().map(_.getLong(0)).toSet
    assert(near1 == Set(0L, 1L, 2L, 3L), s"got $near1")
  }

  test("unordered NEAR matches a scalar window oracle on a generated corpus (property)") {
    val corpus = graft.corpus.Corpus.generateDistributed(spark, 120, 4)
      .select(col("doc_id"), col("repo"), col("lang"), col("content"))
    val terms = Seq("tok0", "tok2")
    val slop = 2
    val w = terms.size + slop
    def scalarNear(tokens: Seq[String]): Long = {
      val pos = tokens.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2.toLong)).toMap
      if (terms.exists(t => !pos.contains(t))) return 0L
      val starts = for {
        p0 <- pos(terms.head)
        s <- (p0 - w + 1) to p0
        if terms.forall(t => pos(t).exists(p => p >= s && p <= s + w - 1))
      } yield s
      starts.distinct.size.toLong
    }
    val rows = corpus.collect()
    val want = rows.map { r =>
      r.getLong(0) -> scalarNear(graft.analyze.Analyzer.analyze(r.getString(2), r.getString(3)))
    }.filter(_._2 > 0).toMap
    val got = Positional.nearMatches(Positional.tokenPositions(corpus), terms, slop)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("splits: deterministic, Column == scalar, proportions roughly 80/10/10") {
    val ids = (0L until 2000L).map(Tuple1(_)).toDF("doc_id")
    val got = Splits.assign(ids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    got.foreach { case (id, b, s) =>
      assert(b == Splits.bucketS(id))
      val want = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s == want)
    }
    val byS = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byS("train") > 1500 && byS("train") < 1700, byS.toString)
    assert(byS("val") > 130 && byS("val") < 280, byS.toString)
    assert(byS("test") > 130 && byS("test") < 280, byS.toString)
    // stability: assignment is a pure function of doc_id — a grown corpus
    // never moves an existing doc across splits
    val grown = Splits.assign((0L until 4000L).map(Tuple1(_)).toDF("doc_id"))
      .filter(col("doc_id") < 2000).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    got.foreach { case (id, _, s) => assert(grown(id) == s) }
  }

  test("importanceSample: keep iff bucket < 1000·w — pure function of (id, weight)") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, if (i % 3 == 0) 0.0 else if (i % 3 == 1) 1.0 else 0.5))
      .toDF("doc_id", "w")
    val kept = Splits.importanceSample(docs, col("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("bucket"))).toMap
    (0L until 200L).foreach { i =>
      val w = if (i % 3 == 0) 0.0 else if (i % 3 == 1) 1.0 else 0.5
      val want = Splits.bucketS(i) < math.floor(1000.0 * w).toLong
      assert(kept.contains(i) == want, s"doc $i (w=$w, bucket=${Splits.bucketS(i)})")
    }
    // w=0 always drops; w=1 always keeps
    assert((0L until 200L by 3).forall(i => !kept.contains(i)))
    assert((1L until 200L by 3).forall(i => kept.contains(i)))
  }

  test("leakageSafeAssign: cluster members never straddle; singletons ≡ assign") {
    import spark.implicits._
    val docs = (0L until 100L).map(Tuple1(_)).toDF("doc_id")
    val clusterOf = Seq((1L, 1L), (5L, 1L), (9L, 1L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val got = Splits.leakageSafeAssign(docs, clusterOf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def sOf(b: Long) = if (b < 800) "train" else if (b < 900) "val" else "test"
    // every cluster member carries the representative's key, bucket, split
    Seq(1L, 5L, 9L).foreach { id =>
      assert(got(id) == ((1L, Splits.bucketS(1L), sOf(Splits.bucketS(1L)))), s"doc $id") }
    Seq(20L, 21L).foreach { id =>
      assert(got(id) == ((20L, Splits.bucketS(20L), sOf(Splits.bucketS(20L)))), s"doc $id") }
    // singletons: bit-identical to the plain assign
    val plain = Splits.assign(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (0L until 100L).filterNot(Set(1L, 5L, 9L, 20L, 21L)).foreach { id =>
      assert(got(id) == ((id, plain(id)._1, plain(id)._2)), s"doc $id") }
  }

  test("mixtureResample: BIGINT keep rule matches scalar; shares land at target") {
    import spark.implicits._
    import graft.pipeline.Mixture
    // 300 docs in dom a, 100 in b, 50 in c; targets: a=200‰, b=300‰, c absent
    val docs = (0L until 450L).map(i =>
      (i, if (i < 300) "a" else if (i < 400) "b" else "c")).toDF("doc_id", "dom")
    val targets = Map("a" -> 200, "b" -> 300)
    val kept = Mixture.resample(docs, "dom", targets).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = Map("a" -> 300L, "b" -> 100L, "c" -> 50L)
    (0L until 450L).foreach { i =>
      val dom = if (i < 300) "a" else if (i < 400) "b" else "c"
      val want = Splits.bucketS(i) * n(dom) < targets.getOrElse(dom, 0).toLong * 450L
      assert(kept.contains(i) == want, s"doc $i dom $dom bucket ${Splits.bucketS(i)}")
    }
    // absent domain drops entirely; under-represented domain keeps all
    assert(!kept.values.exists(_ == "c"))
    // b: tw·N = 300·450 = 135000 > 1000·n_b = 100000 → every b doc kept
    assert(kept.values.count(_ == "b") == 100)
    // a downsampled toward 200‰·450 = 90 docs (hash noise within ~20%)
    val aKept = kept.values.count(_ == "a")
    assert(aKept > 70 && aKept < 110, s"a kept $aKept")
  }

  test("stratifiedSample: scalar recompute, growth monotone, WindowGroupLimit plan") {
    import graft.textan.TextHash
    def mk(n: Long) = (0L until n).map(id => (id, s"s${id % 7}")).toDF("doc_id", "strata")
    val quota = 25
    val df = Splits.stratifiedSample(mk(2000), "strata", quota)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // scalar recompute: per stratum, order by (mix_7(tokenHash(id)), id), take quota
    val want = (0L until 2000L).map(id => (id, s"s${id % 7}"))
      .groupBy(_._2).flatMap { case (st, rows) =>
        rows.sortBy { case (id, _) => (TextHash.mix(7, TextHash.tokenHash(id.toString)), id) }
          .take(quota).zipWithIndex.map { case ((id, _), i) => (id, st, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == want, s"diff: ${(got.toSet diff want) ++ (want diff got.toSet)}")
    got.groupBy(_._2).foreach { case (st, rows) => assert(rows.length == quota, st) }
    // growth monotonicity: a doc kept in the grown corpus that existed before
    // was either already kept, or every displacement came from NEW ids only
    val keptBefore = got.map(_._1).toSet
    val keptGrownOld = Splits.stratifiedSample(mk(4000), "strata", quota)
      .filter(col("doc_id") < 2000).collect().map(_.getLong(0)).toSet
    assert(keptGrownOld.subsetOf(keptBefore),
      s"old doc newly selected under growth: ${keptGrownOld diff keptBefore}")
    // rank<=quota must compile to a quota-row heap, never a full stratum sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("pack: two-phase prefix sum ≡ scalar fold; chop boundaries; bucket-invariant") {
    import spark.implicits._
    import graft.textan.TextHash
    import graft.pipeline.Packing
    val ds = (1L to 40L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "dl")
    val got = Packing.pack(ds, capacity = 10L, nBuckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val order = (1L to 40L).map(i => (i, (i % 7) + 1,
      TextHash.mix(9, TextHash.tokenHash(i.toString)))).sortBy(x => (x._3, x._1))
    var off = 0L
    val want = order.map { case (id, dl, _) =>
      val o = off; off += dl
      (id, o, o / 10, (o + dl - 1) / 10, if ((o + dl - 1) / 10 > o / 10) 1L else 0L)
    }.toSet
    assert(got.toSet == want)
    assert(got.count(_._5 == 1L) > 0) // some docs straddle a boundary
    // bucket count is an implementation knob, never a semantic one
    val one = Packing.pack(ds, 10L, nBuckets = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    got.foreach { case (id, o, _, _, _) => assert(one(id) == o) }
  }

  test("pack: the prefix-sum window is bucket-partitioned, never global") {
    import spark.implicits._
    import graft.pipeline.Packing
    val ds = (1L to 100L).map(i => (i, 3L)).toDF("doc_id", "dl")
    val plan = Packing.pack(ds, capacity = 10L, nBuckets = 8)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toList
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("bucket")),
      s"every window must partition on bucket:\n${windowLines.mkString("\n")}")
  }

  test("kfoldLedger: every doc tests exactly once; folds follow the permille buckets") {
    import spark.implicits._
    val ids = (0L until 500L).map(Tuple1(_)).toDF("doc_id")
    val got = graft.pipeline.Splits.kfoldLedger(ids, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.values.map(_._1).sum == 500L)          // partition
    got.foreach { case (_, (te, tr)) => assert(te + tr == 500L) }
    val want = (0L until 500L).groupBy(d => graft.pipeline.Splits.bucketS(d) % 5)
      .view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == want)
  }
}
