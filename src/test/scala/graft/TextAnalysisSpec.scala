package graft

import graft.textan.{TextAnalysis, TextHash}
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "content")
  }

  test("langId: marker argmax with asc tie-break; no markers -> und") {
    val d = df(
      (0L, "the cat and the dog is here"),   // en
      (1L, "der hund und die katze ist da"), // de
      (2L, "xyz qqq zzz"),                   // und
      (3L, "the le")                         // en=1, fr=1 -> tie -> 'en' (asc)
    )
    val got = TextAnalysis.langId(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(0L)._1 == "en" && got(0L)._2 == 4L) // the×2 + and + is
    assert(got(1L)._1 == "de" && got(1L)._2 == 4L) // der + und + die + ist
    assert(got(2L) == ("und", 0L))
    assert(got(3L)._1 == "en" && got(3L)._2 == 1L)
  }

  test("quality features exact on a crafted doc") {
    val d = df((0L, "the quick brown fox!"))
    val r = TextAnalysis.quality(d).collect().head
    assert(r.getLong(1) == 20L)  // n_chars
    assert(r.getLong(2) == 4L)   // n_tokens
    assert(r.getDouble(3) == ((3 + 5 + 5 + 4) / 4.0)) // avg token len 4.25
    assert(r.getDouble(4) == 0.25) // "the" of 4
    assert(r.getDouble(5) == 0.8)  // 16 alnum of 20 chars
  }

  test("token counts: ws vs BPE-ish pre-tokens") {
    val d = df((0L, "foo_bar 123 baz!"), (1L, ""))
    val got = TextAnalysis.tokenCounts(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // ws: [foo_bar, 123, baz!] = 3; bpe-ish: foo _ bar 123 baz ! = 6
    assert(got(0L) == ((3L, 6L)))
    assert(got(1L) == ((0L, 0L)))
  }

  test("fingerprint: Column form == scalar twin; order-sensitive") {
    val rows = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"), (2L, "alpha beta gamma"))
    val got = TextAnalysis.fingerprint(df(rows: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, s) =>
      assert(got(id) == TextAnalysis.fingerprintS(s), s"doc $id")
    }
    assert(got(0L) == got(2L))
    assert(got(0L) != got(1L)) // order matters
  }

  test("curation: quality gate + exact-dedup keep + stable split in one plan") {
    import spark.implicits._
    val longDoc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (0L, longDoc),                       // passes; canonical of the dup pair
      (1L, "too short"),                   // fails minTokens
      (2L, longDoc),                       // exact dup of 0 -> dropped
      (3L, (1 to 40).map(_ => "!!!").mkString(" ")), // fails alnum ratio
      (4L, (1 to 35).map(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "content")
    val got = graft.pipeline.Curation.curate(d, minTokens = 30, minAlnumRatio = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got.keySet == Set(0L, 4L), s"survivors: ${got.keySet}")
    assert(got(0L)._1 == 40L && got(4L)._1 == 35L)
    // split agrees with the standalone Splits assignment (stable composition)
    got.foreach { case (id, (_, bucket, split)) =>
      assert(bucket == graft.pipeline.Splits.bucketS(id))
      val want = if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
      assert(split == want)
    }
  }

  test("mixer family: distinct, in-range, deterministic") {
    val ms = (0 until 64).map(TextHash.mixer)
    assert(ms.distinct.size == 64)
    ms.foreach { case (a, b) =>
      assert(a >= 1 && a < TextHash.P)
      assert(b >= 0 && b < TextHash.P)
    }
    assert((0 until 64).map(TextHash.mixer) == ms)
  }

  test("redactPii: typed placeholders + audit counts on the original text") {
    val d = df(
      (0L, "mail me at bob.smith+x@corp.example.org or call +4915512345678"),
      (1L, "server 192.168.0.1 and 10.0.0.2 are up"),
      (2L, "nothing personal here"))
    val got = TextAnalysis.redactPii(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == (("mail me at <EMAIL> or call <PHONE>", 1L, 0L, 1L)))
    assert(got(1L) == (("server <IP> and <IP> are up", 0L, 2L, 0L)))
    assert(got(2L) == (("nothing personal here", 0L, 0L, 0L)))
  }

  test("repetition: dup-word and top-bigram fractions, keep thresholds") {
    val d = df(
      (0L, "x x x x y"),               // dwf = 1-2/5 = 0.6; top bigram 'x x' 3/4
      (1L, "alpha beta gamma delta"),  // all distinct, all bigrams unique
      (2L, "solo"),                    // one token, zero bigrams
      (3L, ""))                        // empty
    val got = TextAnalysis.repetition(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(0L) == ((5L, 0.6, 0.75, false)))  // bigram frac over the limit
    // 3 distinct bigrams of 3 -> top 1/3 = 0.3333: short docs exceed the
    // 0.2 default too (the Gopher thresholds target page-length docs)
    assert(got(1L) == ((4L, 0.0, 0.3333, false)))
    assert(got(2L) == ((1L, 0.0, 0.0, true)))
    assert(got(3L) == ((0L, 0.0, 0.0, true)))
  }

  test("collocations: PMI exact on a crafted corpus; minCount prunes; stopwords excluded") {
    // "big data" appears 3×, tokens big/data never apart → strong PMI;
    // "row count" 3× but 'row' also appears alone 3× → weaker PMI;
    // "the" is a stopword and must never appear in any pair
    val d = df(
      (0L, "big data row count the row"),
      (1L, "big data row count the row"),
      (2L, "big data row count the row"))
    val got = TextAnalysis.collocations(d, minCount = 3L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.forall { case (a, b, _, _) => a != "the" && b != "the" })
    // per doc tokens: [big, data, row, count, row] → bigrams:
    // big-data, data-row, row-count, count-row; ×3 docs each
    val nu = 15.0; val nb = 12.0
    def pmi(cab: Long, ca: Long, cb: Long) = math.log((cab / nb) / ((ca / nu) * (cb / nu)))
    val exp = Map(
      ("big", "data") -> pmi(3, 3, 3),
      ("data", "row") -> pmi(3, 3, 6),
      ("row", "count") -> pmi(3, 6, 3),
      ("count", "row") -> pmi(3, 3, 6))
    assert(got.length == exp.size)
    got.foreach { case (a, b, cab, p) =>
      assert(cab == 3L, s"($a,$b) count")
      assert(math.abs(p - exp((a, b))) < 1e-12, s"($a,$b) pmi $p vs ${exp((a, b))}")
    }
    // ordering: big-data (rarest unigrams) must outrank the row pairs
    assert((got.head._1, got.head._2) == (("big", "data")))
  }

  test("vocabDrift: Δp and JSD exact on a crafted pair; vanished/new terms covered") {
    val oldD = df((0L, "cat cat dog"))
    val newD = df((0L, "cat dog dog bird"))
    val got = TextAnalysis.vocabDrift(oldD, newD, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // p: cat 2/3, dog 1/3, bird 0; q: cat 1/4, dog 1/2, bird 1/4
    val p = Map("cat" -> 2.0 / 3, "dog" -> 1.0 / 3, "bird" -> 0.0)
    val q = Map("cat" -> 0.25, "dog" -> 0.5, "bird" -> 0.25)
    val jsd = Seq("cat", "dog", "bird").map { t =>
      val m = (p(t) + q(t)) / 2.0
      0.5 * ((if (p(t) > 0) p(t) * math.log(p(t) / m) else 0.0) +
             (if (q(t) > 0) q(t) * math.log(q(t) / m) else 0.0))
    }.sum
    assert(got.keySet == Set("cat", "dog", "bird"))
    assert(got("cat")._1 == 2L && got("cat")._2 == 1L)
    assert(got("bird")._1 == 0L && got("bird")._2 == 1L, "new term must appear with c_old=0")
    Seq("cat", "dog", "bird").foreach { t =>
      assert(math.abs(got(t)._3 - (q(t) - p(t))) < 1e-12, s"$t dp")
      assert(math.abs(got(t)._4 - jsd) < 1e-12, s"$t jsd")
    }
    // ranking by |Δp|: cat (5/12) first, bird (1/4), dog (1/6)
    val ordered = TextAnalysis.vocabDrift(oldD, newD, k = 10)
      .collect().map(_.getString(0)).toList
    assert(ordered == List("cat", "bird", "dog"))
    // a fully vanished term ends with c_new=0 and negative dp
    val v = TextAnalysis.vocabDrift(df((0L, "zap zap")), df((0L, "pow")), k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(v("zap") == ((2L, 0L, -1.0)) && v("pow") == ((0L, 1L, 1.0)))
  }

  test("surprisal: closed-form unigram cross-entropy on a two-doc corpus") {
    import spark.implicits._
    // doc 1 = "a a b", doc 2 = "c": cf(a)=2, cf(b)=1, cf(c)=1, C=4
    val postings = Seq(("a", 1L, 2L), ("b", 1L, 1L), ("c", 2L, 1L))
      .toDF("term", "doc_id", "tf")
    val docStats = Seq((1L, 3L), (2L, 1L)).toDF("doc_id", "dl")
    val got = TextAnalysis.surprisal(postings, docStats).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val h1 = -(2.0 * math.log(2.0 / 4.0) + 1.0 * math.log(1.0 / 4.0)) / 3.0
    val h2 = -math.log(1.0 / 4.0)
    assert(math.abs(got(1L) - h1) < 1e-12)
    assert(math.abs(got(2L) - h2) < 1e-12)
    // repetitive (frequent-token) doc scores BELOW the rare-token doc
    assert(got(1L) < got(2L))
  }

  test("chunk: BERT-striding starts, short last chunk, full coverage, empty doc") {
    // 5 tokens, window 3, stride 2: starts 0 and 2 (start 4 is dropped —
    // the chunk at 2 already reached the end)
    val d = df((0L, "t0 t1 t2 t3 t4"), (1L, ""), (2L, "x1 x2 x3"))
    val got = TextAnalysis.chunk(d, window = 3, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val d0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.toSeq == Seq((0L, 0L, 0L, 3L, "t0 t1 t2"), (0L, 1L, 2L, 3L, "t2 t3 t4")))
    // empty doc: one empty chunk keeps the doc representable
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 0L, "")))
    // exact-window doc: a single chunk, no redundant tail
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L, "x1 x2 x3")))
    // coverage property: every token position of doc 0 appears in a chunk
    val covered = d0.flatMap { case (_, _, pos, n, _) => pos until (pos + n) }.toSet
    assert(covered == (0L until 5L).toSet)
  }

  test("qualityQuantileGate: exact per-source threshold from the histogram; ties kept") {
    import spark.implicits._
    import graft.pipeline.Curation
    // a: q .9 .8 .7 .6 (n=4, 500‰ → cum≥2 → thr .8); b: .5 .5 .1 (thr .5, both ties)
    val docs = Seq((1L, "a", 0.9), (2L, "a", 0.8), (3L, "a", 0.7), (4L, "a", 0.6),
      (10L, "b", 0.5), (11L, "b", 0.5), (12L, "b", 0.1)).toDF("doc_id", "source", "q")
    val got = Curation.qualityQuantileGate(docs, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(1L, 2L, 10L, 11L))
    assert(got(1L) == 0.8 && got(10L) == 0.5)
    // permille 1000 keeps everything; permille 0 keeps only top ties
    assert(Curation.qualityQuantileGate(docs, 1000).count() == 7)
    assert(Curation.qualityQuantileGate(docs, 0).collect()
      .map(_.getLong(0)).toSet == Set(1L, 10L, 11L))
  }

  test("llrKeywords: closed-form G² on a 2×2 contingency; gate drops non-overrepresented") {
    import spark.implicits._
    // focus doc 1 (repo f): x×3 y×1; rest doc 2 (repo r): y×3 z×1
    // → x: k11=3 k12=0 (overrep); y: 1·4 > 3·4 false; z: 0 > 4 false
    val postings = Seq(("x", 1L, 3L), ("y", 1L, 1L), ("y", 2L, 3L), ("z", 2L, 1L))
      .toDF("term", "doc_id", "tf")
    val docRepo = Seq((1L, "f"), (2L, "r")).toDF("doc_id", "repo")
    val got = TextAnalysis.llrKeywords(postings, docRepo, "f").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 1L && r.getString(1) == "x"
      && r.getLong(2) == 3L && r.getLong(3) == 0L)
    // nf=nr=4, n=8, row1=3: G² = 2·(3·ln(3/1.5) + 0 + 1·ln(1/2.5) + 4·ln(4/2.5))
    val exp = 2.0 * (3.0 * math.log(2.0) + math.log(0.4) + 4.0 * math.log(1.6))
    assert(math.abs(r.getDouble(4) - exp) < 1e-12)
  }

  test("bigramSurprisal: closed-form MLE on a crafted corpus; <2-token docs absent") {
    val d = df((1L, "x y z"), (2L, "x y"), (3L, "y w"), (4L, "x"))
    // c(x y)=2, c(y z)=1, c(y w)=1; heads: c(x ·)=2, c(y ·)=2
    val got = TextAnalysis.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 has no bigrams
    assert(got(1L)._1 == 2L)
    assert(math.abs(got(1L)._2 - (-(math.log(2.0 / 2.0) + math.log(1.0 / 2.0)) / 2.0)) < 1e-12)
    assert(math.abs(got(2L)._2 - 0.0) < 1e-12)          // x y is x's only bigram shape... c_ab=2, c_a=2
    assert(math.abs(got(3L)._2 - math.log(2.0)) < 1e-12) // y w: 1 of y's 2
    // word-order signal: the doc with the unusual continuation scores higher
    assert(got(3L)._2 > got(2L)._2)
  }

  test("BPE merges: known arg-max sequence on a crafted corpus ≡ scalar twin") {
    import graft.textan.Bpe
    // words: aaab ×2, ab ×1 → step1 (a,a,4), step2 (a,b,3), step3 (aa,ab,2)
    val d = df((1L, "aaab aaab ab"))
    val got = Bpe.merges(d, steps = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
    assert(got.toSeq == Bpe.mergesS(Map("aaab" -> 2L, "ab" -> 1L), 3))
    // overlap rule: 'aaaa' merges (a,a) to TWO non-overlapping 'aa's
    val g2 = Bpe.merges(df((1L, "aaaa aaaa ab")), steps = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).sortBy(_._1)
    assert(g2.toSeq == Bpe.mergesS(Map("aaaa" -> 2L, "ab" -> 1L), 2))
    assert(g2.head == ((1L, "a", "a", 6L))) // 3 adjacent pairs × 2 words
    assert(g2(1) == ((2L, "aa", "aa", 2L))) // the two non-overlapping halves
    // exhaustion: single-char vocabulary stops early
    assert(Bpe.merges(df((1L, "x y z")), steps = 5).count() == 0L)
  }

  test("BPE encode: train→encode round-trip; counts ≡ scalar; merges only shrink") {
    import graft.textan.Bpe
    // merges learned on this corpus: (a,a) (a,b) (aa,ab) — see test above
    val d = df((1L, "aaab aaab ab"), (2L, "ab ba"), (3L, "zzz"))
    val m = Bpe.merges(df((1L, "aaab aaab ab")), steps = 3).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.encode(d, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // aaab: a a a b → aa a b → aa ab → aaab = 1 token; ab: → ab = 1
    assert(got(0) == ((1L, 3L, 3L)))
    // ab → 1; ba: no ' b  a ' merge learned → stays 2
    assert(got(1) == ((2L, 2L, 3L)))
    // zzz untouched by the learned merges → 3 char tokens
    assert(got(2) == ((3L, 1L, 3L)))
    // zero merges = pure character tokenization
    val raw = Bpe.encode(d, Nil).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(raw == Map(1L -> 10L, 2L -> 4L, 3L -> 3L))
    // each applied merge never increases any doc's token count
    val m1 = Bpe.encode(d, m.take(1)).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val m2 = Bpe.encode(d, m.take(2)).collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val m3 = got.map(r => (r._1, r._3)).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(raw(id) >= m1(id) && m1(id) >= m2(id) && m2(id) >= m3(id), s"doc $id")
    }
  }

  test("topicTag: BIGINT argmax votes, topic-asc ties, no-hit docs absent") {
    import spark.implicits._
    val post = Seq(("join", 1L, 3L), ("stream", 1L, 1L),
      ("stream", 2L, 2L), ("batch", 2L, 1L),
      ("join", 3L, 2L), ("scan", 3L, 2L),   // exact tie joins/scans -> joins
      ("other", 4L, 9L)).toDF("term", "doc_id", "tf")
    val topics = Map("joins" -> Seq("join", "merge"),
      "streaming" -> Seq("stream", "batch"), "scans" -> Seq("scan"))
    val got = TextAnalysis.topicTag(post, topics).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("joins", 3L)))
    assert(got(2L) == (("streaming", 3L)))
    assert(got(3L) == (("joins", 2L))) // tie 2=2 -> topic asc
    assert(!got.contains(4L))          // seedless doc stays unlabeled
  }

  test("boilerplate: within-site template shingles flagged, unique text not") {
    import spark.implicits._
    val footer = "copyright acme corp all rights reserved"
    val docs = Seq(
      (0L, s"alpha beta gamma $footer", "s1"),
      (1L, s"delta epsilon zeta $footer", "s1"),
      (2L, "unique content here nothing shared at all", "s2"))
      .toDF("doc_id", "content", "repo")
    val got = TextAnalysis.boilerplate(docs, n = 3, minSiteDf = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 9 tokens → 7 shingles; the 4 fully inside the footer recur on both
    // s1 docs, the 3 straddling unique text do not
    assert(got(0L) == ((7L, 4L)))
    assert(got(1L) == ((7L, 4L)))
    assert(got(2L) == ((5L, 0L))) // 7 tokens → 5 shingles, none recur
  }

  test("readability: vowel-group syllables, min-1 floor, closed-form Flesch") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps"), (2L, "rhythm zz"))
      .toDF("doc_id", "content")
    val got = graft.textan.TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: 5 words, 1 pseudo-sentence, 5 syllables (one vowel run each)
    val f1 = BigDecimal(206.835 - 1.015 * 5.0 - 84.6 * 1.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((5L, 1L, 5L, f1)))
    // doc 2: "rhythm" has the y run, "zz" has none -> min-1 floor
    assert(got(2L)._1 == 2L && got(2L)._3 == 2L)
  }

  test("cdcChunks: cuts replay the scalar rolling-fingerprint rule") {
    import spark.implicits._
    import graft.textan.TextHash
    val toks = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet")
    val docs = Seq((1L, "en", toks.mkString(" "))).toDF("doc_id", "lang", "content")
    val got = graft.textan.TextAnalysis.cdcChunks(docs, mask = 4).collect().head
    // scalar recompute: cut at i >= 2 iff hash(3-shingle ending at i) % 4 == 0
    val cuts = (2 until toks.size).filter(i =>
      TextHash.tokenHash(s"${toks(i - 2)} ${toks(i - 1)} ${toks(i)}") % 4 == 0)
    val nChunks = cuts.size + 1 - (if (cuts.contains(toks.size - 1)) 1 else 0)
    // chunk lengths: boundaries AFTER each cut position
    val bounds = cuts.map(_ + 1).filter(_ < toks.size)
    val lens = (bounds :+ toks.size).zip(0 +: bounds).map { case (e, s0) => e - s0 }
    assert(got.getLong(1) == toks.size.toLong)
    assert(got.getLong(2) == lens.size.toLong)
    assert(got.getLong(3) == lens.max.toLong)
    assert(lens.size >= 2, "fixture must actually cut (mask=4)")
  }
}
