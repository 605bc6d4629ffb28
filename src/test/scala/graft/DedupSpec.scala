package graft

import graft.dedup.Dedup
import graft.textan.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // planted corpus: 0/1 exact dups; 2 near-dup of 0 (one token changed);
  // 3 unrelated; 4 short (no 3-shingles)
  def docs = {
    import spark.implicits._
    Seq(
      (0L, "r", "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "r", "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "r", "en", "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "r", "en", "one two three four five six seven eight nine ten"),
      (4L, "r", "en", "hi yo")
    ).toDF("doc_id", "repo", "lang", "content")
  }

  test("exact dedup groups identical content, keeps min doc_id") {
    val got = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("shingles: distinct ordered 3-grams; short docs have none") {
    val sh = Dedup.shingles(docs).collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(0L).contains("alpha beta gamma"))
    assert(byDoc(0L).size == 8) // 10 tokens -> 8 shingles
    assert(!byDoc.contains(4L))
    assert(byDoc(0L) == byDoc(1L))
  }

  test("ngram Jaccard finds exact pair (1.0) and near pair, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // docs 0 and 2 share 7 of their 8 shingles each: jaccard = 7/9
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) < 1.0)
    assert(math.abs(pairs((0L, 2L)) - 7.0 / 9.0) < 1e-12)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containment catches subset-duplication that Jaccard misses") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val host = quote + " one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val d = Seq(
      (0L, "r", "en", quote),
      (1L, "r", "en", host),
      (2L, "r", "en", "unrelated words entirely different content here now")
    ).toDF("doc_id", "repo", "lang", "content")
    // doc 0 has 3 shingles, ALL present in doc 1 -> containment 1.0,
    // but jaccard = 3 / |union| is far below any near-dup threshold
    val cont = Dedup.containmentPairs(d, threshold = 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cont.get((0L, 1L)).contains(1.0), s"got $cont")
    assert(!cont.keys.exists { case (a, b) => a == 2L || b == 2L })
    val jac = Dedup.ngramJaccardPairs(d, threshold = 0.8).collect()
    assert(!jac.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "jaccard at 0.8 must MISS the quoted-subset pair containment catches")
  }

  test("minhash signature identical for identical docs, differs for unrelated") {
    val sig = Dedup.minhashSignatures(docs, numHashes = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(3L))
  }

  test("minhash LSH recovers the exact-dup pair with verified jaccard") {
    val pairs = Dedup.minhashLshPairs(docs, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0))
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("incremental minhash ≡ full LSH restricted to pairs touching the batch") {
    import org.apache.spark.sql.functions.col
    // full run over the union: ground truth
    val full = Dedup.minhashLshPairs(docs, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // batch = docs 1 and 2 (both near-dups of 0); old tier = 0, 3, 4
    val isNew = col("doc_id") === 1L || col("doc_id") === 2L
    val incr = Dedup.minhashIncrementalPairs(docs, isNew,
        numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val wantKeys = full.keySet.filter { case (a, b) =>
      Set(1L, 2L).contains(a) || Set(1L, 2L).contains(b) }
    assert(incr.keySet == wantKeys, s"got ${incr.keySet} want $wantKeys")
    wantKeys.foreach(k => assert(incr(k) == full(k), s"jaccard mismatch at $k"))
    // cross-tier pair (old 0, new 1) MUST be present: the batch probe sees
    // the old tier's bands
    assert(incr.contains((0L, 1L)))
    // an old-only pair never appears, even if it is a true near-dup pair
    assert(incr.keySet.forall { case (a, b) =>
      Set(1L, 2L).contains(a) || Set(1L, 2L).contains(b) })
  }

  test("canonical: highest-quality member wins, NOT min id; members counted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (7L, 0.5), (9L, 0.1))
      .toDF("doc_id", "q")
    val got = Dedup.canonical(clustered, quality).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // cluster 1: quality tie 2 vs 3 at 0.9 -> doc_id asc picks 2 (min id 1 LOSES)
    assert(got(1L) == ((2L, 0.9, 3L)), s"got ${got(1L)}")
    assert(got(7L) == ((7L, 0.5, 2L)))
    // dedup audit: docs removed = Σ(members - 1)
    assert(got.values.map(_._3 - 1).sum == 3L)
  }

  test("simhash: identical docs equal; hamming to near-dup small; pure-scala twin agrees") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    val ham02 = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val ham03 = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(ham02 < ham03, s"near-dup hamming $ham02 should be < unrelated $ham03")
    // scalar twin of the definition (62 bits from two 31-bit mixes)
    def simhashS(terms: Seq[String]): Long = {
      val tf = terms.groupBy(identity).view.mapValues(_.size).toMap
      def h62(t: String): Long = {
        val h0 = TextHash.tokenHash(t)
        TextHash.mix(100, h0) + (TextHash.mix(101, h0) << 31)
      }
      (0 until Dedup.simhashBits).map { j =>
        val v = tf.map { case (t, f) =>
          if (((h62(t) >> j) & 1) == 1) f.toLong else -f.toLong
        }.sum
        if (v > 0) 1L << j else 0L
      }.sum
    }
    docs.collect().foreach { r =>
      val terms = graft.analyze.Analyzer.analyze(r.getString(2), r.getString(3))
      assert(sh(r.getLong(0)) == simhashS(terms), s"doc ${r.getLong(0)}")
    }
  }

  test("simhashPairs banded candidates are exact for hamming <= 3") {
    val all = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == brute)
  }

  test("contamination: benchmark-shingle fraction found in train docs") {
    import spark.implicits._
    val train = Seq(
      (10L, "r", "en", "alpha beta gamma delta epsilon zeta"), // superset of bench 0
      (11L, "r", "en", "one two three four five six"))
      .toDF("doc_id", "repo", "lang", "content")
    val bench = Seq(
      (0L, "r", "en", "alpha beta gamma delta"), // 2 shingles, both in train 10
      (1L, "r", "en", "seven eight nine ten"))   // disjoint
      .toDF("doc_id", "repo", "lang", "content")
    val got = Dedup.contamination(train, bench)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map((10L, 0L) -> ((2L, 1.0)))) // full containment; no other pair
    // threshold filters
    assert(Dedup.contamination(train, bench, threshold = 1.1).count() == 0)
    // single-pass split variant agrees with the two-table form
    val all = train.unionByName(bench)
    val gotSplit = Dedup.contaminationSplit(all, col("doc_id") < 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(gotSplit == got)
    // physical pin: the bench side is broadcast (train shingles never
    // shuffle for the audit join, even with stale stats) — asserted on the
    // lazy plan (eager=false; the default eagerly checkpoints + releases
    // the shingle caches, which erases the plan)
    val plan = Dedup.contaminationSplit(all, col("doc_id") < 10, eager = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast bench side:\n$plan")
    // broadcastBench = false drops the hint (a caller whose "bench" side is
    // a large split opts back into the planner's choice / shuffle join)
    val plan2 = Dedup.contaminationSplit(all, col("doc_id") < 10, eager = false,
        broadcastBench = false)
      .queryExecution.analyzed.toString // hints are erased later in planning
    assert(!plan2.contains("Hint"), s"hint must be absent:\n$plan2")
  }

  test("embedding cosine pairs: identical vectors cos=1, orthogonal excluded") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f), 0),
      (1L, Array(1.0f, 0.0f, 1.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.1f, 0.9f), 0)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingPairs(emb, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(pairs((0L, 1L)) - 1.0) < 1e-12)
    assert(pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("apss: prefix-filtered pairs ≡ scalar brute force; prefixes strictly shorter") {
    import spark.implicits._
    // randomized sparse tf vectors over a vocab with BOTH hot and rare
    // terms, so prefixes actually cut (a doc's suffix holds its hot terms)
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 't').map(_.toString)
    val rows = (0L until 40L).flatMap { d =>
      val nTerms = 3 + rnd.nextInt(6)
      // hot terms (a,b,c) appear often; the rest are rare
      val terms = Seq.fill(nTerms)(
        if (rnd.nextBoolean()) vocab(rnd.nextInt(3)) else vocab(3 + rnd.nextInt(17)))
      terms.distinct.map(t => (d, t, (1 + rnd.nextInt(5)).toLong))
    }
    val post = rows.toDF("doc_id", "term", "tf")
    val thr = 0.8
    val got = Dedup.apssPairs(post, thr).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // scalar brute force
    val byDoc = rows.groupBy(_._1).view.mapValues { ts =>
      val nrm = math.sqrt(ts.map(x => x._3.toDouble * x._3).sum)
      ts.map(x => x._2 -> x._3 / nrm).toMap
    }.toMap
    val ids = byDoc.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = byDoc(ids(i)); b = byDoc(ids(j))
      sim = a.keySet.intersect(b.keySet).toSeq.map(t => a(t) * b(t)).sum
      if sim >= thr - 1e-12
    } yield ((ids(i), ids(j)), sim)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"$k") }
    // the filter must actually prune: indexed prefix rows < full rows
    val full = post.count()
    val w = post.groupBy("doc_id").agg(org.apache.spark.sql.functions.sqrt(
      sum(col("tf") * col("tf"))).as("nrm"))
    val prefixRows = {
      // recount via the operator's own candidate side: run with threshold
      // high enough that suffixes exist
      import org.apache.spark.sql.expressions.Window
      val dfs = post.groupBy("term").agg(count(lit(1)).as("df"))
      val wN = post.join(w, "doc_id")
        .select(col("doc_id"), col("term"), (col("tf") / col("nrm")).as("w"))
      wN.join(dfs, "term")
        .withColumn("cum", sum("w").over(
          Window.partitionBy("doc_id").orderBy(asc("df"), asc("term"))))
        .withColumn("s", sum("w").over(Window.partitionBy("doc_id")))
        .filter(col("cum") - col("w") <= col("s") - lit(thr) + lit(1e-9))
        .count()
    }
    assert(prefixRows < full, s"prefix $prefixRows !< full $full")
  }

  test("token hash: Column form == pure Scala form (cross-engine determinism root)") {
    import spark.implicits._
    val words = Seq("spark", "a", "tok123", "snake_case", "Zz9")
    val got = words.toDF("w").select(TextHash.tokenHashCol(col("w"))).collect().map(_.getLong(0))
    assert(got.toSeq == words.map(TextHash.tokenHash))
    // pinned value (verified against DuckDB's list_reduce in tools/check.py runs)
    assert(TextHash.tokenHash("spark") == 109638365L)
  }

  /** scalar union-find twin for clusters */
  private def scalarComponents(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(x => x -> find(x)).toMap
  }

  test("clusters ≡ scalar union-find: chain, clique, and singletons-by-absence") {
    import spark.implicits._
    // one 4-chain (7-3-9-12), one triangle (20,21,22), one isolated pair
    val pairs = Seq((7L, 3L), (9L, 3L), (12L, 9L),
      (20L, 21L), (21L, 22L), (20L, 22L), (40L, 41L))
    val got = Dedup.clusters(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scalarComponents(pairs))
    // canonical keep rule: exactly one doc per cluster has doc_id == cluster_id
    assert(got.count { case (d, c) => d == c } == got.values.toSet.size)
    // docs never paired are absent (documented singleton semantics)
    assert(!got.contains(999L))
  }

  test("clusters converges on a long chain (diameter > 2 propagation rounds)") {
    import spark.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1))
    val got = Dedup.clusters(chain.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 31 && got.values.forall(_ == 0L))
  }

  test("clusters pointer-jumping: a chain far longer than maxIter converges (O(log diameter))") {
    import spark.implicits._
    // diameter 200 ≫ maxIter 12: plain min-label propagation would need
    // ~200 rounds and abort; pointer-jumping needs ~log2(200)+slack
    val chain = (0L until 200L).map(i => (i + 1, i)) // reversed order: worst case for min-label
    val got = Dedup.clusters(chain.toDF("a_id", "b_id"), maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("segmentDupStats: corpus-duplicated segments flagged, per-doc fractions exact") {
    import spark.implicits._
    val segs = Seq((1L, "aaa"), (1L, "bbb"), (2L, "aaa"), (2L, "ccc"), (3L, "ddd"))
      .toDF("doc_id", "text")
    val got = Dedup.segmentDupStats(segs, minCount = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
    // minCount=3: nothing is duplicated enough
    val none = Dedup.segmentDupStats(segs, minCount = 3).collect()
    assert(none.forall(_.getLong(2) == 0L))
  }

  test("novelty: first-occurrence fraction by ingestion order; shingle-less docs absent") {
    val got = Dedup.novelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((8L, 8L, 1.0)))   // first copy: all shingles new
    assert(got(1L) == ((8L, 0L, 0.0)))   // exact dup of 0: nothing new
    assert(got(2L) == ((8L, 1L, 0.125))) // near-dup: only the changed tail shingle
    assert(got(3L) == ((8L, 8L, 1.0)))   // unrelated doc
    assert(!got.contains(4L))            // 2 tokens → no 3-shingles
  }

  test("winnowing: window minima ≡ scalar; shared-run guarantee; candidate pairs") {
    import spark.implicits._
    import graft.analyze.Analyzer
    import graft.textan.TextHash
    val (k, w) = (3, 4)
    def scalarFps(text: String): Set[Long] = {
      val toks = Analyzer.rawTokens(text).filterNot(Analyzer.naturalStop)
      val hs = toks.sliding(k).filter(_.size == k)
        .map(s => TextHash.tokenHash(s.mkString(" "))).toVector
      hs.sliding(w).filter(_.size == w).map(_.min).toSet
    }
    // shared run of w + k − 1 = 6 tokens ⇒ guaranteed shared fingerprint
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $run seven eight"),
      (2L, s"nine ten $run eleven"),
      (3L, "completely different words here entirely unrelated content"),
      (4L, "tiny doc")) // < k+w−1 tokens: no full window, no fingerprints
      .toDF("doc_id", "content")
    val got = Dedup.winnowFingerprints(docs, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = Map(1L -> s"one two three $run seven eight",
      2L -> s"nine ten $run eleven",
      3L -> "completely different words here entirely unrelated content")
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == scalarFps(t), s"doc $id")
    }
    assert(!got.contains(4L))
    // the winnowing guarantee: docs 1 and 2 share ≥ 1 fingerprint
    assert((got(1L) intersect got(2L)).nonEmpty)
    assert((got(1L) intersect got.getOrElse(3L, Set.empty)).isEmpty)
    // pairs surface exactly the sharing pair at minShared = 1
    val pairs = Dedup.winnowPairs(Dedup.winnowFingerprints(docs, k, w),
        minShared = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == (got(1L) intersect got(2L)).size.toLong)
  }

  test("mirrorPairs: host-level resemblance finds the mirror farm, not the stranger") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "iota kappa lambda mu nu xi omicron pi"
    val docs = Seq(
      (0L, a, "m1"), (1L, b, "m1"),   // m2 serves the same two pages →
      (2L, a, "m2"), (3L, b, "m2"),   // identical host shingle sets
      (4L, "one two three four five six seven", "other"))
      .toDF("doc_id", "content", "repo")
    val got = Dedup.mirrorPairs(docs, n = 3, threshold = 0.5, maxShingleHosts = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    assert(got.toSeq == Seq(("m1", "m2", 1.0)))
    // hot-shingle prune: cap 1 drops every shared shingle → no candidates
    assert(Dedup.mirrorPairs(docs, n = 3, threshold = 0.0, maxShingleHosts = 1L)
      .collect().isEmpty)
  }
}
