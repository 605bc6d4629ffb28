package graft

import graft.corpus.Corpus
import graft.index.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lemma-frequency-table and page-index-mapping goldens (FIXTURES.md §2):
  * tiny hand-computed corpus, exact rows — the artifacts the north star
  * names (reference `lemma` and `index` tables). */
class IndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 8-doc golden corpus (lang=en => stopset {the, a})
  val golden = Seq(
    (0L, "r0", "en", "spark join the query"),
    (1L, "r0", "en", "spark spark filter"),
    (2L, "r0", "en", "join join join a"),
    (3L, "r1", "en", "query plan"),
    (4L, "r1", "en", "the a the"),          // only stopwords -> dl 0 (absent from docStats)
    (5L, "r1", "en", "spark query join"),
    (6L, "r2", "en", "plan"),
    (7L, "r2", "en", "sparkJoin")            // camelCase -> spark, join
  )

  def goldenDf = {
    import spark.implicits._
    golden.toDF("doc_id", "repo", "lang", "content")
  }

  test("postings (page-index mapping) exact rows") {
    val got = InvertedIndex.postings(InvertedIndex.tokens(goldenDf))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Set(
      (0L, "spark", 1L), (0L, "join", 1L), (0L, "query", 1L),
      (1L, "spark", 2L), (1L, "filter", 1L),
      (2L, "join", 3L),
      (3L, "query", 1L), (3L, "plan", 1L),
      (5L, "spark", 1L), (5L, "query", 1L), (5L, "join", 1L),
      (6L, "plan", 1L),
      (7L, "spark", 1L), (7L, "join", 1L))
    assert(got == want)
  }

  test("term_stats (lemma frequency table) exact rows") {
    val got = InvertedIndex.termStats(InvertedIndex.tokens(goldenDf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = Set(("spark", 4L), ("join", 4L), ("query", 3L), ("plan", 2L), ("filter", 1L))
    assert(got == want)
  }

  test("doc_stats: stopword-only doc has no row; lengths exact") {
    val got = InvertedIndex.docStats(InvertedIndex.tokens(goldenDf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 2L, 5L -> 3L, 6L -> 1L, 7L -> 2L))
  }

  test("per-repo term stats (lemma.site scoping)") {
    val got = InvertedIndex.termStatsByRepo(InvertedIndex.tokens(goldenDf))
      .filter(col("term") === "spark")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got == Set(("r0", 2L), ("r1", 1L), ("r2", 1L)))
  }

  test("generator corpus: sha256 invariant holds per row (input_hint)") {
    val rows = Corpus.generate(spark, nDocs = 200, nRepos = 5)
    val df = rows.toDF().withColumn("sha256", sha2(col("content"), 256))
    assert(Corpus.sha256Violations(df) == 0)
    // and the generator is deterministic across invocations
    val again = Corpus.generateRows(200, 5)
    assert(Corpus.generateRows(200, 5) == again)
  }

  test("assignDocIds equals global row_number over (repo, path, commit)") {
    import org.apache.spark.sql.expressions.Window
    val df = Corpus.generate(spark, nDocs = 300, nRepos = 7).toDF()
    val fast = Corpus.assignDocIds(df).select("repo", "path", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val slow = df.withColumn("doc_id",
        row_number().over(Window.orderBy("repo", "path", "commit")).cast("long") - 1L)
      .select("repo", "path", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fast == slow)
  }

  test("index invariants on sf0.001: df <= N, sum(tf) >= df, dl = sum of tfs") {
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus, cacheTokens = false)
    val n = t.nDocs
    val bad = t.termStats.filter(col("df") > n).count()
    assert(bad == 0)
    val agg = t.postings.groupBy("term")
      .agg(count(lit(1)).as("docs"), sum("tf").as("sumtf"))
      .join(t.termStats, "term")
      .filter(col("docs") =!= col("df") || col("sumtf") < col("df")).count()
    assert(agg == 0)
    val dlMismatch = t.postings.groupBy("doc_id").agg(sum("tf").as("s"))
      .join(t.docStats, "doc_id").filter(col("s") =!= col("dl")).count()
    assert(dlMismatch == 0)
  }

  test("approximate df sketch: bounded relative error vs exact on sf0.001") {
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val toks = InvertedIndex.tokens(corpus)
    val joined = InvertedIndex.termStatsApprox(toks, rsd = 0.05)
      .join(InvertedIndex.termStats(toks), "term")
      .select(col("term"), col("df_approx"), col("df"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    val relErr = joined.map { case (_, a, e) => math.abs(a - e).toDouble / e }
    // rsd = 0.05: every term within 15% (3σ), mean within 5%
    val worst = joined.maxBy { case (_, a, e) => math.abs(a - e).toDouble / e }
    assert(relErr.max <= 0.15, s"worst term $worst")
    assert(relErr.sum / relErr.length <= 0.05, s"mean ${relErr.sum / relErr.length}")
    // small-cardinality exactness: df <= ~100 uses the exact HLL++ sparse path
    joined.filter(_._3 <= 100L).foreach { case (t, a, e) =>
      assert(a == e, s"small-df term $t: approx $a vs exact $e")
    }
  }

  test("lexicon-enabled tokens: 1->N normal-form expansion in the engine path (T4)") {
    import spark.implicits._
    val lex: graft.analyze.Analyzer.Lexicon =
      Map("running" -> Seq("run", "running"), "mice" -> Seq("mouse"))
    val d = Seq((0L, "r", "en", "running mice fast")).toDF("doc_id", "repo", "lang", "content")
    val got = InvertedIndex.tokens(d, lex).select("term").collect().map(_.getString(0)).toSeq
    assert(got == Seq("run", "running", "mouse", "fast"))
    // df counts the expanded forms (reference semantics: lemma table rows)
    val df = InvertedIndex.termStats(InvertedIndex.tokens(d, lex))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("run" -> 1L, "running" -> 1L, "mouse" -> 1L, "fast" -> 1L))
  }
}
