package graft.stats

import graft.index.InvertedIndex
import graft.io.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics + run-status surfaces of the reference, Spark-shaped:
  *
  *  - per-repo + total pages/lemmas counts (GET /api/statistics,
  *    /root/reference/src/main/java/searchengine/services/
  *    StatisticsServiceImpl.java:30-87) — one rollup query instead of the
  *    reference's hand-looped per-site count + running totals
  *  - site/run status lineage (reference `site` table status mutations,
  *    IndexingServiceImpl.java:95-122,209-238) — replaced by immutable
  *    status rows derived from snapshot manifests: a run is INDEXED when
  *    its manifest committed, INDEXING while absent, FAILED is a run row
  *    with an error payload written by the driver on abort.
  */
object Stats {

  /** grouping-sets rollup: per-repo rows + a total row (repo = 'ALL'). */
  def statistics(corpus: DataFrame): DataFrame = {
    val toks = InvertedIndex.tokens(corpus)
    val pages = corpus.groupBy("repo").agg(count(lit(1)).as("pages"))
    val lemmas = InvertedIndex.termStatsByRepo(toks)
      .groupBy("repo").agg(count(lit(1)).as("lemmas"))
    val per = pages.join(lemmas, "repo")
    // empty corpus: SUM over zero rows is NULL — the total row still reads
    // as (0, 0), never a null count
    val total = per.agg(coalesce(sum("pages"), lit(0L)).as("pages"),
        coalesce(sum("lemmas"), lit(0L)).as("lemmas"))
      .withColumn("repo", lit("ALL")).select("repo", "pages", "lemmas")
    per.select("repo", "pages", "lemmas").union(total)
  }

  /** `statusTime` (driver-supplied commit/abort timestamp) and `lastError`
    * mirror the reference's site.status_time / site.last_error columns
    * (model/Site.java:26-30, surfaced via DetailedStatisticsItem). */
  case class RunStatus(snapshotId: Long, status: String, partitions: Int,
                       rows: Long, bytes: Long, statusTime: Long, lastError: String)

  /** Term facets: the top-`k` terms per repo by per-repo document frequency
    * (the SERP sidebar "refine by" aggregation; beyond the reference, whose
    * statistics stop at counts). Input is `InvertedIndex.termStatsByRepo`
    * output (repo, term, df). The rank-filter-over-row_number shape compiles
    * to a WindowGroupLimit — each repo group keeps a k-row heap, never a
    * full per-repo sort, so a giant repo costs the same as a small one.
    * Ties break df desc → term asc (deterministic cross-engine). */
  def topTermsPerRepo(termStatsByRepo: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    termStatsByRepo
      .withColumn("facet_rank", row_number().over(
        Window.partitionBy("repo").orderBy(desc("df"), asc("term"))).cast("long"))
      .filter(col("facet_rank") <= k)
      .select("repo", "facet_rank", "term", "df")
  }

  /** tf-idf keyword extraction — the top-j most informative terms per doc
    * (wt = tf · ln(N/df), the same weight as Search.mltBuild), the document
    * TAGGING primitive of a training-data pipeline. One postings⋈term_stats
    * join, then the rank filter over row_number compiles to WindowGroupLimit:
    * a j-row heap per doc, never a full per-doc sort — at 100 TB the cost is
    * one shuffle on term plus one on doc_id, both partial-agg free. The
    * weight is a single product per row (no float-sum order hazard), ties
    * break term asc; `minDf` drops hapax noise tags. */
  def keywords(postings: DataFrame, termStats: DataFrame, nDocs: Long,
               j: Int = 5, minDf: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    postings.join(termStats.filter(col("df") >= minDf), "term")
      .select(col("doc_id"), col("term"),
        (col("tf") * log(lit(nDocs.toDouble) / col("df"))).as("wt"))
      .withColumn("kw_rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("wt"), asc("term"))).cast("long"))
      .filter(col("kw_rank") <= j)
      .select(col("doc_id"), col("kw_rank"), col("term"), round(col("wt"), 4).as("wt_r"))
  }

  /** Manifest aux-lineage name of the persisted per-repo term stats. */
  val repoTermStatsAux = "repo_term_stats"

  /** Persist (repo, term, df) — the source relation of facets and per-repo
    * lemma statistics — as an index artifact beside the bucket index
    * (IndexWriter.writeAux). Like champion lists, this is an index-BUILD
    * product: at 100 TB the per-repo df aggregation is a full tokenize +
    * shuffle that must never run on a status-poll or SERP-sidebar path. */
  def persistRepoTermStats(termStatsByRepo: DataFrame, tableDir: String): TableIO.Manifest =
    graft.index.IndexWriter.writeAux(termStatsByRepo, tableDir, repoTermStatsAux)

  /** Cold facets path: top-k terms per repo over the PERSISTED per-repo
    * stats — reads one small aux parquet, zero tokenization, same
    * WindowGroupLimit plan as the in-memory path. */
  def facetsPersisted(spark: SparkSession, tableDir: String, k: Int): DataFrame =
    topTermsPerRepo(graft.index.IndexWriter.readAux(spark, tableDir, repoTermStatsAux), k)

  /** status rows from the snapshot history of an index table dir — the
    * immutable replacement for the reference's in-place status updates.
    * FAILED rows come from the driver-written abort records
    * (TableIO.recordFailure), with the error payload in `lastError`. */
  def runStatus(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val snaps = TableIO.listSnapshots(tableDir)
    val current = TableIO.readCurrent(tableDir).map(_.snapshotId)
    val ok = snaps.flatMap(id => TableIO.readSnapshot(tableDir, id)).map { m =>
      RunStatus(m.snapshotId,
        if (current.contains(m.snapshotId)) "INDEXED" else "SUPERSEDED",
        m.partitions.size, m.partitions.map(_.rows).sum, m.partitions.map(_.bytes).sum,
        m.statusTime, null)
    }
    val failed = TableIO.listFailures(tableDir).map(f =>
      RunStatus(f.snapshotId, "FAILED", 0, 0L, 0L, f.statusTime, f.error))
    (ok ++ failed).toDF()
  }

  /** Skew telemetry over a written index (SURVEY.md §7.4-2 "verify no
    * partition exceeds threshold in metrics"): per-bucket rows/bytes plus
    * the largest single posting blob — hot-term skew shows up here first. */
  def skewReport(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(s"$tableDir/data")
      .groupBy("bucket")
      .agg(count(lit(1)).as("blobs"),
        sum(length(col("bytes"))).as("bytes"),
        max(length(col("bytes"))).as("max_blob_bytes"),
        max(col("numDocs")).as("max_blob_docs"))
      .orderBy(desc("bytes"))

  /** the reference's start-indexing guard: refuse when a run is in flight
    * (IndexingServiceImpl.java:58-65 / SiteRepository.findByStatus). In
    * snapshot terms: a data dir exists whose manifest isn't committed. */
  def indexingInFlight(tableDir: String): Boolean = {
    val dataDir = new java.io.File(s"$tableDir/data")
    dataDir.exists && TableIO.readCurrent(tableDir).isEmpty
  }

  /** Hierarchical facet counts via ROLLUP grouping sets: (repo, lang),
    * (repo), and the grand total in ONE aggregate — Catalyst's Expand
    * produces all three grouping levels from a single scan (vs three
    * scans + a union), and the partial aggregation absorbs each level
    * map-side. Rolled-up dimensions surface as 'ALL'. */
  def facetRollup(corpus: DataFrame): DataFrame =
    corpus.rollup("repo", "lang").agg(count(lit(1)).as("pages"))
      .select(coalesce(col("repo"), lit("ALL")).as("repo"),
        coalesce(col("lang"), lit("ALL")).as("lang"), col("pages"))

  /** Exact document-length quantiles per repo + ALL — the partition-sizing
    * and skew diagnostic: p99/max dl per source decides
    * `spark.sql.files.maxPartitionBytes` and flags the one crawl whose
    * pages are 100× the median before it melts an executor. Exact
    * `percentile` (not approx): dl is one BIGINT per doc, so the exact
    * sort-based aggregate is cheap relative to the index build that
    * produced it, and the answer is deterministic across engines. */
  def lengthQuantiles(docStats: DataFrame, corpus: DataFrame): DataFrame = {
    val dl = docStats.join(corpus.select("doc_id", "repo"), "doc_id")
    def qs(g: org.apache.spark.sql.RelationalGroupedDataset) = g
      .agg(count(lit(1)).as("docs"),
        expr("percentile(dl, array(0.5D, 0.9D, 0.99D))").as("qarr"),
        max("dl").as("max_dl"))
      .select(col("repo"), col("docs"),
        col("qarr").getItem(0).as("p50"),
        col("qarr").getItem(1).as("p90"),
        col("qarr").getItem(2).as("p99"),
        col("max_dl"))
    qs(dl.groupBy("repo"))
      .unionByName(qs(dl.withColumn("repo", lit("ALL")).groupBy("repo")))
  }

  /** Zipf-law fit over the term-frequency distribution: least-squares slope
    * of ln(cf) against ln(rank) for the top-N terms. The slope (≈ −1 for
    * natural text) is the skew forecast — it says how hot the hottest
    * posting lists stay as the corpus grows 100×, which is exactly the
    * number the salting/champion-list thresholds are tuned against.
    * One postings aggregate for cf, a top-N heap, then a 5-number
    * least-squares aggregate (covar/var/avg) over N rows. */
  def zipfFit(postings: DataFrame, topN: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cf = postings.groupBy("term").agg(sum("tf").as("cf"))
    // distributed TakeOrdered cut first; the row_number window then ranks
    // only the surviving ≤ topN rows (never a full-vocabulary single task)
    val ranked = cf.orderBy(desc("cf"), asc("term")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cf"), asc("term"))).cast("long"))
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("cf").cast("double")))
    lsFit(ranked, "n_terms")
  }

  /** shared least-squares-in-log-log aggregate: (n, slope, intercept, r²)
    * over a frame carrying x/y columns — one 5-number aggregate pass */
  private def lsFit(xy: DataFrame, nCol: String): DataFrame =
    xy.agg(count(lit(1)).as(nCol),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"), var_pop(col("y")).as("vy"),
        avg("x").as("mx"), avg("y").as("my"))
      .select(col(nCol),
        (col("cxy") / col("vx")).as("slope"),
        (col("my") - (col("cxy") / col("vx")) * col("mx")).as("intercept"),
        ((col("cxy") * col("cxy")) / (col("vx") * col("vy"))).as("r2"))

  /** Heaps-law fit — vocabulary growth V(N) = K·N^β measured over
    * log-spaced doc-id prefixes: for each threshold t, N(t) = tokens in
    * docs with doc_id < t and V(t) = distinct terms whose FIRST doc_id < t
    * (min(doc_id) per term — no cumulative distinct-count pass). β (≈0.4–
    * 0.6 for natural text) forecasts lexicon size at 100 TB: the
    * dictionary/df-sketch memory budget is K·N^β, and this operator
    * measures K and β instead of guessing them.
    *
    * Scale shape: one per-doc token count, one min-doc aggregate per term,
    * then each side crossed with the (tiny, broadcast) threshold list into
    * a conditional aggregate grouped by threshold — NO global window over
    * docs or terms, so the prefix construction is shuffle-bounded by
    * |thresholds| groups. Thresholds past the corpus end duplicate the
    * saturation point; points with N = 0 or V = 0 are dropped (ln
    * undefined). */
  def heapsFit(tokens: DataFrame,
               thresholds: Seq[Long] = (0 to 16).map(1L << _)): DataFrame = {
    val spark2 = tokens.sparkSession
    import spark2.implicits._
    val th = thresholds.toDF("t")
    val perDoc = tokens.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
    val firstDoc = tokens.groupBy("term").agg(min("doc_id").as("fd"))
    val ns = perDoc.crossJoin(broadcast(th)).groupBy("t")
      .agg(sum(when(col("doc_id") < col("t"), col("cnt")).otherwise(lit(0L))).as("n"))
    val vs = firstDoc.crossJoin(broadcast(th)).groupBy("t")
      .agg(sum(when(col("fd") < col("t"), lit(1L)).otherwise(lit(0L))).as("v"))
    val pts = ns.join(vs, "t")
      .filter(col("n") > 0 && col("v") > 0)
      .withColumn("x", log(col("n").cast("double")))
      .withColumn("y", log(col("v").cast("double")))
    lsFit(pts, "n_points")
  }
}
