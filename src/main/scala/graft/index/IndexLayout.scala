package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-layout diagnostics: what does the posting-list compression pay
  * for the current docID assignment, and what would it pay if docIDs were
  * reassigned in URL order? Assigning consecutive ids to same-site pages
  * shrinks docID delta-gaps dramatically because pages of one site share
  * vocabulary (Silvestri, ECIR 2007, "Sorting out the document identifier
  * assignment problem" — public literature; the trick behind "sort your
  * corpus by URL before building the index" folklore).
  *
  * The cost model is the EXACT varint byte count of every docID delta-gap
  * in every posting list — the same varint [[PostingCodec]] writes — via
  * pure integer threshold comparisons (no float log), so both engines
  * count identical bytes.
  *
  * Scale shape: the gap computation is a lag window partitioned on term —
  * the same per-term ordering the index build itself materializes (this
  * diagnostic costs one extra pass over postings, nothing more). The
  * URL-order remap uses one global row_number over (repo, path) — a
  * corpus-sized single-partition sort in THIS diagnostic form; the
  * production remap is the ordinary two-phase distributed sort the build
  * already performs (range-partition + per-partition offsets), noted here
  * because the diagnostic is run offline on samples, not per query. */
object IndexLayout {

  /** Hard cap for the single-partition diagnostic sorts in this file
    * ([[remapByUrl]]) and in [[graft.query.Search.faginTaStudy]]: these
    * run a global `row_number` window, which Spark executes on ONE
    * partition — fine offline on samples, a scale-killer if someone
    * points them at a production corpus. The guard counts at most
    * `max + 1` rows (limit-then-count, so the check itself is bounded)
    * and refuses to plan the window beyond the cap. */
  val DiagnosticMaxRows = 2000000L

  /** bounded-cost size guard: scans at most maxRows + 1 rows */
  def requireDiagnosticSize(df: DataFrame, what: String,
                            maxRows: Long = DiagnosticMaxRows): Unit = {
    val n = df.limit((maxRows + 1).min(Int.MaxValue.toLong).toInt).count()
    require(n <= maxRows,
      s"$what is an offline single-partition diagnostic (global sort window); " +
        s"input exceeds maxRows=$maxRows — run it on a hash-sample instead, " +
        s"e.g. .filter(pmod(hash(col(\"doc_id\")), lit(100)) === 0)")
  }

  /** exact LEB128 byte count of a positive BIGINT, by integer thresholds */
  def varintBytes(v: Column): Column =
    when(v < (1L << 7), lit(1L))
      .when(v < (1L << 14), lit(2L))
      .when(v < (1L << 21), lit(3L))
      .when(v < (1L << 28), lit(4L))
      .when(v < (1L << 35), lit(5L))
      .otherwise(lit(6L))

  /** one-row summary of the docID delta-gap varint cost of `postings`
    * (term, doc_id): (variant, n_postings, gap_bytes, bytes_per_posting).
    * First gap per term = docId + 1 (delta from the imaginary −1), every
    * gap ≥ 1 so varint cost is defined. */
  def gapStats(postings: DataFrame, label: String): DataFrame = {
    val w = Window.partitionBy("term").orderBy(asc("doc_id"))
    postings.select(col("term"), col("doc_id"))
      .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1, -1L).over(w))
      .agg(count(lit(1)).as("n_postings"),
        sum(varintBytes(col("gap"))).as("gap_bytes"))
      .select(lit(label).as("variant"), col("n_postings"), col("gap_bytes"),
        round(col("gap_bytes").cast("double") / col("n_postings").cast("double"), 4)
          .as("bytes_per_posting_r"))
  }

  /** URL-order docID remap: (doc_id, new_id) with new_id dense in
    * (repo, path, doc_id) order. Diagnostic form only — guarded by
    * [[requireDiagnosticSize]] (the production remap is the two-phase
    * distributed sort the build performs; see the object docstring). */
  def remapByUrl(corpus: DataFrame, maxRows: Long = DiagnosticMaxRows): DataFrame = {
    requireDiagnosticSize(corpus, "remapByUrl", maxRows)
    corpus.select(col("doc_id"), col("repo"), col("path"))
      .withColumn("new_id", (row_number().over(
        Window.orderBy(asc("repo"), asc("path"), asc("doc_id"))) - 1).cast("long"))
      .select("doc_id", "new_id")
  }

  /** Front-coding study of the term DICTIONARY (Manning IIR §5.2: blocked
    * front coding — consecutive sorted terms share prefixes, so store
    * lcp + suffix and restart every `block` terms so lookup can binary-
    * search block heads). Exact byte model, all integer: a block head
    * costs varint(len) + len; a follower costs varint(lcp) +
    * varint(len − lcp) + (len − lcp). The study is the dictionary-layout
    * counterpart of [[remapStudy]] — it prices the layout before anyone
    * builds it. The rank window is a single ordered pass over the
    * DICTIONARY (vocabulary-sized, ≪ corpus — the same bounded-relation
    * note as the Zipf fit). */
  def frontCodeStudy(dict: DataFrame, label: String, block: Int = 16): DataFrame = {
    require(block >= 1)
    val w = Window.orderBy(asc("term"))
    // sequence(1, 0) would DESCEND in Spark — greatest(·,1) guards the
    // empty-prev first row (substr('',1,1) mismatches, giving lcp 0)
    val lcpExpr = expr(
      """coalesce(array_min(filter(sequence(1, greatest(least(length(prev), length(term)), 1)),
        |  i -> substr(prev, i, 1) != substr(term, i, 1))) - 1,
        |  least(length(prev), length(term)))""".stripMargin)
    val rows = dict.select("term")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", coalesce(lag(col("term"), 1).over(w), lit("")))
      .withColumn("len", length(col("term")).cast("long"))
      .withColumn("lcp", lcpExpr.cast("long"))
      .withColumn("raw_b", varintBytes(col("len")) + col("len"))
      .withColumn("front_b",
        // block heads at rn = 1, block+1, 2·block+1, …: (rn−1) % block == 0
        // is correct for ALL block ≥ 1 (rn % block == 1 is never true when
        // block = 1, which would front-code every term with no restarts)
        when((col("rn") - 1) % block === 0, col("raw_b"))
          .otherwise(varintBytes(col("lcp")) + varintBytes(col("len") - col("lcp"))
            + (col("len") - col("lcp"))))
    rows.agg(count(lit(1)).as("n_terms"),
        sum("raw_b").as("raw_bytes"), sum("front_b").as("front_bytes"))
      .select(lit(label).as("variant"), col("n_terms"), col("raw_bytes"),
        col("front_bytes"),
        round(lit(1.0) - col("front_bytes").cast("double")
          / col("raw_bytes").cast("double"), 4).as("saved_r"))
  }

  /** the study: gap cost under the original ids vs URL-sorted ids */
  def remapStudy(postings: DataFrame, corpus: DataFrame): DataFrame = {
    val remapped = postings.join(remapByUrl(corpus), "doc_id")
      .select(col("term"), col("new_id").as("doc_id"))
    gapStats(postings, "original")
      .unionByName(gapStats(remapped, "url_sorted"))
  }

  /** binary bit length of a positive BIGINT — length of its base-2 string,
    * so ⌊log2 v⌋ + 1 with NO float log: both engines' `bin()` strips
    * leading zeros, making the count integer-exact. */
  def bitLen(v: Column): Column = length(bin(v)).cast("long")

  /** exact Elias γ bit cost of a positive gap: unary length prefix +
    * binary remainder = 2·bitLen − 1 (Elias 1975; Witten/Moffat/Bell
    * "Managing Gigabytes" §3.3 — public literature). */
  def gammaBits(v: Column): Column = lit(2L) * bitLen(v) - 1L

  /** exact Elias δ bit cost: γ-code the bit length, then the bitLen − 1
    * remainder bits — (2·bitLen(L) − 1) + (L − 1) for L = bitLen(gap).
    * δ wins over γ once gaps routinely exceed ~31 (L ≥ 6). */
  def deltaBits(v: Column): Column =
    lit(2L) * bitLen(bitLen(v)) - 1L + bitLen(v) - 1L

  /** Bit-level codec study over the docID delta-gap stream: prices byte-
    * aligned varint (what [[graft.index.PostingCodec]] writes) against
    * Elias γ and δ, under both docID assignments of [[remapStudy]]. The
    * interesting interaction: URL-sorting shrinks gaps, which helps the
    * bit-level codes MORE than varint (varint can't go below 8 bits/gap;
    * γ of gap 1 is a single bit). Same lag-window shape as [[gapStats]] —
    * one extra pass over postings, partitioned on term, no new shuffle
    * beyond the remap join. */
  def codecStudy(postings: DataFrame, corpus: DataFrame): DataFrame = {
    def stats(p: DataFrame, label: String): DataFrame = {
      val w = Window.partitionBy("term").orderBy(asc("doc_id"))
      p.select(col("term"), col("doc_id"))
        .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1, -1L).over(w))
        .agg(count(lit(1)).as("n_postings"),
          sum(varintBytes(col("gap")) * 8L).as("varint_bits"),
          sum(gammaBits(col("gap"))).as("gamma_bits"),
          sum(deltaBits(col("gap"))).as("delta_bits"))
        .select(lit(label).as("variant"), col("n_postings"),
          col("varint_bits"), col("gamma_bits"), col("delta_bits"))
    }
    val remapped = postings.join(remapByUrl(corpus), "doc_id")
      .select(col("term"), col("new_id").as("doc_id"))
    stats(postings, "original").unionByName(stats(remapped, "url_sorted"))
  }

  /** Rice/Golomb coding with a LOCAL per-term parameter (the local Bernoulli
    * model, Witten/Moffat/Bell "Managing Gigabytes" §3.4; Rice 1971 —
    * public literature): k(t) = ⌊log2(mean gap of t)⌋ = bitLen(mean) − 1
    * (mean ≥ 1 since every gap ≥ 1), cost of a gap = unary quotient
    * ((gap−1) >> k) + 1 stop bit + k remainder bits. All-BIGINT: the mean
    * is an integral `div`, the quotient an integral shift — both engines
    * floor identically, so the bit count is hash-exact.
    *
    * Scale shape: one extra per-term aggregate (vocabulary-sized) joined
    * back onto the gap stream co-partitioned on term — the parameter table
    * rides the same shuffle the gap window already pays. */
  def riceStudy(postings: DataFrame, corpus: DataFrame): DataFrame = {
    def stats(p: DataFrame, label: String): DataFrame = {
      val w = Window.partitionBy("term").orderBy(asc("doc_id"))
      val gaps = p.select(col("term"), col("doc_id"))
        .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1, -1L).over(w))
      val ks = gaps.groupBy("term")
        .agg(expr("sum(gap) div count(1)").as("mean_gap"))
        .withColumn("k", bitLen(col("mean_gap")) - 1L)
      gaps.join(ks, "term")
        .withColumn("rice", expr("(gap - 1) div shiftleft(1L, cast(k as int))")
          + 1L + col("k"))
        .agg(count(lit(1)).as("n_postings"),
          sum(varintBytes(col("gap")) * 8L).as("varint_bits"),
          sum(col("rice")).as("rice_bits"))
        .select(lit(label).as("variant"), col("n_postings"),
          col("varint_bits"), col("rice_bits"))
    }
    val remapped = postings.join(remapByUrl(corpus), "doc_id")
      .select(col("term"), col("new_id").as("doc_id"))
    stats(postings, "original").unionByName(stats(remapped, "url_sorted"))
  }

  /** Static index pruning, uniform top-N variant (Carmel et al., SIGIR 2001
    * "Static index pruning for information retrieval systems" — public
    * literature): keep only each term's N highest-tf postings (ties doc_id
    * asc) and measure what the lossy index costs in result quality.
    *
    * Output, one row per variant {original, pruned}:
    *   (variant, n_postings, top10_overlap) — n_postings is the index
    * size, top10_overlap is |top-10(variant) ∩ top-10(original)| for the
    * given conjunctive BM25 query, scored with the ORIGINAL collection
    * statistics (score-preserving pruning: surviving postings score
    * identically, so rank changes come only from dropped evidence).
    *
    * Scale shape: the prune is one row_number window partitioned on term —
    * the same per-term shuffle the index build already materializes; both
    * rankings are k-row relations, so the overlap join is trivial. At
    * 100 TB this is the offline "build the small hot-tier index" job; the
    * tiered-serving counterpart is [[graft.query.Wand]]'s tiered entry. */
  /** Skip-pointer merge-cost model (Witten/Moffat/Bell "Managing
    * Gigabytes" §3.6; Manning/Raghavan/Schütze IIR §2.3 — public
    * literature): intersecting posting lists of lengths m ≤ n costs
    *
    *   linear merge:      m + n            pointer moves
    *   √n skips:          n div k + m·k,   k = ⌊√n⌋  (skip traversal on
    *                      the long list + within-block linear for each of
    *                      the m probes)
    *   galloping search:  2·m·bitlen(n div m)  (exponential probe + binary
    *                      refine per short-list element)
    *
    * All-integer closed forms per query pair (floor-√ via the shared IEEE
    * double sqrt, bitlen via bin() length) — the back-of-envelope every
    * posting-layout decision starts from; dictionary-sized compute. */
  def skipStudy(termStats: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val spark = termStats.sparkSession
    import spark.implicits._
    val p = pairs.toDF("term_a", "term_b")
    val d = termStats.select(col("term"), col("df"))
    p.join(d.select(col("term").as("term_a"), col("df").as("dfa")), "term_a")
      .join(d.select(col("term").as("term_b"), col("df").as("dfb")), "term_b")
      .withColumn("m", least(col("dfa"), col("dfb")))
      .withColumn("n", greatest(col("dfa"), col("dfb")))
      .withColumn("k", floor(sqrt(col("n").cast("double"))).cast("long"))
      .select(col("term_a"), col("term_b"), col("m"), col("n"),
        (col("m") + col("n")).as("cost_linear"),
        (expr("n div k") + col("m") * col("k")).as("cost_skip_sqrt"),
        (lit(2L) * col("m") * bitLen(expr("n div m"))).as("cost_gallop"))
  }

  /** LSM merge-policy write-amplification study (O'Neil et al. 1996,
    * "The log-structured merge-tree"; Lucene's TieredMergePolicy — public
    * literature). The incremental index ([[graft.streaming
    * .IncrementalIndex]]) folds batches; WHICH merge policy it folds with
    * decides how many times a byte is rewritten. Given the batch-size
    * sequence (here: docs per repo in repo order — the natural per-site
    * ingest batches), exact units written under:
    *
    *  - LEVELED: every flush merges into the one accumulated run — batch i
    *    is rewritten by every later flush: written = Σ_i cumsum_i.
    *  - TIERED fanout F: runs merge F-at-a-time per level; batch i is
    *    rewritten by the level-L merge (L ≥ 1) iff i < F^L·(N div F^L) —
    *    a closed integer form, unrolled to F^6 (covers any N < 4096), with
    *    N computed in-engine so both sides evaluate the same predicate.
    *
    * Output: (policy, input_units, written_units, amp_permille) — the
    * write-amplification ratio in integer permille (BIGINT div). The
    * global cumsum window runs over the repo-count-sized batch list, never
    * the corpus. */
  def mergePolicyStudy(corpus: DataFrame, fanout: Int = 4,
                       maxLevels: Int = 6): DataFrame = {
    val sizes = corpus.groupBy("repo").agg(count(lit(1)).as("sz"))
      .withColumn("i", (row_number().over(Window.orderBy(asc("repo"))) - 1).cast("long"))
    val nn = sizes.agg(count(lit(1)).as("nn"))
    val withN = sizes.crossJoin(broadcast(nn))
    val lev = withN
      .withColumn("cum", sum("sz").over(Window.orderBy(asc("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .agg(sum("sz").as("input_units"), sum("cum").as("written_units"))
    val rewrites = (1 to maxLevels).map { l =>
      val f = math.pow(fanout.toDouble, l.toDouble).toLong
      expr(s"CASE WHEN i < $f * (nn div $f) THEN 1 ELSE 0 END")
    }.foldLeft(lit(1L))(_ + _) // the flush itself + one rewrite per level
    val tier = withN.agg(sum("sz").as("input_units"),
      sum(col("sz") * rewrites).as("written_units"))
    def row(df: DataFrame, label: String) =
      df.select(lit(label).as("policy"), col("input_units"), col("written_units"),
        expr("written_units * 1000 div input_units").as("amp_permille"))
    row(lev, "leveled").unionByName(row(tier, s"tiered_f$fanout"))
  }

  def staticPruneStudy(postings: DataFrame, docStats: DataFrame,
                       dfs: Map[String, Long], nDocs: Long, avgDl: Double,
                       n: Int, k: Int): DataFrame = {
    import graft.query.Search
    val w = Window.partitionBy("term").orderBy(desc("tf"), asc("doc_id"))
    val pruned = postings
      .withColumn("keep_rank", row_number().over(w))
      .filter(col("keep_rank") <= n)
      .drop("keep_rank")
    val fullTop = Search.bm25TopK(postings, docStats, dfs, nDocs, avgDl, k)
      .select(col("doc_id"))
    def row(p: DataFrame, label: String): DataFrame = {
      val top = Search.bm25TopK(p, docStats, dfs, nDocs, avgDl, k)
        .select(col("doc_id"))
      val overlap = top.join(fullTop, "doc_id")
        .agg(count(lit(1)).as("top10_overlap"))
      p.agg(count(lit(1)).as("n_postings")).crossJoin(overlap)
        .select(lit(label).as("variant"), col("n_postings"), col("top10_overlap"))
    }
    row(postings, "original").unionByName(row(pruned, "pruned"))
  }
}
