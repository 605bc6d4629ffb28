package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive crawl frontier (reference SURVEY.md §2.1 S2: the ForkJoin
  * recursive page walker, services/IndexingServiceImpl.java `PageRecursive` —
  * follow links, skip visited, stop at a depth/visited bound) re-expressed
  * as the Spark-native iterative BFS over a link table:
  *
  *   frontier_{d+1} = π_dst(edges ⋈ frontier_d) ∖ visited   (left_anti)
  *
  * Each level is ONE distributed join + anti-join — the thread-pool
  * recursion of the reference becomes data parallelism, and the visited set
  * (the reference's ConcurrentSkipListSet) becomes a table the anti-join
  * maintains without locks. Depths are exact BFS depths (min over paths)
  * because a node enters `visited` the first level it is reached.
  *
  * Scale notes: per level only the NEW frontier is `localCheckpoint`ed —
  * iterative joins otherwise stack lineage until planning cost dominates
  * (classic iterative-Spark pitfall) — while the visited set stays a LAZY
  * union of the checkpointed level frames: the anti-join reads O(|visited|)
  * per level either way, but per-level checkpoint WRITE IO drops from
  * O(|visited|) to O(|next|) (at depth d that is O(edges reached) total
  * instead of O(d·|visited|)). The union plan grows one node per level —
  * bounded by `maxDepth`, which caps the crawl exactly like the
  * reference's depth guard; the loop stops early on an exhausted frontier.
  */
object Crawl {

  /** BFS over edges (src, dst) from `seeds` (doc_id). Returns
    * (doc_id, depth) — depth = first level the crawl reached the doc,
    * seeds at depth 0. */
  def frontier(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    // distinct: a duplicated seed must not surface twice in the output
    // (the level-wise anti-join only guards re-VISITS, not the level-0 rows)
    val level0 = seeds.select(col("doc_id")).distinct()
      .select(col("doc_id"), lit(0L).as("depth")).localCheckpoint(true)
    var levels = List(level0)           // each frame checkpointed once
    var front = level0.select("doc_id")
    var depth = 0L
    while (depth < maxDepth && !front.isEmpty) {
      depth += 1
      val visited = levels.reduce(_ unionByName _) // lazy over pinned frames
      val next = edges.join(front.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id")).distinct()
        .join(visited, Seq("doc_id"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint(true) // cut the growing lineage each level
      levels = levels :+ next
      front = next.select("doc_id")
    }
    levels.reduce(_ unionByName _)
  }

  /** F3 year-sanity predicate (reference ParserForkJoinAction.java:80-92
    * `dontCrazyYear`): a link whose query string carries `year=YYYY` is
    * crawled only when YYYY is within ±1 of the current year; links without
    * a year parameter always pass. `nowYear` is injected (the reference
    * calls `LocalDateTime.now()`; the engine stays wall-clock-free so runs
    * are replayable). Reference-exact on the match (`.+\?.+year=\d{4}.*`,
    * whole-string) and on the in-range rule (`year-1 <= y <= year+1`).
    * Divergence, documented: the reference extracts at the first `year=`
    * occurrence (`indexOf`) and `parseInt` throws out of the filter when it
    * isn't followed by four digits — we extract the leftmost occurrence
    * that IS followed by four digits instead of crashing. */
  def yearSane(link: org.apache.spark.sql.Column, nowYear: Int): org.apache.spark.sql.Column = {
    val matched = link.rlike("^.+\\?.+year=\\d{4}")
    val y = regexp_extract(link, "year=(\\d{4})", 1).cast("int")
    when(!matched, lit(true))
      .otherwise(y.between(nowYear - 1, nowYear + 1))
  }

  /** Recrawl delta: classify every doc of two corpus VERSIONS as added /
    * removed / changed / unchanged by content sha256 — the incremental-crawl
    * primitive that decides the reindex work-list (the reference recrawls a
    * page and delete+reindexes it unconditionally,
    * IndexingServiceImpl.java:244-264; diffing first means unchanged pages
    * cost a hash compare instead of a reindex). `added` + `changed` rows
    * feed [[graft.index.IndexWriter.upsertBuckets]]; `removed` feeds
    * deletes.
    *
    * Scale shape: ONE co-partitioned full-outer join on doc_id carrying
    * 32-byte hashes only — content never crosses the shuffle, so the delta
    * costs O(|old| + |new|) hash+join regardless of document sizes, and the
    * hash columns prune to nothing when both sides persist their sha256
    * column (fromDocuments already carries it). */
  def recrawlDelta(oldCorpus: DataFrame, newCorpus: DataFrame): DataFrame = {
    val a = oldCorpus.select(col("doc_id"), sha2(col("content"), 256).as("_sha_old"))
    val b = newCorpus.select(col("doc_id"), sha2(col("content"), 256).as("_sha_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("_sha_old").isNull, lit("added"))
          .when(col("_sha_new").isNull, lit("removed"))
          .when(col("_sha_old") === col("_sha_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"))
  }

  /** deterministic synthetic link graph over the corpus doc ids (no
    * external data): every doc links to (2i+1) mod N and (3i+7) mod N —
    * branching 2 with cycles, like a real site graph. */
  def syntheticEdges(docs: DataFrame, nDocs: Long): DataFrame = {
    val ids = docs.select(col("doc_id"))
    ids.select(col("doc_id").as("src"), ((col("doc_id") * 2 + 1) % nDocs).as("dst"))
      .unionByName(
        ids.select(col("doc_id").as("src"), ((col("doc_id") * 3 + 7) % nDocs).as("dst")))
  }

  /** URL canonicalization — the crawl-frontier normalizer that keeps one
    * fetch per logical page: strip the fragment (server never sees it),
    * drop tracking parameters (utm_*, gclid, fbclid) repairing the ?/&
    * separators, lowercase the scheme+host (case-insensitive per RFC 3986)
    * while PRESERVING path case (case-sensitive), and trim a trailing
    * slash. Pure codegen'd Column chain — the same RE2-safe regex sequence
    * (no lookaround) is mirrored verbatim in the DuckDB twin, so both
    * engines produce character-identical canonical strings. Order matters:
    * fragment first (a tracking param before '#' must still match `[^&#]*`
    * bounded by the already-removed fragment), tracking second (mid-query
    * `utm_x=1&` collapses leaving the '?' intact; a trailing `[?&]utm_x=…`
    * takes its separator with it), host-lowering third, slash last. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noMid = regexp_replace(noFrag, "(utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*&", "")
    val noTrail = regexp_replace(noMid, "[?&](utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&]*$", "")
    val hostLow = concat(
      lower(regexp_extract(noTrail, "^([A-Za-z]+://[^/?#]*)", 1)),
      regexp_replace(noTrail, "^[A-Za-z]+://[^/?#]*", ""))
    regexp_replace(hostLow, "/$", "")
  }

  /** Canonical-URL dedup: group fetched URLs by their canonical form —
    * (canon, members, keeper) with the keeper = min url_id (first fetch
    * wins). ONE map-only canonicalization pass + one hash aggregate on the
    * canonical string; at frontier scale the aggregate's map-side partials
    * absorb the hot canonical targets (link farms pointing at one page). */
  def urlDedup(urls: DataFrame): DataFrame =
    urls.select(col("url_id"), canonicalUrl(col("url")).as("canon"))
      .groupBy("canon")
      .agg(count(lit(1)).as("members"), min("url_id").as("keeper"))

  /** Politeness scheduler over a fetch frontier: at most ONE fetch per host
    * per time slot (the crawl-delay discipline every crawler owes robots.txt;
    * Heydon & Najork's Mercator, WWW 1999 — public literature; the reference
    * serializes per-site fetches through its per-site ForkJoin task,
    * services/IndexingServiceImpl.java). Each host's URLs are ranked by
    * priority (desc, then path for determinism); rank r fetches in slot r.
    * The output is the dispatch order: (slot, host, path, priority).
    *
    * Scale shape: ONE window partitioned by host — the frontier shuffles
    * once on host, each host's queue sorts locally. A mega-host (one domain
    * with 10^9 queued URLs) makes a fat partition, but the slot assignment
    * is a streaming rank — no buffering beyond the sort spill. The global
    * dispatch ORDER BY is for display; a real fetch loop consumes
    * `WHERE slot = t` per tick, which prunes on the rank. */
  def politeSchedule(frontier: DataFrame, limit: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(desc("priority"), asc("path"))
    frontier.select(col("host"), col("path"), col("priority"))
      .withColumn("slot", row_number().over(w).cast("long"))
      .orderBy(asc("slot"), asc("host"), asc("path"))
      .select("slot", "host", "path", "priority")
      .limit(limit)
  }

  /** Per-site change-rate estimation from one recrawl interval (Cho &
    * Garcia-Molina, TOIT 2003, "Estimating frequency of change" — public
    * literature): under the Poisson change model, observing that fraction
    * c of a site's pages changed over one interval gives the MLE
    * λ̂ = −ln(1 − c) changes/interval — the signal the recrawl scheduler
    * feeds on (a site at λ̂ ≈ 0 can wait; λ̂ ≥ 1 needs every-interval
    * revisits). Pages present in only one snapshot (added/deleted) carry
    * no change observation and drop out of the inner join; a site with
    * EVERY page changed has unbounded λ̂ (c = 1 ⇒ the interval is too long
    * to inform) and reports NULL.
    *
    * Scale shape: one co-partitioned equality join of the two snapshots on
    * doc_id (content equality, never a diff) + one site aggregate. */
  /** robots.txt URL gate, RFC 9309 longest-match semantics (public
    * standard; Koster 1994): among a host's rules whose prefix matches the
    * path, the LONGEST prefix decides; an allow/disallow tie at equal
    * length resolves to ALLOW (§2.2.2); a path no rule matches is allowed.
    * The frontier filters BEFORE fetching — at 100 TB this gate runs on
    * every discovered URL, so it must be a relation, not a per-URL RPC.
    *
    * frontier: (doc_id, repo, path); rules: (repo, prefix, allow ∈ {0,1}).
    * Returns (doc_id, repo, path, allowed).
    *
    * Scale shape: rules tables are tiny per host (broadcast); the match is
    * one prefix-join + a per-URL top-1 window (WindowGroupLimit), then a
    * left join to restore unmatched URLs. */
  def robotsFilter(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(length(col("prefix")).desc, desc("allow"))
    val matched = frontier
      .join(broadcast(rules), frontier("repo") === rules("repo") &&
        frontier("path").startsWith(rules("prefix")))
      .select(frontier("doc_id"), col("prefix"), col("allow"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("allow"))
    frontier.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("repo"), col("path"),
        coalesce(col("allow"), lit(1L)).as("allowed"))
  }

  def changeRates(old: DataFrame, recrawled: DataFrame): DataFrame = {
    val j = old.select(col("doc_id"), col("repo"), col("content").as("c_old"))
      .join(recrawled.select(col("doc_id"), col("content").as("c_new")), "doc_id")
    j.groupBy("repo")
      .agg(count(lit(1)).as("n_common"),
        sum(when(col("c_old") =!= col("c_new"), lit(1L)).otherwise(lit(0L)))
          .as("n_changed"))
      .withColumn("change_frac_r", round(
        col("n_changed").cast("double") / col("n_common").cast("double"), 4))
      .withColumn("lambda_r",
        when(col("n_changed") === col("n_common"), lit(null).cast("double"))
          .otherwise(round(-log(lit(1.0) -
            col("n_changed").cast("double") / col("n_common").cast("double")), 4)))
  }
}
