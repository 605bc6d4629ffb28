package graft.dedup

import graft.analyze.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-span REMOVAL — the ExactSubstr dedup of Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" (public
  * literature), re-expressed relationally: find every token span of length
  * ≥ w repeated anywhere in the corpus (across documents or within one) and
  * REWRITE the content dropping all but the first occurrence
  * (keep-first = minimal (doc_id, pos), deterministic).
  *
  * Where the paper builds one giant suffix array over the concatenated
  * corpus, the Spark-native shape anchors on the w-token shingle at EVERY
  * token position: a maximal duplicated span of length L ≥ w contains
  * exactly L − w + 1 duplicated anchors whose removal ranges
  * [pos, pos + w) overlap and union back to the full span — so merging
  * marked ranges recovers the paper's maximal-match semantics with no
  * suffix array and no extension step.
  *
  * Chain (both engines replay it verbatim):
  *   1. anchors: (doc_id, pos, shingle of w tokens) at every position —
  *      map-only explode of the analyzed token array;
  *   2. first occurrence per shingle = lexicographic min (doc_id, pos),
  *      an ALGEBRAIC aggregate (min of struct) → map-side partial combine,
  *      so a boilerplate shingle with millions of occurrences never
  *      concentrates raw rows on one reducer;
  *   3. every non-first occurrence of a shingle with count > 1 marks
  *      tokens [pos, pos + w) for removal;
  *   4. per doc, the distinct set of marked token indices (the union of
  *      overlapping ranges — islands made implicit) drops out of the
  *      token array via a higher-order filter, and the kept tokens
  *      re-join with single spaces.
  *
  * Scale shape for 100 TB: everything shuffles on the shingle text (step
  * 2/3's groupBy + join — at production scale key it by a 128-bit content
  * hash so the shuffle key is 16 bytes; the string key here keeps the
  * DuckDB twin exact) and on doc_id (step 4 — co-partitioned with the
  * corpus). The only blowup is the w× explode of REMOVED anchor positions
  * in step 3→4, bounded by w · duplicated-fraction; an island-merge window
  * partitioned per doc (sort by pos, running max of range end) removes
  * even that factor if needed — documented, not needed at any tested SF.
  *
  * Reference scope note: the reference engine (Taras281/searchengine) has
  * no training-data dedup at all — this operator comes from the brief's
  * LLM-pipeline requirements, not the reference surface.
  */
object SubstrDedup {

  /** anchor relation: (doc_id, pos, sh) — the w-token shingle starting at
    * every token position of the analyzer's stop-filtered token stream
    * (same tokenization as [[Dedup.shingles]] / the positional index). */
  def anchors(docs: DataFrame, w: Int): DataFrame = {
    require(w >= 2, s"span width w must be >= 2, got $w")
    val toks = Analyzer.termsCol(col("content"), Analyzer.naturalStop)
    // sequence(0, size-w) would count DOWN for size < w — guard to empty
    val idxs = when(size(col("arr")) >= w, sequence(lit(0), size(col("arr")) - w))
      .otherwise(expr("array()").cast("array<int>"))
    docs.select(col("doc_id"), toks.as("arr"))
      .select(col("doc_id"), posexplode(
        transform(idxs,
          i => concat_ws(" ", (0 until w).map(j => element_at(col("arr"), i + j + 1)): _*))))
      .select(col("doc_id"), col("pos"), col("col").as("sh"))
  }

  /** non-first occurrences of duplicated shingles: (doc_id, pos) pairs
    * whose w-token span must be dropped. Keep-first = min (doc_id, pos),
    * computed as an algebraic min-of-struct (skew-proof partial agg). */
  def removals(anch: DataFrame): DataFrame = {
    val firsts = anch.groupBy("sh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("sh"), col("first.doc_id").as("fdoc"), col("first.pos").as("fpos"))
    anch.join(firsts, "sh")
      .filter(!(col("doc_id") === col("fdoc") && col("pos") === col("fpos")))
      .select(col("doc_id"), col("pos"))
  }

  /** The full rewrite: one row per document,
    * (doc_id, n_tokens, n_removed, content_dedup) where content_dedup is
    * the kept tokens re-joined with single spaces (the canonical
    * normalized-text output of an ExactSubstr pass — the original
    * whitespace is not reconstructible from the token stream and no
    * trainer wants it back). Documents with nothing duplicated pass
    * through with n_removed = 0. */
  def rewrite(docs: DataFrame, w: Int): DataFrame = {
    val rmIdx = removals(anchors(docs, w))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (w - 1))).as("idx"))
      .distinct()
    val rmSet = rmIdx.groupBy("doc_id").agg(collect_set(col("idx")).as("rm_idxs"))
    val toks = Analyzer.termsCol(col("content"), Analyzer.naturalStop)
    docs.select(col("doc_id"), toks.as("arr"))
      .join(rmSet, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("arr")).cast("long").as("n_tokens"),
        coalesce(size(col("rm_idxs")), lit(0)).cast("long").as("n_removed"),
        when(col("rm_idxs").isNull, array_join(col("arr"), " "))
          .otherwise(array_join(
            // index-aware higher-order filter: keep tokens whose position
            // is not marked (codegen'd, no UDF)
            filter(col("arr"), (t, i) => !array_contains(col("rm_idxs"), i)),
            " ")).as("content_dedup"))
  }
}
