package graft.textan

import graft.analyze.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich, Haddow & Birch 2016 —
  * the tokenizer-training step of an LLM data pipeline): start from the
  * corpus WORD-COUNT table (vocabulary-sized, not instance-sized — the
  * classic BPE optimization), represent each word as its character symbols,
  * and repeatedly (1) count adjacent symbol pairs weighted by word
  * frequency, (2) take the arg-max pair (ties by (a, b) ascending — a total
  * order both engines share), (3) merge every left-to-right non-overlapping
  * occurrence. The returned merge table (step, a, b, cnt) IS the learned
  * tokenizer.
  *
  * Cross-engine exactness: words travel as sentinel-padded, DOUBLE-space-
  * joined symbol strings (` h  e  l  l  o `), so the merge is a plain
  * substring replace of ` a  b ` with ` ab ` — literal, global,
  * left-to-right, non-overlapping in BOTH engines, and the double spacing
  * makes adjacent occurrences share no characters (` a  a  a ` merges to
  * ` aa  a `, exactly the greedy fold). The DuckDB twin unrolls the same
  * steps; the hash gate proves every merge decision identical.
  *
  * Scale shape: per step, ONE pair-count aggregate over the vocabulary
  * (words × counts — bounded by |vocab|, not corpus size), a 1-row arg-max
  * collect, and a map-only replace; per-step localCheckpoint cuts the
  * iterative lineage like pagerank/clusters do. No end-of-word marker
  * (merges may span to whole words) — a documented, engine-shared choice. */
object Bpe {

  /** (step, a, b, cnt) merge table after `steps` merges (fewer if the
    * vocabulary runs out of adjacent pairs). */
  def merges(docs: DataFrame, steps: Int): DataFrame = {
    val spark = docs.sparkSession
    val wc = docs.select(explode(Analyzer.tokensCol(col("content"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val sym0 = concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" "))
    var cur = wc.select(col("n"), sym0.as("s")).localCheckpoint(true)
    val out = scala.collection.mutable.Buffer[(Long, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val arr = split(trim(col("s")), "  ")
      val idxs = when(size(arr) >= 2, sequence(lit(0), size(arr) - 2))
        .otherwise(expr("array()").cast("array<int>"))
      val pairs = cur
        .select(col("n"), explode(transform(idxs, i => struct(
          element_at(arr, i + 1).as("a"), element_at(arr, i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
      val top = pairs.orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        out += ((step.toLong, a, b, cnt))
        cur = cur.select(col("n"),
            replace(col("s"), lit(s" $a  $b "), lit(s" $a$b ")).as("s"))
          .localCheckpoint(true)
        step += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("step", "a", "b", "cnt")
  }

  /** ENCODE under a learned merge table — the inference half of the
    * tokenizer: each word's symbol string folds through the merges IN
    * TRAINING ORDER as the same literal double-space replace used during
    * induction, so train → encode round-trips exactly. The whole chain is
    * ONE map-only nested-replace expression (no joins, no per-merge jobs)
    * evaluated over the DISTINCT-WORD relation — vocabulary-bounded, not
    * corpus-bounded — then joined back to word instances on the word key.
    * Output per doc: (doc_id, n_words, n_bpe) — the token count a context-
    * window budgeter needs, and n_bpe/n_words is the compression the
    * trained vocab achieves. */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(Analyzer.tokensCol(col("content"))).as("w"))
    val sym0 = concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" "))
    val sFinal = merges.foldLeft(sym0) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    val lens = words.select("w").distinct()
      .select(col("w"), size(split(trim(sFinal), "  ")).cast("long").as("ntok"))
    words.join(lens, "w").groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_bpe"))
  }

  /** scalar twin (tests): the same induction over an in-memory corpus */
  def mergesS(words: Map[String, Long], steps: Int): Seq[(Long, String, String, Long)] = {
    var voc = words.map { case (w, n) => (w.map(_.toString).toVector, n) }.toVector
    (1 to steps).iterator.map { step =>
      val counts = voc.flatMap { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) None
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        voc = voc.map { case (syms, n) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
            else acc :+ s
          }
          (merged, n)
        }
        Some((step.toLong, a, b, cnt))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }
}
