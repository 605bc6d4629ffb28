package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over the inverted index — the classical
  * bag-of-words classifier (Manning, Raghavan & Schütze, IIR §13.2 — public
  * literature) that LLM data pipelines use as the cheap quality/domain
  * filter (the GPT-3 and CCNet pipelines gate web documents with exactly
  * this kind of linear bag-of-words model before anything expensive runs).
  *
  * Everything is expressed relationally so both halves scale:
  *
  *  - TRAIN is one postings⋈label aggregate. The model is the
  *    (label, term) count matrix — bounded by vocabulary × #classes, NOT
  *    by corpus size, so at 100 TB it is the small side of every
  *    downstream join.
  *  - APPLY never materializes a doc × class score for absent terms: with
  *    Laplace add-one smoothing, ln P(t|c) = ln(ctf+1) − ln(T_c + V), and
  *    the second part does not depend on t — so the per-(doc,class) score
  *    folds into  prior_c + Σ_t tf·ln(ctf+1) − dl_v·ln(T_c + V)  where
  *    only terms PRESENT in both the doc and the class contribute to the
  *    sum (ln(0+1) = 0 — absent pairs vanish algebraically, no
  *    densification). Out-of-vocabulary tokens are dropped, the standard
  *    multinomial-NB apply rule; dl_v counts in-vocab tokens only.
  *
  * Scale shape of apply: one semi-join against the vocab (broadcastable),
  * one equi-join postings⋈model on term fanning each posting out to at
  * most #classes rows, a (doc, class) partial aggregate, and a
  * #classes-wide grid join — per-doc cost O(dl · classes), independent of
  * corpus size. The argmax is a WindowGroupLimit-shaped top-1.
  */
object Classify {

  /** Train: docLabel = (doc_id, label). Returns
    *  - model: (label, term, ctf, lw = ln(ctf + 1))
    *  - classStats: (label, prior_ln = ln(n_c/N), denom_ln = ln(T_c + V))
    */
  def nbTrain(postings: DataFrame, docLabel: DataFrame): (DataFrame, DataFrame) = {
    val ctf = postings.join(docLabel, "doc_id")
      .groupBy("label", "term").agg(sum("tf").as("ctf"))
    val model = ctf.withColumn("lw", log(col("ctf").cast("double") + 1.0))
    val totals = ctf.groupBy("label").agg(sum("ctf").as("tc"))
    val vocab = ctf.agg(countDistinct("term").as("v"))
    val priors = docLabel.groupBy("label").agg(count(lit(1)).as("nc"))
    val n = docLabel.agg(count(lit(1)).as("n"))
    val classStats = totals.join(priors, "label")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(n))
      .select(col("label"),
        log(col("nc").cast("double") / col("n").cast("double")).as("prior_ln"),
        log((col("tc") + col("v")).cast("double")).as("denom_ln"))
    (model, classStats)
  }

  /** Apply: per-doc scores for every class. Returns
    * (doc_id, label, score) — dense over classes, sparse over terms. */
  def nbScores(postings: DataFrame, model: DataFrame,
               classStats: DataFrame): DataFrame = {
    val vocab = model.select("term").distinct()
    val inVocab = postings.join(vocab, Seq("term"), "left_semi")
    val dlv = inVocab.groupBy("doc_id").agg(sum("tf").as("dlv"))
    val contrib = inVocab
      .join(model.select("term", "label", "lw"), Seq("term"))
      .groupBy("doc_id", "label")
      .agg(sum(col("tf").cast("double") * col("lw")).as("s"))
    dlv.crossJoin(broadcast(classStats))
      .join(contrib, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("prior_ln") + coalesce(col("s"), lit(0.0))
          - col("dlv").cast("double") * col("denom_ln")).as("score"))
  }

  /** Argmax per doc, ties by label asc: (doc_id, label, score). */
  def nbPredict(postings: DataFrame, model: DataFrame,
                classStats: DataFrame): DataFrame =
    nbScores(postings, model, classStats)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("score"), asc("label"))))
      .filter(col("rn") === 1).drop("rn")

  /** Binary logistic regression over the bag-of-words, trained with
    * FULL-BATCH gradient descent (the distributed-determinism point:
    * per-example SGD is order-dependent and therefore irreproducible on a
    * shuffled cluster — the batch gradient is one aggregate, identical at
    * any parallelism up to float summation order, which the 4dp gate
    * absorbs). This is the second linear text filter beside NB — NB is
    * generative/count-based, LR is discriminative and the standard
    * fastText-style quality-classifier shape.
    *
    *   w⁰ = 0;   w^{i+1}_t = w^i_t + lr · (Σ_d tf_{td}·(y_d − σ(w^i·x_d))) / N
    *
    * The w⁰ = 0 step degenerates to σ = 0.5 exactly — both engines start
    * from the same closed form. Every iteration is: one postings⋈weights
    * join co-partitioned on term → per-doc dot product → σ → one per-term
    * gradient aggregate. The weight relation is vocabulary-sized (the
    * broadcast side of every join) and localCheckpointed so the iteration
    * chain does not grow the plan.
    *
    * labels: (doc_id, y) with y ∈ {0.0, 1.0}. Returns (term, w). */
  def lrTrain(postings: DataFrame, labels: DataFrame, nDocs: Long,
              iters: Int = 2, lr: Double = 0.01): DataFrame = {
    require(iters >= 1)
    // iteration 1 in closed form: sigma(0) = 0.5
    var w = postings.join(labels, "doc_id")
      .groupBy("term")
      .agg((lit(lr) * sum(col("tf") * (col("y") - lit(0.5))) / lit(nDocs.toDouble)).as("w"))
      .localCheckpoint(true)
    for (_ <- 2 to iters) {
      val p = lrScores(postings, w)
      val g = postings.join(labels, "doc_id").join(p, "doc_id")
        .groupBy("term").agg(sum(col("tf") * (col("y") - col("p"))).as("g"))
      w = w.join(g, "term")
        .select(col("term"), (col("w") + lit(lr) * col("g") / lit(nDocs.toDouble)).as("w"))
        .localCheckpoint(true)
    }
    w
  }

  /** σ(w·x) per doc: (doc_id, p). Docs whose every term fell outside the
    * weight relation score σ(0) — they stay via the left join. */
  def lrScores(postings: DataFrame, weights: DataFrame): DataFrame = {
    val z = postings.join(weights, Seq("term"), "left")
      .groupBy("doc_id")
      .agg(coalesce(sum(col("tf") * col("w")), lit(0.0)).as("z"))
    z.select(col("doc_id"), (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
  }
}
