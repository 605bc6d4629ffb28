package graft

import graft.pipeline.Classify
import org.scalatest.funsuite.AnyFunSuite

class ClassifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions.col

  test("nb: closed-form Laplace scores; OOV dropped; absent pairs vanish") {
    import spark.implicits._
    // train: d1(A)="x x y", d2(B)="y z" → tc A=3 B=2, V=3, priors ln(1/2)
    val trainPost = Seq(("x", 1L, 2L), ("y", 1L, 1L), ("y", 2L, 1L), ("z", 2L, 1L))
      .toDF("term", "doc_id", "tf")
    val labels = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "label")
    val (model, cs) = Classify.nbTrain(trainPost, labels)
    // apply d3="x y w": w is OOV → dlv=2
    val applyPost = Seq(("x", 3L, 1L), ("y", 3L, 1L), ("w", 3L, 1L))
      .toDF("term", "doc_id", "tf")
    val sc = Classify.nbScores(applyPost, model, cs).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    // score(A) = ln½ + ln3 + ln2 − 2·ln6 = ln(1/12); B absent-x pair vanishes
    assert(math.abs(sc("A") - math.log(1.0 / 12.0)) < 1e-12)
    assert(math.abs(sc("B") - math.log(1.0 / 25.0)) < 1e-12)
    val pred = Classify.nbPredict(applyPost, model, cs).collect()
    assert(pred.length == 1 && pred.head.getString(1) == "A")
  }

  test("nb: exact score tie broken by label asc") {
    import spark.implicits._
    // symmetric classes: A="x", B="y" → tc=1 each, V=2, denom=ln3 both
    val trainPost = Seq(("x", 1L, 1L), ("y", 2L, 1L)).toDF("term", "doc_id", "tf")
    val labels = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "label")
    val (model, cs) = Classify.nbTrain(trainPost, labels)
    val applyPost = Seq(("x", 9L, 1L), ("y", 9L, 1L)).toDF("term", "doc_id", "tf")
    val sc = Classify.nbScores(applyPost, model, cs).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(sc("A") == sc("B"))
    assert(Classify.nbPredict(applyPost, model, cs)
      .collect().head.getString(1) == "A")
  }

  test("nb: apply plan broadcasts the class stats (model side stays small)") {
    import spark.implicits._
    val trainPost = Seq(("x", 1L, 1L), ("y", 2L, 1L)).toDF("term", "doc_id", "tf")
    val labels = Seq((1L, "A"), (2L, "B")).toDF("doc_id", "label")
    val (model, cs) = Classify.nbTrain(trainPost, labels)
    val applyPost = Seq(("x", 9L, 1L)).toDF("term", "doc_id", "tf")
    val plan = Classify.nbScores(applyPost, model, cs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"class-stats grid must broadcast:\n$plan")
  }

  test("nb: doc with zero in-vocab tokens is absent from scores") {
    import spark.implicits._
    val trainPost = Seq(("x", 1L, 1L)).toDF("term", "doc_id", "tf")
    val labels = Seq((1L, "A")).toDF("doc_id", "label")
    val (model, cs) = Classify.nbTrain(trainPost, labels)
    val applyPost = Seq(("q", 5L, 3L)).toDF("term", "doc_id", "tf")
    assert(Classify.nbScores(applyPost, model, cs).filter(col("doc_id") === 5L).count() == 0)
  }

  test("lrTrain: step-1 closed form (sigma(0)=0.5) and separation after 2 full-batch steps") {
    import spark.implicits._
    // d1 (y=1) carries only term a; d2 (y=0) only term b — separable
    val posts = Seq((1L, "a", 2L), (2L, "b", 2L)).toDF("doc_id", "term", "tf")
    val labels = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "y")
    val w1 = graft.pipeline.Classify.lrTrain(posts, labels, nDocs = 2, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // w_a = lr * (2 * (1 - 0.5)) / 2 = 0.005; w_b = lr * (2 * -0.5) / 2
    assert(math.abs(w1("a") - 0.005) < 1e-15 && math.abs(w1("b") + 0.005) < 1e-15)
    val p = graft.pipeline.Classify.lrScores(posts,
        graft.pipeline.Classify.lrTrain(posts, labels, nDocs = 2, iters = 2))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scalar recompute of step 2
    def sg(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val p1 = sg(2.0 * 0.005); val p2 = sg(2.0 * -0.005)
    val wa = 0.005 + 0.01 * (2.0 * (1.0 - p1)) / 2.0
    val wb = -0.005 + 0.01 * (2.0 * (0.0 - p2)) / 2.0
    assert(math.abs(p(1L) - sg(2.0 * wa)) < 1e-15)
    assert(math.abs(p(2L) - sg(2.0 * wb)) < 1e-15)
    assert(p(1L) > 0.5 && p(2L) < 0.5) // moving toward the labels
  }

  test("lrScores: a doc with no in-vocabulary terms scores sigma(0) = 0.5") {
    import spark.implicits._
    val posts = Seq((1L, "zz", 1L)).toDF("doc_id", "term", "tf")
    val w = Seq(("a", 0.7)).toDF("term", "w")
    val p = graft.pipeline.Classify.lrScores(posts, w).collect().head.getDouble(1)
    assert(p == 0.5)
  }
}
