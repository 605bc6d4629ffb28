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
}
