package graft

import graft.functions.TokenHashExpr
import graft.textan.TextHash
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The one custom Catalyst Expression: native codegen'd polynomial hash.
  * Must be value-identical with the pure-Scala twin and the built-ins-only
  * HOF form (which the DuckDB oracle mirrors). */
class TokenHashExprSpec extends AnyFunSuite with PropHelper {
  lazy val spark = SparkTestSession.spark

  test("native expression == pure Scala == HOF built-ins form (property)") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forAllG(Gen.listOfN(50, strGen), n = 10) { ss =>
      val df = ss.toDF("s")
      val got = df.select(
        TokenHashExpr.token_hash(col("s")).as("native"),
        TextHash.tokenHashColHof(col("s")).as("hof")).collect()
      got.zip(ss).foreach { case (r, s) =>
        assert(r.getLong(0) == TextHash.tokenHash(s), s"native mismatch for '$s'")
        assert(r.getLong(1) == TextHash.tokenHash(s), s"hof mismatch for '$s'")
      }
    }
  }

  test("works inside higher-order lambdas (fingerprint path)") {
    import spark.implicits._
    val df = Seq("alpha beta gamma").toDF("content").withColumn("doc_id", lit(0L))
    val viaTransform = df.select(
      transform(split(col("content"), " "), t => TextHash.tokenHashCol(t)).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(viaTransform == Seq("alpha", "beta", "gamma").map(TextHash.tokenHash))
  }

  test("registered SQL function token_hash") {
    TokenHashExpr.register(spark)
    val got = spark.sql("SELECT token_hash('spark')").head().getLong(0)
    assert(got == 109638365L)
  }

  test("null-safe and empty-string") {
    import spark.implicits._
    val got = Seq(Some("x"), None, Some("")).toDF("s")
      .select(TokenHashExpr.token_hash(col("s"))).collect()
    assert(got(0).getLong(0) == 'x'.toLong)
    assert(got(1).isNullAt(0))
    assert(got(2).getLong(0) == 0L)
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    import spark.implicits._
    val df = spark.range(100).select(TokenHashExpr.token_hash(col("id").cast("string")).as("h"))
    val hasCodegenSpan = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasCodegenSpan, s"expected codegen span in:\n${df.queryExecution.executedPlan}")
    // and it actually executes through that plan
    assert(df.collect().take(3).map(_.getLong(0)).toSeq ==
      Seq("0", "1", "2").map(TextHash.tokenHash))
  }
}
