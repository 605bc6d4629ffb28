package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 31-ary polynomial string hash mod
  * 2^31−1 (graft.textan.TextHash.tokenHash) with whole-stage codegen.
  *
  * This is the one hot-path scalar where built-ins fall short: the
  * composable form `aggregate(split(s, ''), 0L, (a, c) -> (a*31+ascii(c)) %
  * p)` allocates a per-character array and evaluates the lambda through the
  * interpreted HigherOrderFunction path for every row — for MinHash over
  * billions of shingles that dominates the profile. This expression emits a
  * tight Java loop over the UTF-16 chars instead (identical values for all
  * BMP input; corpus tokens are ASCII by construction after Analyzer
  * normalization).
  *
  * Kept value-identical with TextHash.tokenHash (pure Scala) and the DuckDB
  * list_reduce form — asserted in TokenHashExprSpec.
  */
case class TokenHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % 2147483647L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashExpr =
    copy(child = newChild)
}

object TokenHashExpr {
  def token_hash(c: Column): Column =
    ColumnBridge.column(TokenHashExpr(ColumnBridge.expression(c)))

  /** register as SQL function `token_hash` */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "token_hash", exprs => TokenHashExpr(exprs.head))
}
