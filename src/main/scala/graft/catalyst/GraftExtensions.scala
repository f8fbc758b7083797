package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SparkSessionExtensions installer:
  * `--conf spark.sql.extensions=graft.catalyst.GraftExtensions` makes
  * `code_analyze(text[, stem])` available to plain SQL; `register(spark)`
  * does the same on an already-running session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.functionDescription)
    ext.injectFunction(GraftExtensions.dotDescription)
  }
}

object GraftExtensions {

  private def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(e) => CodeAnalyze(e, stem = true)
    case Seq(e, Literal(b: Boolean, _)) => CodeAnalyze(e, stem = b)
    case _ => throw new IllegalArgumentException(
      "code_analyze(text[, stem: boolean literal])")
  }

  private def buildDot(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => DotProduct(a, b)
    case _ => throw new IllegalArgumentException("graft_dot(a, b)")
  }

  val functionDescription: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("code_analyze"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CodeAnalyze].getName, "code_analyze"),
    build)

  val dotDescription: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, "graft_dot"),
    buildDot)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "code_analyze", build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", buildDot, "built-in")
  }
}
