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
  }
}

object GraftExtensions {

  private def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(e) => CodeAnalyze(e, stem = true)
    case Seq(e, Literal(b: Boolean, _)) => CodeAnalyze(e, stem = b)
    case _ => throw new IllegalArgumentException(
      "code_analyze(text[, stem: boolean literal])")
  }

  val functionDescription: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("code_analyze"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CodeAnalyze].getName, "code_analyze"),
    build)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "code_analyze", build, "scala_udf")
}
