package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.analysis.Analyzer
import graft.functions.Udfs

/** Native expression == UDF chain == pure-Scala analyzer; codegen path
  * exercised (whole-stage codegen enabled in the shared session) and the
  * SQL registration works.
  */
class CodeAnalyzeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    "He was running searches for the longest rivers",
    "C++ x2 żółć", "", "return FooBar42 a.b_c-1 caresses ponies",
    "The Quick brown-Fox; jumps_over!! 12ab x")

  test("expression == UDF == plain analyzer (stemmed and not)") {
    GraftExtensions.register(spark)
    val df = texts.toDF("text")
    val viaSql = df.selectExpr("code_analyze(text) AS t").as[Seq[String]].collect()
    val viaSqlNoStem = df.selectExpr("code_analyze(text, false) AS t").as[Seq[String]].collect()
    val viaUdf = df.select(Udfs.analyze(col("text"))).as[Seq[String]].collect()
    val plain = texts.map(Analyzer.default.analyze(_).toSeq)
    val plainNoStem = texts.map(Analyzer.noStem(Analyzer.defaultStopWords).analyze(_).toSeq)
    assert(viaSql.toSeq == plain)
    assert(viaSql.toSeq == viaUdf.toSeq)
    assert(viaSqlNoStem.toSeq == plainNoStem)
  }

  test("expression stays inside whole-stage codegen (no ScalaUDF node)") {
    GraftExtensions.register(spark)
    val df = texts.toDF("text").selectExpr("explode(code_analyze(text)) AS term")
      .groupBy("term").count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.count() > 0)
    // null input handled by nullSafeEval path
    val withNull = Seq[String](null, "running rivers").toDF("text")
      .selectExpr("code_analyze(text) AS t").collect()
    assert(withNull(0).isNullAt(0))
    assert(withNull(1).getSeq[String](0) == Seq("run", "river"))
  }
}
