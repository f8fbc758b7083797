package graft.catalyst

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** graft_dot (codegen'd) == the HOF fold == local math, and it stays
  * inside whole-stage codegen.
  */
class DotProductSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("graft_dot == zip_with/aggregate fold == local math (seeded random)") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1L to 50L).map { i =>
      val d = 1 + rnd.nextInt(65)
      (i, Array.fill(d)(rnd.nextDouble() * 2 - 1),
        Array.fill(d)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (i, a, b) =>
      var s = 0.0
      var k = 0
      while (k < a.length) { s += a(k) * b(k); k += 1 }
      val (fast, hof) = got(i)
      // identical fold order -> bit-identical doubles
      assert(fast == s && hof == s, s"id=$i fast=$fast hof=$hof local=$s")
    }
  }

  test("graft_dot is codegen (no ScalaUDF, no higher-order node in plan)") {
    GraftExtensions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(df.head().getDouble(0) == 11.0)
    // null array propagates null; length mismatch folds the common prefix
    val edge = Seq((Array(1.0, 2.0, 9.0), Array(3.0, 4.0)))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"),
        call_function("graft_dot", lit(null).cast("array<double>"), col("b")).as("n"))
      .head()
    assert(edge.getDouble(0) == 11.0 && edge.isNullAt(1))
  }
}
