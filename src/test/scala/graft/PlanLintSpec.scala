package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Structural lint over the ENTIRE query surface: every `SparkEntry.queries`
  * entry is planned (not executed) at sf0.001 and its physical plan is
  * checked for the one join shape that is never acceptable at 100 TB —
  * `CartesianProduct`, the non-broadcast all-pairs join. Every deliberate
  * cross join in this engine rides a `broadcast()` hint against a
  * model-sized side (centroid sets, grand-total scalars, threshold rows)
  * and plans as BroadcastNestedLoopJoin; a CartesianProduct appearing
  * anywhere means a hint was lost or a new operator shipped an accidental
  * all-pairs — the kind of regression that passes every value gate at
  * sf0.01 and detonates at scale.
  *
  * The lint also proves every query CONSTRUCTS (analysis + physical
  * planning succeed) against the smallest fixture — a cheap whole-surface
  * smoke that catches schema drift in operators the per-op specs don't
  * reach.
  */
class PlanLintSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("no CartesianProduct anywhere on the query surface") {
    val offenders = ArrayBuffer.empty[String]
    val errors = ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) offenders += name
      } catch {
        case t: Throwable => errors += s"$name: ${t.getClass.getSimpleName} ${t.getMessage}"
      }
    }
    assert(errors.isEmpty, s"queries failed to plan: ${errors.mkString("; ")}")
    assert(offenders.isEmpty,
      s"CartesianProduct in physical plan of: ${offenders.mkString(", ")}")
  }
}
