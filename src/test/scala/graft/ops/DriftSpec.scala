package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Monroe log-odds drift vs a local brute-force twin, plus the sign /
  * symmetry invariants the statistic must satisfy.
  */
class DriftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a", "apple apple banana cherry words common tokens"),
    (2L, "a", "apple apple apple banana common words tokens"),
    (3L, "b", "cherry cherry durian durian common words tokens"),
    (4L, "b", "durian durian durian elderberry common words tokens"),
    (5L, "b", "elderberry cherry common words tokens extra extra"))
    .toDF("doc_id", "source", "text")

  private def local(minCount: Long): Seq[(String, Long, Long, Double, Double)] = {
    val tok: String => Seq[String] =
      _.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq
    val rows = Seq(
      (true, "apple apple banana cherry words common tokens"),
      (true, "apple apple apple banana common words tokens"),
      (false, "cherry cherry durian durian common words tokens"),
      (false, "durian durian durian elderberry common words tokens"),
      (false, "elderberry cherry common words tokens extra extra"))
    val inst = rows.flatMap { case (ia, t) => tok(t).map(ia -> _) }
    val terms = inst.map(_._2).distinct
    val cnt = terms.map { t =>
      (t, inst.count(p => p._1 && p._2 == t).toLong,
        inst.count(p => !p._1 && p._2 == t).toLong)
    }
    val ta = cnt.map(_._2).sum.toDouble
    val tb = cnt.map(_._3).sum.toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    cnt.filter(c => c._2 + c._3 >= minCount).map { case (t, a, b) =>
      val lor = math.log((a + 0.5) / (ta - a + 0.5)) -
        math.log((b + 0.5) / (tb - b + 0.5))
      val z = lor / math.sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5))
      (t, a, b, r6(lor), r6(z))
    }.sortBy(c => (-c._5, c._1))
  }

  private def run(minCount: Long) =
    Drift.logOddsDrift(docs, col("source") === "a", minCount = minCount)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq

  test("matches the local brute-force twin, ordering included") {
    assert(run(1L) == local(1L))
    assert(run(3L) == local(3L)) // minCount drops the singleton tail
  }

  test("slice-exclusive terms carry the extreme z of their side") {
    val got = run(1L)
    val byTerm = got.map(t => t._1 -> t._5).toMap
    // apple only in A -> most positive; durian dominated by B -> negative
    assert(got.head._1 == "apple")
    assert(byTerm("durian") < 0.0)
    // shared-everywhere terms sit near zero, strictly between the extremes
    assert(math.abs(byTerm("common")) < byTerm("apple"))
    assert(math.abs(byTerm("common")) < -byTerm("durian"))
  }

  test("flipping the slice predicate negates lor (within rounding)") {
    val a = run(1L).map(t => t._1 -> t._4).toMap
    val b = Drift.logOddsDrift(docs, col("source") =!= "a", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (t, lor) =>
      assert(math.abs(lor + b(t)) <= 2e-6, s"term $t")
    }
  }
}
