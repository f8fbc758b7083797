package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-document TF-IDF keywords vs a local brute-force twin, plus the
  * zero-IDF (term in every doc) and micro-rounding determinism edges.
  */
class KeywordsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple banana common common"),
    (2L, "banana cherry cherry common words"),
    (3L, "apple durian durian durian common"))

  private def localTopK(k: Int): Seq[(Long, String, Long, Double, Int)] = {
    val tok: String => Seq[String] =
      _.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq
    val dt = corpus.flatMap { case (id, t) =>
      tok(t).groupBy(identity).map { case (w, xs) => (id, w, xs.size.toLong) }
    }
    val df = dt.groupBy(_._2).map { case (w, xs) => (w, xs.size.toLong) }
    val n = corpus.size.toDouble
    dt.map { case (id, w, c) =>
      val micro = math.round(c * math.log(n / df(w)) * 1e6)
      (id, w, c, micro)
    }.groupBy(_._1).toSeq.flatMap { case (id, xs) =>
      xs.sortBy { case (_, w, _, m) => (-m, w) }.take(k).zipWithIndex.map {
        case ((_, w, c, m), i) =>
          (id, w, c,
            BigDecimal(m / 1e6).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1)
      }
    }.sortBy(r => (r._1, r._5))
  }

  test("docKeywords matches a local brute-force twin at k=2") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Keywords.docKeywords(docs, topK = 2)
      .select("doc_id", "term", "c", "tfidf", "rnk")
      .as[(Long, String, Long, Double, Int)].collect()
      .sortBy(r => (r._1, r._5))
    assert(got.toSeq === localTopK(2))
  }

  test("a term present in every document scores exactly zero") {
    val docs = corpus.toDF("doc_id", "text")
    val common = Keywords.docKeywords(docs, topK = 5)
      .filter($"term" === "common").select("tfidf").as[Double].collect()
    assert(common.nonEmpty && common.forall(_ === 0.0))
  }

  test("every document emits at most k rows with dense ranks from 1") {
    val docs = corpus.toDF("doc_id", "text")
    val ranks = Keywords.docKeywords(docs, topK = 3)
      .select("doc_id", "rnk").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).sorted.toSeq }
    assert(ranks.forall(r => r == (1 to r.size)))
    assert(ranks.forall(_.size <= 3))
  }
}
