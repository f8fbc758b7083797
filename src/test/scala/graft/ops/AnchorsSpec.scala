package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Incoming-anchor-term profile vs a local brute-force twin, plus the
  * top-k cut and (cnt desc, term asc) tiebreak determinism.
  */
class AnchorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq

  test("anchorProfile matches a local brute-force on explicit links") {
    val links = Seq(
      (1L, 7L, "Quantum search engines and quantum ranking"),
      (2L, 7L, "quantum indexing of web documents"),
      (3L, 7L, "ranking the quantum web"),
      (4L, 9L, "cats and dogs"),
      (5L, 9L, "dogs eat cats; cats nap"))
      .toDF("src", "dst_host", "anchor")
    val got = Anchors.anchorProfile(links, topK = 2)
      .select("host", "term", "cnt", "rnk")
      .as[(Long, String, Long, Int)].collect().sortBy(r => (r._1, r._4))

    val local = Seq(
      (7L, Seq("Quantum search engines and quantum ranking",
        "quantum indexing of web documents", "ranking the quantum web")),
      (9L, Seq("cats and dogs", "dogs eat cats; cats nap")))
      .flatMap { case (h, as) =>
        val cnt = as.flatMap(tok).groupBy(identity).map { case (t, xs) =>
          (t, xs.size.toLong) }.toSeq
        cnt.sortBy { case (t, c) => (-c, t) }.take(2).zipWithIndex
          .map { case ((t, c), i) => (h, t, c, i + 1) }
      }
    assert(got.toSeq === local.sortBy(r => (r._1, r._4)))
  }

  test("syntheticLinks fan-out is 1 + doc_id % 3 and hosts land in range") {
    val docs = (0L until 20L).map(i => (i, s"body text for document $i"))
      .toDF("doc_id", "text")
    val links = Anchors.syntheticLinks(docs)
      .select("src", "dst_host").as[(Long, Long)].collect()
    val fanOut = links.groupBy(_._1).map { case (s, xs) => (s, xs.length) }
    assert(fanOut === (0L until 20L).map(i => (i, (1 + i % 3).toInt)).toMap)
    assert(links.forall(l => l._2 >= 0 && l._2 < Graphs.HostSpace))
  }

  test("tiebreak: equal counts rank by term ascending") {
    val links = Seq((1L, 5L, "zebra apple zebra apple"))
      .toDF("src", "dst_host", "anchor")
    val got = Anchors.anchorProfile(links, topK = 2)
      .select("term", "rnk").as[(String, Int)].collect().sortBy(_._2)
    assert(got.toSeq === Seq(("apple", 1), ("zebra", 2)))
  }
}
