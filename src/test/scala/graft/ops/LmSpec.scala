package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bigram-interpolated LM score vs a local brute-force twin, plus the
  * word-order sensitivity the unigram score lacks and the short-doc edge.
  */
class LmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq

  private def local(rows: Seq[(Long, String)]): Map[Long, (Long, Option[Double])] = {
    val toksAll = rows.map { case (id, t) => (id, tok(t)) }
    val cb = toksAll.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
    val uc = toksAll.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }
    val total = uc.values.sum.toDouble
    toksAll.map { case (id, ts) =>
      val pairs = ts.zip(ts.drop(1))
      if (pairs.isEmpty) id -> ((0L, None))
      else {
        val micro = pairs.groupBy(identity).map { case ((w1, w2), xs) =>
          val c = xs.size
          math.round(c.toDouble * math.log10(
            0.75 * cb((w1, w2)) / uc(w1) + 0.25 * uc(w2) / total) * 1e6)
        }.sum
        val mean = BigDecimal(micro.toDouble / 1e6 / pairs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> ((pairs.size.toLong, Some(mean)))
      }
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox naps beside the lazy dog"),
    (3L, "dog lazy the beside naps fox brown quick the"), // same words, scrambled
    (4L, "tiny"), // one analyzed token -> no bigrams
    (5L, "a b c")) // all tokens <3 chars -> no tokens at all

  test("bigramLogProb matches a local brute-force twin") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Lm.bigramLogProb(docs)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === local(corpus))
  }

  test("word order matters: a scrambled twin of a fluent doc scores lower") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Lm.bigramLogProb(docs)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(2L).get > got(3L).get,
      s"fluent ${got(2L)} should beat scrambled ${got(3L)}")
  }

  test("documents with fewer than two tokens emit n_bigrams=0 and null score") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Lm.bigramLogProb(docs)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(4L) === ((0L, None)))
    assert(got(5L) === ((0L, None)))
  }
}
