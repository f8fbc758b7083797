package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bigram PMI collocations vs a local brute-force twin, plus the
  * min-count threshold and adjacency (never all-pairs) semantics.
  */
class CollocationsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "new york city has new york pizza and new york bagels"),
    (2L, "the big city has big pizza"),
    (3L, "new york again and york new reversed"),
    (4L, "common words common words common words"))

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq

  private def local(minCount: Int, topK: Int): Seq[(String, String, Long, Long, Long, Double)] = {
    val toksAll = corpus.map { case (_, t) => tok(t) }
    val bi = toksAll.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
    val uni = toksAll.flatten.groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }
    val nU = uni.values.sum.toDouble
    val nB = bi.values.sum.toDouble
    bi.toSeq.filter(_._2 >= minCount).map { case ((w1, w2), c) =>
      val micro = math.round(
        math.log(c * nU * nU / (nB * uni(w1) * uni(w2))) * 1e6)
      (w1, w2, c, uni(w1), uni(w2), micro)
    }.sortBy { case (w1, w2, _, _, _, m) => (-m, w1, w2) }.take(topK)
      .map { case (w1, w2, c, c1, c2, m) =>
        (w1, w2, c, c1, c2, BigDecimal(m / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  test("pmiBigrams matches a local brute-force twin (minCount=2)") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, minCount = 2, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === local(2, 10))
  }

  test("property: pmiBigrams == local brute force on random corpora (ties + micro rounding exercised)") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 5) {
      val vocab = (1 to 8).map(i => s"word$i")
      val rows = (1L to 15L).map { id =>
        val n = 2 + rnd.nextInt(12)
        (id, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docs = rows.toDF("doc_id", "text")
      val got = Collocations.pmiBigrams(docs, minCount = 1, topK = 100)
        .as[(String, String, Long, Long, Long, Double)].collect().toSeq

      val toksAll = rows.map { case (_, t) => tok(t) }
      val bi = toksAll.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      val uni = toksAll.flatten.groupBy(identity)
        .map { case (w, xs) => (w, xs.size.toLong) }
      val nU = uni.values.sum.toDouble
      val nB = bi.values.sum.toDouble
      val local = bi.toSeq.map { case ((w1, w2), c) =>
        val micro = math.round(
          math.log(c * nU * nU / (nB * uni(w1) * uni(w2))) * 1e6)
        (w1, w2, c, uni(w1), uni(w2), micro)
      }.sortBy { case (w1, w2, _, _, _, m) => (-m, w1, w2) }.take(100)
        .map { case (w1, w2, c, c1, c2, m) =>
          (w1, w2, c, c1, c2, BigDecimal(m / 1e6)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      assert(got === local, s"trial $trial")
    }
  }

  test("minCount threshold drops rare coincidences") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, minCount = 3, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.forall(_._3 >= 3))
    assert(got.map(r => (r._1, r._2)).contains(("new", "york")))
  }

  test("only ADJACENT pairs count: no bigram spans a document boundary or skips a word") {
    val docs = Seq((1L, "aaa bbb"), (2L, "ccc ddd")).toDF("doc_id", "text")
    val got = Collocations.pmiBigrams(docs, minCount = 1, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got === Set(("aaa", "bbb"), ("ccc", "ddd")))
  }
}
