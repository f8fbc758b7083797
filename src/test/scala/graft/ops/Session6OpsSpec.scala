package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Session-6 surface: Misra–Gries exact heavy hitters, BPE first-merge
  * pair stats, bitmask source overlap, postings-skew report — property
  * tests against local brute-force twins on random corpora.
  */
class Session6OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").toSeq.filter(_.length > 2).map(_.toLowerCase)

  private def randomCorpus(seed: Int, nDocs: Int, vocab: Int)
      : Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val words = (0 until vocab).map(i => f"w${i}%03d")
    (0L until nDocs).map { id =>
      // Zipf-ish skew: low word ids much more likely
      val n = 3 + rnd.nextInt(30)
      val text = Seq.fill(n) {
        val r = rnd.nextDouble()
        words((r * r * vocab).toInt.min(vocab - 1))
      }.mkString(" ")
      (id, text, s"src${rnd.nextInt(4)}")
    }
  }

  // --- heavy hitters --------------------------------------------------------

  test("heavyHitters == brute-force top-k across random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val rows = randomCorpus(seed, nDocs = 300, vocab = 120)
      val docs = rows.toDF("doc_id", "text", "source")
      // brute force over the same tokenizer
      val counts = rows.flatMap(r => tok(r._2))
        .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      val expect = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val got = Vocab.heavyHitters(docs, k = 20, capacity = 256)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"seed $seed")
    }
  }

  test("heavyHitters certificate raises instead of approximating") {
    // near-uniform corpus + tiny capacity: the k-th count cannot clear
    // N/(m+1), so the operator must refuse rather than return a guess
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map { id =>
      (id, Seq.fill(20)(f"t${rnd.nextInt(5000)}%04d").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      Vocab.heavyHitters(docs, k = 20, capacity = 4).collect()
    }
    assert(e.getMessage.contains("MG certificate"))
  }

  test("misraGries survivor set contains every item above n/(m+1)") {
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(5000)(s"x${(rnd.nextDouble() * rnd.nextDouble() * 50).toInt}")
    val m = 16
    val (surv, n) = Vocab.misraGries(stream.iterator, m)
    assert(n == 5000L)
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    exact.foreach { case (t, c) =>
      if (c > n / (m + 1)) assert(surv.contains(t), s"lost heavy item $t ($c)")
    }
  }

  // --- BPE pair stats -------------------------------------------------------

  test("bpePairs == brute-force dictionary-weighted pair counts") {
    val rows = randomCorpus(5, nDocs = 200, vocab = 80)
    val docs = rows.toDF("doc_id", "text", "source")
    val vocab = rows.flatMap(r => tok(r._2))
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val pairW = vocab.toSeq.flatMap { case (t, c) =>
      (0 until t.length - 1).map(i => (t.substring(i, i + 2), c))
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val expect = pairW.toSeq.sortBy { case (p, w) => (-w, p) }.take(20)
    val got = Vocab.bpePairs(docs, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  // --- source overlap -------------------------------------------------------

  test("sourceOverlap == brute-force shingle-set algebra") {
    val rows = randomCorpus(9, nDocs = 250, vocab = 60)
    val docs = rows.toDF("doc_id", "text", "source")
    val bySource = rows.groupBy(_._3).view.mapValues(
      _.flatMap(r => Dedup.ngrams(r._2, 3)).toSet).toMap
    val sources = bySource.keys.toSeq.sorted
    val expect = (for {
      a <- sources.indices; b <- (a + 1) until sources.length
    } yield {
      val (sa, sb) = (sources(a), sources(b))
      val (na, nb) = (bySource(sa).size.toLong, bySource(sb).size.toLong)
      val c = (bySource(sa) & bySource(sb)).size.toLong
      (sa, sb, na, nb, c)
    }).toSeq
    val got = Overlap.sourceOverlap(docs, shingle = 3)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // ratio spot-check on the first pair
    val r0 = Overlap.sourceOverlap(docs).orderBy("source_a", "source_b")
      .collect().head
    val (na, nb, c) = (r0.getLong(2), r0.getLong(3), r0.getLong(4))
    val j = BigDecimal(c.toDouble / (na + nb - c).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(5) == j)
  }

  test("sourceOverlap zero-shingle source yields 0 counts, null ratios") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta gamma", "a"),
      (2L, "x y", "b") // every token <= 2 chars -> no shingles
    ).toDF("doc_id", "text", "source")
    val r = Overlap.sourceOverlap(docs).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(!r.isNullAt(5)) // union nonempty -> jaccard 0.0
    assert(r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 0.0) // containment_a: 0/4
    assert(r.isNullAt(7)) // containment_b: 0/0 undefined
  }

  // --- index skew -----------------------------------------------------------

  test("indexSkew == brute-force df/share computation") {
    val rows = randomCorpus(13, nDocs = 220, vocab = 70)
    val docs = rows.toDF("doc_id", "text", "source")
    val stop = graft.analysis.Analyzer.defaultStopWords
    val df = rows.flatMap(r => tok(r._2).filterNot(stop).distinct.map((_, r._1)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.size.toLong) }
    val total = df.values.sum.toDouble
    val top = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = top.zipWithIndex.map { case ((t, c), i) =>
      val cum = top.take(i + 1).map(_._2).sum
      (i + 1, t, c, r6(c / total), r6(cum / total))
    }
    val got = Reports.indexSkew(docs, k = 20).orderBy("rk").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect)
  }
}
