package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.search.RelationalBM25

/** Round-5 surface: containment near-dup, the composite quality filter,
  * retention cohorts, and source-diversified top-k — each checked against
  * a local brute-force twin on planted fixtures.
  */
class Round5OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- containment --------------------------------------------------------

  test("containmentPairs finds snippet-inside-page pairs symmetric Jaccard misses") {
    val snippet = "distributed inverted index construction with delta varint compressed posting blocks"
    val filler = (1 to 40).map(i => s"unrelated filler sentence number$i about other topics entirely").mkString(" ")
    val docs = Seq(
      1L -> snippet,
      2L -> s"$filler $snippet $filler", // contains doc 1 verbatim
      3L -> "completely different content with no shared shingles at all here"
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, n = 3, minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 1.0) // every snippet shingle is in the page
    // the same pair is invisible to Jaccard at any useful threshold:
    // |A| / |B| bounds it well below 0.5
    val jac = Dedup.ngramJaccard(docs, n = 3, minJaccard = 0.5).collect()
    assert(jac.isEmpty)
    // brute local twin: containment == |S(A) n S(B)| / min sizes
    val sA = Dedup.ngrams(snippet, 3).toSet
    val sB = Dedup.ngrams(s"$filler $snippet $filler", 3).toSet
    val expected = BigDecimal(sA.intersect(sB).size.toDouble / math.min(sA.size, sB.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pairs.head._3 == expected)
  }

  // --- composite quality filter -------------------------------------------

  test("filterPipeline applies the pinned rule order with integer-exact thresholds") {
    val keepDoc = "the quick brown fox jumps over a lazy dog while many other animals watch from their warm windowsill every single day happily" // >= 20 words, 2 stopwords, varied
    val docs = Seq(
      1L -> "tiny doc",                                            // too_short
      2L -> Seq.fill(25)("ab").mkString(" "),                      // word_len (mean 2)
      3L -> Seq.fill(25)("abc###").mkString(" "),                  // high_symbol
      4L -> (1 to 25).map(i => s"unique$i").mkString(" "),         // few_stopwords
      5L -> ("the a " + Seq.fill(20)("spam").mkString(" ")),       // repetitive
      6L -> keepDoc,                                               // keep
      7L -> ""                                                     // too_short (0 words)
    ).toDF("doc_id", "text")
    val got = TextStats.filterPipeline(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(got(1L) == (false, "too_short"))
    assert(got(2L) == (false, "word_len"))
    assert(got(3L) == (false, "high_symbol"))
    assert(got(4L) == (false, "few_stopwords"))
    assert(got(5L) == (false, "repetitive"))
    assert(got(6L) == (true, ""))
    assert(got(7L) == (false, "too_short"))
    // rule ORDER: a doc that is both too short and stopword-free reports
    // the first failing rule
    val multi = Seq(8L -> "alpha beta gamma").toDF("doc_id", "text")
    val r8 = TextStats.filterPipeline(multi).collect().head
    assert(r8.getString(2) == "too_short")
  }

  // --- retention cohorts ---------------------------------------------------

  test("retentionCohorts == brute-force triangle") {
    val day = 86400L
    def ts(d: Long, s: Long = 0L) = new java.sql.Timestamp((d * day + s) * 1000L)
    // user 1: cohort day 100, active days 100,101,103 (twice on 101)
    // user 2: cohort day 100, active day 100 only
    // user 3: cohort day 101, active days 101,103
    val events = Seq(
      (1L, ts(100)), (1L, ts(101)), (1L, ts(101, 60)), (1L, ts(103)),
      (2L, ts(100, 5)),
      (3L, ts(101)), (3L, ts(103, 7))
    ).toDF("user_id", "ts")
    val got = Events.retentionCohorts(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = Seq(
      (100L, 0L, 2L), (100L, 1L, 1L), (100L, 3L, 1L),
      (101L, 0L, 1L), (101L, 2L, 1L))
    assert(got == expected)
  }

  // --- source-diversified top-k --------------------------------------------

  private val divDocs = Seq(
    (1L, "spark shuffle partition merge sort", "a"),
    (2L, "spark shuffle partition merge", "a"),
    (3L, "spark shuffle partition", "a"),
    (4L, "spark shuffle table", "b"),
    (5L, "spark merge table scan", "b"),
    (6L, "table scan merge spark shuffle", "c"),
    (7L, "unrelated content entirely here", "c")
  ).toDF("docId", "content", "source")

  test("topKDiverse == brute-force cap over the full exact ranking") {
    val q = "spark shuffle merge"
    val full = RelationalBM25.topK(divDocs, q, 100, stem = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val srcOf = divDocs.select("docId", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (cap <- Seq(1, 2, 3); k <- Seq(2, 3, 5)) {
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val expected = full.flatMap { case (id, sc) =>
        val s = srcOf(id)
        if (seen.getOrElse(s, 0) < cap) { seen(s) = seen.getOrElse(s, 0) + 1; Some((id, sc, s)) }
        else None
      }.take(k).toSeq
      seen.clear()
      val got = RelationalBM25.topKDiverse(divDocs, q, k, perSource = cap, stem = false)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      assert(got == expected, s"cap=$cap k=$k")
      assert(got.groupBy(_._3).values.forall(_.size <= cap))
    }
    // a cap that never binds reproduces plain topK exactly
    val plain = RelationalBM25.topK(divDocs, q, 5, stem = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val unbound = RelationalBM25.topKDiverse(divDocs, q, 5, perSource = 100, stem = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(unbound == plain)
  }
}
