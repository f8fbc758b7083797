package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Session-4 surface: SemDeDup, canonical-doc selection, histogram-CDF
  * quality buckets, and the ordered funnel — planted fixtures + local
  * brute-force twins.
  */
class Session4OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- SemDeDup -----------------------------------------------------------

  test("semDedup drops exact copies to the min id and keeps distinct vectors") {
    // ids 1, 3, 7 share one vector; everything else is a distinct one-hot
    // (pairwise cosine 0 between one-hots, 1.0 within the copy group)
    val shared = Array.tabulate(16)(i => if (i < 2) 0.7 else 0.1)
    val vecs = (0L until 12L).map { id =>
      val v =
        if (id == 1L || id == 3L || id == 7L) shared
        else Array.tabulate(16)(i => if (i == id.toInt) 1.0 else 0.0)
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(vecs, tau = 0.99, nlist = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got.size == 12) // every vector labelled exactly once
    // min-id copy survives; higher-id copies are dropped at cosine 1.0
    assert(got(1L)._3 == 1)
    for (id <- Seq(3L, 7L)) {
      assert(got(id)._3 == 0, s"copy $id should be dropped")
      assert(got(id)._2 == 1.0)
    }
    // identical vectors must share a cluster (deterministic argmax)
    assert(Seq(1L, 3L, 7L).map(got(_)._1).distinct.size == 1)
    // all one-hots are keeps (no over-tau neighbour anywhere)
    for (id <- (0L until 12L) if id != 3L && id != 7L)
      assert(got(id)._3 == 1, s"one-hot $id should survive")
  }

  // --- canonical docs ------------------------------------------------------

  test("canonicalDocs keeps the longest member of each cluster, ties to min id") {
    val body = "distributed inverted index construction with compressed " +
      "posting blocks and block max metadata for wand pruning at scale " +
      "plus salted repartition merge phases for stopword heavy terms"
    val docs = Seq(
      (1L, body, 100L),
      (2L, body, 250L), // same text, longest -> the canonical member
      (3L, body, 100L),
      (4L, "completely unrelated singleton content with its own shingles here", 50L))
      .toDF("doc_id", "text", "n_chars")
    val got = Components.canonicalDocs(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got.size == 4)
    // the three copies form one component rooted at min id 1, canonical 2
    for (id <- Seq(1L, 2L, 3L)) {
      assert(got(id)._1 == 1L)
      assert(got(id)._2 == 2L, s"doc $id canonical should be the longest (2)")
    }
    assert(got(2L)._3 == 1 && got(1L)._3 == 0 && got(3L)._3 == 0)
    // singleton is its own canonical
    assert(got(4L) == ((4L, 4L, 1)))
  }

  test("canonicalDocs length ties break to the smallest doc_id") {
    val body = "identical duplicated body text repeated across the pair of " +
      "documents with enough alnum tokens for three gram shingles always"
    val docs = Seq((7L, body, 90L), (5L, body, 90L))
      .toDF("doc_id", "text", "n_chars")
    val got = Components.canonicalDocs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(5L) == 5L && got(7L) == 5L)
  }

  // --- quality buckets ------------------------------------------------------

  test("qualityBuckets: monotone in score, unscored for <2 tokens, all labelled") {
    // repetitive docs score high under the self-trained bigram LM; docs of
    // unique tokens score low — a spread corpus across the terciles
    val docs = (0L until 30L).map { id =>
      val text =
        if (id < 10) ("alpha beta " * 20).trim // high-prob repeated bigram
        else if (id < 20)
          (0 until 40).map(j => s"tok${id}x$j").mkString(" ") // unique bigrams
        else ("gamma delta epsilon " * 10).trim // middle family
      (id, text)
    } :+ ((30L, "solo")) // single token -> no bigram -> unscored
    val df = docs.toDF("doc_id", "text")
    val got = Lm.qualityBuckets(df).collect()
      .map(r => (r.getLong(0),
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1), r.getString(2))))
      .toMap
    assert(got.size == 31)
    assert(got(30L)._2 == "unscored")
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val scored = got.collect { case (id, (s, b)) if b != "unscored" => (s, rank(b)) }
    // bucket rank must be monotone non-increasing in score
    for (Seq((s1, r1), (s2, r2)) <- scored.toSeq.sortBy(-_._1).sliding(2))
      assert(r1 <= r2, s"score $s1 -> bucket $r1 vs $s2 -> $r2")
    assert(scored.map(_._2).toSet == Set(0, 1, 2)) // all three terciles hit
  }

  // --- funnel ---------------------------------------------------------------

  test("funnel counts strictly-ordered step completion per user") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      // u1: full ordered funnel
      (1L, ts(1), "signup"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: purchase BEFORE its click -> stops at step 2
      (2L, ts(1), "signup"), (2L, ts(2), "purchase"), (2L, ts(3), "click"),
      // u3: never signed up -> not in the funnel at all
      (3L, ts(1), "click"), (3L, ts(2), "purchase"),
      // u4: signup only
      (4L, ts(5), "signup"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, "signup", 3L, 1.0),
      (2, "click", 2L, 0.666667),
      (3, "purchase", 1L, 0.333333)))
  }

  test("funnel requires strict time order within a user") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // click at exactly the signup instant does not count (strict >)
    val events = Seq((1L, ts(1), "signup"), (1L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Events.funnel(events).collect().map(r => r.getLong(2)).toSeq
    assert(got == Seq(1L, 0L, 0L))
  }
}
