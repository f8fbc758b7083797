package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Sliding-window chunking vs a local twin: boundary grid, overlap
  * content, short-tail and empty-doc edges.
  */
class ChunksSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq

  test("chunk matches a local sliding-window twin (size=4, stride=3)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two! three, four"),
      (3L, "xy z a b")) // all tokens <3 chars -> zero chunks
      .toDF("doc_id", "text")
    val got = Chunks.chunk(docs, size = 4, stride = 3)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "n_tokens",
        "chunk_text")
      .as[(Long, Int, Int, Int, Int, String)].collect()
      .sortBy(r => (r._1, r._2))

    val local = Seq(1L -> docs.collect()(0).getString(1),
      2L -> "one two! three, four", 3L -> "xy z a b").flatMap {
      case (id, text) =>
        val ts = tok(text); val n = ts.size
        (0 until n by 3).map { st =>
          (id, st / 3, st, math.min(4, n - st), n,
            ts.slice(st, st + 4).mkString(" "))
        }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === local)
    assert(!got.exists(_._1 == 3L)) // empty after tokenization -> no rows
  }

  test("consecutive chunks overlap by size - stride tokens") {
    val docs = Seq((1L, (1 to 20).map(i => f"tok$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Chunks.chunk(docs, size = 8, stride = 5)
      .select("chunk_id", "chunk_text").as[(Int, String)].collect()
      .sortBy(_._1).map(_._2.split(" ").toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(3) === b.take(3))
      case _ =>
    }
  }

  test("every token position is covered by at least one chunk") {
    val docs = Seq((1L, (1 to 53).map(i => f"tok$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val covered = Chunks.chunk(docs, size = 16, stride = 12)
      .select("chunk_start", "chunk_len").as[(Int, Int)].collect()
      .flatMap { case (st, len) => st until (st + len) }.toSet
    assert(covered === (0 until 53).toSet)
  }

  test("property: chunk == local sliding window over random corpora and random (size, stride)") {
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 6) {
      val docs = (1L to 20L).map { id =>
        val n = rnd.nextInt(30) // 0..29 tokens, incl. empty docs
        (id, (1 to n).map(_ => f"w${rnd.nextInt(50)}%03d").mkString(" "))
      }
      val size = 1 + rnd.nextInt(10)
      val stride = 1 + rnd.nextInt(size)
      val got = Chunks.chunk(docs.toDF("doc_id", "text"), size, stride)
        .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "n_tokens",
          "chunk_text")
        .as[(Long, Int, Int, Int, Int, String)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val local = docs.flatMap { case (id, text) =>
        val ts = tok(text); val n = ts.size
        (0 until n by stride).map { st =>
          (id, st / stride, st, math.min(size, n - st), n,
            ts.slice(st, st + size).mkString(" "))
        }
      }.sortBy(r => (r._1, r._2))
      assert(got === local, s"trial $trial size=$size stride=$stride")
    }
  }

  test("stride > size is rejected") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunks.chunk(docs, size = 4, stride = 5)
    }
  }
}
