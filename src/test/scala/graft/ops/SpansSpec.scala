package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.analysis.Analyzer

/** [[Spans.dupSpanStats]] against a local sliding-window reference, planted
  * duplicate spans, degenerate docs, and partitioning invariance. The md5
  * hex path is pinned against a known vector (it must equal DuckDB's
  * `md5()` byte-for-byte for the gate to hold).
  */
class SpansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val w = 4

  // planted corpus: docs 1/2 share a 6-token run (3 duplicated 4-windows
  // each), doc 3 repeats a window WITHIN itself, doc 4 is short (< w
  // tokens), doc 5 is empty, doc 6 is all-unique filler
  private val docs: Seq[(Long, String)] = Seq(
    (1L, "alpha bravo charlie delta echo foxtrot unique1 unique2"),
    (2L, "prefixx alpha bravo charlie delta echo foxtrot suffixx"),
    (3L, "golf hotel india juliet golf hotel india juliet"),
    (4L, "kilo lima mike"),
    (5L, ""),
    (6L, "november oscar papa quebec romeo sierra tango"))

  private def naive(): Map[Long, (Long, Long)] = {
    val grams: Seq[(Long, String)] = docs.flatMap { case (id, text) =>
      val ts = Analyzer.tokenize(text)
      (0 to ts.length - w).map(i => (id, ts.slice(i, i + w).mkString(" ")))
    }
    val total = grams.groupBy(_._2).view.mapValues(_.size).toMap
    docs.map { case (id, _) =>
      val mine = grams.filter(_._1 == id)
      (id, (mine.size.toLong, mine.count(g => total(g._2) > 1).toLong))
    }.toMap
  }

  test("dupSpanStats == local sliding-window reference (planted spans)") {
    val df = Spans.dupSpanStats(docs.toDF("doc_id", "text"), w = w)
      .orderBy("doc_id").collect()
    val want = naive()
    assert(df.length == docs.length) // every doc present, short/empty included
    df.foreach { r =>
      val (id, windows, dup, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (ww, dd) = want(id)
      assert((windows, dup) == (ww, dd), s"doc $id")
      assert(frac == (if (ww == 0) 0.0 else dd.toDouble / ww.toDouble), s"doc $id frac")
    }
    // the planted expectations themselves, so the fixture can't silently rot:
    val byId = df.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == (5L, 3L)) // 3 windows of the shared 6-token run
    assert(byId(2L) == (5L, 3L))
    assert(byId(3L) == (5L, 2L)) // "golf hotel india juliet" occurs twice
    assert(byId(4L) == (0L, 0L)) // < w tokens
    assert(byId(5L) == (0L, 0L))
    assert(byId(6L) == (4L, 0L))
  }

  test("dupSpanStats is partitioning-invariant") {
    val one = Spans.dupSpanStats(docs.toDF("doc_id", "text").coalesce(1), w = w)
      .orderBy("doc_id").collect().toSeq
    val many = Spans.dupSpanStats(docs.toDF("doc_id", "text").repartition(7), w = w)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }

  test("windowGrams: md5 hex matches the DuckDB md5() byte format") {
    // md5("foo bar baz") — pinned external vector (lowercase hex, 32 chars)
    val g = Spans.windowGrams("foo bar baz", 3)
    assert(g.toSeq == Seq("ab07acbb1e496801937adfa772424bf7"))
    // sub-w and empty inputs
    assert(Spans.windowGrams("one two", 3).isEmpty)
    assert(Spans.windowGrams("", 3).isEmpty)
    // rolling: n tokens -> n-w+1 windows, all distinct here
    assert(Spans.windowGrams("aaa bbb ccc ddd eee", 3).length == 3)
  }
}
