package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-source crawl report vs hand-computed fixtures, including the
  * duplicate-fraction and null-text edges.
  */
class ReportsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("crawlReport aggregates per source with exact dup fraction") {
    val docs = Seq(
      (1L, "wiki", "en", 10L, "same body"),
      (2L, "wiki", "en", 10L, "same body"), // exact dup of 1
      (3L, "wiki", "de", 20L, "other body"),
      (4L, "cc", "en", 40L, "cc body"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val got = Reports.crawlReport(docs)
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("cc", 1L, 40L, 1L, 1L, 0.0, 40.0),
      ("wiki", 3L, 40L, 2L, 2L, 0.333333, 13.333333)))
  }

  test("null texts hash as empty and count as duplicates of each other") {
    val docs = Seq(
      (1L, "s", "en", 1L, null: String),
      (2L, "s", "en", 1L, null: String),
      (3L, "s", "en", 1L, ""))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val row = Reports.crawlReport(docs)
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().head
    assert(row._5 === 1L) // all three bodies hash identically
    assert(row._6 === 0.666667)
  }
}
