package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Crawl-snapshot diff: the four-way verdict on a hand-built snapshot pair,
  * plus the synthesized-next generator covering every verdict class.
  */
class SnapshotsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("crawlDiff classifies added / removed / changed / unchanged") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Snapshots.crawlDiff(prev, next)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("crawlDiff hashes: unchanged rows carry equal prev/next sha") {
    val prev = Seq((1L, "same text")).toDF("doc_id", "text")
    val row = Snapshots.crawlDiff(prev, prev).collect().head
    assert(row.getAs[String]("sha_prev") === row.getAs[String]("sha_next"))
    assert(row.getAs[String]("sha_prev").length === 64)
  }

  test("null text is presence, not absence: unchanged-null and null-edits classify by the row") {
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "body"))
      .toDF("doc_id", "text")
    val next = Seq((1L, null: String), (2L, "now filled"), (3L, "body"))
      .toDF("doc_id", "text")
    val got = Snapshots.crawlDiff(prev, next)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
  }

  test("syntheticNext exercises all four verdicts on a 0..34 id range") {
    val docs = (0L until 35L).map(i => (i, s"doc body $i"))
      .toDF("doc_id", "text")
    val statuses = Snapshots.crawlDiff(docs, Snapshots.syntheticNext(docs))
      .select("status").as[String].collect().toSet
    assert(statuses === Set("added", "removed", "changed", "unchanged"))
    // removed = ids % 5 == 4; added = ids % 7 == 0 shifted by max(id)+1
    // (data-derived, so new ids never collide with real ids at any scale)
    val byStatus = Snapshots.crawlDiff(docs, Snapshots.syntheticNext(docs))
      .select("doc_id", "status").as[(Long, String)].collect()
    assert(byStatus.filter(_._2 == "removed").map(_._1).toSet ===
      (0L until 35L).filter(_ % 5 == 4).toSet)
    assert(byStatus.filter(_._2 == "added").map(_._1).toSet ===
      (0L until 35L).filter(_ % 7 == 0).map(_ + 35L).toSet)
  }
}
