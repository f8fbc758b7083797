package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bloom-prefiltered incremental dedup: exactness of the verdict, the
  * bloom-candidate superset invariant (what the DuckDB gate can't see),
  * and the degenerate corpora.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val existing = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with five dozen"),
    (4L, "liquor jugs and such")).toDF("doc_id", "text")

  test("verdicts: unchanged recrawls flagged, edits and novelties not") {
    val batch = Seq(
      (10L, "the quick brown fox"),        // exact recrawl -> dup
      (11L, "jumps over the lazy dog!"),   // edited -> novel
      (12L, "entirely new content here"),  // novel
      (13L, "pack my box with five dozen") // exact recrawl -> dup
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, batch).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(10L)._2 && out(13L)._2)
    assert(!out(11L)._2 && !out(12L)._2)
    // a true dup MUST be a bloom candidate (no false negatives, ever)
    out.values.foreach { case (cand, dup) => assert(!dup || cand) }
  }

  test("high-fpp bloom never leaks a false positive into is_dup") {
    // fpp 0.5 on a 4-key filter makes spurious candidates likely; the
    // exact verification join must still reject every one of them
    val batch = (100L until 200L)
      .map(i => (i, s"novel document number $i")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, batch, fpp = 0.5).collect()
    assert(out.length == 100)
    assert(out.forall(!_.getBoolean(3)))
  }

  test("empty existing corpus: everything is novel; empty batch: empty out") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "anything at all")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(empty, batch).collect()
    assert(out.length == 1 && !out.head.getBoolean(3))
    assert(Dedup.incrementalDedup(existing, empty).collect().isEmpty)
  }

  test("verdict is bloom-invariant: fpp 0.5 and 0.001 agree exactly") {
    val batch = Seq(
      (10L, "the quick brown fox"),
      (11L, "liquor jugs and such"),
      (12L, "something else entirely")).toDF("doc_id", "text")
    def verdicts(fpp: Double) =
      Dedup.incrementalDedup(existing, batch, fpp = fpp).collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts(0.5) == verdicts(0.001))
    assert(verdicts(0.001) == Map(10L -> true, 11L -> true, 12L -> false))
  }
}
