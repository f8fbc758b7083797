package graft.search

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.{Corpus, SyntheticCorpus}
import graft.index.{IndexBuilder, IndexConfig, PostingIndex}
import graft.ops.Similarity

/** Hybrid RRF retrieval: fusion must equal a driver-side reconstruction
  * from the two public candidate lists (rank assignment, absent-rank-0,
  * 1/(rrfK+rank) sums, 6-dp rounding, (rrf desc, doc_id asc) order), and
  * the degenerate single-retriever forms must be first-class.
  */
class HybridSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val cfg = IndexConfig(shards = 4, termBuckets = 2, blockSize = 16,
    stem = false)

  private lazy val docs =
    Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 200, seed = 11L)).cache()

  private lazy val idxDir: String = {
    val dir = Files.createTempDirectory("graft-hybrid-idx")
    dir.toFile.deleteOnExit()
    IndexBuilder.build(spark, docs, dir.toString, cfg)
    dir.toString
  }
  private lazy val idx = new PostingIndex(spark, idxDir)

  /** Deterministic synthetic embeddings over the corpus doc ids (the gate
    * corpus's `embeddings` table analog: array<float> + shared id space).
    */
  private lazy val emb: DataFrame = {
    import spark.implicits._
    val ids = docs.select("docId").collect().map(_.getLong(0)).sorted.toSeq
    ids.map { id =>
      (id, Array.tabulate(8)(j => math.sin(id * 31.0 + j * 7.0).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver-side fusion of two PUBLIC-ORDER candidate lists. */
  private def fuse(lex: Seq[Long], vec: Seq[Long], k: Int, rrfK: Int)
      : Seq[(Long, Int, Int, Double)] = {
    val lr = lex.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    val vr = vec.zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    (lex ++ vec).distinct.map { d =>
      val l = lr.getOrElse(d, 0)
      val v = vr.getOrElse(d, 0)
      val s = (if (l > 0) 1.0 / (rrfK + l) else 0.0) +
        (if (v > 0) 1.0 / (rrfK + v) else 0.0)
      (d, l, v, r6(s))
    }.sortBy { case (d, _, _, s) => (-s, d) }.take(k)
  }

  private def got(df: DataFrame): Seq[(Long, Int, Int, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq

  private val query = "longest river complexity"

  test("rrfSearch == reconstruction from the two public candidate lists") {
    val qv = emb.head().getSeq[Float](1).map(_.toDouble).toArray
    for (c <- Seq(5, 25); rrfK <- Seq(10, 60); k <- Seq(7, 50)) {
      val lex = idx.searchRounded(query, c).collect().map(_.getLong(0)).toSeq
      val vec = Similarity.bruteForceTopK(emb, qv, c).collect()
        .map(_.getLong(0)).toSeq
      assert(lex.nonEmpty && vec.nonEmpty)
      val expected = fuse(lex, vec, k, rrfK)
      assert(got(Hybrid.rrfSearch(idx, emb, query, qv, k, c, rrfK))
        == expected, s"c=$c rrfK=$rrfK k=$k")
    }
  }

  test("degenerate lexical side: stopword-only query fuses vector-only") {
    val qv = emb.head().getSeq[Float](1).map(_.toDouble).toArray
    val vec = Similarity.bruteForceTopK(emb, qv, 20).collect()
      .map(_.getLong(0)).toSeq
    val expected = fuse(Seq.empty, vec, 10, 60)
    assert(got(Hybrid.rrfSearch(idx, emb, "the and of", qv, 10, 20))
      == expected)
    assert(expected.forall(_._2 == 0)) // every row vector-ranked only
  }

  test("rrfFuse is retrieval-agnostic: ivfTopK slots in for the vector side") {
    import org.apache.spark.sql.functions.col
    val qv = emb.head().getSeq[Float](1).map(_.toDouble).toArray
    val lex = idx.searchRounded(query, 25)
    val ivf = Similarity.ivfTopK(emb, qv, 20, nlist = 4, nprobe = 2)
      .select(col("vec_id").as("doc_id"), col("cos").as("score"))
    val lexIds = lex.collect().map(_.getLong(0)).toSeq
    val ivfIds = ivf.collect().map(_.getLong(0)).toSeq
    assert(got(Hybrid.rrfFuse(lex, ivf, 10))
      == fuse(lexIds, ivfIds, 10, 60))
  }
}
