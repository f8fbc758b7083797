package graft.corpus

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ingest invariant (input_hint / SURVEY.md §5 item 3): per-row content
  * sha256 equality between the source table and what the engine reads —
  * the distributed sha2 must equal a locally-computed digest for every row.
  */
class CorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("per-row content sha256 equality vs the reference ingest (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSpark = docs.select(col("doc_id"), sha2(col("text"), 256).as("sha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val local = docs.select("doc_id", "text").collect().map { r =>
      md.reset()
      r.getLong(0) -> md.digest(r.getString(1).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toMap
    assert(viaSpark.size == 500)
    assert(viaSpark == local)
  }

  test("fromTable (catalog entry point) == fromCodeDocs on the same rows") {
    SyntheticCorpus.generate(spark, 200, 7L)
      .createOrReplaceTempView("code_docs_v")
    val viaTable = Corpus.fromTable(spark, "code_docs_v")
      .orderBy("docId").collect().toSeq
    val direct = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 200, 7L))
      .orderBy("docId").collect().toSeq
    assert(viaTable == direct)
    assert(viaTable.nonEmpty)
  }

  test("CodeDoc ingest: deterministic docIds, no collisions at test scale") {
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 5000, 42L))
    val ids = docs.select("docId").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length)
    val again = Corpus.fromCodeDocs(
      SyntheticCorpus.generate(spark, 5000, 42L).repartition(17))
      .select("docId").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == again.sorted.toSeq)
  }
}
