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

  test("JSONL and CSV loaders round-trip the corpus byte-exactly") {
    // content embeds newlines/quotes via the generator's natural text; the
    // loaders must reproduce the SAME (docId, content, lang) rows as the
    // parquet path — sources differ, the engine's canonical shape does not
    val docs = SyntheticCorpus.generate(spark, 150, seed = 5L)
    val base = java.nio.file.Files
      .createTempDirectory("graft-corpus-fmt").toString
    docs.write.mode("overwrite").json(s"$base/jsonl")
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      // Spark's CSV WRITER trims cell whitespace by default (the reader
      // does not) — byte-exact round-trip needs a non-trimming producer
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(s"$base/csv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("docId", "content", "lang")
        .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val want = canon(Corpus.fromCodeDocs(docs))
    assert(want.size == 150)
    assert(canon(Corpus.fromJsonl(spark, s"$base/jsonl")) == want)
    assert(canon(Corpus.fromCsv(spark, s"$base/csv")) == want)
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
