package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.functions.Udfs
import graft.search.{BM25, OracleSql, RelationalBM25}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Query keys are SURVEY.md §2 operator ids; every entry with an
  * [[oracleSql]] twin is gated row/schema/hash-identical against DuckDB on
  * the same parquet tables. Operators whose semantics SQL cannot express
  * (Porter stemming, compressed posting blocks, WAND) are gated by the
  * in-repo ScalaTest oracle instead and appear here as rows-only checks.
  */
object SparkEntry {

  /** The reference-query-set analog over the synthetic `documents` corpus
    * (its vocabulary is data-engineering words; `dup` is the rare
    * discriminative term, `the`/`a` exercise the stop/length filters).
    */
  val benchQueries: Seq[(String, String)] = Seq(
    "tsm" -> "table scan merge",
    "wsb" -> "window stream batch",
    "hjf" -> "hash join filter",
    "dup" -> "the dup vector",
    "sqg" -> "slow query group")

  private def rawDocs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Corpus.documents(spark, "/root/testdata/sf0.001")
    RelationalBM25.hydrate(
      RelationalBM25.topK(docs, "table scan merge", 10, stem = false), docs)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val base: Map[String, (SparkSession, String) => DataFrame] = Map(
      // S1: pruned scan + projection + pushed filter
      "s1_scan_docs" -> ((s, dir) =>
        rawDocs(s, dir).select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id").limit(20)),
      // S2 ingest invariant: per-row content sha256 (input_hint gate)
      "s2_ingest_sha" -> ((s, dir) =>
        rawDocs(s, dir).select(col("doc_id"), sha2(col("text"), 256).as("sha"))
          .orderBy("doc_id")),
      // S9: doc-id point lookup (predicate pushdown to parquet)
      "s9_doc_lookup" -> ((s, dir) =>
        rawDocs(s, dir).filter(col("doc_id") === 42)
          .select("doc_id", "lang", "source", "n_chars", "text")),
      // F1: bare tokenizer on one document
      "f1_tokenize" -> ((s, dir) =>
        rawDocs(s, dir).filter(col("doc_id") === 1)
          .select(explode(Udfs.tokenize(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt")).orderBy("term")),
      // A2: per-(doc,term) frequencies, analysis chain (no stem)
      "a2_term_freqs" -> ((s, dir) =>
        RelationalBM25.termFreqs(Corpus.documents(s, dir), stem = false)
          .filter(col("doc_id") < 25).orderBy("doc_id", "term")),
      // A1: deterministic vocabulary (term, term_id, df)
      "a1_vocab" -> ((s, dir) =>
        RelationalBM25.vocabulary(
          RelationalBM25.termFreqs(Corpus.documents(s, dir), stem = false))
          .orderBy("term")),
      // A5: BM25 idf per term
      "a5_idf" -> ((s, dir) => {
        val docs = Corpus.documents(s, dir)
        val tf = RelationalBM25.termFreqs(docs, stem = false)
        RelationalBM25.docFreqs(tf)
          .crossJoin(docs.agg(count(lit(1)).cast("double").as("n")))
          .select(col("term"), col("df"),
            round(RelationalBM25.idfCol(col("n"), col("df")), 6).as("idf"))
          .orderBy("term")
      }),
      // A8 (BM25 form): per-doc length statistic
      "a8_doclen" -> ((s, dir) =>
        RelationalBM25.docLens(
          RelationalBM25.termFreqs(Corpus.documents(s, dir), stem = false))
          .orderBy("doc_id")),
      // A9: corpus stats (document_count, vocabulary_size) — the /stats sink
      "a9_stats" -> ((s, dir) => {
        val docs = Corpus.documents(s, dir)
        val tf = RelationalBM25.termFreqs(docs, stem = false)
        docs.agg(count(lit(1)).as("document_count"))
          .crossJoin(RelationalBM25.docFreqs(tf)
            .agg(count(lit(1)).as("vocabulary_size")))
      }),
      // J2: top-k hydration join
      "j2_hydrate" -> ((s, dir) => {
        val docs = Corpus.documents(s, dir)
        RelationalBM25.hydrate(
          RelationalBM25.topK(docs, "table scan merge", 10, stem = false), docs)
          .select("doc_id", "score", "lang", "source")
          .orderBy(col("score").desc, col("doc_id").asc)
      }),
      // stemmed full chain — rows-only here, rank-identity gated in ScalaTest
      "bm25_stemmed_tsm" -> ((s, dir) =>
        RelationalBM25.topK(Corpus.documents(s, dir), "table scan merge", 10,
          stem = true)))

    // T1/A10/EP2: BM25 top-10 per bench query (exact relational form)
    val bm25 = benchQueries.map { case (key, text) =>
      s"t1_bm25_$key" -> ((s: SparkSession, dir: String) =>
        RelationalBM25.topK(Corpus.documents(s, dir), text, 10, stem = false))
    }.toMap
    base ++ bm25
  }

  /** DuckDB twins for the driver's correctness gate. */
  def oracleSql: Map[String, String] = {
    val base = Map(
      "s1_scan_docs" ->
        "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id LIMIT 20",
      "s2_ingest_sha" ->
        "SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id",
      "s9_doc_lookup" ->
        "SELECT doc_id, lang, source, n_chars, text FROM documents WHERE doc_id = 42",
      "f1_tokenize" ->
        s"""WITH ${OracleSql.tokBareCte}
SELECT term, count(*) AS cnt FROM tokb WHERE doc_id = 1 GROUP BY term ORDER BY term""",
      "a2_term_freqs" ->
        s"""WITH ${OracleSql.tokCte}, ${OracleSql.tfCte}
SELECT doc_id, term, tf FROM tf WHERE doc_id < 25 ORDER BY doc_id, term""",
      "a1_vocab" ->
        s"""WITH ${OracleSql.tokCte}, ${OracleSql.tfCte}, ${OracleSql.dfCte}
SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS term_id, df
FROM df ORDER BY term""",
      "a5_idf" ->
        s"""WITH ${OracleSql.tokCte}, ${OracleSql.tfCte}, ${OracleSql.dfCte}
SELECT term, df,
       round(ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) - df + 0.5)
                / (df + 0.5) + 1.0), 6) AS idf
FROM df ORDER BY term""",
      "a8_doclen" ->
        s"""WITH ${OracleSql.tokCte}, ${OracleSql.tfCte}
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id ORDER BY doc_id""",
      "a9_stats" ->
        s"""WITH ${OracleSql.tokCte}, ${OracleSql.tfCte}, ${OracleSql.dfCte}
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS document_count,
       CAST((SELECT count(*) FROM df) AS BIGINT) AS vocabulary_size""",
      "j2_hydrate" -> OracleSql.hydrateTopK("table scan merge", 10))
    val bm25 = benchQueries.map { case (key, text) =>
      s"t1_bm25_$key" -> OracleSql.bm25TopK(text, 10)
    }.toMap
    base ++ bm25
  }
}
