package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A row of the engine's input table (BASELINE.json `input_hint`): the
  * rebuild's analog of the reference's `articles(id, title, url, text)`
  * SQLite table (reference: backend/src/util/parser.rs:9).
  */
final case class CodeDoc(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Corpus ingestion (SURVEY.md §2.1 S1): lazy distributed scans replacing the
  * reference's full in-RAM materialization (parser.rs:19-24). All loaders
  * yield the engine's canonical shape `(docId: Long, content: String, ...)`
  * with column pruning pushed to the parquet scan.
  */
object Corpus {

  /** The driver-generated synthetic `documents` table as a corpus:
    * (doc_id, text, lang, source, n_chars) -> (docId, content, lang, source).
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("docId"),
        col("text").as("content"),
        col("lang"),
        col("source"))

  /** A `CodeDoc` table as a corpus: deterministic 64-bit docId from the
    * natural key. xxhash64 is stable across Spark versions and partitionings.
    *
    * Collision math at the 10^12-file design scale: expected colliding pairs
    * = n^2 / 2^65 ~ 2.7e4 — collisions are CERTAIN at that scale, and a
    * collision would silently merge two documents' postings (summed tf,
    * ambiguous hydration). Mitigation at 10^12 rows: widen to a 128-bit id
    * (two xxhash64 lanes with different seeds as a struct key, expected
    * colliding pairs ~ 1.5e-15) and disambiguate hydration through the
    * identity table keyed by the natural triple; [[fromCodeDocs]] keeps the
    * single 64-bit lane because the bench corpus is <= 1e7 docs (expected
    * pairs ~ 2.7e-6). Long.MaxValue is additionally remapped: it is
    * [[graft.search.Wand]]'s Exhausted sentinel and must not be a real id.
    */
  def fromCodeDocs(docs: DataFrame): DataFrame =
    docs.select(
      when(xxhash64(col("repo"), col("path"), col("commit")) === Long.MaxValue,
        lit(Long.MinValue))
        .otherwise(xxhash64(col("repo"), col("path"), col("commit")))
        .as("docId"),
      col("content"),
      col("lang"))

  /** The `input_hint` quintuple as an explicit schema — JSONL/CSV readers
    * must NOT infer it (inference costs an extra full pass at 100 TB and
    * can mis-type a column from a skewed sample; the contract is fixed).
    */
  val codeDocSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq("repo", "path", "commit", "lang", "content")
      .map(StructField(_, StringType, nullable = true)))
  }

  /** JSON-lines corpus with the `input_hint` shape — one object per line,
    * any compression Spark handles (.gz/.zst). Pinned schema (no inference
    * pass); extra fields are ignored, missing ones are null.
    */
  def fromJsonl(spark: SparkSession, path: String): DataFrame =
    fromCodeDocs(spark.read.schema(codeDocSchema).json(path))

  /** CSV corpus with the `input_hint` shape. `multiLine` because code
    * content embeds newlines (standard CSV quoting); header expected.
    * multiLine CSV is NOT splittable per file — acceptable for ingest
    * (many files → parallelism across files), wrong as a steady-state
    * format; convert to parquet once, like [[fromJsonl]] inputs. The
    * reader preserves cell bytes (no whitespace trimming); byte-exact
    * round-trips also need a NON-TRIMMING producer (Spark's own CSV
    * writer trims cell whitespace unless ignore*WhiteSpace=false).
    */
  def fromCsv(spark: SparkSession, path: String): DataFrame =
    fromCodeDocs(spark.read
      .schema(codeDocSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path))

  /** The production entry point (north rule: an ICEBERG table of
    * source-code repositories): any catalog table whose schema matches the
    * `input_hint` quintuple. `spark.table` resolves through the session
    * catalog, so with the Iceberg runtime + catalog configured
    * (`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`)
    * this reads an Iceberg table with snapshot isolation, partition pruning
    * and column pruning intact; the engine itself is format-agnostic — the
    * sandbox (no Iceberg jar in /opt/spark/jars, zero egress) exercises the
    * identical plan shape through parquet dirs.
    */
  def fromTable(spark: SparkSession, table: String): DataFrame =
    fromCodeDocs(spark.table(table))
}
