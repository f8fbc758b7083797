package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `CodeDoc` corpus generator (SURVEY.md §2.1 S2/S3:
  * replaces the reference's Wikipedia scraper / dump loader — north rule
  * forbids external data). Fully Spark-native: `spark.range(n)` plus a
  * per-row deterministic content function, so the same (seed, n) yields the
  * same corpus at any partitioning or cluster size.
  *
  * The word pool is engineered per FIXTURES.md §2: reference-query vocabulary
  * (so top-10s are non-degenerate), non-trivially-stemmable words, stop
  * words, short/punctuated fragments, and the hot term `return` in ~every
  * doc (df ~ N) as the skew fixture.
  */
object SyntheticCorpus {

  val queryVocab: Array[String] = Array(
    "longest", "river", "best", "complexity", "world", "war", "one",
    "may", "common", "synonyms", "word", "search", "april", "science",
    "technology", "health", "artificial", "intelligence", "climate", "change")

  val stemmables: Array[String] = Array(
    "running", "caresses", "ponies", "relational", "adoption", "motoring",
    "electrical", "hopeful", "searches", "rivers", "changes", "sciences")

  val stopish: Array[String] = Array(
    "the", "and", "for", "with", "this", "that", "from", "have")

  val codeish: Array[String] = Array(
    "def", "val", "class", "import", "match", "case", "object", "trait",
    "FooBar42", "x=y+z2", "a.b_c-1", "io", "fn")

  private val pool: Array[String] =
    queryVocab ++ stemmables ++ stopish ++ codeish

  private val langs = Array("scala", "rust", "py", "ts", "md")

  /** Deterministic per-doc content: a seeded RNG keyed by (seed, id) — never
    * by partition — so the corpus is reproducible under any parallelism.
    */
  private def contentFor(seed: Long, id: Long, minWords: Int, maxWords: Int,
                         vocabSpread: Int): String = {
    val rnd = new scala.util.Random(seed * 1000003L + id)
    val n = minWords + rnd.nextInt(maxWords - minWords)
    val sb = new StringBuilder
    sb.append("return ") // hot skew term, df ~ N (FIXTURES.md §2)
    var i = 0
    while (i < n) {
      // vocabSpread > 0 mixes in synthetic identifiers (a code corpus has a
      // huge long-tail vocabulary; the pinned pool alone has ~55 terms)
      if (vocabSpread > 0 && rnd.nextInt(3) == 0)
        sb.append("ident").append(rnd.nextInt(vocabSpread))
      else sb.append(pool(rnd.nextInt(pool.length)))
      sb.append(if (rnd.nextInt(8) == 0) "; " else " ")
      i += 1
    }
    sb.result()
  }

  /** Generate `n` docs. Columns per `input_hint`:
    * (repo, path, commit, lang, content).
    */
  /** minWords/maxWords size the docs: tests use the small default; the
    * bench corpus uses ~2 KB docs (realistic web/corpus scale) so analysis
    * compute, not per-file overhead, dominates.
    */
  /** `parts > 0` repartitions the id RANGE before content generation — the
    * shuffle then moves 8 bytes/row instead of the generated ~2 KB/row
    * (a post-generation `.repartition(64)` on the bench corpus shuffled
    * 600 MB through disk; this form shuffles ~2 MB).
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               minWords: Int = 20, maxWords: Int = 80,
               vocabSpread: Int = 0, parts: Int = 0): DataFrame = {
    val genContent = udf((id: Long) => contentFor(seed, id, minWords, maxWords, vocabSpread))
    val ids = if (parts > 0) spark.range(n).repartition(parts) else spark.range(n)
    ids.select(
      format_string("org%d/repo%d", col("id") % 7, col("id") % 13).as("repo"),
      format_string("src/m%d/f%d.scala", col("id") % 5, col("id")).as("path"),
      substring(sha2(concat_ws("#", lit(seed), col("id")), 256), 1, 40).as("commit"),
      element_at(typedLit(langs.toSeq), (col("id") % langs.length + 1).cast("int")).as("lang"),
      genContent(col("id")).as("content"))
  }
}
