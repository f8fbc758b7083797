package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.analysis.Analyzer

/** The engine's scalar-function surface (SURVEY.md §2.2 F1/F3/F4, §2.8):
  * the full analysis chain as a single deterministic Scala UDF — one UDF
  * call per row, `explode` after, so the (unavoidable) serialization
  * boundary is crossed once per document, not once per token.
  *
  * Deterministic (default), so Catalyst may collapse/push surrounding
  * operators freely. A codegen'd Catalyst `Expression` is the documented
  * v2 escape hatch (SURVEY.md §7.3) — profiling at sf0.1 shows the chain
  * is ~15% of build time, dominated by the groupBy shuffles, so the UDF
  * stays.
  */
object Udfs {

  /** Full reference chain: tokenize -> stop-filter -> Porter stem. */
  val analyze: UserDefinedFunction =
    udf((s: String) => Analyzer.default.analyze(s))

  /** tokenize -> stop-filter, no stemming — the DuckDB-oracle-checkable
    * variant (SQL cannot express the reference's Porter variant).
    */
  val analyzeNoStem: UserDefinedFunction = {
    val a = Analyzer.noStem(Analyzer.defaultStopWords)
    udf((s: String) => a.analyze(s))
  }

  /** Bare tokenizer (F1 alone, no stop filter, no stem). */
  val tokenize: UserDefinedFunction =
    udf((s: String) => Analyzer.tokenize(s))
}
