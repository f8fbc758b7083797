package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE corpus-stats standard tokenizer and its derived devices, shared by
  * every analytics operator that tokenizes outside the search analyzer
  * ([[TextStats]], [[Drift]], [[Anchors]], [[Keywords]], [[Chunks]],
  * [[Collocations]], [[Lm]]): alphanumeric runs, length > 2, lowercased.
  * Correctness across those operators depends on every engine-side copy
  * and every DuckDB-twin copy staying byte-identical — a single shared
  * definition removes the drift hazard (each operator previously inlined
  * its own copy of both dialects).
  */
object Tok {

  /** Standard analytics tokenization of a string column: array<string> of
    * lowercased alnum runs longer than 2 chars.
    */
  def terms(c: Column): Column =
    transform(filter(split(c, "[^a-zA-Z0-9]+"), t => length(t) > 2), lower _)

  /** DuckDB twin of [[terms]] over the given SQL expression. */
  def termsSql(expr: String = "text"): String =
    s"list_transform(list_filter(regexp_split_to_array($expr, " +
      "'[^a-zA-Z0-9]+'), x -> length(x) > 2), x -> lower(x))"

  /** Adjacent-pair device over a token-array column: the array zipped with
    * its own tail — struct(w1, w2) rows, fan-out n-1 per document (never
    * all-pairs). `zip_with` pads the shorter side with null, so callers
    * filter `col("...w2").isNotNull` after exploding; the `greatest(..., 0)`
    * guard keeps `slice` legal on empty arrays. DuckDB twin: a lateral
    * `unnest(range(1, len(ts)))` indexing ts[i], ts[i+1].
    */
  def adjacentPairs(ts: Column): Column =
    zip_with(ts, slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))
}
