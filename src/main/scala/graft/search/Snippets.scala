package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Match-aware result snippets (KWIC — keyword in context): for each
  * top-k row, the context window around the FIRST occurrence of any
  * query term in the document, plus which term matched and where — the
  * search-UI highlighting surface (the reference truncates blindly to
  * 150 chars, App.tsx:290; a real UI centers the snippet on the match).
  *
  * Deterministic cross-engine contract: positions are 1-based SUBSTRING
  * occurrences of each analyzed query term in the LOWERCASED text (the
  * cheap highlighter semantics — "scan" inside "rescanning" counts; both
  * engines compute the identical thing); the winning match minimizes
  * (pos, term); the snippet is `substring(lower(text),
  * max(1, pos - window), 2*window + len(term))`, silently clipped at the
  * text ends by both engines. Documents matching no term (possible:
  * scores can come from terms the analyzer folded) carry pos 0 and an
  * empty term/snippet rather than being dropped.
  *
  * Scale shape: the top-k side is ≤ k rows; the document join is the J2
  * hydration join (broadcast the tiny side); the per-row expression is a
  * codegen'd array of (pos, term) structs + array_min — no UDF, no
  * shuffle beyond the hydration join.
  */
object Snippets {

  /** `topk`: (doc_id, score); `docs`: the documents table shape
    * (doc_id, text). Returns (doc_id, score, term, pos, kwic) in the
    * top-k's (score desc, doc_id asc) order.
    */
  def kwic(topk: DataFrame, docs: DataFrame, terms: Seq[String],
           window: Int = 30): DataFrame = {
    require(terms.nonEmpty, "kwic needs >= 1 analyzed query term")
    val lowered = lower(col("text"))
    val hits: Column = array(terms.distinct.sorted.map { t =>
      struct(instr(lowered, t).as("pos"), lit(t).as("term"))
    }: _*)
    val found = filter(hits, h => h.getField("pos") > 0)
    val best = array_min(found)
    topk.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .withColumn("term", coalesce(best.getField("term"), lit("")))
      .withColumn("pos", coalesce(best.getField("pos"), lit(0)))
      .withColumn("kwic",
        when(col("pos") > 0,
          lowered.substr(greatest(col("pos") - window, lit(1)),
            lit(2 * window) + length(col("term"))))
          .otherwise(lit("")))
      .select("doc_id", "score", "term", "pos", "kwic")
      .orderBy(col("score").desc, col("doc_id").asc)
  }
}
