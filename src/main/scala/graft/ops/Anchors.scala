package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incoming-anchor-text aggregation — the classic web-IR indexing signal:
  * the text AROUND links to a page describes it better (and earlier) than
  * the page's own content, so production web indexes keep a per-target
  * anchor-term profile next to the body index. Curation pipelines use the
  * same profile as a per-host topic/quality descriptor.
  *
  * Plan shape at 100 TB — this is THE skew-prone aggregation (every page
  * links to a handful of mega-hosts): the per-(host, term) count runs with
  * map-side combine, so a billion in-links to one host arrive at the
  * reducer as one pre-summed row per (partition, term) — the hot host
  * costs vocabulary-size work, never in-link-count work. The subsequent
  * top-k-per-host window runs over the AGGREGATED (host, term) table —
  * bounded by hosts x per-host vocabulary, independent of corpus size. The
  * document side is one narrow scan: anchor snippet -> tokens -> link
  * fan-out (bounded per doc), all inside whole-stage codegen.
  *
  * Determinism: counts are exact integers; the top-k cut orders by
  * (cnt desc, term asc) — total and engine-independent.
  */
object Anchors {

  /** Top-`topK` incoming anchor terms per target host: (host, term, cnt,
    * rnk). `links` is (src doc id, dst host, anchor snippet); terms use
    * the corpus-stats tokenizer (alnum runs, >2 chars, lowercased — see
    * [[TextStats.unigramLogProb]]).
    */
  def anchorProfile(links: DataFrame, topK: Int = 3): DataFrame = {
    val toks = Tok.terms(col("anchor"))
    val cnt = links.select(col("dst_host"), explode(toks).as("term"))
      .groupBy("dst_host", "term").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst_host").orderBy(col("cnt").desc, col("term").asc)
    cnt.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("dst_host").as("host"), col("term"), col("cnt"),
        col("rnk"))
  }

  /** Deterministic link synthesis for the gate: each doc casts
    * `1 + doc_id mod 3` out-links at hosts `(doc_id*31 + 7j) mod 101` —
    * the [[Graphs.hostEdges]] shape, lifted from host- to document-level —
    * carrying the document's first 80 characters as the anchor snippet
    * (real pipelines take the link's surrounding text; a prefix is the
    * deterministic stand-in with the same "anchor is a small slice of the
    * source document" cost model).
    */
  def syntheticLinks(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("src"),
        substring(col(textCol), 1, 80).as("anchor"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
      .filter(col("j") <= pmod(col(idCol), lit(3L)) + 1)
      .select(col("src"),
        pmod(col("src") * 31 + col("j") * 7, lit(Graphs.HostSpace))
          .as("dst_host"),
        col("anchor"))

  /** DuckDB twin of the `anchor_text` gate: same synthesis, tokenizer,
    * aggregation, and (cnt desc, term asc) top-k window.
    */
  def anchorProfileSql(topK: Int = 3): String = {
    val arr = Tok.termsSql("anchor")
    s"""WITH l AS (SELECT doc_id AS src,
  (doc_id*31 + 7*j) % ${Graphs.HostSpace} AS dst_host,
  substring(text, 1, 80) AS anchor
  FROM documents, (VALUES (1),(2),(3)) t(j) WHERE j <= 1 + doc_id % 3),
inst AS (SELECT dst_host, unnest($arr) AS term FROM l),
c AS (SELECT dst_host, term, count(*) AS cnt FROM inst GROUP BY dst_host, term),
r AS (SELECT dst_host AS host, term, cnt,
  row_number() OVER (PARTITION BY dst_host ORDER BY cnt DESC, term) AS rnk
  FROM c)
SELECT host, term, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS INTEGER) AS rnk
FROM r WHERE rnk <= $topK ORDER BY host, rnk"""
  }
}
