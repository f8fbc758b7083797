package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document keyword extraction — top-k TF-IDF terms per document, the
  * standard corpus-annotation pass (document tagging, cluster labeling,
  * faceted exploration of a crawl). The corpus-LEVEL twin is the gated
  * significant-terms aggregation; this one is per-document.
  *
  * Plan shape at 100 TB: one narrow tokenize scan into a (doc, term)
  * partial-aggregated count, one vocabulary-keyed aggregation for document
  * frequency, a vocab join back (the BM25-statistics skeleton —
  * [[TextStats.unigramLogProb]] discusses the shape), then a top-k-per-doc
  * window over each document's OWN terms — partitioned by doc id, so the
  * window input is per-doc-vocabulary-sized and perfectly spread; no
  * corpus-wide sort anywhere.
  *
  * Cross-engine determinism: the score rides integer MICRO units —
  * `round(c * ln(nDocs/df) * 1e6)` cast to BIGINT (the established micro
  * device: libm last-ulp `ln` divergence is absorbed by the rounding) —
  * and the top-k cut orders by (micro desc, term asc), total and exact.
  * `tfidf` is the 6-dp double view of the exact micro score.
  */
object Keywords {

  /** Top-`topK` TF-IDF terms per document: (idCol, term, c, tfidf, rnk).
    * Tokenizer: the corpus-stats standard (alnum runs, >2 chars,
    * lowercased). IDF is the plain `ln(N/df)` form — terms present in
    * every document score exactly zero and rank by the term tiebreak.
    */
  def docKeywords(docs: DataFrame, topK: Int = 3,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val toks = Tok.terms(col(textCol))
    val dt = docs.select(col(idCol), explode(toks).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("c"))
    val df = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = broadcast(docs.agg(count(lit(1)).cast("double").as("n_docs")))
    val scored = dt.join(df, "term").crossJoin(nDocs)
      .select(col(idCol), col("term"), col("c"),
        round(col("c").cast("double") *
          log(col("n_docs") / col("df").cast("double")) * 1e6)
          .cast("long").as("micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("micro").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col(idCol), col("term"), col("c"),
        round(col("micro").cast("double") / 1e6, 6).as("tfidf"),
        col("rnk"))
  }

  /** DuckDB twin of the `doc_keywords` gate: same tokenizer, micro
    * rounding, and (micro desc, term asc) window cut.
    */
  def docKeywordsSql(topK: Int = 3): String = {
    val arr = Tok.termsSql()
    s"""WITH d AS (SELECT doc_id, $arr AS arr FROM documents),
inst AS (SELECT doc_id, unnest(arr) AS term FROM d),
dt AS (SELECT doc_id, term, count(*) AS c FROM inst GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (SELECT doc_id, term, CAST(c AS BIGINT) AS c,
  CAST(round(CAST(c AS DOUBLE) *
    ln((SELECT n_docs FROM n) / CAST(df AS DOUBLE)) * 1e6) AS BIGINT)
    AS micro
  FROM dt JOIN df USING (term)),
r AS (SELECT doc_id, term, c, micro,
  row_number() OVER (PARTITION BY doc_id ORDER BY micro DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, c, round(CAST(micro AS DOUBLE) / 1e6, 6) AS tfidf,
  CAST(rnk AS INTEGER) AS rnk
FROM r WHERE rnk <= $topK ORDER BY doc_id, rnk"""
  }
}
