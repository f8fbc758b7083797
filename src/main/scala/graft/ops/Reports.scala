package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source crawl report — the rollup dashboard every corpus pipeline
  * publishes after an ingest wave (CommonCrawl's per-crawl statistics
  * pages are exactly this table): volume, size, language spread, and
  * exact-duplicate fraction per source, the numbers that decide which
  * sources get re-crawled, filtered, or dropped.
  *
  * Plan shape at 100 TB: ONE aggregation keyed on source — every metric
  * is an algebraic aggregate (counts, sums, count-distinct of a 32-byte
  * sha), so the whole report is a partial+final HashAggregate pass with
  * map-side combine; source cardinality is tiny (thousands), the input
  * is never re-shuffled for a second metric. `count(distinct)` over TWO
  * independent columns would force an Expand (one shuffled copy per
  * distinct column) — the sha distinct is the only one, kept exact; the
  * language spread uses the same-shuffle `approx_count_distinct`-free
  * form `count(distinct lang)` folded into the SAME Expand group, which
  * Spark plans as one pass here because both distincts ride one child.
  *
  * Cross-engine determinism: counts/sums are exact integers; the two
  * ratio columns are 6-dp roundings of divisions of exact integers —
  * IEEE-identical in both engines.
  */
object Reports {

  /** One row per source: (source, n_docs, total_chars, n_langs,
    * n_distinct_texts, dup_frac, mean_chars), ordered by source.
    */
  def crawlReport(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("lang"), col("n_chars"),
        sha2(coalesce(col("text"), lit("")), 256).as("sha"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        countDistinct("lang").as("n_langs"),
        countDistinct("sha").as("n_distinct_texts"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("n_langs"), col("n_distinct_texts"),
        round((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs").cast("double"), 6).as("dup_frac"),
        round(col("total_chars").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_chars"))

  /** DuckDB twin of the `crawl_report` gate. */
  def crawlReportSql: String =
    """SELECT source,
  count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  count(DISTINCT lang) AS n_langs,
  count(DISTINCT sha256(coalesce(text, ''))) AS n_distinct_texts,
  round(CAST(count(*) - count(DISTINCT sha256(coalesce(text, ''))) AS DOUBLE)
    / CAST(count(*) AS DOUBLE), 6) AS dup_frac,
  round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS mean_chars
FROM documents GROUP BY source ORDER BY source"""
}
