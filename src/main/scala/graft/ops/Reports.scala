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

  /** Per-source EXACT length quantiles — the distribution profile behind
    * every corpus datasheet ("sources whose median doc collapsed after the
    * boilerplate pass", packing-efficiency planning off p95 length): for
    * each source, the interpolated p25/p50/p75/p95 of `n_chars` plus count
    * and 6-dp mean, ordered by source.
    *
    * Plan shape at 100 TB: one aggregation keyed on source. Spark's exact
    * `percentile` aggregate keeps a value→count map per group, so executor
    * state is bounded by the DISTINCT length cardinality (≤ a few 10^6 for
    * any real doc-length column), not by row count — partial maps merge
    * map-side like any algebraic agg. All four quantiles fold into the
    * SAME grouping pass (one shuffle); for a column with unbounded value
    * cardinality the drop-in scale path is `approx_percentile` with the
    * same call shape. Interpolation is the shared definition (index
    * p·(n−1), linear between floor/ceil neighbours) that DuckDB's
    * `quantile_cont` computes, so the gate is value-exact at 6 dp.
    */
  def sourceQuantiles(docs: DataFrame, valCol: String = "n_chars"): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(percentile(col(valCol), lit(0.25)), 6).as("p25"),
        round(percentile(col(valCol), lit(0.5)), 6).as("p50"),
        round(percentile(col(valCol), lit(0.75)), 6).as("p75"),
        round(percentile(col(valCol), lit(0.95)), 6).as("p95"),
        round(sum(valCol).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_chars"))

  /** Per-source TOP-TERM profile — the "what is this source about" table
    * in a corpus datasheet (and the cheap drift sentinel: a source whose
    * top terms flip between crawls changed its nature): the k most
    * frequent stop-filtered terms per source with their counts,
    * deterministic ties (term asc). Returns (source, rk, term, cnt).
    *
    * Plan shape at 100 TB: one (source, term)-keyed partial+final count
    * (map-side combine absorbs the per-task repetition of hot terms),
    * then a row_number window on the source key — Spark's
    * WindowGroupLimit pushes the k-cut MAP-SIDE, so only ~k rows per
    * source per task reach the window exchange. No global sort, no
    * per-source re-scan.
    */
  def sourceTopTerms(docs: DataFrame, k: Int = 10,
                     textCol: String = "text"): DataFrame = {
    val stop = graft.analysis.Analyzer.defaultStopWords.toSeq.sorted
    val terms = docs.select(col("source"),
        explode(Tok.terms(col(textCol))).as("term"))
      .filter(!col("term").isin(stop.map(lit): _*))
    val counts = terms.groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("cnt").desc, col("term").asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk"), col("term"), col("cnt"))
  }

  /** DuckDB twin of [[sourceTopTerms]] — same tokenizer, stop list, count,
    * rank rule.
    */
  def sourceTopTermsSql(k: Int = 10): String =
    s"""WITH terms AS (SELECT source, unnest(${Tok.termsSql()}) AS term
  FROM documents),
c AS (SELECT source, term, count(*) AS cnt FROM terms
  WHERE term NOT IN (${graft.search.OracleSql.stopList})
  GROUP BY source, term),
r AS (SELECT source, term, cnt,
  CAST(row_number() OVER (PARTITION BY source
    ORDER BY cnt DESC, term ASC) AS INTEGER) AS rk FROM c)
SELECT source, rk, term, cnt FROM r WHERE rk <= $k
ORDER BY source, rk"""

  /** DuckDB twin of [[sourceQuantiles]] (`quantile_cont` = the same
    * interpolated-quantile definition).
    */
  def sourceQuantilesSql: String =
    """SELECT source,
  count(*) AS n_docs,
  round(quantile_cont(n_chars, 0.25), 6) AS p25,
  round(quantile_cont(n_chars, 0.5), 6) AS p50,
  round(quantile_cont(n_chars, 0.75), 6) AS p75,
  round(quantile_cont(n_chars, 0.95), 6) AS p95,
  round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS mean_chars
FROM documents GROUP BY source ORDER BY source"""

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

  /** Postings-skew diagnostics: the top-k terms by document frequency
    * with each term's share of total postings and the running cumulative
    * share — the table that tells an index operator which keys need
    * salting/splitting (a term in 30% of documents is a shuffle hot key
    * AND a block-max WAND fast-skip candidate) and how heavy the head of
    * the postings distribution is overall.
    *
    * Plan shape at 100 TB: the (doc, term) tf pass is shuffle 1 (partial
    * counts map-side), the df rollup is shuffle 2 over VOCABULARY-scale
    * rows, the top-k cut is a TakeOrdered (no global sort materialized),
    * and the share/cumulative window runs over k rows only — the
    * single-partition window is bounded by construction, never
    * corpus-sized. The scalar postings total rides a broadcast
    * single-row crossJoin, not a driver collect.
    *
    * Terms are the search chain's pre-stem tokens (stop-filtered, the
    * `a2_term_freqs` contract) so shares line up with the a1/a5 vocab
    * gates.
    */
  def indexSkew(docs: DataFrame, k: Int = 20,
                textCol: String = "text"): DataFrame = {
    val stop = graft.analysis.Analyzer.defaultStopWords.toSeq.sorted
    val tf = docs.select(col("doc_id"),
        explode(Tok.terms(col(textCol))).as("term"))
      .filter(!col("term").isin(stop.map(lit): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // localCheckpoint: df feeds BOTH the scalar total and the top-k cut,
    // and Catalyst does not share subtrees — without it the corpus is
    // scanned twice. Vocabulary-scale materialization, the same contract
    // a1_vocab's ranged-id assignment already pays.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df")).localCheckpoint()
    val tot = df.agg(sum(col("df")).cast("double").as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("term").asc)
    df.orderBy(col("df").desc, col("term").asc).limit(k)
      .crossJoin(broadcast(tot))
      .select(
        row_number().over(w).as("rk"),
        col("term"), col("df"),
        round(col("df").cast("double") / col("t"), 6).as("share"),
        round(sum(col("df")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))
          .cast("double") / col("t"), 6).as("cum_share"))
  }

  /** Per-host LANGUAGE-MIX ENTROPY — the "one host, many languages"
    * spam/MT-farm signal web-corpus filters use alongside the PageRank
    * prior: Shannon entropy (log10) of each host's language distribution
    * (0 = monolingual host, high = machine-translation farm). Hosts are
    * the deterministic doc_id-derived host space of the host-graph ops.
    *
    * Exactness: the [[TextStats.charEntropy]] micro-int device lifted to
    * column form — each language's term round(10⁶·c·log10(n/c)) is
    * non-negative (n ≥ c), so the per-host sum is order-free and both
    * engines' round() agree.
    *
    * Plan: ONE corpus-scale (host, lang) partial+final count — the only
    * shuffle — then host-scale arithmetic; the tiny count table is
    * localCheckpointed because it feeds both the totals and the join
    * back (no-subtree-sharing rule).
    */
  def hostLangEntropy(docs: DataFrame, hostSpace: Int = 50): DataFrame = {
    val counts = docs
      .select((col("doc_id") % hostSpace).as("host"), col("lang"))
      .groupBy("host", "lang").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = counts.groupBy(col("host").as("h")).agg(sum("c").as("n"))
    counts.join(tot, col("host") === col("h"))
      .select(col("host"), col("c"), col("n"),
        round(lit(1e6) * col("c").cast("double") *
          log10(col("n").cast("double") / col("c").cast("double")))
          .cast("long").as("micro"))
      .groupBy("host")
      .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_langs"),
        round(sum(col("micro")).cast("double") /
          (lit(1e6) * max(col("n")).cast("double")), 6).as("lang_entropy"))
  }

  /** DuckDB twin of [[hostLangEntropy]]. */
  def hostLangEntropySql(hostSpace: Int = 50): String =
    s"""WITH cl AS (SELECT doc_id % $hostSpace AS host, lang, count(*) AS c
  FROM documents GROUP BY 1, 2),
t AS (SELECT host, CAST(sum(c) AS BIGINT) AS n FROM cl GROUP BY host),
m AS (SELECT cl.host, cl.c, t.n,
  CAST(round(1000000.0 * CAST(cl.c AS DOUBLE) *
    log10(CAST(t.n AS DOUBLE) / CAST(cl.c AS DOUBLE))) AS BIGINT) AS micro
  FROM cl JOIN t USING (host))
SELECT host, max(n) AS n_docs, count(*) AS n_langs,
  round(CAST(sum(micro) AS DOUBLE) / (1000000.0 * CAST(max(n) AS DOUBLE)), 6)
    AS lang_entropy
FROM m GROUP BY host ORDER BY host"""

  /** DuckDB twin of [[indexSkew]] — the same stop-filtered tf/df chain
    * as the a1/a2/a5 gates, same top-k cut, same 6-dp share rounding.
    */
  def indexSkewSql(k: Int = 20): String = {
    import graft.search.OracleSql
    s"""WITH ${OracleSql.tokCte},
${OracleSql.tfCte},
${OracleSql.dfCte},
tot AS (SELECT CAST(sum(df) AS DOUBLE) AS t FROM df),
top AS (SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT $k),
r AS (SELECT term, CAST(df AS BIGINT) AS df,
  CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INTEGER) AS rk,
  CAST(sum(df) OVER (ORDER BY df DESC, term ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM top)
SELECT rk, term, df, round(CAST(df AS DOUBLE) / t, 6) AS share,
  round(CAST(cum AS DOUBLE) / t, 6) AS cum_share
FROM r, tot ORDER BY rk"""
  }
}
