package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram-interpolated language-model quality score — the next rung above
  * [[TextStats.unigramLogProb]] on the CCNet/RefinedWeb perplexity-filter
  * ladder (production uses a 5-gram KenLM; the in-engine honest form is a
  * Jelinek-Mercer-interpolated bigram model trained on the corpus's own
  * counts): per document, the mean over adjacent token pairs of
  * `log10(lambda * p(w2|w1) + (1-lambda) * p(w2))`. Low scores mark
  * gibberish and boilerplate whose word ORDER is unlikely even when the
  * words themselves are common — exactly what the unigram score cannot
  * see.
  *
  * Plan shape at 100 TB: the same BM25-statistics shuffle skeleton as the
  * unigram score, one rung up — ONE tokenize scan producing per-doc
  * adjacent-pair partial counts ([[Collocations]]'s zip-with-tail device,
  * fan-out n_tokens-1 per row, never all-pairs), one bigram-keyed and one
  * vocab-keyed aggregation, vocabulary-sized join-backs, a doc-keyed sum.
  * Grand totals ride a broadcast scalar.
  *
  * Cross-engine determinism: each (doc, bigram) contribution is rounded
  * to integer MICRO units, so the per-doc sum is ORDER-FREE; the
  * interpolation expression is written literal-for-literal the same in
  * both engines (0.75 / 0.25 are exactly representable doubles).
  * `p(w2|w1)` uses the full unigram count of w1 as the history
  * denominator (not bigram-start counts) — a documented simplification
  * that keeps the model one join narrower; the interpolation absorbs the
  * end-of-document mass it ignores.
  */
object Lm {

  /** Per-document mean interpolated bigram log10-prob: (idCol, n_bigrams,
    * avg_logprob). Documents with fewer than two analyzed tokens emit
    * n_bigrams = 0 and a null score. Tokenizer: the corpus-stats standard
    * (alnum runs, >2 chars, lowercased).
    */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val toks = Tok.terms(col(textCol))
    val base = docs.select(col(idCol), toks.as("ts"))
    // per-doc adjacent-pair counts (one tokenize pass; zip with own tail)
    val db = base.select(col(idCol),
        explode(Tok.adjacentPairs(col("ts"))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val cb = db.groupBy("w1", "w2").agg(sum("c").as("cb"))
    val uni = base.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = broadcast(uni.agg(sum("cnt").cast("double").as("total")))
    val u1 = uni.select(col("w").as("w1"), col("cnt").as("cw1"))
    val u2 = uni.select(col("w").as("w2"), col("cnt").as("cw2"))
    val contrib = db.join(cb, Seq("w1", "w2")).join(u1, "w1").join(u2, "w2")
      .crossJoin(tot)
      .select(col(idCol), col("c"),
        round(col("c").cast("double") * log10(
          lit(0.75) * col("cb").cast("double") / col("cw1").cast("double") +
            lit(0.25) * col("cw2").cast("double") / col("total")) * 1e6)
          .cast("long").as("micro"))
    val per = contrib.groupBy(idCol)
      .agg(sum("c").as("n_bigrams"), sum("micro").as("micro"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("micro").cast("double") / 1e6 /
          col("n_bigrams").cast("double"), 6).as("avg_logprob"))
  }

  /** DuckDB twin of the `text_bigram_lp` gate: same tokenizer, adjacency,
    * interpolation literals, micro rounding, and per-doc integer sum.
    */
  /** CCNet-style quality bucketing (Wenzek et al. 2020): split the corpus
    * into head / middle / tail terciles of the LM score — WITHOUT a global
    * sort. ntile() over an unpartitioned window is a single-task sort at
    * corpus scale; instead the score is binned to milli-log-prob integers
    * (bounded cardinality: the observed score range is a few units, so a
    * few thousand bins regardless of corpus size), the tiny histogram's
    * descending-cumulative CDF yields the two threshold BINS (largest bin
    * b with 3*cum(b) >= n, resp. >= 2n — integer-exact in both engines),
    * and docs bucket by comparing their bin to the broadcast thresholds.
    * Bin-granularity terciles: every doc in one bin lands in one bucket
    * (no order-dependent tie split). Docs with no score (< 2 tokens) ->
    * 'unscored'. Returns (doc_id, avg_logprob, bucket).
    */
  def qualityBuckets(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val scored = bigramLogProb(docs, textCol, idCol)
    val binned = scored.withColumn("bin",
      floor(col("avg_logprob") * 1000).cast("long"))
    val hist = binned.filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val wcum = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // hist is bin-cardinality (bounded), so the unpartitioned cumsum
    // window and the scalar agg below are tiny by construction
    val cum = hist.withColumn("cum", sum(col("c")).over(wcum))
      .crossJoin(broadcast(hist.agg(sum("c").as("n"))))
    val thr = cum.agg(
      max(when(col("cum") * 3 >= col("n"), col("bin"))).as("t1"),
      max(when(col("cum") * 3 >= col("n") * 2, col("bin"))).as("t2"))
    binned.crossJoin(broadcast(thr))
      .select(col(idCol), col("avg_logprob"),
        when(col("bin").isNull, lit("unscored"))
          .when(col("bin") >= col("t1"), lit("head"))
          .when(col("bin") >= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Shared CTE chain for the bigram-LM twins: tokenize -> per-doc bigram
    * counts -> corpus counts -> interpolated micro contributions ->
    * `per(doc_id, n_bigrams, micro)`.
    */
  private def lmCtes: String = {
    val arr = Tok.termsSql()
    s"""d AS (SELECT doc_id, $arr AS ts FROM documents),
db AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2, count(*) AS c
  FROM d, unnest(range(1, len(ts))) t(i) GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cb FROM db GROUP BY w1, w2),
uni AS (SELECT unnest(ts) AS w FROM d),
uc AS (SELECT w, count(*) AS cnt FROM uni GROUP BY w),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uc),
contrib AS (SELECT doc_id, c,
  CAST(round(CAST(c AS DOUBLE) * log10(
    0.75 * CAST(cb AS DOUBLE) / CAST(a.cnt AS DOUBLE) +
    0.25 * CAST(b.cnt AS DOUBLE) / (SELECT total FROM tot)) * 1e6) AS BIGINT)
    AS micro
  FROM db JOIN cb USING (w1, w2)
    JOIN uc a ON db.w1 = a.w JOIN uc b ON db.w2 = b.w),
per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
  CAST(sum(micro) AS BIGINT) AS micro FROM contrib GROUP BY doc_id)"""
  }

  def bigramLogProbSql: String =
    s"""WITH $lmCtes
SELECT docs.doc_id, CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  round(CAST(per.micro AS DOUBLE) / 1e6 / per.n_bigrams, 6) AS avg_logprob
FROM documents docs LEFT JOIN per USING (doc_id) ORDER BY docs.doc_id"""

  /** DuckDB twin of [[qualityBuckets]]: the LM chain, the same
    * milli-log-prob integer bins, the descending-cumulative histogram CDF
    * (integer 3*cum >= n / >= 2n threshold rule), the same CASE bucket.
    */
  def qualityBucketsSql: String =
    s"""WITH $lmCtes,
lp AS (SELECT docs.doc_id,
  round(CAST(per.micro AS DOUBLE) / 1e6 / per.n_bigrams, 6) AS avg_logprob
  FROM documents docs LEFT JOIN per USING (doc_id)),
b AS (SELECT doc_id, avg_logprob,
  CAST(floor(avg_logprob * 1000) AS BIGINT) AS bin FROM lp),
hist AS (SELECT bin, count(*) AS c FROM b WHERE bin IS NOT NULL GROUP BY bin),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
cum AS (SELECT bin, CAST(sum(c) OVER (ORDER BY bin DESC) AS BIGINT) AS cum
  FROM hist),
thr AS (SELECT
  max(CASE WHEN cum * 3 >= (SELECT n FROM n) THEN bin END) AS t1,
  max(CASE WHEN cum * 3 >= (SELECT n FROM n) * 2 THEN bin END) AS t2
  FROM cum)
SELECT b.doc_id, b.avg_logprob,
  CASE WHEN b.bin IS NULL THEN 'unscored'
       WHEN b.bin >= thr.t1 THEN 'head'
       WHEN b.bin >= thr.t2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM b, thr ORDER BY b.doc_id"""
}
