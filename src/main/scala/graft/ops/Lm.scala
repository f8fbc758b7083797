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
  def bigramLogProbSql: String = {
    val arr = Tok.termsSql()
    s"""WITH d AS (SELECT doc_id, $arr AS ts FROM documents),
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
  CAST(sum(micro) AS BIGINT) AS micro FROM contrib GROUP BY doc_id)
SELECT docs.doc_id, CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  round(CAST(per.micro AS DOUBLE) / 1e6 / per.n_bigrams, 6) AS avg_logprob
FROM documents docs LEFT JOIN per USING (doc_id) ORDER BY docs.doc_id"""
  }
}
