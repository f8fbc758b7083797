package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram collocation mining — the phrase-vocabulary pass of word2vec-era
  * pipelines (Mikolov et al. 2013 §4 learns "new_york"-style phrases from
  * exactly this statistic) and the collocation report of every corpus
  * linguistics toolkit: adjacent word pairs ranked by pointwise mutual
  * information, thresholded on a minimum count so rare coincidences don't
  * dominate.
  *
  * Plan shape at 100 TB: ADJACENT bigrams only — the fan-out is n_tokens-1
  * per document (never the all-pairs co-occurrence explosion), keyed on the
  * bigram itself with map-side combine, so hot bigrams ("of the") arrive at
  * the reducer pre-summed per partition. Unigram counts ride the SAME
  * tokenize pass (one corpus scan total); grand totals are broadcast
  * scalars. The PMI join keys on the two component unigrams — the unigram
  * table is vocabulary-sized, and Catalyst broadcasts it at any realistic
  * vocabulary/cluster ratio.
  *
  * Cross-engine determinism: counts are exact integers; PMI =
  * ln(c_ab * N_uni^2 / (N_bi * c_a * c_b)) is computed in doubles from
  * exact integers and rounded to integer MICRO units (the
  * [[Keywords.docKeywords]] device), so ordering and values match DuckDB
  * bit-for-bit. Ordering: (pmi_micro desc, bigram asc) — total.
  */
object Collocations {

  /** Top-`topK` adjacent-bigram collocations with count >= `minCount`:
    * (w1, w2, c_bigram, c_w1, c_w2, pmi). Tokenizer: the corpus-stats
    * standard (alnum runs, >2 chars, lowercased).
    */
  def pmiBigrams(docs: DataFrame, minCount: Int = 5, topK: Int = 20,
                 textCol: String = "text"): DataFrame = {
    val toks = Tok.terms(col(textCol))
    val base = docs.select(toks.as("ts"))
    // one tokenize pass feeds both grams: bigrams zip the array with its
    // own tail; unigrams explode the same array
    val bi = base.select(explode(Tok.adjacentPairs(col("ts"))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c_bigram"))
    val uni = base.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nUni = broadcast(uni.agg(sum("c").cast("double").as("n_uni")))
    val nBi = broadcast(bi.agg(sum("c_bigram").cast("double").as("n_bi")))
    val u1 = uni.select(col("w").as("w1"), col("c").as("c_w1"))
    val u2 = uni.select(col("w").as("w2"), col("c").as("c_w2"))
    bi.filter(col("c_bigram") >= minCount)
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(nUni).crossJoin(nBi)
      .select(col("w1"), col("w2"), col("c_bigram"), col("c_w1"),
        col("c_w2"),
        round(log(col("c_bigram").cast("double") * col("n_uni") *
          col("n_uni") /
          (col("n_bi") * col("c_w1").cast("double") *
            col("c_w2").cast("double"))) * 1e6)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("c_bigram"), col("c_w1"),
        col("c_w2"),
        round(col("pmi_micro").cast("double") / 1e6, 6).as("pmi"))
  }

  /** DuckDB twin of the `colloc_pmi` gate: same tokenizer, adjacency zip,
    * counts, micro rounding, and (pmi_micro desc, w1, w2) cut.
    */
  def pmiBigramsSql(minCount: Int = 5, topK: Int = 20): String = {
    val arr = Tok.termsSql()
    s"""WITH d AS (SELECT $arr AS ts FROM documents),
bi AS (SELECT ts[i] AS w1, ts[i+1] AS w2, count(*) AS c_bigram
  FROM d, unnest(range(1, len(ts))) t(i) GROUP BY 1, 2),
uni AS (SELECT unnest(ts) AS w FROM d),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_uni FROM uc),
nb AS (SELECT CAST(sum(c_bigram) AS DOUBLE) AS n_bi FROM bi),
scored AS (SELECT w1, w2, c_bigram, a.c AS c_w1, b.c AS c_w2,
  CAST(round(ln(CAST(c_bigram AS DOUBLE) * n_uni * n_uni /
    (n_bi * CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))) * 1e6) AS BIGINT)
    AS pmi_micro
  FROM bi JOIN uc a ON bi.w1 = a.w JOIN uc b ON bi.w2 = b.w, nu, nb
  WHERE c_bigram >= $minCount)
SELECT w1, w2, c_bigram, c_w1, c_w2,
  round(CAST(pmi_micro AS DOUBLE) / 1e6, 6) AS pmi
FROM scored ORDER BY pmi_micro DESC, w1, w2 LIMIT $topK"""
  }
}
