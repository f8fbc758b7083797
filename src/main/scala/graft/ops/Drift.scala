package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift / "dataset diff": per-term weighted log-odds ratio between
  * two slices of a corpus, z-scored — Monroe et al. 2008's "Fightin'
  * Words" statistic with a +0.5 Haldane–Anscombe prior. The standard
  * curation question it answers: what is lexically DISTINCTIVE about this
  * source / this crawl snapshot / this filtered subset, before and after a
  * pipeline change. (A plain frequency-ratio top-k drowns in rare terms;
  * the z-scoring is what makes the statistic usable.)
  *
  * Plan shape at 100 TB: ONE corpus scan (the slice membership is a
  * conditional-aggregation flag, never a second pass or a self-join), one
  * vocabulary-keyed aggregation with map-side combine, a broadcast scalar
  * for the two grand totals, and a top-k sort over the (minCount-filtered)
  * vocabulary — corpus-size work only in the first two narrow steps.
  *
  * Cross-engine determinism: counts are exact integers; `lor`/`z` are
  * single double expressions over those integers, identical formula both
  * engines (libm `ln` last-ulp divergence is absorbed by the 6-dp round —
  * the same trade [[TextStats.unigramLogProb]] documents for `log10`).
  * Ordering is on the ROUNDED z with a term tiebreak, so the top-k cut is
  * deterministic wherever the gate's hash compare is.
  */
object Drift {

  /** Top-`topK` most slice-A-distinctive terms: (term, cnt_a, cnt_b, lor,
    * z), z descending. `inA` is the slice predicate (evaluated per
    * document); terms with `cnt_a + cnt_b < minCount` are dropped AFTER
    * the totals are taken, so the prior sees true corpus mass.
    * Tokenizer: the corpus-stats standard — alnum runs, >2 chars,
    * lowercased (see [[TextStats.unigramLogProb]]).
    */
  def logOddsDrift(docs: DataFrame, inA: Column, textCol: String = "text",
                   minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val toks = Tok.terms(col(textCol))
    val inst = docs.select(inA.as("in_a"), explode(toks).as("term"))
    val c = inst.groupBy("term").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("in_a"), 0L).otherwise(1L)).as("cnt_b"))
    val tot = broadcast(c.agg(
      sum("cnt_a").cast("double").as("ta"),
      sum("cnt_b").cast("double").as("tb")))
    val a = col("cnt_a").cast("double")
    val b = col("cnt_b").cast("double")
    val lor = log((a + 0.5) / (col("ta") - a + 0.5)) -
      log((b + 0.5) / (col("tb") - b + 0.5))
    val z = lor / sqrt(lit(1.0) / (a + 0.5) + lit(1.0) / (b + 0.5))
    c.filter(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(tot)
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        round(lor, 6).as("lor"), round(z, 6).as("z"))
      .orderBy(col("z").desc, col("term").asc)
      .limit(topK)
  }

  /** DuckDB twin of the `corpus_drift` gate (slice A = source 'src0'):
    * same tokenizer, same conditional aggregation, same formula, same
    * rounded-z ordering. Integer sums cast back from DuckDB's HUGEINT.
    */
  def logOddsDriftSql(source: String = "src0", minCount: Long = 5L,
                      topK: Int = 50): String = {
    val arr = Tok.termsSql()
    s"""WITH d AS (SELECT (source = '$source') AS in_a, $arr AS arr FROM documents),
inst AS (SELECT in_a, unnest(arr) AS term FROM d),
c AS (SELECT term,
  CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
  CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
  FROM inst GROUP BY term),
tot AS (SELECT CAST(sum(cnt_a) AS DOUBLE) AS ta,
               CAST(sum(cnt_b) AS DOUBLE) AS tb FROM c),
z AS (SELECT term, cnt_a, cnt_b,
  ln((CAST(cnt_a AS DOUBLE) + 0.5) /
     ((SELECT ta FROM tot) - CAST(cnt_a AS DOUBLE) + 0.5)) -
  ln((CAST(cnt_b AS DOUBLE) + 0.5) /
     ((SELECT tb FROM tot) - CAST(cnt_b AS DOUBLE) + 0.5)) AS lor,
  1.0 / (CAST(cnt_a AS DOUBLE) + 0.5) +
  1.0 / (CAST(cnt_b AS DOUBLE) + 0.5) AS v
  FROM c WHERE cnt_a + cnt_b >= $minCount)
SELECT term, cnt_a, cnt_b, round(lor, 6) AS lor,
  round(lor / sqrt(v), 6) AS z
FROM z ORDER BY z DESC, term LIMIT $topK"""
  }
}
