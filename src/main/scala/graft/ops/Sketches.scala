package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sketches — the cardinality/weight estimators a 100-TB
  * pipeline runs where exact answers are unaffordable, built so the gate
  * can still be EXACT: the randomness comes from a cryptographic hash of
  * the value itself (sha256 prefix → uniform 60-bit integer), not from an
  * RNG, so both engines materialize bit-identical sketches.
  *
  *  - [[kmvDistinct]]: K-Minimum-Values distinct-count estimator
  *    (Bar-Yossef et al. 2002; the bottom-k form in Beyer et al.,
  *    SIGMOD 2007) — keep the k smallest hash values per group; the
  *    k-th smallest, scaled, estimates the cardinality. The 100-TB
  *    rationale: a distinct count shuffles the whole key space, the
  *    sketch moves k values per group per partition.
  *  - [[prioritySample]]: priority sampling (Duffield-Lund-Thorup,
  *    JACM 2007) — weight-aware fixed-k sample with unbiased
  *    subset-sum estimates: priority = w / u(hash), keep the top k,
  *    estimate each kept item as max(w, τ) where τ is the (k+1)-th
  *    priority. The sampling stage every weighted-mixture corpus cut
  *    runs at scale.
  *
  * Both ride Spark 4's `WindowGroupLimit`: the rank-filter window pushes
  * a partial top-k/bottom-k below the exchange (the `anchor_text`
  * plan-review precedent), so map tasks emit k rows per group, never the
  * full key space.
  */
object Sketches {

  /** Uniform 60-bit integer from a string column: the first 15 hex chars
    * of sha256. 60 bits fits a signed BIGINT (< 2^63) so Spark's long and
    * DuckDB's UBIGINT order identically; the later integer->double casts
    * round to nearest (values above 2^53 lose low bits) but all three
    * twins — Spark, DuckDB, the spec's local reimplementation — perform
    * the SAME IEEE cast, so the estimator arithmetic is deterministic
    * across engines (not exact in the low bits, and must not be treated
    * as such when porting the twin to an engine with wider floats).
    */
  private def h60(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  private def h60Sql(e: String): String =
    s"CAST('0x' || substr(sha256($e), 1, 15) AS UBIGINT)"

  private val Two60 = "1152921504606846976.0" // 2^60 as a double literal

  /** Per-language KMV distinct-term estimate beside the exact count:
    * (lang, n_exact, kth rank actually kept, estimate, relative error).
    * Groups with fewer than k distinct terms store the whole set — the
    * estimate is then exact by construction (the KMV small-set rule).
    *
    * Plan: ONE (lang, term) distinct partial+final aggregate is the only
    * corpus-scale shuffle (localCheckpointed — it feeds the sketch AND
    * the exact count; Catalyst shares no subtrees); the bottom-k window
    * runs under WindowGroupLimit (map-side partial bottom-k), and
    * everything after is lang-cardinality-sized.
    */
  def kmvDistinct(docs: DataFrame, k: Int = 64,
                  textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val terms = docs
      .select(col(langCol).as("lang"),
        explode(Tok.terms(col(textCol))).as("term"))
      .distinct()
      .localCheckpoint(eager = true)
    val hashed = terms.select(col("lang"), col("term"), h60(col("term")).as("u"))
    val rn = row_number().over(
      Window.partitionBy("lang").orderBy(col("u").asc, col("term").asc))
    val sketch = hashed.withColumn("rn", rn).filter(col("rn") <= k)
      .groupBy("lang").agg(
        max(col("rn")).cast("long").as("n_kept"),
        max(when(col("rn") === k, col("u"))).as("kth_u"))
    val exact = terms.groupBy("lang").agg(count(lit(1)).as("n_exact"))
    sketch.join(exact, Seq("lang"))
      .select(col("lang"), col("n_exact"), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Two60.toDouble) /
            col("kth_u").cast("double")), 6).as("est"))
      .withColumn("rel_err",
        round(abs(col("est") - col("n_exact")) / col("n_exact"), 6))
      .orderBy("lang")
  }

  /** DuckDB twin of the `sketch_kmv_distinct` gate. */
  def kmvDistinctSql(k: Int = 64): String =
    s"""WITH toks AS (SELECT lang, unnest(${Tok.termsSql("text")}) AS term
  FROM documents),
terms AS (SELECT DISTINCT lang, term FROM toks),
hashed AS (SELECT lang, term, ${h60Sql("term")} AS u FROM terms),
ranked AS (SELECT lang, u,
    row_number() OVER (PARTITION BY lang ORDER BY u ASC, term ASC) AS rn
  FROM hashed),
sk AS (SELECT lang, max(rn) AS n_kept,
    max(CASE WHEN rn = $k THEN u END) AS kth_u
  FROM ranked WHERE rn <= $k GROUP BY lang),
ex AS (SELECT lang, count(*) AS n_exact FROM terms GROUP BY lang),
est AS (SELECT sk.lang, ex.n_exact, CAST(sk.n_kept AS BIGINT) AS n_kept,
  round(CASE WHEN sk.n_kept < $k THEN CAST(sk.n_kept AS DOUBLE)
        ELSE ${(k - 1).toDouble} * $Two60 / CAST(sk.kth_u AS DOUBLE) END, 6)
    AS est
  FROM sk JOIN ex ON sk.lang = ex.lang)
SELECT lang, n_exact, n_kept, est,
  round(abs(est - n_exact) / n_exact, 6) AS rel_err
FROM est ORDER BY lang"""

  /** KMV sketch MERGE — the property that justifies sketches at 100 TB:
    * per-source bottom-k summaries are built in ONE corpus pass, then any
    * pair's union cardinality and Jaccard are estimated from the two
    * k-value summaries alone (Broder 1997 resemblance + the
    * Beyer et al. merged-KMV union estimator) — no second corpus pass, no
    * per-pair shuffle, summaries mergeable across partitions/sources by
    * construction. [[Overlap.sourceOverlap]] is this table's EXACT twin;
    * the sketch form is what survives when the pair grid or the shingle
    * space no longer fits a pass.
    *
    * Estimators, all from the merged bottom-k M = bottomK(Sa ∪ Sb):
    * union_est = (k-1)·2^60/max(M) (small-set exact when |Sa ∪ Sb| < k);
    * jaccard_est = |M ∩ Sa ∩ Sb| / |M|; inter_est = jaccard·union.
    * Deterministic (hash randomness), so the gate is exact.
    *
    * Plan: one (source, term) distinct agg -> per-source bottom-k window
    * (WindowGroupLimit) -> a source-cardinality table of ≤k-element
    * sorted arrays -> broadcast pair grid with ROW-LOCAL array algebra.
    */
  def kmvSourceOverlap(docs: DataFrame, k: Int = 64,
                       textCol: String = "text",
                       srcCol: String = "source"): DataFrame = {
    val terms = docs
      .select(col(srcCol).as("source"),
        explode(Tok.terms(col(textCol))).as("term"))
      .distinct()
    val hashed = terms.select(col("source"), col("term"),
      h60(col("term")).as("u"))
    val rn = row_number().over(
      Window.partitionBy("source").orderBy(col("u").asc, col("term").asc))
    val sk = hashed.withColumn("rn", rn).filter(col("rn") <= k)
      .groupBy("source")
      .agg(sort_array(collect_list(col("u"))).as("sk"),
        count(lit(1)).as("n_sk"))
    val a = sk.select(col("source").as("source_a"), col("sk").as("ska"),
      col("n_sk").as("n_a"))
    val b = sk.select(col("source").as("source_b"), col("sk").as("skb"),
      col("n_sk").as("n_b"))
    val grid = a.crossJoin(broadcast(b))
      .filter(col("source_a") < col("source_b"))
    val mergedAll = array_sort(array_union(col("ska"), col("skb")))
    val m = slice(mergedAll, 1, k)
    val kth = element_at(m, size(m))
    val unionEst = when(size(mergedAll) < k,
      size(mergedAll).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Two60.toDouble) /
        kth.cast("double"))
    val ovl = size(array_intersect(array_intersect(m, col("ska")),
      col("skb"))).cast("double")
    grid.select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(unionEst, 6).as("union_est"),
        round(ovl / size(m).cast("double"), 6).as("jaccard_est"),
        round(ovl * unionEst / size(m).cast("double"), 6).as("inter_est"))
      .orderBy("source_a", "source_b")
  }

  /** DuckDB twin of the `sketch_source_overlap` gate. */
  def kmvSourceOverlapSql(k: Int = 64): String =
    s"""WITH toks AS (SELECT source, unnest(${Tok.termsSql("text")}) AS term
  FROM documents),
terms AS (SELECT DISTINCT source, term FROM toks),
hashed AS (SELECT source, term, ${h60Sql("term")} AS u FROM terms),
ranked AS (SELECT source, u,
    row_number() OVER (PARTITION BY source ORDER BY u ASC, term ASC) AS rn
  FROM hashed QUALIFY rn <= $k),
sk AS (SELECT source, list(u ORDER BY u ASC) AS sk,
    count(*) AS n_sk FROM ranked GROUP BY source),
grid AS (SELECT a.source AS source_a, b.source AS source_b,
    a.sk AS ska, b.sk AS skb,
    CAST(a.n_sk AS BIGINT) AS n_a, CAST(b.n_sk AS BIGINT) AS n_b
  FROM sk a JOIN sk b ON a.source < b.source),
calc AS (SELECT source_a, source_b, n_a, n_b,
    list_sort(list_distinct(list_concat(ska, skb))) AS ma, ska, skb
  FROM grid),
est AS (SELECT source_a, source_b, n_a, n_b, ska, skb,
    ma[1:$k] AS m, len(ma) AS n_ma FROM calc)
SELECT source_a, source_b, n_a, n_b,
  round(CASE WHEN n_ma < $k THEN CAST(n_ma AS DOUBLE)
        ELSE ${(k - 1).toDouble} * $Two60 / CAST(m[len(m)] AS DOUBLE) END, 6)
    AS union_est,
  round(CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
      / CAST(len(m) AS DOUBLE), 6) AS jaccard_est,
  round(CAST(len(list_intersect(list_intersect(m, ska), skb)) AS DOUBLE)
      * (CASE WHEN n_ma < $k THEN CAST(n_ma AS DOUBLE)
         ELSE ${(k - 1).toDouble} * $Two60 / CAST(m[len(m)] AS DOUBLE) END)
      / CAST(len(m) AS DOUBLE), 6) AS inter_est
FROM est ORDER BY source_a, source_b"""

  /** Priority sample of documents weighted by length: priority
    * q = w / u where u = hash(doc_id)/2^60 ∈ (0,1]; keep the k highest
    * priorities; τ = the (k+1)-th priority; each kept item's
    * Horvitz-Thompson weight estimate is max(w, τ). Σ max(w, τ) over the
    * sample is an unbiased estimate of Σ w over the corpus — the device
    * that lets a 100-TB pipeline cut a fixed-size weighted sample AND
    * keep calibrated corpus totals. Deterministic: u from sha256 of the
    * id, ties broken by id.
    *
    * Output: (doc_id, w, q_rank, est_w) for the k kept docs, plus the
    * corpus-total diagnostic columns (exact Σw, Σ est over sample,
    * relative error) broadcast onto every row — one corpus scan, one
    * bounded window (WindowGroupLimit k+1), one 1-row broadcast.
    */
  def prioritySample(docs: DataFrame, k: Int = 32,
                     idCol: String = "doc_id",
                     wCol: String = "n_chars"): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(wCol).cast("long").as("wl"))
    val u = (h60(col("doc_id").cast("string")).cast("double") + lit(1.0)) /
      lit(Two60.toDouble) // (0, 1]
    val pri = base.withColumn("w", col("wl").cast("double"))
      .withColumn("q", col("w") / u)
    val rn = row_number().over(
      Window.orderBy(col("q").desc, col("doc_id").asc))
    val ranked = pri.withColumn("rn", rn).filter(col("rn") <= k + 1)
      .localCheckpoint(eager = true) // feeds tau AND the kept set
    val tau = ranked.agg(min(when(col("rn") === k + 1, col("q"))).as("tau"))
    val kept = ranked.filter(col("rn") <= k).crossJoin(tau)
      .select(col("doc_id"), col("w"), col("rn").cast("long").as("q_rank"),
        round(greatest(col("w"), coalesce(col("tau"), lit(0.0))), 6)
          .as("est_w"))
    // sums in exact integer domain (micro units for the 6-dp est) so
    // distributed addend order cannot perturb the totals — the TPC-H
    // integer-cents device
    val totals = base.agg(sum(col("wl")).as("sum_w_exact"))
      .crossJoin(kept.agg((sum(round(col("est_w") * 1e6, 0).cast("long"))
          .cast("double") / 1e6).as("sum_w_est")))
      .select(col("sum_w_exact"), col("sum_w_est"),
        round(abs(col("sum_w_est") - col("sum_w_exact")) / col("sum_w_exact"), 6)
          .as("rel_err"))
    kept.crossJoin(totals).orderBy("q_rank")
  }

  /** DuckDB twin of the `sketch_priority_sample` gate. */
  def prioritySampleSql(k: Int = 32): String =
    s"""WITH base AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wl,
    CAST(n_chars AS DOUBLE) AS w FROM documents),
pri AS (SELECT doc_id, w,
    w / ((CAST(${h60Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 1.0) / $Two60)
      AS q
  FROM base),
ranked AS (SELECT doc_id, w, q,
    row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rn
  FROM pri QUALIFY rn <= ${k + 1}),
tau AS (SELECT min(CASE WHEN rn = ${k + 1} THEN q END) AS tau FROM ranked),
kept AS (SELECT doc_id, w, CAST(rn AS BIGINT) AS q_rank,
    round(greatest(w, coalesce((SELECT tau FROM tau), 0.0)), 6) AS est_w
  FROM ranked WHERE rn <= $k),
totals AS (SELECT (SELECT CAST(sum(wl) AS BIGINT) FROM base) AS sum_w_exact,
    CAST(sum(CAST(round(est_w * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6
      AS sum_w_est FROM kept)
SELECT kept.doc_id, kept.w, kept.q_rank, kept.est_w,
  totals.sum_w_exact, totals.sum_w_est,
  round(abs(totals.sum_w_est - totals.sum_w_exact) / totals.sum_w_exact, 6)
    AS rel_err
FROM kept, totals ORDER BY q_rank"""
}
