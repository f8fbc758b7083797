package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET domain's feature distribution
  * than under the raw corpus's own — the published recipe for selecting
  * pretraining data that "looks like" a trusted target (Wikipedia, books)
  * without training a classifier. The importance weight drives the
  * resampling stage ([[Sampling]] ops consume it as a keep probability or
  * rank key); this operator produces the weight itself.
  *
  * Model, exactly as published: features are unigrams AND bigrams hashed
  * into K buckets (the paper uses 10^4; here K = 1024, a power of two so
  * the signed-JVM and unsigned-SQL bucket reductions agree bit-for-bit —
  * see below); both the target and raw distributions are Laplace-smoothed
  * bag-of-buckets `(count_b + 1) / (total + K)`; a document's weight is
  * the mean over its feature OCCURRENCES of
  * `log10 p_target(b) - log10 p_raw(b)`.
  *
  * Plan shape at 100 TB: the tokenize+hash pass is a compiled JVM loop
  * per doc (the same measured-faster choice as
  * [[TextStats.fingerprints]]), fanning out 2·n_tokens-1 hashed LONGS,
  * never strings. It runs TWICE — once to build the model, once to score:
  * pass 1 aggregates the feature stream straight into the raw+target
  * bucket histogram, whose partial aggregate collapses to ≤ K rows per
  * task BEFORE its exchange (nothing corpus-scale shuffles), and the
  * ≤ K-row histogram is persisted so the totals and λ table derive from
  * it without re-scanning; pass 2 builds the per-(doc, bucket) counts —
  * the corpus's ONE full-width shuffle — and joins the BROADCAST λ table
  * back for the doc-keyed integer sum. Target membership is a row-local
  * predicate (`source == targetSource`) folded into the histogram
  * aggregate, never a join.
  *
  * Cross-engine determinism: bucket = FNV-1a64(feature) reduced to K
  * buckets — K a power of two makes the JVM's sign-safe
  * `((h % K) + K) % K` equal the oracle's unsigned `h % K` (both are the
  * low 10 bits). Each (doc, bucket) contribution is rounded to integer
  * MICRO log-units before the per-doc sum (order-free, the [[Lm]]
  * discipline); the λ expression is written literal-for-literal the same
  * in both engines over exact-integer-valued doubles.
  */
object Dsir {

  /** Number of hash buckets (power of two — see class doc). */
  val K = 1024

  /** Hashed unigram+bigram bucket ids of a text, WITH multiplicity. */
  private[ops] def featureBuckets(text: String): Array[Long] = {
    val toks = Analyzer.tokenize(text)
    if (toks.isEmpty) return Array.empty
    val out = new Array[Long](2 * toks.length - 1)
    var i = 0
    while (i < toks.length) {
      val h = Dedup.fnv1a64(toks(i))
      out(i) = ((h % K) + K) % K
      i += 1
    }
    var j = 0
    while (j < toks.length - 1) {
      val h = Dedup.fnv1a64(toks(j) + " " + toks(j + 1))
      out(toks.length + j) = ((h % K) + K) % K
      j += 1
    }
    out
  }

  /** Per-document DSIR importance log-ratio:
    * (idCol, n_feats, dsir_logratio), one row per input document,
    * `dsir_logratio` = 6-dp mean per-occurrence
    * `log10 p_target - log10 p_raw` (null when the doc has no features).
    */
  def importanceWeights(docs: DataFrame, targetSource: String,
                        textCol: String = "text", idCol: String = "doc_id",
                        srcCol: String = "source"): DataFrame = {
    val featUdf = udf((s: String) => featureBuckets(s))
    val feats = docs.select(col(idCol), (col(srcCol) === targetSource).as("tgt"),
      explode(featUdf(coalesce(col(textCol), lit("")))).as("b"))
    // The histogram aggregates the RAW feature stream directly (not the
    // per-doc counts): the partial aggregate collapses to <= K rows per
    // task before its exchange, and the <= K-row result is PERSISTED so
    // the totals and the λ table read it without re-deriving the scan —
    // Catalyst does not share subtrees, and an unpersisted hist would
    // re-tokenize the corpus once per downstream use (the first explain
    // audit showed exactly that: three Generate subtrees).
    val hist = feats.groupBy("b").agg(
      count(lit(1)).as("rb"),
      sum(when(col("tgt"), lit(1L)).otherwise(lit(0L))).as("tb")).persist()
    val tot = broadcast(hist.agg(
      sum("rb").as("nr"), sum("tb").as("nt")))
    // λ per bucket in micro log10 units — ≤ K rows, broadcast back
    val lam = hist.crossJoin(tot).select(col("b"),
      (log10((col("tb") + lit(1L)).cast("double") /
          (col("nt") + lit(K.toLong)).cast("double")) -
        log10((col("rb") + lit(1L)).cast("double") /
          (col("nr") + lit(K.toLong)).cast("double"))).as("lam"))
    // per-(doc, bucket) counts — the corpus's one full-width shuffle
    val dbc = feats.groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))
    val contrib = dbc.join(broadcast(lam), "b")
      .select(col(idCol),
        col("c"),
        round(col("c").cast("double") * col("lam") * 1e6)
          .cast("long").as("micro"))
    val per = contrib.groupBy(idCol)
      .agg(sum("c").as("n_feats"), sum("micro").as("micro"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(col("micro").cast("double") / 1e6 /
          col("n_feats").cast("double"), 6).as("dsir_logratio"))
  }

  /** DuckDB twin of [[importanceWeights]]: the same tokenizer, FNV bucket
    * reduction (unsigned low bits == the JVM's sign-safe mod for K = 2^10),
    * Laplace-smoothed λ written with the identical literal structure, micro
    * rounding, and per-doc integer sum.
    */
  def importanceWeightsSql(targetSource: String): String = {
    val alnum = Tok.termsSql()
    s"""WITH toks AS (SELECT doc_id, source = '$targetSource' AS tgt,
  $alnum AS arr FROM documents),
idx AS (SELECT doc_id, tgt, arr, generate_subscripts(arr, 1) AS i FROM toks),
f AS (SELECT doc_id, tgt, arr[i] AS f FROM idx
  UNION ALL
  SELECT doc_id, tgt, arr[i] || ' ' || arr[i+1] AS f FROM idx
  WHERE i <= len(arr) - 1),
feats AS (SELECT doc_id, tgt,
  CAST(${DedupOracleSql.fnvSql("f")} % ${K} AS BIGINT) AS b FROM f),
dbc AS (SELECT doc_id, tgt, b, count(*) AS c FROM feats GROUP BY 1, 2, 3),
hist AS (SELECT b, CAST(sum(c) AS BIGINT) AS rb,
  CAST(sum(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS tb
  FROM dbc GROUP BY b),
tot AS (SELECT CAST(sum(rb) AS BIGINT) AS nr, CAST(sum(tb) AS BIGINT) AS nt
  FROM hist),
lam AS (SELECT b,
  log10(CAST(tb + 1 AS DOUBLE) / CAST(nt + ${K} AS DOUBLE)) -
  log10(CAST(rb + 1 AS DOUBLE) / CAST(nr + ${K} AS DOUBLE)) AS lam
  FROM hist, tot),
contrib AS (SELECT doc_id, c,
  CAST(round(CAST(c AS DOUBLE) * lam * 1e6) AS BIGINT) AS micro
  FROM dbc JOIN lam USING (b)),
per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
  CAST(sum(micro) AS BIGINT) AS micro FROM contrib GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(per.n_feats, 0) AS BIGINT) AS n_feats,
  round(CAST(per.micro AS DOUBLE) / 1e6 / per.n_feats, 6) AS dsir_logratio
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id"""
  }
}
