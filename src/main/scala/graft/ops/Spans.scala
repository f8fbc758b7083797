package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Exact duplicated-SPAN profiling (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better"): the paper removes exact
  * substrings of >= 50 tokens that occur more than once in the corpus via
  * a suffix array — a structure with no distributed analog at 100 TB. The
  * standard scale-out approximation is window-level: slide a w-token
  * window over every document and call a window DUPLICATED iff its exact
  * token sequence occurs more than once in the whole corpus (any document,
  * any position — including a second time in the same document). Every
  * >=w-token duplicated substring is a run of duplicated windows, so the
  * per-document duplicated-window fraction upper-bounds span-level overlap
  * and is the usual filtering signal.
  *
  * Shuffle plan (100-TB posture): windows are hashed to fixed-width md5
  * hex BEFORE the shuffle (32 B key instead of an unbounded token string —
  * the gram text never leaves the map side), then
  *   (1) one partial-agg shuffle to (doc_id, gram) counts,
  *   (2) one agg shuffle to global gram totals,
  *   (3) an equi-join back on gram + one final per-doc agg.
  * Nothing is collected; skew on a mega-hot gram (boilerplate) is bounded
  * by AQE skew splitting on the join. md5 is deterministic in both engines
  * (the DuckDB twin gates the whole pipeline value-exactly); a 128-bit
  * collision merging two distinct grams is ~1e-18 at 10^12 windows.
  */
object Spans {

  /** Per-document duplicated-window profile over `(doc_id, text)`:
    * (doc_id, windows, dup_windows, dup_frac), every input doc present
    * (docs shorter than w tokens report 0 windows, dup_frac 0.0).
    * Tokenization is the engine's bare tokenizer (ASCII-alnum runs, length
    * > 2, lowercased) — span dedup wants the raw token stream, stop words
    * included in sequence.
    */
  def dupSpanStats(docs: DataFrame, w: Int = 6,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val gramsOf = udf((text: String) => Spans.windowGrams(text, w))
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(gramsOf(col(textCol))).as("gram"))
    val perDocGram = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("c"))
    val gramTotals = perDocGram.groupBy("gram")
      .agg(sum(col("c")).as("cg"))
    val per = perDocGram.join(gramTotals, "gram")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("w_all"),
        sum(when(col("cg") > 1, col("c")).otherwise(lit(0L))).as("w_dup"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("w_all"), lit(0L)).as("windows"),
        coalesce(col("w_dup"), lit(0L)).as("dup_windows"),
        when(coalesce(col("w_all"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("w_dup").cast("double") / col("w_all").cast("double"))
          .as("dup_frac"))
  }

  /** All w-token window grams of `text`, each hashed to md5 hex of the
    * space-joined window (the exact string the DuckDB twin hashes).
    */
  private[ops] def windowGrams(text: String, w: Int): Array[String] = {
    val ts = Analyzer.tokenize(text)
    if (ts.length < w) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[String](ts.length - w + 1)
    var i = 0
    while (i <= ts.length - w) {
      val sb = new StringBuilder
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(ts(i + j))
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.result().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Character.forDigit((dig(b) >> 4) & 0xf, 16)
        hex(2 * b + 1) = Character.forDigit(dig(b) & 0xf, 16)
        b += 1
      }
      out(i) = new String(hex)
      i += 1
    }
    out
  }

  /** DuckDB twin of [[dupSpanStats]] over the `documents` table. */
  def dupSpansSql(w: Int = 6): String =
    s"""WITH toks AS (
  SELECT doc_id, list_filter(list_transform(
      regexp_split_to_array(text, '[^a-zA-Z0-9]+'), t -> lower(t)),
      t -> length(t) > 2) AS ts
  FROM documents),
g AS (
  SELECT doc_id, md5(array_to_string(ts[p : p + ${w - 1}], ' ')) AS gram
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - $w + 2)) AS p FROM toks)),
dg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
gt AS (SELECT gram, CAST(sum(c) AS BIGINT) AS cg FROM dg GROUP BY gram),
per AS (
  SELECT dg.doc_id,
         CAST(sum(dg.c) AS BIGINT) AS w_all,
         CAST(sum(CASE WHEN gt.cg > 1 THEN dg.c ELSE 0 END) AS BIGINT) AS w_dup
  FROM dg JOIN gt USING (gram) GROUP BY dg.doc_id)
SELECT d.doc_id,
       coalesce(per.w_all, CAST(0 AS BIGINT)) AS windows,
       coalesce(per.w_dup, CAST(0 AS BIGINT)) AS dup_windows,
       CASE WHEN coalesce(per.w_all, CAST(0 AS BIGINT)) = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(per.w_dup AS DOUBLE) / CAST(per.w_all AS DOUBLE) END AS dup_frac
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id"""
}
