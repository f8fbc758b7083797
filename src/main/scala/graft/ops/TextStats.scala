package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language identification (n-gram profile heuristic),
  * and rolling-hash document fingerprinting. Everything except lang-id and
  * fingerprints is pure `functions._` (codegen'd, DuckDB-oracle-checkable).
  */
object TextStats {

  /** Per-doc token counts: whitespace tokens, analyzer tokens (len>2
    * alnum runs), chain tokens (after stop filter), plus char count.
    * All built-in expressions — no UDF.
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val stop = Analyzer.defaultStopWords.toSeq.sorted
    val toks = filter(split(col(textCol), "[^a-zA-Z0-9]+"), t => length(t) > 2)
    val kept = filter(transform(toks, lower _), t => !t.isin(stop.map(lit): _*))
    docs.select(col(idCol),
      length(col(textCol)).as("n_chars"),
      size(filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)).as("ws_tokens"),
      size(toks).as("alnum_tokens"),
      size(kept).as("kept_tokens"))
  }

  /** Heuristic quality score in [0,1]: favors mid-length docs with low
    * punctuation density and a sane stop-word ratio (the classic cheap
    * pretraining-quality gates). round(.,6) for cross-engine comparison.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val n = length(col(textCol)).cast("double")
    val punct = length(regexp_replace(col(textCol), "[a-zA-Z0-9\\s]", "")).cast("double")
    val counted = tokenCounts(docs, textCol, idCol)
    docs.select(col(idCol), col(textCol))
      .join(counted, idCol)
      .select(col(idCol),
        round(least(n / lit(500.0), lit(1.0)), 6).as("len_score"),
        round(lit(1.0) - least(punct / greatest(n, lit(1.0)) * lit(4.0), lit(1.0)), 6)
          .as("punct_score"),
        round(col("kept_tokens").cast("double") /
          greatest(col("alnum_tokens"), lit(1)).cast("double"), 6).as("content_ratio"))
      .withColumn("quality",
        round((col("len_score") + col("punct_score") + col("content_ratio")) / 3.0, 6))
  }

  // --- language identification (profile heuristic) ------------------------

  /** Tiny per-language function-word profiles. Scores = overlap of the
    * doc's whitespace tokens with each profile; argmax wins, ties to "und".
    * A real system ships trained trigram tables; the *Spark shape* (one
    * narrow UDF pass, no shuffle) is what matters at 100 TB.
    */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "los", "del", "se"),
    "de" -> Set("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "des", "est", "dans"),
    "zh" -> Set.empty) // ideographic: detected by script, not words

  private[ops] def detectLang(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    var cjk = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4E00 && c <= 0x9FFF) cjk += 1
      i += 1
    }
    if (cjk * 4 > text.length) return ("zh", cjk.toDouble / text.length)
    val toks = text.toLowerCase.split("\\s+")
    if (toks.isEmpty) return ("und", 0.0)
    val scores = profiles.map { case (lang, prof) =>
      lang -> toks.count(prof.contains).toDouble / toks.length
    }
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (bestScore == 0.0) ("und", 0.0) else (bestLang, bestScore)
  }

  val langIdUdf = udf((s: String) => detectLang(s))

  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), langIdUdf(col(textCol)).as("lid"))
      .select(col(idCol), col("lid._1").as("pred_lang"),
        round(col("lid._2"), 6).as("confidence"))

  // --- fingerprinting -----------------------------------------------------

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): rolling polynomial
    * hash over token 4-grams, keep the minimum in each window of 8 —
    * a compact order-robust signature for containment/plagiarism checks.
    */
  private[ops] def fingerprint(text: String, gram: Int = 4, window: Int = 8): Array[Long] = {
    val toks = Analyzer.tokenize(text)
    if (toks.length < gram) return Array.empty
    val hashes = Array.tabulate(toks.length - gram + 1) { i =>
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + gram) {
        val t = toks(j)
        var k = 0
        while (k < t.length) { h ^= t.charAt(k); h *= 0x100000001b3L; k += 1 }
        h ^= 0x1F
        h *= 0x100000001b3L
        j += 1
      }
      h
    }
    if (hashes.length <= window) Array(hashes.min)
    else {
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      var i = 0
      while (i + window <= hashes.length) {
        var m = hashes(i)
        var j = i + 1
        while (j < i + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
        out += m
        i += 1
      }
      out.toArray
    }
  }

  val fingerprintUdf = udf((s: String) => fingerprint(s))

  def fingerprints(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), fingerprintUdf(col(textCol)).as("fingerprint"))
}
