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
  /** GPT-2-ish pretokenizer pattern, restricted to the regex subset where
    * Java and RE2 (DuckDB) agree (no lookahead): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs, whitespace
    * runs. Counting its matches approximates the trainer's token count far
    * better than whitespace splitting (code and punctuation-dense text).
    */
  /** Whitespace spelled as an explicit class: Java's `\s` includes
    * vertical tab (\x0B) while RE2's (DuckDB) does not, so `\s` in a
    * shared (Spark, DuckDB-twin) pattern pair silently diverges on
    * \x0B-bearing text. Every gated pair uses these instead — single
    * source of truth for both engines.
    */
  private[graft] val wsChars = " \\t\\n\\f\\r"
  private[graft] val wsRun = s"[$wsChars]+"

  private[graft] val bpeishRe =
    s"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$wsChars]+|[$wsChars]+"

  def tokenCounts(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val stop = Analyzer.defaultStopWords.toSeq.sorted
    val toks = filter(split(col(textCol), "[^a-zA-Z0-9]+"), t => length(t) > 2)
    val kept = filter(transform(toks, lower _), t => !t.isin(stop.map(lit): _*))
    docs.select(col(idCol),
      length(col(textCol)).as("n_chars"),
      size(filter(split(trim(col(textCol)), wsRun), t => length(t) > 0)).as("ws_tokens"),
      size(toks).as("alnum_tokens"),
      size(kept).as("kept_tokens"),
      size(regexp_extract_all(col(textCol), lit(bpeishRe), lit(0))).as("bpe_tokens"))
  }

  /** Heuristic quality score in [0,1]: favors mid-length docs with low
    * punctuation density and a sane stop-word ratio (the classic cheap
    * pretraining-quality gates). round(.,6) for cross-engine comparison.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val n = length(col(textCol)).cast("double")
    val punct = length(regexp_replace(col(textCol), s"[a-zA-Z0-9$wsChars]", "")).cast("double")
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

  /** Gopher/MassiveText-style intra-document repetition metrics — the
    * cheap signals production pipelines use to drop degenerate/spammy
    * documents BEFORE any cross-document dedup:
    *
    *  - `dup_word_frac`: 1 - distinct words / words
    *  - `top_bigram_frac`: occurrences of the most frequent bigram / bigrams
    *  - `dup_trigram_frac`: trigram instances whose gram occurs >1 / trigrams
    *
    * Pure built-ins (codegen'd): gram arrays by zip_with over shifted
    * slices, then explode + two-level aggregation keyed by (doc, gram) —
    * map-side partial agg collapses each document's grams locally, so the
    * shuffle moves ~distinct grams per doc, not instances. round(.,6) for
    * cross-engine comparison.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toks = Tok.terms(col(textCol))
    def gram(n: Int): Column = {
      val parts = (0 until n).map(i =>
        slice(col("arr"), lit(i + 1),
          greatest(size(col("arr")) - lit(n - 1), lit(0))))
      parts.reduceLeft((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    }
    val base = docs.select(col(idCol), toks.as("arr"))
    def counted(n: Int, name: String): DataFrame =
      base.select(col(idCol), explode(gram(n)).as("g"))
        .groupBy(idCol, "g").agg(count(lit(1)).as("c"))
        .groupBy(idCol).agg(
          sum("c").as(s"${name}_total"),
          max("c").as(s"${name}_top"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as(s"${name}_dup"),
          count(lit(1)).as(s"${name}_distinct"))
    val w = counted(1, "w")
    val b = counted(2, "b")
    val t = counted(3, "t")
    def frac(num: Column, den: Column): Column =
      round(coalesce(num.cast("double") /
        nullif(den, lit(0L)).cast("double"), lit(0.0)), 6)
    docs.select(col(idCol))
      .join(w, Seq(idCol), "left").join(b, Seq(idCol), "left")
      .join(t, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("w_total"), lit(0L)).as("words"),
        frac(coalesce(col("w_total"), lit(0L)) - coalesce(col("w_distinct"), lit(0L)),
          coalesce(col("w_total"), lit(0L))).as("dup_word_frac"),
        frac(coalesce(col("b_top"), lit(0L)), coalesce(col("b_total"), lit(0L)))
          .as("top_bigram_frac"),
        frac(coalesce(col("t_dup"), lit(0L)), coalesce(col("t_total"), lit(0L)))
          .as("dup_trigram_frac"))
  }

  /** DuckDB twin of [[repetitionStats]]. */
  def repetitionSql: String = {
    val arr =
      Tok.termsSql()
    s"""WITH d AS (SELECT doc_id, $arr AS arr FROM documents),
w1 AS (SELECT doc_id, unnest(arr) AS g FROM d),
b1 AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] AS g
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM d)
  WHERE i <= len(arr) - 1),
t1 AS (SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM d)
  WHERE i <= len(arr) - 2),
wc AS (SELECT doc_id, count(*) AS total, count(DISTINCT g) AS dis
  FROM w1 GROUP BY doc_id),
bc AS (SELECT doc_id, sum(c) AS total, max(c) AS topc
  FROM (SELECT doc_id, g, count(*) AS c FROM b1 GROUP BY doc_id, g) GROUP BY doc_id),
tc AS (SELECT doc_id, sum(c) AS total,
  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM (SELECT doc_id, g, count(*) AS c FROM t1 GROUP BY doc_id, g) GROUP BY doc_id)
SELECT d.doc_id,
  CAST(coalesce(wc.total, 0) AS BIGINT) AS words,
  round(coalesce(CAST(coalesce(wc.total, 0) - coalesce(wc.dis, 0) AS DOUBLE)
    / nullif(wc.total, 0), 0.0), 6) AS dup_word_frac,
  round(coalesce(CAST(bc.topc AS DOUBLE) / nullif(bc.total, 0), 0.0), 6)
    AS top_bigram_frac,
  round(coalesce(CAST(tc.dup AS DOUBLE) / nullif(tc.total, 0), 0.0), 6)
    AS dup_trigram_frac
FROM d LEFT JOIN wc USING (doc_id) LEFT JOIN bc USING (doc_id)
  LEFT JOIN tc USING (doc_id)
ORDER BY d.doc_id"""
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val digitRunRe = "\\d{9,}"

  /** PII redaction — emails, IPv4 addresses, and long digit runs
    * (phone/account-id-like) replaced with typed placeholders, plus match
    * counts for audit. Pure `regexp_replace`/`regexp_extract_all`
    * built-ins (codegen'd, one narrow pass, no shuffle); patterns chosen
    * from the regex subset where Java and RE2 (DuckDB) semantics agree, so
    * the DuckDB twin gates the operator exactly — on PII-free corpora that
    * gate is the NO-FALSE-POSITIVE property (byte-identical pass-through),
    * and the planted-fixture spec gates the redactions themselves.
    * Replacement order matters: emails first (they contain digits and
    * dots), then IPs, then bare digit runs; placeholders contain neither
    * digits nor '@' so later passes cannot re-match earlier output.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, digitRunRe, "<NUM>")
    docs.select(col(idCol),
      size(regexp_extract_all(t0, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t1, lit(ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(t2, lit(digitRunRe), lit(0))).as("n_digit_runs"),
      t3.as("clean_text"))
  }

  /** DuckDB twin of [[scrubPii]]. */
  def scrubPiiSql: String =
    s"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '$emailRe')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
    '$ipv4Re')) AS INTEGER) AS n_ips,
  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
    '$emailRe', '<EMAIL>', 'g'), '$ipv4Re', '<IP>', 'g'),
    '$digitRunRe')) AS INTEGER) AS n_digit_runs,
  regexp_replace(regexp_replace(regexp_replace(text,
    '$emailRe', '<EMAIL>', 'g'), '$ipv4Re', '<IP>', 'g'),
    '$digitRunRe', '<NUM>', 'g') AS clean_text
FROM documents ORDER BY doc_id"""

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
    // empty tokens filtered (a leading-whitespace split artifact would skew
    // the denominator and is not replicable in the SQL oracle twin)
    val toks = text.toLowerCase.split(wsRun).filter(_.nonEmpty)
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

  /** Fingerprint hash modulus: a 31-base polynomial mod this prime keeps the
    * accumulator in BIGINT range for BOTH Spark codegen and the DuckDB
    * oracle (64-bit wrapping hashes are not ANSI-SQL-expressible).
    */
  val fpMod = 1000000007L

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): polynomial hash
    * over token 4-grams (joined with spaces), keep the minimum hash in each
    * sliding window of 8 grams, return the distinct minima sorted — a
    * compact order-robust signature for containment/plagiarism checks.
    * Reference implementation for [[fingerprints]]; the spec gates the two
    * equal.
    */
  private[ops] def fingerprint(text: String, gram: Int = 4, window: Int = 8): Array[Long] = {
    val toks = Analyzer.tokenize(text)
    if (toks.length < gram) return Array.empty
    val hashes = Array.tabulate(toks.length - gram + 1) { i =>
      val g = toks.slice(i, i + gram).mkString(" ")
      var h = 0L
      var k = 0
      while (k < g.length) { h = (h * 31 + g.charAt(k)) % fpMod; k += 1 }
      h
    }
    if (hashes.length <= window) Array(hashes.min)
    else {
      val out = scala.collection.mutable.SortedSet.empty[Long]
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

  /** Per-doc winnowing fingerprints as (doc_id, fp) rows, one narrow pass.
    * The exploded scalar shape (rather than an array column) is what the
    * cross-engine gate can hash.
    *
    * Implementation note: this was first written as pure higher-order
    * functions (transform/aggregate over per-char sequences), but Spark
    * evaluates HOF lambdas INTERPRETED per element — the char-level hash
    * made it ~50x slower than a compiled JVM loop and it timed out at
    * bench scale. The UDF runs [[fingerprint]] (the spec'd reference
    * implementation) directly; the DuckDB twin [[fingerprintSql]] gates the
    * semantics either way.
    */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id",
                   gram: Int = 4, window: Int = 8): DataFrame = {
    val fpUdf = udf((s: String) => fingerprint(s, gram, window))
    docs.select(col(idCol), explode(fpUdf(col(textCol))).as("fp"))
  }

  /** C4/Gopher-style COMPOSITE quality filter: the cheap rule gates a
    * pretraining pipeline applies before any expensive scoring, fused
    * into ONE narrow codegen'd pass (no UDF, no shuffle — every signal is
    * row-local). Output (doc_id, keep, reason, words): `reason` is the
    * FIRST failing rule in the pinned order (a pipeline wants one
    * attributable drop reason, not a bitmask), empty when kept.
    *
    * Every rule compares INTEGERS via cross-multiplication (e.g. mean
    * word length in [3,10] as `3*nw <= sumlen <= 10*nw`) so the DuckDB
    * twin is bit-exact — no float thresholds to drift.
    *
    * Rules (order matters):
    *  1. too_short      — fewer than `minWords` whitespace words
    *  2. word_len       — mean word length outside [3, 10] (Gopher)
    *  3. high_symbol    — non-alnum-non-ws chars > 10% of chars
    *  4. few_stopwords  — fewer than 2 distinct stop words (Gopher's
    *                      "no function words => not natural language")
    *  5. repetitive     — duplicate-word fraction > 70% (degenerate spam)
    */
  def filterPipeline(docs: DataFrame, minWords: Int = 20,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val stop = Analyzer.defaultStopWords.toSeq.sorted
    val ws = filter(split(trim(col(textCol)), wsRun), t => length(t) > 0)
    val lows = transform(ws, lower _)
    val nw = size(ws).cast("long")
    val sumlen = aggregate(transform(ws, length _), lit(0L),
      (acc, x) => acc + x.cast("long"))
    val ndw = size(array_distinct(lows)).cast("long")
    val nstop = size(array_distinct(
      filter(lows, t => t.isin(stop.map(lit): _*)))).cast("long")
    val nc = length(col(textCol)).cast("long")
    val punct = length(
      regexp_replace(col(textCol), s"[a-zA-Z0-9$wsChars]", "")).cast("long")
    docs.select(col(idCol),
        nw.as("words"), sumlen.as("sumlen"), ndw.as("ndw"),
        nstop.as("nstop"), nc.as("nc"), punct.as("punct"))
      .select(col(idCol), reasonFrom(minWords).as("reason"), col("words"))
      .select(col(idCol), (col("reason") === "").as("keep"),
        col("reason"), col("words"))
  }

  private def reasonFrom(minWords: Int): Column =
    when(col("words") < minWords, "too_short")
      .when(col("sumlen") < col("words") * 3 ||
        col("sumlen") > col("words") * 10, "word_len")
      .when(col("punct") * 10 > col("nc"), "high_symbol")
      .when(col("nstop") < 2, "few_stopwords")
      .when((col("words") - col("ndw")) * 10 > col("words") * 7, "repetitive")
      .otherwise("")

  /** DuckDB twin of [[filterPipeline]] — same counters, same pinned rule
    * order, same integer cross-multiplied thresholds.
    */
  def filterPipelineSql(minWords: Int = 20): String =
    s"""WITH ws AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(text), '$wsRun'),
                x -> length(x) > 0) AS toks
  FROM documents),
a AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS nw,
    CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sumlen,
    CAST(len(list_distinct(list_transform(toks, t -> lower(t)))) AS BIGINT) AS ndw
  FROM ws),
st AS (
  SELECT doc_id, CAST(count(DISTINCT lower(tok)) AS BIGINT) AS nstop
  FROM (SELECT doc_id, unnest(toks) AS tok FROM ws)
  WHERE lower(tok) IN (${graft.search.OracleSql.stopList})
  GROUP BY doc_id),
base AS (
  SELECT d.doc_id,
    CAST(length(d.text) AS BIGINT) AS nc,
    CAST(length(regexp_replace(d.text, '[a-zA-Z0-9$wsChars]', '', 'g')) AS BIGINT) AS punct,
    a.nw, a.sumlen, a.ndw, coalesce(st.nstop, 0) AS nstop
  FROM documents d JOIN a USING (doc_id) LEFT JOIN st USING (doc_id)),
r AS (
  SELECT doc_id, nw,
    CASE WHEN nw < $minWords THEN 'too_short'
         WHEN sumlen < nw * 3 OR sumlen > nw * 10 THEN 'word_len'
         WHEN punct * 10 > nc THEN 'high_symbol'
         WHEN nstop < 2 THEN 'few_stopwords'
         WHEN (nw - ndw) * 10 > nw * 7 THEN 'repetitive'
         ELSE '' END AS reason
  FROM base)
SELECT doc_id, (reason = '') AS keep, reason, nw AS words
FROM r ORDER BY doc_id"""

  // --- DuckDB oracle twins (driver correctness gate) ----------------------

  /** DuckDB twin of [[langId]] — same profiles, same tie order
    * (alphabetical wins a score tie: de < en < es < fr), same cjk and
    * und rules.
    */
  lazy val langIdSql: String = {
    def inList(lang: String): String =
      profiles(lang).toSeq.sorted.map(w => s"'$w'").mkString(", ")
    def cnt(lang: String): String =
      s"CAST(len(list_filter(toks, x -> x IN (${inList(lang)}))) AS DOUBLE)"
    s"""WITH t AS (
  SELECT doc_id,
    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
    length(text) AS n,
    list_filter(regexp_split_to_array(lower(text), '$wsRun'),
                x -> length(x) > 0) AS toks
  FROM documents),
s AS (
  SELECT doc_id, cjk, n, len(toks) AS nt,
    ${cnt("de")} AS c_de, ${cnt("en")} AS c_en,
    ${cnt("es")} AS c_es, ${cnt("fr")} AS c_fr
  FROM t),
sc AS (
  SELECT doc_id, cjk, n, nt,
    CASE WHEN nt = 0 THEN 0.0 ELSE c_de / nt END AS s_de,
    CASE WHEN nt = 0 THEN 0.0 ELSE c_en / nt END AS s_en,
    CASE WHEN nt = 0 THEN 0.0 ELSE c_es / nt END AS s_es,
    CASE WHEN nt = 0 THEN 0.0 ELSE c_fr / nt END AS s_fr
  FROM s)
SELECT doc_id,
  CASE WHEN cjk * 4 > n THEN 'zh'
       WHEN nt = 0 OR greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS pred_lang,
  CASE WHEN cjk * 4 > n THEN round(CAST(cjk AS DOUBLE) / n, 6)
       WHEN nt = 0 THEN 0.0
       ELSE round(greatest(s_de, s_en, s_es, s_fr), 6) END AS confidence
FROM sc ORDER BY doc_id"""
  }

  /** DuckDB twin of [[fingerprints]] — same tokenizer shape as the tokb
    * CTE, same polynomial hash mod [[fpMod]], same winnowing windows.
    */
  def fingerprintSql(gram: Int = 4, window: Int = 8): String = {
    val gramCat = (0 until gram).map(j => s"arr[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (
  SELECT doc_id,
    list_transform(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
      x -> length(x) > 2), x -> lower(x)) AS arr
  FROM documents),
gr AS (
  SELECT doc_id, i, $gramCat AS g
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM toks)
  WHERE i <= len(arr) - ${gram - 1}),
h AS (
  SELECT doc_id, i,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(g, ''), c -> CAST(ascii(c) AS BIGINT))),
      (a, b) -> (a * 31 + b) % $fpMod) AS h
  FROM gr),
wm AS (
  SELECT doc_id, i,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND ${window - 1} FOLLOWING) AS mn,
    count(*) OVER (PARTITION BY doc_id) AS m
  FROM h)
SELECT DISTINCT doc_id, mn AS fp FROM wm
WHERE i <= greatest(m - ${window - 1}, 1)
ORDER BY doc_id, fp"""
  }

  // --- unigram language-model quality score -------------------------------

  /** CCNet/RefinedWeb-style LM quality proxy: per-document mean unigram
    * log10-probability under the corpus's own unigram distribution
    * (the honest stand-in for the KenLM perplexity filter those pipelines
    * run — no external model, same decision shape: low mean log-prob =
    * out-of-distribution/gibberish, drop or down-weight).
    *
    * Plan shape at 100 TB: one (doc,term) map-side-combined aggregation,
    * one vocabulary-keyed aggregation, a vocabulary-keyed join back
    * (co-partitioned with the term agg), and a doc-keyed final sum — the
    * exact shuffle skeleton of the BM25 statistics build; the corpus text
    * is scanned ONCE. The grand-total row rides a broadcast.
    *
    * Cross-engine determinism: per-(doc,term) contributions are rounded to
    * integer MICRO log-prob units (`round(c * log10(cnt/total) * 1e6)` as
    * BIGINT) before the per-doc sum, so the aggregation is an order-free
    * integer sum in both engines — a raw double sum would be sensitive to
    * Spark's partial-aggregation order. The final mean divides two exact
    * integers and rounds at 6.
    */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val toks = Tok.terms(col(textCol))
    val dt = docs.select(col(idCol), explode(toks).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("c"))
    val tf = dt.groupBy("term").agg(sum("c").as("cnt"))
    val tot = tf.agg(sum("cnt").cast("double").as("total"))
    val contrib = dt.join(tf, "term")
      .crossJoin(broadcast(tot))
      .select(col(idCol), col("c"),
        round(col("c").cast("double") *
          log10(col("cnt").cast("double") / col("total")) * 1e6)
          .cast("long").as("micro"))
    val per = contrib.groupBy(idCol)
      .agg(sum("c").as("n_tokens"), sum("micro").as("micro"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("micro").cast("double") / 1e6 /
          col("n_tokens").cast("double"), 6).as("avg_logprob"))
  }

  /** DuckDB twin of [[unigramLogProb]] — same tokenizer, same micro-unit
    * rounding, same integer per-doc sum.
    */
  def unigramLogProbSql: String = {
    val arr =
      Tok.termsSql()
    s"""WITH d AS (SELECT doc_id, $arr AS arr FROM documents),
inst AS (SELECT doc_id, unnest(arr) AS term FROM d),
dt AS (SELECT doc_id, term, count(*) AS c FROM inst GROUP BY doc_id, term),
tf AS (SELECT term, sum(c) AS cnt FROM dt GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM tf),
contrib AS (SELECT doc_id, c,
  CAST(round(CAST(c AS DOUBLE) *
    log10(CAST(cnt AS DOUBLE) / (SELECT total FROM tot)) * 1e6) AS BIGINT)
    AS micro
  FROM dt JOIN tf USING (term)),
per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(sum(micro) AS BIGINT) AS micro FROM contrib GROUP BY doc_id)
SELECT docs.doc_id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
  round(CAST(per.micro AS DOUBLE) / 1e6 / per.n_tokens, 6) AS avg_logprob
FROM documents docs LEFT JOIN per USING (doc_id) ORDER BY docs.doc_id"""
  }
  // --- character entropy ----------------------------------------------------

  /** Per-document CHARACTER ENTROPY (log10 units) — the cheap
    * gibberish/degenerate-text signal that catches what word-level rules
    * miss: base64 blobs, minified code, and key-mash runs have near-flat
    * character distributions (high entropy), while "aaaa..." padding and
    * single-char spam sit near zero; natural language occupies a stable
    * mid band. H = sum over characters c of (cnt_c/n) * log10(n/cnt_c).
    * Returns (doc_id, n_chars_used, char_entropy); empty docs emit 0
    * chars and a null score.
    *
    * Plan shape at 100 TB: ONE narrow pass — a compiled JVM loop per doc
    * (the [[fingerprints]] precedent: a per-CHARACTER explode would be a
    * corpus-of-characters-scale relation, and HOF lambdas evaluate
    * interpreted), emitting (n, micro) per row; no shuffle at all.
    *
    * Cross-engine determinism: per-character-CLASS contributions are
    * rounded to integer MICRO units (`round(1e6 * cnt * log10(n/cnt))`)
    * and summed order-free (the [[Lm]] discipline); the twin's char-level
    * explode recomputes the identical terms. All terms are non-negative,
    * so JVM `Math.round` == SQL half-up rounding.
    */
  private[ops] def charEntropyParts(s: String): (Long, Long) = {
    if (s == null || s.isEmpty) return (0L, 0L)
    val counts = new java.util.HashMap[Char, Long]()
    var i = 0
    while (i < s.length) {
      counts.merge(s.charAt(i), 1L, (a, b) => a + b); i += 1
    }
    val n = s.length.toLong
    var micro = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      micro += Math.round(1e6 * cnt * Math.log10(n.toDouble / cnt))
    }
    (n, micro)
  }

  /** See [[charEntropyParts]]; the division/rounding to the final score
    * happens in Column math so it is literal-identical to the SQL twin.
    */
  def charEntropy(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val partsUdf = udf((s: String) => charEntropyParts(s))
    docs.select(col(idCol), partsUdf(col(textCol)).as("p"))
      .select(col(idCol), col("p._1").as("n_chars_used"),
        when(col("p._1") > 0,
          round(col("p._2").cast("double") / 1e6 /
            col("p._1").cast("double"), 6)).as("char_entropy"))
  }

  /** DuckDB twin of [[charEntropy]]: char-level explode, identical
    * micro-rounded per-class terms, order-free integer sum.
    */
  val charEntropySql: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE text IS NOT NULL AND text <> ''),
cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt FROM ch GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM cc GROUP BY doc_id),
mic AS (SELECT cc.doc_id,
  CAST(sum(CAST(round(1e6 * cnt * log10(CAST(n.n AS DOUBLE) / cnt)) AS BIGINT))
    AS BIGINT) AS micro
  FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id)
SELECT d.doc_id, CAST(coalesce(n.n, 0) AS BIGINT) AS n_chars_used,
  round(CAST(mic.micro AS DOUBLE) / 1e6 / CAST(n.n AS DOUBLE), 6)
    AS char_entropy
FROM documents d LEFT JOIN n USING (doc_id) LEFT JOIN mic USING (doc_id)
ORDER BY d.doc_id"""

  /** Per-document LEXICAL DIVERSITY — the vocabulary-richness quality
    * signal (template/SEO-spam text repeats a tiny vocabulary; natural
    * prose does not): token count, distinct-type count, hapax count
    * (types occurring exactly once), type-token ratio, hapax ratio, and
    * Guiraud's R = types/sqrt(tokens) (the length-corrected TTR — raw TTR
    * decays with document length, so cross-length filtering thresholds
    * are set on R, not TTR). Tokenization is the shared [[Tok]] standard.
    *
    * Plan shape at 100 TB: entirely ROW-LOCAL — one narrow projection
    * computing all six columns from the token array with codegen'd
    * collection HOFs (`array_distinct`, `aggregate` over the sorted
    * array for the hapax count), zero shuffles, zero UDFs. Every doc
    * appears; empty/token-free docs get 0 counts and null ratios.
    *
    * Hapax device: sorting the token array groups equal tokens adjacently,
    * so "occurs exactly once" is a neighbor test — `filter(sorted, (x, i)
    * -> x != neighbor_left and x != neighbor_right)` — linear per row, no
    * per-doc groupBy. Ratios are divisions of exact ints, 6-dp rounded;
    * sqrt is a single deterministic IEEE op, identical in DuckDB.
    */
  def lexicalDiversity(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val ts = graft.ops.Tok.terms(col(textCol))
    val sorted = array_sort(ts)
    // neighbor test over the sorted array: element i is hapax iff it
    // differs from both neighbors (`get` is 0-based and returns NULL out
    // of bounds even under ANSI mode; null-safe <=> then makes the edge
    // comparisons false, so both ends test correctly)
    val hapax = size(filter(sorted, (x, i) =>
      !(x <=> get(sorted, i + 1)) && !(x <=> get(sorted, i - 1))))
    docs.select(col(idCol),
        // long, matching the twin's BIGINT counters (the gate is
        // schema-exact; size() alone is int32)
        size(ts).cast("long").as("n_tokens"),
        size(array_distinct(ts)).cast("long").as("n_types"),
        hapax.cast("long").as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") /
            col("n_tokens").cast("double"), 6)).as("ttr"),
        when(col("n_tokens") > 0,
          round(col("n_hapax").cast("double") /
            col("n_tokens").cast("double"), 6)).as("hapax_ratio"),
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") /
            sqrt(col("n_tokens").cast("double")), 6)).as("guiraud_r"))
  }

  /** DuckDB twin of [[lexicalDiversity]] — unnest + per-doc counts
    * instead of the array neighbor test, same ratios.
    */
  val lexicalDiversitySql: String =
    s"""WITH toks AS (SELECT doc_id, unnest(${graft.ops.Tok.termsSql()}) AS tok
  FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_types,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM tc GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
  coalesce(a.n_types, 0) AS n_types, coalesce(a.n_hapax, 0) AS n_hapax,
  CASE WHEN a.n_tokens > 0 THEN
    round(CAST(a.n_types AS DOUBLE) / a.n_tokens, 6) END AS ttr,
  CASE WHEN a.n_tokens > 0 THEN
    round(CAST(a.n_hapax AS DOUBLE) / a.n_tokens, 6) END AS hapax_ratio,
  CASE WHEN a.n_tokens > 0 THEN
    round(CAST(a.n_types AS DOUBLE) / sqrt(CAST(a.n_tokens AS DOUBLE)), 6)
    END AS guiraud_r
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id"""

  /** Per-document READABILITY — Flesch Reading Ease and Flesch–Kincaid
    * grade from the classic closed-form heuristics (the pretraining-mix
    * "is this prose or word salad / legalese" signal, and the standard
    * difficulty stratifier for curriculum ordering):
    *  - sentences: maximal `[.!?]+` runs followed by whitespace-or-end,
    *    floored at 1 for non-empty text (headline-style docs).
    *  - words: whitespace-delimited alnum-bearing tokens.
    *  - syllables: vowel-group runs `[aeiouyAEIOUY]+` across the text,
    *    plus one for every word with no vowel at all (the per-word
    *    min-1 rule, counted without a per-word loop).
    * FRE = 206.835 - 1.015·(W/S) - 84.6·(Syl/W); FKGL = 0.39·(W/S) +
    * 11.8·(Syl/W) - 15.59, both 6-dp. Null when the doc has no words.
    *
    * Plan shape at 100 TB: entirely ROW-LOCAL — one narrow projection,
    * three codegen'd regex counters, zero shuffles, zero UDFs. All three
    * raw counters are exact integers, so the two scores are the same
    * literal double expression in both engines (identical op order),
    * deterministic at 6 dp.
    */
  def readability(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    // the shared EXPLICIT whitespace class (see [[wsChars]]: Java \s
    // includes \x0B where RE2's does not) and NO `$` anchor — Java $
    // also matches before a trailing NEL (U+0085) / LS (U+2028) /
    // PS (U+2029), so the end-punctuation case is a last-char test
    // instead of an anchor
    val wsCls = s"[$wsChars]"
    val words = filter(split(col(textCol), wsCls + "+"),
      w => w.rlike("[a-zA-Z0-9]"))
    val sentRuns = size(regexp_extract_all(col(textCol),
      lit("[.!?]+" + wsCls), lit(0))) +
      when(substring(col(textCol), -1, 1).isin(".", "!", "?"), 1)
        .otherwise(0)
    val vowelRuns = size(regexp_extract_all(col(textCol),
      lit("[aeiouyAEIOUY]+"), lit(0)))
    val noVowelWords = size(filter(words, w => !w.rlike("[aeiouyAEIOUY]")))
    docs.select(col(idCol),
        size(words).as("n_words"),
        when(size(words) > 0, greatest(sentRuns, lit(1)))
          .otherwise(lit(0)).as("n_sentences"),
        (vowelRuns + noVowelWords).as("n_syllables"))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")), 6)).as("fre"),
        when(col("n_words") > 0,
          round(lit(0.39) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) +
            lit(11.8) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")) - lit(15.59), 6)).as("fk_grade"))
  }

  /** DuckDB twin of [[readability]] — same counters, same literal
    * double expression order.
    */
  val readabilitySql: String =
    """WITH c AS (SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'),
    w -> regexp_matches(w, '[a-zA-Z0-9]'))) AS n_words,
  len(regexp_extract_all(text, '[.!?]+[ \t\n\f\r]'))
    + (CASE WHEN right(text, 1) IN ('.', '!', '?') THEN 1 ELSE 0 END)
    AS sent_runs,
  len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS vowel_runs,
  len(list_filter(regexp_split_to_array(text, '[ \t\n\f\r]+'),
    w -> regexp_matches(w, '[a-zA-Z0-9]') AND
      NOT regexp_matches(w, '[aeiouyAEIOUY]'))) AS no_vowel_words
  FROM documents),
n AS (SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
  CAST(CASE WHEN n_words > 0 THEN greatest(sent_runs, 1) ELSE 0 END
    AS INTEGER) AS n_sentences,
  CAST(vowel_runs + no_vowel_words AS INTEGER) AS n_syllables FROM c)
SELECT doc_id, n_words, n_sentences, n_syllables,
  CASE WHEN n_words > 0 THEN
    round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) END AS fre,
  CASE WHEN n_words > 0 THEN
    round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
    END AS fk_grade
FROM n ORDER BY doc_id"""

  /** TOKENIZER FERTILITY per language — the multilingual-tokenizer fit
    * report (a tokenizer trained on English "spends" many more tokens per
    * character on under-represented scripts; fertility tables decide
    * vocab budgets and per-language sampling weights): per lang, exact
    * char / whitespace-word / BPE-ish-token totals and the two derived
    * ratios — chars_per_tok (compression; lower = worse fit) and
    * toks_per_word (classic fertility; higher = worse fit).
    *
    * Plan shape at 100 TB: ONE narrow row-local pass (the shared
    * [[bpeishRe]] / [[wsRun]] counter expressions — codegen'd regex, no
    * UDF) into a lang-keyed partial+final aggregate over exact integer
    * totals; ratios are divisions of exact longs at 6 dp. No joins.
    */
  def tokenizerFertility(docs: DataFrame, textCol: String = "text",
                         langCol: String = "lang"): DataFrame =
    docs.select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("chars"),
        size(filter(split(trim(col(textCol)), wsRun),
          t => length(t) > 0)).cast("long").as("ws"),
        size(regexp_extract_all(col(textCol), lit(bpeishRe), lit(0)))
          .cast("long").as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars"),
        sum("ws").as("ws_tokens"), sum("bpe").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("chars"), col("ws_tokens"),
        col("bpe_tokens"),
        when(col("bpe_tokens") > 0,
          round(col("chars").cast("double") /
            col("bpe_tokens").cast("double"), 6)).as("chars_per_tok"),
        when(col("ws_tokens") > 0,
          round(col("bpe_tokens").cast("double") /
            col("ws_tokens").cast("double"), 6)).as("toks_per_word"))

  /** DuckDB twin of [[tokenizerFertility]]. */
  def tokenizerFertilitySql: String =
    s"""WITH c AS (SELECT lang,
  CAST(length(text) AS BIGINT) AS chars,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '$wsRun'),
    x -> length(x) > 0)) AS BIGINT) AS ws,
  CAST(len(regexp_extract_all(text, '${bpeishRe.replace("'", "''")}'))
    AS BIGINT) AS bpe
  FROM documents)
SELECT lang, count(*) AS n_docs, CAST(sum(chars) AS BIGINT) AS chars,
  CAST(sum(ws) AS BIGINT) AS ws_tokens,
  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
  CASE WHEN sum(bpe) > 0 THEN
    round(CAST(sum(chars) AS DOUBLE) / sum(bpe), 6) END AS chars_per_tok,
  CASE WHEN sum(ws) > 0 THEN
    round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) END AS toks_per_word
FROM c GROUP BY lang ORDER BY lang"""
}
