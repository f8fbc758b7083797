package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + document dedup by canonical URL — stage one of
  * every web-corpus pipeline (CommonCrawl/CCNet/RefinedWeb run URL-level
  * dedup BEFORE any content hashing: it is the only dedup that costs one
  * narrow pass plus one small-key shuffle).
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (`:443` for https, `:80` for http), leading `www.` dropped, fragment
  * dropped, repeated slashes in the path collapsed, trailing slash
  * stripped (except the root path), tracking query parameters removed
  * (`utm_*`, `fbclid`, `gclid`, `ref`), and the surviving parameters
  * sorted so ordering differences collapse.
  *
  * Everything is `functions._` built-ins (codegen'd, no UDF), from the
  * regex subset where Java and RE2 (DuckDB) agree — see
  * [[TextStats.wsChars]] for the precedent. The only multi-occurrence
  * pattern is the slash-run collapse; the DuckDB twin spells its `'g'`
  * flag explicitly (Spark's regexp_replace is always global, DuckDB's
  * replaces the first match by default).
  *
  * Plan shape at 100 TB: [[canonicalize]] is a narrow projection inside
  * whole-stage codegen; [[dedupByUrl]] adds ONE shuffle keyed by the
  * canonical URL (a window over the canon key — see its scaladoc for why
  * not agg-plus-join-back). Group size is bounded by the corpus's dup
  * cardinality per URL; a pathologically hot URL lands one group in one
  * task, the same co-location any correct dedup requires.
  */
object Urls {

  private val trackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="
  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Canonical form of a URL column (see object doc for the rules). */
  def canonicalize(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, s"($schemeRe)", 1))
    val rest = regexp_replace(nofrag, schemeRe, "")
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val hostLower = lower(auth)
    val hostNoPort =
      when(scheme === "https://", regexp_replace(hostLower, ":443$", ""))
        .when(scheme === "http://", regexp_replace(hostLower, ":80$", ""))
        .otherwise(hostLower)
    val host = regexp_replace(hostNoPort, "^www\\.", "")
    val pathRaw = regexp_extract(pathq, "^([^?]*)", 1)
    val qRaw = when(pathq.contains("?"),
      regexp_replace(pathq, "^[^?]*\\?", "")).otherwise(lit(""))
    val p1 = regexp_replace(pathRaw, "/{2,}", "/")
    val p2 = when(p1 === "/", p1).otherwise(regexp_replace(p1, "/$", ""))
    val path = when(p2 === "", lit("/")).otherwise(p2)
    val params = filter(split(qRaw, "&"),
      p => length(p) > 0 && !p.rlike(trackingParamRe))
    val q = array_join(array_sort(params), "&")
    concat(scheme, host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Per-document dedup verdicts by canonical URL: every row keeps its
    * canonical form, the group's deterministic keeper (min id), the group
    * size, and whether this row IS the keeper. Callers drop
    * `!is_keeper` rows; the full mapping is returned (rather than the
    * filtered corpus) so provenance survives — the same contract as
    * [[Dedup.exactDedup]].
    *
    * Window form, not agg-plus-join-back: every output row needs its
    * group's keeper/size, so the rows must co-locate by canonical URL
    * either way — the window does it with ONE scan and ONE shuffle, where
    * the self-join scanned the input (and evaluated the sizeable
    * [[canonicalize]] expression tree) twice, once per join branch.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("canon_url")
    docs.withColumn("canon_url", canonicalize(col(urlCol)))
      .select(col(idCol), col(urlCol), col("canon_url"),
        min(col(idCol)).over(w).as("keeper_id"),
        count(lit(1)).over(w).as("group_size"))
      .withColumn("is_keeper", col(idCol) === col("keeper_id"))
  }

  /** Deterministic messy-URL synthesis for the gate: four variants per
    * collision group exercising every canonicalization rule (case, default
    * port, `www.`, trailing/doubled slashes, parameter order, tracking
    * params, fragments) that all collapse to
    * `https://news-site{g%7}.example.org/stories/{g}?a=1&b=2`.
    * Twin of [[syntheticUrlSql]]; ids are non-negative in the test tables.
    */
  def syntheticUrl(id: Column): Column = {
    val g = (id % 40).cast("string")
    val hg = (id % 40 % 7).cast("string")
    val v = id % 4
    val scheme = when(v === 1, lit("HTTPS://")).otherwise(lit("https://"))
    val host = when(v === 1, concat(lit("News-Site"), hg, lit(".Example.ORG:443")))
      .when(v === 2, concat(lit("www.news-site"), hg, lit(".example.org")))
      .otherwise(concat(lit("news-site"), hg, lit(".example.org")))
    val path = when(v === 1, concat(lit("/stories/"), g, lit("/")))
      .when(v === 2, concat(lit("/stories//"), g))
      .otherwise(concat(lit("/stories/"), g))
    val qf = when(v === 0, lit("?b=2&a=1"))
      .when(v === 1, lit("?a=1&utm_source=rss&b=2"))
      .when(v === 2, lit("?a=1&b=2#section-3"))
      .otherwise(lit("?a=1&fbclid=abc123&b=2&utm_campaign=x"))
    concat(scheme, host, path, qf)
  }

  /** DuckDB expression twin of [[syntheticUrl]] over a `doc_id` column. */
  private def syntheticUrlSql: String =
    """(CASE WHEN doc_id % 4 = 1 THEN 'HTTPS://' ELSE 'https://' END ||
  CASE doc_id % 4
    WHEN 1 THEN 'News-Site' || (doc_id % 40 % 7) || '.Example.ORG:443'
    WHEN 2 THEN 'www.news-site' || (doc_id % 40 % 7) || '.example.org'
    ELSE 'news-site' || (doc_id % 40 % 7) || '.example.org' END ||
  CASE doc_id % 4
    WHEN 1 THEN '/stories/' || (doc_id % 40) || '/'
    WHEN 2 THEN '/stories//' || (doc_id % 40)
    ELSE '/stories/' || (doc_id % 40) END ||
  CASE doc_id % 4
    WHEN 0 THEN '?b=2&a=1'
    WHEN 1 THEN '?a=1&utm_source=rss&b=2'
    WHEN 2 THEN '?a=1&b=2#section-3'
    ELSE '?a=1&fbclid=abc123&b=2&utm_campaign=x' END)"""

  /** DuckDB twin of the `url_dedup` gate: [[syntheticUrl]] +
    * [[canonicalize]] + [[dedupByUrl]], step for step.
    */
  def urlDedupSql: String =
    s"""WITH u0 AS (SELECT doc_id, $syntheticUrlSql AS url FROM documents),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS nofrag FROM u0),
s2 AS (SELECT *,
  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*://)', 1)) AS scheme,
  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM s1),
s3 AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS auth,
  regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s2),
s4 AS (SELECT *,
  regexp_replace(CASE
      WHEN scheme = 'https://' THEN regexp_replace(lower(auth), ':443$$', '')
      WHEN scheme = 'http://' THEN regexp_replace(lower(auth), ':80$$', '')
      ELSE lower(auth) END, '^www\\.', '') AS host,
  regexp_extract(pathq, '^([^?]*)', 1) AS path_raw,
  CASE WHEN contains(pathq, '?')
       THEN regexp_replace(pathq, '^[^?]*\\?', '') ELSE '' END AS q_raw
  FROM s3),
s5 AS (SELECT *,
  CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path,
  array_to_string(list_sort(list_filter(string_split(q_raw, '&'),
    p -> length(p) > 0 AND NOT regexp_matches(p, '$trackingParamRe'))), '&')
    AS q
  FROM (SELECT *, CASE WHEN p1 = '/' THEN p1
                       ELSE regexp_replace(p1, '/$$', '') END AS p2
        FROM (SELECT *, regexp_replace(path_raw, '/{2,}', '/', 'g') AS p1
              FROM s4))),
canon AS (SELECT doc_id, url,
  scheme || host || path ||
    (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canon_url FROM s5),
k AS (SELECT canon_url, min(doc_id) AS keeper_id, count(*) AS group_size
  FROM canon GROUP BY canon_url)
SELECT c.doc_id, c.url, c.canon_url, k.keeper_id,
  CAST(k.group_size AS BIGINT) AS group_size,
  c.doc_id = k.keeper_id AS is_keeper
FROM canon c JOIN k USING (canon_url) ORDER BY c.doc_id"""
}
