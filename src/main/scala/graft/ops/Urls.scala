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

  /** ROBOTS-STYLE crawl-compliance filter — the stage every crawler runs
    * before a URL enters the frontier: match each URL's path against its
    * host's prefix rules and keep the verdict of the LONGEST matching
    * prefix, ties broken toward Allow (RFC 9309 §2.2.2 / the Google
    * matcher's rule). URLs whose host has no matching rule are allowed.
    * Returns (doc_id, host, path, matched_prefix, allowed) per document.
    *
    * Plan shape at 100 TB: the rules table is robots.txt-sized (rules per
    * host × hosts — megabytes for the whole web) and rides a BROADCAST;
    * matching is a row-local prefix test on the joined pairs and the
    * longest-prefix pick is a max(struct(len, allow, prefix)) aggregate
    * keyed on doc — no shuffle of the URL side beyond that one partial+
    * final agg, no window, no per-rule re-scan.
    *
    * The synthetic rules table ([[syntheticRobotsRules]]) is deterministic
    * from the host group space, exercising disallow prefixes, a LONGER
    * allow carve-out under a disallow (the longest-prefix case), and
    * hosts with no rules.
    */
  def robotsFilter(docs: DataFrame, rules: DataFrame,
                   idCol: String = "doc_id"): DataFrame = {
    val urls = docs.select(col(idCol).cast("long").as("doc_id"),
      canonicalize(syntheticUrl(col(idCol))).as("canon_url"))
    val parts = urls.select(col("doc_id"),
      regexp_extract(col("canon_url"), "^[a-z]+://([^/]*)", 1).as("host"),
      regexp_extract(col("canon_url"), "^[a-z]+://[^/]*([^?]*)", 1).as("path"))
    val j = parts.join(broadcast(rules),
      col("host") === col("rhost") &&
        startswith(col("path"), col("prefix")), "left")
    j.groupBy("doc_id", "host", "path")
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("len"), col("allow").as("allow"),
          col("prefix").as("prefix")))).as("m"))
      .select(col("doc_id"), col("host"), col("path"),
        col("m.prefix").as("matched_prefix"),
        coalesce(col("m.allow"), lit(1)).as("allowed"))
  }

  /** Deterministic synthetic robots rules over the 7-host group space:
    * even host groups disallow `/stories/1` but carve back
    * `/stories/1<hg>` (longest-prefix Allow under a Disallow); host
    * groups divisible by 3 additionally disallow `/stories/2`; the rest
    * of the host space has no rules.
    */
  def syntheticRobotsRules(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val hg = spark.range(7).select(col("id").as("hg"))
    val host = concat(lit("news-site"), col("hg").cast("string"),
      lit(".example.org"))
    val r1 = hg.filter(col("hg") % 2 === 0)
      .select(host.as("rhost"), lit("/stories/1").as("prefix"), lit(0).as("allow"))
    val r2 = hg.filter(col("hg") % 2 === 0)
      .select(host.as("rhost"),
        concat(lit("/stories/1"), col("hg").cast("string")).as("prefix"),
        lit(1).as("allow"))
    val r3 = hg.filter(col("hg") % 3 === 0)
      .select(host.as("rhost"), lit("/stories/2").as("prefix"), lit(0).as("allow"))
    r1.unionByName(r2).unionByName(r3)
  }

  /** DuckDB twin of the `url_robots_filter` gate: the canonical-URL CTE
    * chain, the same synthetic rules, the same longest-prefix /
    * Allow-on-tie pick (max over (len, allow, prefix) tuples).
    */
  def robotsFilterSql: String =
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
  regexp_extract(pathq, '^([^?]*)', 1) AS path_raw FROM s3),
s5 AS (SELECT doc_id, host,
  CASE WHEN p2 = '' THEN '/' ELSE p2 END AS path
  FROM (SELECT *, CASE WHEN p1 = '/' THEN p1
                       ELSE regexp_replace(p1, '/$$', '') END AS p2
        FROM (SELECT *, regexp_replace(path_raw, '/{2,}', '/', 'g') AS p1
              FROM s4))),
hg AS (SELECT unnest(range(7)) AS hg),
rules AS (
  SELECT 'news-site' || hg || '.example.org' AS rhost,
         '/stories/1' AS prefix, 0 AS allow FROM hg WHERE hg % 2 = 0
  UNION ALL
  SELECT 'news-site' || hg || '.example.org',
         '/stories/1' || hg, 1 FROM hg WHERE hg % 2 = 0
  UNION ALL
  SELECT 'news-site' || hg || '.example.org',
         '/stories/2', 0 FROM hg WHERE hg % 3 = 0),
m AS (SELECT s5.doc_id, s5.host, s5.path,
        max(CASE WHEN r.prefix IS NOT NULL
              THEN (length(r.prefix), r.allow, r.prefix) END) AS m
      FROM s5 LEFT JOIN rules r
        ON s5.host = r.rhost AND starts_with(s5.path, r.prefix)
      GROUP BY 1, 2, 3)
SELECT doc_id, host, path, m[3] AS matched_prefix,
       coalesce(m[2], 1) AS allowed
FROM m ORDER BY doc_id"""

  /** CRAWL-FRONTIER politeness schedule — the fetch-ordering stage between
    * URL dedup and the fetcher fleet: a crawler must never hammer one
    * host, so the frontier is laid out in WAVES — wave w fetches at most
    * ONE URL per host, hosts interleaved. `wave` = the URL's position in
    * its host's discovery-order queue; `slot` = its deterministic position
    * inside the wave (host asc, id asc — the dispatch order a fetcher
    * fleet drains). Hosts ride the same synthetic derivation as the
    * [[syntheticUrl]] family (`doc_id % 40 % 7`).
    *
    * Plan shape at 100 TB: two windows. The wave number is a
    * host-partitioned row_number — ONE host-keyed shuffle and a per-host
    * ordered scan whose state is a counter (the [[graft.ops.Events]]
    * sessionization shape: a mega-host means one LONG scan in one task —
    * linear, counter-state, but not split; if a single host's queue ever
    * dominated a 100-TB frontier, the standard mitigation is range-bucket
    * the host first). The SLOT window does have the bounded-partition
    * property: each wave holds at most one URL per host, so its
    * partitions are host-count-bounded, and a mega-host turns into MORE
    * waves rather than a bigger wave. No global sort, no driver state.
    */
  def crawlFrontier(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val host = concat(lit("news-site"),
      (col(idCol) % 40 % 7).cast("string"), lit(".example.org"))
    val wWave = Window.partitionBy("host").orderBy(idCol)
    val wSlot = Window.partitionBy("wave").orderBy(col("host"), col(idCol))
    docs.select(col(idCol), host.as("host"))
      .withColumn("wave", row_number().over(wWave).cast("long"))
      .withColumn("slot", row_number().over(wSlot).cast("long"))
  }

  /** DuckDB twin of [[crawlFrontier]]. */
  def crawlFrontierSql: String =
    """WITH u AS (SELECT doc_id,
  'news-site' || (doc_id % 40 % 7) || '.example.org' AS host FROM documents),
w AS (SELECT doc_id, host,
  row_number() OVER (PARTITION BY host ORDER BY doc_id) AS wave FROM u)
SELECT doc_id, host, wave,
  row_number() OVER (PARTITION BY wave ORDER BY host, doc_id) AS slot
FROM w ORDER BY wave, slot"""
}
