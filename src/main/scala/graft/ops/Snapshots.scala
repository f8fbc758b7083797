package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-snapshot diff — the "what changed since the last crawl" report
  * every incremental corpus pipeline starts from (CommonCrawl's per-snapshot
  * churn statistics; a training-data refresh decides re-process / drop /
  * ingest from exactly this classification). Complements
  * [[Dedup.incrementalDedup]]: that operator answers "is this batch row
  * already indexed" for ingest, this one produces the four-way per-key
  * verdict (added / removed / changed / unchanged) across two whole
  * snapshots.
  *
  * Plan shape at 100 TB: each side is scanned ONCE and reduced map-side to
  * (key, sha256) — 40 B a row regardless of document size — then a single
  * full-outer shuffle join on the key classifies every row. Keys are unique
  * per side by construction (canonical URL / doc id), so the join is
  * skew-free; the verdict expression is a narrow codegen projection over
  * the join output. No driver-side state, nothing collected.
  *
  * Cross-engine determinism: sha256 is bit-exact everywhere; the verdict is
  * pure CASE logic over null-ness and hash equality.
  */
object Snapshots {

  /** Per-key diff verdict between two snapshots: (idCol, status, sha_prev,
    * sha_next) with status in added | removed | changed | unchanged.
    * Text is hashed, never compared raw — the 100-TB form.
    */
  def crawlDiff(prev: DataFrame, next: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    // null text hashes as empty (sha2(null) would null the sha and make a
    // PRESENT row classify as added/removed — presence must be decided by
    // the row, not the payload)
    val p = prev.select(col(idCol).as("id"),
      sha2(coalesce(col(textCol), lit("")), 256).as("sha_prev"))
    val n = next.select(col(idCol).as("id"),
      sha2(coalesce(col(textCol), lit("")), 256).as("sha_next"))
    p.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("sha_prev").isNull, "added")
          .when(col("sha_next").isNull, "removed")
          .when(col("sha_prev") === col("sha_next"), "unchanged")
          .otherwise("changed").as("status"),
        col("sha_prev"), col("sha_next"))
  }

  /** Deterministic next-snapshot synthesis for the gate, exercising all
    * four verdicts: every 5th doc (id % 5 = 4) vanishes (removed), every
    * id % 3 = 1 survivor is edited (changed), ids % 7 = 0 additionally
    * reappear shifted above max(doc_id) as brand-new pages (added — the
    * data-derived shift keeps new ids collision-free at ANY corpus
    * scale), the rest are untouched (unchanged). Twin of the CTEs inside
    * [[crawlDiffSql]].
    */
  def syntheticNext(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val shift = broadcast(docs.agg((max(col(idCol)) + 1).as("s")))
    val survivors = docs.filter(pmod(col(idCol), lit(5L)) =!= 4)
      .select(col(idCol),
        when(pmod(col(idCol), lit(3L)) === 1,
          concat(col(textCol), lit(" [edited v2]")))
          .otherwise(col(textCol)).as(textCol))
    val added = docs.filter(pmod(col(idCol), lit(7L)) === 0)
      .crossJoin(shift)
      .select((col(idCol) + col("s")).as(idCol),
        concat(col(textCol), lit(" [new page]")).as(textCol))
    survivors.union(added)
  }

  /** DuckDB twin of the `crawl_diff` gate: same synthesis, same full-outer
    * join, same CASE verdict.
    */
  def crawlDiffSql: String =
    """WITH shift AS (SELECT max(doc_id) + 1 AS s FROM documents),
p AS (SELECT doc_id AS id, sha256(coalesce(text, '')) AS sha_prev
  FROM documents),
nx AS (SELECT doc_id AS id,
  CASE WHEN doc_id % 3 = 1 THEN text || ' [edited v2]' ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 4
  UNION ALL
  SELECT doc_id + (SELECT s FROM shift) AS id, text || ' [new page]' AS text
  FROM documents WHERE doc_id % 7 = 0),
n AS (SELECT id, sha256(coalesce(text, '')) AS sha_next FROM nx)
SELECT coalesce(p.id, n.id) AS doc_id,
  CASE WHEN p.sha_prev IS NULL THEN 'added'
       WHEN n.sha_next IS NULL THEN 'removed'
       WHEN p.sha_prev = n.sha_next THEN 'unchanged'
       ELSE 'changed' END AS status,
  p.sha_prev, n.sha_next
FROM p FULL OUTER JOIN n ON p.id = n.id
ORDER BY doc_id"""

  /** CONTENT-level snapshot churn — the companion number to the per-doc
    * [[crawlDiff]] verdicts: how much of the new crawl's CONTENT (distinct
    * word shingles) is genuinely new, and how much of the old snapshot's
    * content survived. Doc-level diff over-counts churn (one edited line
    * flips a whole page to "changed"); the shingle view is what decides
    * whether a refresh is worth re-processing.
    *
    * Plan shape at 100 TB: each side is tokenized ONCE and its shingles
    * FNV-hashed map-side (8-byte keys — gram text never shuffles, the
    * [[Dedup.ngramNovelty]] device); the union of (h, sideA, sideB) flag
    * rows takes ONE aggregation shuffle on h (max-flag partial agg
    * dedupes in the combiner — no distinct pre-pass), and the final
    * set-algebra counts are a single micro rollup. No join of shingle
    * sets, no driver-side set.
    *
    * Output: one row (n_prev, n_next, n_new, n_dropped, n_shared,
    * novelty = n_new/n_next, retention = n_shared/n_prev), 6-dp.
    */
  def contentNovelty(prev: DataFrame, next: DataFrame, n: Int = 3,
                     textCol: String = "text"): DataFrame = {
    val hu = udf((s: String) => Dedup.fnv1a64(s))
    def hashes(df: DataFrame) = df
      .select(explode(Dedup.ngramsUdf(n)(col(textCol))).as("g"))
      .select(hu(col("g")).as("h"))
    val flags = hashes(prev)
      .select(col("h"), lit(1L).as("a"), lit(0L).as("b"))
      .union(hashes(next).select(col("h"), lit(0L).as("a"), lit(1L).as("b")))
      .groupBy("h").agg(max("a").as("a"), max("b").as("b"))
    flags.agg(
        sum(col("a")).as("n_prev"),
        sum(col("b")).as("n_next"),
        sum(when(col("b") === 1 && col("a") === 0, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
          .as("n_shared"))
      .select(col("n_prev"), col("n_next"), col("n_new"), col("n_dropped"),
        col("n_shared"),
        when(col("n_next") > 0, round(col("n_new").cast("double") /
          col("n_next").cast("double"), 6)).as("novelty"),
        when(col("n_prev") > 0, round(col("n_shared").cast("double") /
          col("n_prev").cast("double"), 6)).as("retention"))
  }

  /** DuckDB twin of the `snapshot_novelty` gate: [[contentNovelty]] over
    * (documents, [[syntheticNext]]) — same tokenizer, shingles, FNV
    * lanes, flag algebra.
    */
  def contentNoveltySql(n: Int = 3): String = {
    val concat = (0 until n).map(j =>
      if (j == 0) "arr[i]" else s"arr[i+$j]").mkString(" || ' ' || ")
    def side(rel: String) =
      s"""(SELECT ${DedupOracleSql.fnvSql("ngram")} AS h FROM (
    SELECT $concat AS ngram
    FROM (SELECT arr, generate_subscripts(arr, 1) AS i
          FROM (SELECT list_transform(${DedupOracleSql.alnum},
                  x -> lower(x)) AS arr FROM $rel))
    WHERE i <= len(arr) - ${n - 1}))"""
    s"""WITH shift AS (SELECT max(doc_id) + 1 AS s FROM documents),
nx AS (SELECT CASE WHEN doc_id % 3 = 1 THEN text || ' [edited v2]'
    ELSE text END AS text
  FROM documents WHERE doc_id % 5 <> 4
  UNION ALL
  SELECT text || ' [new page]' AS text
  FROM documents WHERE doc_id % 7 = 0),
fa AS ${side("documents")},
fb AS ${side("nx")},
flags AS (SELECT h, max(a) AS a, max(b) AS b FROM (
  SELECT h, 1 AS a, 0 AS b FROM fa
  UNION ALL SELECT h, 0 AS a, 1 AS b FROM fb) GROUP BY h),
agg AS (SELECT CAST(sum(a) AS BIGINT) AS n_prev,
  CAST(sum(b) AS BIGINT) AS n_next,
  CAST(sum(CASE WHEN b = 1 AND a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
  CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dropped,
  CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_shared
  FROM flags)
SELECT n_prev, n_next, n_new, n_dropped, n_shared,
  CASE WHEN n_next > 0 THEN
    round(CAST(n_new AS DOUBLE) / CAST(n_next AS DOUBLE), 6) END AS novelty,
  CASE WHEN n_prev > 0 THEN
    round(CAST(n_shared AS DOUBLE) / CAST(n_prev AS DOUBLE), 6) END
    AS retention
FROM agg"""
  }
}
