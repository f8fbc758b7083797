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
}
