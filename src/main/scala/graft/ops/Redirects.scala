package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the crawl-frontier stage that canonicalizes
  * every fetched URL to its FINAL destination before dedup/indexing (3xx
  * hops, `www.` consolidations, URL-shortener chains). A crawl table is a
  * functional graph (each source has exactly one redirect target), so the
  * scalable form is POINTER DOUBLING, not per-hop iteration: after round k
  * every pointer has skipped up to 2^k hops, so chains of length L resolve
  * in ceil(log2 L) self-joins instead of L — the [[Components]] trick
  * specialized to out-degree-1 graphs.
  *
  * Plan shape at 100 TB: the pointer table is one row per redirecting
  * source; each round is ONE self-join on the pointer key (never the raw
  * corpus), lineage cut per round via `localCheckpoint` exactly as in
  * [[Graphs.pageRank]]. No driver-side chain walking, nothing collected.
  * Redirect LOOPS (a→b→a — real crawls are full of them) never reach a
  * terminal: after the fixed round budget they are classified `loop` and
  * would be dropped by the frontier, mirroring production crawlers'
  * max-redirect policy.
  *
  * Cross-engine determinism: rounds are fixed; each round is a pure
  * left-join coalesce — the oracle unrolls the SAME doublings as CTEs,
  * so the (src, final, status) table matches exactly.
  */
object Redirects {

  /** Resolve each redirect source to its final target: (src, final_dst,
    * max_hops, status) with status in resolved | loop. `redirects` first
    * two columns are (src, dst), one row per source. `rounds` doublings
    * resolve any acyclic chain of length <= 2^rounds.
    */
  def resolve(redirects: DataFrame, rounds: Int = 4): DataFrame = {
    val srcCol = redirects.columns(0)
    val dstCol = redirects.columns(1)
    val e = redirects.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // pointer table: src -> current known endpoint of its skip chain
    var ptr = e.select(col("src"), col("dst").as("ptr"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      // ptr' = ptr(ptr) when the endpoint itself redirects, else ptr is
      // already terminal and stays put — one equi-join per round
      val hop = ptr.select(col("src").as("p_src"), col("ptr").as("p_ptr"))
      ptr = ptr.join(hop, ptr("ptr") === hop("p_src"), "left")
        .select(col("src"), coalesce(col("p_ptr"), col("ptr")).as("ptr"))
        .localCheckpoint(true)
    }
    // terminal = never a redirect source; anything still pointing at a
    // source after the round budget sits on (or feeds) a cycle
    val srcs = e.select(col("src").as("s")).distinct()
    ptr.join(srcs, ptr("ptr") === srcs("s"), "left")
      .select(col("src"), col("ptr").as("final_dst"),
        lit(1L << rounds).as("max_hops"),
        when(col("s").isNull, "resolved").otherwise("loop").as("status"))
  }

  /** Deterministic host-level redirect synthesis for the gate: hosts
    * 0..[[Graphs.HostSpace]]-1 derived from the documents table; every
    * host NOT divisible by 7 redirects one step down (h -> h-1), so
    * chains of length 1..6 all terminate at the multiple-of-7 below —
    * plus a disjoint 3-cycle (1000 -> 1001 -> 1002 -> 1000) standing in
    * for the redirect loops every real crawl hits.
    */
  def syntheticRedirects(docs: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val hosts = docs.select(
        pmod(col(idCol), lit(Graphs.HostSpace)).as("h"))
      .distinct()
    val chain = hosts.filter(pmod(col("h"), lit(7L)) =!= 0)
      .select(col("h").as("src"), (col("h") - 1).as("dst"))
    val cycle = docs.sparkSession.range(3)
      .select((col("id") + 1000L).as("src"),
        (pmod(col("id") + 1, lit(3L)) + 1000L).as("dst"))
    chain.union(cycle)
  }

  /** DuckDB twin of the `redirect_resolve` gate: the same synthesis and
    * the same `rounds` pointer doublings unrolled as CTEs p1..pN (each a
    * left-join coalesce of the previous one with itself), then the same
    * terminal / loop classification.
    */
  def resolveSql(rounds: Int = 4): String = {
    val doublings = (1 to rounds).map { k =>
      s"""p$k AS (SELECT a.src, coalesce(b.ptr, a.ptr) AS ptr
  FROM p${k - 1} a LEFT JOIN p${k - 1} b ON a.ptr = b.src)"""
    }.mkString(",\n")
    s"""WITH hosts AS (SELECT DISTINCT doc_id % ${Graphs.HostSpace} AS h FROM documents),
e AS (SELECT h AS src, h - 1 AS dst FROM hosts WHERE h % 7 <> 0
  UNION ALL
  SELECT 1000 + i AS src, 1000 + (i + 1) % 3 AS dst
  FROM (VALUES (0),(1),(2)) t(i)),
p0 AS (SELECT src, dst AS ptr FROM e),
$doublings
SELECT p.src, p.ptr AS final_dst,
  CAST(${1L << rounds} AS BIGINT) AS max_hops,
  CASE WHEN s.src IS NULL THEN 'resolved' ELSE 'loop' END AS status
FROM p$rounds p LEFT JOIN (SELECT DISTINCT src FROM e) s ON p.ptr = s.src
ORDER BY p.src"""
  }
}
