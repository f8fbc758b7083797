package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank — the per-host quality prior every web-corpus
  * curation pipeline keeps next to its URL table (CommonCrawl publishes
  * exactly this as its host-level ranking; quality-filtered corpora use it
  * to up/down-weight whole domains before any per-document scoring).
  *
  * Fixed-iteration power method over an integer-keyed directed edge list.
  * All rank mass lives in integer NANO-rank units (`BIGINT`, total mass
  * ~1e9): each per-edge contribution is `round(d * rank_nano / outdeg)`
  * computed in double and cast back to BIGINT, so every aggregation in the
  * loop is an order-free integer sum — the same cross-engine determinism
  * device as [[TextStats.unigramLogProb]]'s micro log-prob units. A raw
  * double power method would hash-mismatch the oracle on partial-agg
  * order alone.
  *
  * Plan shape at 100 TB: the host graph is tiny relative to the corpus
  * (millions of hosts vs billions of pages) but far too big for the
  * driver — everything here stays in DataFrames. The edge set joins its
  * out-degree once and is materialized partitioned by `src`
  * (`localCheckpoint`), so every iteration's join reuses that exchange and
  * only the rank table (one row per host) reshuffles. Lineage is cut per
  * round exactly as in [[Components.connectedComponents]]; a production
  * run over a multi-hour graph would swap the `localCheckpoint` for that
  * operator's reliable-checkpoint mode — the trade-off discussion there
  * applies verbatim.
  *
  * Dangling hosts (in-links but no out-links) simply emit nothing — the
  * "dropped dangling mass" PageRank variant, deterministic and mirrored in
  * the oracle; hosts nobody links to still surface with teleport-only mass
  * via the left join against the node universe.
  */
object Graphs {

  /** (host, rank_nano, rank) for every node of `edges` (first two columns:
    * src, dst; any integer type). `iters` fixed power-method rounds at
    * damping `d`; `rank` is the 6-dp double view of the exact BIGINT
    * `rank_nano`.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    val srcCol = edges.columns(0)
    val dstCol = edges.columns(1)
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // node universe = union of endpoints; referenced every round, so
    // materialize once (UNION-distinct, one shuffle)
    val nodes = e0.select(col("src").as("host"))
      .union(e0.select(col("dst").as("host")))
      .distinct().localCheckpoint(true)
    // grand node count rides a broadcast scalar, never the driver
    val nTot = broadcast(nodes.agg(count(lit(1)).cast("double").as("n_hosts")))
    // out-degree joined once; the checkpoint pins the src partitioning so
    // each round's join reuses this exchange instead of reshuffling edges
    val ed = e0.join(e0.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).localCheckpoint(true)
    val teleNano = round(lit((1.0 - damping) * 1e9) / col("n_hosts"))
      .cast("long")
    var ranks = nodes.crossJoin(nTot)
      .select(col("host"),
        round(lit(1e9) / col("n_hosts")).cast("long").as("rank_nano"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("host"))
        .select(col("dst"),
          round(lit(damping) * col("rank_nano").cast("double") /
            col("outdeg").cast("double")).cast("long").as("c"))
      val sums = contrib.groupBy("dst").agg(sum("c").as("in_nano"))
      ranks = nodes.join(sums, nodes("host") === sums("dst"), "left")
        .crossJoin(nTot)
        .select(nodes("host"),
          (teleNano + coalesce(col("in_nano"), lit(0L))).as("rank_nano"))
        .localCheckpoint(true)
    }
    ranks.select(col("host"), col("rank_nano"),
      round(col("rank_nano").cast("double") / 1e9, 6).as("rank"))
  }

  /** The synthetic host-space size for the gate: hosts live in Z_101.
    * 101 is prime, so the `src*31 + 7j` link targets spray across the
    * whole space and the graph is strongly connected at full occupancy.
    */
  val HostSpace = 101L

  /** Deterministic host graph from the documents table: host = doc_id mod
    * [[HostSpace]] (the synthetic stand-in for "host extracted from the
    * URL" — see [[Urls.canonicalize]] for the real extraction),
    * `1 + host mod 3` out-links per host at `(host*31 + 7j) mod 101,
    * j in 1..outdeg` (distinct targets since 7 and 14 are nonzero mod
    * 101). The varying out-degree makes the graph irregular, so the
    * stationary distribution is genuinely non-uniform — a regular graph
    * would gate only the teleport constant. At tiny SF not every host id
    * occurs, leaving some link targets dangling — handled, see the object
    * doc.
    */
  def hostEdges(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val hosts = docs.select(pmod(col(idCol), lit(HostSpace)).as("host"))
      .distinct()
    hosts.select(col("host"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
      .filter(col("j") <= pmod(col("host"), lit(3L)) + 1)
      .select(col("host").as("src"),
        pmod(col("host") * 31 + col("j") * 7, lit(HostSpace)).as("dst"))
  }

  /** [[hostEdges]] + [[pageRank]] over the documents table — the gate's
    * query body.
    */
  def hostPageRank(docs: DataFrame, iters: Int = 10): DataFrame =
    pageRank(hostEdges(docs), iters)

  /** DuckDB twin of [[hostPageRank]]: the ten iterations unrolled as CTE
    * pairs (standard SQL forbids aggregation over the recursive reference,
    * so a recursive CTE can't express the per-round groupBy portably —
    * unrolling is the deterministic spelling). Every arithmetic step
    * mirrors the Spark side literal for literal; `sum` casts back to
    * BIGINT because DuckDB widens integer sums to HUGEINT.
    */
  def hostPageRankSql(iters: Int = 10): String = {
    val it = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (SELECT e.dst,
  CAST(round(CAST(0.85 AS DOUBLE) * CAST(r.rank_nano AS DOUBLE)
    / CAST(d.outdeg AS DOUBLE)) AS BIGINT) AS c
  FROM e JOIN deg d USING (src) JOIN $prev r ON r.host = e.src),
r$i AS (SELECT nd.host,
  CAST(round(1.5e8 / (SELECT n_hosts FROM n)) AS BIGINT)
    + CAST(coalesce(s.in_nano, 0) AS BIGINT) AS rank_nano
  FROM nodes nd LEFT JOIN
    (SELECT dst, CAST(sum(c) AS BIGINT) AS in_nano FROM c$i GROUP BY dst) s
    ON nd.host = s.dst)"""
    }.mkString(",\n")
    s"""WITH hosts AS (SELECT DISTINCT doc_id % ${HostSpace} AS host FROM documents),
e AS (SELECT host AS src, (host*31 + 7*j) % ${HostSpace} AS dst
  FROM hosts, (VALUES (1),(2),(3)) t(j) WHERE j <= 1 + host % 3),
nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_hosts FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT host,
  CAST(round(1e9 / (SELECT n_hosts FROM n)) AS BIGINT) AS rank_nano
  FROM nodes),
$it
SELECT host, rank_nano,
  round(CAST(rank_nano AS DOUBLE) / 1e9, 6) AS rank
FROM r$iters ORDER BY host"""
  }
}
