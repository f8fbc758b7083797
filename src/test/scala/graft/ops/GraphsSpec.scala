package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer nano-rank PageRank vs a local brute-force twin, plus the
  * structural invariants the gate can't see (mass bounds, dangling
  * behavior, partitioning invariance).
  */
class GraphsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Local twin of [[Graphs.pageRank]]: same integer nano-rank rounding,
    * same iteration structure, plain Scala maps.
    */
  private def localPageRank(edges: Seq[(Long, Long)], iters: Int,
                            damping: Double = 0.85): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = edges.groupBy(_._1).map { case (s, g) => s -> g.size }
    val tele = math.round((1.0 - damping) * 1e9 / n)
    var r: Map[Long, Long] = nodes.map(_ -> math.round(1e9 / n)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) =>
          math.round(damping * r(s).toDouble / outdeg(s).toDouble)
        }.sum
      }
      r = nodes.map(v => v -> (tele + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the local integer twin on an irregular graph") {
    // 7 nodes, mixed out-degrees, a dangling node (6 has in-links only)
    val edges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      3L -> 4L, 3L -> 6L, 4L -> 0L, 5L -> 6L, 5L -> 5L)
    assert(run(edges, 10) == localPageRank(edges, 10))
  }

  test("two-node cycle converges to the uniform fixed point") {
    val got = run(Seq(0L -> 1L, 1L -> 0L), 20)
    // symmetric graph: both nodes carry half the mass
    assert(got(0L) == got(1L))
    assert(math.abs(got(0L) - 500000000L) < 5)
  }

  test("dangling sinks keep teleport-plus-inflow; mass never exceeds 1e9") {
    // star into node 9: node 9 has no out-edges (dangling), sources chain
    val edges = (0L until 9L).map(i => i -> 9L) ++ Seq(0L -> 1L)
    val got = run(edges, 10)
    assert(got.size == 10)
    // the sink holds the most rank; dropped dangling mass keeps the total
    // strictly below the initial 1e9 but above teleport-only
    assert(got(9L) == got.values.max)
    val total = got.values.sum
    assert(total > 0L && total <= 1000000010L)
    assert(got == localPageRank(edges, 10))
  }

  test("result is invariant to input partitioning") {
    val edges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      3L -> 4L, 4L -> 0L)
    val base = run(edges, 8)
    val shuffled = Graphs.pageRank(
      edges.toDF("src", "dst").repartition(7), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
  }

  test("hostEdges: out-degree follows 1 + host%3; targets stay in Z_101") {
    val docs = (0L until 500L).toDF("doc_id")
    val e = Graphs.hostEdges(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byS = e.groupBy(_._1)
    assert(byS.keys.toSeq.sorted == (0L until 101L))
    byS.foreach { case (s, g) =>
      assert(g.length == 1 + (s % 3).toInt)
      assert(g.map(_._2).distinct.length == g.length) // no duplicate targets
      g.foreach { case (_, d) => assert(d >= 0L && d < 101L) }
    }
  }

  test("hostPageRank: non-uniform, 6-dp view consistent with rank_nano") {
    val docs = (0L until 500L).toDF("doc_id")
    val out = Graphs.hostPageRank(docs, iters = 5).collect()
    assert(out.length == 101)
    val nanos = out.map(_.getLong(1))
    assert(nanos.distinct.length > 50) // irregular graph => spread-out mass
    out.foreach { r =>
      val want = BigDecimal(r.getLong(1).toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == want)
    }
  }
}
