package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pointer-doubling redirect resolution vs a local chain-walking twin,
  * plus loop classification and the log-round chain-length bound.
  */
class RedirectsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("resolve follows chains to their terminal and flags loops") {
    // chain 5 -> 4 -> 3 -> 0 (terminal), isolated edge 9 -> 8 (terminal),
    // loop 20 -> 21 -> 20, tail INTO the loop 22 -> 20
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 0L), (9L, 8L),
      (20L, 21L), (21L, 20L), (22L, 20L))
      .toDF("src", "dst")
    val got = Redirects.resolve(edges, rounds = 3)
      .select("src", "final_dst", "status")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(5L) === ((0L, "resolved")))
    assert(got(4L) === ((0L, "resolved")))
    assert(got(3L) === ((0L, "resolved")))
    assert(got(9L) === ((8L, "resolved")))
    assert(got(20L)._2 === "loop")
    assert(got(21L)._2 === "loop")
    assert(got(22L)._2 === "loop")
    assert(got.size === 7)
  }

  test("rounds bound: a length-L chain resolves iff 2^rounds >= L") {
    // straight chain 8 -> 7 -> ... -> 0, length 8
    val edges = (1L to 8L).map(i => (i, i - 1)).toDF("src", "dst")
    val r3 = Redirects.resolve(edges, rounds = 3)
      .filter($"src" === 8L).select("final_dst", "status")
      .as[(Long, String)].collect().head
    assert(r3 === ((0L, "resolved"))) // 2^3 = 8 >= 8 hops
    val r2 = Redirects.resolve(edges, rounds = 2)
      .filter($"src" === 8L).select("status").as[String].collect().head
    assert(r2 === "loop") // 2^2 = 4 < 8: budget exhausted mid-chain
  }

  test("property: resolve == local chain walk on random functional graphs") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(40)
      // each node redirects with p=0.7 to a random OTHER node (self-loops
      // allowed occasionally make 1-cycles — also a real crawl case)
      val edges = (0L until n.toLong).flatMap { i =>
        if (rnd.nextDouble() < 0.7) Some((i, rnd.nextInt(n).toLong)) else None
      }
      val srcs = edges.map(_._1).toSet
      val next = edges.toMap
      val rounds = 4
      val budget = 1 << rounds
      def walk(x: Long): (Long, String) = {
        // position after up to `budget` hops, stopping at a terminal
        var cur = next(x); var hops = 1
        while (hops < budget && srcs.contains(cur)) { cur = next(cur); hops += 1 }
        (cur, if (srcs.contains(cur)) "loop" else "resolved")
      }
      if (edges.nonEmpty) {
        val got = Redirects.resolve(edges.toDF("src", "dst"), rounds)
          .select("src", "final_dst", "status")
          .as[(Long, Long, String)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
        edges.map(_._1).foreach { s =>
          val (fin, st) = walk(s)
          assert(got(s)._2 === st, s"trial $trial src $s")
          if (st == "resolved")
            assert(got(s)._1 === fin, s"trial $trial src $s terminal")
        }
      }
    }
  }

  test("syntheticRedirects: every chain source resolves to the multiple-of-7 below; cycle nodes loop") {
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Redirects.resolve(Redirects.syntheticRedirects(docs))
      .select("src", "final_dst", "status")
      .as[(Long, Long, String)].collect()
    val (loops, resolved) = got.partition(_._3 == "loop")
    assert(loops.map(_._1).toSet === Set(1000L, 1001L, 1002L))
    assert(resolved.forall { case (s, f, _) => f === (s / 7) * 7 })
    // hosts 1..HostSpace-1 excluding multiples of 7 are exactly the sources
    val expectSrcs = (0L until Graphs.HostSpace).filter(_ % 7 != 0).toSet
    assert(resolved.map(_._1).toSet === expectSrcs)
  }
}
