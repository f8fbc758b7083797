package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Out-of-orderness profile: tested against an independent local
  * reimplementation (arrival permutation, running high-watermark,
  * interpolated quantiles) plus structural invariants.
  */
class LatenessSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def jitter(id: Long): Long =
    java.lang.Long.parseLong(sha256Hex("a" + id).substring(0, 8), 16) % 8

  /** Linear-interpolation percentile — the Spark `percentile` / DuckDB
    * `quantile_cont` shared definition.
    */
  private def pct(sorted: Seq[Long], q: Double): Double = {
    val pos = q * (sorted.size - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo).toDouble
    else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  private def brute(rows: Seq[(Long, Long, String)]) // (id, tsUs, type)
      : Map[String, (Long, Long, Double, Double, Double, Double)] =
    rows.groupBy(_._3).map { case (tpe, es) =>
      val arrival = es.sortBy { case (id, _, _) => (id + jitter(id) * 2, id) }
      var hwm = Long.MinValue
      val late = arrival.map { case (_, ts, _) =>
        val l = if (hwm == Long.MinValue) 0L else math.max(0L, hwm - ts)
        hwm = math.max(hwm, ts)
        l
      }
      val s = late.sorted
      tpe -> ((es.size.toLong, late.count(_ > 0).toLong,
        r6(pct(s, 0.5) / 1e6), r6(pct(s, 0.95) / 1e6),
        r6(pct(s, 0.99) / 1e6), r6(s.max.toDouble / 1e6)))
    }

  private def run(rows: Seq[(Long, Long, String)])
      : Map[String, (Long, Long, Double, Double, Double, Double)] =
    Events.latenessProfile(
      rows.toDF("event_id", "ts_us", "event_type")
        .selectExpr("event_id", "timestamp_micros(ts_us) AS ts", "event_type"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap

  test("latenessProfile == local brute force over the synthesized arrival order") {
    val rnd = new scala.util.Random(11)
    val types = Array("click", "view", "error")
    var ts = 1700000000000000L
    val rows = (0L until 900L).map { id =>
      ts += 500000L + rnd.nextInt(120000000) // 0.5 s .. 2 min gaps
      (id, ts, types(rnd.nextInt(types.length)))
    }
    val got = run(rows)
    val expect = brute(rows)
    assert(got == expect, s"diff=${(expect.toSet -- got.toSet).take(2)}")
    // the jitter must create genuine disorder somewhere
    assert(expect.values.exists(_._2 > 0))
  }

  test("an already-in-arrival-order stream profiles as zero lateness") {
    // constant jitter displacement cannot reorder equal-gap events when
    // every gap exceeds the max displacement: craft ids whose jittered
    // arrival order equals id order by spacing arr slots far apart
    val rows = (0L until 50L).map(id => (id * 100L, 1000000L * id, "steady"))
    val got = run(rows)
    assert(got("steady")._2 == 0L)
    assert(got("steady")._6 == 0.0)
  }
}
