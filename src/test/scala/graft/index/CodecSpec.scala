package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Codec round-trip properties (FIXTURES.md §8). */
class CodecSpec extends AnyFunSuite {

  test("varint round-trip: hand-picked edges") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(1L),
      Array(127L, 128L, 129L),
      Array(0L, 1L, 2L, 3L),
      Array(5L, 6L, 1L << 28, (1L << 28) + 1, Long.MaxValue - 1, Long.MaxValue))
    cases.foreach { xs =>
      assert(Codec.decodeVarLongs(Codec.encodeVarLongs(xs), xs.length).toSeq == xs.toSeq)
    }
  }

  test("docId delta round-trip: sorted random sequences (seeded property)") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(300)
      val xs = Array.fill(n)(math.abs(rnd.nextLong()) % (1L << 60))
        .distinct.sorted
      assert(Codec.decodeDocIds(Codec.encodeDocIds(xs), xs.length).toSeq == xs.toSeq)
    }
  }

  test("doubles round-trip is bit-exact") {
    val xs = Array(0.0, -0.0, 1.5, math.Pi, Double.MinPositiveValue,
      Double.MaxValue, 1.0 / 3.0, BM25.idfLike)
    val back = Codec.decodeDoubles(Codec.encodeDoubles(xs))
    xs.zip(back).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b))
    }
  }

  private object BM25 {
    val idfLike: Double = math.log((500.0 - 42 + 0.5) / (42 + 0.5) + 1.0)
  }
}
