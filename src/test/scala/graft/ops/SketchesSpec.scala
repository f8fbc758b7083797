package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Sketch family: KMV distinct estimation and priority sampling, tested
  * against independent local reimplementations (plain Scala, no Spark)
  * plus the estimators' own statistical guarantees.
  */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(sha256Hex(s).substring(0, 15), 16)

  private val Two60 = math.pow(2.0, 60)

  private def tok(text: String): Seq[String] =
    text.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq

  private def corpus(seed: Int, n: Int, vocab: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val langs = Array("en", "de", "fr")
    (0L until n).map { id =>
      val k = 5 + rnd.nextInt(25)
      val words = Seq.fill(k)(f"word${rnd.nextInt(vocab)}%04d")
      (id, words.mkString(" "), langs(rnd.nextInt(langs.length)))
    }
  }

  test("kmvDistinct == local KMV brute force; small groups exact") {
    val rows = corpus(1, 400, vocab = 900) ++
      // a tiny language with < k distinct terms -> small-set exact rule
      Seq((9000L, "rare tokens only here", "la"), (9001L, "rare again now", "la"))
    val df = rows.toDF("doc_id", "text", "lang")
    val k = 64
    val got = Sketches.kmvDistinct(df, k).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    val byLang = rows.groupBy(_._3).map { case (l, g) =>
      l -> g.flatMap(t => tok(t._2)).distinct
    }
    byLang.foreach { case (lang, terms) =>
      val exact = terms.size.toLong
      val hs = terms.map(t => (h60(t), t)).sortBy(identity).take(k)
      val nKept = hs.size.toLong
      val est =
        if (nKept < k) nKept.toDouble
        else r6((k - 1).toDouble * Two60 / hs.last._1.toDouble)
      val relErr = r6(math.abs(est - exact) / exact)
      assert(got(lang) === ((exact, nKept, est, relErr)), s"lang $lang")
    }
    // the sketch should actually estimate well at k=64 on ~300-term groups
    assert(got.filter(_._2._1 >= 200).values.forall(_._4 < 0.30))
    // small-set rule: the planted language is exact
    assert(got("la")._4 == 0.0)
  }

  test("prioritySample == local brute force; HT estimate well-calibrated") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(id => (id, 50L + rnd.nextInt(4000)))
    val df = rows.toDF("doc_id", "n_chars")
    val k = 32
    val got = Sketches.prioritySample(df, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // local twin
    val pri = rows.map { case (id, w) =>
      val u = (h60(id.toString).toDouble + 1.0) / Two60
      (id, w.toDouble, w.toDouble / u)
    }.sortBy(t => (-t._3, t._1))
    val tau = pri(k)._3
    val kept = pri.take(k).zipWithIndex.map { case ((id, w, _), i) =>
      (id, w, (i + 1).toLong, r6(math.max(w, tau)))
    }
    val sumExact = rows.map(_._2).sum
    val sumEst = kept.map(t => math.round(t._4 * 1e6)).sum.toDouble / 1e6
    val relErr = r6(math.abs(sumEst - sumExact) / sumExact)
    assert(got.length == k)
    got.zip(kept).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) === e, s"rank ${e._3}")
      assert((g._5, g._6, g._7) === ((sumExact, sumEst, relErr)))
    }
    // Duffield-Lund-Thorup unbiasedness in practice: one draw at k=32
    // over n=300 should land within 40% (typical draws are far closer)
    assert(relErr < 0.4, s"relErr $relErr")
  }

  /** Local twin of [[Sketches.kmvSourceOverlap]]. */
  private def bruteMerge(rows: Seq[(Long, String, String)], k: Int)
      : Map[(String, String), (Long, Long, Double, Double, Double)] = {
    val bySrc: Map[String, Seq[(Long, String)]] = rows.groupBy(_._3)
      .map { case (s, g) =>
        s -> g.flatMap(t => tok(t._2)).distinct.map(t => (h60(t), t))
          .sortBy(identity).take(k)
      }
    val srcs = bySrc.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
      ska = bySrc(a).map(_._1).sorted
      skb = bySrc(b).map(_._1).sorted
      ma = (ska ++ skb).distinct.sorted
      m = ma.take(k)
      unionEst = if (ma.size < k) ma.size.toDouble
        else (k - 1).toDouble * Two60 / m.last.toDouble
      ovl = m.count(u => ska.contains(u) && skb.contains(u)).toDouble
    } yield (a, b) -> ((ska.size.toLong, skb.size.toLong, r6(unionEst),
      r6(ovl / m.size), r6(ovl * unionEst / m.size)))).toMap
  }

  test("kmvSourceOverlap == local merged-sketch brute force; small-set exact") {
    val rnd = new scala.util.Random(13)
    val srcs = Array("s0", "s1", "s2", "s3")
    val rows = (0L until 260L).map { id =>
      val n = 5 + rnd.nextInt(20)
      (id, Seq.fill(n)(f"w${rnd.nextInt(300)}%03d").mkString(" "),
        srcs(rnd.nextInt(srcs.length)))
    }
    val k = 64
    val got = Sketches.kmvSourceOverlap(
      rows.toDF("doc_id", "text", "source"), k).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val expect = bruteMerge(rows, k)
    assert(got == expect, s"diff=${(expect.toSet -- got.toSet).take(2)}")
    // accuracy against TRUE set algebra at k=64 over ~200-term sources
    val trueSets = rows.groupBy(_._3)
      .map { case (s, g) => s -> g.flatMap(t => tok(t._2)).toSet }
    expect.foreach { case ((a, b), (_, _, uEst, jEst, _)) =>
      val tu = (trueSets(a) | trueSets(b)).size.toDouble
      val tj = (trueSets(a) & trueSets(b)).size.toDouble / tu
      assert(math.abs(uEst - tu) / tu < 0.35, s"union $a-$b: $uEst vs $tu")
      assert(math.abs(jEst - tj) < 0.30, s"jaccard $a-$b: $jEst vs $tj")
    }
  }

  test("kmvSourceOverlap with k >= vocab is EXACT set algebra") {
    val rows = Seq(
      (0L, "aaa bbb ccc ddd", "p"), (1L, "ccc ddd eee", "q"),
      (2L, "aaa xxx", "p"), (3L, "yyy zzz ddd", "q"))
    val got = Sketches.kmvSourceOverlap(
      rows.toDF("doc_id", "text", "source"), k = 64).collect()
    assert(got.length == 1)
    val r = got(0)
    // p = {aaa,bbb,ccc,ddd,xxx}, q = {ccc,ddd,eee,yyy,zzz}
    // union = 8, intersection = {ccc,ddd} = 2, jaccard = 0.25
    assert((r.getString(0), r.getString(1)) == (("p", "q")))
    assert(r.getDouble(4) == 8.0)
    assert(r.getDouble(5) == 0.25)
    assert(r.getDouble(6) == 2.0)
  }

  test("prioritySample: corpus smaller than k degenerates to exact") {
    val rows = (0L until 10L).map(id => (id, 100L + id))
    val got = Sketches.prioritySample(rows.toDF("doc_id", "n_chars"), k = 32)
      .collect()
    assert(got.length == 10)
    // no tau -> est_w == w for every row, and the totals agree exactly
    got.foreach(r => assert(r.getDouble(3) == r.getDouble(1)))
    assert(got.head.getDouble(6) == 0.0)
  }
}
