package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** URL canonicalization rules (unit fixtures per rule), dedup-by-URL
  * invariants, and the unigram log-prob score vs a local brute-force
  * reference with the same micro-unit rounding.
  */
class UrlsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Urls.canonicalize(org.apache.spark.sql.functions.col("url")))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; default port and www. stripped") {
    assert(canon("HTTPS://WWW.Example.COM:443/a") ==
      Seq("https://example.com/a"))
    assert(canon("http://Example.com:80/a") == Seq("http://example.com/a"))
    // non-default port survives; :80 is NOT default for https
    assert(canon("https://example.com:8080/a") ==
      Seq("https://example.com:8080/a"))
    assert(canon("https://example.com:80/a") ==
      Seq("https://example.com:80/a"))
  }

  test("path normalization: slash runs, trailing slash, empty path") {
    assert(canon("https://h.io//a///b/") == Seq("https://h.io/a/b"))
    assert(canon("https://h.io/") == Seq("https://h.io/"))
    assert(canon("https://h.io") == Seq("https://h.io/"))
  }

  test("query: tracking params dropped, rest sorted, fragment dropped") {
    assert(canon("https://h.io/p?b=2&a=1") == Seq("https://h.io/p?a=1&b=2"))
    assert(canon("https://h.io/p?utm_source=x&a=1&fbclid=z&gclid=g&ref=r") ==
      Seq("https://h.io/p?a=1"))
    assert(canon("https://h.io/p?utm_campaign=only") == Seq("https://h.io/p"))
    assert(canon("https://h.io/p?a=1#frag") == Seq("https://h.io/p?a=1"))
    assert(canon("https://h.io/p#frag") == Seq("https://h.io/p"))
  }

  test("the four synthetic variants of a group share one canonical form") {
    val df = (0L until 160L).toDF("doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Urls.syntheticUrl(org.apache.spark.sql.functions.col("doc_id"))
          .as("url"))
    val out = Urls.dedupByUrl(df).collect()
    assert(out.length == 160)
    val byCanon = out.groupBy(_.getString(2))
    assert(byCanon.size == 40) // one canonical URL per collision group
    byCanon.foreach { case (cu, rows) =>
      assert(cu.startsWith("https://news-site"))
      assert(!cu.contains("utm_") && !cu.contains("fbclid") &&
        !cu.contains("#") && !cu.contains("//stories"))
      val keeper = rows.map(_.getLong(0)).min
      assert(rows.forall(_.getLong(3) == keeper))       // keeper_id
      assert(rows.forall(_.getLong(4) == rows.length))  // group_size
      assert(rows.count(_.getBoolean(5)) == 1)          // one is_keeper
      assert(rows.find(_.getBoolean(5)).get.getLong(0) == keeper)
    }
  }

  test("unigram log-prob equals local brute force (micro-unit rounding)") {
    val docs = Seq(
      (1L, "alpha beta beta gamma words here"),
      (2L, "alpha alpha delta words appear twice"),
      (3L, "no overlap tokens whatsoever really"),
      (4L, "xy z"), // everything <= 2 chars: zero tokens, NULL score
      (5L, "gamma gamma gamma gamma gamma gamma"))
      .toDF("doc_id", "text")
    val got = TextStats.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    // local reference: same tokenizer, same integer micro contributions
    val toks: Map[Long, Seq[String]] = Map(
      1L -> "alpha beta beta gamma words here",
      2L -> "alpha alpha delta words appear twice",
      3L -> "no overlap tokens whatsoever really",
      4L -> "xy z",
      5L -> "gamma gamma gamma gamma gamma gamma")
      .map { case (id, t) =>
        id -> t.split("[^a-zA-Z0-9]+").filter(_.length > 2).map(_.toLowerCase).toSeq
      }
    val cnt = toks.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val total = cnt.values.sum.toDouble
    toks.foreach { case (id, ts) =>
      val (n, score) = got(id)
      assert(n == ts.length)
      if (ts.isEmpty) assert(score.isEmpty)
      else {
        val micro = ts.groupBy(identity).map { case (t, g) =>
          math.round(g.size.toDouble * math.log10(cnt(t) / total) * 1e6)
        }.sum
        val want = BigDecimal(micro.toDouble / 1e6 / ts.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(score.contains(want), s"doc $id")
      }
    }
    // rarer vocabulary scores lower; pure repetition of a common term higher
    assert(got(3L)._2.get < got(1L)._2.get)
    assert(got(5L)._2.get > got(3L)._2.get)
  }
}
