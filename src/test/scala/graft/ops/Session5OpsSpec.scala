package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Session-5 surface: DSIR importance weights, n-gram novelty, exact
  * fixed-n per-stratum sampling, and per-source exact quantiles — planted
  * fixtures + local twins.
  */
class Session5OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- DSIR importance weights ---------------------------------------------

  test("dsir weights rank target-like docs above target-unlike docs") {
    // target domain talks about kernels; the off-domain docs about cooking;
    // one test doc of each flavor sits in a third source
    val docs = (
      (0L until 8L).map(id =>
        (id, "kernel scheduler preemption latency kernel scheduler", "tgt")) ++
      (8L until 16L).map(id =>
        (id, "butter sugar flour oven whisk butter sugar", "web")) ++
      Seq((16L, "kernel preemption scheduler latency tuning", "other"),
          (17L, "sugar flour butter oven recipe", "other"))
    ).toDF("doc_id", "text", "source")
    val got = Dsir.importanceWeights(docs, targetSource = "tgt")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    // DSIR weights are RELATIVE (resampling renormalizes): the guarantee
    // is the ordering, not the sign — target-vocabulary docs must rank
    // above off-target docs
    assert(got(16L) > got(17L),
      "kernel-flavored doc should outrank the cooking-flavored doc")
    val tgtMean = (0L until 8L).map(got).sum / 8
    val webMean = (8L until 16L).map(got).sum / 8
    assert(tgtMean > webMean, "target docs outrank off-domain docs on average")
  }

  test("dsir weights: empty/short docs emit zero features and a null score") {
    val docs = Seq(
      (1L, "kernel scheduler kernel", "tgt"),
      (2L, "", "web"),
      (3L, "a b", "web") // every token <= 2 chars -> analyzer drops all
    ).toDF("doc_id", "text", "source")
    val rows = Dsir.importanceWeights(docs, "tgt").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    assert(rows(2L) == ((0L, true)))
    assert(rows(3L) == ((0L, true)))
    assert(rows(1L)._1 == 2 * 3 - 1) // unigrams + bigrams with multiplicity
  }

  test("dsir feature buckets are sign-safe and within [0, K)") {
    val bs = Dsir.featureBuckets(
      "kernel scheduler preemption latency unusual tokens everywhere")
    assert(bs.nonEmpty)
    assert(bs.forall(b => b >= 0 && b < Dsir.K))
    // power-of-two reduction == unsigned low bits of the raw hash
    val h = Dedup.fnv1a64("kernel")
    assert(((h % Dsir.K) + Dsir.K) % Dsir.K == (h & (Dsir.K - 1)))
  }

  // --- n-gram novelty -------------------------------------------------------

  test("ngram novelty: exact duplicates score 0, unique docs score 1") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "alpha bravo charlie delta echo foxtrot"), // exact copy of 1
      (3L, "unique wholly original phrasing nowhere else"),
      (4L, "tiny doc") // < 3 analyzed tokens -> no shingles
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got(1L)._3 == 0.0) // every shingle shared with the copy
    assert(got(2L)._3 == 0.0)
    assert(got(3L)._3 == 1.0) // every shingle corpus-unique
    assert(got(4L)._1 == 0L && got(4L)._3.isNaN) // no shingles -> null
    assert(got(1L)._1 == got(2L)._1 && got(1L)._1 == 4L) // 6 tokens -> 4 3-grams
  }

  test("ngram novelty matches a local set-math twin on a random corpus") {
    val rnd = new scala.util.Random(99L)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum")
    val corpus = (0L until 40L).map { id =>
      (id, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val local: Map[Long, Set[String]] = corpus.map { case (id, t) =>
      id -> Dedup.ngrams(t, 3).toSet
    }.toMap
    val dfc = local.values.flatten.groupBy(identity).map { case (g, v) => g -> v.size }
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, sh) <- local) {
      val novel = sh.count(g => dfc(g) == 1)
      assert(got(id) == ((sh.size.toLong, novel.toLong)), s"doc $id")
    }
  }

  // --- fixed-n per-stratum sample -------------------------------------------

  test("fixedNPerStratum keeps exactly min(n, |stratum|) rows per stratum") {
    val docs = ((0L until 30L).map(id => (id, "s1")) ++
      (100L until 103L).map(id => (id, "s2"))).toDF("doc_id", "source")
    val got = Sampling.fixedNPerStratum(docs, "source", n = 5, seed = 13L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.count(_._2 == "s1") == 5)
    assert(got.count(_._2 == "s2") == 3) // stratum smaller than n: all kept
    assert(got.filter(_._2 == "s1").map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("fixedNPerStratum is deterministic and repartition-invariant") {
    val docs = (0L until 200L).map(id => (id, s"s${id % 4}"))
      .toDF("doc_id", "source")
    val a = Sampling.fixedNPerStratum(docs, "source", 7, seed = 13L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val b = Sampling.fixedNPerStratum(docs.repartition(13), "source", 7, seed = 13L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(a == b)
    // matches the JVM twin of the rank rule
    val expect = (0L until 200L).groupBy(id => id % 4).flatMap { case (_, ids) =>
      ids.sortBy(id => (Sampling.uniform(id, 13L), id)).take(7)
    }.toSet
    assert(a.map(_._1).toSet == expect)
  }

  // --- dedup threshold sweep --------------------------------------------------

  test("thresholdSweep counts are monotone and match the pair set") {
    // 1 and 2 are exact copies (J = 1.0 at every threshold); 3 shares a
    // prefix with them (a mid-range J); 4 is unrelated
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base + " extra trailing words here beyond"),
      (4L, "wholly unrelated content nothing shared anywhere at all")
    ).toDF("doc_id", "text")
    val sweep = Dedup.thresholdSweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(sweep.map(_._1).toSeq == Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    // monotone non-increasing in the threshold
    assert(sweep.sliding(2).forall(w => w(0)._2 >= w(1)._2 && w(0)._3 >= w(1)._3))
    // the copy pair (J=1.0) fires at every threshold
    assert(sweep.forall(_._2 >= 1))
    // doc 4 never appears: n_docs <= 3 everywhere
    assert(sweep.forall(_._3 <= 3))
    // counts at each threshold equal a direct filter of the pair relation
    val pairs = Dedup.ngramJaccard(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((t, np, ndocs) <- sweep) {
      val sel = pairs.filter(_._3 >= t)
      assert(np == sel.length, s"pairs at $t")
      assert(ndocs == sel.flatMap(p => Seq(p._1, p._2)).distinct.length,
        s"docs at $t")
    }
  }

  // --- per-source top terms ----------------------------------------------------

  test("sourceTopTerms ranks by count with deterministic term ties") {
    val docs = Seq(
      (1L, "kernel kernel kernel scheduler scheduler latency", "s1"),
      (2L, "kernel scheduler preemption", "s1"),
      (3L, "butter butter sugar", "s2"),
      // stop words must never rank ("the" / "and" are in the stop list)
      (4L, "the the the the and and and sugar flour", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Reports.sourceTopTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.filter(_._1 == "s1").sortBy(_._2).toSeq ==
      Seq(("s1", 1, "kernel", 4L), ("s1", 2, "scheduler", 3L)))
    // s2: butter=2, sugar=2 tie -> term asc; "the"/"and" stop-filtered out
    assert(got.filter(_._1 == "s2").sortBy(_._2).toSeq ==
      Seq(("s2", 1, "butter", 2L), ("s2", 2, "sugar", 2L)))
  }

  // --- rolling active users ------------------------------------------------------

  test("activeUsers computes DAU/WAU against a hand-built week") {
    // day 0: users 1,2; day 3: user 1 (twice); day 8: user 3
    def ts(day: Long, h: Int) = new Timestamp((day * 86400L + h * 3600L) * 1000L)
    val events = Seq(
      (1L, ts(0, 1), 1L, "click", 0.0, "{}"),
      (2L, ts(0, 2), 2L, "click", 0.0, "{}"),
      (3L, ts(3, 5), 1L, "view", 0.0, "{}"),
      (4L, ts(3, 9), 1L, "click", 0.0, "{}"),
      (5L, ts(8, 0), 3L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.activeUsers(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // only days WITH activity appear
    assert(got.keySet == Set(0L, 3L, 8L))
    assert(got(0L) == ((2L, 2L))) // window ending day 0 holds only day 0
    assert(got(3L) == ((1L, 2L))) // users {1,2} active in days -3..3
    // day 8's window is days 2..8: users {1 (day 3), 3 (day 8)}
    assert(got(8L) == ((1L, 2L)))
  }

  // --- robots-style crawl-compliance filter ------------------------------------

  test("robotsFilter picks the longest prefix and breaks ties toward Allow") {
    // ids 10/17/24/31 all map to host news-site3.example.org (g % 7 == 3)
    // with canonical paths /stories/{10,17,24,31}
    val docs = Seq(10L, 17L, 24L, 31L).toDF("doc_id")
    val rules = Seq(
      ("news-site3.example.org", "/stories/1", 0),  // broad disallow
      ("news-site3.example.org", "/stories/10", 1), // longer allow carve-out
      ("news-site3.example.org", "/stories/17", 0), // equal-length pair:
      ("news-site3.example.org", "/stories/17", 1)  //   tie -> Allow wins
    ).toDF("rhost", "prefix", "allow")
    val got = Urls.robotsFilter(docs, rules).collect().map(r =>
      r.getLong(0) -> ((Option(r.getString(3)).orNull, r.getInt(4)))).toMap
    assert(got(10L) == (("/stories/10", 1))) // carve-out beats the disallow
    assert(got(17L) == (("/stories/17", 1))) // RFC 9309 tie -> Allow
    assert(got(24L) == ((null, 1)))          // no matching rule -> allowed
    assert(got(31L) == ((null, 1)))          // /stories/1 is NOT a prefix of /stories/31
  }

  // --- character entropy ---------------------------------------------------------

  test("charEntropy: hand-computed values and edge cases") {
    val docs = Seq(
      (1L, "aaaa"),          // one class -> H = 0
      (2L, "abab"),          // two equal classes -> H = log10(2) = 0.30103
      (3L, "abcdefghij"),    // 10 uniform classes -> H = log10(10) = 1.0
      (4L, "")               // empty -> 0 chars, null score
    ).toDF("doc_id", "text")
    val got = TextStats.charEntropy(docs).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 0.30103)))
    assert(got(3L) == ((10L, 1.0)))
    assert(got(4L)._1 == 0L && got(4L)._2.isNaN)
    // ordering sanity: flat > skewed > degenerate
    assert(got(3L)._2 > got(2L)._2 && got(2L)._2 > got(1L)._2)
  }

  // --- per-source exact quantiles --------------------------------------------

  test("sourceQuantiles interpolates exactly on a hand-computed fixture") {
    // n_chars 10,20,30,40,50: p25 -> idx 1.0 -> 20; p50 -> 30;
    // p95 -> idx 3.8 -> 40 + 0.8*10 = 48
    val docs = Seq(10L, 20L, 30L, 40L, 50L).zipWithIndex.map { case (nc, i) =>
      (i.toLong, "s1", nc)
    }.toDF("doc_id", "source", "n_chars")
    val r = Reports.sourceQuantiles(docs).collect().head
    assert(r.getString(0) == "s1" && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 20.0)
    assert(r.getDouble(3) == 30.0)
    assert(r.getDouble(4) == 40.0)
    assert(r.getDouble(5) == 48.0)
    assert(r.getDouble(6) == 30.0) // mean
  }
}
