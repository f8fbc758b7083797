package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Session-6 surface: Misra–Gries exact heavy hitters, BPE first-merge
  * pair stats, bitmask source overlap, postings-skew report — property
  * tests against local brute-force twins on random corpora.
  */
class Session6OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    s.split("[^a-zA-Z0-9]+").toSeq.filter(_.length > 2).map(_.toLowerCase)

  private def randomCorpus(seed: Int, nDocs: Int, vocab: Int)
      : Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val words = (0 until vocab).map(i => f"w${i}%03d")
    (0L until nDocs).map { id =>
      // Zipf-ish skew: low word ids much more likely
      val n = 3 + rnd.nextInt(30)
      val text = Seq.fill(n) {
        val r = rnd.nextDouble()
        words((r * r * vocab).toInt.min(vocab - 1))
      }.mkString(" ")
      (id, text, s"src${rnd.nextInt(4)}")
    }
  }

  // --- heavy hitters --------------------------------------------------------

  test("heavyHitters == brute-force top-k across random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val rows = randomCorpus(seed, nDocs = 300, vocab = 120)
      val docs = rows.toDF("doc_id", "text", "source")
      // brute force over the same tokenizer
      val counts = rows.flatMap(r => tok(r._2))
        .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      val expect = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val got = Vocab.heavyHitters(docs, k = 20, capacity = 256)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"seed $seed")
    }
  }

  test("heavyHitters certificate raises instead of approximating") {
    // near-uniform corpus + tiny capacity: the k-th count cannot clear
    // N/(m+1), so the operator must refuse rather than return a guess
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map { id =>
      (id, Seq.fill(20)(f"t${rnd.nextInt(5000)}%04d").mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val e = intercept[Exception] {
      Vocab.heavyHitters(docs, k = 20, capacity = 4).collect()
    }
    assert(e.getMessage.contains("MG certificate"))
  }

  test("misraGries survivor set contains every item above n/(m+1)") {
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(5000)(s"x${(rnd.nextDouble() * rnd.nextDouble() * 50).toInt}")
    val m = 16
    val (surv, n) = Vocab.misraGries(stream.iterator, m)
    assert(n == 5000L)
    val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
    exact.foreach { case (t, c) =>
      if (c > n / (m + 1)) assert(surv.contains(t), s"lost heavy item $t ($c)")
    }
  }

  // --- BPE pair stats -------------------------------------------------------

  test("bpePairs == brute-force dictionary-weighted pair counts") {
    val rows = randomCorpus(5, nDocs = 200, vocab = 80)
    val docs = rows.toDF("doc_id", "text", "source")
    val vocab = rows.flatMap(r => tok(r._2))
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val pairW = vocab.toSeq.flatMap { case (t, c) =>
      (0 until t.length - 1).map(i => (t.substring(i, i + 2), c))
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
    val expect = pairW.toSeq.sortBy { case (p, w) => (-w, p) }.take(20)
    val got = Vocab.bpePairs(docs, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  // --- source overlap -------------------------------------------------------

  test("sourceOverlap == brute-force shingle-set algebra") {
    val rows = randomCorpus(9, nDocs = 250, vocab = 60)
    val docs = rows.toDF("doc_id", "text", "source")
    val bySource = rows.groupBy(_._3).view.mapValues(
      _.flatMap(r => Dedup.ngrams(r._2, 3)).toSet).toMap
    val sources = bySource.keys.toSeq.sorted
    val expect = (for {
      a <- sources.indices; b <- (a + 1) until sources.length
    } yield {
      val (sa, sb) = (sources(a), sources(b))
      val (na, nb) = (bySource(sa).size.toLong, bySource(sb).size.toLong)
      val c = (bySource(sa) & bySource(sb)).size.toLong
      (sa, sb, na, nb, c)
    }).toSeq
    val got = Overlap.sourceOverlap(docs, shingle = 3)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // ratio spot-check on the first pair
    val r0 = Overlap.sourceOverlap(docs).orderBy("source_a", "source_b")
      .collect().head
    val (na, nb, c) = (r0.getLong(2), r0.getLong(3), r0.getLong(4))
    val j = BigDecimal(c.toDouble / (na + nb - c).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(5) == j)
  }

  test("sourceOverlap zero-shingle source yields 0 counts, null ratios") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta gamma", "a"),
      (2L, "x y", "b") // every token <= 2 chars -> no shingles
    ).toDF("doc_id", "text", "source")
    val r = Overlap.sourceOverlap(docs).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(!r.isNullAt(5)) // union nonempty -> jaccard 0.0
    assert(r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 0.0) // containment_a: 0/4
    assert(r.isNullAt(7)) // containment_b: 0/0 undefined
  }

  // --- BM25F ----------------------------------------------------------------

  test("bm25f with equal field weights reduces exactly to plain BM25") {
    for (seed <- Seq(21, 22)) {
      val rows = randomCorpus(seed, nDocs = 150, vocab = 60)
      val docs = rows.map(r => (r._1, r._2)).toDF("docId", "content")
      val query = "w000 w001 w002"
      val plain = graft.search.RelationalBM25
        .topK(docs, query, 10, stem = false)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fielded = graft.search.RelationalBM25
        .topKFielded(docs, query, 10, wTitle = 1.0, wBody = 1.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fielded == plain, s"seed $seed")
    }
  }

  test("bm25f title boost ranks early-position matches first") {
    // same term count; doc 1 carries the query term in the title slice,
    // doc 2 buries it past position 8; identical lengths
    val fill = (1 to 20).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"target opening words here $fill"),
      (2L, s"$fill target closing words here")
    ).toDF("docId", "content")
    val got = graft.search.RelationalBM25
      .topKFielded(docs, "target", 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 1L, "title hit should outrank body hit")
    assert(got(0)._2 > got(1)._2)
  }

  // --- label cohesion -------------------------------------------------------

  test("labelCohesion: tight label scores 1.0, mixed label scores lower") {
    val e = Seq(
      // label 0: all the same direction -> cohesion 1.0
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(2.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.5f, 0.0f, 0.0f), 0),
      // label 1: two orthogonal directions -> well below 1
      (3L, Array(1.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.0f, 1.0f, 0.0f), 1),
      // label 2: singleton -> 1.0
      (5L, Array(0.3f, 0.4f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCohesion(e).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) == ((0, 3L, 1.0)))
    assert(got(1)._2 == 2L && got(1)._3 < 0.95)
    assert(got(2) == ((2, 1L, 1.0)))
  }

  test("labelCohesion == local micro-int twin on random embeddings") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 120L).map { id =>
      val label = rnd.nextInt(4)
      val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      (id, base, label)
    }
    val docs = rows.toDF("vec_id", "embedding", "label")
    // local twin with the same devices: micro-int sums, ordered folds,
    // micro-rounded per-member cosine, micro-mean
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // HALF_UP away from zero — JVM Math.round would diverge from the
    // engines' round() on exact negative .5 ties
    def rInt(v: Double) = BigDecimal(v)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (l, vs) =>
      val dim = 8
      val s = Array.tabulate(dim) { i =>
        vs.map(v => rInt(v._2(i).toDouble * 1e6)).sum.toDouble
      }
      val cms = vs.map { v =>
        val dv = v._2.map(_.toDouble)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        (0 until dim).foreach { i =>
          dot += dv(i) * s(i); na += dv(i) * dv(i); nb += s(i) * s(i)
        }
        val den = math.sqrt(na) * math.sqrt(nb)
        if (den > 0) rInt(dot / den * 1e6) else 0L
      }
      (l, vs.size.toLong, r6(cms.sum.toDouble / (vs.size * 1e6)))
    }
    val got = Similarity.labelCohesion(docs).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
  }

  // --- interval join --------------------------------------------------------

  test("intervalJoin == brute-force containment argmax on random intervals") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val wins = (0 until 30).map { wid =>
        val s = rnd.nextInt(10000).toLong
        (wid, s, s + 1 + rnd.nextInt(1500)) // plenty of overlap
      }
      val evs = (0L until 400L).map { id =>
        (id, new java.sql.Timestamp(rnd.nextInt(12000) * 1000L))
      }
      val winsDf = wins.toDF("wid", "ws", "we")
      val evsDf = evs.toDF("event_id", "ts")
      val expect = evs.map { case (id, ts) =>
        val es = ts.getTime / 1000
        val hit = wins.filter(w => es >= w._2 && es <= w._3)
          .sortBy(w => (-w._2, -w._1)).headOption
        (id, es, hit.map(_._1), hit.map(_._2))
      }
      val got = Events.intervalJoin(evsDf, winsDf).orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
      assert(got == expect, s"trial $trial")
    }
  }

  test("syntheticWindows: gaps between slots, every 4th window overlaps") {
    val evs = (0L until 100L).map(id =>
      (id, new java.sql.Timestamp(id * 3600 * 1000L))).toDF("event_id", "ts")
    val w = Events.syntheticWindows(evs, k = 12).orderBy("wid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(w.length == 12)
    w.foreach { case (_, s, e) => assert(e > s) }
    // every 4th window runs past the next slot's start (overlap)...
    assert(w(0)._3 > w(1)._2 && w(4)._3 > w(5)._2)
    // ...ordinary adjacent windows leave a gap
    assert(w(1)._3 < w(2)._2 && w(2)._3 < w(3)._2)
  }

  // --- late-orders semi-join ------------------------------------------------

  test("late-orders semi join counts each order once, excludes on-time") {
    val day = 86400L * 1000L
    def ts(d: Long) = new java.sql.Timestamp(d * day)
    val orders = Seq(
      (1L, ts(0), "1-URGENT"),   // two late lines -> counted ONCE
      (2L, ts(0), "1-URGENT"),   // on-time only -> excluded
      (3L, ts(10), "2-HIGH")     // one late line -> counted
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val lines = Seq(
      (1L, ts(95)), (1L, ts(200)), // both >90d after day 0
      (2L, ts(30)),                // within 90d
      (3L, ts(101))                // 91d after day 10
    ).toDF("l_orderkey", "l_shipdate")
    import org.apache.spark.sql.functions._
    val got = orders.join(lines,
        orders("o_orderkey") === lines("l_orderkey") &&
          unix_timestamp(lines("l_shipdate").cast("timestamp")) >
            unix_timestamp(orders("o_orderdate").cast("timestamp")) +
              lit(90L * 86400L),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("1-URGENT", 1L), ("2-HIGH", 1L)))
  }

  // --- event transitions ----------------------------------------------------

  test("eventTransitions == brute-force per-user ordered pair counts") {
    val rnd = new scala.util.Random(51)
    val types = Seq("view", "click", "cart", "purchase")
    val evs = (0L until 500L).map { id =>
      (id, new java.sql.Timestamp(rnd.nextInt(100000) * 1000L),
        rnd.nextInt(40).toLong, types(rnd.nextInt(4)))
    }
    val df = evs.toDF("event_id", "ts", "user_id", "event_type")
    val pairs = evs.groupBy(_._3).values.toSeq.flatMap { us =>
      val ordered = us.sortBy(e => (e._2.getTime, e._1)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val byFrom = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = pairs.groupBy(identity).map { case ((f, t), xs) =>
      (f, t, xs.size.toLong, r6(xs.size.toDouble / byFrom(f)))
    }.toSeq.sortBy(p => (p._1, p._2))
    val got = Events.eventTransitions(df).orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expect)
    // probabilities row-normalize to ~1 per from_type
    got.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  // --- host language entropy ------------------------------------------------

  test("hostLangEntropy: monolingual 0, uniform mix = log10(k), twin-exact") {
    // host 0: 4 docs all "en" -> 0.0; host 1: 2 en + 2 de -> log10 2
    val docs = Seq(
      (0L, "en"), (50L, "en"), (100L, "en"), (150L, "en"),
      (1L, "en"), (51L, "en"), (101L, "de"), (151L, "de")
    ).toDF("doc_id", "lang")
    val got = Reports.hostLangEntropy(docs).orderBy("host").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((0L, 4L, 1L, 0.0)))
    assert(got(1)._2 == 4L && got(1)._3 == 2L)
    assert(math.abs(got(1)._4 - math.log10(2)) < 1e-5)
  }

  // --- snapshot content novelty ---------------------------------------------

  test("contentNovelty == brute-force shingle-set algebra; edge cases") {
    val rows = randomCorpus(61, nDocs = 150, vocab = 50)
    val prev = rows.map(r => (r._1, r._2)).toDF("doc_id", "text")
    // next: drop a fifth, edit a third, add some
    val nextRows = rows.filterNot(_._1 % 5 == 4).map { r =>
      (r._1, if (r._1 % 3 == 1) r._2 + " [edited]" else r._2)
    } ++ rows.filter(_._1 % 7 == 0).map(r => (r._1 + 1000, r._2 + " [new]"))
    val next = nextRows.toDF("doc_id", "text")
    val sa = rows.flatMap(r => Dedup.ngrams(r._2, 3)).toSet
    val sb = nextRows.flatMap(r => Dedup.ngrams(r._2, 3)).toSet
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Snapshots.contentNovelty(prev, next).collect().head
    assert(r.getLong(0) == sa.size && r.getLong(1) == sb.size)
    assert(r.getLong(2) == (sb -- sa).size)
    assert(r.getLong(3) == (sa -- sb).size)
    assert(r.getLong(4) == (sa & sb).size)
    assert(r.getDouble(5) == r6((sb -- sa).size.toDouble / sb.size))
    assert(r.getDouble(6) == r6((sa & sb).size.toDouble / sa.size))
    // identical snapshots: novelty 0, retention 1
    val same = Snapshots.contentNovelty(prev, prev).collect().head
    assert(same.getDouble(5) == 0.0 && same.getDouble(6) == 1.0)
  }

  // --- index skew -----------------------------------------------------------

  test("indexSkew == brute-force df/share computation") {
    val rows = randomCorpus(13, nDocs = 220, vocab = 70)
    val docs = rows.toDF("doc_id", "text", "source")
    val stop = graft.analysis.Analyzer.defaultStopWords
    val df = rows.flatMap(r => tok(r._2).filterNot(stop).distinct.map((_, r._1)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.size.toLong) }
    val total = df.values.sum.toDouble
    val top = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = top.zipWithIndex.map { case ((t, c), i) =>
      val cum = top.take(i + 1).map(_._2).sum
      (i + 1, t, c, r6(c / total), r6(cum / total))
    }
    val got = Reports.indexSkew(docs, k = 20).orderBy("rk").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect)
  }
}
