package graft.ops

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
