package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Training-data pipeline operators: planted-duplicate recall/precision,
  * ANN vs brute-force recall floors, text-stats fixtures, multimodal
  * plumbing determinism.
  */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single day"
  private def corpus: Seq[(Long, String)] = Seq(
    1L -> base,
    2L -> base, // exact dup of 1
    3L -> base.replace("warm", "cold"), // near dup of 1
    4L -> "completely different content about distributed query engines and shuffle partitioning strategies for spark",
    5L -> "another unrelated document mentioning inverted index compression with variable byte encoding schemes",
    6L -> (base + " with a small suffix appended"), // near dup of 1
    7L -> "short one",
    8L -> "")

  private def docsDF = corpus.toDF("doc_id", "text")

  test("percolate == brute-force conjunctive containment; batch-boundary invariant") {
    val an = graft.analysis.Analyzer.noStem(graft.analysis.Analyzer.defaultStopWords)
    val queries = Seq(
      1L -> "quick fox",          // matches the base family
      2L -> "distributed shuffle", // matches only doc 4
      3L -> "quick engines",      // cross-doc terms: conjunctive -> nothing
      4L -> "the and of",         // analyzes away -> matches nothing
      5L -> "warm windowsill")    // 'warm' only in some base variants
    val expected = (for {
      (d, text) <- corpus
      dTerms = an.analyze(text).toSet
      (qid, query) <- queries
      qTerms = an.analyze(query).toSet
      if qTerms.nonEmpty && qTerms.subsetOf(dTerms)
    } yield (d, qid)).sorted
    assert(expected.nonEmpty && expected.exists(_._2 == 2L)
      && !expected.exists(_._2 == 3L) && !expected.exists(_._2 == 4L))
    val qdf = queries.toDF("query_id", "query")
    val got = Percolate.percolate(docsDF, qdf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == expected)
    // per-document operator: percolating micro-batches independently and
    // unioning equals percolating the whole corpus (the foreachBatch
    // streaming contract)
    val (b1, b2) = corpus.partition(_._1 % 2 == 0)
    val viaBatches = (Percolate.percolate(b1.toDF("doc_id", "text"), qdf).collect() ++
      Percolate.percolate(b2.toDF("doc_id", "text"), qdf).collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(viaBatches == expected)
  }

  test("exact dedup finds the planted exact duplicate and only it") {
    val res = Dedup.exact(docsDF).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(res(1L) == (1L, 2L, 0))
    assert(res(2L) == (1L, 2L, 1)) // canon is min doc_id
    assert(res(3L)._3 == 0 && res(4L)._3 == 0)
  }

  test("ngram jaccard: near dups above threshold, unrelated docs absent") {
    val pairs = Dedup.ngramJaccard(docsDF, n = 3, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(pairs.contains((1L, 6L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngram jaccard hot-shingle cap: skewed shingle dropped, true dups kept") {
    // one hot 3-gram in EVERY doc (the quadratic-join skew case) plus one
    // planted identical pair; with the cap the hot shingle contributes no
    // pairs and only the real duplicates survive
    val hot = "alpha beta gamma"
    val rows = (1L to 40L).map(i => (i, s"$hot unique$i token$i filler$i")) ++
      Seq((100L, s"$hot dup dup dup"), (101L, s"$hot dup dup dup"))
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.ngramJaccard(df, n = 3, minJaccard = 0.5, maxShingleDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.keySet == Set((100L, 101L)))
    assert(capped((100L, 101L)) == 1.0)
    // uncapped on the same corpus agrees on the >=0.5 pairs (the hot shingle
    // alone cannot push an unrelated pair over threshold here)
    val uncapped = Dedup.ngramJaccard(df, n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((100L, 101L)))
  }

  test("minhash LSH: candidates cover the planted dups; verification keeps precision") {
    val cand = Dedup.minhashLsh(docsDF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L)))
    val verified = Dedup.minhashLsh(docsDF, verifyMinJaccard = Some(0.5)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.contains((1L, 2L)))
    assert(!verified.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash banding == brute-force hamming filter") {
    val got = Dedup.simhashPairs(docsDF, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same hashes
    val hs = corpus.map { case (id, t) => id -> Dedup.simhash(t) }
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.contains((1L, 2L)))
  }

  test("brute-force cosine matches local math; ANN recall floor holds") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val query = local(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = local.toSeq.map { case (id, v) => (id, cos(query, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val got = Similarity.bruteForceTopK(emb, query, 10).collect().map(_.getLong(0)).toSeq
    assert(got == want)
    val ann = Similarity.annTopK(emb, query, 10).collect().map(_.getLong(0)).toSet
    val recall = want.count(ann).toDouble / want.size
    assert(recall >= 0.5, s"ANN recall $recall too low; got=$ann want=$want")
  }

  test("IVF ANN: total single assignment, own-list exactness, recall floor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val query = local(0L)
    // every vector lands in exactly one inverted list
    val asn = Similarity.ivfAssign(emb, nlist = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    assert(asn.length == local.size)
    assert(asn.map(_._1).distinct.length == local.size)
    // centroid ids are corpus members on the deterministic stride
    val stride = math.max(1L, local.size / 16)
    assert(asn.map(_._2).toSet.subsetOf(local.keySet.filter(_ % stride == 0)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = local.toSeq.map { case (id, v) => (id, cos(query, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val ivf = Similarity.ivfTopK(emb, query, 10).collect().map(_.getLong(0)).toSet
    val recall = want.count(ivf).toDouble / want.size
    assert(recall >= 0.5, s"IVF recall $recall too low; got=$ivf want=$want")
    // results the probe DID return are exact-cosine correct (no approx score)
    val scores = Similarity.ivfTopK(emb, query, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    scores.foreach { case (id, c) =>
      assert(math.abs(c - cos(query, local(id))) < 1e-6, s"vec $id score drift")
    }
  }

  test("IVF-SQ8: exact rescore on quantized candidates; shuffles fewer bytes than float IVF") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val query = local(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = local.toSeq.map { case (id, v) => (id, cos(query, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    val got = Similarity.ivfTopKQuantized(emb, query, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == 10)
    // the query vector itself survives quantized candidate gen and tops
    assert(got.head._1 == 0L && got.head._2 == 1.0)
    // returned scores are EXACT float cosines (quantization affects only
    // which candidates rescore, never the reported score)
    got.foreach { case (id, c) =>
      assert(math.abs(c - cos(query, local(id))) < 1e-6, s"vec $id score drift") }
    val recall = want.count(got.map(_._1).toSet).toDouble / want.size
    assert(recall >= 0.5, s"IVF-SQ8 recall $recall too low")
    // determinism (integer-exact quantized cut, id tiebreaks)
    val again = Similarity.ivfTopKQuantized(emb, query, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(again.toSeq == got.toSeq)
    // shuffle-bytes evidence (the verdict's counter ask): the quantized
    // assignment exchange carries tinyint codes where the float form
    // carries the 8x-wider double vectors
    def shuffledBytes(f: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        f
        // listener delivery is async: poll until the counter goes quiet
        var prev = -1L
        var spins = 0
        while (acc.get() != prev && spins < 50) {
          prev = acc.get(); Thread.sleep(200); spins += 1
        }
        acc.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val floatBytes = shuffledBytes(Similarity.ivfTopK(emb, query, 10).collect())
    val qBytes = shuffledBytes(Similarity.ivfTopKQuantized(emb, query, 10).collect())
    assert(qBytes < floatBytes,
      s"expected quantized IVF to shuffle fewer bytes: $qBytes vs $floatBytes")
  }

  test("repetition stats match hand-computed fixtures") {
    // "aaa bbb aaa bbb aaa": words=5 distinct=2 -> dup 3/5; bigrams
    // [ab, ba, ab, ba] -> top 2/4; trigrams [aba, bab, aba] -> dup 2/3
    val docs = Seq(
      (1L, "aaa bbb aaa bbb aaa"),
      (2L, "one two three four"), // all unique: 0 everywhere
      (3L, "x y"), // all tokens filtered (len<=2): empty-doc path
      (4L, "ccc ccc")).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((5L, 0.6, 0.5, 2.0 / 3 - 1e-7 + 1e-7)) ||
      got(1L) == ((5L, 0.6, 0.5, 0.666667)))
    assert(got(2L) == ((4L, 0.0, 1.0 / 3, 0.0)) ||
      got(2L) == ((4L, 0.0, 0.333333, 0.0)))
    assert(got(3L) == ((0L, 0.0, 0.0, 0.0)))
    assert(got(4L) == ((2L, 0.5, 1.0, 0.0)))
  }

  test("boilerplate line removal drops hot lines, keeps order, preserves unique docs") {
    val header = "=== COMMON SITE HEADER ==="
    val footer = "copyright footer line here"
    val docs = (1L to 30L).map { i =>
      (i, s"$header\nunique body line $i alpha\n{\nunique body line $i beta\n$footer")
    } :+ (99L, s"$header\n$footer") :+ (100L, "fully unique\ndocument text")
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.dropBoilerplateLines(df, maxLineDf = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // shared header/footer (df=31 > 5) dropped everywhere; short "{" line
    // (under minLineChars) and unique bodies kept, original order intact
    assert(got(1L) ==
      (("unique body line 1 alpha\n{\nunique body line 1 beta", 3L, 2L)))
    assert(got(99L) == (("", 0L, 2L)), "all-boilerplate doc -> empty")
    assert(got(100L) == (("fully unique\ndocument text", 2L, 0L)))
    assert((1L to 30L).forall(i => got(i)._3 == 2L))
  }

  test("sequence packing matches a local per-shard sequential reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val budget = 100
    val shards = 4
    val got = Packing.packSequences(docs, budget, shards).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // local reference: concat each shard's stream in doc_id order, cut
    val local = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong)
    assert(got.size == local.length, "every document must be placed")
    local.groupBy { case (id, _) => ((id % shards) + shards) % shards }
      .foreach { case (shard, members) =>
        var cum = 0L
        members.sortBy(_._1).foreach { case (id, n) =>
          val (s, nt, chunk, off) = got(id)
          assert(s == shard && nt == n, s"doc $id shard/tokens")
          assert(chunk == cum / budget && off == cum % budget,
            s"doc $id: got ($chunk,$off) want (${cum / budget},${cum % budget})")
          cum += n
        }
      }
    // repartition invariance (the window keys on content, not partitions)
    val re = Packing.packSequences(docs.repartition(13), budget, shards)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(re == got)
  }

  test("packing shards default derives from corpus size (floor 16, grows ~n/1M)") {
    assert(Packing.deriveShards(0L) == 16)
    assert(Packing.deriveShards(500L) == 16)
    assert(Packing.deriveShards(16000000L) == 16)
    assert(Packing.deriveShards(16000001L) == 17)
    assert(Packing.deriveShards(1000000000L) == 1000, "10^9 docs -> 1000 window tasks")
    // shards<=0 on a small corpus derives the floor (16) and produces the
    // identical layout to pinning 16 explicitly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val auto = Packing.packSequences(docs, budget = 100).collect().map(key).toMap
    val pinned = Packing.packSequences(docs, budget = 100, shards = 16)
      .collect().map(key).toMap
    assert(auto == pinned)
  }

  test("PII scrub redacts planted fixtures and passes clean text through") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or 10.0.0.1 ok"),
      (2L, "account 123456789012 called from 192.168.1.100 twice: 192.168.1.100"),
      (3L, "clean text with short 12345 digits and a.b@c (no tld match)"),
      (4L, "plain prose, nothing to redact")).toDF("doc_id", "text")
    val got = TextStats.scrubPii(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(got(1L) == ((1, 1, 0, "contact me at <EMAIL> or <IP> ok")))
    assert(got(2L) == ((0, 2, 1,
      "account <NUM> called from <IP> twice: <IP>")))
    // a.b@c has no 2+-letter TLD -> not an email; 12345 is under the
    // 9-digit floor -> untouched (the no-false-positive side)
    assert(got(3L) ==
      ((0, 0, 0, "clean text with short 12345 digits and a.b@c (no tld match)")))
    assert(got(4L) == ((0, 0, 0, "plain prose, nothing to redact")))
  }

  test("hash split: deterministic, repartition-invariant, near-weighted") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, splits).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(13), splits)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on partitioning")
    // JVM twin agrees with the Column form
    a.foreach { case (id, lbl) =>
      val u = Sampling.uniform(id, 42L)
      val want = if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
      assert(lbl == want, s"doc $id: column=$lbl jvm=$want u=$u")
    }
    // weights are approximately honored (uniform hash)
    val n = a.size.toDouble
    val train = a.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    // per-stratum sampling keeps only mapped strata, deterministically
    val s1 = Sampling.sampleByHash(docs, "lang", Map("en" -> 1.0), seed = 7L)
      .select("lang").distinct().collect().map(_.getString(0)).toSeq
    assert(s1 == Seq("en"))
  }

  test("cosine near-dup pairs are found for identical vectors") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(e, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("blocked cosinePairs == local all-pairs (multi-block path)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (ia, va) <- local; (ib, vb) <- local if ia < ib
      c = BigDecimal(cos(va, vb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.45
    } yield (ia, ib)).toSet
    // blockSize small enough to force MANY block pairs (the 100-TB shape)
    val got = Similarity.cosinePairs(emb, 0.45, blockSize = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("token counts fixtures") {
    val d = Seq((1L, "Hello, big World! a x  "), (2L, "")).toDF("doc_id", "text")
    val res = TextStats.tokenCounts(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    // "Hello, big World! a x  ": ws tokens = 5; alnum len>2 = hello, big, world; kept (big not stop) = hello, world, big
    assert(res(1L)._2 == 5)
    assert(res(1L)._3 == 3)
    assert(res(2L) == (0, 0, 0, 0))
  }

  test("quality score bounded and ordered sensibly") {
    val rows = TextStats.qualityScore(docsDF).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    rows.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(rows(1L) > rows(8L)) // real text beats empty
  }

  test("language id fixtures") {
    assert(TextStats.detectLang("the cat is in the house and it is warm")._1 == "en")
    assert(TextStats.detectLang("el gato y la casa de los vecinos en la calle")._1 == "es")
    assert(TextStats.detectLang("der Hund und die Katze ist von den Leuten")._1 == "de")
    assert(TextStats.detectLang("中文文本处理测试")._1 == "zh")
    assert(TextStats.detectLang("")._1 == "und")
    assert(TextStats.detectLang("xyzzy plugh qwerty")._1 == "und")
  }

  test("fingerprints: deterministic, shared grams -> shared prints") {
    val f1 = TextStats.fingerprint(base)
    val f2 = TextStats.fingerprint(base)
    assert(f1.toSeq == f2.toSeq && f1.nonEmpty)
    val f3 = TextStats.fingerprint(base + " trailing addition here now")
    assert(f1.toSet.intersect(f3.toSet).nonEmpty)
    val f4 = TextStats.fingerprint(corpus(3)._2)
    assert(f1.toSet.intersect(f4.toSet).isEmpty)
    assert(TextStats.fingerprint("a b").isEmpty)
  }

  test("fingerprints DF (codegen built-ins) == scala reference impl") {
    val want = corpus.flatMap { case (id, t) =>
      TextStats.fingerprint(t).map(fp => (id, fp))
    }.toSet
    val got = TextStats.fingerprints(docsDF).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // short docs (< gram tokens) produce no rows, not nulls
    assert(!got.exists(_._1 == 7L) && !got.exists(_._1 == 8L))
  }

  test("multimodal: schema, determinism, ingest sha, frame shape") {
    val media = Multimodal.mediaFromDocs(docsDF)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.schema == Multimodal.featureSchema)
    val a = feats.collect().sortBy(_.getLong(0)).map(_.toString)
    val b = Multimodal.extractFeatures(media.repartition(5)).collect()
      .sortBy(_.getLong(0)).map(_.toString)
    assert(a.toSeq == b.toSeq)
    val shaRow = feats.filter("media_id = 1").head()
    val wantSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(base.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(shaRow.getString(3) == wantSha)
    val frames = Multimodal.sampleFrames(media).filter("media_id = 1").count()
    assert(frames == (base.length + 63) / 64)
  }

  test("decontamination: only the train doc sharing an eval n-gram is flagged") {
    val train = Seq(
      10L -> "distributed inverted index construction with posting list compression",
      11L -> "the benchmark answer phrase alpha bravo charlie delta appears here verbatim",
      12L -> "tiny doc", // fewer than n tokens: zero n-grams, never contaminated
      13L -> "alpha bravo charlie but the fourth word differs everywhere else entirely"
    ).toDF("doc_id", "text")
    val eval = Seq(
      90L -> "an evaluation question whose answer contains alpha bravo charlie delta exactly"
    ).toDF("doc_id", "text")
    val audit = Decontaminate.auditContamination(train, eval, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(audit(11L)._3 == 1 && audit(11L)._2 >= 1)
    assert(audit(10L) == ((5L, 0L, 0))) // 8 tokens -> 5 distinct 4-grams
    assert(audit(12L) == ((0L, 0L, 0))) // 2 tokens < n -> zero 4-grams
    assert(audit(13L)._3 == 0, "a shared 3-gram must NOT trip the 4-gram filter")
    val clean = Decontaminate.decontaminate(train, eval, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(10L, 12L, 13L))
  }

  test("target-mix sampling: cap, absent-domain drop, repartition invariance") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mix = Map("en" -> 0.6, "zh" -> 0.4)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget large enough that zh's share exceeds its population: the
    // min(1, .) cap must keep EVERY zh row
    val budget = counts("zh") * 3L
    val got = Sampling.targetMixSample(docs, "lang", mix, budget, seed = 5L)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "zh"), "unmapped domains must drop")
    assert(byLang("zh") == counts("zh"), "capped domain keeps all rows")
    assert(byLang("en") < counts("en"), "uncapped domain downsamples")
    // keep_frac is exactly min(1, budget*target/count) and the kept set is
    // the hash predicate — repartitioning must not change a single row
    val a = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.targetMixSample(docs.repartition(17), "lang", mix, budget,
        seed = 5L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val fr = got.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("keep_frac").head().getDouble(0)
    assert(fr == budget.toDouble * 0.6 / counts("en").toDouble)
  }
}
