package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Large-scale training-data deduplication over a `(doc_id, text)` corpus:
  * exact (content-hash groupBy), n-gram Jaccard (inverted-index pair join),
  * MinHash+LSH (shingle -> signature -> band-bucket join), and SimHash
  * (bit-sliced Hamming banding). All operators are shuffle-planned for a
  * corpus that does not fit one machine: candidate generation is always an
  * equi-join on a bucket key (never a cross join), and verification runs
  * only on bucket-colliding pairs.
  */
object Dedup {

  // --- exact --------------------------------------------------------------

  /** Exact dedup via sha256(content): (doc_id, canon_id, dup_count).
    * canon_id = min doc_id of the content group; a row is a duplicate iff
    * doc_id != canon_id. One shuffle on the 64-hex hash.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = sha2(col(textCol), 256)
    val w = Window.partitionBy(h)
    docs.select(col(idCol),
        min(col(idCol)).over(w).as("canon_id"),
        count(lit(1)).over(w).as("dup_count"))
      .withColumn("is_dup", (col(idCol) =!= col("canon_id")).cast("int"))
  }

  /** Incremental (cross-corpus) exact dedup: flags every `batch` row whose
    * content hash already exists in `existing` — the recrawl-vs-index stage
    * of a continuously ingesting pipeline, where re-hashing and re-joining
    * the FULL corpus per incoming batch would dominate ingest cost.
    *
    * Two-phase plan: a Bloom filter over the existing hashes (built
    * distributed by Spark's `stat.bloomFilter` treeAggregate, then
    * broadcast read-only to every executor) prefilters the batch
    * map-side; ONLY bloom-positive rows enter the verification join
    * against the existing key set. False positives are removed by the
    * exact join and false negatives are impossible, so the RESULT is
    * exact — the bloom is pure plan shape. At web scale the typical batch
    * is overwhelmingly novel content, so the shuffle carries a few
    * percent of the batch instead of all of it; the filter itself is
    * `~1.2 bytes/key` at 1% fpp (a 10^9-doc corpus fits a ~1.2 GB
    * broadcast — size `fpp` up if that pinches executor memory).
    *
    * The batch is scanned twice (once per verdict branch) — two NARROW
    * scans traded for keeping every bloom-negative row out of the
    * shuffle, the right exchange whenever the batch is cheaper to rescan
    * than to shuffle. The `existing.count()` is a sizing scalar (one
    * long), not data movement.
    *
    * Output: (idCol, sha, bloom_candidate, is_dup). `bloom_candidate` is
    * engine telemetry (deterministic, but not oracle-mirrorable — the
    * gate projects it away); `is_dup` is the exact verdict. Batch ids are
    * assumed unique (the usual ingest contract).
    */
  def incrementalDedup(existing: DataFrame, batch: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       fpp: Double = 0.01): DataFrame = {
    val sha = sha2(col(textCol), 256)
    val exKeys = existing.select(sha.as("sha")).distinct()
    val nExist = existing.count()
    // Spark's stat.bloomFilter NPEs on a zero-row input; an empty corpus
    // means every batch row is novel, so the candidate flag is just false
    val candidate: Column = if (nExist == 0L) lit(false) else {
      val bf = existing.stat.bloomFilter(sha, nExist, fpp)
      val bfBc = existing.sparkSession.sparkContext.broadcast(bf)
      val might =
        udf((h: String) => h != null && bfBc.value.mightContainString(h))
      might(sha)
    }
    val b = batch.select(col(idCol), sha.as("sha"),
      candidate.as("bloom_candidate"))
    val novel = b.filter(!col("bloom_candidate"))
      .withColumn("is_dup", lit(false))
    val verified = b.filter(col("bloom_candidate"))
      .join(exKeys.withColumn("hit", lit(true)), Seq("sha"), "left")
      .select(col(idCol), col("sha"), col("bloom_candidate"),
        coalesce(col("hit"), lit(false)).as("is_dup"))
    novel.select(col(idCol), col("sha"), col("bloom_candidate"),
      col("is_dup")).union(verified)
  }

  /** DuckDB twin of the `dedup_incremental` gate: the same deterministic
    * recrawl-batch synthesis (every third doc unchanged => duplicate, the
    * rest edited => novel) and a plain semi-join verdict — the bloom
    * prefilter is invisible to the result by construction.
    */
  def incrementalDedupSql: String =
    """WITH ex AS (SELECT DISTINCT sha256(text) AS sha FROM documents),
b AS (SELECT doc_id + 1000000 AS doc_id,
  CASE WHEN doc_id % 3 = 0 THEN text
       ELSE text || ' [recrawl v2]' END AS text FROM documents),
bs AS (SELECT doc_id, sha256(text) AS sha FROM b)
SELECT bs.doc_id, bs.sha, (ex.sha IS NOT NULL) AS is_dup
FROM bs LEFT JOIN ex ON bs.sha = ex.sha ORDER BY bs.doc_id"""

  // --- word n-grams -------------------------------------------------------

  private val noStem = Analyzer.noStem(Set.empty)

  /** Contiguous word n-grams after tokenize (no stop filter — shingling
    * wants full word sequence).
    */
  private[ops] def ngrams(text: String, n: Int): Array[String] = {
    val toks = noStem.analyze(text)
    if (toks.length < n) Array.empty
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  def ngramsUdf(n: Int) = udf((s: String) => ngrams(s, n))

  /** Distinct (doc_id, ngram) pairs. */
  def docNgrams(docs: DataFrame, n: Int, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(ngramsUdf(n)(col(textCol))).as("ngram"))
      .distinct()

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 n-gram:
    * inverted-index self-join on the n-gram key, then
    * J = common / (|A| + |B| - common) filtered at `minJaccard`.
    *
    * Skew guard: a shingle with document frequency m contributes m^2 join
    * rows, so one stop-phrase n-gram present in every document makes the
    * join quadratic in the corpus. `maxShingleDf` drops shingles above the
    * cap from BOTH the join and the per-doc set sizes (Jaccard is then
    * computed over the capped shingle universe — the standard production
    * near-dup approximation; a hot shingle shared by >cap docs carries no
    * pair information anyway). With cap >= corpus size the result is exact.
    *
    * `maxShingleDf <= 0` (the default) derives the cap from the corpus:
    * max(1000, nDocs / 100). A FIXED generous cap does not survive a
    * scale-up — round 2 shipped 100k, which at its own bench scale already
    * admitted ~10^10 join rows from one at-cap shingle; the derived cap
    * bounds any single shingle's join contribution at ~(nDocs/100)^2 / 2
    * rows, 10^-4 of the all-pairs grid, at every corpus size. The DuckDB
    * oracle twins mirror the same formula (SparkEntry / DedupOracleSql).
    */
  /** CCNet/RefinedWeb-style BOILERPLATE LINE removal: a (trimmed) line
    * whose document frequency exceeds `maxLineDf` is boilerplate (headers,
    * footers, nav, license banners) and is dropped from every document;
    * the remaining lines are reassembled in original order. Lines shorter
    * than `minLineChars` after trimming are never candidates (code
    * braces / blank separators are structure, not boilerplate).
    *
    * `maxLineDf <= 0` derives the cap from the corpus (max(5, nDocs/100) —
    * same scale-aware pattern as [[ngramJaccard]]'s shingle cap). Plan
    * shape: one shuffle for the line-df aggregate, a LEFT-ANTI join
    * against the (small by construction) hot-line set, one shuffle for
    * the per-doc reassembly — no self-join anywhere.
    */
  def dropBoilerplateLines(docs: DataFrame, maxLineDf: Long = 0L,
                           minLineChars: Int = 6, textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val cap = if (maxLineDf > 0) maxLineDf else math.max(5L, docs.count() / 100)
    val lines = docs
      .select(col(idCol), size(split(col(textCol), "\n", -1)).as("n_total"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("key", trim(col("line")))
    val hot = lines
      .filter(length(col("key")) >= minLineChars)
      .select(col(idCol), col("key")).distinct()
      .groupBy("key").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .select("key")
    val kept = lines.join(broadcast(hot), Seq("key"), "left_anti")
    val agg = kept.groupBy(idCol).agg(
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("clean_text"),
      count(lit(1)).as("n_lines"),
      (first(col("n_total")) - count(lit(1))).as("n_dropped"))
    // docs whose every line was boilerplate still appear (empty text)
    docs.select(col(idCol), size(split(col(textCol), "\n", -1)).as("nt"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dropped"), col("nt").cast("long")).as("n_dropped"))
  }

  def ngramJaccard(docs: DataFrame, n: Int, minJaccard: Double,
                   textCol: String = "text", idCol: String = "doc_id",
                   maxShingleDf: Long = 0L): DataFrame = {
    // the derivation count() is one metadata-cheap job, paid only when the
    // caller did not pin a cap
    val cap = if (maxShingleDf > 0) maxShingleDf
              else math.max(1000L, docs.count() / 100)
    val ngAll = docNgrams(docs, n, textCol, idCol)
    val hot = ngAll.groupBy("ngram").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .select("ngram")
    // left-anti: drop the hot shingles everywhere (broadcast — the hot set
    // is tiny by construction: at most |corpus postings| / maxShingleDf)
    val ng = ngAll.join(broadcast(hot), Seq("ngram"), "left_anti")
    val sizes = ng.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = ng.as("a").join(ng.as("b"),
        col("a.ngram") === col("b.ngram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** CONTAINMENT near-dup (Broder's containment coefficient): pairs where
    * the smaller document's shingle set is mostly inside the larger's —
    * C = common / min(|S(A)|, |S(B)|) >= `minContainment`. This is the
    * signal symmetric Jaccard structurally misses: a paragraph quoted
    * verbatim inside a 100x longer page has J ~ |A|/|B| ~ 0.01 but C = 1.0,
    * and snippet-inside-aggregator duplication is one of the dominant
    * near-dup modes in web training corpora (the Lee et al. dedup paper's
    * motivating case). Same inverted-index self-join + derived hot-shingle
    * cap as [[ngramJaccard]] — the cap bounds any shingle's join
    * contribution at every corpus size, so the plan survives the same
    * 100x scale-up. Output (id_a, id_b, containment) with id_a < id_b;
    * direction (which side is contained) is recoverable from the per-doc
    * set sizes and deliberately not part of the gate surface.
    */
  def containmentPairs(docs: DataFrame, n: Int, minContainment: Double,
                       textCol: String = "text", idCol: String = "doc_id",
                       maxShingleDf: Long = 0L): DataFrame = {
    val cap = if (maxShingleDf > 0) maxShingleDf
              else math.max(1000L, docs.count() / 100)
    val ngAll = docNgrams(docs, n, textCol, idCol)
    val hot = ngAll.groupBy("ngram").agg(count(lit(1)).as("df"))
      .filter(col("df") > cap)
      .select("ngram")
    val ng = ngAll.join(broadcast(hot), Seq("ngram"), "left_anti")
    val sizes = ng.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = ng.as("a").join(ng.as("b"),
        col("a.ngram") === col("b.ngram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("common").cast("double") /
          least(col("sz_a"), col("sz_b")).cast("double"), 6).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  // --- MinHash + LSH ------------------------------------------------------

  /** Deterministic 64-bit string hash (FNV-1a), pinned independent of JVM. */
  @inline private[ops] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Seeded universal-hash coefficients for [[minhashSig]] — generated ONCE
    * per operator instantiation and captured in the UDF closure (a per-row
    * PRNG + coefficient allocation in the hot path costs ~2 array allocs and
    * a PRNG warm-up per document at corpus scale).
    */
  private[ops] def minhashCoeffs(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(numPerms)(rnd.nextLong() | 1L), Array.fill(numPerms)(rnd.nextLong()))
  }

  /** MinHash signature: numPerms universal-hash permutations
    * h_i(x) = a_i * x + b_i (odd multipliers from a seeded PRNG), min over
    * the doc's shingle hashes. Empty docs -> Long.MaxValue lanes.
    */
  private[ops] def minhashSig(text: String, shingle: Int,
                              as: Array[Long], bs: Array[Long]): Array[Long] = {
    val numPerms = as.length
    val sig = Array.fill(numPerms)(Long.MaxValue)
    ngrams(text, shingle).foreach { g =>
      val x = fnv1a64(g)
      var i = 0
      while (i < numPerms) {
        val v = as(i) * x + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** LSH candidate pairs: signatures banded (bands x rowsPerBand = perms);
    * docs colliding in >= 1 band are candidates, optionally verified with
    * exact n-gram Jaccard. Returns (id_a, id_b [, jaccard]).
    */
  /** (doc_id, band, bucket) LSH band-bucket memberships — the shared stage
    * of [[minhashLsh]] (pairwise) and [[Components.minhashClusters]]
    * (linear star edges).
    */
  private[ops] def bandBuckets(docs: DataFrame, shingle: Int, bands: Int,
                               rowsPerBand: Int, seed: Long,
                               textCol: String, idCol: String): DataFrame = {
    val numPerms = bands * rowsPerBand
    val (as, bs) = minhashCoeffs(numPerms, seed)
    val sigUdf = udf((s: String) => minhashSig(s, shingle, as, bs))
    // band hash = FNV over the band's lanes, pinned.
    val bandsUdf = udf((sig: Seq[Long]) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        (b, fnv1a64(slice.mkString(",")))
      })
    docs
      .select(col(idCol).as("doc_id"), sigUdf(col(textCol)).as("sig"))
      // docs with no shingles have all-MaxValue signatures: they are not
      // near-duplicates of each other, drop before banding
      .filter(element_at(col("sig"), 1) =!= Long.MaxValue)
      .select(col("doc_id"), explode(bandsUdf(col("sig"))).as("bb"))
      .select(col("doc_id"), col("bb._1").as("band"), col("bb._2").as("bucket"))
  }

  def minhashLsh(docs: DataFrame, shingle: Int = 3, bands: Int = 16,
                 rowsPerBand: Int = 4, seed: Long = 42L,
                 verifyMinJaccard: Option[Double] = None,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val buckets = bandBuckets(docs, shingle, bands, rowsPerBand, seed, textCol, idCol)
    val pairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyMinJaccard match {
      case None => pairs
      case Some(tau) =>
        pairs.join(ngramJaccard(docs, shingle, tau, textCol, idCol),
          Seq("id_a", "id_b"), "inner")
    }
  }

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over the doc's term-frequency vector (FNV term hashes,
    * tf weights).
    */
  private[ops] def simhash(text: String): Long = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    noStem.analyze(text).foreach(t => counts(t) = counts.getOrElse(t, 0) + 1)
    val acc = new Array[Long](64)
    counts.foreach { case (t, c) =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += c else acc(b) -= c
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf((s: String) => simhash(s))

  /** Near-dup pairs with Hamming(simhash) <= maxHamming, found by the
    * pigeonhole banding trick: split 64 bits into (maxHamming + 1) slices —
    * any pair within the radius collides on >= 1 exact slice, so candidate
    * generation is an equi-join on (slice_id, slice_value).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val slices = maxHamming + 1
    val width = 64 / slices
    val sliceUdf = udf((h: Long) =>
      (0 until slices).map(i => (i, (h >>> (i * width)) &
        (if (width == 64) -1L else (1L << width) - 1))))
    val hashed = docs.select(col(idCol).as("doc_id"),
      simhashUdf(col(textCol)).as("sh"))
    val keyed = hashed.select(col("doc_id"), col("sh"),
        explode(sliceUdf(col("sh"))).as("sl"))
      .select(col("doc_id"), col("sh"), col("sl._1").as("slice"), col("sl._2").as("key"))
    val hamming = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
    keyed.as("a").join(keyed.as("b"),
        col("a.slice") === col("b.slice") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Dedup THRESHOLD SWEEP — the tuning curve a dedup deployment plots
    * before committing to a Jaccard cutoff: for each candidate threshold,
    * how many near-dup pairs fire and how many distinct documents they
    * touch. One [[ngramJaccard]] pass at the LOWEST threshold produces the
    * capped pair set once; every row of the output is then an aggregation
    * of that set against a broadcast threshold list — the corpus is never
    * re-paired per threshold. Returns (threshold, n_pairs, n_docs)
    * ordered by threshold.
    *
    * Scale shape: identical to [[ngramJaccard]] (the derived hot-shingle
    * cap bounds the self-join); the sweep itself touches only the pair
    * set (capped, pair-scale not corpus-scale) crossed with a handful of
    * threshold literals.
    */
  def thresholdSweep(docs: DataFrame, n: Int = 3,
                     thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9),
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val pairs = ngramJaccard(docs, n, thresholds.min, textCol, idCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val tRows = thresholds.sorted.toDF("threshold")
    val t = broadcast(tRows)
    val np = pairs.crossJoin(t).filter(col("jaccard") >= col("threshold"))
      .groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val nd = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("doc"), col("jaccard"))
      .crossJoin(t).filter(col("jaccard") >= col("threshold"))
      .groupBy("threshold").agg(countDistinct("doc").as("n_docs"))
    // un-hinted left side: a broadcast hint on the STREAM side of a left
    // outer join is unsupported (it would log a hint warning per run)
    tRows.join(np, Seq("threshold"), "left").join(nd, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("threshold")
  }

  /** Per-document n-gram NOVELTY profile — the memorization-risk /
    * contribution-analysis stage of a dedup pipeline (the document-level
    * aggregate of Lee et al. 2022's duplicated-n-gram analysis, see
    * [[graft.ops.Spans]] for the span-level form): for each document, how
    * many of its distinct shingles appear NOWHERE else in the corpus.
    * Documents with novelty ≈ 0 are wholly reconstructible from the rest
    * of the corpus (templates, mirrors, quote compilations) even when no
    * single pair-level near-dup fires; high-novelty documents are the ones
    * actually adding token diversity. Returns
    * (doc_id, n_shingles, n_novel, novelty) per input document —
    * n_shingles counts DISTINCT shingles, novelty = n_novel/n_shingles
    * at 6 dp (null when the doc has no shingles).
    *
    * Plan shape at 100 TB: shingles are FNV-hashed to 8-byte keys
    * MAP-SIDE before anything shuffles (the [[Spans]] discipline — string
    * shingles never cross the wire), then one distinct on (doc, hash), a
    * COUNT WINDOW over the hash partition for the df (one 8-byte-key
    * exchange; the groupBy-and-join-back form would re-read the shingle
    * relation — Catalyst does not share subtrees, so the corpus would
    * tokenize twice), and a doc-keyed rollup. ONE tokenize scan, linear
    * end-to-end, no self-join — a shingle's cost is its df, not df² (the
    * window is count-only; its sort is the mechanical partition-key sort
    * on the 8-byte hash, no ORDER BY within groups). 64-bit fingerprint
    * df is the
    * standard at-scale approximation; the oracle applies the identical
    * hash, so the gate is exact.
    */
  def ngramNovelty(docs: DataFrame, n: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val hashUdf = udf((s: String) => fnv1a64(s))
    val ngh = docs.select(col(idCol).as("doc_id"),
        explode(ngramsUdf(n)(col(textCol))).as("ngram"))
      .select(col("doc_id"), hashUdf(col("ngram")).as("h"))
      .distinct()
    // df via a COUNT WINDOW over the hash partition rather than a
    // groupBy + join back: the join form reads the shingle relation
    // twice (Catalyst does not share the subtree — the df aggregate
    // would re-tokenize the corpus), the window form tokenizes ONCE and
    // pays one extra 8-byte-key exchange; a hot shingle costs df rows
    // in one window partition (linear — count only, no sort, no df²)
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val per = ngh.withColumn("df", count(lit(1)).over(wdf))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, lit(1L)).otherwise(lit(0L))).as("n_novel"))
    docs.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_shingles").cast("double"), 6).as("novelty"))
  }

  // --- prefix-filtered set-similarity join (PPJoin family) -----------------

  /** EXACT n-gram Jaccard pairs via PREFIX FILTERING (the AllPairs/PPJoin
    * candidate-generation scheme, Chaudhuri et al. 2006 / Xiao et al.
    * 2008) — the 100-TB upgrade over [[ngramJaccard]]'s inverted-index
    * self-join: instead of joining on EVERY shingle (and needing the
    * hot-shingle df cap, which makes the result approximate on any corpus
    * with a >cap shingle), each document indexes only its PREFIX — the
    * first `|A| - ceil(t*|A|) + 1` shingles in a global rare-first order
    * (df asc, shingle-hash asc). The prefix lemma: J(A,B) >= t implies
    * `|A inter B| >= t*|A|` (from J = c/(|A|+|B|-c) >= t and |B| >= c), so
    * any qualifying pair MUST collide inside the joint prefixes — candidate
    * generation is complete, the result EXACT, with no cap approximation.
    *
    * Plan shape at 100 TB:
    *  - the global order needs no dense rank (a driver-side or
    *    single-partition hazard): the (df, hash) pair itself is the
    *    total order, sorted row-locally per document inside `array_sort`.
    *  - skew inverts vs the inverted-index join: a stop-phrase shingle
    *    with df ~ corpus size sits at the END of the order and enters a
    *    prefix only for documents made almost entirely of hot shingles —
    *    the quadratic hot-key blowup that forced [[ngramJaccard]]'s cap
    *    is structurally avoided, not capped away.
    *  - the length filter (`t*|A| <= |B|` both ways, another J >= t
    *    consequence) prunes cross-size candidates inside the join
    *    condition, before the shuffle write of the pair.
    *  - verification is ROW-LOCAL: candidate pairs re-join the two
    *    per-doc sorted shingle arrays and `array_intersect` counts the
    *    exact overlap — no second pass over the corpus, no per-pair
    *    shuffle. Per-doc array size is bounded by document length.
    *  - `sets` feeds three consumers (prefixes + both verification
    *    sides), so it is localCheckpointed once — the no-subtree-sharing
    *    rule; the corpus tokenizes exactly once.
    *
    * The final filter compares the UNROUNDED ratio against `minJaccard`
    * (the lemma's exact threshold); the emitted `jaccard` column is the
    * usual 6-dp rounding. Output (id_a, id_b, jaccard), id_a < id_b —
    * [[ngramJaccard]]'s schema, exact at every corpus size.
    */
  def ppjoinJaccard(docs: DataFrame, n: Int, minJaccard: Double,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = minJaccard
    // shingles are FNV-hashed to 8-byte keys MAP-SIDE (the [[Spans]] /
    // [[ngramNovelty]] discipline — shingle strings never cross the
    // wire): every downstream shuffle, the per-doc sorted sets, and the
    // array_intersect verification all run on longs. 64-bit fingerprint
    // identity is the standard at-scale approximation; the oracle applies
    // the identical hash, so the gate stays exact. The first cut of this
    // operator shuffled raw shingle strings three times and benched 9.1 s
    // at sf0.1 — 2.6x the capped jaccard it is supposed to upgrade.
    // per-doc DISTINCT is row-local inside the UDF — the (doc, shingle)
    // relation enters the plan already deduplicated, so no corpus-scale
    // distinct exchange exists at all
    val shingleSet = udf((s: String) => ngrams(s, n).map(fnv1a64).distinct)
    // hashed postings materialized ONCE (16 B/row): they feed both the df
    // aggregate and the join back — Catalyst shares no subtrees, so
    // without the checkpoint the corpus would tokenize twice. df via
    // groupBy + join-back rather than a count window: the window form
    // funnels every row of a corpus-frequency shingle into ONE window
    // partition with no map-side combine; the groupBy partial-aggregates
    // map-side, and a hot key in the join-back is an EQUI-join skew that
    // AQE can split — a skewed window partition cannot be.
    val ngh = docs.select(col(idCol).as("doc_id"),
        explode(shingleSet(col(textCol))).as("h"))
      .localCheckpoint()
    val dfRel = ngh.groupBy("h").agg(count(lit(1)).as("df"))
    val sets = ngh.join(dfRel, "h")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("h")))),
        s => s.getField("h")).as("set"))
      .withColumn("sz", size(col("set")))
      // the 1e-9 slack keeps `ceil` from landing ONE ABOVE the true
      // alpha when t*sz sits on an integer that double arithmetic
      // rounds up past (a too-short prefix would silently drop pairs;
      // a one-longer prefix only admits extra candidates)
      .withColumn("plen",
        (col("sz") - ceil(lit(t) * col("sz") - lit(1e-9)) + 1).cast("int"))
      .localCheckpoint()
    val pref = sets.select(col("doc_id"), col("sz"),
      explode(slice(col("set"), lit(1), col("plen"))).as("h"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.sz").cast("double") >= lit(t) * col("a.sz") - lit(1e-9) &&
          col("a.sz").cast("double") >= lit(t) * col("b.sz") - lit(1e-9))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // verification fetch: CAND is broadcast (near-dup-pair-scale — tiny
    // next to the corpus) so the wide per-doc array relation STREAMS
    // through two broadcast hash joins with no exchange of the arrays;
    // the residual equi-join is candidate-scale x candidate-scale. If a
    // pathological corpus ever outgrew the broadcast, dropping the hint
    // falls back to sort-merge — correctness unchanged.
    val candB = broadcast(cand)
    val aSide = sets.join(candB, col("doc_id") === col("id_a"))
      .select(col("id_a"), col("id_b"), col("set").as("set_a"),
        col("sz").as("sz_a"))
    val bSide = sets.join(candB, col("doc_id") === col("id_b"))
      .select(col("id_a").as("ia"), col("id_b").as("ib"),
        col("set").as("set_b"), col("sz").as("sz_b"))
    aSide.join(bSide,
        col("id_a") === col("ia") && col("id_b") === col("ib"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("set_a"), col("set_b"))).as("common"),
        col("sz_a"), col("sz_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common"))).as("j"))
      .filter(col("j") >= t)
      .select(col("id_a"), col("id_b"), round(col("j"), 6).as("jaccard"))
  }
}
