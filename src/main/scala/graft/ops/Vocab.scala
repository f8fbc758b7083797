package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-scale analytics: exact heavy hitters via a Misra–Gries
  * candidate sketch, and the first BPE merge iteration's pair statistics.
  *
  * Both operators exist because the naive forms misbehave at 100 TB:
  *
  *  - Top-k terms by `groupBy(term).count()` shuffles the ENTIRE
  *    vocabulary (billions of identifier-like terms on a code corpus)
  *    to answer a question about 20 of them. [[heavyHitters]] instead
  *    runs the classic sketch-then-rescore pattern: a per-partition
  *    Misra–Gries pass emits a bounded candidate set, and only
  *    candidate-matching tokens take the aggregation shuffle. The
  *    result stays EXACT (gate-able) via the MG certificate — see
  *    the method doc.
  *
  *  - BPE pair counting over the raw token stream touches every token
  *    occurrence per merge iteration. [[bpePairs]] computes the same
  *    statistic from the VOCABULARY weighted by term frequency — the
  *    standard implementation trick in every BPE trainer (Sennrich et
  *    al. 2016 §3: counts are maintained on the word-type dictionary,
  *    not the corpus) — so the char-pair explosion is distinct-term
  *    scale, orders of magnitude below corpus scale.
  */
object Vocab {

  /** Per-partition Misra–Gries sketch with `capacity` counters over a
    * token iterator. Returns (survivor map, tokens seen). Guarantee:
    * every term with partition count > n_p/(capacity+1) survives.
    * The decrement-all event is O(capacity) but fires at most
    * n/(capacity+1) times, so the pass is O(n) amortized.
    */
  private[ops] def misraGries(it: Iterator[String], capacity: Int)
      : (scala.collection.mutable.HashMap[String, Long], Long) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { t =>
      n += 1
      counts.get(t) match {
        case Some(c) => counts.update(t, c + 1)
        case None if counts.size < capacity => counts.update(t, 1L)
        case None =>
          val keys = counts.keysIterator.toArray // stable under mutation
          keys.foreach { k =>
            val v = counts(k)
            if (v == 1L) counts.remove(k) else counts.update(k, v - 1L)
          }
      }
    }
    (counts, n)
  }

  /** EXACT top-k terms by corpus frequency without a vocabulary-scale
    * shuffle. Pass 1 (narrow): per-partition Misra–Gries candidates —
    * any term with global count > N/(capacity+1) appears in the union
    * of per-partition survivor sets (if it beat the threshold globally
    * it beat it in at least one partition). Pass 2: tokens are
    * broadcast-semi-joined against the candidate set, so only candidate
    * occurrences reach the count shuffle; the exact top-k by
    * (count desc, term asc) comes off that bounded aggregate.
    *
    * Exactness certificate (checked eagerly, k rows + one scalar): the
    * k-th candidate's exact count must exceed N/(capacity+1) — the
    * ceiling on any non-candidate's count — making the candidate top-k
    * the true top-k. A production caller whose corpus fails the check
    * re-runs with a larger capacity; this raises instead of silently
    * returning an approximate list.
    *
    * Driver-side state is bounded by (capacity+1)·partitions candidate
    * strings (the wave-stats collect contract), independent of corpus
    * and vocabulary size.
    */
  def heavyHitters(docs: DataFrame, k: Int = 20, capacity: Int = 4096,
                   textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = docs.select(explode(Tok.terms(col(textCol))).as("term"))
    val sketch = terms.as[String].mapPartitions { it =>
      val (counts, n) = misraGries(it, capacity)
      // "" cannot be a real term (tokenizer keeps length > 2 only):
      // it carries the partition token total for the certificate
      counts.keysIterator.map((_, 0L)) ++ Iterator(("", n))
    }.collect()
    val total = sketch.collect { case ("", n) => n }.sum
    val cands = sketch.collect { case (t, _) if t.nonEmpty => t }
      .distinct.toSeq.toDF("term")
    val top = terms.join(broadcast(cands), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .collect()
    // floor = the largest count a NON-candidate can have. Exactness needs
    // either floor == 0 (every term is a candidate — tiny corpus) or a
    // full k candidates whose k-th exact count beats the floor. An
    // undersized candidate set (MG decrements can legally empty the
    // survivor map on near-uniform streams) is uncertifiable, not empty.
    val floor = total / (capacity + 1L)
    val kth = if (top.length >= k) top.last.getLong(1) else 0L
    require(floor == 0L || (top.length >= k && kth > floor),
      s"MG certificate failed: ${top.length} candidates, kth count $kth" +
        s" <= N/(m+1) = $floor — rerun with a larger capacity")
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** DuckDB twin of [[heavyHitters]]: the direct vocabulary top-k the
    * sketch path must reproduce exactly.
    */
  def heavyHittersSql(k: Int = 20): String =
    s"""WITH t AS (SELECT unnest(${Tok.termsSql()}) AS term FROM documents),
c AS (SELECT term, count(*) AS cnt FROM t GROUP BY term)
SELECT term, CAST(cnt AS BIGINT) AS cnt FROM c
ORDER BY cnt DESC, term ASC LIMIT $k"""

  /** First BPE merge iteration: adjacent CHARACTER-pair counts over the
    * vocabulary, each pair weighted by its term's corpus frequency —
    * the statistic whose argmax is BPE's first merge (Sennrich et al.
    * 2016). Computed dictionary-side: one token-scale shuffle builds
    * (term, cnt), then the char-pair explosion (≤ len-1 pairs per
    * DISTINCT term) and the final pair aggregate are vocabulary-scale.
    * Top-k by (weight desc, pair asc) — a total order, so the cut is
    * deterministic.
    */
  def bpePairs(docs: DataFrame, k: Int = 20,
               textCol: String = "text"): DataFrame = {
    val vocab = docs.select(explode(Tok.terms(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    vocab.select(explode(transform(
        sequence(lit(1), length(col("term")) - 1),
        i => col("term").substr(i, lit(2)))).as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("w"))
      .orderBy(col("w").desc, col("pair").asc)
      .limit(k)
  }

  /** DuckDB twin of [[bpePairs]] — same tokenizer, dictionary weighting,
    * pair extraction (1-based substr windows), and tie rule.
    */
  /** HEAPS'-LAW vocabulary growth curve — the scaling-planning number for
    * tokenizer/vocab design ("how fast does the type inventory grow as the
    * corpus grows?"): cumulative token count and cumulative DISTINCT-type
    * count at `buckets` checkpoints of doc_id order. Fitting V = K·N^beta
    * to this curve is how vocab sizes and dictionary-vs-fallback encode
    * decisions get made before a full build.
    *
    * Plan shape at 100 TB: the naive form (running COUNT DISTINCT over a
    * doc-ordered window) holds unbounded state and a doc-scale
    * single-partition window. This form is bounded everywhere:
    *  - a type's contribution to the curve is its FIRST occurrence, so
    *    `min(doc_id) per term` (one term-keyed shuffle) converts the
    *    running-distinct into an ordinary count: vocab at checkpoint b =
    *    #{terms whose first doc lands in buckets <= b}.
    *  - token counts are row-local (`size(terms)`), aggregated per bucket.
    *  - bucket = (doc_id * buckets) integer-div (max_id + 1) — integer
    *    arithmetic, engine-identical; the span rides the established
    *    1-row broadcast.
    *  - the cumulative window runs over the BUCKET table (`buckets` rows
    *    at any corpus size), never the corpus.
    * Output (bucket, n_docs, tokens, new_types, tokens_cum, vocab_cum),
    * one row per non-empty bucket. Tokenization is the shared [[Tok]]
    * standard (no stop filter — growth curves want the full inventory).
    */
  def vocabGrowth(docs: DataFrame, buckets: Int = 32): DataFrame = {
    val span = docs.agg((max(col("doc_id")) + 1L).as("span"))
    val withB = docs
      .select(col("doc_id"), Tok.terms(col("text")).as("ts"))
      .crossJoin(broadcast(span))
      .select(expr(s"(doc_id * $buckets) div span").as("bucket"),
        col("doc_id"), col("ts"))
      .localCheckpoint()
    val perBucket = withB.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("ts"))).as("tokens"))
    val firstDoc = withB
      .select(col("bucket"), col("doc_id"), explode(col("ts")).as("term"))
      .groupBy("term").agg(min(struct(col("doc_id"), col("bucket"))).as("f"))
      .groupBy(col("f.bucket").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucket.join(firstDoc, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .select(col("bucket"), col("n_docs"), col("tokens"), col("new_types"),
        sum("tokens").over(wCum).as("tokens_cum"),
        sum("new_types").over(wCum).as("vocab_cum"))
  }

  /** DuckDB twin of [[vocabGrowth]]. */
  def vocabGrowthSql(buckets: Int = 32): String =
    s"""WITH span AS (SELECT max(doc_id) + 1 AS s FROM documents),
d AS (SELECT doc_id, (doc_id * $buckets) // (SELECT s FROM span) AS bucket,
  ${Tok.termsSql()} AS ts FROM documents),
pb AS (SELECT bucket, count(*) AS n_docs,
  CAST(sum(len(ts)) AS BIGINT) AS tokens FROM d GROUP BY bucket),
tok AS (SELECT doc_id, bucket, unnest(ts) AS term FROM d),
fd AS (SELECT term, min(struct_pack(doc_id := doc_id,
    bucket := bucket)) AS f
  FROM tok GROUP BY term),
nt AS (SELECT f.bucket AS bucket, count(*) AS new_types FROM fd
  GROUP BY f.bucket)
SELECT pb.bucket, pb.n_docs, pb.tokens,
  CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
  CAST(sum(pb.tokens) OVER w AS BIGINT) AS tokens_cum,
  CAST(sum(coalesce(nt.new_types, 0)) OVER w AS BIGINT) AS vocab_cum
FROM pb LEFT JOIN nt USING (bucket)
WINDOW w AS (ORDER BY pb.bucket ROWS BETWEEN UNBOUNDED PRECEDING
  AND CURRENT ROW)
ORDER BY pb.bucket"""

  def bpePairsSql(k: Int = 20): String =
    s"""WITH t AS (SELECT unnest(${Tok.termsSql()}) AS term FROM documents),
v AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
p AS (SELECT substr(term, CAST(i AS INTEGER), 2) AS pair, cnt
  FROM (SELECT term, cnt, unnest(range(1, length(term))) AS i FROM v))
SELECT pair, CAST(sum(cnt) AS BIGINT) AS w FROM p GROUP BY pair
ORDER BY w DESC, pair ASC LIMIT $k"""
}
