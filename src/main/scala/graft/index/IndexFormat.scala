package graft.index

import graft.search.BM25Params

/** On-disk layout of the inverted index (SURVEY.md §7.1/§7.5):
  *
  * {{{
  * <dir>/
  *   globals.json                   build lineage + corpus stats (N, avgdl, ...)
  *   stats/                         parquet: (term, df, idf) — A1/A3/A5 surface
  *   tf/tb=X/                       parquet: (doc_id, term, tf, shard) — the
  *                                  materialized stats-stage output the
  *                                  postings stage resumes from
  *   postings/tb=X/shard=Y/         parquet posting-block segments
  *   manifest/tb-X-shard-Y.json     per-partition commit record + counters
  * }}}
  *
  * **Sharding model.** The serving index is *document-sharded*: `shard` is a
  * hash of docId, so every shard holds complete posting lists for its
  * document subset, with BM25 weights baked from *global* (df, avgdl)
  * statistics. Each shard can therefore run top-k WAND independently and a
  * global top-k is the merge of shard top-ks — the property per-term
  * partitioning cannot give (a document's score would be split across
  * term partitions, making threshold pruning unsound). Doc-sharding is also
  * the skew mechanism (SURVEY.md §4 item 3): a stopword-ish hot term with
  * df ~ N is automatically split into `shards` docId-disjoint,
  * internally-sorted sub-lists — the "salted two-stage merge" and the shard
  * layout are the same thing here, with the merge replaced by shard
  * independence.
  *
  * `tb` (term bucket) gives directory-level pruning on the query axis: a
  * query touches only `tb` dirs owning its terms, times all shards.
  *
  * Posting blocks: ≤ blockSize docId-sorted postings, docIds delta+varint,
  * weights raw LE doubles, per-block max_doc (seek skipping) and max_w
  * (WAND upper bounds).
  */
final case class IndexConfig(
    shards: Int = 32,
    termBuckets: Int = 8,
    blockSize: Int = 128,
    params: BM25Params = BM25Params(),
    stem: Boolean = true,
    commitWaves: Int = 2,
    /** Largest wave vocabulary the builder will dictionary-encode via a
      * driver-collected broadcast map (~150 B/term of driver+executor heap:
      * 1M ≈ 150 MB). A wave whose estimated vocabulary exceeds this falls
      * back automatically to the shuffle stats-join encode path, which
      * never collects the vocabulary anywhere — slower per row, but safe at
      * any vocabulary size (a 100-TB code corpus has ~10^9 identifiers).
      * Execution knob only: both paths produce identical index content, so
      * it is deliberately NOT part of the resume-config identity check.
      */
    maxDictTerms: Long = 1000000L)

final case class IndexGlobals(
    buildId: String,
    sourcePath: String,
    nDocs: Long,
    totalTokens: Long,
    avgdl: Double,
    vocabularySize: Long,
    shards: Int,
    termBuckets: Int,
    blockSize: Int,
    k1: Double,
    b: Double,
    stem: Boolean)

/** Shuffled posting row consumed by the block encoder. Primitive fields on
  * purpose: the deserializer then calls the constructor with unboxed values,
  * where a Tuple6 would box all six per row (11M+ rows per wave).
  */
final case class PostingRow(
    tb: Int,
    shard: Int,
    tid: Int,
    doc_id: Long,
    w: Double,
    tf: Long)

/** Shuffled posting row of the large-vocabulary fallback encode path, which
  * carries the term string through the shuffle instead of a dictionary id
  * (no driver-collected dictionary exists on that path).
  */
final case class TermPostingRow(
    tb: Int,
    shard: Int,
    term: String,
    doc_id: Long,
    w: Double,
    tf: Long)

/** One posting block row as stored in parquet. */
final case class BlockRow(
    tb: Int,
    shard: Int,
    term: String,
    block_id: Long,
    n: Int,
    max_doc: Long,
    max_w: Double,
    docs_bin: Array[Byte],
    wts_bin: Array[Byte],
    tfs_bin: Array[Byte])

object IndexFormat {
  /** Term -> directory bucket. String.hashCode is pinned by the JLS, so this
    * is stable across JVMs/executors.
    */
  @inline def termBucket(term: String, buckets: Int): Int =
    math.floorMod(term.hashCode, buckets)

  /** docId -> shard via a 64-bit mix (docIds may be sequential or hashed). */
  @inline def docShard(docId: Long, shards: Int): Int = {
    val h = docId * 0x9E3779B97F4A7C15L
    math.floorMod((h ^ (h >>> 32)).toInt, shards)
  }
}
