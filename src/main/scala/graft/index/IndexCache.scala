package graft.index

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus

/** Per-JVM memoized index builds for the driver's Verify/Bench surfaces:
  * the index for a given (corpus dir, analyzer) pair is built once into a
  * deterministic /tmp location and reused — across processes too, via the
  * manifest completeness check (the distributed analog of the reference's
  * boot-time cache probe, main.rs:492-513).
  */
object IndexCache {

  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Boolean), String]

  /** On-disk layout version, baked into the cache path: bumping it orphans
    * caches whose layout predates a feature the current code relies on
    * (v2 = the doclist membership ledger that makes delete+compact exact
    * for token-less docs — a pre-ledger cache passes isComplete but would
    * push [[IndexBuilder.compact]] onto its documented tf-derived-N
    * fallback).
    */
  private val layoutVersion = 2

  def dirFor(spark: SparkSession, sfDir: String, stem: Boolean,
             cfg: IndexConfig = IndexConfig(shards = 8, termBuckets = 4)): String = {
    val effective = cfg.copy(stem = stem)
    val safe = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val dir = s"/tmp/graft_idx_v${layoutVersion}_${safe}_s${effective.shards}" +
      s"_tb${effective.termBuckets}_bs${effective.blockSize}_stem$stem"
    cache.getOrElseUpdate((dir, stem), {
      if (!PostingIndex.isComplete(spark, dir)) {
        IndexBuilder.build(spark, Corpus.documents(spark, sfDir), dir, effective)
      }
      dir
    })
  }
}
