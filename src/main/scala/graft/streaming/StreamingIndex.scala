package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexBuilder, IndexConfig}

/** Continuous index ingest — the streaming form of the reference's
  * rebuild-on-cache-miss boot loop (main.rs:492-513), composed from two
  * pieces that are each already hard-gated:
  *
  *  - Structured Streaming's `foreachBatch` contract: a micro-batch that
  *    fails mid-write is REPLAYED with the same batchId on restart;
  *  - [[IndexBuilder.append]]'s per-batchId idempotence: a re-run of the
  *    same batch overwrites its own `tf_appends/batch=…` directory and
  *    re-upserts its doc count, converging instead of duplicating.
  *
  * Together they give exactly-once index ingest: after any prefix of
  * micro-batches (including crash/replay), the index equals a from-scratch
  * build over all delivered documents (append is spec'd BIT-IDENTICAL to a
  * union rebuild, IndexSpec), so a query served mid-ingest is exact for the
  * corpus delivered so far.
  *
  * 100-TB cost shape: tokenization — the build's long pole — runs only over
  * each NEW batch; global stats (N, avgdl, df) recompute from the
  * materialized tf relation and the postings re-encode from it, so the
  * per-trigger floor is the (cheap, shuffle-light) re-encode. Size trigger
  * intervals so batch volume amortizes that floor; production would bound
  * re-encode scope further with per-term-bucket dirty tracking (the wave
  * layout already isolates buckets), which this sink's layout permits.
  */
object StreamingIndex {

  /** Bootstrap an empty (but fully-formed: globals/stats/manifest) index at
    * `dir` when absent, so the sink's first micro-batch has something to
    * append to. `like` supplies only the schema — passing the STREAMING
    * frame itself is fine (an empty batch frame is derived from its
    * schema; `like.limit(0)` would hand a streaming Dataset to batch
    * writers and throw).
    */
  def ensureInitialized(like: DataFrame, dir: String, cfg: IndexConfig): Unit =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "globals.json"))) {
      val s = like.sparkSession
      val empty = s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
      IndexBuilder.build(s, empty, dir, cfg)
    }

  /** Start the ingest sink over a STREAMING frame of documents with the
    * builder's (docId, content) schema. `availableNow = true` drains the
    * source and terminates (the test/backfill mode); default is a
    * continuous query.
    */
  def sink(docs: DataFrame, dir: String, cfg: IndexConfig,
           checkpointDir: String, availableNow: Boolean = false): StreamingQuery = {
    val w = docs.writeStream
      .queryName("graft-index-ingest")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // empty triggers append nothing (an append's postings re-encode is
        // not free); replayed ids converge via append's idempotence
        if (!batch.isEmpty)
          IndexBuilder.append(batch.sparkSession, batch.toDF(), dir, cfg,
            f"stream-$batchId%09d")
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
