package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: lay the corpus out as contiguous
  * token streams and cut them every `budget` tokens (GPT-style concat-and-
  * chunk — a document may straddle a chunk boundary; the trainer splits at
  * read time). Each document gets its chunk id and in-chunk offset.
  *
  * Parallel by construction: documents route to `shards` INDEPENDENT
  * streams by id (chunks never cross shards), so the running-sum window
  * runs per shard — one exchange on pack_shard, no global single-partition
  * sort, and 4N executors pack 4N streams concurrently. Determinism:
  * stream membership and order depend only on doc_id, never on
  * partitioning, so the layout is reproducible across cluster sizes
  * (same property the [[Sampling]] split guarantees).
  *
  * Reference scope note: the reference engine has no packing stage; this
  * operator is part of the training-data pipeline suite.
  */
object Packing {

  /** Derived shard count: one window task sorts at most ~[[rowsPerShard]]
    * documents, so pack parallelism GROWS with the corpus instead of being
    * capped at a fixed task count (a fixed 16 puts n/16 rows in one task's
    * sort — multi-TB at 100 TB). Floor of 16 keeps small corpora parallel
    * enough to exercise the multi-shard path.
    */
  val rowsPerShard = 1000000L
  def deriveShards(nDocs: Long): Int =
    math.max(16L, (nDocs + rowsPerShard - 1) / rowsPerShard).toInt

  /** (doc_id, pack_shard, n_tokens, chunk, chunk_offset): `chunk` is the
    * budget-sized chunk index (within the shard's stream) holding the
    * document's FIRST token; `chunk_offset` its position inside that
    * chunk. Tokens = whitespace tokens (the trainer's own tokenizer count
    * can be substituted by passing a precomputed column).
    *
    * `shards <= 0` (the default) derives the shard count from the corpus
    * via [[deriveShards]] (one count() job). NOTE: the layout is
    * deterministic and repartition/cluster-size invariant FOR A GIVEN
    * `shards` value — chunk ids legitimately depend on `shards` itself
    * (documents route to different streams), so pin `shards` explicitly
    * when a byte-stable layout across differently-sized corpora matters.
    */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 0,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(budget > 0)
    val nShards = if (shards > 0) shards else deriveShards(docs.count())
    val toks = size(filter(split(trim(col(textCol)), TextStats.wsRun),
      t => length(t) > 0)).cast("long")
    val w = Window.partitionBy("pack_shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), pmod(col(idCol).cast("long"), lit(nShards.toLong))
        .as("pack_shard"), toks.as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col(idCol), col("pack_shard"), col("n_tokens"),
        // integer division (`div`), not double `/`: exact past 2^53
        expr(s"cum_before div ${budget}L").as("chunk"),
        pmod(col("cum_before"), lit(budget.toLong)).as("chunk_offset"))
  }

  /** DuckDB twin of [[packSequences]]. DuckDB widens window sum(BIGINT) to
    * HUGEINT, so every derived column is cast back to BIGINT to match
    * Spark's types (the driver gate hashes values WITH their types).
    * `shards <= 0` mirrors [[deriveShards]] as a scalar subquery.
    */
  def packSequencesSql(budget: Int = 2048, shards: Int = 0): String = {
    val sh = if (shards > 0) shards.toString
             else s"(SELECT greatest(16, (count(*) + ${rowsPerShard - 1}) " +
                  s"// $rowsPerShard) FROM documents)"
    s"""WITH t AS (SELECT doc_id,
  ((doc_id % $sh) + $sh) % $sh AS pack_shard,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '${TextStats.wsRun}'),
    x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents),
c AS (SELECT doc_id, pack_shard, n_tokens,
  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens, 0)
    AS BIGINT) AS cum_before
  FROM t)
SELECT doc_id, pack_shard, n_tokens,
  CAST(cum_before // $budget AS BIGINT) AS chunk,
  CAST(cum_before % $budget AS BIGINT) AS chunk_offset
FROM c ORDER BY doc_id"""
  }
}
