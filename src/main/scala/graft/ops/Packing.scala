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

  /** (doc_id, pack_shard, n_tokens, chunk, chunk_offset): `chunk` is the
    * budget-sized chunk index (within the shard's stream) holding the
    * document's FIRST token; `chunk_offset` its position inside that
    * chunk. Tokens = whitespace tokens (the trainer's own tokenizer count
    * can be substituted by passing a precomputed column).
    */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 16,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && shards > 0)
    val toks = size(filter(split(trim(col(textCol)), "\\s+"),
      t => length(t) > 0)).cast("long")
    val w = Window.partitionBy("pack_shard").orderBy(idCol)
    docs.select(col(idCol), pmod(col(idCol).cast("long"), lit(shards.toLong))
        .as("pack_shard"), toks.as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col(idCol), col("pack_shard"), col("n_tokens"),
        (col("cum_before") / budget).cast("long").as("chunk"),
        pmod(col("cum_before"), lit(budget.toLong)).as("chunk_offset"))
  }

  /** DuckDB twin of [[packSequences]]. */
  def packSequencesSql(budget: Int = 2048, shards: Int = 16): String =
    s"""WITH t AS (SELECT doc_id,
  ((doc_id % $shards) + $shards) % $shards AS pack_shard,
  CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
    x -> length(x) > 0)) AS BIGINT) AS n_tokens
  FROM documents),
c AS (SELECT doc_id, pack_shard, n_tokens,
  coalesce(sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens, 0)
    AS cum_before
  FROM t)
SELECT doc_id, pack_shard, n_tokens,
  CAST(cum_before // $budget AS BIGINT) AS chunk,
  cum_before % $budget AS chunk_offset
FROM c ORDER BY doc_id"""
}
