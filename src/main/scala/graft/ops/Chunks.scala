package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the RAG / embedding-pipeline stage that splits every
  * document into fixed-size overlapping token windows before vectorizing
  * (LangChain/LlamaIndex call it the sliding-window splitter; every
  * retrieval corpus and most long-context training mixes are built from
  * exactly these spans). Complements [[Packing.packSequences]]: packing
  * concatenates documents INTO fixed budgets, chunking fans one document
  * OUT into overlapping windows.
  *
  * Plan shape at 100 TB: a single narrow pass — tokenize, build the stride
  * grid with `sequence()`, `explode` it, slice the token array per chunk —
  * all `functions._` built-ins inside whole-stage codegen, ZERO shuffles;
  * the fan-out is (n_tokens / stride)-bounded per row and never keyed, so
  * there is no skew surface at all. Downstream embedding/indexing stages
  * consume the chunk table directly.
  *
  * Cross-engine determinism: chunk boundaries are pure integer arithmetic
  * (starts 0, stride, 2*stride, ... < n_tokens); text is a space-join of
  * the sliced tokens. Zero-token documents emit zero chunks by
  * construction (no empty-window row).
  */
object Chunks {

  /** Overlapping token windows per document: (idCol, chunk_id, chunk_start,
    * chunk_len, n_tokens, chunk_text). `size`-token windows every `stride`
    * tokens (overlap = size - stride); the final window is short when the
    * tail is. Tokenizer: the corpus-stats standard (alnum runs, >2 chars,
    * lowercased).
    */
  def chunk(docs: DataFrame, size: Int = 64, stride: Int = 48,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = Tok.terms(col(textCol))
    // the built-in size() is shadowed by the `size` parameter
    val arrLen = org.apache.spark.sql.functions.size(col("toks"))
    docs.select(col(idCol), toks.as("toks"))
      .withColumn("n_tokens", arrLen)
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("toks"), col("n_tokens"),
        explode(sequence(lit(0),
          ((col("n_tokens") - 1) / stride).cast("int") * stride,
          lit(stride))).as("chunk_start"))
      .select(col(idCol),
        (col("chunk_start") / stride).cast("int").as("chunk_id"),
        col("chunk_start"),
        least(lit(size), col("n_tokens") - col("chunk_start"))
          .as("chunk_len"),
        col("n_tokens"),
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(size)),
          " ").as("chunk_text"))
  }

  /** DuckDB twin of the `doc_chunks` gate: same tokenizer, stride grid,
    * slice, and space-join.
    */
  def chunkSql(size: Int = 64, stride: Int = 48): String = {
    val arr = Tok.termsSql()
    s"""WITH d AS (SELECT doc_id, $arr AS toks FROM documents),
n AS (SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n_tokens FROM d
  WHERE len(toks) > 0),
g AS (SELECT doc_id, toks, n_tokens,
  CAST(unnest(range(0, n_tokens, $stride)) AS INTEGER) AS chunk_start
  FROM n)
SELECT doc_id,
  CAST(chunk_start / $stride AS INTEGER) AS chunk_id,
  chunk_start,
  CAST(least($size, n_tokens - chunk_start) AS INTEGER) AS chunk_len,
  n_tokens,
  array_to_string(list_slice(toks, chunk_start + 1, chunk_start + $size),
    ' ') AS chunk_text
FROM g ORDER BY doc_id, chunk_id"""
  }
}
