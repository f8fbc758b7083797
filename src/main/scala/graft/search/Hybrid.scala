package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.PostingIndex
import graft.ops.Similarity

/** Hybrid lexical + vector retrieval via reciprocal-rank fusion (RRF,
  * Cormack et al. 2009 — the fusion Elasticsearch/Vespa/OpenSearch ship):
  * each retriever contributes 1/(rrfK + rank) for the documents it ranks,
  * scores add, and the fused (rrf desc, doc_id asc) total order is the
  * result. Rank-space fusion needs NO score calibration between BM25 and
  * cosine — that is the whole point of RRF over weighted-sum hybrids.
  *
  * Scale shape: the expensive work stays inside the two retrievals (the
  * pruned-scan WAND top-`candidates`, and whichever ANN plan fits — brute
  * force as the exact baseline, [[Similarity.ivfTopK]] as the production
  * path; ANY (doc_id, score)-shaped retrieval slots into [[rrfFuse]]).
  * Fusion itself touches only the two candidate lists — at most
  * 2·`candidates` rows, a driver-bounded set like every top-k head — so
  * the rank windows and the outer join are deliberately single-partition:
  * pushing a 200-row join through a 32-partition shuffle would be pure
  * scheduling overhead at any corpus size.
  */
object Hybrid {

  /** Fuse two ranked candidate lists (columns (doc_id, score), any
    * upstream retrieval) by RRF. Ranks are assigned in each list's public
    * (score desc, doc_id asc) total order; a document absent from a list
    * carries rank 0 = "unranked" (contributes nothing) — 0, not NULL, so
    * the output hashes identically across engines. Returns
    * (doc_id, lex_rank, vec_rank, rrf) in (rrf desc, doc_id asc) order,
    * rrf rounded at 6 dp (cross-engine float tolerance).
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int,
              rrfK: Int = 60): DataFrame = {
    def ranked(df: DataFrame, rankCol: String): DataFrame =
      df.select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).as(rankCol))
    def contrib(rankCol: String) =
      when(col(rankCol) > 0, lit(1.0) / (lit(rrfK) + col(rankCol)))
        .otherwise(lit(0.0))
    ranked(lex, "lex_rank")
      .join(ranked(vec, "vec_rank"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"))
      .withColumn("rrf",
        round(contrib("lex_rank") + contrib("vec_rank"), 6))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hybrid top-k: BM25 WAND top-`candidates` for `query` fused with the
    * exact cosine top-`candidates` for `queryVec` over `embeddings`
    * (vec_id must share the document id space). A query that analyzes to
    * nothing fuses an empty lexical list (vector-only results), and vice
    * versa — the degenerate forms are first-class, not errors.
    */
  def rrfSearch(idx: PostingIndex, embeddings: DataFrame, query: String,
                queryVec: Array[Double], k: Int, candidates: Int = 100,
                rrfK: Int = 60): DataFrame = {
    val lex = idx.searchRounded(query, candidates)
    val vec = Similarity.bruteForceTopK(embeddings, queryVec, candidates)
      .select(col("vec_id").as("doc_id"), col("cos").as("score"))
    rrfFuse(lex, vec, k, rrfK)
  }
}
