package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source corpus overlap — the data-governance table behind "how
  * much of source B is already inside source A" decisions (dropping a
  * mirrored crawl, pricing a data purchase, ordering dedup passes by
  * expected yield). For every unordered source pair: the exact distinct
  * word-shingle counts, intersection size, Jaccard similarity, and both
  * directed containments.
  *
  * Plan shape at 100 TB: the naive form is a shingle self-join keyed on
  * source pairs — quadratic in shared shingles and a skew bomb. This
  * operator instead rides ONE corpus-scale aggregation: each (shingle,
  * source) occurrence is mapped to a source BIT (sources are a tiny
  * dimension, collected + sorted once, ≤62 lanes in a long — the same
  * bounded-collect contract as the index wave stats), and `bit_or`
  * aggregates a per-shingle membership mask with map-side partial
  * combine (bit_or is idempotent, so no distinct pre-pass is needed —
  * duplicate occurrences collapse in the combiner). The mask table then
  * folds to ≤2^S (mask, count) rows — micro-scale — and every pairwise
  * statistic is a sum over that micro table against a broadcast pair
  * grid. Total: one shuffle, no self-join, no skew sensitivity (a
  * shingle in every document is ONE mask row).
  *
  * Shingles are the dedup family's 3-word n-grams
  * ([[Dedup.ngrams]]: alnum runs >2 chars, lowercased, no stop filter),
  * so overlap numbers are directly comparable to the Jaccard dedup ops.
  *
  * Cross-engine determinism: counts are exact integers; ratios are 6-dp
  * roundings of exact-integer divisions — IEEE-identical in DuckDB.
  */
object Overlap {

  /** One row per unordered source pair (source_a < source_b):
    * (source_a, source_b, n_a, n_b, n_common, jaccard, containment_a,
    * containment_b) where n_* are distinct-shingle counts, jaccard =
    * common/union, containment_x = common/n_x (null when undefined).
    */
  def sourceOverlap(docs: DataFrame, shingle: Int = 3,
                    textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tiny dimension: deterministic bit assignment by sorted source name
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    require(sources.length >= 2,
      s"source overlap needs >= 2 sources, got ${sources.length}")
    require(sources.length <= 62,
      s"bitmask form caps at 62 sources (got ${sources.length}); " +
        "beyond that, widen to two mask lanes or a bitmap type")
    val maskOf = map(sources.zipWithIndex.toSeq.flatMap {
      case (s, i) => Seq(lit(s), lit(1L << i))
    }: _*)
    // ONE corpus-scale shuffle: per-shingle source-membership mask.
    // The zero-mask sentinel row keeps every pair present (sums = 0)
    // even on a degenerate corpus with no shingles at all.
    val maskCounts = docs
      .select(element_at(maskOf, col("source")).as("mask"),
        explode(Dedup.ngramsUdf(shingle)(col(textCol))).as("ngram"))
      .groupBy("ngram").agg(bit_or(col("mask")).as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
      .union(Seq((0L, 0L)).toDF("m", "c"))
    val pairs = (for {
      a <- sources.indices
      b <- (a + 1) until sources.length
    } yield (sources(a), sources(b), 1L << a, 1L << b))
      .toDF("source_a", "source_b", "bit_a", "bit_b")
    val hasA = col("m").bitwiseAND(col("bit_a")) =!= 0L
    val hasB = col("m").bitwiseAND(col("bit_b")) =!= 0L
    maskCounts.crossJoin(broadcast(pairs)) // micro × micro fan-out
      .groupBy("source_a", "source_b")
      .agg(
        sum(when(hasA, col("c")).otherwise(0L)).as("n_a"),
        sum(when(hasB, col("c")).otherwise(0L)).as("n_b"),
        sum(when(hasA && hasB, col("c")).otherwise(0L)).as("n_common"))
      .select(col("source_a"), col("source_b"),
        col("n_a"), col("n_b"), col("n_common"),
        when(col("n_a") + col("n_b") - col("n_common") > 0,
          round(col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6))
          .as("jaccard"),
        when(col("n_a") > 0, round(col("n_common").cast("double") /
          col("n_a").cast("double"), 6)).as("containment_a"),
        when(col("n_b") > 0, round(col("n_common").cast("double") /
          col("n_b").cast("double"), 6)).as("containment_b"))
  }

  /** DuckDB twin of [[sourceOverlap]] — same tokenizer, shingles, pair
    * grid, and rounding; the set algebra is the direct (small-scale)
    * self-join form the engine's bitmask plan replaces.
    */
  def sourceOverlapSql(shingle: Int = 3): String = {
    val concat = (0 until shingle).map(j =>
      if (j == 0) "arr[i]" else s"arr[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT source,
  list_transform(${DedupOracleSql.alnum}, x -> lower(x)) AS arr
  FROM documents),
ng AS (SELECT DISTINCT source, $concat AS ngram
  FROM (SELECT source, arr, generate_subscripts(arr, 1) AS i FROM toks)
  WHERE i <= len(arr) - ${shingle - 1}),
srcs AS (SELECT DISTINCT source FROM documents),
sz AS (SELECT s.source, count(ng.ngram) AS n FROM srcs s
  LEFT JOIN ng ON ng.source = s.source GROUP BY s.source),
pr AS (SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source),
ix AS (SELECT x.source AS sa, y.source AS sb, count(*) AS c
  FROM ng x JOIN ng y ON x.ngram = y.ngram AND x.source < y.source
  GROUP BY 1, 2)
SELECT pr.sa AS source_a, pr.sb AS source_b,
  CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
  CAST(coalesce(ix.c, 0) AS BIGINT) AS n_common,
  CASE WHEN za.n + zb.n - coalesce(ix.c, 0) > 0 THEN
    round(CAST(coalesce(ix.c, 0) AS DOUBLE) /
      CAST(za.n + zb.n - coalesce(ix.c, 0) AS DOUBLE), 6) END AS jaccard,
  CASE WHEN za.n > 0 THEN round(CAST(coalesce(ix.c, 0) AS DOUBLE) /
    CAST(za.n AS DOUBLE), 6) END AS containment_a,
  CASE WHEN zb.n > 0 THEN round(CAST(coalesce(ix.c, 0) AS DOUBLE) /
    CAST(zb.n AS DOUBLE), 6) END AS containment_b
FROM pr JOIN sz za ON za.source = pr.sa JOIN sz zb ON zb.source = pr.sb
LEFT JOIN ix ON ix.sa = pr.sa AND ix.sb = pr.sb
ORDER BY source_a, source_b"""
  }
}
