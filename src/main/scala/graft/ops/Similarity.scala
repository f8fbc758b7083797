package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and an LSH
  * (random-hyperplane) bucketed variant as the scale path — candidate
  * generation by equi-join on (table, bucket), exact re-scoring only inside
  * buckets. Dot products run through `zip_with`/`aggregate` (whole-stage
  * codegen), not UDFs.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays — deterministic
    * element order (index ascending), codegen'd.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity column between two `array<double>` columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force top-k by cosine against one query vector: a single
    * narrow pass + TakeOrderedAndProject — the correctness baseline.
    * Returns (vec_id, cos) rounded to 6 decimals, (cos desc, vec_id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Double], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(query.toSeq)
    embeddings.select(col(idCol),
        round(cosine(asDouble(col(vecCol)), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** All near-duplicate pairs with cosine >= tau (embedding near-dup dedup).
    * Exact all-pairs is inherently quadratic; the scalable prefilter is
    * [[lshBuckets]]. The exact form is computed blockwise: L2-normalized
    * vectors are broadcast once, each partition scores its rows against the
    * broadcast block with primitive-array dot products (the one-block case
    * of distributed blocked GEMM) — no quadratic shuffle, no per-pair array
    * allocation, no per-pair norm recomputation.
    */
  def cosinePairs(embeddings: DataFrame, tau: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val normed = embeddings
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (id, if (n == 0) v else v.map(_ / n))
      }
    val block = spark.sparkContext.broadcast(normed.collect().sortBy(_._1))
    normed.mapPartitions { it =>
      val all = block.value
      it.flatMap { case (ida, va) =>
        all.iterator
          .filter(_._1 > ida)
          .map { case (idb, vb) =>
            var d = 0.0
            var i = 0
            while (i < va.length && i < vb.length) { d += va(i) * vb(i); i += 1 }
            // same rounding mode as Spark round()/DuckDB round(): HALF_UP
            (ida, idb, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          .filter(_._3 >= tau)
      }
    }.toDF("id_a", "id_b", "cos")
  }

  /** Deterministic random hyperplanes: nPlanes x dim gaussians, seeded. */
  private[ops] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id per vector: bit i = sign(v . plane_i). With
    * `tables` independent plane sets, near vectors collide in >= 1 table
    * w.h.p. Returns (id, table, bucket).
    */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int, tables: Int, dim: Int,
                 seed: Long = 42L, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes * tables, dim, seed)
    val sig = udf((v: Seq[Double]) =>
      (0 until tables).map { t =>
        var bucket = 0L
        var p = 0
        while (p < nPlanes) {
          val pl = planes(t * nPlanes + p)
          var s = 0.0
          var i = 0
          while (i < pl.length && i < v.length) { s += v(i) * pl(i); i += 1 }
          if (s > 0) bucket |= (1L << p)
          p += 1
        }
        (t, bucket)
      })
    embeddings.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .select(col("id"), col("v"), explode(sig(col("v"))).as("tb"))
      .select(col("id"), col("v"), col("tb._1").as("table"), col("tb._2").as("bucket"))
  }

  /** ANN top-k for one query vector via LSH: scan only vectors sharing a
    * bucket with the query in any table, exact-rescore those. Recall < 1 by
    * construction; gated by a recall-floor test vs [[bruteForceTopK]].
    */
  def annTopK(embeddings: DataFrame, query: Array[Double], k: Int,
              nPlanes: Int = 4, tables: Int = 16, seed: Long = 42L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(nPlanes * tables, dim, seed)
    val qBuckets = (0 until tables).map { t =>
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val pl = planes(t * nPlanes + p)
        var s = 0.0
        var i = 0
        while (i < dim) { s += query(i) * pl(i); i += 1 }
        if (s > 0) bucket |= (1L << p)
        p += 1
      }
      (t, bucket)
    }
    val buckets = lshBuckets(embeddings, nPlanes, tables, dim, seed, idCol, vecCol)
    val cand = buckets.filter(
        qBuckets.map { case (t, b) =>
          col("table") === t && col("bucket") === b
        }.reduce(_ || _))
      .select("id", "v").distinct()
    val q = typedLit(query.toSeq)
    cand.select(col("id").as(idCol), round(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
