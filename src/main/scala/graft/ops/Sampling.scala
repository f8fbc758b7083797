package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * Every operator keys its randomness on a per-row hash of (id, seed) —
  * NEVER on `rand()` or partition ids — so the assignment is
  * (a) reproducible run-to-run, (b) invariant under repartitioning and
  * cluster size (the 100-TB requirement: re-running the split on different
  * hardware must label every row identically), and (c) exactly expressible
  * in the DuckDB gate.
  *
  * The hash is a two-round multiplicative congruential mix modulo the
  * Mersenne prime 2^31-1 (Fishman–Moore multipliers): every intermediate
  * product is <= 2^62, so the arithmetic never overflows a signed 64-bit
  * integer — this matters twice: Spark 4 runs ANSI mode (overflow THROWS,
  * so a 64-bit wrapping mix is not expressible as Column math), and DuckDB
  * mirrors the formula in plain BIGINT. The final u = h / (2^31-1) is the
  * same IEEE-754 division of the same integers in both engines, so split
  * thresholds compare identically.
  *
  * Reference scope note: the reference engine has no sampling stage; these
  * operators are part of the training-data pipeline suite layered on the
  * same corpus tables.
  */
object Sampling {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val A = 742938285L // Fishman–Moore MCG multiplier mod P
  private val B = 950706376L // second-round multiplier mod P

  /** Uniform double in [0, 1) from (id, seed). The id is reduced mod P
    * BEFORE the seed is added ((a + b) mod P == (a mod P + b mod P) mod P,
    * so the values are unchanged where the naive form worked): `id + seed`
    * directly would overflow a signed long for ids near Long.MaxValue —
    * ANSI Spark and DuckDB would throw, and the JVM twin would silently
    * wrap to a DIFFERENT value. Hash-valued doc ids span the full range.
    */
  private[ops] def uniformCol(id: Column, seed: Long): Column = {
    val h0 = pmod(pmod(id, lit(P)) + lit(((seed % P) + P) % P), lit(P))
    val h1 = pmod((h0 + lit(1L)) * lit(A), lit(P))
    val h2 = pmod((h1 + lit(1L)) * lit(B), lit(P))
    h2.cast("double") / lit(P.toDouble)
  }

  /** JVM twin for specs. */
  private[ops] def uniform(id: Long, seed: Long): Double = {
    def pm(x: Long) = ((x % P) + P) % P
    val h0 = pm(pm(id) + pm(seed))
    val h1 = pm((h0 + 1) * A)
    val h2 = pm((h1 + 1) * B)
    h2.toDouble / P.toDouble
  }

  /** DuckDB twin of [[uniformCol]] as a scalar SQL expression. */
  def uniformSql(idExpr: String, seed: Long): String = {
    val s = ((seed % P) + P) % P
    s"(CAST((((($idExpr % $P + $P) % $P + $s) % $P + 1) * $A % $P + 1)" +
      s" * $B % $P AS DOUBLE) / $P.0)"
  }

  /** Adds a `split` label column: row -> the first split whose cumulative
    * weight exceeds the row's uniform draw. Weights need not sum to 1
    * (normalized internally). Deterministic, repartition-invariant,
    * single narrow pass (no shuffle).
    */
  def hashSplit(df: DataFrame, splits: Seq[(String, Double)], seed: Long = 42L,
                idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights")
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = uniformCol(col(idCol).cast("long"), seed)
    val label = splits.zip(cum).dropRight(1).foldRight(
      lit(splits.last._1): Column) { case (((name, _), bound), els) =>
      when(u < bound, name).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /** DuckDB twin of [[hashSplit]]'s label as a scalar SQL expression. */
  def splitLabelSql(idExpr: String, splits: Seq[(String, Double)],
                    seed: Long): String = {
    val total = splits.map(_._2).sum
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = uniformSql(idExpr, seed)
    val whens = splits.zip(cum).dropRight(1).map { case ((name, _), bound) =>
      s"WHEN $u < $bound THEN '$name'"
    }.mkString(" ")
    s"(CASE $whens ELSE '${splits.last._1}' END)"
  }

  /** Per-stratum hash sampling: keep a row iff its uniform draw is below
    * its stratum's fraction (strata absent from the map are dropped).
    * Proportional per stratum by hash uniformity; exactly reproducible
    * (unlike `DataFrameStatFunctions.sampleBy`, which draws from `rand()`).
    */
  def sampleByHash(df: DataFrame, strataCol: String,
                   fractions: Map[String, Double], seed: Long = 42L,
                   idCol: String = "doc_id"): DataFrame = {
    val u = uniformCol(col(idCol).cast("long"), seed)
    val bound = fractions.toSeq.sortBy(_._1).foldLeft(lit(-1.0): Column) {
      case (els, (stratum, f)) => when(col(strataCol) === stratum, f).otherwise(els)
    }
    df.filter(u < bound)
  }

  /** DuckDB twin of [[sampleByHash]]'s keep predicate. */
  def sampleByHashSql(idExpr: String, strataExpr: String,
                      fractions: Map[String, Double], seed: Long): String = {
    val u = uniformSql(idExpr, seed)
    val whens = fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      s"WHEN $strataExpr = '$s' THEN $f"
    }.mkString(" ")
    s"($u < (CASE $whens ELSE -1.0 END))"
  }

  /** DoReMi/domain-mixing-style TARGET-MIX downsampling: given a desired
    * output `budget` (row count) and target proportions per domain, keep
    * each domain's rows with probability
    * `min(1, budget * target_d / count_d)` — i.e. resample the corpus
    * toward the target mixture (domains absent from `targetMix` drop).
    * The per-domain counts come from one map-side-combined groupBy whose
    * result (|domains| rows) is broadcast back onto the corpus — the big
    * side is never shuffled. Keep decisions use the same (id, seed) hash
    * as [[hashSplit]]: deterministic, repartition/cluster-size-invariant.
    *
    * Float discipline (the gate is value-exact): `keep_frac` is computed
    * as double ops in the written order `budget * target / count`, with
    * every operand an IEEE double in BOTH engines — the SQL twin casts its
    * literals to DOUBLE explicitly because bare DuckDB numeric literals
    * are DECIMAL and decimal arithmetic rounds differently.
    */
  def targetMixSample(df: DataFrame, domainCol: String,
                      targetMix: Map[String, Double], budget: Long,
                      seed: Long = 42L, idCol: String = "doc_id"): DataFrame = {
    require(targetMix.nonEmpty && targetMix.forall(_._2 > 0), "positive targets")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("domain_n"))
    val target = targetMix.toSeq.sortBy(_._1).foldLeft(lit(-1.0): Column) {
      case (els, (d, t)) => when(col(domainCol) === d, lit(t)).otherwise(els)
    }
    val u = uniformCol(col(idCol).cast("long"), seed)
    df.join(broadcast(counts), Seq(domainCol))
      .withColumn("keep_frac",
        least(lit(1.0), lit(budget.toDouble) * target / col("domain_n").cast("double")))
      .filter(u < col("keep_frac"))
      .drop("domain_n")
  }

  /** EXACT fixed-size per-stratum sample — the eval-set / human-review
    * construction stage ("exactly 500 docs per source for annotation"),
    * where [[sampleByHash]]'s per-row coin flip is the wrong tool because
    * fractions only hit a target count in expectation. Every row is ranked
    * WITHIN its stratum by its (id, seed) uniform draw (doc_id breaks
    * ties), and the top `n` per stratum are kept — deterministic,
    * repartition/cluster-size-invariant, and stable under corpus growth in
    * the hash-ordered sense (a new row displaces at most one previous
    * member of its stratum).
    *
    * Plan shape at 100 TB: ONE shuffle on the stratum key for the
    * row_number window. Stratum cardinality is small (sources/domains) but
    * each partition holds a full stratum — at extreme skew (one source =
    * half the corpus) the production form adds a two-stage rank (per-salt
    * top-n, then top-n of the union, correct because the global top-n is
    * contained in the per-salt top-n's); the single-window form is kept
    * here because it is the one the gate can verify value-exactly, and the
    * two-stage refinement composes on top without changing the result.
    * Returns the kept rows as (doc_id, stratum, rk), rk = 1..n within each
    * stratum.
    */
  def fixedNPerStratum(df: DataFrame, strataCol: String, n: Int,
                       seed: Long = 42L, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(uniformCol(col(idCol).cast("long"), seed).asc,
        col(idCol).asc)
    df.select(col(idCol), col(strataCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
  }

  /** DuckDB twin of [[fixedNPerStratum]] over table `tbl` — the same
    * uniform-draw ranking, partition, tiebreak, and cut.
    */
  def fixedNSql(tbl: String, idExpr: String, strataExpr: String, n: Int,
                seed: Long): String = {
    val u = uniformSql(idExpr, seed)
    s"""SELECT $idExpr, $strataExpr, rk FROM (
  SELECT $idExpr, $strataExpr,
    CAST(row_number() OVER (PARTITION BY $strataExpr
      ORDER BY $u ASC, $idExpr ASC) AS INTEGER) AS rk
  FROM $tbl)
WHERE rk <= $n"""
  }

  /** DuckDB twin of [[targetMixSample]] over table `tbl`: yields
    * (all original columns ..., keep_frac) for the kept rows. The caller
    * projects/orders. `domainExpr` must be a plain column name.
    */
  def targetMixSql(tbl: String, idExpr: String, domainExpr: String,
                   targetMix: Map[String, Double], budget: Long,
                   seed: Long): String = {
    val whens = targetMix.toSeq.sortBy(_._1).map { case (d, t) =>
      s"WHEN $domainExpr = '$d' THEN CAST($t AS DOUBLE)"
    }.mkString(" ")
    val u = uniformSql(idExpr, seed)
    s"""SELECT t.*, least(CAST(1.0 AS DOUBLE),
      CAST($budget AS DOUBLE) * (CASE $whens ELSE CAST(-1.0 AS DOUBLE) END)
        / CAST(c.domain_n AS DOUBLE)) AS keep_frac
    FROM $tbl t JOIN (SELECT $domainExpr, count(*) AS domain_n
                      FROM $tbl GROUP BY $domainExpr) c USING ($domainExpr)
    WHERE $u < least(CAST(1.0 AS DOUBLE),
      CAST($budget AS DOUBLE) * (CASE $whens ELSE CAST(-1.0 AS DOUBLE) END)
        / CAST(c.domain_n AS DOUBLE))"""
  }
}
