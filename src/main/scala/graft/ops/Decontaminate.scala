package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (and drop) training
  * documents that share at least one word n-gram with an evaluation /
  * benchmark set — the GPT-3-style overlap filter that keeps eval answers
  * out of the training data. The reference engine has no analog; this is
  * part of the training-data pipeline suite over the same corpus tables.
  *
  * Plan shape at 100 TB: benchmark sets are tiny next to the training
  * corpus (MBs vs TBs), so the distinct eval n-gram set is collected once
  * and broadcast as a hash set, and the training side is ONE narrow
  * tokenize pass with the hit count computed row-locally against that set
  * — the train corpus is never exploded, never shuffled on the n-gram key,
  * and never self-joined; the audit has ZERO shuffles. (An earlier form
  * exploded train n-grams into a broadcast join; that evaluated the
  * shingle UDF — the dominant cost — twice and still shuffled the hit
  * rows.) Contaminated ids are again a broadcast-sized set for the final
  * anti-join.
  */
object Decontaminate {

  /** Per-training-document contamination audit:
    * (doc_id, n_ngrams, hit_ngrams, is_contaminated) where `n_ngrams` is
    * the document's distinct word-n-gram count, `hit_ngrams` how many of
    * those occur anywhere in `eval`, and `is_contaminated` = 1 iff
    * `hit_ngrams > 0`. Tokenization matches [[Dedup.ngrams]] (lowercase
    * alnum words, length > 2, no stop filter, no stemming).
    *
    * Collects the distinct eval n-gram set at CALL time (the same
    * materialization a broadcast join would do driver-side; benchmark
    * sets are MBs by construction — a TB-scale `eval` belongs on the
    * `train` side of the question, not here). The broadcast lives as long
    * as the returned frame's plan; periodic sweeps that call this per
    * cycle should drop references to old frames so the ContextCleaner
    * reclaims the previous cycle's set.
    */
  def auditContamination(train: DataFrame, eval: DataFrame, n: Int = 13,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val ngArr = array_distinct(Dedup.ngramsUdf(n)(col(textCol)))
    val evalSet: Set[String] = eval.select(explode(ngArr).as("ngram"))
      .distinct().collect().map(_.getString(0)).toSet
    val bEval = train.sparkSession.sparkContext.broadcast(evalSet)
    val hitsUdf = udf((arr: Seq[String]) =>
      if (arr == null) 0L else arr.count(bEval.value.contains).toLong)
    train
      .select(col(idCol).as("doc_id"), ngArr.as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_ngrams"),
        hitsUdf(col("arr")).as("hit_ngrams"))
      .select(col("doc_id"), col("n_ngrams"), col("hit_ngrams"),
        (col("hit_ngrams") > 0).cast("int").as("is_contaminated"))
  }

  /** The training set with every contaminated document removed (broadcast
    * anti-join on the audited ids — the contaminated id set is small by
    * construction once the corpus is clean-ish).
    */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int = 13,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val bad = auditContamination(train, eval, n, textCol, idCol)
      .filter(col("is_contaminated") === 1)
      .select(col("doc_id").as(idCol))
    train.join(broadcast(bad), Seq(idCol), "left_anti")
  }
}
