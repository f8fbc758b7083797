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
  * corpus (MBs vs TBs), so the distinct eval n-gram set is BROADCAST and
  * the training side is a single narrow tokenize + explode pass — the train
  * corpus is never shuffled on the n-gram key and never self-joined. The
  * per-document n-gram set is deduplicated inside the row
  * (`array_distinct`, no global distinct shuffle); the only shuffle is the
  * per-doc hit count, whose input is bounded by the contaminated postings
  * (map-side combined). Contaminated ids are again a broadcast-sized set
  * for the final anti-join.
  */
object Decontaminate {

  /** Per-training-document contamination audit:
    * (doc_id, n_ngrams, hit_ngrams, is_contaminated) where `n_ngrams` is
    * the document's distinct word-n-gram count, `hit_ngrams` how many of
    * those occur anywhere in `eval`, and `is_contaminated` = 1 iff
    * `hit_ngrams > 0`. Tokenization matches [[Dedup.ngrams]] (lowercase
    * alnum words, length > 2, no stop filter, no stemming).
    */
  def auditContamination(train: DataFrame, eval: DataFrame, n: Int = 13,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val ngArr = array_distinct(Dedup.ngramsUdf(n)(col(textCol)))
    val evalNg = eval.select(explode(ngArr).as("ngram")).distinct()
    val trainNg = train.select(col(idCol).as("doc_id"), explode(ngArr).as("ngram"))
    val hits = trainNg.join(broadcast(evalNg), Seq("ngram"))
      .groupBy("doc_id").agg(count(lit(1)).as("hit_ngrams"))
    train.select(col(idCol).as("doc_id"), size(ngArr).cast("long").as("n_ngrams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("hit_ngrams"), lit(0L)).as("hit_ngrams"),
        col("hit_ngrams").isNotNull.cast("int").as("is_contaminated"))
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
