package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication — the streaming twin of
  * [[graft.ops.Dedup.exact]] for the continuous-ingest shape of a training
  * pipeline (documents arrive forever; the keeper set must be decided
  * online, not by a nightly batch).
  *
  * Keyed state per DISTINCT CONTENT (sha256): the first document seen for a
  * hash is emitted as the keeper; every later arrival of the same hash is
  * emitted as a duplicate pointing at the keeper. State is one (sha ->
  * keeper id) entry per distinct content — sharded across executors by the
  * groupByKey shuffle on sha, the same key the batch form groups on, so a
  * 100-TB corpus's state distributes exactly like its batch dedup shuffle.
  * Within one micro-batch the smallest doc_id wins (deterministic); across
  * micro-batches arrival order wins — identical to the batch min-id
  * convention whenever ingestion is id-ordered, which StreamingSpec drives.
  *
  * No watermark/timeout: dedup state is inherently forever (a duplicate may
  * arrive years later). Production bounds it with a TTL timeout if the
  * dedup horizon is finite; the state SHAPE is the scalable part.
  */
object StreamingDedup {

  final case class DedupOut(doc_id: Long, canon_id: Long, is_dup: Int)

  /** One content-hash group's transition for a micro-batch. */
  private[streaming] def step(
      sha: String, docs: Iterator[(String, Long)],
      state: GroupState[Long]): Iterator[DedupOut] = {
    val ids = docs.map(_._2).toArray.sorted
    if (ids.isEmpty) return Iterator.empty
    val out = List.newBuilder[DedupOut]
    val keeper = state.getOption match {
      case Some(k) => k
      case None => // first sighting of this content: smallest id is keeper
        val k = ids(0)
        state.update(k)
        out += DedupOut(k, k, 0)
        k
    }
    ids.foreach(id => if (id != keeper) out += DedupOut(id, keeper, 1))
    out.result().iterator
  }

  /** The streaming query: parquet document stream -> sha256 ->
    * groupByKey(sha) -> flatMapGroupsWithState (Append, NoTimeout).
    */
  def dedupStream(spark: SparkSession, srcDir: String, schema: StructType,
                  maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .select(sha2(col("text"), 256).as("sha"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sha: String, docs: Iterator[(String, Long)], st: GroupState[Long]) =>
          step(sha, docs, st)
      }
      .toDF()
  }
}
