package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Gap-based sessionization as a STREAM (the custom-state streaming
  * capability: `flatMapGroupsWithState` with event-time timeouts) — the
  * streaming twin of [[graft.ops.Events.sessions]].
  *
  * State per user is ONE open session (seq, start, end, count) — O(users)
  * state, not O(events): each micro-batch's events merge into the open
  * session in timestamp order; a gap > `gapMinutes` closes the session and
  * emits it downstream (Append mode); an event-time timeout (watermark
  * passing `end + gap`) closes and emits a session that simply stopped
  * receiving events.
  *
  * Disorder tolerance is watermark-bounded, as in any append-mode
  * streaming sessionizer: events later than the watermark are dropped by
  * Spark, and an event arriving AFTER its session was emitted cannot
  * retract the emission. Batch == stream therefore holds exactly when
  * micro-batches respect session boundaries' order — which the
  * StreamingSpec drives explicitly (per-file triggers in timestamp order,
  * sentinel to flush) — and approximately (per-session counts may split)
  * under arbitrary replay.
  */
object StreamingSessions {

  final case class SessionOut(user_id: Long, session_seq: Long,
                              session_start: Long, session_end: Long,
                              n_events: Long)

  /** Per-user state: `seq` is the last session number assigned; `n == 0`
    * marks "no session currently open" (the marker survives a timeout
    * emission so session numbering keeps counting across closed sessions —
    * a removed state would restart every user at 1).
    */
  final case class OpenSession(seq: Long, startUs: Long, endUs: Long, n: Long)

  private def toUs(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** One user's state transition for a micro-batch of events. */
  private[streaming] def step(
      userId: Long, events: Iterator[(Long, Timestamp)],
      state: GroupState[OpenSession], gapUs: Long): Iterator[SessionOut] = {
    def emit(s: OpenSession): SessionOut =
      SessionOut(userId, s.seq, s.startUs / 1000000L, s.endUs / 1000000L, s.n)
    if (state.hasTimedOut) {
      // watermark passed end + gap with no further events: session is final
      val out = state.getOption.filter(_.n > 0).map(emit).toList
      out.headOption.foreach(o =>
        state.update(OpenSession(o.session_seq, 0L, 0L, 0L)))
      return out.iterator
    }
    val base = state.getOption
    var cur = base.filter(_.n > 0).orNull
    var lastSeq = base.map(_.seq).getOrElse(0L)
    val sorted = events.map { case (_, ts) => toUs(ts) }.toArray.sorted
    val closed = List.newBuilder[SessionOut]
    sorted.foreach { us =>
      cur match {
        case null =>
          lastSeq += 1
          cur = OpenSession(lastSeq, us, us, 1L)
        case s if us - s.endUs > gapUs =>
          closed += emit(s)
          lastSeq = s.seq + 1
          cur = OpenSession(lastSeq, us, us, 1L)
        case s =>
          // merge (also absorbs bounded disorder: an event earlier than the
          // open session's start extends it backwards)
          cur = s.copy(startUs = math.min(s.startUs, us),
            endUs = math.max(s.endUs, us), n = s.n + 1)
      }
    }
    if (cur != null) {
      state.update(cur)
      // timeout once the watermark is sure no in-gap event can still arrive
      state.setTimeoutTimestamp(cur.endUs / 1000L + gapUs / 1000L + 1L)
    }
    closed.result().iterator
  }

  /** The streaming query: parquet file stream -> watermark ->
    * groupByKey(user) -> flatMapGroupsWithState (Append, EventTimeTimeout).
    */
  def sessionStream(spark: SparkSession, srcDir: String, schema: StructType,
                    gapMinutes: Int = 30,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[(Long, Timestamp)], st: GroupState[OpenSession]) =>
          step(user, evs, st, gapUs)
      }
      .toDF()
  }
}
