package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Events

/** batch == stream for the tumbling aggregation, with the stream forced
  * through multiple micro-batches (state accumulation across triggers).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("streaming tumbling counts equal the batch form") {
    val src = "/root/testdata/sf0.001"
    val events = Events.load(spark, src)
    val want = Events.tumblingCounts(events).collect()
      .map(_.toSeq).sortBy(_.toString)

    // stage input as several files so maxFilesPerTrigger=1 -> >1 micro-batch
    val dir = Files.createTempDirectory("graft-stream-src").toString
    events.repartition(4).write.mode("overwrite").parquet(dir)

    val q = StreamingAgg.tumblingStream(spark, dir, events.schema)
      .writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("tumbling_test")
      .orderBy("ws", "event_type").collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq)
    assert(q.lastProgress == null || q.lastProgress.batchId >= 1,
      "expected multiple micro-batches")
  }
}
