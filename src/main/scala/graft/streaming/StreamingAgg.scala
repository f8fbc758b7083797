package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming form of the event analytics (beyond the reference,
  * which has no streams — SURVEY.md §2.6): the same tumbling aggregation as
  * [[graft.ops.Events.tumblingCounts]] expressed over `readStream`, with
  * watermarked event-time state. StreamingSpec gates batch == stream on
  * identical input consumed across multiple micro-batches.
  */
object StreamingAgg {

  /** Tumbling 1-hour counts over a parquet file stream. `maxFilesPerTrigger`
    * forces multi-micro-batch consumption so state merge is exercised.
    */
  def tumblingStream(spark: SparkSession, srcDir: String, schema: StructType,
                     maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      // parquet yields TIMESTAMP_NTZ; watermarks require TIMESTAMP (session
      // tz is pinned UTC, so this is a pure type change)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        col("n"), col("sum_value"))
}
