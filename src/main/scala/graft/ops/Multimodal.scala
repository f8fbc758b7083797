package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-local batches. The decode step is a
  * clearly-marked DETERMINISTIC STUB (no image/audio codecs in this
  * container); everything Spark-side — schema, batching, partitioning,
  * null/empty handling — is real and tested, so swapping a real decoder in
  * changes one function.
  *
  * In PySpark this stage is `mapInPandas` over Arrow batches; the Scala
  * analog is `mapPartitions` over row iterators, which is what Spark
  * compiles the former to on the JVM side.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  /** Output row of [[extractFeatures]] (typed — the Dataset encoder IS the
    * schema, so plan and spec cannot drift).
    */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 sha: String, width: Int, height: Int,
                                 feature: Array[Float])

  val featureSchema: StructType =
    org.apache.spark.sql.Encoders.product[MediaFeatures].schema

  /** Synthesize a media table from any text corpus: bytes = UTF-8 of the
    * text (an opaque blob as far as the pipeline cares), kind round-robin.
    */
  def mediaFromDocs(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("bytes"))

  /** STUB decoder: a real implementation would decode image dimensions /
    * audio frames here. The stand-in derives deterministic pseudo-dimensions
    * and an 8-dim feature from the content's sha256 (first 15 hex chars →
    * 60-bit nonnegative integer), preserving the exact batch/schema contract
    * a real codec UDF would have — and, unlike an in-JVM byte hash, the
    * derivation is expressible in ANSI SQL, so the whole feature surface is
    * checkable by the DuckDB oracle.
    */
  private[ops] def decodeStub(shaHex: String): (Int, Int, Array[Float]) = {
    val h = java.lang.Long.parseLong(shaHex.substring(0, 15), 16)
    val w = 64 + (h % 1024L).toInt
    val ht = 64 + ((h >>> 17) % 1024L).toInt
    val feat = Array.tabulate(8)(j => (((h >>> (j * 7)) % 1000L) / 1000.0).toFloat)
    (w, ht, feat)
  }

  /** Partition-local batch "decode": one typed `mapPartitions` pass, no
    * shuffle, no RDD node in the plan; output rows are [[MediaFeatures]].
    * The sha column doubles as the ingest invariant for binary payloads.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, kind, bytes) =>
          val sha = if (bytes == null) null
            else { md.reset(); md.digest(bytes).map("%02x".format(_)).mkString }
          val (w, h, feat) =
            if (bytes == null || bytes.isEmpty) (0, 0, Array.empty[Float])
            else decodeStub(sha)
          MediaFeatures(id, kind, if (bytes == null) 0 else bytes.length,
            sha, w, h, feat)
        }
      }
      .toDF()
  }

  /** "Frame sampling": every strideth byte-window as a pseudo-frame —
    * the partitioning/explode shape of real video frame extraction.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 64): DataFrame = {
    val frames = udf((bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[(Int, Array[Byte])]
      else (0 until bytes.length by stride).zipWithIndex.map { case (off, i) =>
        (i, java.util.Arrays.copyOfRange(bytes, off, math.min(off + frameBytes, bytes.length)))
      })
    media.select(col("media_id"), col("kind"), explode(frames(col("bytes"))).as("f"))
      .select(col("media_id"), col("kind"),
        col("f._1").as("frame_id"), col("f._2").as("frame_bytes"))
  }
}
