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

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sha", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

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
    * and an 8-dim feature from the byte content, preserving the exact
    * batch/schema contract a real codec UDF would have.
    */
  private def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, Array.empty)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFF; h *= 0x100000001b3L; i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 17, 1024).toInt
    val feat = Array.tabulate(8)(j =>
      (math.floorMod(h >>> (j * 7), 1000) / 1000.0f))
    (w, ht, feat)
  }

  /** Partition-local batch "decode": one pass, no shuffle; output rows match
    * [[featureSchema]]. The sha column doubles as the ingest invariant for
    * binary payloads.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "kind", "bytes").rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val (w, h, feat) = decodeStub(kind, bytes)
        val sha = if (bytes == null) null
          else { md.reset(); md.digest(bytes).map("%02x".format(_)).mkString }
        Row(id, kind, if (bytes == null) 0 else bytes.length, sha, w, h, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
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
