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

  test("streaming chunking (stateless transform on readStream) equals the batch form") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.ops.Chunks.chunk(docs)
      .collect().map(_.toSeq).sortBy(_.toString)

    // the SAME operator is the streaming twin: Chunks.chunk is a narrow
    // stateless pass (no agg, no watermark), so it applies to a readStream
    // unchanged — the 100-TB continuous-ingest chunker is literally the
    // batch plan in append mode
    val dir = Files.createTempDirectory("graft-stream-chunk").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = graft.ops.Chunks.chunk(stream)
      .writeStream.format("memory").queryName("chunk_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("chunk_test")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      s"stream ${got.size} rows vs batch ${want.size}")
  }

  test("streaming exact dedup (flatMapGroupsWithState on sha) equals the batch form") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.ops.Dedup.exact(docs)
      .select("doc_id", "canon_id", "is_dup")
      .collect().map(_.toSeq).sortBy(_.toString)

    // id-ordered ranged files: a duplicate's smaller id always arrives in
    // an earlier (or the same) micro-batch, so streaming first-arrival ==
    // batch min-id keeper; maxFilesPerTrigger=1 forces state to carry
    // across micro-batches
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val n = docs.count()
    val chunks = 5
    (0 until chunks).foreach { i =>
      val lo = i * n / chunks
      // last chunk takes everything above its floor (ids may start at 1)
      val hi = if (i == chunks - 1) Long.MaxValue else (i + 1) * n / chunks
      val tmp = Files.createTempDirectory("graft-dedup-chunk").toString
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(dir, f"chunk-$i%03d.parquet"))
    }

    val q = StreamingDedup.dedupStream(spark, dir, docs.schema)
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_test")
      .select("doc_id", "canon_id", "is_dup")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == want.toSeq,
      s"stream ${got.size} rows vs batch ${want.size}")
    assert(q.lastProgress == null || q.lastProgress.batchId >= 1,
      "expected multiple micro-batches")
  }

  test("streaming index ingest (foreachBatch + append) == one-shot batch build") {
    import graft.corpus.{Corpus, SyntheticCorpus}
    import graft.index.{IndexBuilder, IndexConfig, Manifest, PostingIndex}
    val cfg = IndexConfig(shards = 4, termBuckets = 2, blockSize = 16)
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 180, seed = 11L))
    val full = Files.createTempDirectory("graft-si-full").toString
    IndexBuilder.build(spark, docs, full, cfg)

    // stage the corpus as several files -> maxFilesPerTrigger=1 forces
    // multiple micro-batches (multiple append rounds over one checkpoint)
    val srcDir = Files.createTempDirectory("graft-si-src").toString
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)

    val inc = Files.createTempDirectory("graft-si-inc").toString
    val ckpt = Files.createTempDirectory("graft-si-ckpt").toString
    StreamingIndex.ensureInitialized(docs, inc, cfg)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = StreamingIndex.sink(stream, inc, cfg, ckpt, availableNow = true)
    q.awaitTermination(240000)
    assert(q.lastProgress == null || q.lastProgress.batchId >= 1,
      "expected multiple micro-batches")

    // the streamed index IS the batch index: counters, globals, results
    assert(Manifest.totals(inc) == Manifest.totals(full))
    val gF = PostingIndex.readGlobals(spark, full)
    val gI = PostingIndex.readGlobals(spark, inc)
    assert((gI.nDocs, gI.totalTokens, gI.avgdl, gI.vocabularySize) ==
      (gF.nDocs, gF.totalTokens, gF.avgdl, gF.vocabularySize))
    val a = new PostingIndex(spark, full)
    val b = new PostingIndex(spark, inc)
    Seq("longest river", "return", "science", "artificial intelligence").foreach { qq =>
      val want = a.search(qq, 10).collect().map(_.toSeq).toSeq
      val got = b.search(qq, 10).collect().map(_.toSeq).toSeq
      assert(got == want, s"query '$qq'")
    }

    // restart over the SAME checkpoint with no new data: a no-op (the
    // foreachBatch/append idempotence contract end-to-end)
    val totalsBefore = Manifest.totals(inc)
    val q2 = StreamingIndex.sink(
      spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
        .parquet(srcDir), inc, cfg, ckpt, availableNow = true)
    q2.awaitTermination(120000)
    assert(Manifest.totals(inc) == totalsBefore, "restart must be a no-op")
  }

  test("streaming percolation (foreachBatch) == batch percolate over the whole corpus") {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.functions.col
    import graft.corpus.{Corpus, SyntheticCorpus}
    import graft.ops.Percolate
    import spark.implicits._
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 150, seed = 13L))
      .select(col("docId").as("doc_id"), col("content").as("text"))
    val queries = Seq((1L, "longest river"), (2L, "artificial intelligence"),
      (3L, "science change"), (4L, "the and of")).toDF("query_id", "query")
    val expected = Percolate.percolate(docs, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(expected.nonEmpty)

    val srcDir = Files.createTempDirectory("graft-perc-src").toString
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft-perc-ckpt").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var batches = 0
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // alerting sink analog: each micro-batch percolates independently
        // (the operator is per-document, so boundaries cannot change
        // results); a real deployment writes matches to its alert bus
        batches += 1
        buf ++= Percolate.percolate(batch.toDF(), queries).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(240000)
    assert(batches >= 2, "expected multiple micro-batches")
    assert(buf.toSeq.sorted == expected)
  }

  test("streaming sessionization (flatMapGroupsWithState) equals the batch form") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val events = Events.load(spark, src)
    val want = graft.ops.Events.sessions(events).collect()
      .map(_.toSeq).sortBy(_.toString)

    // feed the stream as ts-ordered chunks (append-mode sessionization is
    // exact when micro-batches respect time order; see StreamingSessions)
    val dir = Files.createTempDirectory("graft-stream-sess").toString
    val sorted = events.orderBy("ts")
    val n = sorted.count()
    val chunkRows = (n / 3 + 1).toInt
    val all = sorted.collect()
    val schema = events.schema

    def writeChunk(rows: Seq[org.apache.spark.sql.Row], name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-stream-chunk").toString
      spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(dir, name))
    }

    val q = StreamingSessions.sessionStream(spark, dir, schema)
      .writeStream
      .format("memory")
      .queryName("sess_test")
      .outputMode("append")
      .start()
    try {
      all.grouped(chunkRows).zipWithIndex.foreach { case (rows, i) =>
        writeChunk(rows.toSeq, f"chunk-$i%03d.parquet")
        q.processAllAvailable()
      }
      // two sentinel batches: the first advances the watermark past every
      // open session's timeout, the second lets the timeouts FIRE (timeouts
      // use the watermark computed at the previous batch's end)
      val maxTs = events.agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
      (1 to 2).foreach { k =>
        val far = new java.sql.Timestamp(maxTs.getTime + k * 10L * 24 * 3600 * 1000)
        val sentinel = org.apache.spark.sql.Row(
          -1L, java.time.LocalDateTime.ofInstant(far.toInstant,
            java.time.ZoneOffset.UTC), -1L, "sentinel", 0.0, "{}")
        writeChunk(Seq(sentinel), s"sentinel-$k.parquet")
        q.processAllAvailable()
      }
      val got = spark.table("sess_test")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "session_seq", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == want.toSeq,
        s"stream ${got.size} rows vs batch ${want.size}")
    } finally q.stop()
  }

  test("ensureInitialized accepts the STREAMING frame itself") {
    import graft.index.{IndexBuilder, IndexConfig, PostingIndex}
    import graft.corpus.{Corpus, SyntheticCorpus}
    val cfg = IndexConfig(shards = 2, termBuckets = 1, blockSize = 16)
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 20, seed = 3L))
    val srcDir = Files.createTempDirectory("graft-ei-src").toString
    docs.write.mode("overwrite").parquet(srcDir)
    val streamingFrame = spark.readStream.schema(docs.schema).parquet(srcDir)
    val dir = Files.createTempDirectory("graft-ei-idx").toString
    // the natural call passes the same streaming frame given to sink();
    // limit(0) on it would throw AnalysisException in the batch writers
    StreamingIndex.ensureInitialized(streamingFrame, dir, cfg)
    val g = PostingIndex.readGlobals(spark, dir)
    assert(g.nDocs == 0 && g.vocabularySize == 0)
    // and the bootstrapped empty index accepts a batch append
    IndexBuilder.append(spark, docs, dir, cfg, "b1")
    assert(PostingIndex.readGlobals(spark, dir).nDocs == 20)
  }

  test("streaming deletes (foreachBatch + delete) == one-shot tombstoning") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.corpus.{Corpus, SyntheticCorpus}
    import graft.index.{IndexBuilder, IndexConfig, PostingIndex}
    val cfg = IndexConfig(shards = 4, termBuckets = 2, blockSize = 16)
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 180, seed = 11L))
    val delIds = docs.filter(pmod(col("docId"), lit(3L)) === 1).select("docId")

    val oneShot = Files.createTempDirectory("graft-sd-ref").toString
    IndexBuilder.build(spark, docs, oneShot, cfg)
    IndexBuilder.delete(spark, delIds, oneShot, "all")

    val streamed = Files.createTempDirectory("graft-sd-inc").toString
    IndexBuilder.build(spark, docs, streamed, cfg)
    val srcDir = Files.createTempDirectory("graft-sd-src").toString
    delIds.repartition(3).write.mode("overwrite").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft-sd-ckpt").toString
    val q = StreamingDelete.sink(
      spark.readStream.schema(delIds.schema).option("maxFilesPerTrigger", 1)
        .parquet(srcDir), streamed, cfg, ckpt, availableNow = true)
    q.awaitTermination(120000)
    assert(q.lastProgress == null || q.lastProgress.batchId >= 1,
      "expected multiple micro-batches")

    // identical tombstone id set and identical overlay-served results
    def tombs(d: String) = spark.read.parquet(s"$d/tombstones")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tombs(streamed) == tombs(oneShot))
    val a = new PostingIndex(spark, oneShot)
    val b = new PostingIndex(spark, streamed)
    Seq("longest river", "return", "science").foreach { qq =>
      assert(b.search(qq, 10).collect().map(_.toSeq).toSeq ==
        a.search(qq, 10).collect().map(_.toSeq).toSeq, s"query '$qq'")
    }

    // restart over the SAME checkpoint: no new tombstone batches
    val before = tombstoneBatchDirs(streamed)
    val q2 = StreamingDelete.sink(
      spark.readStream.schema(delIds.schema).option("maxFilesPerTrigger", 1)
        .parquet(srcDir), streamed, cfg, ckpt, availableNow = true)
    q2.awaitTermination(120000)
    assert(tombstoneBatchDirs(streamed) == before, "restart must be a no-op")
  }

  test("streaming deletes auto-compact once the overlay crosses the bound") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    import graft.corpus.{Corpus, SyntheticCorpus}
    import graft.index.{IndexBuilder, IndexConfig, PostingIndex}
    val cfg = IndexConfig(shards = 4, termBuckets = 2, blockSize = 16)
    val docs = Corpus.fromCodeDocs(SyntheticCorpus.generate(spark, 180, seed = 11L))
    val pred = pmod(col("docId"), lit(3L)) === 1
    val delIds = docs.filter(pred).select("docId")

    val dir = Files.createTempDirectory("graft-sdc-idx").toString
    IndexBuilder.build(spark, docs, dir, cfg)
    val srcDir = Files.createTempDirectory("graft-sdc-src").toString
    delIds.repartition(2).write.mode("overwrite").parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft-sdc-ckpt").toString
    // bound of 1: every non-empty trigger compacts -> after the drain the
    // overlay must be empty and the index physically reduced
    val q = StreamingDelete.sink(
      spark.readStream.schema(delIds.schema).option("maxFilesPerTrigger", 1)
        .parquet(srcDir), dir, cfg, ckpt, availableNow = true,
      compactAbove = 1L)
    q.awaitTermination(240000)

    assert(!Files.exists(java.nio.file.Paths.get(dir, "tombstones")),
      "compaction must have cleared the overlay")
    val fresh = Files.createTempDirectory("graft-sdc-fresh").toString
    IndexBuilder.build(spark, docs.filter(!pred), fresh, cfg)
    val gA = PostingIndex.readGlobals(spark, dir)
    val gB = PostingIndex.readGlobals(spark, fresh)
    assert((gA.nDocs, gA.totalTokens, gA.avgdl, gA.vocabularySize) ==
      (gB.nDocs, gB.totalTokens, gB.avgdl, gB.vocabularySize))
    val a = new PostingIndex(spark, dir)
    val b = new PostingIndex(spark, fresh)
    Seq("longest river", "return", "science").foreach { qq =>
      assert(a.search(qq, 10).collect().map(_.toSeq).toSeq ==
        b.search(qq, 10).collect().map(_.toSeq).toSeq, s"query '$qq'")
    }
  }

  private def tombstoneBatchDirs(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(dir, "tombstones")
    if (!Files.exists(p)) Set.empty
    else {
      val b = Set.newBuilder[String]
      Files.list(p).forEach(d => b += d.getFileName.toString)
      b.result()
    }
  }
}
