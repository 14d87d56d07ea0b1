package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkedAppend (X1) moves all rows in micro-batches, exactly once") {
    val base = Files.createTempDirectory("graft_stream").toString
    // three source files = three micro-batches (maxFilesPerTrigger=1)
    Seq(1, 2, 3).toDF("x").repartition(3)
      .write.parquet(s"$base/src")
    StreamingOps.chunkedAppend(spark, s"$base/src", s"$base/dst", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/dst").as[Int].collect().toSet == Set(1, 2, 3))
    // re-run with same checkpoint: no new batches, no duplicates
    StreamingOps.chunkedAppend(spark, s"$base/src", s"$base/dst", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/dst").count() == 3)
  }

  test("streamingLatestPerKey merges incrementally and matches the batch result") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamingLatestPerKey(spark, s"$dir/events.parquet",
        queryName = "graft_test_upsert", splits = 4)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.sources.Tables.events(spark, dir)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streamingLatestPerKey reads back ONLY the buckets a batch touches") {
    import org.apache.spark.sql.functions._
    // 16 distinct keys spread over 64 buckets, streamed in 4 micro-batches
    // of ~4 keys each: a batch's keys overlap few earlier buckets, so a
    // pruning merge reads back far less than the whole table each batch
    val base = Files.createTempDirectory("graft_prune").toString
    val rows = (0L until 16L).map(k => (k, k * 100, k)) // (user_id, event_id, ts-ns)
    rows.toDF("user_id", "event_id", "ts")
      .withColumn("ts", col("ts").cast("long"))
      .write.parquet(s"$base/events")
    val diag = scala.collection.mutable.Buffer.empty[StreamingOps.BatchMerge]
    val result = StreamingOps.streamingLatestPerKey(spark, s"$base/events",
      queryName = "graft_test_prune", splits = 4, numBuckets = 64,
      diagnostics = Some(diag))
    val laterBatches = diag.sortBy(_.batchId).drop(1).filter(_.touchedBuckets.nonEmpty)
    assert(laterBatches.nonEmpty)
    // a batch never reads more bucket files than keys it touches…
    laterBatches.foreach(b => assert(b.prevPathsRead.size <= b.touchedBuckets.size))
    // …and in aggregate reads strictly less than the unpruned merge would
    // (which reads back EVERY bucket written so far, every batch)
    val pruned = laterBatches.map(_.prevPathsRead.size).sum
    val unpruned = laterBatches.map { b =>
      diag.filter(_.batchId < b.batchId).flatMap(_.touchedBuckets).toSet.size
    }.sum
    assert(pruned < unpruned)
    // the union of per-bucket latest generations is the correct table
    val expected = rows.map { case (k, e, _) => (k, e) }.toSet
    assert(result.select("user_id", "event_id")
      .as[(Long, Long)].collect().toSet == expected)
  }

  test("streamingLatestPerKey resumes from its metadata after a restart") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_resume")
    val base = root.resolve("table").toString
    val events = root.resolve("events").toString
    (0L until 12L).map(k => (k, k * 10, k)).toDF("user_id", "event_id", "ts")
      .withColumn("ts", col("ts").cast("long"))
      .write.parquet(events)
    val first = StreamingOps.streamingLatestPerKey(spark, events,
      queryName = "graft_test_resume", baseDir = Some(base))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    // second run over the SAME baseDir: the checkpoint skips every
    // processed file and the persisted bucket->generation metadata
    // reconstructs the table — no batch runs, same result
    val diag = scala.collection.mutable.Buffer.empty[StreamingOps.BatchMerge]
    val second = StreamingOps.streamingLatestPerKey(spark, events,
      queryName = "graft_test_resume", baseDir = Some(base),
      diagnostics = Some(diag))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(second == first && first.size == 12)
    assert(diag.forall(_.touchedBuckets.isEmpty),
      s"resume ran real merges: $diag")
  }

  test("streamingLatestPerKey recovers exactly-once from a crash between " +
      "generation write and metadata commit") {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files => JFiles, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_crash")
    val base = root.resolve("table").toString
    val events = root.resolve("events").toString
    // 16 keys x 4 occurrences: every micro-batch touches (nearly) every
    // bucket, so the final batch certainly rewrites buckets that earlier
    // generations own — the case where a lost metadata commit matters
    (0L until 64L).map(i => (i % 16, i, i)).toDF("user_id", "event_id", "ts")
      .withColumn("ts", col("ts").cast("long"))
      .write.parquet(events)
    val diag1 = scala.collection.mutable.Buffer.empty[StreamingOps.BatchMerge]
    val expected = StreamingOps.streamingLatestPerKey(spark, events,
        queryName = "graft_test_crash", baseDir = Some(base), numBuckets = 4,
        diagnostics = Some(diag1))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val metaFile = Paths.get(base, "gen", "_bucket_gen.tsv")
    val committedMeta = JFiles.readAllLines(metaFile).asScala.toList
    val last = diag1.maxBy(_.batchId)
    assert(last.prevPathsRead.nonEmpty,
      "precondition: the final batch must rewrite earlier generations' buckets")

    // Simulate the crash AFTER g<last> was written but BEFORE commitMeta():
    //  - the streaming commit log loses the final batch (so restart
    //    replays it from its recorded offsets),
    //  - the bucket->generation metadata rolls back to its pre-batch
    //    state (reconstructed from the earlier batches' diagnostics),
    //  - the half-applied g<last> directory REMAINS on disk.
    JFiles.delete(Paths.get(base, "ckpt", "commits", last.batchId.toString))
    // ... including the local-FS checksum sidecar, which a crash would
    // never have written either (leaving it fails the re-commit's rename)
    JFiles.deleteIfExists(
      Paths.get(base, "ckpt", "commits", s".${last.batchId}.crc"))
    val preBatch = diag1.filter(_.batchId < last.batchId)
      .flatMap(b => b.touchedBuckets.map(_ -> b.batchId))
      .groupBy(_._1).map { case (b, gs) => b -> gs.map(_._2).max }
    JFiles.write(metaFile, (s"#numBuckets\t4" +:
      preBatch.toSeq.sorted.map { case (b, g) => s"$b\t$g" }).asJava)

    // Restart over the same table dir: the replayed batch must read the
    // PRE-crash bucket state (not the orphaned g<last> files), overwrite
    // g<last>, and re-commit identical metadata — exactly-once.
    val diag2 = scala.collection.mutable.Buffer.empty[StreamingOps.BatchMerge]
    val recovered = StreamingOps.streamingLatestPerKey(spark, events,
        queryName = "graft_test_crash", baseDir = Some(base), numBuckets = 4,
        diagnostics = Some(diag2))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val replayed = diag2.filter(_.touchedBuckets.nonEmpty)
    assert(replayed.map(_.batchId) == Seq(last.batchId),
      s"expected exactly one replay of batch ${last.batchId}, got $diag2")
    assert(replayed.head.touchedBuckets == last.touchedBuckets)
    assert(replayed.head.prevPathsRead == last.prevPathsRead,
      "replay must read the pre-crash generations, not the orphaned dir")
    assert(recovered == expected)
    assert(JFiles.readAllLines(metaFile).asScala.toList == committedMeta,
      "re-committed metadata must be identical to the pre-crash commit")
  }

  test("parquetRowCount reads footers only and matches the real count") {
    val dir = "/root/testdata/sf0.001"
    val fromFooters = graft.sources.Tables.parquetRowCount(spark, s"$dir/embeddings.parquet")
    val real = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(fromFooters == real && fromFooters > 0)
  }

  test("windowedEventCounts aggregates a bounded stream in complete mode") {
    val dir = "/root/testdata/sf0.001"
    val out = StreamingOps.windowedEventCounts(spark, s"$dir/events.parquet", "1 day",
      queryName = "graft_test_stream")
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("window_start", "event_type", "n_events", "sum_value"))
  }

  test("streamNearDupGate: planted twin flagged, unique doc passes, matches batch") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("graft_gate").toString
    val histText = (0 until 12).map(i => s"h$i").mkString(" ")
    // history: the twin source + an unrelated doc; batch: an exact twin
    // of history doc 1 (must be flagged) + a globally unique doc (must
    // pass the gate silently)
    val docs = Seq(
      (1L, histText),
      (2L, (0 until 12).map(i => s"z$i").mkString(" ")),
      (400L, histText),
      (401L, (0 until 12).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$base/docs")
    val docsFile = Files.list(java.nio.file.Paths.get(s"$base/docs"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val parquet = {
      var p: java.nio.file.Path = null
      while (docsFile.hasNext) {
        val f = docsFile.next()
        if (f.toString.endsWith(".parquet")) p = f
      }
      p.toString
    }
    val got = StreamingOps.streamNearDupGate(spark, parquet,
        docs.where(col("doc_id") < 400), col("doc_id") >= 400,
        queryName = "graft_test_gate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(400L), s"gate flagged: $got")
    assert(got(400L) == 1L, s"twin should hit exactly history doc 1: $got")
    // batch equivalence: the stream-static gate equals dd08's candidate
    // join aggregated per new doc
    val want = graft.operators.DedupOps.incrementalNearDupCandidates(
        docs.where(col("doc_id") >= 400), docs.where(col("doc_id") < 400),
        "text", "doc_id", shingleK = 3, bands = 4, rowsPerBand = 4)
      .groupBy("new_id").agg(countDistinct("existing_id").as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream gate $got != batch gate $want")
  }

  test("streamTokenDrift runs incrementally and equals the batch drift") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val got = StreamingOps.streamTokenDrift(spark, s"$dir/documents.parquet",
        docs.where(col("doc_id") < 400), col("doc_id") >= 400,
        queryName = "graft_test_drift", diagnostics = Some(batches))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    // the monitor must actually run incrementally — several micro-batch
    // folds, not one shot (source re-split into 4 files)
    assert(batches.length >= 2, s"only ${batches.length} micro-batches ran")
    // associative counts: any batching folds to the batch-op answer
    val want = graft.operators.TextOps.distributionDrift(
        docs, "text", "lang", col("doc_id") >= 400)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(got == want, s"stream drift $got != batch drift $want")
  }

  test("streamBatchScore: incremental, per-partition model loads, equals batch scoring") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val loads = spark.sparkContext.longAccumulator("stream_model_loads")
    val got = StreamingOps.streamBatchScore(spark, s"$dir/documents.parquet",
        col("doc_id") < 200 && length(col("text")) > 0,
        queryName = "graft_test_infer",
        diagnostics = Some(batches), modelLoads = Some(loads))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batches.length >= 2, s"only ${batches.length} micro-batches ran")
    // one model load per task, never per row: each micro-batch is one
    // re-split file read as <= a handful of partitions
    assert(loads.value < got.length,
      s"${loads.value} model loads for ${got.length} rows — per-row loading")
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val want = graft.operators.MultimodalOps.batchScore(
        graft.operators.MultimodalOps.withBinaryPayload(
          docs.where(col("doc_id") < 200 && length(col("text")) > 0), "text"),
        "payload", "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "stream scoring diverged from the batch scorer")
  }

  test("streamStaticEnrich over a bounded source equals the batch join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val dim = graft.sources.Tables.table(spark, dir, "customer")
    val got = StreamingOps.streamStaticEnrich(spark, s"$dir/events.parquet",
        dim, "c_custkey", "c_mktsegment",
        queryName = "graft_test_enrich")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))).toSet
    val want = graft.sources.Tables.events(spark, dir)
      .join(dim.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streamSlidingDistinct folds micro-batched sketches to the batch answer") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val got = StreamingOps.streamSlidingDistinct(spark, s"$dir/events.parquet",
        splits = 4, queryName = "graft_test_sliding",
        diagnostics = Some(batches))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(batches.length >= 2,
      s"re-split source must yield several micro-batches, got $batches")
    // KMV merge associativity: the folded state must equal the batch op
    val want = graft.operators.SketchOps.slidingDistinct7d(
        graft.operators.SketchOps.dailyUserSketches(
          graft.sources.Tables.events(spark, dir)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streamCmsMonitor: streamed counters equal the batch sketch (order-independent)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val got = StreamingOps.streamCmsMonitor(spark, s"$dir/events.parquet",
        splits = 4, queryName = "graft_test_cms",
        diagnostics = Some(batches))
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("pk"),
        r.getAs[Long]("exact"), r.getAs[Long]("est"))).toSet
    assert(batches.length >= 2,
      s"re-split source must yield several micro-batches, got $batches")
    // counter addition is order-independent: the stream must land on the
    // batch cmsCounters + cmsEstimate answer exactly
    import org.apache.spark.sql.expressions.Window
    val keys = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("pk"))
    val counters = graft.operators.SketchOps.cmsCounters(keys, "pk")
    val top = keys.groupBy("pk").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("pk").asc).limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("exact").desc, col("pk").asc)).cast("long"))
    val want = graft.operators.SketchOps.cmsEstimate(counters, top, "pk")
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("pk"),
        r.getAs[Long]("exact"), r.getAs[Long]("est"))).toSet
    assert(got == want && got.size == 10)
    // one-sided error survives the streaming path
    got.foreach { case (_, pk, exact, est) =>
      assert(est >= exact, s"stream CMS under-counted key $pk") }
  }

  test("streamShardExport composes bucket-local cumsums to the batch cut") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val got = StreamingOps.streamShardExport(spark, s"$dir/documents.parquet",
        splits = 4, queryName = "graft_test_shards",
        diagnostics = Some(batches))
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("content_md5"))).toSet
    assert(batches.length >= 2,
      s"bucketed source must yield several micro-batches, got $batches")
    // offset + local decomposition: the streamed cut must equal the
    // batch assignShards over doc_id order, regardless of arrival order
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.operators.TextOps.tokenCount(col("text")).as("tok"))
    val want = graft.sinks.ShardExport.manifest(
        graft.sinks.ShardExport.assignShards(docs, "doc_id", "tok", 4096L),
        "doc_id", "doc_id", "tok")
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("content_md5"))).toSet
    assert(got == want && got.nonEmpty)
  }
}
