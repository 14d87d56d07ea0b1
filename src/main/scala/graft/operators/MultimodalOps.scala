package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed partition-parallel.
  *
  * The real decode libraries (image/audio codecs) are not present in this
  * environment, so `decodeStub` is a clearly-marked deterministic fake —
  * but everything Spark-side is real and load-bearing: BinaryType schema,
  * batch shape (`mapPartitions` over iterators, never a driver collect),
  * and metadata extraction that stays inside codegen where possible.
  *
  * At 100 TB: binary payloads ride in Parquet binary columns; decode is a
  * narrow per-partition map (no shuffle); only the extracted small
  * metadata/features ever enter a wide stage.
  *
  * Byte-vs-char contract (VERDICT r16 #3): every operator here works in
  * BYTES of the binary payload — positions, lengths, strides, digests.
  * Non-ASCII text therefore diverges from any character-based mirror
  * (one char can be 2–4 payload bytes). Catalog oracles honour this by
  * slicing the payload's hex encoding (2 hex chars = 1 byte, byte-exact
  * for arbitrary UTF-8 in both engines) and comparing sliced content as
  * uppercase hex; whole-payload md5s stay portable as-is because
  * DuckDB's md5(VARCHAR) hashes the string's UTF-8 bytes — exactly this
  * payload. MultimodalOpsSpec pins the byte semantics on a non-ASCII
  * fixture.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true)
  ))

  /** Attach a binary payload column derived from a string column —
    * stand-in for reading real media bytes; encoding is exact and
    * engine-portable (UTF-8).
    */
  def withBinaryPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Codegen-level metadata over the payload: byte length + content hash.
    * This is the "cheap pass" that should run at scan speed.
    */
  def payloadMeta(df: DataFrame): DataFrame =
    df.withColumn("byte_len", length(col("payload")))
      .withColumn("content_md5", md5(col("payload")))

  /** Frame sampling over binary payloads: fixed-length byte frames at a
    * stride (the video-frame / audio-window access pattern), all in
    * codegen'd expressions — `sequence` positions, binary `substr`
    * slices, `posexplode`. Short payloads yield one truncated frame.
    * Narrow op: frames explode within the partition, no shuffle.
    */
  def frameSample(df: DataFrame, payloadCol: String, idCol: String,
      frameLen: Int, stride: Int): DataFrame =
    df.select(col(idCol), col(payloadCol))
      .withColumn("_pos", sequence(lit(1),
        greatest(length(col(payloadCol)) - (frameLen - 1), lit(1)), lit(stride)))
      .select(col(idCol), posexplode(transform(col("_pos"),
        i => col(payloadCol).substr(i, lit(frameLen)))).as(Seq("frame_idx", "frame")))
      .withColumn("frame_len", length(col("frame")))
      .withColumn("frame_md5", md5(col("frame")))

  /** Resize/downsample analog over binary payloads: pick `target` evenly
    * strided bytes (the thumbnail / audio-decimation access pattern) —
    * codegen'd `sequence` + `substr`, narrow, no shuffle. A real media
    * resize would swap the byte picker for a codec call inside the same
    * plumbing.
    */
  def resampleBytes(df: DataFrame, payloadCol: String, idCol: String,
      target: Int): DataFrame = {
    // upper bound clamped to >=1: Spark's sequence(1, 0, +step) throws,
    // and an empty payload should yield an empty thumb, not an error
    val n = greatest(length(col(payloadCol)), lit(1))
    val stride = greatest(expr(s"(length($payloadCol) + ${target - 1}) div $target"), lit(1))
    df.select(col(idCol), col(payloadCol))
      .withColumn("thumb",
        aggregate(
          transform(sequence(lit(1), n, stride), i => col(payloadCol).substr(i, lit(1))),
          lit(Array.emptyByteArray), (acc, x) => concat(acc, x)))
      .withColumn("thumb_len", length(col("thumb")))
      .withColumn("thumb_md5", md5(col("thumb")))
      .drop(payloadCol)
  }

  /** 2-D patch/tile extraction (the ViT patch-embedding access pattern):
    * interpret the payload as a row-major `width`-byte-wide image and
    * cut `patch`×`patch` tiles — each tile the concatenation of `patch`
    * row slices, so tiles are genuinely 2-D (non-contiguous bytes), not
    * frame windows (mm02's 1-D pattern). Height is the number of
    * complete rows; only complete tiles are emitted, and the emitted
    * grid is capped at `maxGrid`×`maxGrid` tiles per payload (the
    * bounded-probe convention — a real patch embedder consumes every
    * tile, but a CATALOG query's output must stay bounded per doc).
    *
    * All codegen'd HOFs: the (pr, pc) grid is a fixed
    * `sequence(0, maxGrid−1)` FILTERED by the per-doc tile counts
    * (never `sequence(0, n−1)` with possibly-negative n — Spark's
    * sequence DESCENDS there where DuckDB's generate_series is empty),
    * and each tile body is an `aggregate` over its `patch` row slices
    * concatenating binary `substr`s. Narrow, no shuffle, no UDF; a real
    * decoder would swap byte rows for decoded pixel rows inside the
    * same plumbing (the decodeStub stance).
    */
  def patchGrid(df: DataFrame, payloadCol: String, idCol: String,
      width: Column, patch: Int, maxGrid: Int): DataFrame =
    df.select(col(idCol), col(payloadCol).as("_pl"), width.as("_w"))
      .withColumn("_h", expr("length(_pl) div _w"))
      .withColumn("pg", expr(
        s"""filter(flatten(transform(sequence(0, ${maxGrid - 1}), pr ->
              transform(sequence(0, ${maxGrid - 1}), pc ->
                named_struct('pr', pr, 'pc', pc)))),
              g -> g.pr < _h div $patch AND g.pc < _w div $patch)"""))
      .select(col(idCol), col("_pl"), col("_w"), col("_h"),
        explode(col("pg")).as("g"))
      .withColumn("tile", expr(
        s"""aggregate(sequence(0, ${patch - 1}), cast('' as binary),
              (acc, dy) -> concat(acc, substring(_pl,
                (g.pr * $patch + dy) * _w + g.pc * $patch + 1, $patch)))"""))
      .select(col(idCol), col("_w").as("width"), col("_h").as("height"),
        col("g.pr").as("pr"), col("g.pc").as("pc"), col("tile"),
        length(col("tile")).as("tile_len"), md5(col("tile")).as("tile_md5"))

  /** Average-hash perceptual signature (aHash — the classic
    * perceptual-hash family member: pHash swaps the downsample for a
    * DCT, the pipeline is identical) over a binary payload: downsample
    * to ≤ 64 evenly strided bytes (the mm04 thumbnail pattern), then
    * bit j = 1 iff byte_j is above the thumbnail mean. Near-identical
    * media produce signatures within a few bits — the standard
    * image-dedup key. The mean test is the integer cross-multiplication
    * `v_j · n > Σv` (no float division), so the signature is exact and
    * engine-portable.
    *
    * All codegen'd expressions over staged columns (`substr` on binary →
    * one-byte slices, `hex`+`conv` byte values, `transform`/`aggregate`
    * bit pack) — narrow, no shuffle, no UDF. A real image aHash would
    * swap the byte picker for decoded-pixel luma inside the same
    * plumbing (the decodeStub stance).
    *
    * Empty payloads have no signature and are absent from the output.
    *
    * @return [idCol, phash] — phash a packed 64-bit signature
    */
  def perceptualHash64(df: DataFrame, payloadCol: String,
      idCol: String): DataFrame =
    df.where(length(col(payloadCol)) > 0)
      .select(col(idCol),
        expr(s"transform(sequence(1, length($payloadCol), " +
          s"greatest((length($payloadCol) + 63) div 64, 1)), " +
          s"i -> cast(conv(hex(substring($payloadCol, i, 1)), 16, 10) as bigint))")
          .as("_picks"))
      // staged: _picks referenced 3x below must be a materialized column,
      // not an inlined tree (re-evaluation pitfall — see verify gotchas)
      .select(col(idCol), col("_picks"), size(col("_picks")).as("_n"),
        expr("aggregate(_picks, 0L, (a, x) -> a + x)").as("_sum"))
      .select(col(idCol),
        expr("cast(aggregate(transform(sequence(1, _n), " +
          "j -> IF(element_at(_picks, j) * _n > _sum, shiftleft(1L, j - 1), 0L)), " +
          "0L, (a, x) -> a + x) as bigint)").as("phash"))

  /** Scene-cut segmentation — the video-side structural analysis every
    * multimodal curation pipeline runs before frame-level dedup or
    * captioning: sample frames ([[frameSample]]'s stride windows),
    * signature each frame with the [[perceptualHash64]] aHash applied
    * frame-wise, and cut wherever consecutive signatures differ by more
    * than `threshold` Hamming bits. Segments are the runs between cuts:
    * a running sum over the per-doc cut indicators (cuts partition the
    * frame sequence, so segment id = #cuts at-or-before the frame).
    *
    * Scale shape: one narrow codegen'd pass for frames + signatures (no
    * shuffle), then ONE window partitioned by document — frames per doc
    * are bounded by payload length / stride, so no partition is ever
    * corpus-sized (the per-doc analogue of tx09's repetition windows).
    * Zero-length frames (empty payloads) are dropped — they have no
    * signature, matching [[perceptualHash64]]'s empty-payload contract.
    *
    * @return [idCol, seg, start_frame, end_frame, n_frames], one row
    *         per (document, segment)
    */
  def sceneCuts(df: DataFrame, payloadCol: String, idCol: String,
      frameLen: Int, stride: Int, threshold: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = frameSample(df, payloadCol, idCol, frameLen, stride)
      .where(length(col("frame")) > 0)
      .select(col(idCol), col("frame_idx"), col("frame"))
    // staged like perceptualHash64: _picks / _n / _sum are materialized
    // columns, never inlined trees (the re-evaluation pitfall)
    val hashed = frames
      .withColumn("_picks", expr(
        "transform(sequence(1, length(frame), " +
          "greatest((length(frame) + 63) div 64, 1)), " +
          "i -> cast(conv(hex(substring(frame, i, 1)), 16, 10) as bigint))"))
      .select(col(idCol), col("frame_idx"), col("_picks"),
        size(col("_picks")).as("_n"),
        expr("aggregate(_picks, 0L, (a, x) -> a + x)").as("_sum"))
      .select(col(idCol), col("frame_idx"),
        expr("cast(aggregate(transform(sequence(1, _n), " +
          "j -> IF(element_at(_picks, j) * _n > _sum, shiftleft(1L, j - 1), 0L)), " +
          "0L, (a, x) -> a + x) as bigint)").as("fhash"))
    val w = Window.partitionBy(idCol).orderBy("frame_idx")
    hashed
      .withColumn("_prev", lag(col("fhash"), 1).over(w))
      .withColumn("_cut", when(col("_prev").isNull, lit(0))
        .otherwise((DedupOps.hamming64(col("fhash"), col("_prev")) > threshold)
          .cast("int")))
      .withColumn("seg", sum(col("_cut"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("seg"))
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** Energy-gated segmentation — the audio-side structural analysis
    * (VAD-style utterance splitting) that speech-data curation runs
    * before transcription: frame the payload into NON-overlapping
    * windows ([[frameSample]] with stride = frame length), score each
    * frame's energy as its byte-value sum, gate frames at a mean-energy
    * threshold (`Σbytes > threshold · n` — integer cross-multiplied, no
    * float division), and report each maximal run of consecutive voiced
    * frames at least `minFrames` long. The complementary shape to
    * [[sceneCuts]]: an ABSOLUTE per-frame gate with islands-and-gaps
    * run grouping, vs scene-cuts' adjacent-difference cuts with a
    * running cut count — the two standard segmenters a media pipeline
    * pairs. A real VAD would swap the byte sum for decoded-sample RMS
    * inside the same plumbing (the decodeStub stance).
    *
    * Scale shape: one narrow codegen'd pass for frames + energies, then
    * per-doc windows over frame rows (bounded by payload length / frame
    * length, never corpus-sized). Empty frames are dropped.
    *
    * @return [idCol, seg, start_frame, end_frame, n_frames, energy] —
    *         seg numbers a doc's surviving segments from 1 in frame
    *         order
    */
  def energySegments(df: DataFrame, payloadCol: String, idCol: String,
      frameLen: Int, threshold: Int, minFrames: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = frameSample(df, payloadCol, idCol, frameLen, frameLen)
      .where(length(col("frame")) > 0)
      .select(col(idCol), col("frame_idx"), col("frame"))
    // staged like perceptualHash64: _picks materialized, never inlined
    val energy = frames
      .withColumn("_picks", expr(
        "transform(sequence(1, length(frame)), " +
          "i -> cast(conv(hex(substring(frame, i, 1)), 16, 10) as bigint))"))
      .select(col(idCol), col("frame_idx"),
        expr("aggregate(_picks, 0L, (a, x) -> a + x)").as("_sum"),
        size(col("_picks")).as("_n"))
      .where(col("_sum") > col("_n").cast("long") * threshold)
    val w = Window.partitionBy(idCol).orderBy("frame_idx")
    energy
      .withColumn("_island", col("frame_idx") - row_number().over(w))
      .groupBy(col(idCol), col("_island"))
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum("_sum").as("energy"))
      .where(col("n_frames") >= minFrames)
      .withColumn("seg", row_number()
        .over(Window.partitionBy(idCol).orderBy("start_frame")))
      .select(col(idCol), col("seg"), col("start_frame"), col("end_frame"),
        col("n_frames"), col("energy"))
  }

  /** STUB — deterministic fake media decode. A real implementation would
    * decode image dimensions / audio duration from the payload bytes
    * here; the container has no codec libs, so dimensions are derived
    * from the byte length (stable, testable plumbing).
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = if (payload == null) 0 else payload.length
    (64 + n % 577, 64 + (n * 31) % 419)
  }

  /** STUB model — deterministic integer "inference" over payload bytes
    * (dot with a tiny cyclic weight vector). A real model would run a
    * forward pass here; the arithmetic is integer-exact so the oracle
    * can mirror it byte for byte.
    */
  private val scoreWeights = Array(3L, 1L, 4L, 1L)
  def scoreStub(payload: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < payload.length) {
      s += (payload(i) & 0xff).toLong * scoreWeights(i % scoreWeights.length)
      i += 1
    }
    s
  }

  /** Batched model scoring — the inference-serving shape of a training-
    * data pipeline: one model instantiation PER PARTITION (the expensive
    * load a real model has; `modelLoads` lets a spec assert loads ==
    * partitions, not rows), payloads fed through the model in fixed-size
    * micro-batches (`grouped(batchSize)` — where a real scorer would
    * stack a tensor batch), and only the small (id, score) rows leave
    * the partition. Narrow op: no shuffle, memory bounded by one batch.
    */
  def batchScore(df: DataFrame, payloadCol: String, idCol: String,
      batchSize: Int = 32,
      modelLoads: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("score", LongType, nullable = false)
    ))
    val rdd = df.select(col(idCol).cast("long"), col(payloadCol))
      .rdd.mapPartitions { it =>
        modelLoads.foreach(_.add(1)) // the once-per-task model load
        it.grouped(batchSize).flatMap { batch =>
          // a real model would score the whole stacked batch here
          batch.map(r => Row(r.getLong(0), scoreStub(r.getAs[Array[Byte]](1))))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Partition-parallel "decode": mapPartitions over payload batches,
    * one decoder instance per partition (the shape a JNI codec needs).
    */
  def decodeDimensions(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)
    ))
    val rdd = df.select(col(idCol).cast("long"), col("payload")).rdd.mapPartitions { it =>
      // per-partition decoder init would go here (one per task, reused)
      it.map { r =>
        val (w, h) = decodeStub(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
