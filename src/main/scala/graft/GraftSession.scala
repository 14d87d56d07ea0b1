package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes.
  *
  * Design notes (100 TB target):
  *  - AQE on: runtime re-planning (skew-join splitting, dynamic shuffle
  *    partition coalescing) is the main defence against skew at scale.
  *  - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *    on a real cluster this is overridden to ~2-3x total executor cores
  *    (AQE coalesces down, so over-provisioning is cheap).
  *  - UTC session timezone: deterministic timestamp semantics across
  *    engines (the DuckDB oracle compares naive-UTC values).
  */
object GraftSession {

  /** Initial shuffle-partition count for a given input size — the
    * engine-wide promotion of the round-17 dd20 lesson (VERDICT r17 #3):
    * at 4 shuffle partitions a 10× corpus ran its widest verification
    * join in 4 oversized spilling partitions, reading 1.6–1.8× slower
    * than the same plan with AQE `initialPartitionNum = 64` on the same
    * cores. The deployment-correct policy is initial partitions
    * PROPORTIONAL TO INPUT BYTES, floored at the core count so every
    * core has work, with AQE coalescing everything smaller back down.
    *
    * The bytes term divides by 2 MB of COMPRESSED input per initial
    * partition, not the 128 MB parquet split heuristic, because the
    * inputs are compressed columnar text and the shuffled intermediates
    * are their EXPANSIONS: dd20's verification join materializes 185M
    * rows from a 17.5 MB input (sf0.1) — 10–50× file bytes in flight.
    * One initial partition per 2 MB compressed targets ~64 MB of
    * post-expansion shuffle data per partition at the measured ~30×
    * mid-band, and reproduces the committed decade-corpus fix (175 MB
    * sf1 dir → 88 initial partitions ≥ the 64 that recovered dd20's
    * 1.6–1.8× cliff) without a flat floor.
    *
    * Round-18 A/B (this round, alternating fresh JVMs, local[32],
    * sf0.1): the previous max(2×cores, 64) floor cost 27–50% on
    * dp19/dd28/tx36 vs `cores` initial partitions (dp19 4.4→8.0–9.6 s,
    * dd28 4.0→5.7–6.0 s, tx36 6.3→7.9–8.1 s) — over-provisioning is NOT
    * free at small per-stage data even under AQE coalescing, so the
    * floor is the core count and the headroom lives in the bytes term
    * where it scales with the data instead of taxing every small stage.
    */
  def initialPartitions(cores: Int, inputBytes: Long): Int = {
    val byBytes = (inputBytes + (2L << 20) - 1) / (2L << 20)
    // cap at 1M to bound scheduler metadata: at the cap each initial
    // partition holds ≥ 2 MB compressed (≈ 100 MB+ expanded) — past
    // that, PB-scale single queries shard by pipeline stage instead
    math.max(cores.toLong, byBytes).min(1000000L).toInt
  }

  /** Fastest available scratch directory for shuffle files and
    * DISK_ONLY blocks (`spark.local.dir`) — round-18 finding: with the
    * default /tmp (ext4 on a virtual disk) thread dumps of a loaded
    * local[32] bench showed 19 of 32 executor threads BLOCKED in
    * `IndexShuffleBlockResolver.writeMetadataFileAndCommit` and 8 more
    * in `FileOutputStream.open` — shuffle-commit file I/O, not compute,
    * bounded the box (cpu_share 84–350‰ across the heavy queries).
    * Pointing spark.local.dir at tmpfs removed the lock (tx36 task time
    * 89 s → 34 s, wall 6.3 → 4.1–5.2 s; dp19/dp32/dd28/dp25 −20–30%).
    *
    * This mirrors what a production cluster does with NVMe-local
    * shuffle dirs — the shuffle scratch space must be the fastest local
    * medium, and on this sandbox that is RAM-backed /dev/shm (126 GB —
    * bench-scale shuffle + DISK_ONLY footprints are ≤ a few GB; a real
    * deployment sets spark.local.dir to its fast disks explicitly and
    * this default never applies under spark-submit). Override with
    * SPARK_GRAFT_LOCAL_DIR; empty value disables the tmpfs default.
    */
  def scratchDir: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").map(_.trim) match {
      case Some("") => None // explicit opt-out: Spark's own default
      case Some(d)  => Some(d)
      case None =>
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm)
            && java.nio.file.Files.isWritable(shm))
          Some("/dev/shm/graft-spark-local")
        else None
    }

  /** Engine-wide shuffle-machinery defaults, applied by every session
    * builder (they are core SparkConf values, only readable at context
    * creation):
    *
    *  - [[scratchDir]] → `spark.local.dir` (no-op when unset or when a
    *    cluster manager already owns local dirs).
    *  - `spark.shuffle.sort.bypassMergeThreshold=0`: always use the
    *    sort-based shuffle writer, never the bypass-merge writer. The
    *    bypass writer creates one file PER REDUCER per map task and
    *    then concatenates them (`copyFileStreamNIO`/`transferTo` +
    *    mmap/unmap per file) — round-18 thread dumps caught 29 of 32
    *    executor threads in that concat (munmap serializes on the
    *    process mmap lock), and disabling it read dd27 wall 4.6–4.8 →
    *    3.3–3.4 s with task time halved (93–100 s → 48–57 s), −5–9%
    *    across the heavy-8 subset in alternating A/B. The sort writer
    *    emits ONE file per map task regardless of reducer count — at
    *    scale that is M files instead of M×R, the §2.2 shuffle-block
    *    quadratic attacked at the file-create level, so the setting is
    *    strictly better for this engine's many-small-stage shape at
    *    every scale (map-side aggregation already bypasses the bypass
    *    writer anyway).
    */
  def withEngineDefaults(b: SparkSession.Builder): SparkSession.Builder = {
    val withScratch = scratchDir.fold(b)(d => b.config("spark.local.dir", d))
    withScratch.config("spark.shuffle.sort.bypassMergeThreshold", "0")
  }

  /** Total bytes under `path` (recursive) — the input-size probe feeding
    * [[initialPartitions]]. Cheap: a file-metadata walk, no reads.
    */
  def dirBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isDirectory(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      inputBytes: Long = 0L): SparkSession = {
    val spark = withEngineDefaults(SparkSession
      .builder())
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions(cores, inputBytes).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
