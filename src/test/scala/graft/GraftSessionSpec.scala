package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-wide size-scaled initial-partition policy
  * (VERDICT r17 #3 — the round-17 dd20 under-partitioning lesson
  * promoted from a bench-section override to a GraftSession default).
  * The contract: no input is ever planned with fewer initial shuffle
  * partitions than its bytes / 128 MB would dictate, and small inputs
  * keep a max(2×cores, 64) parallelism floor for AQE to coalesce FROM.
  */
class GraftSessionSpec extends AnyFunSuite {

  private val MB128 = 128L << 20

  test("floor: small inputs get max(2*cores, 64) initial partitions") {
    assert(GraftSession.initialPartitions(4, 0L) == 64)
    assert(GraftSession.initialPartitions(32, 0L) == 64)
    assert(GraftSession.initialPartitions(48, 0L) == 96)
    // the floor holds for any input below 64 * 128 MB
    assert(GraftSession.initialPartitions(4, 63 * MB128) == 64)
  }

  test("scale: never fewer initial partitions than inputBytes / 128 MB") {
    // a 100 GB input dictates ceil(100 GiB / 128 MiB) = 800 partitions
    assert(GraftSession.initialPartitions(4, 100L << 30) == 800)
    // 100 TB -> 819200: the policy holds at the design target
    assert(GraftSession.initialPartitions(4, 100L << 40) == 819200)
    // partial trailing block rounds UP (ceil, not div)
    assert(GraftSession.initialPartitions(4, 64 * MB128 + 1) == 65)
    // monotone in bytes across the floor boundary
    val seq = Seq(0L, MB128, 64 * MB128, 65 * MB128, 1L << 40)
      .map(GraftSession.initialPartitions(4, _))
    assert(seq == seq.sorted)
  }

  test("heavy-list invariant: the bench sf1 probe scales never run " +
      "under-partitioned vs the bytes/128MB dictate") {
    // the exact derivation graft.Bench's timed() and Sf1Probe apply per
    // scale dir — for every dir size and core count the policy may be
    // invoked with, the dictate holds
    for (cores <- Seq(4, 32); bytes <- Seq(0L, 200L << 20, 2L << 30, 2L << 40)) {
      val p = GraftSession.initialPartitions(cores, bytes)
      assert(p >= ((bytes + MB128 - 1) / MB128),
        s"cores=$cores bytes=$bytes under-partitioned: $p")
      assert(p >= math.max(2 * cores, 64))
    }
  }

  test("dirBytes sums regular files recursively; missing dir is 0") {
    val d = java.nio.file.Files.createTempDirectory("graftsess")
    java.nio.file.Files.write(d.resolve("a.bin"), new Array[Byte](1000))
    val sub = java.nio.file.Files.createDirectories(d.resolve("sub"))
    java.nio.file.Files.write(sub.resolve("b.bin"), new Array[Byte](234))
    assert(GraftSession.dirBytes(d.toString) == 1234L)
    assert(GraftSession.dirBytes(d.resolve("nope").toString) == 0L)
  }

  test("GraftSession.local wires the derived value into the session conf") {
    // getOrCreate against the shared test session still APPLIES builder
    // SQL confs to it — assert the wiring, then restore the suite conf
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val s = TestSpark.spark
    val before = s.conf.getOption(key)
    try {
      val applied = GraftSession.local(cores = 4, inputBytes = 100L << 30)
      assert(applied.conf.get(key) == "800")
    } finally {
      before match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }
}
