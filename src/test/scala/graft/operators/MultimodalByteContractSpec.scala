package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Non-ASCII byte-contract fixture (VERDICT r16 #3): every Multimodal
  * operator works in BYTES of the UTF-8 payload — positions, strides,
  * lengths, digests. On ASCII text bytes == chars and a char-based
  * mirror accidentally agrees; these fixtures use text where they
  * DIVERGE (é = 2 bytes, 中 = 3 bytes) and pin the byte semantics
  * against hand-computed UTF-8 byte slices. The catalog oracles mirror
  * the same semantics by slicing hex(encode(text)) — 2 hex chars = 1
  * byte (see the mm02/mm04/mm11/mm12 oracle SQL); the cross-engine
  * agreement itself is checked by the augmented-corpus oracle run
  * recorded in BASELINE.md.
  */
class MultimodalByteContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-byte and 3-byte chars interleaved with ASCII: 16 chars, 24 bytes
  private val mixed = "héllo wörld 中文深学" // h é l l o ␠ w ö r l d ␠ 中 文 深 学
  private val mixedBytes = mixed.getBytes("UTF-8")
  private def hexOf(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  test("fixture really is non-ASCII: byte length != char length") {
    assert(mixed.length == 16 && mixedBytes.length == 26)
  }

  test("withBinaryPayload + payloadMeta: byte_len counts UTF-8 bytes, md5 hashes them") {
    val df = MultimodalOps.payloadMeta(MultimodalOps.withBinaryPayload(
      Seq((1L, mixed)).toDF("doc_id", "text"), "text"))
    val r = df.select("byte_len", "content_md5").as[(Int, String)].head()
    assert(r._1 == mixedBytes.length, "byte_len must be bytes, not chars (16)")
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(mixedBytes).map("%02x".format(_)).mkString
    assert(r._2 == want)
  }

  test("frameSample: frames are byte windows at byte strides, splitting multi-byte chars") {
    // frameLen 5, stride 4 over 24 bytes: positions 1,5,9,13,17 (and a
    // truncated run from 21..? — sequence stops at 24-4=20) — frame at
    // byte 1 is "héll"'s first 5 BYTES = h,0xC3,0xA9,l,l (splits é? no —
    // é is bytes 2-3; 5 bytes = h é l l). Position 5 starts INSIDE no
    // char here, but position 9 starts mid-"ö". Byte semantics means
    // the frame content equals the raw byte slice regardless.
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, mixed)).toDF("doc_id", "text"), "text")
    val got = MultimodalOps.frameSample(df, "payload", "doc_id",
        frameLen = 5, stride = 4)
      .select(col("frame_idx"), col("frame_len"), hex(col("frame")).as("fx"))
      .orderBy("frame_idx").as[(Int, Int, String)].collect()
    val n = mixedBytes.length // 26 — char math (16) would cut the series short
    val starts = 1 to (n - 4) by 4 // 1,5,9,13,17,21
    assert(got.length == starts.size)
    got.zip(starts).foreach { case ((_, flen, fx), p) =>
      val slice = mixedBytes.slice(p - 1, math.min(p - 1 + 5, n))
      assert(flen == slice.length)
      assert(fx == hexOf(slice), s"frame at byte $p")
    }
  }

  test("resampleBytes: picks at BYTE stride from BYTE length") {
    // 26 bytes, target 8 → stride (26+7) div 8 = 4 (char math would say
    // (16+7) div 8 = 2): picks bytes 1,5,9,...,25 = 7 bytes
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, mixed)).toDF("doc_id", "text"), "text")
    val got = MultimodalOps.resampleBytes(df, "payload", "doc_id", target = 8)
      .select(col("thumb_len"), hex(col("thumb")).as("tx"))
      .as[(Int, String)].head()
    val n = mixedBytes.length
    val stride = (n + 7) / 8
    val picks = (1 to n by stride).map(p => mixedBytes(p - 1)).toArray
    assert(got._1 == picks.length && got._2 == hexOf(picks))
  }

  test("patchGrid: tiles are 2-D BYTE slices; grid sizes from byte width/height") {
    // 26-byte payload, width 8 → height 3 < patch 8 under BYTE math
    // (char math would give height 2 from 16 chars): no complete tile
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, mixed)).toDF("doc_id", "text"), "text")
    assert(MultimodalOps.patchGrid(df, "payload", "doc_id",
      width = lit(8), patch = 8, maxGrid = 4).count() == 0L)
    // 8 copies → 208 bytes, width 8 → height 26 → 1×1 grid (maxGrid'd):
    // tile rows are byte rows of the CONCATENATED utf-8 stream
    val big = mixed * 8
    val bigBytes = big.getBytes("UTF-8")
    val df8 = MultimodalOps.withBinaryPayload(
      Seq((1L, big)).toDF("doc_id", "text"), "text")
    val tiles = MultimodalOps.patchGrid(df8, "payload", "doc_id",
        width = lit(8), patch = 8, maxGrid = 1)
      .select(col("pr"), col("pc"), col("tile_len"), hex(col("tile")).as("tx"))
      .as[(Int, Int, Int, String)].collect()
    val want = hexOf((0 until 8).flatMap(dy =>
      bigBytes.slice(dy * 8, dy * 8 + 8)).toArray)
    assert(tiles.toSeq == Seq((0, 0, 64, want)))
  }

  test("batchScore: stub dot runs over BYTES with byte-position weights") {
    val df = MultimodalOps.withBinaryPayload(
      Seq((1L, mixed)).toDF("doc_id", "text"), "text")
    val got = MultimodalOps.batchScore(df, "payload", "doc_id")
      .select("score").as[Long].head()
    val w = Array(3L, 1L, 4L, 1L)
    val want = mixedBytes.zipWithIndex
      .map { case (b, i) => (b & 0xff).toLong * w(i % 4) }.sum
    assert(got == want, "score must weight by BYTE index over byte values")
  }
}
