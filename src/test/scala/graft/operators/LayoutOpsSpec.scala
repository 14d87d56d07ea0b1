package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue2 interleaves bits (known values)") {
    // x=0b11, y=0b01 -> z bits: x0@0, y0@1, x1@2, y1@3 = 0b0111 = 7
    val got = spark.range(1)
      .select(LayoutOps.zValue2(lit(3), lit(1), 4).as("z"))
      .as[Long].head()
    assert(got == 7L)
    // locality: close (x,y) points get close z values
    val z1 = spark.range(1).select(LayoutOps.zValue2(lit(100), lit(200), 16)).as[Long].head()
    val z2 = spark.range(1).select(LayoutOps.zValue2(lit(101), lit(200), 16)).as[Long].head()
    assert(math.abs(z1 - z2) < 1000)
  }

  test("z-ordered layout narrows per-file ranges on BOTH columns") {
    // a grid where x and y are independent: a plain x-sort gives perfect
    // x-ranges but full-width y-ranges; the z-order must narrow both
    val n = 1 << 12
    val grid = spark.range(n).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    val base = Files.createTempDirectory("graft_zorder").toString
    LayoutOps.writeZOrdered(grid, s"$base/z", "x", "y", numFiles = 16)
    grid.orderBy("x").coalesce(1).sortWithinPartitions("x")
      .write.parquet(s"$base/xsort")
    // re-split the x-sorted table into the same number of files
    spark.read.parquet(s"$base/xsort").repartitionByRange(16, col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$base/xsort16")

    def sumRange(path: String, c: String): Long =
      LayoutOps.perFileRange(spark.read.parquet(path), c)
        .agg(sum("range_width")).head().getLong(0)

    val zX = sumRange(s"$base/z", "x"); val zY = sumRange(s"$base/z", "y")
    val sX = sumRange(s"$base/xsort16", "x"); val sY = sumRange(s"$base/xsort16", "y")
    // the single-column sort is near-perfect on x but near-useless on y;
    // z-order stays narrow on BOTH (the multi-column pruning property)
    assert(zY < sY / 2, s"z y-range $zY should be well under x-sorted $sY")
    assert(zX + zY < sX + sY, s"total z range ${zX + zY} vs sorted ${sX + sY}")
  }

  test("bloomPrefilter never yields a false negative and flags true dups") {
    val hist = (1 to 200).map(i => (i.toLong, s"history doc number $i"))
      .toDF("doc_id", "text")
    // batch: 50 true dups of history + 50 genuinely new docs
    val batch = ((1 to 50).map(i => (1000L + i, s"history doc number $i")) ++
      (1 to 50).map(i => (2000L + i, s"fresh unseen doc $i")))
      .toDF("doc_id", "text")
    val got = DedupOps.bloomPrefilter(hist, batch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.length == 100)
    // Bloom contract: every actual duplicate is flagged maybe_dup
    assert(got.filter(_._3).forall(_._2))
    assert(got.count(_._3) == 50)
    // and the filter is useful: most genuinely-new docs pass as new
    val falsePos = got.count(g => g._2 && !g._3)
    assert(falsePos < 25, s"false positives $falsePos out of 50 new docs")
  }

  test("bloomPrefilter semantics match Spark's native bloom sketch") {
    // the production form of the same gate is df.stat.bloomFilter +
    // mightContain (Spark's util.sketch.BloomFilter); both must honor
    // the identical contract: zero false negatives on actual duplicates
    val hist = (1 to 300).map(i => s"native parity doc $i").toDF("text")
    val batchTexts = (250 to 350).map(i => s"native parity doc $i")
    val native = hist.stat.bloomFilter("text", 300L, 0.03)
    val inHist = (250 to 300).map(i => s"native parity doc $i").toSet
    batchTexts.foreach { t =>
      if (inHist(t)) assert(native.mightContain(t), s"native false negative: $t")
    }
    // and our md5 variant agrees on those same actual duplicates
    val batch = batchTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ours = DedupOps.bloomPrefilter(
        hist.withColumn("doc_id", lit(0L)), batch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(ours.filter(_._3).forall(_._2))
  }
}
