package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[PrefixSumOps.exclusiveRunningSum]] must equal the single-window
  * running sum for ANY bucket width — the bucketed decomposition argument
  * (offset of a row = earlier buckets' total + earlier rows in its own
  * bucket) made executable, including widths that degenerate to one row
  * per bucket (1) and one bucket per group (10^6).
  */
class PrefixSumOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 3 groups x 400 rows; sparse, irregular order keys (gaps, not aligned
  // to bucket boundaries) and values with many zeros
  private lazy val df = {
    import spark.implicits._
    (0 until 1200).map { i =>
      (s"g${i % 3}", i.toLong * 7 + (i % 5), math.abs((i * 2654435761L) % 13) - 3)
    }.toDF("g", "ord", "v")
  }

  private lazy val expected = {
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("v").over(w) - col("v"))
      .select("g", "ord", "cum").collect().toSet
  }

  test("matches the single-window form for bucketRows in {1, 3, 256, 1000000}") {
    for (b <- Seq(1L, 3L, 256L, 1000000L)) {
      val got = PrefixSumOps.exclusiveRunningSum(df, Seq("g"), "ord", "v",
          outCol = "cum", bucketRows = b)
        .select("g", "ord", "cum").collect().toSet
      assert(got == expected, s"diverged from the single window at bucketRows=$b")
    }
  }

  test("passes input columns through and appends only outCol") {
    val out = PrefixSumOps.exclusiveRunningSum(df, Seq("g"), "ord", "v",
      outCol = "cum", bucketRows = 64)
    assert(out.columns.toSet == Set("g", "ord", "v", "cum"))
    assert(out.count() == df.count())
  }
}
