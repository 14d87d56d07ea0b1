package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ORC interop: the engine's tables survive a parquet -> ORC -> read
  * round trip bit-exactly, and ORC scans keep the same scan-level
  * optimizations the parquet path is audited for (predicate pushdown).
  * A user switching warehouse formats keeps both correctness and the
  * scan characteristics.
  */
class OrcInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Order-insensitive content fingerprint over every column (bit_xor:
    * associative, commutative, and overflow-free under ANSI mode).
    */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): Long = {
    val asStrings = df.columns.sorted.map(c => col(c).cast("string"))
    df.select(xxhash64(asStrings: _*).as("h"))
      .agg(bit_xor(col("h"))).collect()(0).getLong(0)
  }

  test("lineitem round-trips parquet -> ORC -> read with identical content") {
    val out = Files.createTempDirectory("graft_orc").toString
    val src = Tables.table(spark, sfDir, "lineitem")
    src.write.format("orc").mode("overwrite").save(out)
    val back = spark.read.format("orc").load(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(fingerprint(back) == fingerprint(src))
  }

  test("ORC scans push filters down like the audited parquet path") {
    val out = Files.createTempDirectory("graft_orc_pd").toString
    Tables.table(spark, sfDir, "orders")
      .write.format("orc").mode("overwrite").save(out)
    val q = spark.read.format("orc").load(out)
      .where(col("o_orderkey") <= 100 && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan)
    // projection pruning: the scan reads only the touched columns
    assert(plan.contains("ReadSchema") && !plan.contains("o_comment"), plan)
    q.collect() // executes without error end-to-end
  }
}
