package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Text-format interop: the library's relational surface must ingest the
  * formats a reference user's upstream systems emit (CSV exports, JSON
  * event feeds), not just parquet — round-trip fidelity against the
  * parquet-sourced table plus schema handling on the lossy formats.
  */
class CsvJsonInteropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("CSV round-trip: header + explicit schema preserves content") {
    val base = Files.createTempDirectory("graft_csv").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.write.option("header", "true").csv(s"$base/nation_csv")
    val back = spark.read.option("header", "true").schema(nation.schema)
      .csv(s"$base/nation_csv")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON lines round-trip preserves content and types under schema") {
    val base = Files.createTempDirectory("graft_json").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.json(s"$base/region_json")
    val back = spark.read.schema(region.schema).json(s"$base/region_json")
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("malformed JSON rows land in the corrupt-record column, not a crash") {
    val base = Files.createTempDirectory("graft_badjson")
    val f = base.resolve("rows.json")
    Files.write(f, java.util.List.of(
      """{"id": 1, "v": "ok"}""",
      """{"id": oops not json""",
      """{"id": 3, "v": "fine"}"""))
    val schema = "id LONG, v STRING, _corrupt_record STRING"
    val got = spark.read.schema(schema).json(base.toString)
    // cache first: Spark disallows filtering raw JSON on only the
    // corrupt-record column without materializing the full row
    got.cache()
    assert(got.where(col("_corrupt_record").isNull).count() == 2)
    assert(got.where(col("_corrupt_record").isNotNull).count() == 1)
    got.unpersist()
  }
}
