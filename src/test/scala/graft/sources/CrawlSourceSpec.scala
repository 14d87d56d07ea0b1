package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CrawlSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft-crawl DSv2 source reads fixture pages with per-partition fetch") {
    val dir = Files.createTempDirectory("graft_crawl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "0042T.html"),
      """<div class="layout2_code"><h1>0042T, Ct perfusion</h1></div>""")
    Files.writeString(java.nio.file.Paths.get(dir, "A0021.html"),
      """<div class="layout2_code"><h1>A0021, Ambulance</h1></div>""")

    val df = spark.read.format("graft-crawl")
      .option("codes", "0042T, A0021, GONE1")
      .option("fixtures", dir)
      .option("partitions", "2")
      .load()
    assert(df.columns.toSeq == Seq("code", "html"))
    val rows = df.as[(String, String)].collect().toMap
    assert(rows.keySet == Set("0042T", "A0021", "GONE1"))
    assert(rows("0042T").contains("Ct perfusion"))
    assert(rows("GONE1").contains("container404")) // unknown -> 404 page

    // composes with the extraction surface: source -> parse projection
    val parsed = df.select($"code",
      graft.extract.Extractors.shortDescriptionUdf($"html").as("short_desc"))
      .where($"short_desc".isNotNull)
      .as[(String, String)].collect().toMap
    assert(parsed == Map("0042T" -> "Ct perfusion", "A0021" -> "Ambulance"))
  }
}
