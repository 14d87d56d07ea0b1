package graft.tools
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    println("===== dp17 globalRank =====")
    graft.operators.PrefixSumOps.globalRank(
      graft.sources.Tables.documents(spark, d)
        .selectExpr("doc_id", "n_chars", "n_chars * 1000000L + doc_id as _key"),
      "_key").explain("formatted")
    println("===== tx14 bigramLogProb =====")
    graft.operators.TextOps.bigramLogProb(
      graft.sources.Tables.documents(spark, d), "text", "doc_id")
      .explain("formatted")
    spark.stop()
  }
}
