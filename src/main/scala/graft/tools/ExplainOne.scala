package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan dump: `runMain graft.tools.ExplainOne <query> <sfDir>`
  * prints the formatted physical plan of one catalog query — the
  * .explain("formatted") audit loop without an ad-hoc scratch file.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(0))(spark, args(1)).explain("formatted")
    spark.stop()
  }
}
