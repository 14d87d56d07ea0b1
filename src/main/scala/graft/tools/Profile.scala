package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: time one catalog query (optionally repeated) and dump its
  * formatted plan. `runMain graft.tools.Profile <queryName> [reps] [sfDir]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.withEngineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.Catalog.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q.fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    println(q.fn(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
