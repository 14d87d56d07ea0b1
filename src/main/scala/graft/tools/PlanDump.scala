package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (round-18 optimization evidence): dump `.explain("formatted")`
  * for a list of catalog queries to one file per query, in a single JVM.
  *
  * {{{
  * runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...|all>
  * }}}
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. The session mirrors Bench's
  * configuration (same master/core/partition policy) so the captured
  * plans are the ones the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names: Seq[String] =
      if (args.length < 3 || args(2) == "all")
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").filter(_.nonEmpty).toSeq
    val spark = graft.GraftSession.withEngineDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.GraftSession.initialPartitions(cpus.toInt,
          graft.GraftSession.dirBytes(sfDir)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $n ok")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
