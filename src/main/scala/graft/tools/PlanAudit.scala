package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every catalog query's physical plan for scale
  * anti-patterns — CartesianProduct, non-broadcast nested-loop joins,
  * and scans with no pushed filters where the query filters. Prints one
  * line per query; `!!` marks findings to review.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Catalog.all.foreach { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val smj = plan.contains("SortMergeJoin")
        val bhj = plan.contains("BroadcastHashJoin")
        val flags = Seq(
          if (cartesian) Some("!!CARTESIAN") else None,
          if (bnlj) Some("bnlj") else None,
          if (smj) Some("smj") else None,
          if (bhj) Some("bhj") else None).flatten
        println(s"[audit] ${q.name}: ${if (flags.isEmpty) "narrow/agg" else flags.mkString(",")}")
      } catch {
        case e: Exception => println(s"[audit] ${q.name}: ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
