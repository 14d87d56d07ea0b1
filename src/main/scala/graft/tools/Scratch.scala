package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment harness (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield (c - s) / 1000.0
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"dur=${dur.getOrElse(-1.0)}%.2f s  ${si.name.take(60)}")
      }
    })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    import graft.operators.DedupOps
    val docs = graft.sources.Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), DedupOps.tokens(col("text")).as("_toks"))
    val sh = toks.select(col("doc_id"),
      array_distinct(DedupOps.shinglesFromTokens(col("_toks"), 3)).as("shingles"))
    val keyed = sh.withColumn("block", array_min(transform(col("shingles"), x => md5(x))))
    val kk = keyed.repartition(col("block"))
    val l = kk.select(col("block"), col("doc_id").as("id1"), col("shingles").as("sh1"))
    val r = kk.select(col("block"), col("doc_id").as("id2"), col("shingles").as("sh2"))
    val joined = l.join(r, Seq("block")).where(col("id1") < col("id2"))
    val jac = joined.select(col("id1"), col("id2"),
      (size(array_intersect(col("sh1"), col("sh2"))).cast("double")
        / size(array_union(col("sh1"), col("sh2")))).as("jaccard"))
    time("warmup count")(docs.count())
    println("=== jac run 1 ===")
    time("join+jaccard")(jac.count())
    println("=== jac run 2 ===")
    time("join+jaccard 2")(jac.count())
    spark.stop()
  }
}
