package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 18): cost of the keyless round-robin rebalance on
  * the documents/embeddings scans vs a deterministic hash repartition
  * on the id column. Keyless repartition pays a local sort of the full
  * row payload (spark.sql.execution.sortBeforeRepartition, on by
  * default since SPARK-23207 so retried tasks reproduce the same
  * row-to-partition assignment) — from a single-row-group parquet file
  * that sort is SERIAL. Hash partitioning on a unique id is
  * deterministic per row (retry-safe with no sort) and exposes a
  * hashpartitioning output that downstream id-keyed operators can
  * reuse.
  */
object RepartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[repart] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for (i <- 1 to 3) {
      timeIt(s"docs roundrobin($cpus) #$i") {
        docs.repartition(cpus.toInt)
          .write.format("noop").mode("overwrite").save()
      }
      timeIt(s"docs hash(doc_id,$cpus) #$i") {
        docs.repartition(cpus.toInt, col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      timeIt(s"emb roundrobin($cpus) #$i") {
        emb.repartition(cpus.toInt)
          .write.format("noop").mode("overwrite").save()
      }
      timeIt(s"emb hash(vec_id,$cpus) #$i") {
        emb.repartition(cpus.toInt, col("vec_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
