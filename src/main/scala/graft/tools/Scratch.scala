package graft.tools

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
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    import graft.operators.SimilarityOps

    val raw = spark.read.parquet(s"$d/embeddings.parquet")
    time("raw scan count")(raw.count())
    val rebal = graft.sources.Tables.embeddings(spark, d)
    time("rebalanced count")(rebal.count())

    def topk(corpusDf: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val emb = corpusDf.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val out = SimilarityOps.bruteForceTopK(emb.where(col("id") < 10), emb, 10, 6)
      time(label)(out.count())
      time(label + " again")(out.count())
    }
    topk(rebal, "topk rebalanced")
    topk(raw, "topk raw")

    // isolate: cosine projection only, no window
    val emb = rebal.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = broadcast(emb.where(col("id") < 10)
      .select(col("id").as("query_id"), col("vec").as("qvec")))
    val c = emb.select(col("id").as("neighbor_id"), col("vec").as("nvec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(SimilarityOps.cosine(col("qvec"), col("nvec")), 6).as("sim"))
    time("scored only")(scored.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
    time("scored+window")(ranked.count())
    spark.stop()
  }
}
