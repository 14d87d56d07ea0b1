package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time representative queries across the three test scale
  * factors (100x data range) to separate fixed overhead from per-row
  * compute. A query whose time grows far slower than data size is
  * overhead-bound at test scale; one growing ~linearly is compute/
  * shuffle-bound and predicts large-scale behavior. Results recorded in
  * BASELINE.md.
  */
object ScaleProbe {
  private val probes = Seq(
    "q01_pricing_summary",  // full-scan hash agg
    "q04_multijoin_region", // star join (1 big shuffle + broadcasts)
    "q08_window_topk",      // shuffle + per-key window
    "q31_range_join",       // equi-join + interval filter
    "q46_kmv_distinct",     // k-bounded KMV aggregation (r3: no window sort)
    "dd02_minhash_lsh",     // shingle/sketch + banded self-join
    "ann01_bruteforce_topk",// broadcast nested-loop scoring
    "tx06_tfidf",           // explode + two aggs + window
    "dd06_dup_clusters",    // iterative label propagation (shuffle/round)
    "dp01_curation_pipeline", // full multi-stage curation plan
    "q65_interval_bin_join",// binned point-in-interval equi-join
    "ann06_pq_topk",        // banded block-code candidate join
    "tx08_commonness",      // freq table + broadcast join back
    "dd07_cdc_chunking")    // per-row rolling-fingerprint chunking

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
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cat = graft.queries.Catalog.all.map(q => q.name -> q).toMap
    // warm-up pass (JIT + codegen caches) at the smallest sf
    probes.foreach(n => cat(n).fn(spark, sfs.head).write.format("noop").mode("overwrite").save())
    println(f"${"query"}%-24s ${"sf0.001"}%9s ${"sf0.01"}%9s ${"sf0.1"}%9s")
    probes.foreach { n =>
      val times = sfs.map { sf =>
        val t0 = System.nanoTime()
        cat(n).fn(spark, sf).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s ${times(0)}%8.2fs ${times(1)}%8.2fs ${times(2)}%8.2fs")
    }
    // dd05 scale evidence: same-bucket candidate pairs must grow ~linearly
    // with corpus size (scaled bucket width), not O(n²/const-buckets)
    val counts = sfs.map { sf =>
      val emb = graft.sources.Tables.table(spark, sf, "embeddings")
        .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
          org.apache.spark.sql.functions.col("embedding").as("vec"))
      (emb.count(), graft.operators.SimilarityOps.nearDupCandidateCount(emb))
    }
    println(f"${"dd05_candidate_pairs"}%-24s " +
      counts.map { case (n, p) => f"n=$n%-5d pairs=$p%-7d" }.mkString(" "))
    spark.stop()
  }
}
