package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale contract:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Queries × corpus equi-join-free broadcast; only viable when the
  *    query set is small (it is broadcast; the corpus side streams).
  *  - `lshTopK`: sign-random-projection LSH — the 100 TB path. Corpus is
  *    bucketed by the sign pattern of `planes` fixed hyperplanes; the
  *    candidate join is an equi-join on the bucket key, so Spark
  *    shuffle-partitions by bucket instead of forming a cross product.
  *
  * All vector math is expression-level (`zip_with`/`aggregate` — codegen'd,
  * no UDF): elements are cast float→double (exact) and summed sequentially,
  * which keeps results deterministic and oracle-comparable.
  */
object SimilarityOps {

  /** Sequential-order dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0d), (acc, x) => acc + x * x))

  /** Cosine similarity from built-in higher-order functions; 0.0 when
    * either norm is 0. Kept as the dependency-free reference form — the
    * hot path uses the fused native expression below (bit-identical).
    */
  def cosineComposed(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val denom = norm(ad) * norm(bd)
    when(denom === 0d, lit(0d)).otherwise(dot(ad, bd) / denom)
  }

  /** Cosine similarity — native codegen'd expression
    * ([[graft.functions.CosineSimilarity]]: one fused loop, no
    * intermediate arrays) when a session is active, composed form
    * otherwise. Both produce bit-identical doubles.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) => graft.functions.CosineSimilarity.cosineNative(s, a, b)
      case None    => cosineComposed(a, b)
    }

  /** Exact top-k neighbours for each query vector.
    *
    * `queries`/`corpus`: (id, vec). The query side is broadcast (small by
    * contract); ranking happens per-query with a window over the joined
    * similarities. Self-matches (same id) are excluded.
    *
    * Determinism: rank orders by cosine rounded to `roundSim` decimals,
    * ties broken by neighbour id — so results are stable across engines
    * and run-to-run despite float summation differences.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qvec")))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("nvec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("nvec")), roundSim).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic "random" hyperplane: the sign of coordinate
    * `axes(i)` (coordinate-axis projections — reproducible in SQL, no
    * RNG). For production recall, swap in seeded Gaussian planes; the
    * plumbing (bucket key, join shape) is identical.
    */
  def signBucket(vec: Column, axes: Seq[Int]): Column =
    concat_ws("", axes.map(i => when(element_at(vec, i + 1) >= 0f, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed approximate top-k: join restricted to same-bucket pairs.
    * At scale the bucket key is the shuffle key; recall is tuned via the
    * number of axes (fewer axes → bigger buckets → higher recall+cost).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      axes: Seq[Int] = 0 until 8, roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      signBucket(col("vec"), axes).as("bucket"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("nvec"),
      signBucket(col("vec"), axes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qvec"), col("nvec")), roundSim).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Bucket width that keeps the within-bucket self-join bounded as the
    * corpus grows: the smallest k >= 4 (capped at 16) such that
    * 2^k buckets hold ~`targetBucket` vectors each. Pure integer math so
    * an engine mirroring the formula (e.g. the DuckDB oracle's CASE
    * ladder) lands on the identical k — no float-log boundary risk.
    */
  def scaledAxisCount(n: Long, targetBucket: Int = 32): Int = {
    val m = math.max(1L, (n + targetBucket - 1) / targetBucket)
    val k = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(16, math.max(4, k))
  }

  /** Embedding near-duplicate pairs: same-bucket candidates whose rounded
    * cosine clears `threshold` (id1 < id2). The bucket equi-join bounds
    * the pair count; brute-force verification only runs within buckets.
    *
    * When `axes` is not given, the bucket count SCALES WITH THE CORPUS
    * ([[scaledAxisCount]]): expected bucket size stays ~`targetBucket`,
    * so the within-bucket pair count grows O(n · targetBucket) — linear
    * in corpus size — instead of the O(n²/buckets) blow-up a fixed
    * bucket count gives at 100×. Pass the corpus size as `n` (from table
    * metadata, e.g. [[graft.sources.Tables.parquetRowCount]], or the
    * caller's prior knowledge) so the ONLY scan of the table is the real
    * job; the `df.count()` fallback costs one extra single-column pass.
    */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double,
      axes: Option[Seq[Int]] = None, targetBucket: Int = 32,
      roundSim: Int = 4, n: Option[Long] = None): DataFrame = {
    val ax = axes.getOrElse(
      0 until scaledAxisCount(n.getOrElse(df.count()), targetBucket))
    // carries the full vectors — a copy of the embedding corpus, so
    // DISK_ONLY with lineage kept rather than executor-pinned (r7 lesson)
    val withBucket = Exec.materializeLarge(
      df.select(col("id"), col("vec"), signBucket(col("vec"), ax).as("bucket")))
    val l = withBucket.select(col("bucket"), col("id").as("id1"), col("vec").as("vec1"))
    val r = withBucket.select(col("bucket"), col("id").as("id2"), col("vec").as("vec2"))
    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), round(cosine(col("vec1"), col("vec2")), roundSim).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Diagnostic (ScaleProbe): how many same-bucket candidate pairs the
    * near-dup join verifies at this corpus size's bucket width — the
    * number that must grow ~linearly with n for the operator to survive
    * a 100× scale-up.
    */
  def nearDupCandidateCount(df: DataFrame, targetBucket: Int = 32): Long = {
    val ax = 0 until scaledAxisCount(df.count(), targetBucket)
    df.select(signBucket(col("vec"), ax).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .select(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("pairs"))
      .collect()(0).getLong(0)
  }

  /** Per-cell mean embedding — the k-means M-step that re-estimates IVF
    * centroids from assigned vectors. One explode + one hash aggregation
    * on (cell, dim): fully partial-aggregatable, no collect, no window —
    * the shape that survives a 100 TB corpus.
    *
    * Determinism: float element -> double is exact, scaling by 2^shift is
    * exact (power-of-two exponent shift), floor is exact, and the long
    * sum is associative — so the fixed-point sum is identical under any
    * partitioning/engine, unlike a float mean which reassociates. The
    * mean is one final double division.
    *
    * @return (cellCol, dim, n_vectors, mean) one row per cell x dimension
    */
  def quantizedCentroids(df: DataFrame, cellCol: String, vecCol: String,
      shift: Int = 20): DataFrame = {
    val scale = (1L << shift).toDouble
    df.select(col(cellCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(cellCol), col("dim"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(floor(col("v").cast("double") * scale).cast("long")).as("qsum"))
      .withColumn("mean", col("qsum").cast("double") / (col("n_vectors") * scale))
      .drop("qsum")
  }

  /** Deterministic distributed Lloyd's iterations — the IVF index
    * TRAINING step the seed-centroid demo (ann04) stops short of. Each
    * iteration is: assign every vector to its nearest centroid by
    * cosine (k-row centroid broadcast, rank per vector), then re-estimate
    * centroids with the fixed-point M-step ([[quantizedCentroids]] —
    * exact under any partitioning). A cell that loses every vector keeps
    * its previous centroid (the standard empty-cluster fallback).
    *
    * Determinism end to end, so the result is engine- and
    * partitioning-independent and DuckDB-oracle-checkable:
    *  - seeds are the `k` smallest-id vectors (sort+limit — bounded);
    *  - assignment ranks by cosine ROUNDED to `roundSim` decimals with
    *    cent_id as tie-break (the ann01/ann04 discipline);
    *  - the M-step sums exact scaled longs; the mean is one double
    *    division.
    *
    * Scale shape per iteration: one k-row broadcast join + one window
    * keyed by vec_id (high cardinality) + one partial-aggregatable
    * explode-agg — no all-pairs stage, no driver loop over data. The
    * tiny centroid table is checkpointed per round (loop discipline:
    * lineage cut, like dd06/q68).
    *
    * @return long-form centroids after `iters` rounds:
    *         (cell, dim, n_vectors, mean) — cell is the seed vector's id
    */
  /** Nearest-centroid assignment for a trained/seeded centroid table
    * (`cell`, `cvec array<double>`): the ranking half of one Lloyd's
    * round, exposed so pipelines can reuse trained centroids — IVF
    * probing, semantic dedup's cell partitioning. Same determinism
    * contract as [[kmeansFit]] (rounded cosine, cent_id tie-break).
    */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, roundSim: Int = 6): DataFrame = {
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy("_ka_id")
      .orderBy(col("_ka_sim").desc, col("cell").asc)
    df.select(col(idCol).as("_ka_id"), col(vecCol).cast("array<double>").as("_ka_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("_ka_sim", round(cosine(col("_ka_vec"), col("cvec")), roundSim))
      .withColumn("_ka_rn", row_number().over(byVec))
      .where(col("_ka_rn") === 1)
      .select(col("_ka_id").as(idCol), col("cell"))
  }

  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, shift: Int = 20, roundSim: Int = 6): DataFrame = {
    require(k > 0 && iters > 0)
    val vecs = df.select(col(idCol).as("_km_id"),
      col(vecCol).cast("array<double>").as("_km_vec"))
    var centroids = Exec.materializeForSelfJoin(
      vecs.orderBy(col("_km_id")).limit(k)
        .select(col("_km_id").as("cell"), col("_km_vec").as("_km_cvec")))
    var lastM: DataFrame = null
    for (_ <- 1 to iters) {
      val byVec = org.apache.spark.sql.expressions.Window
        .partitionBy("_km_id")
        .orderBy(col("_km_sim").desc, col("cell").asc)
      val assigned = vecs.crossJoin(broadcast(centroids))
        .withColumn("_km_sim", round(cosine(col("_km_vec"), col("_km_cvec")), roundSim))
        .withColumn("_km_rn", row_number().over(byVec))
        .where(col("_km_rn") === 1)
        .select(col("_km_id"), col("cell"))
      lastM = Exec.materializeForSelfJoin(
        quantizedCentroids(vecs.join(assigned, "_km_id"), "cell", "_km_vec", shift))
      val updated = lastM
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
          x => x.getField("mean")).as("_km_cvec"))
      // empty-cluster fallback: keep the previous centroid for cells the
      // assignment starved (left join preserves all k cells every round)
      centroids = Exec.materializeForSelfJoin(
        centroids.select(col("cell"), col("_km_cvec").as("_km_prev"))
          .join(updated, Seq("cell"), "left")
          .select(col("cell"), coalesce(col("_km_cvec"), col("_km_prev")).as("_km_cvec")))
    }
    lastM
  }
}
