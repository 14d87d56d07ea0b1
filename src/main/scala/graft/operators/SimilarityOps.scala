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
      // coalesce: sum() is NULL on an empty corpus (ADVICE r9)
      .select(coalesce(sum((col("c") * (col("c") - 1) / 2).cast("long")), lit(0L))
        .as("pairs"))
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

  /** Order-isomorphic single-long encoding of the assignment ordering
    * `struct(sim, −cell)` — round 18: a struct ordering key puts an
    * immutable field in the aggregation buffer, which demotes the whole
    * aggregate from HashAggregate to **SortAggregate** (a full sort of
    * the n×k scored rows per aggregation — dd28's plan carried 15 of
    * them, ann07's 6). Packing the key into one long restores the
    * mutable-buffer HashAggregate with identical ordering semantics:
    *
    *   key = round(sim·10⁶)·2⁴² + (2⁴² − 1 − cell)
    *
    *  - `sim` is always `round(cosine, roundSim)` with roundSim ≤ 6
    *    (every call site; CatalogDedup's one roundSim=4 is a subset of
    *    the 10⁻⁶ grid), so sim·10⁶ recovers the exact integer in
    *    [−10⁶, 10⁶] — 21 bits; the 2⁴² shift keeps the product ≤
    *    4.4·10¹⁸ < Long.Max.
    *  - higher sim ⇒ higher key (the 2⁴² steps dominate the cell term);
    *    equal sim ⇒ SMALLER cell has the larger key — exactly
    *    max(struct(sim, −cell)).
    *  - contract: 0 ≤ cell < 2⁴² (4.4·10¹²) — cells are kmeans cell
    *    ranks or seed vector ids, below that bound at the 100 TB design
    *    target (~4·10¹¹ vectors).
    */
  private[operators] def simCellKey(sim: Column, cell: Column): Column =
    round(sim * lit(1000000.0)).cast("long") * lit(1L << 42) +
      (lit((1L << 42) - 1) - cell.cast("long"))

  /** Decode the cell id back out of a [[simCellKey]] (pmod keeps the
    * low 42 bits non-negative for negative-sim keys too).
    */
  private[operators] def simCellKeyCell(key: Column): Column =
    lit((1L << 42) - 1) - pmod(key, lit(1L << 42))

  /** [[simCellKey]]'s sibling for the PQ argmin ordering
    * `struct(dist, code)` (same round-18 SortAggregate→HashAggregate
    * rewrite): key = round(dist·10⁶)·2²⁰ + rank-of-code-within-block.
    * Distances are `round(·, roundDist ≤ 6)` so dist·10⁶ is exact; the
    * code RANK (dense, per block, ascending — strictly monotone in the
    * code id) replaces the raw code id in the key because codes are
    * seed VECTOR IDS of unbounded magnitude while ranks are bounded by
    * codesPerBlock < 2²⁰; min key = min dist, then min code. Contract:
    * dist < 2⁴³/10⁶ ≈ 8.8·10⁶ (squared L2 of two sub-vectors — holds
    * for any |coordinate| below ~10³).
    */
  private def distRankKey(dist: Column, crank: Column): Column =
    round(dist * lit(1000000.0)).cast("long") * lit(1L << 20) + crank

  /** Attach the per-block ascending code rank the [[distRankKey]]
    * ordering uses — a window over the bounded (blocks × codes)
    * broadcast side, never the corpus.
    */
  private def withCodeRank(codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    codebook.withColumn("_crank", row_number()
      .over(Window.partitionBy("blk").orderBy("code")).cast("long"))
  }

  /** Map-side-combinable nearest-centroid argmax: `max_by(cell,
    * simCellKey(sim, cell))` picks the highest rounded cosine with the
    * SMALLEST cell id on ties — the exact ordering the previous
    * `row_number()` window encoded, but as a declarative aggregate Spark
    * partial-aggregates before the exchange. The window shipped all k
    * scored copies of every vector through the shuffle and discarded k−1
    * after; this shuffles one partially-reduced row per vector per map
    * partition — a k× shuffle-volume cut that matters at 100 TB where
    * assignment runs once per Lloyd's round. Deterministic under any
    * partitioning: the ordering key is unique per centroid (cell ids are
    * distinct), so there is no tie for max_by to break arbitrarily.
    * The single-long key (vs the struct it encodes) keeps the aggregate
    * a HashAggregate — see [[simCellKey]].
    */
  private def nearestCell(scored: DataFrame, idCol: String, simCol: String,
      cellCol: String): DataFrame =
    scored.groupBy(col(idCol))
      .agg(max_by(col(cellCol), simCellKey(col(simCol), col(cellCol))).as(cellCol))

  /** Nearest-centroid assignment for a trained/seeded centroid table
    * (`cell`, `cvec array<double>`): the ranking half of one Lloyd's
    * round, exposed so pipelines can reuse trained centroids — IVF
    * probing, semantic dedup's cell partitioning. Same determinism
    * contract as [[kmeansFit]] (rounded cosine, cent_id tie-break).
    *
    * The `cell` column must be NUMERIC: the tie-break negates it
    * ([[nearestCell]]'s `max_by` ordering struct), which a string cell id
    * would fail to analyze. Every producer here (seed vector ids,
    * [[kmeansFit]] output) is numeric already.
    */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, roundSim: Int = 6): DataFrame = {
    val scored = df
      .select(col(idCol).as("_ka_id"), col(vecCol).cast("array<double>").as("_ka_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("_ka_sim", round(cosine(col("_ka_vec"), col("cvec")), roundSim))
    nearestCell(scored, "_ka_id", "_ka_sim", "cell")
      .select(col("_ka_id").as(idCol), col("cell"))
  }

  /** Multi-probe centroid assignment: each vector's `nProbe` NEAREST
    * cells (the ann15/ivfTopK query-side probe applied to the WHOLE
    * corpus — what SemDeDup-style dedup needs to stop losing pairs that
    * straddle a cell boundary). The obvious form — `row_number()` over
    * the n×k scored table — ships k scored copies of every vector
    * through one shuffle; at 100 TB with k up to 4096 that exchange IS
    * the job. Instead this runs `nProbe` successive [[nearestCell]]-style
    * max-aggregations, each map-side-combinable (one partially-reduced
    * row per vector per map partition crosses the wire): probe p
    * re-scores the corpus against the broadcast centroids and takes the
    * max ordering key STRICTLY BELOW probe p−1's key. Cost is nProbe
    * map passes of n×k cosines (recomputed, never materialized — the
    * n×k table must not exist) plus nProbe − 1 O(n) joins; shuffles
    * stay O(n) throughout.
    *
    * Ordering key = [[simCellKey]] (the single-long encoding of
    * struct(rounded sim, −cell) — struct keys demote the per-probe
    * aggregations to SortAggregate, round 18): max = highest sim,
    * smallest cell on ties — exactly `row_number() OVER (ORDER BY sim
    * DESC, cell ASC)`, which the oracle states directly with `rn <=
    * nProbe`. Keys are unique per (vector, cell), so "strictly below"
    * loses nothing. Vectors are assigned min(nProbe, k) cells.
    *
    * @return (idCol, cell, probe) — probe 1 = nearest
    */
  def assignTopCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nProbe: Int = 2, roundSim: Int = 6): DataFrame = {
    require(nProbe >= 1 && nProbe <= 8, "nProbe is a small probing constant")
    val base = df.select(col(idCol).as("_mp_id"),
      col(vecCol).cast("array<double>").as("_mp_vec"))
    def scored(b: DataFrame): DataFrame = b
      .crossJoin(broadcast(centroids))
      .withColumn("_mp_key", simCellKey(
        round(cosine(col("_mp_vec"), col("cvec")), roundSim), col("cell")))
    var out: DataFrame = null
    var bound: DataFrame = null // (_mp_id, _mp_bk) = previous probe's key
    for (p <- 1 to nProbe) {
      val sc =
        if (bound == null) scored(base)
        else scored(base.join(bound, "_mp_id")).where(col("_mp_key") < col("_mp_bk"))
      val top = sc.groupBy("_mp_id").agg(max(col("_mp_key")).as("_mp_bk"))
      val picked = top.select(col("_mp_id"), simCellKeyCell(col("_mp_bk")).as("cell"),
        lit(p).as("probe"))
      out = if (out == null) picked else out.unionByName(picked)
      bound = top
    }
    out.select(col("_mp_id").as(idCol), col("cell"), col("probe"))
  }

  /** IVF top-k retrieval against a TRAINED centroid table (`cell`,
    * `cvec array<double>` — [[kmeansFit]] output rebuilt to arrays): the
    * deployable form of ann04's seed-centroid demo. The corpus assigns
    * once via the partial-aggregatable argmax ([[assignToCentroids]] —
    * no n×k window shuffle); only the bounded query subset ranks its
    * top-`nProbe` cells with a window; exact cosine runs solely within
    * probed cells, the candidate equi-join on the cell key bounding the
    * scan. Same determinism contract as ann01/ann04 (rounded cosine,
    * id tie-breaks) so the result is oracle-checkable.
    *
    * @param corpus (id, vec); `queryPred` selects the query rows from it
    */
  def ivfTopK(corpus: DataFrame, queryPred: Column, centroids: DataFrame,
      k: Int, nProbe: Int = 2, roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignToCentroids(corpus, "id", "vec", centroids, roundSim)
      .select(col("id").as("neighbor_id"), col("cell"))
    val queries = corpus.where(queryPred)
    // probe ranking: a window over only the bounded query subset × k
    val scoredQ = queries
      .select(col("id").as("query_id"), col("vec").cast("array<double>").as("_iv_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_iv_qsim", round(cosine(col("_iv_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_iv_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_iv_rn", row_number().over(wp))
      .where(col("_iv_rn") <= nProbe).select(col("query_id"), col("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    // query vectors broadcast by contract (bounded); the corpus side
    // joins UNHINTED (the tx08/ann04 rule — AQE decides at runtime)
    val q = queries.select(col("id").as("query_id"), col("vec").as("_iv_qvec"))
    val n = corpus.select(col("id").as("neighbor_id"), col("vec").as("_iv_nvec"))
    val scored = cand.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_iv_qvec"), col("_iv_nvec")), roundSim).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Semantic decontamination: training vectors whose embedding lies
    * within `threshold` cosine of ANY eval/benchmark vector — the
    * embedding-level complement of exact-shingle decontamination (dp09):
    * paraphrased or lightly-edited benchmark items share no 4-token
    * shingle but sit next to the benchmark in embedding space. Returns
    * one row per contaminated training vector with how many eval items
    * it matched and the closest similarity, so the pipeline can drop or
    * audit before training.
    *
    * Scale shape (the ivfTopK probe pattern, threshold-gated instead of
    * top-k): the TRAINING side assigns once against the bounded trained
    * centroid broadcast via the partial-aggregatable argmax; the EVAL
    * side (bounded — benchmarks are small) ranks its top-`nProbe` cells
    * with a window over only evals × k; exact cosine runs solely inside
    * probed cells, so candidate volume is ~ evals × nProbe × cell
    * population (≈ the [[scaledCellCount]] target), never train × eval.
    * A train row can match via at most `nProbe` distinct cells but is
    * assigned to exactly one, so each (eval, train) pair arises at most
    * once — no dedup pass needed. Same determinism contract as
    * ann01/ann04 (rounded cosine, id tie-breaks): oracle-checkable.
    *
    * Recall caveat (shared with ann04/ann07's IVF arms): an eval
    * neighbor whose cell is outside the eval's `nProbe` closest cells is
    * missed; raise `nProbe` to trade cost for recall. The dd15 oracle
    * mirrors the same probe set op-for-op.
    */
  def semanticContaminated(df: DataFrame, idCol: String, vecCol: String,
      evalPred: Column, centroids: DataFrame, threshold: Double,
      nProbe: Int = 2, roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val train = df.where(!evalPred)
    val assigned = assignToCentroids(train, idCol, vecCol, centroids, roundSim)
      .select(col(idCol).as("train_id"), col("cell"))
    val evals = df.where(evalPred)
    val scoredQ = evals
      .select(col(idCol).as("eval_id"),
        col(vecCol).cast("array<double>").as("_sc_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_sc_qsim", round(cosine(col("_sc_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("eval_id")
      .orderBy(col("_sc_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_sc_rn", row_number().over(wp))
      .where(col("_sc_rn") <= nProbe)
      .select(col("eval_id"), col("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .select("eval_id", "train_id")
    // eval vectors broadcast by contract (bounded); train side UNHINTED
    val q = evals.select(col(idCol).as("eval_id"), col(vecCol).as("_sc_qvec"))
    val n = train.select(col(idCol).as("train_id"), col(vecCol).as("_sc_nvec"))
    cand.join(broadcast(q), Seq("eval_id")).join(n, Seq("train_id"))
      .withColumn("sim", round(cosine(col("_sc_qvec"), col("_sc_nvec")), roundSim))
      .where(col("sim") >= threshold)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_evals"), max(col("sim")).as("max_sim"))
  }

  /** Deterministic distributed Lloyd's iterations — the IVF index
    * TRAINING step the seed-centroid demo (ann04) stops short of. Each
    * iteration is: assign every training vector to its nearest centroid
    * by cosine (k-row centroid broadcast, map-side-combinable argmax),
    * then re-estimate centroids with the fixed-point M-step
    * ([[quantizedCentroids]] — exact under any partitioning). A cell that
    * loses every vector keeps its previous centroid (the standard
    * empty-cluster fallback).
    *
    * TRAINING RUNS ON A BOUNDED SAMPLE (the standard 100 TB practice —
    * production SemDeDup/IVF trainers never run Lloyd's over the full
    * corpus): when `samplePerCell` > 0 the training set is the
    * `samplePerCell × k` smallest rows by (md5("km:" ‖ id), id) — a
    * deterministic uniform draw, the dp02/dp06/dp07 salted-md5
    * discipline, selected via sort+limit (TakeOrderedAndProject: every
    * task keeps ≤ cap rows, no full sort). With k capped at 4096
    * ([[scaledCellCount]]) the training set is ≤ 64k rows at the default,
    * so per-round assignment compute is BOUNDED — independent of n —
    * where full-corpus training was n·k per round (quadratic in the
    * k ∝ n mid-range, VERDICT r9). Callers then assign the full corpus
    * ONCE against the trained centroids ([[assignToCentroids]] — what
    * [[semanticNearDupPairs]] does). `samplePerCell` ≤ 0 disables
    * sampling (trains on every row — the small-corpus/spec path).
    *
    * Determinism end to end, so the result is engine- and
    * partitioning-independent and DuckDB-oracle-checkable:
    *  - the sample is an md5-ordered prefix (salt "km:"), mirrored in
    *    the oracle's `smp` CTE;
    *  - seeds are the `k` smallest-id TRAINING vectors (sort+limit);
    *  - assignment picks the max cosine ROUNDED to `roundSim` decimals
    *    with cent_id as tie-break (the ann01/ann04 discipline), via the
    *    partial-aggregatable [[nearestCell]] argmax;
    *  - the M-step sums exact scaled longs; the mean is one double
    *    division.
    *
    * Scale shape per iteration: one k-row broadcast join + one
    * partial-aggregatable argmax keyed by vec_id + one
    * partial-aggregatable explode-agg — no all-pairs stage, no window
    * shuffle of n×k scored rows, no driver loop over data. The tiny
    * centroid table is checkpointed per round (loop discipline: lineage
    * cut, like dd06/q68).
    *
    * @return long-form centroids after `iters` rounds over the training
    *         set: (cell, dim, n_vectors, mean) — cell is the seed
    *         vector's id; n_vectors counts TRAINING vectors (the
    *         full-corpus membership comes from the caller's one
    *         [[assignToCentroids]] pass)
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, shift: Int = 20, roundSim: Int = 6,
      samplePerCell: Int = 16): DataFrame = {
    require(k > 0 && iters > 0)
    val all = df.select(col(idCol).as("_km_id"),
      col(vecCol).cast("array<double>").as("_km_vec"))
    val vecs =
      if (samplePerCell <= 0) all
      else Exec.materializeForSelfJoin(
        all.orderBy(
            md5(concat(lit("km:"), col("_km_id").cast("string"))), col("_km_id"))
          .limit(samplePerCell * k))
    var centroids = Exec.materializeForSelfJoin(
      vecs.orderBy(col("_km_id")).limit(k)
        .select(col("_km_id").as("cell"), col("_km_vec").as("_km_cvec")))
    var lastM: DataFrame = null
    for (_ <- 1 to iters) {
      val scored = vecs.crossJoin(broadcast(centroids))
        .withColumn("_km_sim", round(cosine(col("_km_vec"), col("_km_cvec")), roundSim))
      val assigned = nearestCell(scored, "_km_id", "_km_sim", "cell")
        .select(col("_km_id"), col("cell"))
      val prevM = lastM
      lastM = Exec.materializeForSelfJoin(
        quantizedCentroids(vecs.join(assigned, "_km_id"), "cell", "_km_vec", shift))
      if (prevM != null) Exec.releaseMaterialized(prevM)
      val updated = lastM
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
          x => x.getField("mean")).as("_km_cvec"))
      // empty-cluster fallback: keep the previous centroid for cells the
      // assignment starved (left join preserves all k cells every round)
      val prevC = centroids
      centroids = Exec.materializeForSelfJoin(
        centroids.select(col("cell"), col("_km_cvec").as("_km_prev"))
          .join(updated, Seq("cell"), "left")
          .select(col("cell"), coalesce(col("_km_cvec"), col("_km_prev")).as("_km_cvec")))
      Exec.releaseMaterialized(prevC)
    }
    // the returned M-step table is the only live handle: the training
    // sample and the final centroid round fed it and are dead now
    Exec.releaseMaterialized(centroids)
    if (vecs ne all) Exec.releaseMaterialized(vecs)
    lastM
  }

  /** Trained product-quantization codebooks: [[kmeansFit]]'s
    * deterministic Lloyd's run independently per SUB-VECTOR BLOCK — the
    * vector splits into `blocks` contiguous `subDim`-dim slices and each
    * block learns its own `codesPerBlock`-entry codebook, which is what
    * separates real PQ (Jégou et al., TPAMI 2011) from the sign-bit
    * code demo (ann06): trained codebooks adapt to the data
    * distribution, sign codes do not. Assignment uses ROUNDED squared
    * L2 (PQ's metric; `roundDist` decimals, ties to the lower code id —
    * the ann01/ann04 discipline transplanted), the M-step is the same
    * fixed-point scaled-long mean, and empty codes keep their previous
    * entry, so the whole run is engine- and partitioning-independent
    * and DuckDB-oracle-checkable.
    *
    * Training runs on a bounded salted-md5 sample (`samplePerCode ×
    * codesPerBlock` rows, salt "pq:" — the kmeansFit discipline), so
    * per-round compute is sample × blocks × codes — independent of
    * corpus size; the full corpus would be encoded by ONE subsequent
    * assignment pass per block against the trained codebook (bounded
    * broadcast: blocks × codes rows).
    *
    * Scale shape per round: one (blocks×codes)-row broadcast equi-join
    * on `blk`, one map-side-combinable lexicographic `min(struct(dist,
    * code))` argmin keyed by (vec, blk), one explode-agg M-step — no
    * window over scored rows, no all-pairs stage; loop state is
    * checkpointed and released per round like kmeansFit/dd06/q68.
    *
    * @return long-form codebook after `iters` rounds over the training
    *         sample: (blk, code, dim, n_vectors, mean) — `code` is the
    *         seed vector's id, `dim` the 0-based index WITHIN the block
    */
  def pqFit(df: DataFrame, idCol: String, vecCol: String, blocks: Int,
      subDim: Int, codesPerBlock: Int, iters: Int, shift: Int = 20,
      roundDist: Int = 6, samplePerCode: Int = 16): DataFrame = {
    require(blocks > 0 && subDim > 0 && iters > 0
      && codesPerBlock > 0 && codesPerBlock < (1 << 20),
      "codesPerBlock must fit the distRankKey rank budget")
    val all = df.select(col(idCol).as("_pq_id"),
      col(vecCol).cast("array<double>").as("_pq_vec"))
    val smp = Exec.materializeForSelfJoin(
      all.orderBy(
          md5(concat(lit("pq:"), col("_pq_id").cast("string"))), col("_pq_id"))
        .limit(samplePerCode * codesPerBlock))
    // one row per (sampled vector, block): the block's sub-vector
    val rows = Exec.materializeForSelfJoin(
      smp.select(col("_pq_id"), posexplode(expr(
          s"transform(sequence(0, $blocks - 1), " +
            s"b -> slice(_pq_vec, b * $subDim + 1, $subDim))"))
        .as(Seq("blk", "_pq_sv"))))
    // seeds: every block starts from the same codesPerBlock smallest
    // sampled ids — code = seed vector id (the kmeansFit convention)
    val seedIds = smp.orderBy("_pq_id").limit(codesPerBlock)
      .select(col("_pq_id").as("_pq_seed"))
    var codebook = Exec.materializeForSelfJoin(
      rows.join(broadcast(seedIds), col("_pq_id") === col("_pq_seed"))
        .select(col("blk"), col("_pq_id").as("code"), col("_pq_sv").as("_pq_cv")))
    val scale = (1L << shift).toDouble
    var lastM: DataFrame = null
    for (_ <- 1 to iters) {
      val scored = rows.join(broadcast(withCodeRank(codebook)), Seq("blk"))
        .withColumn("_pq_d", round(expr(
          "aggregate(zip_with(_pq_sv, _pq_cv, (a, b) -> (a - b) * (a - b)), " +
            "0D, (acc, x) -> acc + x)"), roundDist))
      val assigned = scored.groupBy(col("_pq_id"), col("blk"))
        // min_by on the single-long key ≡ min(struct(d, code)): keeps
        // the per-round argmin a HashAggregate (round 18)
        .agg(min_by(col("code"), distRankKey(col("_pq_d"), col("_crank"))).as("code"))
      val prevM = lastM
      lastM = Exec.materializeForSelfJoin(
        rows.join(assigned, Seq("_pq_id", "blk"))
          .select(col("blk"), col("code"), posexplode(expr(
              s"transform(_pq_sv, y -> cast(floor(y * ${1L << shift}D) as bigint))"))
            .as(Seq("dim", "q")))
          .groupBy("blk", "code", "dim")
          .agg(count(lit(1)).as("n_vectors"),
            (sum("q").cast("double") / (count(lit(1)) * scale)).as("mean")))
      if (prevM != null) Exec.releaseMaterialized(prevM)
      val updated = lastM.groupBy("blk", "code")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
          x => x.getField("mean")).as("_pq_cv"))
      val prevC = codebook
      codebook = Exec.materializeForSelfJoin(
        codebook.select(col("blk"), col("code"), col("_pq_cv").as("_pq_prev"))
          .join(updated, Seq("blk", "code"), "left")
          .select(col("blk"), col("code"),
            coalesce(col("_pq_cv"), col("_pq_prev")).as("_pq_cv")))
      Exec.releaseMaterialized(prevC)
    }
    Exec.releaseMaterialized(codebook)
    Exec.releaseMaterialized(smp)
    Exec.releaseMaterialized(rows)
    lastM
  }

  /** Long-form [[pqFit]] output → one row per (blk, code) with the
    * centroid as an array column, ready to broadcast (≤ blocks × codes
    * rows by construction).
    */
  def pqCodebookVectors(codebook: DataFrame): DataFrame =
    codebook.groupBy("blk", "code")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
        x => x.getField("mean")).as("cv"))

  /** Encode every vector against a trained PQ codebook: one row per
    * (id, blk) with the nearest code by rounded squared L2 (ties to the
    * lower code id — [[pqFit]]'s assignment discipline, so encoding and
    * training agree). THE one pass that touches the full corpus:
    * a (blocks×codes)-row broadcast join + the map-side-combinable
    * argmin, linear in n, and the encoded table is blocks shorts per
    * vector — the 32× compression PQ exists for.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, blocks: Int, subDim: Int,
      roundDist: Int = 6): DataFrame = {
    val rows = df.select(col(idCol).as("_pe_id"),
        col(vecCol).cast("array<double>").as("_pe_vec"))
      .select(col("_pe_id"), posexplode(expr(
          s"transform(sequence(0, $blocks - 1), " +
            s"b -> slice(_pe_vec, b * $subDim + 1, $subDim))"))
        .as(Seq("blk", "_pe_sv")))
    rows.join(broadcast(withCodeRank(pqCodebookVectors(codebook))), Seq("blk"))
      .withColumn("_pe_d", round(expr(
        "aggregate(zip_with(_pe_sv, cv, (a, b) -> (a - b) * (a - b)), " +
          "0D, (acc, x) -> acc + x)"), roundDist))
      .groupBy(col("_pe_id"), col("blk"))
      // min_by on the single-long [[distRankKey]] ≡ min(struct(d, code))
      // but keeps the aggregate a HashAggregate (round 18)
      .agg(min_by(col("code"), distRankKey(col("_pe_d"), col("_crank"))).as("code"))
      .select(col("_pe_id").as(idCol), col("blk"), col("code"))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each
    * query precomputes its distance to every codebook entry (a
    * queries × blocks × codes TABLE — the classic ADC lookup table,
    * tiny and broadcast), and a corpus vector's approximate distance is
    * the SUM of its blocks' looked-up entries — n×blocks integer adds,
    * never n×dim multiplies, which is the entire query-time speedup PQ
    * buys. Per-block distances are scaled to integer micro-units
    * (`round(d · 10^6)` — the q68 micro-unit move), so the 8-way sum is
    * an exact long under any aggregation order and both engines rank
    * identically (ties to the lower neighbor id).
    *
    * @return (query_id, neighbor_id, d_sum, rank) — rank ≤ k by
    *         ascending approximate distance
    */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, codebook: DataFrame, blocks: Int, subDim: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = pqEncode(df, idCol, vecCol, codebook, blocks, subDim)
      .select(col(idCol).as("neighbor_id"), col("blk"), col("code"))
    val dtab = df.where(queryPred)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_adc_qv"))
      .select(col("query_id"), posexplode(expr(
          s"transform(sequence(0, $blocks - 1), " +
            s"b -> slice(_adc_qv, b * $subDim + 1, $subDim))"))
        .as(Seq("blk", "_adc_qsv")))
      .join(broadcast(pqCodebookVectors(codebook)), Seq("blk"))
      .select(col("query_id"), col("blk"), col("code"),
        expr("cast(round(aggregate(zip_with(_adc_qsv, cv, " +
          "(a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) " +
          "* 1000000.0) as bigint)").as("dq"))
    val scored = enc.join(broadcast(dtab), Seq("blk", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("dq").as("d_sum"))
      .where(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d_sum").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Composed IVF→ADC top-k (FAISS-style IVFADC — the deployable ANN
    * index): coarse trained centroids prune the corpus to the query's
    * top-`nProbe` cells ([[ivfTopK]]'s probe/assignment halves), and
    * ranking INSIDE the probed cells runs on PQ codes via the
    * asymmetric-distance lookup ([[pqAdcTopK]]'s integer ADC) instead of
    * exact cosine — so query cost is (probed cells' population) × blocks
    * integer adds, never corpus × dim multiplies and never probed-cells
    * × dim either. An optional exact re-rank rescores only the top
    * `reRank` ADC candidates per query with true cosine — the standard
    * recall-restoring tail pass, bounded at reRank × dim per query.
    *
    * Scale shape: the corpus is touched by exactly TWO linear passes
    * that a production deployment persists — the coarse-cell assignment
    * ([[assignToCentroids]], partial-aggregatable argmax) and the PQ
    * encoding ([[pqEncode]], broadcast-join argmin); queries carry a
    * bounded (queries × blocks × codes) broadcast ADC table plus a
    * (queries × nProbe) probe list. Per-block distances are integer
    * micro-units so the block sum is an exact long under any aggregation
    * order; every cut ties deterministically (ADC pool on (d_sum, id),
    * re-rank on (sim desc, id)) — oracle-checkable end to end.
    *
    * @param centroids coarse quantizer (`cell`, `cvec array<double>`)
    * @param codebook  long-form [[pqFit]] output
    * @param reRank    0 = rank purely by ADC distance (output carries
    *                  `d_sum`); > 0 = exact-cosine re-rank of the top
    *                  `reRank` ADC candidates (output carries `sim`)
    */
  def ivfAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroids: DataFrame, codebook: DataFrame,
      blocks: Int, subDim: Int, k: Int, nProbe: Int = 2, reRank: Int = 0,
      roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pass 1 (persisted in production): coarse-cell assignment
    val assigned = assignToCentroids(df, idCol, vecCol, centroids, roundSim)
      .select(col(idCol).as("neighbor_id"), col("cell"))
    // pass 2 (persisted in production): PQ codes, blocks shorts per vector
    val enc = pqEncode(df, idCol, vecCol, codebook, blocks, subDim)
      .select(col(idCol).as("neighbor_id"), col("blk"), col("code"))
    val queries = df.where(queryPred)
    // probe ranking: a window over only the bounded query subset × k
    val scoredQ = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_ia_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_ia_qsim", round(cosine(col("_ia_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_ia_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_ia_rn", row_number().over(wp))
      .where(col("_ia_rn") <= nProbe).select(col("query_id"), col("cell"))
    // each corpus vector lives in exactly one cell, so (query, neighbor)
    // pairs are already unique — distinct kept for contract clarity
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    // the classic ADC lookup table: queries × blocks × codes, tiny
    val dtab = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_ia_dqv"))
      .select(col("query_id"), posexplode(expr(
          s"transform(sequence(0, $blocks - 1), " +
            s"b -> slice(_ia_dqv, b * $subDim + 1, $subDim))"))
        .as(Seq("blk", "_ia_qsv")))
      .join(broadcast(pqCodebookVectors(codebook)), Seq("blk"))
      .select(col("query_id"), col("blk"), col("code"),
        expr("cast(round(aggregate(zip_with(_ia_qsv, cv, " +
          "(a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) " +
          "* 1000000.0) as bigint)").as("dq"))
    val scored = cand.join(enc, Seq("neighbor_id"))
      .join(broadcast(dtab), Seq("query_id", "blk", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("dq").as("d_sum"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("d_sum").asc, col("neighbor_id").asc)
    val adcRanked = scored.withColumn("adc_rank", row_number().over(wa))
    if (reRank <= 0)
      adcRanked.where(col("adc_rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("d_sum"),
          col("adc_rank").as("rank"))
    else {
      val pool = adcRanked.where(col("adc_rank") <= reRank)
        .select("query_id", "neighbor_id")
      // exact cosine over the bounded pool only; query vectors broadcast
      // by contract, the corpus side joins UNHINTED (the ann04/tx08 rule)
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_ia_qvec"))
      val n = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("_ia_nvec"))
      val rr = pool.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(cosine(col("_ia_qvec"), col("_ia_nvec")), roundSim).as("sim"))
      val wr = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      rr.withColumn("rank", row_number().over(wr)).where(col("rank") <= k)
    }
  }

  /** Residual IVF-PQ top-k — [[ivfAdcTopK]] upgraded to what production
    * FAISS IVFADC actually encodes (Jégou et al., TPAMI 2011 §IV):
    * the PQ codebook trains on and encodes RESIDUALS x − c(x) (each
    * vector minus its coarse centroid) instead of raw vectors. Residuals
    * concentrate near zero, so the same codebook budget spends its
    * codes on the part of the vector the coarse quantizer didn't
    * explain — the accuracy step that separates IVFADC from
    * IVF + raw-vector PQ. Queries compute a residual PER PROBED CELL
    * (q − c_probe), so the ADC table is (queries × nProbe × blocks ×
    * codes) — still a bounded broadcast.
    *
    * Scale shape: the corpus is touched by exactly the passes a
    * deployment persists — coarse assignment ([[assignToCentroids]]),
    * one narrow residual map (zip_with under the ≤ k-row centroid
    * broadcast), PQ encode ([[pqEncode]] on residuals); PQ training is
    * the bounded salted sample ([[pqFit]]). Ranking inside probed cells
    * is integer micro-unit ADC sums (exact longs under any aggregation
    * order), the top-`reRank` pool re-ranks by exact cosine on the RAW
    * vectors, and every cut ties deterministically — oracle-checkable
    * end to end.
    *
    * @param centroids coarse quantizer (`cell`, `cvec array<double>`)
    * @return (query_id, neighbor_id, sim, rank) — rank ≤ k by exact
    *         cosine over the ADC-selected pool
    */
  def ivfPqResidualTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroids: DataFrame, blocks: Int, subDim: Int,
      codesPerBlock: Int, iters: Int, samplePerCode: Int, k: Int,
      nProbe: Int = 2, reRank: Int = 20, roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pass 1 (persisted in production): coarse-cell assignment
    val assigned = assignToCentroids(df, idCol, vecCol, centroids, roundSim)
      .select(col(idCol).as("_ir_id"), col("cell"))
    // pass 2: residuals — one narrow map under the centroid broadcast;
    // read by PQ training AND encoding, so materialized once
    val vres = Exec.materializeLarge(
      df.select(col(idCol).as("_ir_id"),
          col(vecCol).cast("array<double>").as("_ir_v"))
        .join(assigned, "_ir_id").join(broadcast(centroids), "cell")
        .select(col("_ir_id"), col("cell"),
          expr("zip_with(_ir_v, cvec, (a, b) -> a - b)").as("_ir_r")))
    val cb = pqFit(vres, "_ir_id", "_ir_r", blocks, subDim, codesPerBlock,
      iters, samplePerCode = samplePerCode)
    // pass 3 (persisted in production): residual PQ codes
    val enc = pqEncode(vres, "_ir_id", "_ir_r", cb, blocks, subDim)
      .select(col("_ir_id").as("neighbor_id"), col("blk"), col("code"))
    // probe ranking over the bounded query subset
    val scoredQ = df.where(queryPred)
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_ir_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_ir_qsim", round(cosine(col("_ir_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_ir_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_ir_rn", row_number().over(wp))
      .where(col("_ir_rn") <= nProbe)
      .select(col("query_id"), col("cell"), col("_ir_qv"), col("cvec"))
    // per-(query, probed cell) residual → ADC lookup table
    // (queries × nProbe × blocks × codes rows, broadcast)
    val qres = probes
      .withColumn("_ir_qr", expr("zip_with(_ir_qv, cvec, (a, b) -> a - b)"))
      .select(col("query_id"), col("cell"), posexplode(expr(
          s"transform(sequence(0, $blocks - 1), " +
            s"b -> slice(_ir_qr, b * $subDim + 1, $subDim))"))
        .as(Seq("blk", "_ir_qsv")))
    val dtab = qres.join(broadcast(pqCodebookVectors(cb)), Seq("blk"))
      .select(col("query_id"), col("cell"), col("blk"), col("code"),
        expr("cast(round(aggregate(zip_with(_ir_qsv, cv, " +
          "(a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x) " +
          "* 1000000.0) as bigint)").as("dq"))
    // each corpus vector lives in exactly one cell → (query, neighbor)
    // candidates are unique without a distinct
    val cand = probes.select("query_id", "cell")
      .join(assigned.select(col("_ir_id").as("neighbor_id"), col("cell")),
        Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
    val scored = cand.join(enc, Seq("neighbor_id"))
      .join(broadcast(dtab), Seq("query_id", "cell", "blk", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("dq").as("d_sum"))
    val wa = Window.partitionBy("query_id")
      .orderBy(col("d_sum").asc, col("neighbor_id").asc)
    val pool = scored.withColumn("_ir_arn", row_number().over(wa))
      .where(col("_ir_arn") <= reRank).select("query_id", "neighbor_id")
    // exact cosine over the bounded pool on RAW vectors (residual codes
    // selected the pool; similarity is still defined on the originals)
    val q = df.where(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("_ir_qvec"))
    val n = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("_ir_nvec"))
    val rr = pool.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_ir_qvec"), col("_ir_nvec")), roundSim).as("sim"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    rr.withColumn("rank", row_number().over(wr)).where(col("rank") <= k)
  }

  /** Per-dimension scalar-quantization stats (the FAISS SQ8 trainer):
    * one linear pass reducing the corpus to ≤ dims rows of (dim, mn,
    * mx) — [[sqEncode]] derives each dimension's symmetric scale
    * max(|mn|, |mx|) from it. At 100 TB this table IS the trained index
    * metadata: dims rows, persisted once, broadcast everywhere.
    *
    * @return [dim (0-based), mn, mx]
    */
  def sqStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "_sq_x")))
      .groupBy("dim").agg(min("_sq_x").as("mn"), max("_sq_x").as("mx"))

  /** Symmetric int8 encoding: each dimension scaled to an integer code
    * in [−127, 127] — `round(x · 127 / s)` with the per-dim scale
    * s = max(|mn|, |mx|); all-zero dimensions code 0. SYMMETRIC (no
    * offset) on purpose: the integer dot of two codes is then
    * `Σ q_i·x_i·(127/s_i)²` — a faithful dot-product proxy — where an
    * affine [0, 255] map's offset terms (`−Σ s_i²·mn_i(q_i + x_i)`)
    * dominate the score and wreck the ranking (measured: pool-20
    * containment of the true top-10 went 0.08 → 0.98 on the test
    * corpus when this switched from affine to symmetric). One broadcast
    * of the ≤ dims-row stats table + one linear map pass; 8×
    * compression against float32 (the deployable artifact a production
    * index persists). The scale map is the one float step, mirrored
    * op-for-op in the oracle; codes are exact integers from there on.
    *
    * @return [_sq_id, _sq_c] — codes as a bigint array
    */
  def sqEncode(df: DataFrame, idCol: String, vecCol: String,
      stats: DataFrame): DataFrame = {
    // dims-row stats → one aligned scale array (array_sort on the
    // struct orders by the leading dim field — deterministic)
    val sx = stats.agg(
        expr("array_sort(collect_list(struct(dim, " +
          "greatest(abs(mn), abs(mx)) as s)))").as("_s"))
      .select(expr("transform(_s, x -> x.s)").as("_sq_ss"))
    df.select(col(idCol).as("_sq_id"),
        col(vecCol).cast("array<double>").as("_sq_e"))
      .crossJoin(broadcast(sx))
      .select(col("_sq_id"), expr(
        "transform(sequence(1, size(_sq_e)), i -> " +
          "IF(element_at(_sq_ss, i) = 0D, 0L, " +
          "cast(round(element_at(_sq_e, i) * 127 " +
          "/ element_at(_sq_ss, i)) as bigint)))").as("_sq_c"))
  }

  /** Scalar-quantized (SQ8) top-k with exact re-rank — the third member
    * of the quantized-ANN family next to PQ/ADC ([[pqAdcTopK]]) and
    * IVFADC ([[ivfAdcTopK]]): vectors are L2-normalized (so the code
    * dot tracks cosine, not norm-mixed raw dot), then candidates ranked
    * by the INTEGER dot product of 8-bit codes (the symmetric quantized
    * scan — n × dims byte-range multiplies on an 8× smaller corpus, no
    * float per candidate), then the top `pool` per query re-ranked by exact
    * cosine (the recall-restoring tail pass, bounded at pool × dim per
    * query). Code dots are exact longs (|dot| ≤ dims · 127² ≈ 10⁶ — no
    * overflow at any dim that fits a vector), so both engines rank
    * identically with ties to the lower neighbor id.
    *
    * Scale shape: train = one linear pass to ≤ dims rows ([[sqStats]]);
    * encode = one linear map pass under a dims-row broadcast
    * ([[sqEncode]] — the persisted artifact); scan = corpus × queries
    * integer dots with the bounded query codes broadcast; re-rank
    * touches pool × queries vectors via unhinted id equi-joins.
    *
    * @return (query_id, neighbor_id, sim, rank) — rank ≤ k by exact
    *         cosine over the SQ-selected pool
    */
  def sqTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int = 10, pool: Int = 20,
      roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // L2-normalize BEFORE quantizing (the standard cosine-metric SQ
    // practice): on unit vectors the integer code dot is a monotone
    // cosine proxy, where on raw vectors it mixes in the norms and
    // mis-ranks. Zero vectors stay as-is (coded mid-range, harmless).
    // The norm is a STAGED column — an inlined tree would re-evaluate
    // the whole-array aggregate once per element (the minhash 100x
    // lesson, see verify gotchas).
    val vnorm = df
      .select(col(idCol).as("_sq_vid"),
        col(vecCol).cast("array<double>").as("_sq_raw"))
      .withColumn("_sq_nrm",
        sqrt(expr("aggregate(_sq_raw, 0D, (a, x) -> a + x * x)")))
      .select(col("_sq_vid"),
        when(col("_sq_nrm") === 0d, col("_sq_raw"))
          .otherwise(expr("transform(_sq_raw, x -> x / _sq_nrm)"))
          .as("_sq_ne"))
    val enc = Exec.materializeLarge(
      sqEncode(vnorm, "_sq_vid", "_sq_ne", sqStats(vnorm, "_sq_ne")))
    val q = broadcast(
      df.where(queryPred).select(col(idCol).as("_sq_id"))
        .join(enc, "_sq_id")
        .select(col("_sq_id").as("query_id"), col("_sq_c").as("_qc")))
    // the scan — corpus × queries code dots — runs the fused native
    // expression (one codegen'd loop, no per-row product array); the HOF
    // composition is the dependency-free fallback. Integer arithmetic:
    // both forms are exact and identical, this is purely the hot path.
    def longDot(a: Column, b: Column): Column =
      org.apache.spark.sql.SparkSession.getActiveSession match {
        case Some(s) => graft.functions.LongDotProduct.dotNative(s, a, b)
        case None => expr(
          "aggregate(zip_with(_qc, _nc, (a, b) -> a * b), 0L, " +
            "(acc, x) -> acc + x)")
      }
    val scored = enc
      .select(col("_sq_id").as("neighbor_id"), col("_sq_c").as("_nc"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        longDot(col("_qc"), col("_nc")).as("score_int"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("score_int").desc, col("neighbor_id").asc)
    val pooled = scored.withColumn("_sq_rn", row_number().over(wp))
      .where(col("_sq_rn") <= pool).select("query_id", "neighbor_id")
    // exact cosine over the bounded pool only; query side broadcast by
    // contract, the corpus side joins UNHINTED (the ann04/tx08 rule)
    val qv = df.where(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("_sq_qv"))
    val nv = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("_sq_nv"))
    val rr = pooled.join(broadcast(qv), Seq("query_id")).join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_sq_qv"), col("_sq_nv")), roundSim).as("sim"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    rr.withColumn("rank", row_number().over(wr)).where(col("rank") <= k)
  }

  /** Cell count for corpus-scaled k-means (the [[scaledAxisCount]] move
    * applied to SemDeDup): k = clamp(ceil(n / targetCell), 4, 4096), so
    * expected cell population stays ~`targetCell` as the corpus grows
    * instead of cells growing O(n) at fixed k — which made the
    * within-cell pair scan O(n²/k), quadratic (VERDICT r8 #1). Pure
    * integer math so an engine mirroring the formula (the dd13 oracle's
    * `kp` CTE) lands on the identical k. The 4096 cap bounds the
    * centroid broadcast (4096 × dim doubles ≪ a megabyte) and the n×k
    * assignment compute; past it, per-cell population grows again and
    * [[subBucketAxisCount]]'s within-cell sign-plane split takes over as
    * the pair-scan bound — so the pair count stays ~linear at ANY n
    * while the broadcast stays bounded.
    */
  def scaledCellCount(n: Long, targetCell: Int = 64): Int =
    math.min(4096L, math.max(4L, (n + targetCell - 1) / targetCell)).toInt

  /** Within-cell sub-bucket width, derived from the CELL'S OWN size: the
    * number of sign-plane axes (0..`maxAxes`) such that 2^axes
    * sub-buckets hold ~`targetCell` vectors each. 0 for cells already at
    * target (no split — empty bucket string), growing log2 with cell
    * size so one dense/skewed cell cannot go quadratic even when the
    * global k is right on average. Integer CASE ladder, mirrored
    * verbatim in the dd13 oracle — no float-log boundary risk.
    * `cellSize / targetCell` is exact in doubles when `targetCell` is a
    * power of two; callers keep the default 64.
    */
  def subBucketAxisCount(cellSize: Column, targetCell: Int = 64,
      maxAxes: Int = 8): Column = {
    val m = floor((cellSize + lit(targetCell - 1)) / lit(targetCell)).cast("long")
    val ladder = (1 to maxAxes).foldLeft(when(m <= 1, lit(0))) {
      case (acc, a) => acc.when(m <= (1L << a), lit(a))
    }
    ladder.otherwise(lit(maxAxes))
  }

  /** SemDeDup-style semantic near-duplicate pairs: vectors assign to
    * trained centroids ([[assignToCentroids]]), then pairs are scored
    * ONLY within a (cell, sub-bucket) partition — never corpus × corpus.
    * Two nested bounds keep the pair scan ~linear in n at any scale:
    *  1. the CALLER derives the cell count from the corpus size
    *     ([[scaledCellCount]]) so expected cell population is ~target;
    *  2. cells that still come out dense (skewed data, or n past the
    *     4096-cell broadcast cap) are split by [[subBucketAxisCount]]
    *     sign-plane sub-buckets sized from each cell's own population.
    * Pairs across sub-buckets are unscored by design — the approximation
    * every clustering dedup makes, mirrored op-for-op in the oracle.
    *
    * Scale shape: one bounded centroid broadcast + argmax, one count per
    * cell (tiny, k rows), one equi-join on the fixed-width
    * (cell, bucket) key. The assigned-vector table is O(corpus) bytes →
    * [[Exec.materializeLarge]] (DISK_ONLY, lineage kept).
    *
    * @param maxSignAxes sign string is built once from the first
    *        `maxSignAxes` coordinates; each cell keeps a prefix of it
    */
  /** Pair-scan telemetry from the most recent [[semanticNearDupPairs]]
    * call in this JVM: trained-cell count, candidate-pair total, and the
    * largest (cell, sub-bucket) partition the pair join sees. Exists so
    * the bench's sf1 probe can publish the pair-scan bound as measured
    * numbers at both scales every round (the dd06_cc pattern — VERDICT
    * r9 #6). Computed from the already-materialized assignment table
    * (one cheap aggregate over DISK_ONLY-cached rows). Diagnostic only;
    * single-writer per run, volatile for cross-thread reads.
    */
  @volatile var lastSemanticStats: Option[SemStats] = None
  final case class SemStats(cells: Long, candidatePairs: Long,
      maxPartitionRows: Long)

  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double, roundSim: Int = 6,
      targetCell: Int = 64, maxSignAxes: Int = 8, probes: Int = 1): DataFrame =
    semanticNearDupPairsWithStats(df, idCol, vecCol, centroids, threshold,
      roundSim, targetCell, maxSignAxes, probes)._1

  /** [[semanticNearDupPairs]] plus the pair-scan stats as a RETURN VALUE
    * — the caller-safe channel (ADVICE r16 #3: dd28 baked the
    * [[lastSemanticStats]] global into its plan as a literal, so any
    * interleaved call between its probes=1 and probes=2 invocations
    * would silently publish the wrong n_cand_pairs). The global is
    * still written (the bench's dd13 telemetry snapshot reads it), but
    * a caller that needs ITS OWN call's stats takes them from here.
    */
  def semanticNearDupPairsWithStats(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, threshold: Double,
      roundSim: Int = 6, targetCell: Int = 64, maxSignAxes: Int = 8,
      probes: Int = 1): (DataFrame, SemStats) = {
    // probes > 1 = multi-probe assignment (dd28's measured finding: the
    // single-cell bound loses boundary-straddling pairs — probing each
    // vector's 2 nearest cells recovers them for a ~2x candidate-pair
    // cost, both sides of the trade published by dd28). Pairs found in
    // two shared cells dedup below.
    val assigned =
      if (probes <= 1) assignToCentroids(df, idCol, vecCol, centroids, roundSim)
        .withColumn("probe", lit(1))
      else assignTopCells(df, idCol, vecCol, centroids, probes, roundSim)
    val withVec = Exec.materializeLarge(
      assigned.join(df.select(col(idCol), col(vecCol)), idCol)
        .select(col("cell"), col("probe").as("_sd_probe"),
          col(idCol).as("_sd_id"),
          col(vecCol).cast("array<double>").as("_sd_vec"))
        .withColumn("_sd_sign", signBucket(col("_sd_vec"), 0 until maxSignAxes)))
    // Sub-bucket geometry derives from the PRIMARY assignment's cell
    // sizes, not the probe-inflated ones (the FAISS IVF discipline: more
    // probes widen candidate generation, they never re-split the lists).
    // This keeps probes = 2 a strict superset of probes = 1 — a pair
    // detected under the single-probe geometry shares a cell where both
    // members are primary, and that cell's axes are unchanged. Cells
    // with NO primary members (possible only under multi-probe) size
    // their ladder from their own multi-probe population, so a dense
    // secondary-only cell still cannot go quadratic.
    val cellSizes = withVec.groupBy("cell").agg(
        count(lit(1)).as("_sd_all"),
        sum(when(col("_sd_probe") === 1, 1L).otherwise(0L)).as("_sd_prim"))
      .withColumn("_sd_cn",
        when(col("_sd_prim") > 0, col("_sd_prim")).otherwise(col("_sd_all")))
      .withColumn("_sd_axes", subBucketAxisCount(col("_sd_cn"), targetCell, maxSignAxes))
      .select(col("cell"), col("_sd_axes"))
    // k rows — bounded by scaledCellCount's cap, safe to broadcast
    val keyed = withVec.join(broadcast(cellSizes), "cell")
      .withColumn("_sd_bucket", col("_sd_sign").substr(lit(1), col("_sd_axes")))
      .select(col("cell"), col("_sd_bucket"), col("_sd_id"), col("_sd_vec"))
    // telemetry: one aggregate over the cached assignment (coalesce —
    // sum()/max() are NULL on an empty corpus, ADVICE r9)
    val statsRow = keyed.groupBy("cell", "_sd_bucket").agg(count(lit(1)).as("c"))
      .select(coalesce(countDistinct(col("cell")), lit(0L)).as("cells"),
        coalesce(sum((col("c") * (col("c") - 1) / 2).cast("long")), lit(0L)).as("pairs"),
        coalesce(max(col("c")), lit(0L)).as("maxPart"))
      .collect()(0)
    val stats = SemStats(statsRow.getLong(0), statsRow.getLong(1),
      statsRow.getLong(2))
    lastSemanticStats = Some(stats)
    val l = keyed.select(col("cell"), col("_sd_bucket"),
      col("_sd_id").as("id1"), col("_sd_vec").as("_sd_v1"))
    val r = keyed.select(col("cell"), col("_sd_bucket"),
      col("_sd_id").as("id2"), col("_sd_vec").as("_sd_v2"))
    val pairs = l.join(r, Seq("cell", "_sd_bucket"))
      .where(col("id1") < col("id2"))
      .withColumn("sim", round(cosine(col("_sd_v1"), col("_sd_v2")), roundSim))
      .where(col("sim") >= threshold)
      .select(col("cell"), col("id1"), col("id2"), col("sim"))
    val out =
      if (probes <= 1) pairs
      else pairs.groupBy("id1", "id2") // a pair can share 2 probed cells
        .agg(min("cell").as("cell"), max("sim").as("sim"))
        .select(col("cell"), col("id1"), col("id2"), col("sim"))
    (out, stats)
  }

  /** Incremental semantic near-dup: a NEW batch of vectors deduped
    * against an EXISTING corpus through persisted trained centroids —
    * the batch-vs-history variant of [[semanticNearDupPairs]], completing
    * the incremental triad (dd08 MinHash, dd14 substring spans, this for
    * embeddings). Mirrors the reference's only dedup semantics: new rows
    * against the persisted snapshot
    * (`crawler/src/procedure_code.py:763-772`).
    *
    * Daily cost is O(batch), never O(corpus): the history side's
    * (cell, sub-bucket) assignment table is computed once — at scale it
    * is PERSISTED, bucketed on the join key, exactly like dd08's band
    * index and dd14's positional-shingle index — and each batch (a)
    * assigns against the bounded centroid broadcast
    * ([[assignToCentroids]], one partial-aggregatable argmax pass over
    * the batch only), then (b) equi-joins history WITHIN its
    * (cell, sub-bucket) only. Batch×batch pairs are out of scope by
    * design (they join the history index tomorrow); history×history
    * pairs were scored when history was ingested.
    *
    * Sub-bucket widths derive from HISTORY cell populations only (the
    * dd14 discipline: history-side stats never need recomputing as
    * batches arrive), so a batch row lands in the same bucket today as
    * the history rows did at index-build time. A batch row assigned to a
    * cell with no history members has nothing to collide with and drops
    * out at the width join.
    *
    * @return (cell, new_id, existing_id, sim) — one row per batch×history
    *         pair in the same (cell, sub-bucket) with cosine ≥ threshold
    */
  def incrementalSemanticNearDup(newDf: DataFrame, historyDf: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      threshold: Double, roundSim: Int = 6, targetCell: Int = 64,
      maxSignAxes: Int = 8): DataFrame = {
    // history index: (cell, bucket, id, vec) — O(history) bytes, derived
    // once; DISK_ONLY because the width aggregate AND the pair join both
    // read it (at scale this is the persisted table, not a cache)
    val histKeyed = Exec.materializeLarge(
      assignToCentroids(historyDf, idCol, vecCol, centroids, roundSim)
        .join(historyDf.select(col(idCol), col(vecCol)), idCol)
        .select(col("cell"), col(idCol).as("_is_id"),
          col(vecCol).cast("array<double>").as("_is_vec"))
        .withColumn("_is_sign", signBucket(col("_is_vec"), 0 until maxSignAxes)))
    // k rows, bounded by scaledCellCount's cap — safe to broadcast
    val widths = histKeyed.groupBy("cell").agg(count(lit(1)).as("_is_cn"))
      .withColumn("_is_axes", subBucketAxisCount(col("_is_cn"), targetCell, maxSignAxes))
      .select(col("cell"), col("_is_axes"))
    val hist = histKeyed.join(broadcast(widths), "cell")
      .select(col("cell"),
        col("_is_sign").substr(lit(1), col("_is_axes")).as("_is_bucket"),
        col("_is_id").as("existing_id"), col("_is_vec").as("_is_hv"))
    val batch = assignToCentroids(newDf, idCol, vecCol, centroids, roundSim)
      .join(newDf.select(col(idCol), col(vecCol)), idCol)
      .select(col("cell"), col(idCol).as("new_id"),
        col(vecCol).cast("array<double>").as("_is_nv"))
      .withColumn("_is_sign", signBucket(col("_is_nv"), 0 until maxSignAxes))
      .join(broadcast(widths), "cell") // no history in cell → no pairs
      .select(col("cell"),
        col("_is_sign").substr(lit(1), col("_is_axes")).as("_is_bucket"),
        col("new_id"), col("_is_nv"))
    batch.join(hist, Seq("cell", "_is_bucket"))
      .withColumn("sim", round(cosine(col("_is_nv"), col("_is_hv")), roundSim))
      .where(col("sim") >= threshold)
      .select(col("cell"), col("new_id"), col("existing_id"), col("sim"))
  }

  /** Diagnostic (spec support): within-(cell, sub-bucket) candidate pair
    * count for a corpus assigned with [[scaledCellCount]]-many trained
    * cells — the number that must grow ~linearly with n for
    * [[semanticNearDupPairs]] to survive a 100× scale-up — plus the
    * largest single partition the pair scan would see (the pinned
    * cell-size bound).
    *
    * @return (candidatePairs, maxPartitionRows)
    */
  def semanticCandidateStats(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, targetCell: Int = 64,
      maxSignAxes: Int = 8): (Long, Long) = {
    val assigned = assignToCentroids(df, idCol, vecCol, centroids)
    val withVec = assigned.join(df.select(col(idCol), col(vecCol)), idCol)
      .select(col("cell"),
        signBucket(col(vecCol).cast("array<double>"), 0 until maxSignAxes).as("_sd_sign"))
    val cellSizes = withVec.groupBy("cell").agg(count(lit(1)).as("_sd_cn"))
      .withColumn("_sd_axes", subBucketAxisCount(col("_sd_cn"), targetCell, maxSignAxes))
      .select(col("cell"), col("_sd_axes"))
    val row = withVec.join(broadcast(cellSizes), "cell")
      .select(col("cell"), col("_sd_sign").substr(lit(1), col("_sd_axes")).as("_sd_bucket"))
      .groupBy("cell", "_sd_bucket").agg(count(lit(1)).as("c"))
      // coalesce: sum()/max() are NULL on an empty corpus (ADVICE r9)
      .select(coalesce(sum((col("c") * (col("c") - 1) / 2).cast("long")), lit(0L))
          .as("pairs"),
        coalesce(max(col("c")), lit(0L)).as("maxPart"))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** FILTERED vector search (the production "top-k with a metadata
    * predicate" feature): each query's k nearest neighbors among ONLY
    * the corpus vectors sharing its `attrCol` value — retrieval
    * constrained to a tenant / language / license class. The filter is
    * applied at CANDIDATE GENERATION (pre-filter), not by over-fetching
    * and discarding (post-filter): the attribute equality rides the
    * same equi-join as the probed cell, so candidate volume is the
    * filtered population of probed cells and recall within probed
    * cells is exact for the filtered set — the failure mode of
    * post-filtering (k results all filtered away) cannot occur.
    *
    * Same [[ivfTopK]] scale shape otherwise: one corpus assignment
    * pass, probe window over only the bounded query subset, exact
    * cosine solely on (cell, attr)-matched candidates.
    */
  def ivfFilteredTopK(corpus: DataFrame, queryPred: Column,
      centroids: DataFrame, attrCol: String, k: Int, nProbe: Int = 2,
      roundSim: Int = 6, sameAttr: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignToCentroids(corpus, "id", "vec", centroids, roundSim)
      .join(corpus.select(col("id"), col(attrCol)), Seq("id"))
      .select(col("id").as("neighbor_id"), col("cell"), col(attrCol))
    val queries = corpus.where(queryPred)
    val scoredQ = queries
      .select(col("id").as("query_id"), col("vec").cast("array<double>").as("_fv_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_fv_qsim", round(cosine(col("_fv_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_fv_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_fv_rn", row_number().over(wp))
      .where(col("_fv_rn") <= nProbe).select(col("query_id"), col("cell"))
      .join(queries.select(col("id").as("query_id"), col(attrCol)), Seq("query_id"))
    // sameAttr=true: the production "top-k within a tenant/label" filter
    // (the attr equality rides the cell equi-join — pre-filter, never
    // post-filter-and-discard). sameAttr=false: HARD-NEGATIVE MINING —
    // nearest candidates with a DIFFERENT label (contrastive-training
    // pairs), same candidate-bounded shape with the label inequality as
    // a residual predicate on the cell join.
    val cand = (if (sameAttr) probes.join(assigned, Seq("cell", attrCol))
      else probes.join(
          assigned.withColumnRenamed(attrCol, "_fv_nattr"), Seq("cell"))
        .where(col("_fv_nattr") =!= col(attrCol))
        .drop("_fv_nattr"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", attrCol)
    val q = queries.select(col("id").as("query_id"), col("vec").as("_fv_qvec"))
    val n = corpus.select(col("id").as("neighbor_id"), col("vec").as("_fv_nvec"))
    val scored = cand.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col(attrCol),
        round(cosine(col("_fv_qvec"), col("_fv_nvec")), roundSim).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF RANGE search (the vector database's second serving mode next
    * to top-k — FAISS `range_search`: ALL corpus vectors within a
    * similarity threshold of each query, the candidate-set retrieval a
    * near-duplicate audit or recall-oriented miner wants when the
    * result size is data-dependent): candidate generation identical to
    * [[ivfFilteredTopK]] (one-pass assignment against the shared
    * trained quantizer; each query probes its top-`nProbe` cells), but
    * the threshold REPLACES the rank window — no per-query sort
    * anywhere, so serving is one candidate-bounded equi-join + a
    * filter. Approximate exactly the way IVF top-k is: the only misses
    * are vectors whose cell the query does not probe.
    *
    * The threshold compares the ROUNDED similarity (`roundSim` decimal
    * places, the dd05/ann15 convention), so the boundary is
    * engine-exact.
    */
  def ivfRangeSearch(corpus: DataFrame, queryPred: Column,
      centroids: DataFrame, tau: Double, nProbe: Int = 2,
      roundSim: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assignToCentroids(corpus, "id", "vec", centroids, roundSim)
      .select(col("id").as("neighbor_id"), col("cell"))
    val queries = corpus.where(queryPred)
    val scoredQ = queries
      .select(col("id").as("query_id"), col("vec").cast("array<double>").as("_fv_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_fv_qsim", round(cosine(col("_fv_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_fv_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_fv_rn", row_number().over(wp))
      .where(col("_fv_rn") <= nProbe).select(col("query_id"), col("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val q = queries.select(col("id").as("query_id"), col("vec").as("_fv_qvec"))
    val n = corpus.select(col("id").as("neighbor_id"), col("vec").as("_fv_nvec"))
    cand.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_fv_qvec"), col("_fv_nvec")), roundSim).as("sim"))
      .where(col("sim") >= tau)
  }

  /** k-NN GRAPH construction: every corpus vector's k nearest neighbors
    * among the vectors of its top-`nProbe` trained cells — the base
    * structure for graph-based clustering, SNN density estimation, and
    * graph-ANN index builds, where the "query set" is the corpus itself.
    *
    * [[ivfTopK]] cannot be pointed at the whole corpus: its probe
    * ranking is a window over the query set, and with n queries that
    * window shuffles n × cells rows. Here BOTH corpus-sized reductions
    * are k-bounded partial aggregations instead: the index side is the
    * usual one-pass argmax assignment ([[assignToCentroids]]), and the
    * probe side ranks top-`nProbe` cells per vector with a
    * [[graft.functions.TopKAggregator]] — map-side combine reduces each
    * partition to ≤ nProbe rows per vector before the exchange, so the
    * shuffle carries O(n × nProbe) no matter how many cells the
    * centroid table has. Candidates are the (cell) equi-join of probes
    * × assignments (≈ n × nProbe × cell population, never n²); each
    * (query, neighbor) pair arises at most once because a neighbor is
    * assigned to exactly one cell. Exact cosine runs only on
    * candidates, via two unhinted vector equi-joins; the final top-k is
    * the same k-bounded aggregation. Determinism: rounded cosine,
    * (score desc, id asc) ties everywhere — oracle-checkable.
    *
    * Recall caveat (shared with every probed-cell op here): a true
    * neighbor assigned outside the query's `nProbe` closest cells is
    * missed; raise `nProbe` to trade cost for recall.
    *
    * @param centroids trained table (`cell` numeric, `cvec array<double>`)
    * @return [query_id, rank, neighbor_id, sim], ranks 1..k
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int, nProbe: Int = 2,
      roundSim: Int = 6): DataFrame = {
    import df.sparkSession.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val base = Exec.materializeForSelfJoin(
      df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec")))
    val assigned = assignToCentroids(base, "id", "vec", centroids, roundSim)
      .select(col("id").as("neighbor_id"), col("cell"))
    val probeScored = base
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("cell").cast("long").as("c"),
        round(cosine(col("vec"), col("cvec")), roundSim).as("s"))
      .as[(Long, Long, Double)]
    val probes = probeScored.groupByKey(_._1)
      .mapValues { case (_, cellId, sim) => Scored(cellId, sim) }
      .agg(new TopKAggregator(nProbe).toColumn.name("pc"))
      .toDF("query_id", "pc")
      .select(col("query_id"), explode(col("pc")).as("p"))
      .select(col("query_id"), col("p.id").as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val qv = base.select(col("id").as("query_id"), col("vec").as("_kg_qv"))
    val nv = base.select(col("id").as("neighbor_id"), col("vec").as("_kg_nv"))
    val scored = cand.join(qv, Seq("query_id")).join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("_kg_qv"), col("_kg_nv")), roundSim).as("sim"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .mapValues { case (_, nid, sim) => Scored(nid, sim) }
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("neighbor_id"), col("s.score").as("sim"))
  }

  /** Graph-ANN SEARCH over a prebuilt k-NN graph ([[knnGraph]] output)
    * — the HNSW/NSG-style serving complement of the IVF family
    * (VERDICT r12 #3): instead of scanning every vector of the query's
    * probed cells, start from per-cell ENTRY POINTS and walk the
    * graph's proximity edges a fixed number of rounds, then exact-
    * cosine re-rank only the visited pool. Graph edges cross cell
    * boundaries (a node's neighbors live in ITS probed cells, not the
    * query's), so the walk escapes the query's nProbe-cell horizon —
    * the recall ceiling every probed-cell op here shares.
    *
    * Relational formulation (the dd06 bounded-iteration discipline, not
    * a sequential beam): seeds = the minimum vector id of each of the
    * query's top-`nProbe` cells (deterministic entry points, the role
    * HNSW's fixed entry node plays) PLUS the query's own graph node —
    * queries here are corpus members (the [[knnGraph]] setting), so the
    * warm start makes the visited pool a SUPERSET of the query's
    * outgoing k-NN edges, which are exactly the ivfTopK result on the
    * same probes: recall ≥ the IVF arm by construction (truth items
    * globally dominate the rank order, so hits = min(|pool ∩ truth|,
    * k) is monotone in the pool). Each round expands the WHOLE
    * frontier at once via one equi-join on the undirected edge set
    * (src → dst), pruning already-visited nodes with an anti-join so a
    * round's join input is only the new rim. `rounds` bounds the walk:
    * the visited pool is ≤ seeds·(maxdeg+1)^rounds per query, and every
    * round is one shuffle on a two-long edge key — no per-query
    * sequential state, so 10^6 concurrent queries batch through the
    * same 2·`rounds` joins. The final exact re-rank is a window over
    * only the bounded query set's pools. Frontier/visited state is
    * fixed-width and loop-carried → localCheckpoint per round with
    * release of superseded handles (the connectedComponents pattern).
    *
    * Determinism: min-id entry points, set-union frontier, rounded
    * cosine with (sim desc, id asc) ties — oracle-replayable round by
    * round (the unpruned replay `seeds ∪ expand(seeds) ∪ expand²(seeds)`
    * reaches the identical visited set, since expand distributes over
    * union and re-expanding a visited node adds only visited nodes).
    *
    * @param edges k-NN graph as [query_id, neighbor_id] (directed;
    *              symmetrized here — HNSW likewise inserts back-links)
    * @return [query_id, rank, neighbor_id, sim], ranks 1..k
    */
  def graphAnnSearch(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, edges: DataFrame, queryPred: Column,
      k: Int, nProbe: Int = 2, rounds: Int = 2,
      roundSim: Int = 6): DataFrame =
    graphAnnSearchByDepth(df, idCol, vecCol, centroids, edges, queryPred,
        k, nProbe, rounds, roundSim)
      .where(col("depth") === rounds)
      .drop("depth")

  /** [[graphAnnSearch]] at EVERY depth 1..`maxRounds` in one pass — the
    * depth/recall curve's engine (ann18). One expansion walk tags each
    * visited node with its first-reach round; the pool is exact-cosine
    * scored ONCE (the expensive part — two corpus-sized vector joins),
    * and each depth's top-k is a window over the scored rows with
    * first-reach ≤ d. Running the single-depth search d times would
    * redo the assignment pass, the probe ranking, and the re-rank joins
    * per depth; here they are all paid once (the r12 dd21 lesson:
    * never re-execute a shared subplan per arm). Correctness: the
    * anti-join-pruned frontier's first-reach depth IS BFS depth, so
    * {node : fdepth ≤ d} equals the d-round visited set of the
    * single-depth walk, and the per-depth rank over the once-scored
    * pool is the same (sim desc, id asc) order.
    *
    * @return [query_id, depth, rank, neighbor_id, sim], depth 1..maxRounds
    */
  /** `warmStart = false` models the FOREIGN-query serving case: a query
    * vector that is not a corpus member has no graph node of its own, so
    * the walk starts from the per-cell entry points alone — the honest
    * cold-start configuration whose recall ann18's `graph_cold_r3` arm
    * measures against IVF (which serves foreign queries natively: its
    * probe ranking needs only the query vector). The warm-start superset
    * guarantee (pool ⊇ the ivf result) does NOT hold cold; depth buys it
    * back empirically.
    */
  def graphAnnSearchByDepth(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, edges: DataFrame, queryPred: Column,
      k: Int, nProbe: Int = 2, maxRounds: Int = 2,
      roundSim: Int = 6, warmStart: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rounds = maxRounds
    require(rounds >= 1 && rounds <= 8, "rounds must be in [1, 8]")
    val base = Exec.materializeForSelfJoin(
      df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec")))
    val assigned = assignToCentroids(base, "id", "vec", centroids, roundSim)
    // entry point per cell: the cell's minimum vector id — O(cells)
    // rows from one map-side-combinable min
    val ep = assigned.groupBy("cell").agg(min("id").as("node"))
    val queries = base.where(queryPred)
    val scoredQ = queries
      .select(col("id").as("query_id"), col("vec").as("_ga_qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("_ga_qsim", round(cosine(col("_ga_qv"), col("cvec")), roundSim))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("_ga_qsim").desc, col("cell").asc)
    val probes = scoredQ.withColumn("_ga_rn", row_number().over(wp))
      .where(col("_ga_rn") <= nProbe).select(col("query_id"), col("cell"))
    val entrySeeds = probes.join(ep, Seq("cell"))
      .select(col("query_id"), col("node"))
    val seeds = (if (warmStart)
        entrySeeds.unionByName(
          queries.select(col("id").as("query_id"), col("id").as("node")))
      else entrySeeds)
      .distinct()
      .withColumn("fdepth", lit(0))
    val und = Exec.materializeForSelfJoin(
      edges.select(col("query_id").as("src"), col("neighbor_id").as("dst"))
        .unionByName(
          edges.select(col("neighbor_id").as("src"), col("query_id").as("dst")))
        .distinct())
    var visited = Exec.materializeForSelfJoin(seeds)
    var frontier = visited
    for (r <- 1 to rounds) {
      val rim = frontier.join(und, frontier("node") === und("src"))
        .select(frontier("query_id"), und("dst").as("node")).distinct()
      // prune nodes already visited: re-expanding them can only re-reach
      // visited nodes (expand distributes over union), so the pruned
      // walk's visited set equals the unpruned one the oracle replays —
      // and a pruned node's tag is its FIRST-reach depth (= BFS depth)
      val next = Exec.materializeForSelfJoin(
        rim.join(visited.select("query_id", "node"),
            Seq("query_id", "node"), "left_anti")
          .withColumn("fdepth", lit(r)))
      val merged = Exec.materializeForSelfJoin(
        visited.unionByName(next))
      if (!(frontier eq visited)) Exec.releaseMaterialized(frontier)
      Exec.releaseMaterialized(visited)
      visited = merged
      frontier = next
    }
    Exec.releaseMaterialized(und)
    if (!(frontier eq visited)) Exec.releaseMaterialized(frontier)
    val pool = visited.where(col("node") =!= col("query_id"))
      .select(col("query_id"), col("node").as("neighbor_id"), col("fdepth"))
    val q = queries.select(col("id").as("query_id"), col("vec").as("_ga_qvec"))
    val n = base.select(col("id").as("neighbor_id"), col("vec").as("_ga_nvec"))
    // score the FULL pool once; each depth ranks its fdepth-<=-d subset
    val scored = Exec.materializeForSelfJoin(
      pool.join(broadcast(q), Seq("query_id")).join(n, Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("fdepth"),
          round(cosine(col("_ga_qvec"), col("_ga_nvec")), roundSim).as("sim")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    (1 to rounds).map { d =>
      scored.where(col("fdepth") <= d)
        .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
        .select(col("query_id"), lit(d).as("depth"), col("rank"),
          col("neighbor_id"), col("sim"))
    }.reduce(_ unionByName _)
  }

  /** Exact maximum-inner-product top-k (MIPS — the recommender /
    * cross-encoder-scoring objective, where a vector's NORM carries
    * signal and cosine's normalization would erase it: a long user
    * preference vector SHOULD outrank a short one pointing the same
    * way). Same bounded-query-broadcast shape as brute-force cosine:
    * the corpus streams once against the broadcast query block, scored
    * by the fused native integer dot ([[graft.functions.LongDotProduct]]
    * — one codegen'd loop, no per-row product array) over the
    * floor(x·2^20) quantization. Power-of-two scaling of doubles is
    * IEEE-exact and floor is total, so both engines produce bit-equal
    * scores and the (score desc, id) rank is a cross-engine total
    * order — no float rounding anywhere in the comparison path.
    * The per-query top-k window runs over the scored pairs, bounded by
    * |queries| · |corpus| with |queries| fixed.
    */
  def mipsTopK(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quant = Exec.materializeLarge(df.select(col(idCol).as("_mip_id"),
      expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1048576.0) as bigint))")
        .as("_mip_q")))
    val q = broadcast(
      df.where(queryPred).select(col(idCol).as("_mip_id"))
        .join(quant, "_mip_id")
        .select(col("_mip_id").as("query_id"), col("_mip_q").as("_qq")))
    def longDot(a: Column, b: Column): Column =
      org.apache.spark.sql.SparkSession.getActiveSession match {
        case Some(s) => graft.functions.LongDotProduct.dotNative(s, a, b)
        case None => expr(
          "aggregate(zip_with(_qq, _mip_q, (a, b) -> a * b), 0L, " +
            "(acc, x) -> acc + x)")
      }
    val scored = quant.join(q, col("query_id") =!= col("_mip_id"))
      .select(col("query_id"), col("_mip_id").as("neighbor_id"),
        longDot(col("_qq"), col("_mip_q")).as("dot_q"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot_q").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dot_q"), col("rank"))
  }

  /** Greedy k-center coreset (Gonzalez's farthest-point traversal — the
    * DIVERSITY-selection move of data curation: pick k points that
    * 2-approximate the optimal covering radius, so a pretraining subset
    * spans the embedding space instead of oversampling its dense
    * cores). Deterministic: the seed is the min id, each round adds the
    * point FARTHEST from the selected set (max min-distance, ties to
    * the smaller id), distances are exact integer squared-L2 over the
    * floor(x·2^20) quantization — no float anywhere, so both engines
    * traverse identically.
    *
    * Scale shape: the selection is INHERENTLY sequential in k (each
    * pick conditions the next), so the operator is k bounded passes,
    * each ONE broadcast-1-row distance update + min fold over the
    * corpus — never a pairwise join; the min-distance state is
    * fixed-width [id, md], localCheckpointed per round with superseded
    * handles released (the connectedComponents memory contract). The
    * argmax is a global TakeOrderedAndProject (every task keeps 1 row).
    *
    * @return [round (0-based pick order), vec id, dist2 (squared
    *         quantized L2 to the prior set; 0 for the seed)]
    */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    import org.apache.spark.sql.expressions.Window
    val quant = Exec.materializeForSelfJoin(df.select(col(idCol).as("_kc_id"),
      expr(s"transform($vecCol, x -> cast(floor(cast(x as double) * 1048576.0) as bigint))")
        .as("_kc_q")))
    // with fewer than k DISTINCT points the argmax would re-pick an
    // exhausted (md = 0) point — all remaining min-distances are 0 once
    // every distinct vector is selected — and emit duplicate coreset
    // rows. Row count is the wrong guard (≥ k rows can still be < k
    // distinct vectors); the distinct count rides the materialized
    // table, one cheap job next to the k passes it guards. With ≥ k
    // distinct vectors, every round has an unselected vector at md > 0,
    // so the descending argmax never lands on an exhausted point.
    require(quant.select("_kc_q").distinct().count() >= k,
      s"k-center needs at least k = $k distinct input points")
    def dist2(a: String, b: String): Column =
      expr(s"aggregate(zip_with($a, $b, " +
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
    val seed = quant.orderBy(col("_kc_id").asc).limit(1)
      .select(col("_kc_id").as("_c_id"), col("_kc_q").as("_c_q"))
    var selected = Exec.materializeForSelfJoin(
      seed.select(lit(0).as("round"), col("_c_id").as(idCol),
        lit(0L).as("dist2")))
    var minDist = Exec.materializeForSelfJoin(
      quant.crossJoin(broadcast(seed))
        .where(col("_kc_id") =!= col("_c_id"))
        .select(col("_kc_id"), col("_kc_q"),
          dist2("_kc_q", "_c_q").as("_md")))
    for (r <- 1 until k) {
      // the 1-row argmax is materialized ONCE per round: left lazy it
      // would be re-derived by both consumers below, scanning the
      // corpus-sized minDist twice per round
      val next = Exec.materializeForSelfJoin(
        minDist.orderBy(col("_md").desc, col("_kc_id").asc).limit(1)
          .select(col("_kc_id").as("_c_id"), col("_kc_q").as("_c_q"),
            col("_md").as("_c_md")))
      val sel2 = Exec.materializeForSelfJoin(selected.unionByName(
        next.select(lit(r).as("round"), col("_c_id").as(idCol),
          col("_c_md").as("dist2"))))
      // the picked id also leaves the candidate pool (its md is 0 and
      // could never win again given the distinct guard, but dropping it
      // keeps the invariant "minDist = unselected points" literal)
      val md2 = Exec.materializeForSelfJoin(
        minDist.crossJoin(broadcast(next.select(col("_c_id"), col("_c_q"))))
          .where(col("_kc_id") =!= col("_c_id"))
          .select(col("_kc_id"), col("_kc_q"),
            least(col("_md"), dist2("_kc_q", "_c_q")).as("_md")))
      Exec.releaseMaterialized(next)
      Exec.releaseMaterialized(selected)
      Exec.releaseMaterialized(minDist)
      selected = sel2
      minDist = md2
    }
    Exec.releaseMaterialized(minDist)
    selected
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998) — the retrieval-serving tail pass that stops a RAG context
    * window (or a hard-negative batch) filling with near-duplicates of
    * one neighbourhood: from each query's exact-cosine top-`poolK` pool,
    * greedily select `k` items maximizing
    * λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s).
    *
    * Determinism: similarities are rounded to integer NANO-units at
    * computation, λ enters as integer tenths (score = λ₁₀·rel_nano −
    * (10−λ₁₀)·red_nano, exact longs), every argmax ties to the smaller
    * neighbour id — so both engines pick identical chains. Round 1 has
    * no selected set: red = 0, i.e. the pick is the plain relevance
    * argmax (the standard MMR base case).
    *
    * Scale shape: queries are bounded by contract (`queryPred`, the
    * ann01 convention) and broadcast; the ONE corpus-sized pass is the
    * pool scoring. Everything after — the poolK×poolK pairwise table
    * and k greedy rounds of anti-join + max-aggregation + 1-row argmax
    * — runs on queries×poolK rows, materialized per round in the
    * k-center loop discipline.
    *
    * @return [query_id, neighbor_id, pick (1-based selection order),
    *          rel_nano, score_nano]
    */
  def mmrDiversify(df: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, poolK: Int, k: Int,
      lambdaTenths: Int = 7): DataFrame = {
    require(poolK >= k && k >= 1 && lambdaTenths >= 0 && lambdaTenths <= 10)
    import org.apache.spark.sql.expressions.Window
    val corpus = df.select(col(idCol).cast("long").as("_mid"),
      col(vecCol).as("_mv"))
    val queries = broadcast(corpus.where(queryPred)
      .select(col("_mid").as("query_id"), col("_mv").as("_qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rel_nano").desc, col("neighbor_id").asc)
    val pool = Exec.materializeForSelfJoin(
      corpus.join(queries, col("query_id") =!= col("_mid"))
        .withColumn("_sim_d", cosine(col("_qv"), col("_mv")))
        .select(col("query_id"), col("_mid").as("neighbor_id"),
          expr("cast(round(_sim_d * 1000000000.0) as bigint)").as("rel_nano"),
          col("_mv"))
        .withColumn("_prn", row_number().over(w)).where(col("_prn") <= poolK)
        .drop("_prn"))
    // pairwise sims INSIDE each pool: poolK² rows per query, equi-join
    // on the query key (never a corpus self-join)
    val pw = Exec.materializeForSelfJoin(
      pool.select(col("query_id"), col("neighbor_id").as("_a"), col("_mv").as("_av"))
        .join(pool.select(col("query_id"), col("neighbor_id").as("_b"),
          col("_mv").as("_bv")), "query_id")
        .where(col("_a") =!= col("_b"))
        .withColumn("_sim_d", cosine(col("_av"), col("_bv")))
        .select(col("query_id"), col("_a"), col("_b"),
          expr("cast(round(_sim_d * 1000000000.0) as bigint)").as("_s")))
    val slim = Exec.materializeForSelfJoin(
      pool.select("query_id", "neighbor_id", "rel_nano"))
    Exec.releaseMaterialized(pool)
    val pickW = Window.partitionBy("query_id")
      .orderBy(col("score_nano").desc, col("neighbor_id").asc)
    var sel = Exec.materializeForSelfJoin(
      slim.withColumn("score_nano", col("rel_nano") * lambdaTenths)
        .withColumn("_rn", row_number().over(pickW)).where(col("_rn") === 1)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("pick"),
          col("rel_nano"), col("score_nano")))
    for (p <- 2 to k) {
      val rem = slim.join(sel.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val red = rem
        .join(pw.withColumnRenamed("_a", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .join(sel.select(col("query_id"), col("neighbor_id").as("_b")),
          Seq("query_id", "_b"))
        .groupBy("query_id", "neighbor_id", "rel_nano")
        .agg(max("_s").as("_red"))
      val prev = sel
      sel = Exec.materializeForSelfJoin(prev.unionByName(
        red.withColumn("score_nano",
            col("rel_nano") * lambdaTenths - col("_red") * (10 - lambdaTenths))
          .withColumn("_rn", row_number().over(pickW)).where(col("_rn") === 1)
          .select(col("query_id"), col("neighbor_id"), lit(p).as("pick"),
            col("rel_nano"), col("score_nano"))))
      Exec.releaseMaterialized(prev)
    }
    Exec.releaseMaterialized(pw)
    Exec.releaseMaterialized(slim)
    sel
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard hybrid-retrieval combiner: each arm contributes
    * 10^9 `div` (kConst + rank) for every (query, candidate) it ranked,
    * candidates sum contributions across arms, the fused list is the
    * top-`topK` by that sum. All-integer (Spark `div` and DuckDB integer
    * `//` both truncate toward zero; operands are non-negative anyway),
    * so cross-engine parity is exact and ties break on the neighbour id.
    *
    * Arms are (query_id, neighbor_id, rank) frames — each already a
    * bounded per-query top-k, so the fusion input is |arms|·k rows per
    * query regardless of corpus size; the combine is one hash
    * aggregation on (query, candidate). CONTRACT (columns asserted —
    * ADVICE r15): each arm must carry all three columns. Duplicate
    * (query_id, neighbor_id) rows WITHIN one arm are collapsed to that
    * candidate's best (smallest) rank before fusing (VERDICT r16 #6) —
    * exactly the row a correctly-deduped producer would have emitted —
    * so n_arms counts arms (never duplicate emissions) and rrf_nano is
    * insensitive to a producer accidentally emitting a candidate twice.
    * The collapse is one extra hash aggregation over the already
    * per-query-bounded arm frames (|arms|·k rows per query), not a
    * corpus-scale pass.
    *
    * @return [query_id, neighbor_id, n_arms, rrf_nano, rank]
    */
  def rrfFuse(arms: Seq[DataFrame], kConst: Int = 60,
      topK: Int = 10): DataFrame = {
    require(arms.nonEmpty && kConst >= 0 && topK >= 1)
    arms.zipWithIndex.foreach { case (a, i) =>
      val missing = Seq("query_id", "neighbor_id", "rank")
        .filterNot(a.columns.contains)
      require(missing.isEmpty,
        s"rrfFuse arm $i is missing column(s) ${missing.mkString(", ")}: " +
          s"arms must be (query_id, neighbor_id, rank) per-query top-k frames")
    }
    import org.apache.spark.sql.expressions.Window
    val contrib = arms.map(_.groupBy(col("query_id"), col("neighbor_id"))
        .agg(min(col("rank")).as("_r"))
        .select(col("query_id"), col("neighbor_id"),
          expr(s"1000000000 div ($kConst + _r)").as("_c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy("query_id", "neighbor_id")
      .agg(count(lit(1)).cast("long").as("n_arms"),
        sum("_c").cast("long").as("rrf_nano"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_nano").desc, col("neighbor_id").asc)
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= topK)
  }
}
