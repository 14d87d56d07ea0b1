package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch building blocks shared by the batch catalog (q78,
  * q81) and the streaming monitors (q82): KMV daily sketches and the
  * sliding-window merge + estimator tail. Factored so the streaming
  * variant computes the IDENTICAL expression tree — the q76/tx15
  * shared-tail discipline.
  */
object SketchOps {

  /** The q46 KMV estimator over a sorted k-sketch column: exact count
    * when the sketch is short of k, else (k−1)·hashRange / kth-minimum.
    *
    * `hashRange` must be the size of the UNIFORM hash domain the sketch
    * values were drawn from; the default 2^60 matches the repo-wide
    * convention of hashing with the first 15 hex chars of md5
    * (`conv(substring(md5(x), 1, 15), 16, 10)` — see
    * [[dailyUserSketches]] and q46/q78). A caller sketching with a
    * different hash width MUST pass its own range or the estimate is
    * scaled by the width mismatch with no other signal (ADVICE r12).
    */
  def kmvEstimate(sk: Column, k: Int,
      hashRange: Double = 1.152921504606846976e18): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(hashRange)
        / element_at(sk, k).cast("double")))
      .cast("long")

  /** Registered KMV UDAF (k-bounded partial aggregation). */
  def kmvUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new graft.functions.KmvAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)

  /** Registered KMV sample-sketch UDAF (k-bounded (hash, value) pairs —
    * the quantile-sketch complement of [[kmvUdaf]]). Feed
    * `struct(h as "h", v as "v")` where `h` is a uniform hash of the ROW
    * identity and `v` the measured value.
    */
  def kmvPairUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new graft.functions.KmvPairAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.functions.KmvPair])

  /** The value at ceil(num/den · n) in the sketch's value order (the
    * percentile_disc convention), computed entirely inside the bounded
    * `array<struct<h,v>>` sketch column. The rank is the integer
    * `(n·num + den − 1) div den` — exact on both engines, no float rank.
    */
  def sampleQuantile(sk: Column, num: Int, den: Int): Column = {
    val vs = array_sort(transform(sk, x => x.getField("v")))
    val rank = floor((size(sk) * num + (den - 1)) / den).cast("int")
    // An empty sketch computes rank 0, and SQL arrays are 1-indexed —
    // element_at(vs, 0) THROWS rather than returning NULL. NULL is the
    // correct quantile of an empty (fully-filtered) group.
    when(size(sk) === 0, lit(null)).otherwise(element_at(vs, greatest(rank, lit(1))))
  }

  /** Per-day KMV(64) sketches of the md5-hashed user id — one bounded
    * sketch row per observed day, the persisted artifact of the
    * sliding-distinct pipeline. Input needs `ts` (timestamp) and
    * `user_id`.
    */
  def dailyUserSketches(events: DataFrame): DataFrame = {
    val kmv = kmvUdaf(64)
    events.select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("day").agg(kmv(col("h")).as("sk"))
  }

  /** The sliding-window tail over a per-day sketch table `[day, sk]`:
    * each day's sketch contributes to the ≤ 7 window days it can
    * affect (sequence(0,6) → equi-keys; NO range join), windows anchor
    * only on observed days, and the per-window union re-aggregates
    * through the same KMV (union-take-k IS sketch merge — exact for
    * the k minima). Returns `[day, n_days, est_7d]`.
    */
  def slidingDistinct7d(daily: DataFrame): DataFrame = {
    val kmv = kmvUdaf(64)
    val days = daily.select(col("day").as("wday"))
    val contrib = daily
      .select(col("day").as("sday"), col("sk"),
        explode(expr("sequence(0, 6)")).as("off"))
      .withColumn("wday",
        date_format(date_add(to_date(col("sday")), col("off")), "yyyy-MM-dd"))
      .join(days, Seq("wday"))
    contrib
      .select(col("wday").as("day"), col("sday"), explode(col("sk")).as("h"))
      .groupBy("day")
      .agg(countDistinct(col("sday")).as("n_days"), kmv(col("h")).as("sk"))
      .select(col("day"), col("n_days").cast("long").as("n_days"),
        kmvEstimate(col("sk"), 64).as("est_7d"))
  }

  /** Count-min sketch hash: row `d`'s bucket for `key`, over the
    * repo-standard portable md5 hash (salt `d || ':' || key`) — identical
    * text in both engines, so sketches are cross-engine comparable.
    */
  private[graft] def cmsBucket(d: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(d.cast("string"), lit(":"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % lit(width.toLong)

  /** Count-min sketch (Cormode & Muthukrishnan 2005) counter matrix:
    * `depth` × `width` counters over a key stream — THE mergeable
    * frequency sketch for the streaming/100 TB regime (counters add
    * across partitions, days, and engines; q89's Misra–Gries summaries
    * merge too but need the per-merge threshold dance). One pass: each
    * key increments one bucket per depth row, a map-side-combinable
    * hash agg on (d, b) — depth × width cells of state total,
    * independent of key cardinality.
    *
    * @return [d, b, c] — only touched cells (absent cell = 0)
    */
  def cmsCounters(keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2)
    keys.select(col(keyCol).as("_cms_k"))
      .withColumn("d", explode(expr(s"sequence(0, ${depth - 1})")))
      .withColumn("b", cmsBucket(col("d"), col("_cms_k"), width))
      .groupBy("d", "b").agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for `queryKeys` against a [[cmsCounters]]
    * matrix: est(key) = min over depth rows of counter(d, h_d(key)) —
    * never below the true count (every bucket OVER-counts by its
    * collisions; the min picks the least-polluted row). The probe side
    * is bounded (a top-k key list), so the counter join is a broadcast-
    * scale equi-join on (d, b).
    *
    * @return queryKeys' columns + [est]
    */
  def cmsEstimate(counters: DataFrame, queryKeys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2)
    // working columns use the _cms_ prefix so a queryKeys frame that
    // already carries d/b/c is never clobbered or made ambiguous
    // (ADVICE r16 #2); `est` stays the output-contract name, so a
    // pre-existing `est` is rejected loudly instead of duplicated
    require(!queryKeys.columns.contains("est"),
      "cmsEstimate: queryKeys must not already carry an `est` column")
    // the _cms_ working names get the same loud-rejection treatment as
    // `est`: withColumn would silently clobber them (ADVICE r17)
    Seq("_cms_d", "_cms_b", "_cms_c").foreach { c =>
      require(!queryKeys.columns.contains(c),
        s"cmsEstimate: queryKeys must not carry reserved working column `$c`")
    }
    val probes = queryKeys
      .withColumn("_cms_d", explode(expr(s"sequence(0, ${depth - 1})")))
      .withColumn("_cms_b", cmsBucket(col("_cms_d"), col(keyCol), width))
    val cts = counters.select(col("d").as("_cms_d"), col("b").as("_cms_b"),
      col("c").as("_cms_c"))
    probes.join(cts, Seq("_cms_d", "_cms_b"), "left")
      .groupBy(queryKeys.columns.map(col).toSeq: _*)
      .agg(min(coalesce(col("_cms_c"), lit(0L))).as("est"))
  }

  /** Sketch-space JOIN-CARDINALITY estimate (the AMS-style inner
    * product over two [[cmsCounters]] matrices built with the SAME
    * depth/width/hash): est = min over depth rows of Σ_b cA[d,b]·cB[d,b]
    * ≥ Σ_k fA(k)·fB(k) — NEVER below the true equi-join size (collision
    * cross-terms only add), the one-sided bound a query optimizer can
    * budget against without touching either table again. Two sketches
    * of a few KB stand in for a join over any two 100 TB inputs; the
    * estimate itself is one (d, b) equi-join over ≤ depth × width rows.
    *
    * Long-exact to ~3·10⁹ rows per input at these widths (Σ c² ~ N²/W);
    * past that, shard the sketches or widen — the ann27/hashLogReg
    * documented-bound convention.
    *
    * @return 1 row, [est]
    */
  def cmsInnerProduct(cA: DataFrame, cB: DataFrame): DataFrame = {
    // full depth spine: a row whose buckets never overlap cB's has inner
    // product 0 (est = 0), which the bare inner-join + min would skip
    val ip = cA.join(cB.select(col("d"), col("b"), col("c").as("_cms_cb")),
        Seq("d", "b"))
      .groupBy("d").agg(sum(col("c") * col("_cms_cb")).as("_cms_ip"))
    cA.select("d").distinct()
      .join(ip, Seq("d"), "left")
      .agg(coalesce(min(coalesce(col("_cms_ip"), lit(0L))), lit(0L))
        .cast("long").as("est"))
  }
}
