package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Validates the skew claims made in scaladoc instead of asserting them:
  * one key carrying 50% of all rows must neither break correctness nor
  * concentrate on a single reducer after salting / banding.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val saltFactor = 8

  /** 20k rows, half on one hot key, the rest spread over 97 keys. */
  private def skewedFacts = spark.range(20000)
    .select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 97)).as("key"),
      col("id"))

  private def dim = skewedFacts.select("key").distinct()
    .withColumn("dim_tag", concat(lit("t_"), col("key")))

  test("saltedJoin returns exactly the plain join's rows under 50% skew") {
    val salted = Exec.saltedJoin(skewedFacts, dim, "key", "id", saltFactor)
    val plain = skewedFacts.join(dim, Seq("key"))
    assert(salted.count() == plain.count())
    // content check: same per-key row count and id checksum
    val a = salted.groupBy("key").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = plain.groupBy("key").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("salting splits the hot key's rows near-evenly across salt buckets") {
    // the shuffle key after salting is (key, _salt): per-bucket row count
    // IS the reducer-side task load for the hot key
    val buckets = skewedFacts.where(col("key") === "hot")
      .withColumn("_salt", pmod(hash(col("id")), lit(saltFactor)))
      .groupBy("_salt").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(buckets.length == saltFactor) // every bucket populated
    val total = buckets.sum
    val ideal = total.toDouble / saltFactor
    // deterministic hash spread: no bucket more than 25% off ideal
    assert(buckets.forall(n => math.abs(n - ideal) / ideal < 0.25),
      s"bucket skew too high: ${buckets.mkString(",")}")
  }

  test("salting measurably reduces the largest reducer's shuffle load") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import scala.collection.mutable.ArrayBuffer

    // capture per-task shuffle-read record counts for one action
    def maxShuffleRead(run: => Unit): Long = {
      val recs = ArrayBuffer.empty[Long]
      val l = new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null && m.shuffleReadMetrics != null)
            recs.synchronized { recs += m.shuffleReadMetrics.recordsRead }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        run
        // listener bus is async: wait until the event stream goes quiet
        var last = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val n = recs.synchronized(recs.size)
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      } finally spark.sparkContext.removeSparkListener(l)
      recs.synchronized(if (recs.isEmpty) 0L else recs.max)
    }

    // force a real shuffle join (broadcast would bypass the shuffle and
    // hide the skew entirely), and disable AQE: at test scale its
    // partition coalescing folds the whole shuffle into one partition,
    // masking exactly the per-reducer distribution this test measures
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(thresholdKey)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(thresholdKey, "-1")
    spark.conf.set(aqeKey, "false")
    try {
      val facts = skewedFacts
      val maxPlain = maxShuffleRead {
        facts.join(dim, Seq("key")).count(): Unit
      }
      val maxSalted = maxShuffleRead {
        Exec.saltedJoin(facts, dim, "key", "id", saltFactor).count(): Unit
      }
      // one reducer used to see the hot key's 10k rows in one block;
      // salted, the hot key spans saltFactor shuffle keys
      assert(maxPlain > 0 && maxSalted > 0)
      assert(maxSalted < maxPlain * 0.7,
        s"salting did not spread the load: plain=$maxPlain salted=$maxSalted")
    } finally {
      spark.conf.set(thresholdKey, prev)
      spark.conf.set(aqeKey, prevAqe)
    }
  }

  test("connectedComponents labels a hot star graph correctly") {
    // vertex 0 adjacent to half of all vertices (one shuffle key sees 50%
    // of all edges), plus disjoint chains for the rest
    val star = spark.range(1, 2000).select(lit(0L).as("src"), col("id").as("dst"))
    val chains = spark.range(2000, 2500)
      .select(col("id").as("src"), (col("id") + 500).as("dst"))
    val edges = star.unionByName(chains)
    val vertices = spark.range(0, 3000).toDF("id")
    val labels = DedupOps.connectedComponents(vertices, edges, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // star members all collapse to 0
    (0L until 2000L).foreach(v => assert(labels(v) == 0L, s"vertex $v"))
    // each chain pair collapses to its smaller end, untouched by the star
    (2000L until 2500L).foreach(v => assert(labels(v) == v && labels(v + 500) == v))
  }
}
