package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals a plain inner join, including skewed keys") {
    // 1000 rows on one hot key + a tail
    val skewed = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("key", "row_id")
    val small = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"V$i")))
      .toDF("key", "payload")
    val plain = skewed.join(small, Seq("key"))
      .select("key", "row_id", "payload").as[(String, Long, String)].collect().toSet
    val salted = Exec.saltedJoin(skewed, small, "key", "row_id", saltFactor = 4)
      .select("key", "row_id", "payload").as[(String, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 1050)
  }

  test("materializeLarge persists DISK_ONLY with lineage kept") {
    import org.apache.spark.storage.StorageLevel
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("id", "v")
    val out = Exec.materializeLarge(df)
    try {
      // DISK_ONLY: no executor-heap pinning for O(corpus) tables; persist
      // (not localCheckpoint) keeps lineage so a lost block recomputes
      // instead of failing the job (VERDICT r7 #2)
      assert(out.storageLevel == StorageLevel.DISK_ONLY)
      assert(out.count() == 100)
      // the analyzed plan still carries the source, i.e. lineage is intact
      // (a localCheckpoint plan would be a bare LogicalRDD)
      assert(out.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }.isDefined)
    } finally out.unpersist()
  }

  test("corpus-sized materializations are DISK_ONLY, not localCheckpoint") {
    // every catalog query whose materialized table holds O(corpus) bytes
    // (exploded tokens/shingles, shingle sets, full text, vector copies);
    // fixed-width derived tables (simhash blocks, band keys, PQ codes)
    // and iterative loops (dd06/q68 — lineage cut is the point) stay on
    // localCheckpoint, which plans as LogicalRDD, not InMemoryRelation
    import org.apache.spark.storage.StorageLevel
    val sfDir = "/root/testdata/sf0.001"
    for (q <- Seq("tx06_tfidf", "dp09_decontam", "tx08_commonness",
        "dd04_ngram_jaccard", "dd05_embed_neardup", "dd11_containment",
        "ann04_ivf", "dd12_substring_spans")) {
      val qe = graft.queries.Catalog.all.find(_.name == q).get
        .fn(spark, sfDir).queryExecution
      val cached = qe.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(cached.nonEmpty, s"$q: expected a persisted corpus-derived table")
      cached.foreach { r =>
        assert(r.cacheBuilder.storageLevel == StorageLevel.DISK_ONLY,
          s"$q: corpus-sized cache must be DISK_ONLY, was ${r.cacheBuilder.storageLevel}")
      }
    }
  }

  test("releaseMaterialized frees checkpoint blocks; derived plans are a no-op") {
    val handle = Exec.materializeForSelfJoin(
      (1 to 100).map(i => (i, s"v$i")).toDF("id", "v"))
    val rddId = handle.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case p => fail(s"expected a LogicalRDD handle, got ${p.getClass}")
    }
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "localCheckpoint should pin blocks in executor storage")
    // a view DERIVED from the handle must never release the handle's
    // blocks through releaseMaterialized — only the handle itself may
    Exec.releaseMaterialized(handle.select("id"))
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "releasing a derived plan must not unpersist the upstream handle")
    Exec.releaseMaterialized(handle)
    // unpersist is async (blocking=false); poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.contains(rddId) &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "releasing the handle itself should free its blocks")
  }

  test("iterative loops do not accumulate superseded checkpoints") {
    // run the heaviest loop operator (5 pagerank rounds via the catalog)
    // and assert the persistent-RDD census returns to near its starting
    // point: the loop releases each superseded round instead of pinning
    // every round until session end
    val before = spark.sparkContext.getPersistentRDDs.size
    graft.queries.Catalog.all.find(_.name == "q68_pagerank").get
      .fn(spark, "/root/testdata/sf0.001").collect()
    val deadline = System.currentTimeMillis() + 10000
    def now = spark.sparkContext.getPersistentRDDs.size
    while (now > before + 4 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    // live at exit: nodes, meta, edgesDeg, final ranks (edges + the 4
    // superseded rank rounds are released)
    assert(now <= before + 4,
      s"q68 left ${now - before} pinned RDDs; loop rounds are leaking")
  }

  test("connectedComponents records round telemetry") {
    val vertices = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    DedupOps.connectedComponents(vertices, edges)
    val stats = DedupOps.lastCcStats
    assert(stats.isDefined)
    assert(stats.get.rounds >= 1 && stats.get.roundMillis.size == stats.get.rounds)
  }
}
