package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The zero-cartesian / no-unexpected-BNLJ invariant from
  * `tools.PlanAudit`, promoted to `sbt test` so a plan regression fails
  * the build instead of waiting for a human to run the audit main
  * (VERDICT r3 next-round #3).
  *
  * Streaming catalog entries are excluded: their `fn` runs the stream
  * eagerly and returns a batch read of the sink output, so the audited
  * plan would be a plain parquet scan — all cost, no signal.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val streamingQueries = Set(
    "q23_stream_windows", "q50_stream_dedup", "q51_stream_join",
    "q62_stream_sessions", "q66_stream_upsert")

  /** BNLJ is legitimate only where the build side is a broadcast scalar
    * or a deliberate 1-row/query-vector side (audited by hand, see each
    * query's scaladoc): q29 broadcasts one scalar row, ann01/ann03
    * broadcast the query-vector set, tx06 cross-joins a 1-row doc count,
    * tx11/dp07/dp08 cross-join a 1-row corpus aggregate (total / max).
    * (q68's equivalent 1-row cross-joins run eagerly inside its
    * iteration loop behind localCheckpoint, so its final plan is a
    * checkpoint scan and stays off this list.)
    */
  private val designedBnlj = Set(
    "q29_scalar_subq", "ann01_bruteforce_topk", "ann03_topk_aggregator",
    "tx06_tfidf", "tx11_vocab_coverage", "dp07_weighted_sample",
    "dp08_ingest_gate")

  private lazy val plans: Map[String, String] =
    graft.queries.Catalog.all
      .filterNot(q => streamingQueries(q.name))
      .map(q => q.name -> q.fn(spark, sfDir).queryExecution.executedPlan.toString)
      .toMap

  test("no catalog query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("BroadcastNestedLoopJoin appears exactly where designed") {
    val bnlj = plans.collect {
      case (name, plan) if plan.contains("BroadcastNestedLoopJoin") => name
    }.toSet
    assert(bnlj == designedBnlj,
      s"unexpected: ${bnlj -- designedBnlj}; stale allowlist: ${designedBnlj -- bnlj}")
  }

  test("the detector catches a deliberately cartesian plan") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(4, 5).toDF("y")
    val plan = a.crossJoin(b).queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
