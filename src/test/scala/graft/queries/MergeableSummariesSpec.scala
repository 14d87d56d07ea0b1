package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Misra-Gries contract q89 claims (Agarwal et al., Mergeable
  * Summaries): a merged MG summary only UNDERCOUNTS, by at most the sum
  * of the thresholds subtracted along the merge tree — which the query
  * reports as `bound`. The oracle hash-match proves Spark and DuckDB
  * agree; this spec proves the agreed-on answer honors the paper's
  * guarantee against the exact arm, and that the summary stayed
  * k-bounded.
  */
class MergeableSummariesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val rows: Seq[(String, Long, Long, Long, Long)] =
    Catalog.all.find(_.name == "q89_heavy_hitters").get
      .fn(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq

  test("estimates undercount within the reported MG bound") {
    assert(rows.nonEmpty)
    rows.foreach { case (pri, pk, est, exact, bound) =>
      assert(est >= 1, s"($pri,$pk): non-positive counters must be dropped")
      assert(est <= exact, s"($pri,$pk): MG never overcounts")
      assert(exact <= est + bound,
        s"($pri,$pk): exact $exact exceeds est $est + bound $bound")
    }
  }

  test("each merged summary keeps at most k=16 counters") {
    rows.groupBy(_._1).foreach { case (pri, grp) =>
      assert(grp.size <= 16, s"$pri summary holds ${grp.size} counters")
    }
  }
}
