package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The shared token/shingle kernel contract (VERDICT r13 #4): one
  * explode per shape per (session, corpus) — repeated calls return the
  * SAME materialized handle (not a rebuilt plan), the kernels are
  * DISK_ONLY (nothing pinned in executor heap), and `clear()` releases
  * them.
  */
class SharedKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("token kernels memoize per session and release on clear") {
    SharedArtifacts.clear()
    val t1 = SharedArtifacts.docTokens(spark, sfDir)
    val t2 = SharedArtifacts.docTokens(spark, sfDir)
    assert(t1 eq t2, "repeated calls must return the same handle")
    val s1 = SharedArtifacts.posShingles8(spark, sfDir)
    assert(s1 eq SharedArtifacts.posShingles8(spark, sfDir))
    val j1 = SharedArtifacts.docShingles3(spark, sfDir)
    assert(j1 eq SharedArtifacts.docShingles3(spark, sfDir))

    // DISK_ONLY: the large kernels must not pin executor heap
    assert(t1.storageLevel.useDisk && !t1.storageLevel.useMemory,
      s"docTokens must be DISK_ONLY, was ${t1.storageLevel}")
    assert(t1.count() > 0 && s1.count() > 0 && j1.count() > 0)

    SharedArtifacts.clear()
    assert(t1.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clear() must unpersist the kernel blocks")
    // a post-clear call rebuilds a fresh handle
    assert(!(SharedArtifacts.docTokens(spark, sfDir) eq t1))
    SharedArtifacts.clear()
  }

  test("docTokens matches a direct explode; posShingles8 matches positionalShingles") {
    import org.apache.spark.sql.functions._
    SharedArtifacts.clear()
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val direct = docs.select(col("doc_id"),
        explode(graft.operators.DedupOps.tokens(col("text"))).as("tok"))
      .groupBy().agg(count(lit(1)), countDistinct("tok")).collect().head
    val shared = SharedArtifacts.docTokens(spark, sfDir)
      .groupBy().agg(count(lit(1)), countDistinct("tok")).collect().head
    assert(direct == shared)

    val ps = graft.operators.DedupOps.positionalShingles(docs, "text", "doc_id", 8)
      .groupBy().agg(count(lit(1)), countDistinct("_h")).collect().head
    val psShared = SharedArtifacts.posShingles8(spark, sfDir)
      .groupBy().agg(count(lit(1)), countDistinct("_h")).collect().head
    assert(ps == psShared)
    SharedArtifacts.clear()
  }
}
