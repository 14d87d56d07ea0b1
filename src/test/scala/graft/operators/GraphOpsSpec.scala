package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[GraphOps.triangleCounts]]: the degree-oriented wedge closure must
  * equal a brute-force triangle enumeration on a random graph (every
  * triangle counted exactly once, per corner), and nodes outside any
  * triangle must not appear.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random edge set over `n` nodes: edge (u, v)
    * present iff a multiplicative hash of the pair clears a threshold.
    * Dense enough (p ≈ 0.15) that triangles are plentiful.
    */
  private def randomEdges(n: Int): Seq[(Long, Long)] =
    for {
      u <- 0 until n; v <- (u + 1) until n
      if math.abs((u * 2654435761L + v * 40503L) % 100) < 15
    } yield (u.toLong, v.toLong)

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      i <- nodes; j <- nodes if j > i && has(i, j)
      k <- nodes if k > j && has(i, k) && has(j, k)
    } yield (i, j, k)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("triangleCounts matches brute force on a random graph") {
    import spark.implicits._
    val edges = randomEdges(40)
    val expected = bruteTriangles(edges)
    assert(expected.nonEmpty, "fixture must contain triangles")
    val got = GraphOps.triangleCounts(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._2).toMap === expected)
    // degree column is the undirected degree
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (node, (d, _)) => assert(d === deg(node)) }
  }

  test("planted triangle plus a pendant node: only the triangle reports") {
    import spark.implicits._
    // 1-2-3 triangle, node 9 hangs off node 1, 7-8 isolated edge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 9L), (7L, 8L))
    val got = GraphOps.triangleCounts(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  test("triangle-free graph yields no rows") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)) // no closure
    assert(GraphOps.triangleCounts(star.toDF("u", "v"), "u", "v").count() === 0L)
  }

  test("celebrity node: oriented wedge fan-out stays bounded") {
    import spark.implicits._
    // hub 0 connected to 200 spokes + one triangle among spokes.
    // Naive wedge enumeration at the hub would emit 200*199/2 pairs;
    // degree orientation points every hub edge AWAY from the spokes
    // (hub degree 200 > spoke degree <= 3), so the hub has outdeg 0 and
    // contributes no wedges at all — the count is still exact.
    val edges = (4 to 203).map(i => (0L, i.toLong)) ++ Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val got = GraphOps.triangleCounts(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
