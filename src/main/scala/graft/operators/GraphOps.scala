package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot distributed graph analytics, complementing the engine's
  * iterative graph ops (q68's damped pagerank power iterations, dd06's
  * hash-min connected components): structural measures computed in a
  * fixed number of joins, no convergence loop.
  */
object GraphOps {

  /** Per-node triangle participation over an undirected simple graph —
    * the clustering-coefficient numerator, and the standard community /
    * spam-structure signal on co-occurrence graphs.
    *
    * Input: DISTINCT undirected edges as `[uCol, vCol]` with u < v (the
    * caller dedups and canonicalizes). Output: `[node, degree, n_tri]`
    * for every node that closes at least one triangle.
    *
    * Algorithm — degree-oriented wedge closure (the MapReduce-classic
    * Suri & Vassilvitskii shape): orient each edge from its
    * lexicographically smaller `(degree, id)` endpoint. The oriented
    * graph is acyclic and every out-degree is O(sqrt(m)) (a node of
    * degree d keeps only neighbors of degree ≥ d, and there can be at
    * most 2m/d of those), so the wedge self-join fans out at most
    * outdeg² ≤ O(m) per node TOTAL — against deg² for the naive
    * orientation, which a single celebrity node turns into n². Each
    * triangle {a,b,c} with π(a) < π(b) < π(c) is counted exactly once:
    * as the wedge (a→b, a→c) closed by the oriented edge b→c.
    *
    * Scale shape: three shuffles on edge keys (degree count, wedge
    * self-join on the source node, closure equi-join on the (t1, t2)
    * pair) — no windows, no driver-side iteration; the orientation
    * comparison carries endpoint degrees on the edge row, so the π-order
    * test is a plain boolean over columns (no global rank table). The
    * oriented edge set is self-joined twice and so is materialized once
    * ([[Exec.materializeForSelfJoin]]).
    */
  def triangleCounts(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
    val deg = e.select(col("u").as("k")).unionAll(e.select(col("v").as("k")))
      .groupBy("k").agg(count(lit(1)).as("d"))
    val du = deg.select(col("k").as("u"), col("d").as("du"))
    val dv = deg.select(col("k").as("v"), col("d").as("dv"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(fwd, col("u")).otherwise(col("v")).as("s"),
        when(fwd, col("v")).otherwise(col("u")).as("t"),
        when(fwd, col("dv")).otherwise(col("du")).as("dt"))
    val ed = Exec.materializeForSelfJoin(oriented)
    val e1 = ed.select(col("s"), col("t").as("t1"), col("dt").as("d1"))
    val e2 = ed.select(col("s"), col("t").as("t2"), col("dt").as("d2"))
    val wedges = e1.join(e2, Seq("s"))
      .where(col("d1") < col("d2") || (col("d1") === col("d2") && col("t1") < col("t2")))
      .select("s", "t1", "t2")
    val closing = ed.select(col("s").as("t1"), col("t").as("t2"))
    val tri = wedges.join(closing, Seq("t1", "t2"))
    val corners = tri.select(col("s").as("k"))
      .unionAll(tri.select(col("t1").as("k")))
      .unionAll(tri.select(col("t2").as("k")))
      .groupBy("k").agg(count(lit(1)).as("n_tri"))
    corners.join(deg, Seq("k"))
      .select(col("k").as("node"), col("d").cast("long").as("degree"),
        col("n_tri").cast("long").as("n_tri"))
  }

  /** Bounded multi-source BFS: the hop distance from every node to its
    * NEAREST seed, walked at most `maxRounds` rounds — the "blast
    * radius" / influence-neighborhood query over co-occurrence graphs
    * (which suppliers sit within 2 hops of a recalled part; which docs
    * sit within 3 links of a known-bad source).
    *
    * Relational formulation (the dd06 / graphAnnSearch bounded-iteration
    * discipline): whole-frontier expansion via ONE equi-join on the
    * symmetrized edge set per round, already-visited nodes pruned with
    * an anti-join so each round's join input is only the new rim. The
    * anti-join makes first-reach depth = BFS depth = min seed distance
    * (re-expanding a visited node can only re-reach visited nodes).
    * Every round is a fixed number of shuffles on the node key — no
    * per-seed sequential state, so a million seeds batch through the
    * same `maxRounds` joins. Loop state is fixed-width [node, dist] →
    * localCheckpoint per round, superseded handles released (the
    * connectedComponents memory contract).
    *
    * Input edges are undirected `[uCol, vCol]`; seeds any DataFrame with
    * `seedCol`. Output: `[node, dist]`, dist 0 for seeds, one row per
    * node reached within `maxRounds`.
    */
  def boundedDistances(edges: DataFrame, uCol: String, vCol: String,
      seeds: DataFrame, seedCol: String, maxRounds: Int): DataFrame = {
    require(maxRounds >= 0 && maxRounds <= 16, "maxRounds must be in [0, 16]")
    val e = edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
    val und = Exec.materializeForSelfJoin(
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
        .distinct())
    var visited = Exec.materializeForSelfJoin(
      seeds.select(col(seedCol).cast("long").as("node")).distinct()
        .withColumn("dist", lit(0)))
    var frontier = visited
    for (r <- 1 to maxRounds) {
      val rim = frontier.join(und, frontier("node") === und("src"))
        .select(und("dst").as("node")).distinct()
      val next = Exec.materializeForSelfJoin(
        rim.join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("dist", lit(r)))
      val merged = Exec.materializeForSelfJoin(visited.unionByName(next))
      if (!(frontier eq visited)) Exec.releaseMaterialized(frontier)
      Exec.releaseMaterialized(visited)
      visited = merged
      frontier = next
    }
    Exec.releaseMaterialized(und)
    if (!(frontier eq visited)) Exec.releaseMaterialized(frontier)
    visited
  }

  /** Bounded multi-source WEIGHTED shortest paths (Bellman–Ford,
    * `maxRounds` relaxation rounds): the cheapest ≤`maxRounds`-hop cost
    * from every node to its nearest seed over an undirected weighted
    * graph — [[boundedDistances]]' hop metric generalized to edge costs
    * (routing over co-occurrence strength: "how weakly is this part
    * connected to the trusted hubs", where strong co-purchase support
    * means a cheap edge).
    *
    * Unlike BFS, a node's best cost can improve after first reach, so
    * each round relaxes the WHOLE distance table, not just a frontier:
    * one edge equi-join + one min-aggregation per round — the textbook
    * Bellman–Ford invariant (after r rounds, cost = cheapest over paths
    * of ≤ r edges) that an oracle replays as r unrolled UNION/min CTEs.
    * Loop state is fixed-width [node, cost], localCheckpointed per
    * round with superseded handles released (the connectedComponents
    * memory contract). Costs must be non-negative integers; the caller
    * keeps cost · maxRounds inside a Long (integer micro-unit costs and
    * ≤ 16 rounds leave 2^44 headroom).
    */
  def boundedCheapestPaths(edges: DataFrame, uCol: String, vCol: String,
      costCol: String, seeds: DataFrame, seedCol: String,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 0 && maxRounds <= 16, "maxRounds must be in [0, 16]")
    val e = edges.select(col(uCol).cast("long").as("u"),
      col(vCol).cast("long").as("v"), col(costCol).cast("long").as("c"))
    val und = Exec.materializeForSelfJoin(
      e.select(col("u").as("src"), col("v").as("dst"), col("c"))
        .unionByName(e.select(col("v").as("src"), col("u").as("dst"), col("c"))))
    var dist = Exec.materializeForSelfJoin(
      seeds.select(col(seedCol).cast("long").as("node")).distinct()
        .withColumn("cost", lit(0L)))
    for (_ <- 1 to maxRounds) {
      val relaxed = dist.join(und, dist("node") === und("src"))
        .select(und("dst").as("node"), (dist("cost") + und("c")).as("cost"))
      val next = Exec.materializeForSelfJoin(
        dist.unionByName(relaxed).groupBy("node").agg(min("cost").as("cost")))
      Exec.releaseMaterialized(dist)
      dist = next
    }
    Exec.releaseMaterialized(und)
    dist
  }

  /** Synchronous label propagation (community detection, Raghavan et
    * al. 2007): every node starts labeled with itself; each round it
    * adopts the label most frequent among its NEIGHBORS, ties broken by
    * the smaller label — a fully deterministic variant of LPA (the
    * published algorithm breaks ties randomly; a fixed total order
    * makes the rounds oracle-replayable), run a FIXED number of
    * synchronous rounds rather than to convergence (LPA on bipartite-ish
    * structures can 2-cycle, so bounded rounds is also the correct
    * production contract — the dd06 / [[boundedDistances]] discipline).
    *
    * Scale shape per round: ONE edge equi-join against the label table,
    * a map-side-combinable (node, label) count, and a per-node
    * row_number over that node's distinct neighbor labels — bounded by
    * degree, never corpus-wide. Loop state is fixed-width [node, label],
    * localCheckpointed per round with superseded handles released (the
    * connectedComponents memory contract).
    *
    * Input: undirected `[uCol, vCol]` edges (deduped, u < v). Output:
    * `[node, label]`, one row per node with ≥ 1 edge.
    */
  def labelPropagation(edges: DataFrame, uCol: String, vCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
    val und = Exec.materializeForSelfJoin(
      e.select(col("u").as("s"), col("v").as("t"))
        .unionByName(e.select(col("v").as("s"), col("u").as("t")))
        .distinct())
    var labels = Exec.materializeForSelfJoin(
      und.select(col("s").as("node")).distinct()
        .withColumn("label", col("node")))
    val w = Window.partitionBy("node").orderBy(col("_cnt").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      val next = Exec.materializeForSelfJoin(
        und.join(labels.withColumnRenamed("node", "t"), Seq("t"))
          .groupBy(col("s").as("node"), col("label"))
          .agg(count(lit(1)).as("_cnt"))
          .withColumn("_rk", row_number().over(w))
          .where(col("_rk") === 1)
          .select("node", "label"))
      Exec.releaseMaterialized(labels)
      labels = next
    }
    Exec.releaseMaterialized(und)
    labels
  }

  /** Bounded k-core peeling — the density-based graph CURATION move
    * (keep the part of a co-occurrence graph where every member has ≥ k
    * surviving connections; spam/long-tail nodes peel away): `rounds`
    * synchronous rounds of "drop every node whose current degree < k,
    * then drop the edges that touched it". A fixpoint is reached when a
    * round removes nothing; like [[labelPropagation]], the round count
    * is FIXED and documented (bounded iteration, deterministic result,
    * oracle-unrollable) rather than data-dependent — callers size
    * `rounds` to their graph's peel depth (each round peels at least
    * one "layer" of under-connected nodes, and real co-occurrence
    * graphs peel in a handful).
    *
    * Scale shape per round: one degree hash-agg over surviving edges +
    * two semi-joins (u-side, v-side keep filters) — edge-key shuffles
    * only, no windows, loop state is the edge set itself
    * (localCheckpointed, superseded handles released).
    *
    * @return [node, degree] — nodes surviving all rounds with their
    *         residual degree
    */
  def kCore(edges: DataFrame, uCol: String, vCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16)
    var e = Exec.materializeForSelfJoin(
      edges.select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v")))
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("n")
      val next = Exec.materializeForSelfJoin(
        e.join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
          .select("u", "v"))
      Exec.releaseMaterialized(e)
      e = next
    }
    val out = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("degree"))
    out
  }

  /** HITS hubs and authorities (Kleinberg 1999) over a directed edge
    * set, `rounds` synchronous mutual-reinforcement iterations in the
    * q68 pure-integer discipline: hub mass starts uniform at
    * 10^12 `div` |hubs|; each round computes raw authority scores
    * a'(u) = Σ_{v→u} h(v) then L1-renormalizes by the INTEGER quotient
    * q = max(1, Σa' div 10^12) (a = a' div q), and symmetrically for
    * hubs — every value an exact long, so both engines agree bit-for-bit
    * under any aggregation order (Spark `div` and DuckDB integer `//`
    * both truncate toward zero; every value here is non-negative anyway).
    *
    * Scale contract: normalized mass totals ~10^12, so a raw per-node
    * sum is ≤ 10^12·deg(node) and the renormalization sum is
    * ≤ 10^12·max-degree — longs hold both for max-degree < 9·10^6,
    * far above any real web/bipartite corpus after the usual top-domain
    * capping. Each round is one equi-join + one hash aggregation per
    * direction over the deduplicated edge list (no windows, no driver
    * data); rounds materialize via localCheckpoint and release their
    * predecessor, the q68/kCore loop discipline.
    *
    * Returns (side 'hub'|'auth', node, score) for every node that holds
    * nonzero mass after the final round.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16)
    val e = Exec.materializeForSelfJoin(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    val hubs = e.select(col("src").as("node")).distinct()
    // greatest(1, ...) guards the ANSI divide-by-zero on an empty edge
    // set (the 1-row aggregate still evaluates; the cross join with the
    // empty hub side then discards it)
    var h = Exec.materializeForSelfJoin(
      hubs.crossJoin(broadcast(
          hubs.agg(expr("1000000000000 div greatest(1, count(*))").as("init"))))
        .select(col("node"), col("init").as("score")))
    var a: DataFrame = null
    for (_ <- 1 to rounds) {
      val aRaw = e.join(h, col("node") === col("src"))
        .groupBy(col("dst").as("anode")).agg(sum("score").as("raw"))
      val prevA = a
      a = Exec.materializeForSelfJoin(
        aRaw.crossJoin(broadcast(
            aRaw.agg(greatest(lit(1L), expr("sum(raw) div 1000000000000")).as("q"))))
          .select(col("anode").as("node"), expr("raw div q").as("score")))
      if (prevA != null) Exec.releaseMaterialized(prevA)
      val hRaw = e.join(a, col("node") === col("dst"))
        .groupBy(col("src").as("hnode")).agg(sum("score").as("raw"))
      val prevH = h
      h = Exec.materializeForSelfJoin(
        hRaw.crossJoin(broadcast(
            hRaw.agg(greatest(lit(1L), expr("sum(raw) div 1000000000000")).as("q"))))
          .select(col("hnode").as("node"), expr("raw div q").as("score")))
      Exec.releaseMaterialized(prevH)
    }
    h.select(lit("hub").as("side"), col("node"), col("score"))
      .unionAll(a.select(lit("auth").as("side"), col("node"), col("score")))
  }
}
