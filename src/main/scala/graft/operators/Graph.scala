package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the second graph operator
  * family next to [[Dedup.connectedComponents]].
  *
  * PageRank over the near-dup pair graph is a curation signal: high-rank
  * nodes are the template/boilerplate HUBS of a corpus (docs similar to
  * many other docs that are themselves widely similar), which pure pair
  * counts under-rank; mixture recipes downweight them.
  *
  * Scale shape per iteration: one keyed join (edges ⋈ ranks on src — ranks
  * is O(nodes), edges partition by src) and one dst-keyed aggregation; the
  * rank vector, never the edge list, is the iterated state. Lineage is
  * truncated with a local checkpoint every other iteration — the same
  * discipline as connectedComponents (an unbounded iterative plan otherwise
  * grows analysis cost quadratically). Edges and degrees are computed once
  * and checkpointed, not re-derived per iteration.
  *
  * Determinism: the per-node in-rank sum folds contributions in SORTED
  * source order (the bm25/avgOverK pattern) — grouped double addition is
  * otherwise shuffle-order-nondeterministic and cross-engine drift would
  * compound across iterations. With the sorted fold every IEEE operation
  * is identical on both engines, so no intermediate rounding is needed;
  * callers round the final rank for gate hashing.
  */
object Graph {

  /** Fixed-iteration damped PageRank on a DIRECTED edge list (symmetrize
    * upstream for undirected graphs). Nodes = edge endpoints; every node
    * has out-degree ≥ 1 after symmetrization, so there is no dangling-mass
    * term. Returns (`node_id`, `pagerank`), rank rounded to 6.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
    val deg = e.groupBy("_src").agg(count(lit(1)).as("_deg"))
    // Static per-iteration inputs: materialize once, truncate lineage.
    val eDeg = e.join(deg, "_src").localCheckpoint(true)
    val nodes = e.select(col("_src").as("_id")).union(e.select(col("_dst").as("_id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    val teleport = (1 - damping) / n

    var ranks = nodes.withColumn("_r", lit(1.0 / n))
    for (i <- 1 to iters) {
      val summed = eDeg.join(ranks.withColumnRenamed("_id", "_src"), "_src")
        .select(col("_dst"), col("_src"), (col("_r") / col("_deg")).as("_c"))
        .groupBy("_dst")
        .agg(array_sort(collect_list(struct(col("_src"), col("_c")))).as("_l"))
        .select(col("_dst").as("_id"),
          aggregate(col("_l"), lit(0.0), (a, x) => a + x.getField("_c")).as("_in"))
      ranks = nodes.join(summed, Seq("_id"), "left_outer")
        .select(col("_id"),
          (lit(teleport) + lit(damping) * coalesce(col("_in"), lit(0.0))).as("_r"))
      if (i % 2 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("_id").as("node_id"), round(col("_r"), 6).as("pagerank"))
  }

  /** k-CORE decomposition membership: the maximal subgraph in which every
    * node has degree ≥ k, computed by the standard peeling fixpoint —
    * repeatedly delete nodes of degree < k (deleting a node lowers its
    * neighbors' degrees, so the loop re-checks) until stable. Cores
    * separate the DENSE near-dup families (template farms survive high k)
    * from incidental pair noise that triangles alone can't rank.
    *
    * Per iteration: one degree aggregate + two keyed anti-joins pruning
    * the edge list; the edge list shrinks monotonically and lineage is
    * truncated every other round ([[pageRank]]'s discipline). The
    * fixpoint is detected by the surviving-edge count going stable;
    * `maxIter` is a LOUD guard — a graph that hasn't converged fails,
    * never returns a half-peeled core.
    *
    * Output: `(node_id, core_degree)` for members of the k-core, with
    * their degree inside the core.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxIter: Int = 30): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var n = und.count()
    var it = 0
    var stable = false
    while (!stable) {
      it += 1
      require(it <= maxIter, s"kCore did not converge within $maxIter iterations")
      val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val bad = deg.where(col("deg") < k).select("v")
      var pruned = und
        .join(bad.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
        .join(bad.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
        .select("a", "b")
      // FreshStats, not plain localCheckpoint (round 14): each round's plan
      // is und JOIN bad JOIN bad with bad derived from und — size stats
      // compound CUBICALLY per round through a stats-carrying checkpoint,
      // and a slow-peeling graph near the 30-round guard would hang the
      // driver in BigInteger stats math exactly like Bradley-Terry did
      // (see Shim.localCheckpointFreshStats).
      if (it % 2 == 0)
        pruned = org.apache.spark.sql.graft.Shim.localCheckpointFreshStats(pruned)
      val n2 = pruned.count()
      stable = n2 == n
      n = n2
      und = pruned
    }
    und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("core_degree"))
      .select(col("v").as("node_id"), col("core_degree"))
  }

  /** Per-node triangle count and local clustering coefficient over an
    * UNDIRECTED edge list — the community-density profile of the near-dup
    * graph (high-coefficient clusters = template families; low-coefficient
    * hubs = boilerplate bridges PageRank flags for other reasons).
    *
    * The classic distributed formulation (node-iterator with low-degree
    * pivot): canonicalize + dedup edges, orient every edge from its
    * lower-(degree, id) endpoint to the higher, build wedges around the
    * LOW-degree pivot (`dir ⋈ dir` on the pivot key), and close each wedge
    * with one hash join back into the canonical edge set. Orientation
    * bounds wedge fan-out by the oriented out-degree — Σ d_out² stays
    * near-linear on power-law graphs where the naive Σ deg² explodes on
    * hubs (Suri & Vassilvitskii's MapReduce triangle bound). Every join is
    * keyed; nothing is ever broadcast or collected.
    *
    * Output: `(node_id, degree, triangles, clustering_coeff)` for every
    * node of the graph; coefficient = 2T / (deg·(deg−1)), 0 for degree-1
    * nodes, rounded to 6.
    */
  def triangleStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient from lower (deg, id) to higher — the pivot of every wedge is
    // the lowest-degree corner of its triangle
    val dir = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), struct(col("a").as("s"), col("b").as("d")))
        .otherwise(struct(col("b").as("s"), col("a").as("d"))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
    val wedges = dir.select(col("s"), col("d").as("d1"))
      .join(dir.select(col("s"), col("d").as("d2")), "s")
      .where(col("d1") < col("d2"))
    val tri = wedges.join(und,
      least(col("d1"), col("d2")) === col("a") &&
        greatest(col("d1"), col("d2")) === col("b"))
      .select(col("s"), col("d1"), col("d2"))
    val perNode = tri
      .select(explode(array(col("s"), col("d1"), col("d2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v").as("node_id"), col("deg").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .as("clustering_coeff"))
  }
}
