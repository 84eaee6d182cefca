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
}
