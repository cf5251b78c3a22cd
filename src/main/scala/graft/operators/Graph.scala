package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list DataFrames — the centrality
  * half of the dup-graph toolkit ([[Dedup.duplicateClusters]] is the
  * connectivity half). A curation pipeline uses centrality on the near-dup
  * graph to find TEMPLATE documents: a boilerplate page that near-matches
  * hundreds of others is the hub of its cluster, and its rank separates
  * "the template" from "a copy" better than cluster size alone.
  */
object Graph {

  /** Undirected PageRank over `edges` (src, dst one direction per pair;
    * symmetrized internally). Every node in `nodes` participates —
    * isolated nodes converge to the teleport mass `(1-damping)/N`.
    * Dangling mass is NOT redistributed (after symmetrization the only
    * dangling nodes are isolated ones, whose outflow is zero by
    * construction; the python fixture mirrors this exactly).
    *
    * Scale shape: one degree aggregation, then per iteration one
    * src-keyed join of the (id, rank) relation with the edge list and one
    * dst-keyed combinable sum — the classic rank-contribution exchange;
    * shuffles carry (id, double) pairs, never payloads. Each iteration's
    * ranks are eagerly `localCheckpoint`ed: the per-round plans would
    * otherwise nest and blow up analysis time (repo-wide gotcha for
    * driver-loop DataFrame algorithms). N is one bounded `count()`.
    *
    * Reference scale note: at 100 TB the edge list is the output of the
    * banded LSH join (skew-guarded, [[graft.operators.SkewGuard]]) and
    * rank state is two narrow columns — the iteration cost is the two
    * shuffles, each O(|E|) in 16-byte rows. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 3,
      damping: Double = 0.85, idCol: String = "id",
      srcCol: String = "src", dstCol: String = "dst",
      nNodes: Option[Long] = None): DataFrame = {
    val ids = nodes.select(col(idCol).as("id"))
    // materialize the symmetrized edge list ONCE: its lineage is the
    // caller's candidate generation (for the dup graph, the whole LSH
    // signing pipeline), which would otherwise re-run every iteration —
    // the checkpointed relation is (id, id) pairs only
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // callers that already know |nodes| pass it in — the count() is a full
    // pass over the node relation otherwise
    val n = nNodes.getOrElse(ids.count()).toDouble
    val teleport = (1.0 - damping) / n

    var ranks = ids.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = sym
        .join(ranks.join(deg, col("id") === col("src")), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("inflow"))
      ranks = ids
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
