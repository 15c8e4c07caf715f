package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al. 1999) as an iterative DataFrame
  * fixed-point — the graph-centrality dial a curation pipeline uses to
  * weight sources/entities by link structure (e.g. rank domains in a web
  * corpus before per-domain quota sampling).
  *
  * Scale shape: per iteration ONE equi-join of the rank frame with the edge
  * list (shuffle keyed by node), one hash agg of contributions keyed by
  * destination, and a 1-row dangling-mass aggregate that is broadcast —
  * the textbook distributed-PageRank topology that holds at any node count.
  * The rank frame is `localCheckpoint(eager = false)`-truncated each round
  * (the clusterPairs discipline): without it each of the three consumers of
  * round i's ranks (dangling agg, contribution join, carry-through) would
  * recompute the whole prefix and the lineage would grow 3^T.
  *
  * Determinism contract (what makes this ORACLE-checkable, unusual for
  * float PageRank): ranks live as DECIMAL(28,12); every cross-row reduction
  * (contribution sum, dangling mass) is an EXACT decimal sum — associative
  * and commutative, so partitioning/merge order cannot change it (no
  * sorted-fold needed, and unlike the bounded-fan-in folds this stays legal
  * at 100 TB in-degree). Scalar arithmetic per row happens in doubles with
  * a pinned operation order and is rounded back to 12 dp each step, so both
  * engines iterate the identical decimal sequence.
  */
object Centrality {

  /** `iters` rounds of damped PageRank over `edges(src, dst)` (assumed
    * distinct pairs). Nodes = src ∪ dst; dangling mass is redistributed
    * uniformly. Returns (node, r DECIMAL(28,12)) summing to ~1.
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 8): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outd = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val n = nodes.agg(count(lit(1)).as("n_nodes"))

    var r = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1.0) / col("n_nodes"), 12).cast("decimal(28,12)").as("r"))
      .localCheckpoint(false)

    val base = lit(1.0 - damping)
    for (_ <- 1 to iters) {
      val dang = r.join(outd, Seq("node"), "left")
        .filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("r")), lit(0)).cast("decimal(38,12)").as("dangle"))
      val contrib = r.join(outd, "node")
        .join(edges, col("node") === col("src"))
        .groupBy("dst")
        .agg(sum(round(col("r").cast("double") / col("outdeg"), 12)
          .cast("decimal(28,12)")).cast("decimal(38,12)").as("in_sum"))
        .withColumnRenamed("dst", "node")
      r = nodes.crossJoin(broadcast(n)).crossJoin(broadcast(dang))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(base / col("n_nodes")
              + lit(damping) * (coalesce(col("in_sum"), lit(0)).cast("double")
                + col("dangle").cast("double") / col("n_nodes")), 12)
            .cast("decimal(28,12)").as("r"))
        .localCheckpoint(false)
    }
    r
  }
}
