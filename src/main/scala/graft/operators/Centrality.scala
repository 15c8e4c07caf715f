package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** `iters` rounds of HITS (Kleinberg, JACM 1999) over `edges(src, dst)`:
    * authority(v) = Σ hub(u) over in-edges, hub(u) = Σ authority(v) over
    * out-edges, each half-step L1-normalized. L1 (sum) normalization
    * replaces the textbook L2 — a deliberate variant choice: it preserves
    * the ranking fixed point while keeping every cross-row reduction an
    * EXACT decimal sum (an L2 norm's sqrt would force float reduction
    * order into the iterate and break oracle-checkability). Scores live as
    * DECIMAL(28,12); the normalize step divides doubles with a pinned op
    * order and re-rounds to 12 dp, exactly the [[pageRank]] discipline.
    * Per half-step topology: one equi-join + one hash agg + a broadcast
    * 1-row norm scalar; lazy localCheckpoint truncates lineage per round.
    *
    * Returns (node, auth DECIMAL(28,12), hub DECIMAL(28,12)); nodes with
    * no in-edges (resp. out-edges) carry authority (resp. hub) 0.
    */
  def hits(edges: DataFrame, iters: Int = 8): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var h = nodes
      .select(col("node"), lit(1).cast("decimal(28,12)").as("h"))
      .localCheckpoint(false)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = halfStep(nodes, h, "h", edges, col("src"), col("dst"), "a")
      h = halfStep(nodes, a, "a", edges, col("dst"), col("src"), "h")
    }
    nodes.join(a, Seq("node")).join(h, Seq("node"))
      .select(col("node"), col("a").as("auth"), col("h").as("hub"))
  }

  /** One HITS half-step: propagate `scoreCol` of `from` across `edges`
    * from side `fromEnd` to side `toEnd`, L1-normalize, emit as `outCol`. */
  private def halfStep(nodes: DataFrame, from: DataFrame, scoreCol: String,
      edges: DataFrame, fromEnd: Column, toEnd: Column,
      outCol: String): DataFrame = {
    val raw = from.join(edges, col("node") === fromEnd)
      .groupBy(toEnd.as("tnode"))
      .agg(sum(col(scoreCol)).cast("decimal(38,12)").as("raw"))
    val norm = raw.agg(sum(col("raw")).cast("decimal(38,12)").as("s"))
    nodes.join(raw, col("node") === col("tnode"), "left")
      .crossJoin(broadcast(norm))
      .select(col("node"),
        round(coalesce(col("raw"), lit(0)).cast("double")
            / col("s").cast("double"), 12)
          .cast("decimal(28,12)").as(outCol))
      .localCheckpoint(false)
  }
}
