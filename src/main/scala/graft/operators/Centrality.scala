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
  * Join discipline under the AQE-off iteration session: every join whose
  * build side is O(|nodes|) (rank⋈dangling, rank⋈edges, new-rank⋈contrib)
  * carries a `shuffle_hash` hint — co-partitioned hash join on `node`, no
  * per-round sort (the SMJ tax the hint exists to avoid) and, critically,
  * NO size ceiling: a broadcast hint here would force driver-side collection
  * of the whole rank vector and die on any graph whose ranks exceed the
  * broadcast limit. Only true 1-row scalars (node count, dangling mass,
  * L1 norm) are `broadcast()`.
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
    // The graph is consumed in EVERY iteration (edges by the contribution
    // join, nodes/outd up to 3× per round) — checkpoint all three once so
    // the upstream build (a distinct over a fact-table join in ext94's
    // case) runs once, not once per reference. Same lazy-localCheckpoint
    // discipline as the rank frame below.
    //
    // The edge list is REPARTITIONED ON ITS JOIN KEY (src) before the
    // checkpoint: localCheckpoint preserves outputPartitioning, so every
    // round's contribution join finds the (by far largest) edge side
    // already clustered and re-shuffles nothing. nodes/outd inherit
    // hash(node) partitioning from their distinct/groupBy builds, and the
    // rank frame leaves each round partitioned by node (its closing join
    // key) — so under the AQE-off iteration session the ONLY per-round
    // shuffle left is the contribution groupBy(dst), which is the
    // irreducible routing step of distributed PageRank.
    val e = edges.repartition(col("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val outd = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // Out-degree baked into the checkpointed edge list ONCE (r16, guide
    // §2.4): the contribution join previously looked up (node, outdeg)
    // via an extra r⋈outd hash join EVERY round — 8 identical joins whose
    // result is loop-invariant. eDeg inherits e's hash(src) partitioning
    // (outd is hash(src) from its own groupBy, so the bake-in join is
    // itself exchange-free) and each round joins r against it directly.
    val eDeg = e.join(outd.withColumnRenamed("node", "src")
        .hint("shuffle_hash"), Seq("src"))
      .localCheckpoint(false)
    // The DANGLING node set is loop-invariant too: previously every round
    // re-derived it as r ⋈ outd (left) + outdeg-IS-NULL filter — a full
    // O(|nodes|) join against the out-degree table per round. Computed
    // once, the per-round dangling mass is one co-partitioned semi-join
    // of r against this (usually far smaller) frame.
    val dangNodes = nodes.join(outd.hint("shuffle_hash"), Seq("node"),
      "left_anti").localCheckpoint(false)
    val n = nodes.agg(count(lit(1)).as("n_nodes"))

    var r = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(1.0) / col("n_nodes"), 12).cast("decimal(28,12)").as("r"))
      .localCheckpoint(false)

    for (_ <- 1 to iters)
      r = pageRankStep(nodes, dangNodes, eDeg, n, r, damping).localCheckpoint(false)
    r
  }

  /** One damped-PageRank round: the next rank frame from the previous one.
    * Package-visible (not public API) so the plan spec can pin the join
    * strategy of a single UN-checkpointed round — the iteration loop's
    * lazy localCheckpoint truncates lineage, so the per-round joins are
    * invisible in the returned frame's executed plan.
    *
    * `eDeg` is the edge list with `outdeg` pre-attached and `dangNodes`
    * the (loop-invariant) set of nodes with no out-edges — both built
    * once by [[pageRank]], so a round is down to two co-partitioned
    * hash joins + the one irreducible contribution shuffle (r16; it was
    * four joins, two of them the same per-round r⋈outd lookup).
    */
  private[graft] def pageRankStep(nodes: DataFrame, dangNodes: DataFrame,
      eDeg: DataFrame, n: DataFrame, r: DataFrame, damping: Double): DataFrame = {
    val base = lit(1.0 - damping)
    val dang = r.join(dangNodes.hint("shuffle_hash"), Seq("node"))
      .agg(coalesce(sum(col("r")), lit(0)).cast("decimal(38,12)").as("dangle"))
    val contrib = r.hint("shuffle_hash")
      .join(eDeg, col("node") === col("src"))
      .groupBy("dst")
      .agg(sum(round(col("r").cast("double") / col("outdeg"), 12)
        .cast("decimal(28,12)")).cast("decimal(38,12)").as("in_sum"))
      .withColumnRenamed("dst", "node")
    nodes.crossJoin(broadcast(n)).crossJoin(broadcast(dang))
      .join(contrib.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"),
        round(base / col("n_nodes")
            + lit(damping) * (coalesce(col("in_sum"), lit(0)).cast("double")
              + col("dangle").cast("double") / col("n_nodes")), 12)
          .cast("decimal(28,12)").as("r"))
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
    // Checkpoint the graph once — 2 references per half-step × 2
    // half-steps × iters would otherwise rebuild the edge derivation
    // 30+ times (see pageRank). HITS propagates in BOTH directions, so it
    // keeps TWO pre-clustered copies of the edge list — src-keyed for the
    // authority half-step, dst-keyed for the hub half-step (one extra
    // one-time shuffle; localCheckpoint preserves the partitioning) — and
    // each half-step's propagate join then re-shuffles neither side: the
    // score frame exits the previous half-step partitioned by node. Only
    // the propagate groupBy(toEnd) shuffles per half-step.
    val eSrc = edges.repartition(col("src")).localCheckpoint(false)
    val eDst = eSrc.repartition(col("dst")).localCheckpoint(false)
    val nodes = eSrc.select(col("src").as("node"))
      .union(eSrc.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    var h = nodes
      .select(col("node"), lit(1).cast("decimal(28,12)").as("h"))
      .localCheckpoint(false)
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      a = halfStep(nodes, h, "h", eSrc, col("src"), col("dst"), "a")
      h = halfStep(nodes, a, "a", eDst, col("dst"), col("src"), "h")
    }
    nodes.join(a.hint("shuffle_hash"), Seq("node"), "left")
      .join(h.hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("a"), lit(0)).cast("decimal(28,12)").as("auth"),
        coalesce(col("h"), lit(0)).cast("decimal(28,12)").as("hub"))
  }

  /** Exact triangle counts + local clustering coefficient per node over an
    * undirected graph (Suri & Vassilvitskii, WWW 2011 node-iterator with
    * degree-ordered orientation — the MapReduce-era shape that still wins
    * on Spark): orient every edge from its (degree, id)-smaller endpoint,
    * so wedge enumeration fans out from each node's ORIENTED out-list —
    * bounded by O(√m) amortized on any graph, which is what keeps the
    * self-join alive on a skewed 100 TB edge set where a naive
    * neighbor-list explode dies on the highest-degree node. Each triangle
    * is counted exactly once (at its orientation-minimal wedge) and then
    * credited to all three corners.
    *
    * Topology: two hash aggs (canonicalize + degrees), one equi self-join
    * on the wedge pivot, one equi join against the oriented closing edge,
    * one explode + hash agg — every stage keyed, no cartesian anywhere.
    *
    * Returns (node, degree, triangles, clustering) with clustering =
    * 2T / deg(deg−1) rounded to 6 dp (0.0 for degree < 2) — exact-integer
    * arithmetic until the single pinned double division, so the whole
    * output is oracle-checkable.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("degree").as("dega")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("degb")), Seq("b"))
      .select(
        when(col("dega") < col("degb") ||
            (col("dega") === col("degb") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), Seq("u"))
      .filter(col("x") =!= col("y"))
    val tris = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val perNode = tris
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("tri"), lit(0)).cast("long").as("triangles"),
        when(col("degree") >= 2,
          round(lit(2.0) * coalesce(col("tri"), lit(0))
            / (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** One HITS half-step: propagate `scoreCol` of `from` across `edges`
    * from side `fromEnd` to side `toEnd`, L1-normalize, emit as `outCol`.
    * Nodes receiving nothing are simply ABSENT (score 0) rather than
    * completed against the node list each step — zeros contribute nothing
    * to the next propagation, so completion happens once at the end; that
    * saves one join per half-step. `raw` is checkpointed before the norm
    * aggregate so the propagate-join runs once, not once per consumer. */
  private[graft] def halfStep(nodes: DataFrame, from: DataFrame, scoreCol: String,
      edges: DataFrame, fromEnd: Column, toEnd: Column,
      outCol: String): DataFrame = {
    val raw = propagate(from, scoreCol, edges, fromEnd, toEnd)
      .localCheckpoint(false)
    val norm = raw.agg(sum(col("raw")).cast("decimal(38,12)").as("s"))
    raw.crossJoin(broadcast(norm))
      .select(col("node"),
        round(col("raw").cast("double") / col("s").cast("double"), 12)
          .cast("decimal(28,12)").as(outCol))
  }

  /** The HITS propagate join+agg, UN-checkpointed — the O(|nodes|) score
    * frame carries a `shuffle_hash` hint (never a broadcast: see the class
    * doc's join discipline). Package-visible so the plan spec can pin the
    * strategy, since [[halfStep]]'s lazy checkpoint hides it.
    */
  private[graft] def propagate(from: DataFrame, scoreCol: String,
      edges: DataFrame, fromEnd: Column, toEnd: Column): DataFrame =
    from.hint("shuffle_hash").join(edges, col("node") === fromEnd)
      .groupBy(toEnd.as("node"))
      .agg(sum(col(scoreCol)).cast("decimal(38,12)").as("raw"))
}
