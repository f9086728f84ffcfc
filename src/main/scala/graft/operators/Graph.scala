package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Link analysis over an edge list (beyond the reference — the reference
  * ranks papers by per-row scores only, `Paper_Analysis/.../ruler.py`;
  * a citation/interaction GRAPH rank is the natural next signal a corpus
  * curator reaches for). The d14 connected-components closure covers
  * unweighted reachability; this adds the weighted damped-random-walk
  * rank (PageRank) as a FIXED-ITERATION batch job.
  *
  * Determinism contract (the x5 discipline): every rank is a BIGINT in
  * micro-units. One walk step is
  *
  *   r'(v) = 150000 + Σ_{(u,v)∈E} cnt(u,v) · ((17·r(u)) div (20·outdeg(u)))
  *
  * i.e. damping 0.85 = 17/20 and teleport (1−0.85)·10⁶ = 150000 exactly,
  * with the per-unit-edge contribution FLOOR-divided in integer space
  * before the multiply. The inner sum is a sum of BIGINTs — order-exact
  * on any engine, any partitioning — so the whole iteration chain is
  * bit-reproducible (DuckDB `//` and Spark `div` agree on non-negative
  * arguments; every operand here is ≥ 0).
  *
  * Scale shape: one iteration = one shuffle join (edges ⋈ ranks on src,
  * both sides hash-partitioned on the join key) + one hash aggregate on
  * dst — the standard distributed PageRank step, linear in |E| per
  * iteration with no driver-side state. The edge+outdeg and node
  * frames are LAZY localCheckpoints (multi-referenced across ticks —
  * materialized once, read every iteration); rank frames are each
  * referenced exactly once by the next tick, so the loop stays a
  * single fused job and only checkpoints EAGERLY on a [[CkEvery]]
  * cadence, freeing the superseded cadence frame on the spot
  * ([[graft.Frames.free]] — r13): flat lineage and O(1) executor
  * storage at any iteration count, zero checkpoint overhead for the
  * short fixed-iteration queries.
  *
  * Storage contract (r14): the returned frame's plan still holds the
  * trailing cadence checkpoint and the lazy edge/node tables — O(1)
  * frames per call, deliberately NOT re-materialized here (an extra
  * eager checkpoint of the result cost every caller a full
  * materialization; measured ~0.5–1.5 s per rank query at sf0.1).
  * A long-lived session frees them by calling
  * `graft.Frames.free(result)` once the result is landed — the
  * helper walks the analyzed plan and unpersists EVERY persisted
  * LogicalRDD leaf, so the projection wrapper is no obstacle.
  *
  * Overflow headroom: Σr ≈ |V|·10⁶ is (approximately) conserved, so a
  * single node's rank is bounded by total mass; 17·r stays far inside
  * BIGINT for any |V| < 10¹².
  */
object Graph {

  /** One damped-walk rank pass over `edges(src, dst, cnt)` — all three
    * BIGINT, cnt ≥ 1, multi-edges pre-aggregated. Returns
    * `(node, rank_micro)` for every node appearing as src or dst, after
    * `iters` full iterations from the uniform start r₀ = 10⁶.
    */
  def linkRank(edges: DataFrame, iters: Int): DataFrame =
    linkRankFrom(edges, None, iters)

  /** [[linkRank]] with a WARM START — the incremental tick: `start` is
    * a served `(node, rank_micro)` table (a previous linkRank output,
    * possibly over fewer edges); nodes absent from it begin at the
    * uniform 10⁶. A delta batch of edges then needs only the couple of
    * refresh iterations it takes to propagate the new mass locally,
    * not a cold-start run — the served store stays O(|V|), the tick
    * O(iters · |E|), no recompute of history.
    */
  def linkRankFrom(edges: DataFrame, start: Option[DataFrame],
                   iters: Int): DataFrame = {
    require(iters >= 1, "linkRank needs at least one iteration")
    val deg = edges.groupBy(col("src"))
      .agg(sum(col("cnt")).as("outdeg"))
    val withOutdeg = edges.join(deg, "src")
      .localCheckpoint(eager = false)
    val nodes = withOutdeg.select(col("src").as("node"))
      .union(withOutdeg.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    var ranks = start match {
      case None => nodes.withColumn("rank_micro", lit(1000000L))
      case Some(s0) => nodes
        .join(s0.select(col("node"), col("rank_micro").as("_r0")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("_r0"), lit(1000000L)).as("rank_micro"))
    }
    // Checkpoint CADENCE (r13): each rank frame is referenced exactly
    // once by the next tick, so short loops plan as ONE fused job with
    // no per-tick materialization at all — per-iteration checkpoints
    // (lazy OR eager) only added persist overhead and, unfreed, were
    // the r12 storage leak. Every [[CkEvery]]-th tick checkpoints
    // EAGERLY (flat lineage + bounded failure-recompute at any
    // iteration count) and the superseded cadence frame is freed on
    // the spot: executor storage is O(1) frames however long the loop
    // runs. Callers that consume the result more than once checkpoint
    // it themselves (the n2 serve table does).
    var prevCk: Option[DataFrame] = None
    for (t <- 1 to iters) {
      val contrib = withOutdeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          (col("cnt") *
            expr("(17 * rank_micro) div (20 * outdeg)")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("inmass"), lit(0L)))
            .as("rank_micro"))
      if (t % CkEvery == 0 && t < iters) {
        ranks = ranks.localCheckpoint(eager = true)
        prevCk.foreach(graft.Frames.free)
        prevCk = Some(ranks)
      }
    }
    ranks
  }

  /** Iterations between eager lineage checkpoints in the rank loops —
    * deep enough that short fixed-iteration queries fuse into a single
    * job, shallow enough that lineage depth and failure-recompute stay
    * bounded on long-running fixpoint loops.
    */
  private val CkEvery = 8

  /** SEEDED trust propagation (TrustRank, Gyöngyi et al. 2004): the
    * [[linkRank]] walk with the teleport mass concentrated on a trusted
    * seed set instead of spread uniformly — the whitelist-extension
    * move of corpus curation (a small set of hand-trusted domains ranks
    * the whole source graph by how reachable each node is from trust).
    *
    * Same integer contract as [[linkRank]], rescaled so total teleport
    * mass matches: with |V| nodes and |S| seeds present in the graph,
    * every seed teleports `(150000·|V|) div |S|` micro-units per
    * iteration and starts at `(10⁶·|V|) div |S|`; non-seeds get 0 of
    * both and earn trust only through in-edges. With S = V both
    * divisions collapse to the uniform 150000 / 10⁶, so
    * `trustRank(e, allNodes, k) == linkRank(e, k)` exactly — the
    * equivalence GraphSpec pins.
    *
    * Scale shape: identical per-iteration join+agg as [[linkRank]];
    * the seed membership rides the node table as a boolean (one
    * broadcast-sized join at build), and |V|,|S| are two bounded
    * driver-side counts (the fixpoint-probe discipline) folded into
    * literals so every rank cell stays a plan-side BIGINT.
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "trustRank needs at least one iteration")
    val deg = edges.groupBy(col("src"))
      .agg(sum(col("cnt")).as("outdeg"))
    val withOutdeg = edges.join(deg, "src")
      .localCheckpoint(eager = false)
    val nodes = withOutdeg.select(col("src").as("node"))
      .union(withOutdeg.select(col("dst").as("node"))).distinct()
      .join(seeds.select(col("node")).distinct()
          .withColumn("_s", lit(true)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("_s"), lit(false)).as("seed"))
      .localCheckpoint(eager = false)
    val nn = nodes.count()
    val ns = nodes.filter(col("seed")).count()
    require(ns > 0, "trustRank needs at least one seed present in the graph")
    val tele = (150000L * nn) / ns // floor div, both operands positive
    val start0 = (1000000L * nn) / ns
    var ranks = nodes.select(col("node"),
      when(col("seed"), lit(start0)).otherwise(lit(0L)).as("rank_micro"))
    // checkpoint cadence + superseded-frame freeing — see
    // [[linkRankFrom]].
    var prevCk: Option[DataFrame] = None
    for (t <- 1 to iters) {
      val contrib = withOutdeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          (col("cnt") *
            expr("(17 * rank_micro) div (20 * outdeg)")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("seed"), lit(tele)).otherwise(lit(0L)) +
            coalesce(col("inmass"), lit(0L))).as("rank_micro"))
      if (t % CkEvery == 0 && t < iters) {
        ranks = ranks.localCheckpoint(eager = true)
        prevCk.foreach(graft.Frames.free)
        prevCk = Some(ranks)
      }
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED edge
    * list — the bipartite companion to [[linkRank]]: on a
    * consumer→producer interaction graph, hub score measures "links to
    * good producers" and authority "linked by good consumers", the two
    * sides PageRank's single score conflates.
    *
    * Integer contract: scores are BIGINT micro-units from the uniform
    * 10⁶ start; one half-step is a_raw(v) = Σ cnt(u,v)·h(u) (exact
    * BIGINT sums), then the INTEGER power-of-sum rescale
    * `a = a_raw div max(1, Σa_raw div (10⁶·|V|))` caps total mass near
    * 10⁶·|V| — rankings are scale-invariant, the divisor is a single
    * engine-exact scalar, and magnitudes stay bounded at any iteration
    * count (unnormalized HITS grows like degreeᵏ and overflows). Both
    * scalar reductions ride 1-row broadcasts, never the driver.
    *
    * Scale shape: per half-step one shuffle join + one map-side-
    * combined aggregate, linear in |E| — the linkRank plan, twice per
    * iteration; eager half-step checkpoints with superseded-frame
    * freeing keep lineage flat and storage O(1).
    *
    * Returns `(node, hub_micro, auth_micro)` for every node.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    val e = edges.localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val tot = nodes.agg(count(lit(1)).as("nv"))
    // raw is consumed twice (the node re-attach AND the mass scalar);
    // unmaterialized, each consumer re-runs the half-step's shuffle
    // join + aggregate — materialize the O(|V|) frame once and free it
    // as soon as the rescaled (checkpointed) result exists.
    def rescale(raw0: DataFrame, key: String, out: String): DataFrame = {
      val raw = raw0.localCheckpoint(eager = true)
      val res = nodes
        .join(raw.withColumnRenamed(key, "node"), Seq("node"), "left")
        .crossJoin(broadcast(raw.agg(sum(col("raw")).as("sr"))))
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr("coalesce(raw, 0) div " +
            "greatest(1, coalesce(sr, 1) div (nv * 1000000))").as(out))
        .localCheckpoint(eager = true)
      graft.Frames.free(raw)
      res
    }
    var hubs = nodes.withColumn("hub_micro", lit(1000000L))
    var auth = nodes.withColumn("auth_micro", lit(1000000L))
    // eager half-step checkpoints + superseded-frame freeing — see
    // [[linkRankFrom]]; storage stays O(1 hub + 1 auth frame).
    var prevH: Option[DataFrame] = None
    var prevA: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val araw = e.join(hubs.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), (col("cnt") * col("hub_micro")).as("x"))
        .groupBy(col("dst")).agg(sum(col("x")).as("raw"))
      auth = rescale(araw, "dst", "auth_micro")
      prevA.foreach(graft.Frames.free)
      prevA = Some(auth)
      val hraw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .select(col("src"), (col("cnt") * col("auth_micro")).as("x"))
        .groupBy(col("src")).agg(sum(col("x")).as("raw"))
      hubs = rescale(hraw, "src", "hub_micro")
      prevH.foreach(graft.Frames.free)
      prevH = Some(hubs)
    }
    nodes.join(hubs, Seq("node")).join(auth, Seq("node"))
  }
}
