package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long, Long)*) =
    es.toDF("src", "dst", "cnt")

  test("linkRank: symmetric 2-cycle is the uniform fixed point") {
    // 1⇄2, unit weights: every iteration returns exactly 10⁶ per node
    // (teleport 150000 + (17·10⁶) div 20 = 850000).
    val e = edges((1L, 2L, 1L), (2L, 1L, 1L))
    for (k <- 1 to 3) {
      val r = Graph.linkRank(e, iters = k)
        .orderBy("node").as[(Long, Long)].collect()
      assert(r.toSeq == Seq((1L, 1000000L), (2L, 1000000L)))
    }
  }

  test("linkRank: hand-computed star graph, iterations 1 and 2") {
    // 1→{2,3}, {2,3}→1, unit weights. outdeg(1)=2, outdeg(2)=outdeg(3)=1.
    val e = edges((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val r1 = Graph.linkRank(e, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // to 2,3: (17·10⁶) div 40 = 425000; to 1: 850000 from each leaf
    assert(r1 == Seq((1L, 1850000L), (2L, 575000L), (3L, 575000L)))
    val r2 = Graph.linkRank(e, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // from 1: (17·1850000) div 40 = 786250; from each leaf:
    // (17·575000) div 20 = 488750
    assert(r2 == Seq((1L, 1127500L), (2L, 936250L), (3L, 936250L)))
  }

  test("linkRank: multi-edge weight equals per-unit floor times count") {
    // contract: contribution of a cnt-weighted edge is
    // cnt · ((17·r) div (20·outdeg)) — the floor is taken once per
    // (src,dst) pair and multiplied, with outdeg the SUM of counts.
    // Here outdeg(1) = 4: per-unit share (17·10⁶) div 80 = 212500.
    val e = edges((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val r = Graph.linkRank(e, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 150000L + 850000L + 850000L),
      (2L, 150000L + 3L * 212500L),
      (3L, 150000L + 212500L)))
  }

  test("linkRankFrom: warm start composes — from(r_t, 1 iter) == r_{t+1}") {
    val e = edges((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val r1 = Graph.linkRank(e, iters = 1)
    val cold2 = Graph.linkRank(e, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val warm = Graph.linkRankFrom(e, Some(r1), iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(warm == cold2)
  }

  test("linkRankFrom: nodes absent from the served table start uniform") {
    // served covers only node 1; 2 and 3 must begin at 10⁶ — one
    // iteration over the symmetric pair {2,3} then leaves them at the
    // fixed point while 1 (isolated in these edges) is absent entirely.
    val served = Seq((1L, 777L)).toDF("node", "rank_micro")
    val e = edges((2L, 3L, 1L), (3L, 2L, 1L))
    val r = Graph.linkRankFrom(e, Some(served), iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r == Seq((2L, 1000000L), (3L, 1000000L)))
  }

  test("trustRank: all-nodes seed set degenerates to linkRank exactly") {
    // |S| = |V| collapses the seed teleport (150000·|V|) div |S| and the
    // seed start (10⁶·|V|) div |S| to the uniform 150000 / 10⁶ — the
    // two walks must agree bit-for-bit at every depth.
    val e = edges((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 5L), (2L, 1L, 1L))
    val all = Seq(1L, 2L, 3L).toDF("node")
    for (k <- 1 to 3) {
      val tr = Graph.trustRank(e, all, iters = k)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      val lr = Graph.linkRank(e, iters = k)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(tr == lr)
    }
  }

  test("trustRank: hand-computed star graph with a single seed") {
    // 1→{2,3}, {2,3}→1, unit weights, seed = {1}: nn = 3, ns = 1, so
    // node 1 starts at 3·10⁶ and teleports 450000; non-seeds get 0.
    val e = edges((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
    val seeds = Seq(1L).toDF("node")
    val r1 = Graph.trustRank(e, seeds, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // to each of 2,3: (17·3·10⁶) div 40 = 1275000; to 1: only teleport
    // (leaves start at 0 ⇒ contribute 0)
    assert(r1 == Seq((1L, 450000L), (2L, 1275000L), (3L, 1275000L)))
    val r2 = Graph.trustRank(e, seeds, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // to 1: 450000 + (17·1275000) div 20 from each leaf = 1083750 each;
    // to each leaf: (17·450000) div 40 = 191250
    assert(r2 == Seq((1L, 450000L + 2L * 1083750L),
      (2L, 191250L), (3L, 191250L)))
  }

  test("trustRank: seeds absent from the graph don't count toward |S|") {
    // seed table mentions 1 and 99; only 1 is a graph node, so ns = 1
    // and the walk must equal the single-seed run exactly.
    val e = edges((1L, 2L, 1L), (2L, 1L, 1L))
    val one = Graph.trustRank(e, Seq(1L).toDF("node"), iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val extra = Graph.trustRank(e, Seq(1L, 99L).toDF("node"), iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(one == extra)
  }

  test("trustRank: no seed in the graph is rejected") {
    val e = edges((1L, 2L, 1L), (2L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Graph.trustRank(e, Seq(99L).toDF("node"), iters = 1)
    }
  }

  test("hits: hand-computed bipartite graph, both half-steps and the rescale") {
    // 1→10, 2→10, 2→11 (unit weights), |V| = 4, target mass 4·10⁶.
    val e = edges((1L, 10L, 1L), (2L, 10L, 1L), (2L, 11L, 1L))
    def run(k: Int) = Graph.hits(e, iters = k)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    // iter 1: a_raw = (10:2e6, 11:1e6), Σ=3e6 < 4e6 ⇒ scale 1;
    // h_raw = (1:2e6, 2:3e6), Σ=5e6 ⇒ 5e6 div 4e6 = 1 ⇒ scale 1
    assert(run(1) == Seq(
      (1L, 2000000L, 0L), (2L, 3000000L, 0L),
      (10L, 0L, 2000000L), (11L, 0L, 1000000L)))
    // iter 2: a_raw = (10:5e6, 11:3e6), Σ=8e6 ⇒ scale 2 ⇒ (2.5e6, 1.5e6);
    // h_raw = (1:2.5e6, 2:4e6), Σ=6.5e6 ⇒ scale 1
    assert(run(2) == Seq(
      (1L, 2500000L, 0L), (2L, 4000000L, 0L),
      (10L, 0L, 2500000L), (11L, 0L, 1500000L)))
  }

  test("hits: edge weights multiply the half-step contributions") {
    // 1→10 with weight 3 vs 2→11 with weight 1: authority follows cnt·h
    val e = edges((1L, 10L, 3L), (2L, 11L, 1L))
    val r = Graph.hits(e, iters = 1)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    // a_raw = (10:3e6, 11:1e6), Σ=4e6 = target ⇒ scale 1
    assert(r.collect { case (10L, _, a) => a }.head == 3000000L)
    assert(r.collect { case (11L, _, a) => a }.head == 1000000L)
  }

  test("linkRank: rank mass is bounded by the uniform start mass") {
    // floor losses only shed mass; teleport restores exactly 15% of the
    // uniform total — so Σ rank ≤ |V|·10⁶ at every iteration depth.
    val e = edges((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 5L), (2L, 1L, 1L))
    for (k <- 1 to 4) {
      val total = Graph.linkRank(e, iters = k)
        .agg(sum("rank_micro")).as[Long].head()
      assert(total <= 3L * 1000000L)
      assert(total > 3L * 150000L)
    }
  }
}
