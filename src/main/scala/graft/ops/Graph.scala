package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the same
  * join-aggregate-per-round shape as
  * [[graft.llm.Dedup.connectedComponents]]: each round is one shuffle
  * keyed by node, lineage cut by localCheckpoint (a 10-round loop would
  * otherwise compound a 10-deep join plan), previous rounds' blocks
  * released eagerly.
  */
object Graph {

  /** Weighted PageRank. `edges` = (src, dst, weight); out-edge
    * probabilities are weight / out-strength. Dangling mass (rank sitting
    * on nodes with no out-edges) is redistributed uniformly each round —
    * the full stochastic fix, so Σrank = 1 at every iteration and the
    * ranks are a true probability distribution (downstream consumers
    * assume it). The per-round cost of the fix is one semi-join scalar
    * aggregate over |V| plus a broadcast of its 1-row result — nothing
    * node-quadratic. Ranks start uniform at 1/N; each round is
    * contribution-join + per-node sum + dangling/teleport mix. At corpus
    * scale every stage is keyed by node id; nothing materializes more
    * than |E| + |V| rows.
    */
  def pageRank(edges: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    // materialize the INPUT edge pipeline once: nodes and norm each
    // checkpoint independently, and without this the caller's (often
    // expensive) edge derivation — for q_pagerank, a full per-user
    // window over the events table — executes once per consumer
    val e = edges.localCheckpoint()
    // try/finally (the connectedComponents discipline): a failure in the
    // nodes count or norm checkpoint must not strand e's blocks until
    // driver GC; release is a no-op once the blocks are gone
    val (nodes, n, norm) = try {
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      try {
        val n = nodes.count().toDouble
        val outStrength = e.groupBy("src").agg(sum(col("weight")).as("wout"))
        val norm = e.join(outStrength, Seq("src"))
          .select(col("src"), col("dst"),
            (col("weight").cast("double") / col("wout")).as("p"))
          .localCheckpoint()
        (nodes, n, norm)
      } catch { case t: Throwable =>
        // the count or the norm checkpoint failed: nodes' |V|-row blocks
        // must not outlive the call either
        bridge.releaseLocalCheckpoint(nodes); throw t
      }
    } finally {
      // nodes and norm are themselves checkpointed; the raw edge blocks
      // have no further reader
      bridge.releaseLocalCheckpoint(e)
    }
    // nodes with no out-edges: their whole rank is dangling mass
    val dangling = nodes
      .join(norm.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint()

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val dmass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dmass"))
      val contrib = norm.join(ranks, norm("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dmass") / lit(n))).as("rank"))
        .localCheckpoint()
      bridge.releaseLocalCheckpoint(ranks)
      ranks = next
    }
    bridge.releaseLocalCheckpoint(norm)
    bridge.releaseLocalCheckpoint(nodes)
    bridge.releaseLocalCheckpoint(dangling)
    ranks
  }

  /** k-core decomposition by iterative peeling: repeatedly delete nodes
    * of degree < k until none remain; survivors form the k-core — the
    * "dense kernel" membership test (spam rings, tight dup communities)
    * that degree alone can't answer (a hub wired to leaves has high
    * degree and no core). Each round is one degree aggregate + one
    * semi-join filter, checkpoint-per-round with eager release (the
    * pageRank/CC discipline); rounds are bounded by the peel depth,
    * which is small on real graphs (each round removes every
    * currently-underqualified node at once, not one node at a time).
    *
    * Returns the k-core's (node, deg_in_core). Oracle-checked despite
    * the data-dependent round count: a fixpoint unrolled past its
    * convergence depth is stable, so the DuckDB oracle unrolls a
    * generous fixed round count (LlmQueries.kcoreOracleSql) and the
    * `require(converged)` below guarantees any under-unroll surfaces as
    * a loud hash mismatch, never a silent wrong answer. Spec-level
    * contract on top: hand graphs with known cores, plus the invariant
    * every returned degree ≥ k.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    require(k >= 1, s"k must be >= 1: $k")
    var cur = edges
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    // round-22: carry the surviving-edge count across rounds — the old
    // `next.count() == cur.count()` re-counted the PREVIOUS frame every
    // round (it was already counted as next last round), one redundant
    // job per peel round
    var curCount = cur.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val deg = cur.select(col("u").as("node"))
        .union(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      val next = cur
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint()
      val nextCount = next.count()
      converged = nextCount == curCount
      curCount = nextCount
      bridge.releaseLocalCheckpoint(cur)
      cur = next
      iter += 1
    }
    require(converged, s"k-core peel did not converge in $maxIter rounds")
    // materialize BEFORE releasing cur: the result must not read through
    // a truncated checkpoint lineage (the CC/pageRank release rule)
    val out = cur.select(col("u").as("node"))
      .union(cur.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("bigint").as("deg_in_core"))
      .localCheckpoint()
    bridge.releaseLocalCheckpoint(cur)
    out
  }

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * the (symmetrized) edge list — positive means hubs link hubs
    * (social/community structure), negative means hubs link leaves
    * (star/broadcast structure). One degree aggregate, two joins keyed
    * by node, one corr — all single-pass; round-6 on the corr is the
    * q_corr_matrix contract.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    // symmetrize: an undirected edge contributes both (du,dv) and (dv,du)
    withDeg.select(col("du").as("a"), col("dv").as("b"))
      .union(withDeg.select(col("dv").as("a"), col("du").as("b")))
      .agg((count(lit(1)) / 2).cast("bigint").as("n_edges"),
        round(corr(col("a"), col("b")), 6).as("assortativity"))
  }

  /** Per-node triangle counts + local clustering coefficient by
    * degree-ordered edge orientation (Suri & Vassilvitskii, WWW'11 —
    * "the curse of the last reducer"): orient every undirected edge from
    * its lower-(degree, id) endpoint, enumerate wedges at each source,
    * close them against the oriented edge list. Each triangle is built
    * exactly once, and — the scale point — wedge fan-out is bounded by
    * the ORIENTED out-degree (O(√m) for any graph), not the raw degree:
    * a celebrity node with 10⁸ neighbors produces almost no wedges
    * because nearly all its edges orient INTO it — the skew ("last
    * reducer") fix the naive neighbor self-join lacks.
    *
    * What orientation does NOT fix: the TOTAL wedge mass Σ C(d⁺, 2). A
    * near-dup graph is mega-cliques (measured: sf0.1's full minhash
    * graph is 837k edges over 2.9k nodes → 2.5e8 wedges), and an
    * n-clique owns Θ(n³) triangles — no enumeration beats its own
    * output size. At scale this op belongs on SPARSE similarity graphs
    * or a blocked/collapsed one (dedup exact groups first, or bound the
    * block the way q_triangle_stats does); ScaleCheck proves the blocked
    * per-replica form, not a full dup-graph census.
    *
    * Every stage is an equi-join keyed by node or edge — wedge build on
    * src, closure on the (dst₁, dst₂) edge key. lcc = n_tri / C(deg, 2)
    * in micro-units (deg < 2 degrades to 0, the microRatio convention).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("bigint").as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    val e1 = oriented.as("e1")
    val e2 = oriented.as("e2")
    val wedges = e1.join(e2,
        col("e1.src") === col("e2.src") &&
          (col("e1.ddst") < col("e2.ddst") ||
            (col("e1.ddst") === col("e2.ddst") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
    val closer = oriented.select(col("src").as("b"), col("dst").as("c"))
    val triangles = wedges.join(closer, Seq("b", "c"))
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("bigint").as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        // integral div, not `/`: double division loses exactness once
        // deg² passes 2⁵³ (the Tables.eventsLayout nanos lesson); Dec
        // variant because n_tri ≤ C(deg,2) crosses Long.MaxValue/1e6 at
        // hub degree ~4.3e6 — routine in a near-dup clique graph. The
        // C(deg,2) DENOMINATOR is decimal too: the Long product
        // deg·(deg−1) wraps past hub degree ~3.04e9, and a plain DIV 2
        // would collapse back to Long before microRatioDec re-widens.
        // deg·(deg−1) is even, so the decimal /2 is exact.
        graft.llm.TextStats.microRatioDec(coalesce(col("n_tri"), lit(0L)),
          expr("CAST(deg AS DECIMAL(38,0)) * (deg - 1) / 2"))
          .as("lcc_micro"))
  }
}
