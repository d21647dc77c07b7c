package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Lineage.LineageOps

/** [EXT] Iterative graph analytics over edge tables. Companion to
  * `DedupOps.connectedComponents` (min-label propagation): same design
  * rules — the iterated state is a NARROW (id, value) table, the heavy
  * edge table is normalized once and reused every round, and each round's
  * lineage is cut (durable `checkpoint()` under `spark.graft.checkpointDir`,
  * else lazy `localCheckpoint`) so plans don't snowball.
  */
object GraphOps {

  /** Weighted PageRank with a fixed iteration count and proper dangling-
    * mass redistribution:
    * `r'(v) = (1−d)/N + d·(Σ_{(u,v)∈E} r(u)·w(u,v)/out_w(u) + D/N)`
    * where `D = Σ_{u dangling} r(u)`. Nodes are `src ∪ dst` of the edge
    * table.
    *
    * Scale posture: the transition table (edges with out-weight-normalized
    * probabilities) is computed once, lineage-cut, and re-joined each
    * round; per round the plan is one equi-join ranks⋈trans on src + one
    * hash aggregate on dst + a one-row dangling-mass aggregate broadcast
    * back in — the rank state that iterates is (id, rank), never the edge
    * table. N is the single driver-side scalar (one count, like the
    * connected-components convergence check); iterations are fixed by
    * contract, so the oracle can unroll them exactly. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
    // node membership from ALL edges, transitions from positive ones only:
    // a node whose edge weights sum to 0 would yield NaN/Infinity
    // transition probabilities that propagate into every downstream rank.
    // Non-positive edges carry no mass — dropped from the transition
    // table; their endpoints remain as nodes (sources become dangling, so
    // their rank mass redistributes uniformly).
    val nodes = e0.select(col("src").as("id"))
      .unionByName(e0.select(col("dst").as("id")))
      .distinct().cut(eager = false)
    val e = e0.filter(col("w") > 0)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val trans = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("p"))
      .cut(eager = false)
    val dangling = nodes
      .join(trans.select(col("src").as("id")), Seq("id"), "left_anti")
      .cut(eager = false)
    val n = nodes.count().toDouble

    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    var iter = 0
    while (iter < iterations) {
      val dmass = ranks.join(dangling, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contrib = trans.join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("p") * col("rank")).as("c"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / n)).as("rank"))
        .cut(eager = false)
      iter += 1
    }
    ranks
  }

  /** Hop-bounded BFS from a set of source nodes: returns every node
    * reachable within `maxHops` directed hops with its shortest hop count.
    * Frontier iteration: each round joins ONLY the newly-discovered
    * frontier (not the visited set) against the edge table, anti-joins
    * away already-visited nodes, and unions into the visited set — so
    * round h's join cost is |frontier_h| × out-degree, and a node's first
    * discovery is by construction its shortest distance. Same narrow-state
    * + lineage-cut discipline as [[pageRank]] / connectedComponents. */
  /** Exact per-node triangle counts via DEGREE-ORDERED orientation (the
    * Cohen / Suri-Vassilvitskii MapReduce form): canonicalize to a simple
    * undirected graph, then orient every edge from its lower-(degree, id)
    * endpoint to the higher one. Every node's oriented out-degree is
    * O(√m), so the wedge self-join costs Σ outdeg² = O(m^1.5) — the naive
    * neighbor join is Σ deg², which a single celebrity hub turns
    * quadratic. Each triangle is discovered exactly once (its minimum-
    * order vertex generates the wedge; the closing edge is itself
    * low→high oriented), then attributed to all three vertices. Returns
    * (id, n_triangles) for EVERY node of the simple graph, zero-filled.
    *
    * All three joins are equi-joins on node keys (the orientation
    * comparison rides a sortable (deg, id) struct); self-loops and
    * parallel/reversed duplicates are dropped in canonicalization. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct().cut(eager = false)
    val deg = und.select(col("u").as("id"))
      .unionByName(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .cut(eager = false)
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // sortable orientation key: (deg, id) — field names unified so the
    // struct equi-joins and orders across both branches
    val ku = struct(col("du").as("d"), col("u").as("i"))
    val kv = struct(col("dv").as("d"), col("v").as("i"))
    val oriented = withDeg
      .select(when(lowFirst, ku).otherwise(kv).as("ka"),
        when(lowFirst, kv).otherwise(ku).as("kb"))
      .cut(eager = false)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.ka") === col("y.ka") && col("x.kb") < col("y.kb"))
      .select(col("x.ka").as("ka"), col("x.kb").as("kb"),
        col("y.kb").as("kc"))
    val tris = wedges.as("w").join(oriented.as("z"),
      col("w.kb") === col("z.ka") && col("w.kc") === col("z.kb"))
    val perNode = tris
      .select(explode(array(col("w.ka.i"), col("w.kb.i"), col("w.kc.i"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    deg.select(col("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Fixed-round k-core peeling: canonicalize to a simple undirected
    * graph, then `rounds` times drop every node whose current degree is
    * < `k` (with its edges) — the standard iterative peel whose fixpoint
    * is the k-core (Matula–Beck). Rounds are fixed by contract, exactly
    * like [[pageRank]]'s iteration count, so the oracle can unroll them;
    * the fixpoint-equals-true-k-core property is spec-checked separately
    * (GraphOpsSpec) since "converged" is data-dependent. Returns
    * (id, deg): degree over the surviving edge set, one row per node that
    * still has an edge.
    *
    * Scale posture: per round one hash aggregate (degrees) + two
    * left-semi joins of the edge table against the (narrow) survivor set;
    * the edge table shrinks monotonically, survivors are a single-column
    * state, and each round's lineage is cut. No all-pairs shape anywhere;
    * peel rounds needed to converge is bounded by the degeneracy ordering
    * depth — for fixed `rounds` the cost is rounds × O(|E| surviving). */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
                k: Int, rounds: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct().cut(eager = false)
    var round = 0
    while (round < rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("id"))
        .cut(eager = false)
      e = e.join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .cut(eager = false)
      round += 1
    }
    degrees(e)
  }

  /** Fixed-round synchronous label propagation (community detection):
    * every node starts with its own id as label; each round EVERY node
    * simultaneously adopts the most frequent label among its neighbors,
    * ties broken to the smallest label — the deterministic variant of
    * Raghavan et al.'s LPA (the async/random form is irreproducible
    * cross-engine, so rounds and tie-break are fixed by contract exactly
    * like [[pageRank]]'s iteration count and the oracle unrolls them).
    *
    * Scale posture: per round one equi-join of the (static, lineage-cut)
    * bidirectional adjacency table against the narrow (id, label) state
    * + one (node, label) hash aggregate + one argmax aggregate — the
    * argmax rides a sortable (-count, label) struct, so `min` gives
    * "most frequent, then smallest" with map-side partial aggregation
    * and no window sort (negating the COUNT, not the label, keeps the
    * contract type-generic: node ids only need an ordering, not signed
    * arithmetic — string ids work, and no id value can overflow a
    * negation). State is never wider than two columns. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
      .cut(eager = false)
    var labels = adj.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .cut(eager = false)
    var round = 0
    while (round < rounds) {
      val counts = adj
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = counts
        .groupBy(col("a").as("id"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("label"))
      round += 1
      // cut BETWEEN rounds only: intermediate lineage must not snowball,
      // but the final round's plan stays inspectable (plan-quality specs
      // assert the argmax shape) and skips one needless checkpoint
      if (round < rounds) labels = labels.cut(eager = false)
    }
    labels
  }

  /** Fixed-round Bellman–Ford single-source shortest paths over a
    * weighted directed edge table: `rounds` min-plus relaxations from the
    * source set, so the result is the shortest distance among paths of at
    * most `rounds` edges — the weighted sibling of [[shortestHops]].
    * Integer weights keep every candidate path cost exact, so `min` is
    * deterministic cross-engine and the oracle unrolls the identical
    * recurrence.
    *
    * Scale posture: per round one equi-join of the current distance
    * frontier (narrow (id, dist) state) against the edge table on src +
    * one min hash-aggregate; lineage cut per round. Unlike the textbook
    * formulation there is no |V|×rounds dense table — only reached nodes
    * carry state. */
  def ssspBellmanFord(edges: DataFrame, srcCol: String, dstCol: String,
                      weightCol: String, sources: DataFrame, idCol: String,
                      rounds: Int): DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .cut(eager = false)
    var dist = sources.select(col(idCol).as("id"), lit(0L).as("dist"))
      .distinct()
    var round = 0
    while (round < rounds) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
        .cut(eager = false)
      round += 1
    }
    dist
  }

  def shortestHops(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, idCol: String,
                   maxHops: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cut(eager = false)
    var visited = sources.select(col(idCol).as("id"), lit(0).as("dist"))
      .distinct()
    var frontier = visited
    var hop = 1
    while (hop <= maxHops) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), lit(hop).as("dist"))
        .cut(eager = false)
      visited = visited.unionByName(next).cut(eager = false)
      frontier = next
      hop += 1
    }
    visited
  }
}
