package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-analytics primitives over edge-list DataFrames. The iterative
  * passes (connected components, PageRank) live with their domains
  * (Dedup.dedupGroups, s10); this object holds the one-shot
  * combinatorial ops.
  */
object Graph {

  /** Triangle census of an undirected graph, in the DEGREE-ORIENTED
    * form that scales: each edge is oriented low-(degree,name) → high,
    * so every triangle is enumerated exactly once and each node's
    * out-list is O(√m) — the wedge join never squares a hub's degree
    * (the naive undirected three-way join does). Input `edges` must be
    * distinct undirected pairs (a, b) with a < b and no self-loops; it
    * is localCheckpointed internally because degrees, orientation, and
    * the two wedge joins re-reference it (self-joins never reuse
    * subtrees — the §6 Catalyst trap). Output: ONE all-integer row
    * (n_nodes, n_edges, n_wedges, n_triangles, global_cc_bp =
    * floor(3T/W · 10⁴)).
    */
  /** k-core decomposition by iterative peeling: repeatedly remove
    * nodes of degree < k (and their edges) until FIXPOINT — the
    * cascade matters: removing one node can push its neighbors below
    * k (a single degree-filter pass is NOT a k-core; PipelineSpec
    * plants the path graph where the difference shows). Returns the
    * surviving (w, core_deg) rows. Driver-side loop like d9's label
    * propagation: convergence detected by edge count (edges shrink iff
    * some node dropped), every iteration runs on the localCheckpointed
    * vocabulary-sized edge list — the corpus is never touched.
    * `maxIters` is a SAFETY CAP, not the semantics: hitting it throws
    * (a loud contract beats silently returning non-core survivors —
    * round-7 verdict finding; GraphPropertySpec plants a 20-node path
    * whose k=2 cascade needs 10 peels, past the old bound of 8). The
    * default cap is far above any plausible cascade depth on
    * collocation-class graphs (observed ≤ 4 at every tested SF; each
    * extra peel costs one vocabulary-sized agg + two broadcast semi
    * joins, so a deep cascade is slow, never wrong). Spark recursion
    * can't express this natively for the same reason as d9/s10: the
    * per-level degree AGGREGATE over the recursive reference is
    * prohibited (canary-pinned in RegressionSpec). */
  def kCore(edgesIn: DataFrame, k: Int, maxIters: Int = 64): DataFrame = {
    var edges = edgesIn.localCheckpoint()
    var nEdges = edges.count()
    var done = nEdges == 0L
    var it = 0
    while (!done && it < maxIters) {
      val keep = edges.select(explode(array(col("a"), col("b"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("w"))
      val pruned = edges
        .join(broadcast(keep.withColumnRenamed("w", "a")), Seq("a"))
        .join(broadcast(keep.withColumnRenamed("w", "b")), Seq("b"))
        .select(col("a"), col("b"))
        .localCheckpoint()
      val n = pruned.count()
      done = n == nEdges
      nEdges = n; edges = pruned; it += 1
    }
    require(done,
      s"kCore($k) did not reach fixpoint within $maxIters peels " +
        s"($nEdges edges remain) — raise maxIters; a truncated peel is " +
        "not a k-core")
    edges.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("core_deg"))
  }

  def triangleStats(edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.localCheckpoint()
    val deg = edges.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val oriented = edges
      .join(broadcast(deg.select(col("w").as("a"), col("deg").as("da"))), Seq("a"))
      .join(broadcast(deg.select(col("w").as("b"), col("deg").as("db"))), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y"))
    val tri = e1
      .join(oriented.select(col("src").as("y"), col("dst").as("z")), Seq("y"))
      .join(oriented.select(col("src").as("x"), col("dst").as("z")),
        Seq("x", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodeAgg = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edgeAgg = edges.agg(count(lit(1)).as("n_edges"))
    nodeAgg.crossJoin(broadcast(edgeAgg)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges > 0 THEN 3 * n_triangles * 10000 div n_wedges ELSE 0 END")
          .as("global_cc_bp"))
  }
}
