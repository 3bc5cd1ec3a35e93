package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * face of the extension surface (co-purchase influence, link-graph
  * quality signals for corpus curation à la Brin & Page 1998).
  *
  * Spark-first iterative shape: rank is a DataFrame keyed by vertex;
  * each iteration is ONE hash-exchange join (edges ⋈ ranks on src) and
  * one partial-aggregated groupBy on dst — the exact Pregel
  * message/combine cycle, expressed declaratively so Catalyst fuses
  * the per-iteration pipeline and AQE splits hub-vertex skew. The
  * prepared edge+degree frame is persisted through
  * [[graft.CacheLifecycle]]: iteration k must not recompute the edge
  * derivation k times (lineage grows linearly otherwise).
  *
  * Determinism contract: ranks are round(·, `digits`)ed at EVERY
  * iteration boundary, so summation-order drift (Σ contributions is
  * order-dependent in doubles) cannot compound across iterations —
  * the same contract lets an independent engine reproduce the scores
  * bit-for-bit (the x63 oracle unrolls the iterations in SQL).
  *
  * Fixed `iters` rather than convergence-test iteration: the driver
  * loop is bounded and plan size is known up front (a convergence test
  * needs a per-iteration action; at 100 TB you run a fixed budget and
  * checkpoint, exactly as GraphX's staticPageRank does).
  */
object PageRank {

  /** `edges` must list BOTH directions of an undirected graph (or the
    * true arcs of a directed one). Every vertex that appears as `src`
    * has outdegree ≥ 1, so no dangling-mass correction is needed;
    * vertices appearing only as `dst` still receive rank. Output:
    * `v`, `rank`.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85, digits: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // deg is persisted too: the caller's edge derivation is typically
    // the expensive part (a self-join + distinct for co-occurrence
    // graphs), and deg/nTot/rank0 would otherwise each re-evaluate it —
    // with both persists the edge pipeline runs exactly twice (deg,
    // prep), never per-iteration and never per-initialization-leg
    val deg = graft.CacheLifecycle.persist(
      edges.groupBy(col(srcCol).as("s"))
        .agg(count(lit(1)).cast("double").as("deg")))
    val nTot = deg.agg(count(lit(1)).cast("double").as("n"))
    val prep = graft.CacheLifecycle.persist(
      edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
        .join(deg, "s"))

    var rank = deg.crossJoin(broadcast(nTot))
      .select(col("s").as("v"), round(lit(1.0) / col("n"), digits).as("rank"))
    for (_ <- 1 to iters) {
      val msgs = prep.join(rank, col("s") === col("v"))
        .groupBy(col("t"))
        .agg(sum(col("rank") / col("deg")).as("m"))
      rank = msgs.crossJoin(broadcast(nTot))
        .select(col("t").as("v"),
          round(lit(1.0 - damping) / col("n") + lit(damping) * col("m"), digits)
            .as("rank"))
    }
    rank
  }
}
