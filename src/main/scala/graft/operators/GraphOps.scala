package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-shape analytics over edge lists (the co-purchase /
  * link-graph face of the extension surface, alongside [[PageRank]]).
  *
  * Triangle counting is the canonical "curse of the last reducer"
  * problem: a natural wedge join explodes on hub vertices (a vertex
  * of degree d generates d² wedges). The fix is degree orientation
  * (Suri & Vassilvitskii, WWW 2011): orient every undirected edge
  * from its lower-(degree, id) endpoint to the higher one, making the
  * out-degree of EVERY vertex O(√m) — wedge generation is then
  * skew-bounded by construction, no salting needed, and each triangle
  * is generated exactly once (its lowest-ordered vertex is the only
  * wedge center whose two out-edges cover it).
  */
object GraphOps {

  /** Count triangles in an undirected simple graph given as an edge
    * list (either or both directions, duplicates tolerated — the
    * graph is canonicalized internally). Returns one row `triangles:
    * bigint`.
    *
    * Shape at scale: canonicalize (1 shuffle on the normalized pair) →
    * degree (1 partial-agg shuffle) → orient → wedge self-join on the
    * center vertex → LEFT SEMI join against the oriented edge set to
    * keep closed wedges. Both joins are plain hash-exchange equi-joins
    * on bounded-fanout keys; the count itself is a map-side partial
    * aggregate. The edge frame is persisted through
    * [[graft.CacheLifecycle]] because it feeds three legs (degree,
    * wedges twice, closure probe) — without it the caller's edge
    * derivation (typically a self-join + distinct) re-runs per leg.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val undirected = graft.CacheLifecycle.persist(
      edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
        .where(col("a") =!= col("b"))
        .distinct())

    // total degree per vertex (undirected), then orient each edge
    // lower-(deg, id) → higher-(deg, id). Ties break on vertex id, so
    // the orientation is a strict total order and acyclic.
    val deg = undirected.select(col("a").as("v"))
      .unionAll(undirected.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

    val withDeg = undirected
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // carry the out-neighbor's degree: wedge generation below orders
    // the two out-neighbors by the SAME (deg, id) key the orientation
    // uses, so only the one closable wedge order is produced (the
    // naive v1 =!= v2 variant generates every wedge twice)
    // Persisted PRE-HASH-PARTITIONED on the wedge-join key (guide
    // §2.4): e1 ⋈ e2 below reads this frame twice joined on `u`, and
    // the cached partitioning otherwise comes from the degree joins
    // (hash(b) at scale, where `deg` no longer broadcasts) — the wedge
    // join would then re-exchange the edge-cardinality frame TWICE.
    // Pre-partitioned, both wedge legs are co-partitioned for free and
    // the only edge-frame exchange left is the closure probe's (whose
    // key (u,w) genuinely differs). Explicit conf-derived N, not a
    // bare repartition(col), so AQE cannot coalesce the two legs to
    // different counts (x59 lesson).
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val oriented = graft.CacheLifecycle.persist(
      withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("w"),
        when(aFirst, col("db")).otherwise(col("da")).as("dw"))
        .repartition(parts, col("u")))

    // wedges centered at u: out-neighbor pairs (v1, v2) with v1 before
    // v2 in orientation order; the triangle closes iff the oriented
    // edge v1→v2 exists (orientation is a strict total order, so each
    // triangle is generated at exactly one center — its lowest vertex
    // — in exactly one order).
    val e1 = oriented.select(col("u"), col("w").as("v1"), col("dw").as("d1"))
    val e2 = oriented.select(col("u"), col("w").as("v2"), col("dw").as("d2"))
    val wedges = e1.join(e2, "u")
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
      .select(col("v1").as("u2"), col("v2").as("w2"))
    val closed = wedges.join(
      oriented.select(col("u").as("u2"), col("w").as("w2")),
      Seq("u2", "w2"), "left_semi")
    closed.agg(count(lit(1)).cast("bigint").as("triangles"))
  }
}
