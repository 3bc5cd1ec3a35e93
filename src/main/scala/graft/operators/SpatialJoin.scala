package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.geom.{GeomFunctions => G}

/** Broadcast spatial join (SURVEY §4 item 3 — the 100 TB path for
  * erase/overlay).
  *
  * Declared as a plain predicate join on the native `st_intersects`
  * expression; [[graft.plans.SpatialJoinStrategy]] (installed by
  * `GraftExtensions` on every engine session) plans it as
  * [[graft.plans.SpatialIndexJoinExec]]: the smaller side goes through
  * a real BroadcastExchange, each task bulk-loads it into an STRtree
  * once, and the streaming side probes envelopes — O(n·log m) instead
  * of the O(n·m) BroadcastNestedLoopJoin a predicate join would
  * otherwise get. The big side never shuffles, the exchange is
  * AQE-reusable, and on a session without the extension the same plan
  * still executes correctly (nested-loop fallback).
  *
  * The output schema is big's columns ++ small's columns (caller
  * ensures disjoint names), identical to the predicate join's.
  */
object SpatialJoin {

  /** Inner intersects-join of `big` against broadcast-indexed `small`. */
  def broadcastIntersects(
      big: DataFrame, small: DataFrame,
      bigGeom: String = "geom", smallGeom: String = "geom"): DataFrame =
    big.join(small, G.st_intersects(col(bigGeom), col(smallGeom)))
}
