package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.geom.GeomCodec

/** The grid-partitioned kNN fallback must return EXACTLY the broadcast
  * path's answer — same rows, same distances — under every dispatch:
  * dense data resolving in the first grid rounds, sparse outliers
  * falling through to the residual broadcast pass, and k larger than
  * the right side.
  */
class NearestJoinGridSpec extends SparkTestBase {
  import spark.implicits._

  private def pts(n: Int, seed: Long, extent: Double) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, GeomCodec.wktToWkb(
        s"POINT(${rnd.nextDouble() * extent} ${rnd.nextDouble() * extent})"))
    }
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("near_rid"), round(col("near_distance"), 9).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3, t._2)).toSeq

  test("grid kNN equals broadcast kNN on dense points (grid rounds resolve)") {
    val left = pts(120, seed = 1, extent = 10).toDF("id", "geom")
    val right = pts(200, seed = 2, extent = 10)
      .map { case (i, g) => (i, g, s"r$i") }.toDF("rid", "geom", "tag")
    val brute = NearestJoin.nearestJoin(left, "geom", right, "geom", k = 3)
    val grid = NearestJoin.nearestJoinGrid(left, "geom", right, "geom", k = 3,
      cellSize = 2.0, numPartitions = 4)
    assert(canon(grid) == canon(brute))
    // and the payload columns ride along identically
    assert(grid.columns.toSeq == brute.columns.toSeq)
    assert(grid.filter(col("near_tag").isNull).count() == 0)
  }

  test("grid kNN equals broadcast kNN when outliers need the residual pass") {
    // a tight cluster plus far-flung outliers; cellSize so small that
    // the outliers' neighbors sit hundreds of cells away -> they cannot
    // resolve within the 5 grid rounds and take the residual path
    val cluster = pts(40, seed = 3, extent = 1.0)
    val outliers = Seq(
      (900L, GeomCodec.wktToWkb("POINT(500 500)")),
      (901L, GeomCodec.wktToWkb("POINT(-400 300)")))
    val left = (cluster ++ outliers).toDF("id", "geom")
    val right = pts(60, seed = 4, extent = 1.0)
      .map { case (i, g) => (i, g) }.toDF("rid", "geom")
    val brute = NearestJoin.nearestJoin(left, "geom", right, "geom", k = 2)
    val grid = NearestJoin.nearestJoinGrid(left, "geom", right, "geom", k = 2,
      cellSize = 0.25, numPartitions = 4)
    assert(canon(grid) == canon(brute))
  }

  test("grid kNN: k exceeding the right side yields all right rows per left") {
    val left = pts(5, seed = 5, extent = 2.0).toDF("id", "geom")
    val right = pts(3, seed = 6, extent = 2.0).toDF("rid", "geom")
    val grid = NearestJoin.nearestJoinGrid(left, "geom", right, "geom", k = 10,
      cellSize = 1.0, numPartitions = 2)
    assert(grid.count() == 5 * 3)
    val brute = NearestJoin.nearestJoin(left, "geom", right, "geom", k = 10)
    assert(canon(grid) == canon(brute))
  }

  test("grid kNN: points exactly ON cell boundaries (ownership-rule edge)") {
    // every coordinate is a multiple of the cell size, so envelopes and
    // reference points land EXACTLY on cell corners — the floor-based
    // ownership rule must still emit each pair exactly once. Symmetric
    // layouts create genuine distance ties, and the two paths break
    // ties differently (JTS traversal vs stable rid), so compare the
    // per-left DISTANCE multiset, plus global row counts.
    val left = (for { x <- 0 to 4; y <- 0 to 4 }
      yield ((x * 5 + y).toLong, GeomCodec.wktToWkb(s"POINT(${x * 2.0} ${y * 2.0})")))
      .toDF("id", "geom")
    val right = (for { x <- 0 to 2; y <- 0 to 2 }
      yield ((100 + x * 3 + y).toLong, GeomCodec.wktToWkb(s"POINT(${x * 4.0} ${y * 4.0})")))
      .toDF("rid", "geom")
    def distsByLeft(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), round(col("near_distance"), 9).as("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val brute = NearestJoin.nearestJoin(left, "geom", right, "geom", k = 3)
    val grid = NearestJoin.nearestJoinGrid(left, "geom", right, "geom", k = 3,
      cellSize = 2.0, numPartitions = 4)
    assert(grid.count() == 25 * 3)                 // exactly once per pair rank
    assert(distsByLeft(grid) == distsByLeft(brute))
  }

  test("grid kNN: null left geometries drop, polygons on the right work") {
    val left = (pts(10, seed = 7, extent = 4.0) :+ (99L, null: Array[Byte]))
      .toDF("id", "geom")
    val right = Seq(
      (1L, GeomCodec.wktToWkb("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")),
      (2L, GeomCodec.wktToWkb("POLYGON((3 3, 4 3, 4 4, 3 4, 3 3))"))
    ).toDF("rid", "geom")
    val brute = NearestJoin.nearestJoin(left, "geom", right, "geom", k = 1)
    val grid = NearestJoin.nearestJoinGrid(left, "geom", right, "geom", k = 1,
      cellSize = 1.0, numPartitions = 2)
    assert(grid.filter(col("id") === 99L).count() == 0)
    assert(canon(grid) == canon(brute))
  }

  test("grid kNN memoizes per canonicalized inputs — repeats run zero jobs") {
    // r22: the grid search runs EAGERLY (multi-round job cascade +
    // materializing persist) at operator-call time; a repeat invocation
    // on the same inputs (every bench rep) must serve the memoized
    // frame instead of re-running the cascade and stacking a second
    // persisted copy. Jobs are counted by job group (set on the calling
    // thread, which drives the eager rounds) so unrelated session
    // activity can't flake the zero assertion.
    val left = pts(60, seed = 21, extent = 8.0).toDF("id", "geom")
    val right = pts(80, seed = 22, extent = 8.0).toDF("rid", "geom")
    val groupId = "grid-memo-spec"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (e.properties != null &&
            groupId == e.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    graft.CacheLifecycle.release(spark)
    val persistedBefore = graft.CacheLifecycle.trackedCount(spark)
    val first = canon(NearestJoin.nearestJoinGrid(left, "geom", right, "geom",
      k = 2, cellSize = 2.0, numPartitions = 2))
    val persistedAfterFirst = graft.CacheLifecycle.trackedCount(spark)
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(groupId, "grid memo spec")
    try {
      // same inputs rebuilt fresh: canonicalized plans match, no jobs
      // from the operator itself (canon()'s collect is outside it —
      // assert on the frame identity instead of re-collecting)
      val again = NearestJoin.nearestJoinGrid(left, "geom", right, "geom",
        k = 2, cellSize = 2.0, numPartitions = 2)
      Thread.sleep(300) // bounded drain of the async listener bus
      assert(jobs.get() == 0,
        s"memoized grid search still ran ${jobs.get()} job(s)")
      // no second persisted copy stacked next to the first
      assert(graft.CacheLifecycle.trackedCount(spark) == persistedAfterFirst)
      assert(canon(again) == first)
      // a DIFFERENT parameterization misses the memo (k changes the
      // answer; the key carries every search parameter)
      val k3 = NearestJoin.nearestJoinGrid(left, "geom", right, "geom",
        k = 3, cellSize = 2.0, numPartitions = 2)
      val deadline = System.nanoTime() + 3_000_000_000L
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(jobs.get() > 0, "different k should rebuild, not serve the memo")
      // 60 left rows × k=3 (right side has 80 rows, so every left row
      // always finds 3 neighbours)
      assert(k3.count() == 180)
      // release evicts memo AND persist together
      graft.CacheLifecycle.release(spark)
      assert(graft.CacheLifecycle.trackedCount(spark) == persistedBefore)
      jobs.set(0)
      val rebuilt = NearestJoin.nearestJoinGrid(left, "geom", right, "geom",
        k = 2, cellSize = 2.0, numPartitions = 2)
      val deadline2 = System.nanoTime() + 3_000_000_000L
      while (jobs.get() == 0 && System.nanoTime() < deadline2) Thread.sleep(50)
      assert(jobs.get() > 0, "release did not evict the grid memo")
      assert(canon(rebuilt) == first)
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
