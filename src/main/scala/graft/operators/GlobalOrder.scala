package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic global total order without a single-reducer window.
  *
  * The naive `row_number() OVER (ORDER BY k)` plans an empty window
  * partition spec: EVERY row funnels through ONE task — the exact
  * anti-pattern `Dedup.exact`/`TopKAgg` exist to avoid, and a
  * guaranteed stall at 100 TB. A training-data pipeline still needs
  * the total order: the global shuffle + shard assignment a dataloader
  * consumes must be reproducible run-to-run and engine-independent.
  *
  * [[globalRank]] produces the same answer at shuffle parallelism:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the order key
  *     — one range exchange, the only full-data movement.
  *  2. Per-partition row counts (`groupBy(spark_partition_id)`) —
  *     a bounded driver collect of ≤ `parts` rows, prefix-summed to
  *     per-partition starting offsets.
  *  3. A partition-preserving `mapPartitions` adds `offset + i` per
  *     row — no second shuffle, order within partitions already
  *     established by step 1.
  *
  * Ranks are dense, 0-based, and unique as long as the order columns
  * form a total order (pass a tiebreak id; md5 keys alone collide with
  * negligible probability but the id makes it airtight).
  *
  * CACHE CONTRACT: the ranged frame is persisted via
  * [[graft.CacheLifecycle]] and stays persisted in the RETURNED plan —
  * the persist is load-bearing, not an optimization: the count job
  * (step 2) and the `mapPartitions` job (step 3) must observe the SAME
  * physical partitioning for the `spark_partition_id`/
  * `TaskContext.getPartitionId` offset correspondence to hold. If the
  * cache were dropped between the two jobs, correctness would rest
  * only on the order key being total (true when a tiebreak id is
  * passed, but not enforced). Callers therefore own the release: after
  * materializing the result, call `CacheLifecycle.release(spark)` (the
  * bench/verify harnesses do this between groups) — each unreleased
  * call leaks one cached DataFrame for the session's life.
  */
object GlobalOrder {

  def globalRank(
      df: DataFrame, orderCols: Seq[Column], parts: Int,
      out: String = "pos"): DataFrame = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .transform(graft.CacheLifecycle.persist(_))
    // bounded: one row per partition, not per data row
    val counts: Map[Int, Long] = ranged
      .groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = counts.keys.foldLeft(-1)(math.max)
    val offsets = new Array[Long](maxPid + 2)
    var pid = 0
    while (pid <= maxPid) {
      offsets(pid + 1) = offsets(pid) + counts.getOrElse(pid, 0L)
      pid += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val enc = Encoders.row(ranged.schema.add(out, LongType, nullable = false))
    ranged.mapPartitions { it =>
      val base = bc.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { r => val nr = Row.fromSeq(r.toSeq :+ (base + i)); i += 1L; nr }
    }(enc)
  }

  /** Shard assignment over a [[globalRank]]: rank modulo `nShards`
    * stripes neighbors across shards so every shard sees the same
    * key-space coverage (the round-robin dealing a dataloader wants),
    * while `rank / shardSize` would instead give contiguous cuts.
    */
  def shuffleShards(
      df: DataFrame, idCol: String, salt: String, nShards: Int,
      parts: Int): DataFrame = {
    val keyed = df.withColumn("__k",
      md5(concat(col(idCol).cast("string"), lit(":" + salt))))
    globalRank(keyed, Seq(col("__k"), col(idCol)), parts)
      .withColumn("shard", pmod(col("pos"), lit(nShards.toLong)))
      .drop("__k")
  }
}
