package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Adaptive parallelism guard for CPU-multiplying operators.
  *
  * File scans parallelize by BYTES (`spark.sql.files.maxPartitionBytes`),
  * but operators that explode each row into many derived rows (token
  * n-grams, gram buckets) multiply CPU per input byte by orders of
  * magnitude — a compact 600 KB parquet becomes ONE scan split and the
  * entire expansion runs serially on one core while 31 idle. At lake
  * scale the input spans thousands of splits and no fix is needed, so
  * an unconditional `repartition` would add a full shuffle of the
  * source exactly where it is pure cost.
  *
  * `ensure` therefore repartitions ONLY when the physical partition
  * count is below the cluster's parallelism: the bench/verify-scale
  * serial funnel gets spread across cores, and an already-parallel
  * 100 TB scan passes through untouched. Keyed spreading is preferred
  * (deterministic assignment, and a downstream `groupBy` on the same
  * key reuses the partitioning — Generate/broadcast-join nodes are
  * row-local, so the clustering survives to the rollup); keyless falls
  * back to round-robin.
  */
object Spread {

  def ensure(df: DataFrame, key: Column*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val cores = sc.defaultParallelism
    // Shuffle-bearing plans pass through untouched, for two reasons:
    // their parallelism is already governed by
    // spark.sql.shuffle.partitions, and — the sharp edge — probing
    // df.rdd.getNumPartitions on such a plan under AQE EXECUTES every
    // upstream shuffle stage (getFinalPhysicalPlan materializes them
    // just to answer the partition count), running the upstream twice
    // once the frame is re-planned inside the caller's larger query.
    // The scan-only frames this guard exists for contain none of these.
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffles = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort => true
      case _: RepartitionOperation => true
      case _ => false
    }
    if (shuffles) df
    // exchange-free plan: the rdd probe compiles without running a job
    else if (df.rdd.getNumPartitions >= cores) df
    else if (key.nonEmpty) df.repartition(cores, key: _*)
    else df.repartition(cores)
  }
}
