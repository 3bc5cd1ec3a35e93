package graft.tools

/** Shared task-CPU accumulator for the dev probes (r19 review: the
  * listener + settle block was copy-pasted into GeomScaleProbe and
  * PersistServeProbe, with a third interleaved variant in Bench —
  * divergent settle semantics would silently skew measurements).
  *
  * Task CPU (`TaskMetrics.executorCpuTime`) is the query's own work;
  * process CPU charges JVM background (C2 bursts, concurrent GC, heap
  * paging) to whatever runs — the Bench lesson the probes inherit.
  * Listener events arrive on an async bus, so read the counter only
  * after [[settle]]: poll until two consecutive 20 ms reads agree,
  * bounded at ~400 ms (the public-API stand-in for the private
  * `listenerBus.waitUntilEmpty`). Bench keeps its own interleaved
  * copy because its settle covers the eviction counter too.
  */
final class TaskCpuMeter(sc: org.apache.spark.SparkContext) {
  private val ns = new java.util.concurrent.atomic.AtomicLong(0L)
  sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) ns.addAndGet(e.taskMetrics.executorCpuTime)
  })

  /** Cumulative task executor-CPU ns observed so far. */
  def now: Long = ns.get()

  /** Block until the listener counter holds still (see class doc). */
  def settle(): Unit = {
    var last = ns.get(); var i = 0
    while (i < 20) {
      Thread.sleep(20)
      val cur = ns.get()
      if (cur == last) i = 20 else { last = cur; i += 1 }
    }
  }
}
