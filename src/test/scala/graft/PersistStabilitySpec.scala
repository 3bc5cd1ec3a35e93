package graft

/** Structural invariant closing the capturing-UDF persist trap
  * (r12's root-caused ghost class; r13 finding: x17's winnowing UDF
  * was a live instance the per-site audit missed).
  *
  * The contract: every subtree an operator hands to
  * `CacheLifecycle.persist` must canonicalize STABLE — a second build
  * of the same entry must produce a `sameResult` plan for the same
  * subtree. Spark's CacheManager matches cached frames by
  * `sameResult` on the analyzed plan, and the bench rebuilds every
  * entry's DataFrame per rep: a persisted subtree that is NOT
  * sameResult across builds (a method-local `udf(...)` capturing its
  * parameters makes every invocation a fresh, canonically-unique
  * closure) can never serve reps 2+, so each rep silently recomputes
  * the scan AND registers an unmatchable twin cache entry. This spec
  * turns that from a per-site audit into a suite-enforced invariant
  * over the WHOLE entry surface.
  *
  * Scope: the invariant covers DataFrame persists
  * (`CacheLifecycle.persist` / `trackedFrames`) — the layer where
  * CacheManager's sameResult matching makes cross-build serving
  * possible at all. RDD-layer persists (`persistRdd`, today only the
  * grid kNN join's eagerly-computed result union) are matched by
  * OBJECT IDENTITY, so a rebuilt entry can never serve a prior
  * build's RDD cache by construction — that is not an instability
  * bug but the operator's eager contract: each invocation recomputes
  * (g12's bench cost, ~0.4 s/rep, is that recompute, bounded and
  * declared), and the persist exists so the RETURNED frame's own
  * downstream actions reuse the union. A future operator wanting
  * cross-build serving must persist at the DataFrame layer, where
  * this spec enforces stability.
  *
  * There is NO streaming carve-out: the walk covers every entry, and
  * any entry that persists nothing (most of the streaming family —
  * their state lives in state stores, not CacheLifecycle) simply has
  * nothing to check; one that does persist (x99's batch bootstrap
  * frame) is held to the same invariant as the batch entries.
  *
  * Scale note (r14): the invariant is plan-structural, but constant
  * folding can differ with data-dependent literals, so the walk was
  * run once at sf0.1 (`PERSIST_SPEC_SF=/root/testdata/sf0.1`, r14:
  * green, 0 offenders) to close the "stable at toy scale only"
  * loophole; CI runs it at sf0.001 where the spec costs ~1 min.
  */
class PersistStabilitySpec extends SparkTestBase {

  private val dir =
    sys.env.getOrElse("PERSIST_SPEC_SF", "/root/testdata/sf0.001")

  test("every CacheLifecycle-persisted subtree is sameResult across rebuilds") {
    // Model the bench exactly: reps rebuild the entry WITHOUT a
    // release in between (release runs at group boundaries only). So
    // build twice back-to-back; a memo-stabilized entry hands build 2
    // the IDENTICAL frames (zero new tracked objects — fine), and a
    // plain per-invocation persist must produce a subtree that
    // sameResult-matches a build-1 frame, or rep 2 can never serve
    // from rep 1's cache. (Releasing between the builds would be the
    // WRONG model: it evicts the pipeline memos, whose rebuilt branch
    // caches sit on fresh LogicalRDDs that are never sameResult — a
    // situation the bench's reps never see.)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
    for ((name, fn) <- entries) {
      CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      fn(spark, dir)
      val t1 = CacheLifecycle.trackedFrames(spark)
      // the second (rep-2-shaped) build runs only for entries that
      // persist at all, so the streaming family — whose wall is a
      // StreamingQuery lifecycle constant — pays it only where it
      // matters (x99's persisted batch bootstrap frame)
      if (t1.nonEmpty) {
        val p1 = t1.map(_.queryExecution.analyzed)
        fn(spark, dir)
        val fresh = CacheLifecycle.trackedFrames(spark)
          .filterNot(f2 => t1.exists(_ eq f2))
        fresh.foreach { f2 =>
          val a2 = f2.queryExecution.analyzed
          if (!p1.exists(_.sameResult(a2)))
            offenders += s"$name: a subtree persisted by build 2 matches " +
              s"nothing build 1 persisted — rep 2+ recomputes it and " +
              s"registers an unmatchable twin (capturing UDF / unstable " +
              s"canonicalization?):\n${a2.treeString.linesIterator.take(8).mkString("\n")}"
        }
      }
    }
    CacheLifecycle.release(spark)
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"${offenders.size} unstable persisted subtree(s):\n\n" +
        offenders.mkString("\n\n"))
  }

}
