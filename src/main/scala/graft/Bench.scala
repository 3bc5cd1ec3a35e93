package graft

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver runs per-round → BENCH_r{N}.json).
  *
  * The headline `value` is the BASELINE.md-defined workload — the full
  * Q01–Q34 declared-corpus sweep (budget < 60 s at sf0.1 post-warmup).
  *
  * The bench is contention-evident: every measurement carries
  * process-CPU seconds and GC milliseconds next to wall seconds, so a
  * noisy host can't masquerade as a code regression (round 7's driver
  * sweep recorded 6–30× wall inflation that no re-run reproduced —
  * with cpu_s in the JSON, wall≫cpu divergence proves contention
  * instantly). And it is state-bounded: `CacheLifecycle.release` +
  * `clearCache` run between query groups, so operator-internal
  * persists from one group can't accumulate into the next across the
  * ~400 executions of a full sweep.
  *
  * Output protocol: the driver captures only the last ~2000 chars of
  * stdout, and the full 98-entry per-query map no longer fits (round
  * 7's line was truncated mid-JSON). So the ONE printed JSON line
  * carries the headline, per-group `[wall_s, cpu_s, gc_ms]` triples,
  * and the slowest entries; the complete per-entry detail (all groups,
  * every rep) is written to `bench_detail.json` in the working
  * directory.
  */
object Bench {

  private val osBean = ManagementFactory.getOperatingSystemMXBean

  /** Cumulative process CPU ns (-1 when the JVM doesn't expose it). */
  private def processCpuNs: Long = osBean match {
    case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
    case _ => -1L
  }

  /** Cumulative stop-the-world GC ms across all collectors. */
  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum

  /** JIT code-cache occupancy, `pool → [used_mb, max_mb]`. Recorded in
    * the detail JSON (and summed into the summary line) because a
    * saturated code cache is this bench's one known silent killer: the
    * sweeper evicts HOT compiled methods and random stages run
    * interpreted at 15–30× CPU (r8 commit ec34938; r10's x68 at 7× CPU
    * on byte-identical code). With occupancy in the artifact, that
    * class of regression self-diagnoses instead of costing a round.
    */
  private[graft] def codeCacheMb: Seq[(String, Long, Long)] =
    ManagementFactory.getMemoryPoolMXBeans.asScala.toSeq
      .filter(_.getName.startsWith("CodeHeap"))
      .map { p =>
        val u = p.getUsage
        val name = p.getName.stripPrefix("CodeHeap").trim
          .stripPrefix("'").stripSuffix("'").replace(' ', '_')
        (name, u.getUsed >> 20, u.getMax >> 20)
      }

  private def codeCacheJson: String =
    codeCacheMb.map { case (n, u, m) => s""""$n":[$u,$m]""" }
      .mkString("{", ",", "}")

  /** The 3× regression gate: entries whose cost exceeds `factor` ×
    * their previous-round value (from the prior `bench_detail.json`).
    * Compute rows gate on CPU (the contention-free signal; the
    * `floorCpu` guard keeps sub-second scheduling noise out — a
    * 0.1→0.4 s flutter is not a regression; a 19→134 s blowup — r10's
    * x68 — is exactly what this catches in-round, pre-commit).
    * STREAMING lifecycle rows gate on WALL instead: their CPU swings
    * 3–5× on identical code when the fixture splits into one extra
    * micro-batch of state commits (r11 adjudications: x71 at 15.7
    * CPU-s vs 3.1–4.7 in four adjacent sweeps), while their wall is
    * the lifecycle constant the bench already reports min-of-2 for.
    * Compute rows additionally require wall > `floorWallCompute`: a
    * sub-quarter-second entry's CPU flutters across the 2 CPU-s floor
    * on pure 32-thread scheduling noise (r12: q30 flagged at 2.15
    * CPU-s / 0.21 s wall vs 0.49 / 0.19 baseline — flat wall, tiny
    * absolute cost), while every real compute regression this gate
    * exists for carried seconds of wall (r10 x68: 6.5 s / 133.7).
    *
    * Compute rows gate on TASK CPU when the sample carries it AND the
    * reference was recorded in task CPU (`refIsTask`): process CPU
    * charges JVM background work — concurrent-GC threads, heap page
    * zeroing — to whichever entry is running, and on a driver-sized
    * (~90 GiB) heap that measured as DIFFERENT entries at 10× process
    * CPU per run with flat task CPU (the r10 x68 / r11 x77 "regressed
    * on identical code" shape). Task CPU is the query's own work; the
    * gate flags the engine, not the JVM's housekeeping. When the
    * reference file is a legacy process-CPU baseline, the CURRENT
    * samples gate on process CPU too — comparing task CPU (structurally
    * smaller) against a process-CPU reference would systematically
    * under-detect during exactly the fresh-checkout fallback the
    * legacy path exists for.
    *
    * RATIO leg (r19, wall-independent): the compute wall floor exists
    * to keep 32-thread scheduling flutter out, but it also let a
    * bursty parallel blowup hide — the r18 driver sweep read x68 at
    * ×11 its canonical task-CPU inside 0.40 s of wall, under
    * `floorWallCompute`, and the gate stayed silent (r18 verdict
    * finding). A ×`ratioFactor` blowup carrying more than
    * `ratioFloorCpu` CPU-seconds is not flutter no matter how little
    * wall it fits in, so compute rows are ALSO flagged on that
    * predicate regardless of wall. The ratio needs a nonzero
    * reference (the absolute-floors leg owns zero-reference blowups).
    * Streaming rows keep the wall-only rule — their CPU swings 3–5×
    * on identical code when the fixture splits into one extra
    * micro-batch (r11 x71), exactly the false flag the ratio leg must
    * not reintroduce.
    */
  private[graft] def regressions(
      prev: Map[String, (Double, Double)],
      cur: Seq[(String, Option[Sample])],
      streaming: String => Boolean = _ => false,
      factor: Double = 3.0, floorCpu: Double = 2.0,
      floorWall: Double = 1.0, floorWallCompute: Double = 0.5,
      refIsTask: Boolean = true,
      ratioFactor: Double = 8.0, ratioFloorCpu: Double = 1.0): Seq[String] = {
    // one predicate decides BOTH which metric effCpu reads and whether
    // the ratio leg is armed — a drifted second copy would silently
    // re-arm the ratio leg on process-CPU comparisons (r19 review)
    def isTaskSample(s: Sample): Boolean = refIsTask && s.taskCpu >= 0
    def effCpu(s: Sample): Double = if (isTaskSample(s)) s.taskCpu else s.cpu
    // reference == 0 (an entry whose baseline rounds to 0.00 at the
    // serialization precision) still gates: the ABSOLUTE floors alone
    // decide then — a near-zero-baseline entry that suddenly costs
    // > floorCpu task-seconds is precisely the blowup shape the gate
    // exists for, and `c > 0 && ...` used to exempt it entirely
    def computeFlagged(k: String, s: Sample): Boolean = {
      val c = effCpu(s)
      val floors = c > floorCpu && s.wall > floorWallCompute &&
        prev.get(k).exists { case (_, p) => p <= 0 || c > factor * p }
      // the ratio leg fires only on TASK-cpu comparisons: under the
      // legacy process-CPU fallback (refIsTask=false) process CPU is
      // documented to swing up to 10x on identical code (heap paging /
      // concurrent-GC attribution), and without a wall guard those
      // phantom bursts would false-flag and block the clean-sweep
      // baseline refresh during exactly the fallback path (r19 review)
      val ratio = isTaskSample(s) && c > ratioFloorCpu &&
        prev.get(k).exists { case (_, p) => p > 0 && c > ratioFactor * p }
      floors || ratio
    }
    cur.collect {
      case (k, Some(s))
          if (if (streaming(k))
            s.wall > floorWall &&
              prev.get(k).exists { case (w, _) => w <= 0 || s.wall > factor * w }
          else computeFlagged(k, s)) => k
    }
  }

  /** Streaming retry leg (r20). The streaming gate compares WALL
    * (the lifecycle constant), and wall is exposed to one-shot JVM
    * housekeeping in a way task-CPU is not: the r20 90 GiB preflight
    * sweep read x52 at 6.90 s wall / 19.9 process-CPU-s (canonical
    * 0.73 / 1.83) with a 4,997 ms JIT delta in the same row — a C2
    * compile burst landing on both timed reps — and a filtered
    * re-run three minutes later read 1.14 s on identical code. The
    * r11 x69 adjudication documented the same class on process CPU;
    * the wall gate had no defense. So: each flagged STREAMING entry
    * is re-measured once, and the min of old/new readings (the
    * estimator streaming rows already use — their wall is a constant
    * plus one-sided noise) replaces the entry before the gate
    * recomputes. A real regression reproduces on the retry and keeps
    * its flag; a burst costs ~3 extra lifecycles and clears. The
    * discarded first reading is recorded in the detail artifact's
    * `retried` field so the burst stays auditable. Compute rows are
    * NOT retried: they gate on task-CPU, which background compile
    * threads never touch.
    *
    * Returns (updated results, recomputed flags, discarded originals).
    */
  private[graft] def retryStreamingFlags(
      gateRef: Map[String, (Double, Double)],
      results: Seq[(String, Option[Sample])],
      flagged: Seq[String],
      streaming: String => Boolean,
      refIsTask: Boolean,
      remeasure: String => Option[Sample])
      : (Seq[(String, Option[Sample])], Seq[String], Seq[(String, Sample)]) = {
    val candidates = flagged.filter(streaming)
    if (candidates.isEmpty) (results, flagged, Nil)
    else {
      val re = candidates.flatMap(n => remeasure(n).map(n -> _)).toMap
      val retried = Seq.newBuilder[(String, Sample)]
      val updated = results.map {
        case (n, Some(orig)) if re.get(n).exists(_.wall < orig.wall) =>
          retried += n -> orig
          (n, Some(re(n)))
        case r => r
      }
      (updated,
        regressions(gateRef, updated, streaming, refIsTask = refIsTask),
        retried.result())
    }
  }

  /** Previous round's per-entry (wall, cpu) from an existing detail
    * file — empty on first run, unreadable/failed entries, or when the
    * prior sweep ran a DIFFERENT scale factor (`sfDir` mismatch):
    * comparing an sf0.1 sweep against an sf0.001 smoke run's detail
    * would flag every data-proportional entry as a 100× "regression".
    */
  private[graft] def previousCpu(
      path: java.nio.file.Path, sfDir: String): Map[String, (Double, Double)] =
    previousMetricsImpl(path, sfDir)._1

  /** Gate baseline with fallback: prefer the immediately-previous
    * sweep's `bench_detail.json`, but when that is missing (the detail
    * file is gitignored, so a workspace restore drops it), was last
    * written by a different-sf smoke run, or was itself FLAGGED
    * REGRESSED, fall back to the TRACKED per-sf baseline
    * (`bench_baseline_<sf>.json`, refreshed only on clean sweeps).
    * Without the fallback, the exact scenario the gate exists for — a
    * cross-round regression first seen on a fresh checkout, like r10's
    * x68 — silently stands the gate down; without the regressed-taint
    * rule, one flagged sweep becomes the next sweep's reference and
    * the regression passes silently ever after (exactly what happened
    * to the r11 baseline: the driver's flagged x77 sweep overwrote it).
    */
  /** Returns (per-entry (wall, cpu) reference, whether that cpu is
    * TASK cpu) — the flag keeps regressions() comparing like with
    * like when the reference is a legacy process-CPU file.
    */
  private[graft] def gateBaseline(
      detail: java.nio.file.Path, baseline: java.nio.file.Path,
      sfDir: String): (Map[String, (Double, Double)], Boolean) = {
    val cur = previousMetricsImpl(detail, sfDir, rejectTainted = true)
    if (cur._1.nonEmpty) cur
    else previousMetricsImpl(baseline, sfDir, rejectTainted = true)
  }

  /** Where a CLEAN sweep's baseline refresh lands. The tracked
    * canonical (`bench_baseline_<sf>.json`) accepts refreshes only
    * from a <= 16 GiB heap: big-heap driver sweeps measure
    * systematically different CPU (page-zeroing, concurrent-GC share)
    * and twice (r15, r16) a driver round-close `git add -A` committed
    * such a refresh over the canonical. Big-heap clean sweeps route to
    * an untracked `.bigheap` side file (`.gitignore`'s
    * `bench_baseline_*.json` pattern excludes it), so the tracked file
    * never changes in the working tree unless a small-heap sweep
    * earned it.
    */
  private[graft] def refreshTarget(
      baselinePath: java.nio.file.Path, sfDir: String,
      heapGb: Long): java.nio.file.Path =
    if (heapGb <= 16) baselinePath
    // resolveSibling, not CWD: the side file must land NEXT TO the
    // canonical it shields, even if bench ever runs from another
    // working directory (r17 advisor finding)
    else baselinePath.toAbsolutePath
      .resolveSibling(s"bench_baseline_${sfSlug(sfDir)}.bigheap.json")

  /** Where a sweep's detail artifact lands, keyed by core count: the
    * driver runs the bench TWICE per round (32-core main + a lower-core
    * scaling leg), and with one shared path the second run overwrote
    * the first's evidence — the r21 driver's 8-core sweep clobbered the
    * 32-core `bench_detail.json` (and through refreshTarget, the
    * bigheap side baseline) before anyone could read the per-rep
    * vectors recorded there (r21 verdict "what's wrong" #1). The
    * default core count keeps the canonical name so every existing
    * reader (gate fallback, baseline_check.py, the driver's detail
    * pointer) is untouched; any other count gets its own
    * `bench_detail.<cpus>c.json`, so consecutive different-cpus runs
    * leave BOTH files readable.
    */
  private[graft] def detailFileName(cpus: String): String =
    if (cpus == defaultCpus) "bench_detail.json"
    else s"bench_detail.${cpus.replaceAll("[^A-Za-z0-9]", "_")}c.json"

  /** The env default for SPARK_GRAFT_CPUS — the core count the
    * canonical artifacts (detail file, baseline refresh) belong to.
    */
  private[graft] val defaultCpus = "32"

  /** Baseline refreshes happen only at the default core count: a
    * lower-core scaling sweep measures systematically different walls
    * (the same r15/r16 cross-condition-contamination class the heap
    * guard exists for — the r21 8-core driver leg overwrote the
    * bigheap baseline with its 48.88 s total).
    */
  private[graft] def refreshAllowed(cpus: String): Boolean = cpus == defaultCpus

  /** `/root/testdata/sf0.1` → `sf0.1` (baseline-file suffix). Trailing
    * slashes are stripped first — `"/t/sf0.1/"` must not degenerate to
    * the empty slug, whose baseline file would collide across scale
    * factors and defeat the per-sf separation.
    */
  private[graft] def sfSlug(sfDir: String): String = {
    val s = sfDir.replaceAll("/+$", "").replaceAll(".*/", "")
      .replaceAll("[^A-Za-z0-9.]", "_")
    if (s.isEmpty) "default" else s
  }

  private def previousMetricsImpl(
      path: java.nio.file.Path, sfDir: String,
      rejectTainted: Boolean = false): (Map[String, (Double, Double)], Boolean) =
    if (!java.nio.file.Files.exists(path)) (Map.empty, true)
    else try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(java.nio.file.Files.readAllBytes(path))
      val entries = root.get("entries")
      // trailing-slash-normalized: a driver config drift from
      // ".../sf0.1" to ".../sf0.1/" names the SAME data — a raw string
      // compare would silently stand the gate down (no reference) and
      // then rewrite the baseline under the new spelling
      def normSf(s: String): String = s.replaceAll("/+$", "")
      val sameSf = root.get("sf") != null &&
        normSf(root.get("sf").asText) == normSf(sfDir)
      val tainted = rejectTainted &&
        root.get("regressed") != null && root.get("regressed").size > 0
      // the task-cpu column landed with the r12 format; its presence
      // decides which metric regressions() reads off CURRENT samples
      val isTask = root.get("fmt") != null &&
        root.get("fmt").asText.contains("task_cpu_s")
      if (entries == null || !sameSf || tainted) (Map.empty, true)
      else (entries.properties().asScala.collect {
        case e if e.getValue.isArray && e.getValue.size >= 2 =>
          val a = e.getValue
          val cpu =
            if (isTask && a.size >= 7 && a.get(6).asDouble >= 0) a.get(6).asDouble
            else a.get(1).asDouble
          e.getKey -> (a.get(0).asDouble, cpu)
      }.toMap, isTask)
    } catch { case _: Throwable => (Map.empty, true) }

  /** `jitMs` is the delta of `CompilationMXBean.getTotalCompilationTime`
    * across the rep: bench `cpu` is PROCESS CPU and therefore charges
    * background C2 compile bursts to whichever rep triggered them
    * (x69 measured 21-44 CPU-s at flat wall across r11 sweeps, no code
    * change). With jitMs in the artifact, a cpu spike with flat wall
    * and a matching jit delta is attributable at a glance instead of
    * costing a round of re-measurement. -1 when the JVM doesn't report.
    *
    * `evict` is the count of cached-RDD blocks REMOVED from storage
    * during the rep (BlockUpdated events whose new level is invalid),
    * and `storMb` the block-manager storage memory in use at rep end —
    * the storage-side analogue of the r11 code-cache telemetry. The
    * r11 driver sweep's open question (x77 at ×29 CPU on identical
    * code, code cache exonerated at 163/2048 MB) has storage eviction
    * of the shared minhash/CC persists as its prime suspect; these two
    * fields make that class of regression attributable from the
    * artifact. -1 when not instrumented (unit-test rendering).
    *
    * `taskCpu` is the sum of TASK executor CPU seconds
    * (`TaskMetrics.executorCpuTime`) for tasks finishing during the
    * rep — the CPU the QUERY actually used. `cpu` is PROCESS CPU:
    * when `cpu >> taskCpu` the excess is JVM background work
    * (concurrent-GC threads, heap page zeroing, C2 — none visible in
    * the STW-only `gcMs`), not the engine. Measured r12 on a 64 GiB
    * heap (the driver runs ~90 GiB): the same code flags DIFFERENT
    * entries at 10× process-CPU per run while their task CPU stays
    * flat — the r10/r11 "regression on identical code" driver
    * anomalies carry exactly this signature, and this column turns a
    * round of re-measurement into one artifact read.
    */
  final case class Sample(wall: Double, cpu: Double, gcMs: Long,
      jitMs: Long = -1L, evict: Long = -1L, storMb: Long = -1L,
      taskCpu: Double = -1.0, primes: Int = 1,
      // per-rep task-CPU in EXECUTION order, recorded only for
      // double-primed (persist-bearing) entries — see renderDetail
      repTaskCpus: Seq[Double] = Nil)

  /** Streaming entries get fewer reps, min-reporting, and the
    * lifecycle-floor adjudication (BASELINE.md; StreamFloorProbe
    * measures the floor table) — shared so Bench and the probes can
    * never disagree about membership.
    */
  private[graft] def isStreaming(name: String): Boolean =
    name.contains("streaming") ||
      Set("x93_session_window", "x95_tws_sessionize", "x99_tws_bootstrap")(name)

  private val compBean = ManagementFactory.getCompilationMXBean
  private def jitMillis: Long =
    if (compBean != null && compBean.isCompilationTimeMonitoringSupported)
      compBean.getTotalCompilationTime
    else -1L

  private def f(v: Double, dec: Int): String =
    s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)

  /** JSON string escape (the Verify.q pattern): sfDir/detailPath come
    * from env/filesystem and entry names from authors — an unescaped
    * quote or backslash in any of them would corrupt BOTH artifacts
    * and cost the round its perf signal.
    */
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def sampleRow(x: Sample): String =
    s"[${f(x.wall, 4)},${f(x.cpu, 4)},${x.gcMs},${x.jitMs},${x.evict},${x.storMb},${f(x.taskCpu, 2)},${x.primes}]"

  /** The full per-entry detail JSON written to `bench_detail.json`.
    *
    * `retried` carries the DISCARDED first reading of any streaming
    * entry whose flag was cleared by the retry leg (see
    * [[retryStreamingFlags]]), same 8-column row shape as `entries` — the
    * burst stays auditable even though the steady-state reading is
    * what `entries` (and any future gate reference) records.
    */
  private[graft] def renderDetail(
      results: Seq[(String, Option[Sample])], sfDir: String, reps: Int,
      regressed: Seq[String] = Nil,
      retried: Seq[(String, Sample)] = Nil,
      cpus: Int = -1): String = {
    val detail = results.map { case (k, s) =>
      s"${jstr(k)}:${s.map(sampleRow).getOrElse("null")}"
    }.mkString("{", ",", "}")
    // Per-rep task-CPU, EXECUTION order, for double-primed entries only
    // (r20 verdict task 1): the r20 driver sweep read x68 at 2.95
    // task-CPU-s where the same-heap preflight read 0.45, and the
    // median-only row could not say whether the three timed reps still
    // rode a cached-read transient the double-prime failed to absorb
    // THERE, or all three reps genuinely ran hot. With the per-rep
    // vector in the artifact, a decaying [2.9, 0.6, 0.5] (transient —
    // the estimator should not have seen it) is distinguishable from a
    // flat [2.9, 3.0, 2.9] (environment multiplier on steady state)
    // without a driver-side re-run. Bounded: only persist-bearing
    // entries (~25 of 151) carry the field.
    val repJson = results.collect {
      case (k, Some(s)) if s.repTaskCpus.nonEmpty =>
        s"${jstr(k)}:${s.repTaskCpus.map(f(_, 2)).mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val retryJson = retried
      .map { case (k, s) => s"${jstr(k)}:${sampleRow(s)}" }
      .mkString("{", ",", "}")
    val reg = regressed.map(jstr).mkString("[", ",", "]")
    // heap_gb: JVM max-heap provenance. The r14 reconciliation found the
    // tracked baseline silently swapped between an 8g local sweep and the
    // driver's ~90g sweep with nothing in the file saying which; recording
    // the heap makes every future baseline/detail self-describing (the
    // r10-r12 ghost hunts all began by NOT knowing a reference's heap).
    val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
    // `primes` (r20): how many untimed priming executions the entry
    // got — 2 when the persist-detection fired, 1 otherwise. Makes the
    // double-prime decision readable from the driver artifact itself
    // (the r19 x68 adjudication had to assume it).
    // `cpus` makes the artifact self-describing the way heap_gb does
    // (r21 verdict: the 32c and 8c driver sweeps were only
    // distinguishable by guesswork); -1 = not recorded (unit tests)
    s"""{"fmt":"[wall_s,cpu_s,gc_ms,jit_ms,evict_blocks,stor_mb,task_cpu_s,primes]","sf":${jstr(sfDir)},"reps":$reps,"heap_gb":$heapGb,"cpus":$cpus,""" +
      s""""code_cache_mb":$codeCacheJson,"regressed":$reg,"retried":$retryJson,""" +
      s""""rep_task_cpu":$repJson,""" +
      s""""total":${totalTriple(results)},"entries":$detail}"""
  }

  private def totalTriple(results: Seq[(String, Option[Sample])]): String = {
    val ok = results.flatMap(_._2)
    s"[${f(ok.map(_.wall).sum, 4)},${f(ok.map(_.cpu).sum, 2)},${ok.map(_.gcMs).sum}]"
  }

  /** The ONE stdout line the driver captures. SIZE CONTRACT: the driver
    * keeps only the last ~2000 chars of stdout, so this line must stay
    * comfortably inside that window even with WARN-noise overhead —
    * BenchFormatSpec pins < 1900 chars for a worst-case entry set
    * (round 7's plain 98-entry map overflowed and truncated mid-JSON,
    * destroying the round's perf signal). Headline + per-group
    * [wall_s,cpu_s,gc_ms] triples + the 18 slowest entries; everything
    * else lives in the detail file.
    */
  private[graft] def renderSummaryLine(
      results: Seq[(String, Option[Sample])], sfDir: String, detailPath: String,
      regressed: Seq[String] = Nil): String = {
    // capped like `regressed`: a systemic breakage fails ~100 entries,
    // and an uncapped array alone overflows the driver's ~2000-char
    // stdout tail — the round-7 truncation this line exists to avoid.
    // n_failed carries the true count; the detail file names the rest.
    val failedAll = results.collect { case (k, None) => k }
    val failed = failedAll.take(8).map(jstr).mkString("[", ",", "]")
    val nFailed = failedAll.size
    def groupTriple(prefix: String): String = {
      val ss = results.collect { case (k, Some(s)) if k.startsWith(prefix) => s }
      s"[${f(ss.map(_.wall).sum, 4)},${f(ss.map(_.cpu).sum, 2)},${ss.map(_.gcMs).sum}]"
    }
    val corpus = results.collect { case (k, Some(s)) if k.startsWith("q") => s.wall }.sum
    // slowest entries only (wall + cpu, 10 ms resolution) — they are
    // the ones a perf judgment needs; the rest is bounded by the group
    // triples and spelled out in the detail file
    val slow = results.collect { case (k, Some(s)) => (k, s) }
      .sortBy(-_._2.wall).take(18).sortBy(_._1)
    val qs = slow.map { case (k, s) => s"${jstr(k)}:[${f(s.wall, 2)},${f(s.cpu, 2)}]" }
      .mkString("{", ",", "}")
    val groups =
      s"""{"corpus_q01_q34":${groupTriple("q")},"geometry":${groupTriple("g")},"extension":${groupTriple("x")},"pipeline":${groupTriple("p")}}"""
    // regression gate + code-cache occupancy, compact: the regressed
    // list is capped (the gate's job is to flag, the detail file has
    // the rest) and cc_mb is one number — total used MB across pools
    val reg = regressed.take(8).map(jstr).mkString("[", ",", "]")
    val ccUsed = codeCacheMb.map(_._2).sum
    // evict: cached-block evictions summed over TIMED reps only (the
    // deliberate between-group releases don't count) — nonzero here
    // says storage pressure touched a measured entry; the per-entry
    // culprit is in the detail file
    val evictTotal = results.flatMap(_._2).map(_.evict.max(0L)).sum
    s"""{"metric":"corpus_sweep","value":${f(corpus, 4)},"unit":"sec",""" +
      s""""fmt":"[wall_s,cpu_s,gc_ms]","total":${totalTriple(results)},""" +
      s""""groups":$groups,"failed":$failed,"n_failed":$nFailed,"regressed":$reg,"cc_mb":$ccUsed,""" +
      s""""evict":$evictTotal,"queries":$qs,"detail":${jstr(detailPath)},"sf":${jstr(sfDir)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    // GraftSession.builder wires the extensions (native ST functions +
    // spatial join strategy) so benchmarks measure the planned engine,
    // not a fallback path
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    // ERROR, not WARN: stray WARN lines (e.g. CacheManager re-cache
    // notices) land in the same 2000-char stdout tail the JSON line
    // must fit in — round 5 lost ~130 chars of budget to exactly that
    spark.sparkContext.setLogLevel("ERROR")

    // Storage-eviction telemetry (see Sample scaladoc): count cached
    // blocks dropped from storage, session-wide; measure() reads the
    // counter around each timed rep so the artifact attributes
    // eviction-driven recompute to the entry that paid it.
    val evictedBlocks = new java.util.concurrent.atomic.AtomicLong(0L)
    // cumulative task executor-CPU ns (see Sample.taskCpu)
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onBlockUpdated(
          e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
        val info = e.blockUpdatedInfo
        // an invalid level means the block left storage entirely
        // (evicted or unpersisted); a memory→disk demotion keeps a
        // valid level and is not counted — MEMORY_AND_DISK persists
        // survive that without recompute
        if (info.blockId.isRDD && !info.storageLevel.isValid)
          evictedBlocks.incrementAndGet()
      }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          taskCpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    // listener events arrive on an async bus; poll the counters until
    // they hold still (two consecutive 20 ms reads) before sampling a
    // rep boundary, bounded at ~400 ms — the public-API stand-in for
    // the private listenerBus.waitUntilEmpty()
    def settleListenerCounters(): Unit = {
      var last = (taskCpuNs.get(), evictedBlocks.get())
      var i = 0
      while (i < 20) {
        Thread.sleep(20)
        val cur = (taskCpuNs.get(), evictedBlocks.get())
        if (cur == last) i = 20 else { last = cur; i += 1 }
      }
    }
    def storageMb: Long =
      spark.sparkContext.statusTracker.getExecutorInfos
        .map(e => e.usedOnHeapStorageMemory + e.usedOffHeapStorageMemory)
        .sum >> 20

    // dev-only subset filter (comma-separated name prefixes, applied
    // to warmup AND measurement): lets a perf iteration re-measure one
    // family in ~30 s instead of a 5 min full sweep. The driver never
    // sets it, so official sweeps always measure everything.
    val warmOnly = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) // empty/comma-only value == no filter, not "measure nothing"
    def warmSelected(name: String): Boolean =
      warmOnly.forall(_.exists(name.startsWith))

    // JVM/codegen warmup at the smallest scale factor so measured
    // numbers reflect steady-state execution (BASELINE.md's
    // "post-warmup" budgets): run every query once — same plans, so
    // codegen caches and JIT warm, while the sf0.1 measurement still
    // does all the data-proportional work. g*/p* ignore the scale dir
    // (fixture-fixed), but are warmed too since r12: their operator
    // caches are dropped again right below, and the warm run buys the
    // plan compile + JIT that otherwise lands INSIDE the timed region
    // (r11 driver sweep: geometry +2.3 s with g12 jit at 1.1 s).
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => warmSelected(n) }
      .foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      }
    CacheLifecycle.release(spark)
    spark.catalog.clearCache()

    // Each query runs `reps` times; the rep with MEDIAN wall is
    // reported (its cpu/gc ride along so the triple is one coherent
    // execution) — a single run can't distinguish a real regression
    // from GC/section-ordering noise. A failed query reports -1 and
    // lands in `failed` so breakage is visible in the JSON itself.
    //
    // EXCEPTION: the streaming entries run TWO timed reps and report
    // the MIN-wall one. Their wall is a StreamingQuery lifecycle
    // CONSTANT (start/stop, micro-batch planning, state-store
    // commits), not data-proportional work — the right estimator for a
    // constant plus one-sided scheduling/commit-tail noise is the min,
    // where a median-of-3 spends 3 lifecycles to still carry the noise
    // (r11 single-rep trial: x61 reported 2.1–3.8 s across sweeps on
    // identical code). The priming run still happens, so both timed
    // reps are warm like every other entry's.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def measure(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        reps: Int, reportMin: Boolean = false): Option[Sample] = {
      // one untimed priming execution first: BASELINE.md budgets are
      // POST-WARMUP steady state, and entries whose contract includes
      // materialization (the pipeline flow's OP-07 branch caches, the
      // memoized minhash candidates) pay that one-time build here
      // rather than inside a timed rep — without priming, the median
      // sits one cache flake away from reporting the cold build (r8
      // dev benches recorded p01 at 6.3 s for a 0.5 s steady-state
      // query exactly that way)
      val persistedBefore = CacheLifecycle.trackedFrames(spark).size
      try fn(spark, sfDir).count() catch { case _: Throwable => }
      // entries that PERSIST during priming get ONE extra untimed
      // execution: the priming action runs the cache-BUILD physical
      // plan, so the cached-READ plan (InMemoryTableScan + the
      // per-execution broadcast of the small persisted side) executes
      // for the first time inside timed rep 1 — measured r19 on x68
      // at 2.4–2.9 task-CPU-s for a 0.5 s steady-state query, the
      // transient behind the r18 driver sweep's ×11 flag-shaped
      // reading (PersistServeProbe: persist serves, RDDs 32/32 cached
      // from the build action, reps converge to ~0.5 s by the third
      // post-build execution). The second priming run eats that
      // transient so every timed rep measures steady state.
      // the decision is RECORDED in the artifact (Sample.primes, the
      // detail row's 8th column): the r19 driver sweep flagged x68
      // while the local adjudication could only ASSUME the
      // double-prime had engaged there — one artifact column replaces
      // a round of that guesswork
      val primedTwice =
        CacheLifecycle.trackedFrames(spark).size > persistedBefore
      if (primedTwice)
        try fn(spark, sfDir).count() catch { case _: Throwable => }
      val samples = (1 to reps).flatMap { _ =>
        settleListenerCounters()
        val w0 = System.nanoTime(); val c0 = processCpuNs
        val g0 = gcMillis; val j0 = jitMillis; val e0 = evictedBlocks.get()
        val t0 = taskCpuNs.get()
        try {
          fn(spark, sfDir).count()
          // wall/cpu/gc/jit close here; the listener-fed counters
          // (taskCpu, evict) are read AFTER the async bus settles, so a
          // heavy rep's tail events don't land in the next rep's delta
          // (they feed the regression gate — misattribution there is a
          // false flag). The settle wait is outside the wall window.
          val wall = (System.nanoTime() - w0) / 1e9
          val cpu = if (c0 < 0) -1.0 else (processCpuNs - c0) / 1e9
          val gc = gcMillis - g0
          val jit = if (j0 < 0) -1L else jitMillis - j0
          settleListenerCounters()
          Some(Sample(wall, cpu, gc, jit,
            evictedBlocks.get() - e0, storageMb,
            (taskCpuNs.get() - t0) / 1e9,
            primes = if (primedTwice) 2 else 1))
        } catch { case _: Throwable => None }
      }
      if (samples.size != reps) None
      else {
        val chosen = samples.sortBy(_.wall).apply(if (reportMin) 0 else reps / 2)
        // double-primed entries carry their per-rep task-CPU vector in
        // execution order (renderDetail's rep_task_cpu field) so a
        // persist-serving transient vs a steady-state multiplier is
        // adjudicable from the artifact
        Some(if (primedTwice) chosen.copy(repTaskCpus = samples.map(_.taskCpu))
        else chosen)
      }
    }

    // group boundaries (name prefix) are where accumulated operator
    // persists are reclaimed — the sweep measures each group from a
    // cold cache, and storage stays bounded across the whole run
    val byGroup = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => warmSelected(n) }
      .groupBy(_._1.head).toSeq.sortBy(_._1)
    val results = byGroup.flatMap { case (_, entries) =>
      val rs = entries.map { case (name, fn) =>
        val streaming = isStreaming(name)
        name -> measure(fn, if (streaming) 2 min reps else reps,
          reportMin = streaming)
      }
      CacheLifecycle.release(spark)
      spark.catalog.clearCache()
      rs
    }
    // delta gate: compare against the PREVIOUS sweep's detail file
    // (read before overwrite). r10's x68 7x-CPU eviction artifact
    // would have been flagged here in-round instead of costing the
    // round's perf verdict.
    val detailPath = java.nio.file.Paths.get(detailFileName(cpus)).toAbsolutePath
    val baselinePath =
      java.nio.file.Paths.get(s"bench_baseline_${sfSlug(sfDir)}.json").toAbsolutePath
    val (gateRef, gateRefIsTask) = gateBaseline(detailPath, baselinePath, sfDir)
    val firstPass = regressions(gateRef, results, isStreaming,
      refIsTask = gateRefIsTask)
    // flagged streaming entries get one re-measure before the flag
    // stands (see retryStreamingFlags: the wall gate vs one-shot C2
    // compile bursts). The remeasure runs post-release like any
    // fresh group start; a slower retry never replaces the original.
    val queriesByName = SparkEntry.queries
    val (resultsFinal, regressed, retried) = retryStreamingFlags(
      gateRef, results, firstPass, isStreaming, gateRefIsTask,
      n => queriesByName.get(n)
        .flatMap(fn => measure(fn, 2 min reps, reportMin = true)))
    val detailJson =
      renderDetail(resultsFinal, sfDir, reps, regressed, retried,
        cpus = scala.util.Try(cpus.toInt).getOrElse(-1)).getBytes("UTF-8")
    // a filtered dev run never overwrites the reference files: a
    // partial entry set would stand the gate down for everything it
    // skipped
    if (warmOnly.isEmpty) java.nio.file.Files.write(detailPath, detailJson)
    // refresh the tracked per-sf baseline (same content) ONLY when the
    // sweep is CLEAN, all three BASELINE.md legs: zero regressed (a
    // flagged sweep must not become the reference the next sweep gates
    // against, or the gate is one-shot — the r11 driver sweep overwrote
    // the baseline with its own flagged x77 numbers exactly that way),
    // zero FAILED entries (a broken run used to count as clean because
    // regressions() never flags a None — one bad sf dir would null the
    // committed reference for every entry and stand the gate down
    // permanently), and zero evictions (a storage-pressured sweep's
    // numbers carry recompute). gateBaseline also rejects
    // regressed-tainted files on read.
    val clean = regressed.isEmpty &&
      resultsFinal.forall(_._2.isDefined) &&
      resultsFinal.flatMap(_._2).map(_.evict.max(0L)).sum == 0
    // ... and ONLY from a small (<= 16 GiB) heap. The tracked canonical
    // must stay comparable sweep-to-sweep; big-heap driver runs measure
    // systematically different CPU (page-zeroing, concurrent-GC share —
    // see the heap_gb scaladoc above) and twice now a driver round-close
    // `git add -A` committed such a refresh over the canonical (r15 and
    // r16 incidents, each costing a restore-from-history). Routing
    // big-heap clean sweeps to an untracked `.bigheap` side file makes
    // that slip structurally impossible: the tracked file never changes
    // in the working tree unless a small-heap sweep earned it.
    // ... and ONLY at the default core count (refreshAllowed): the
    // driver's lower-core scaling leg must never become anyone's
    // reference — its walls are a different measurement condition.
    if (clean && warmOnly.isEmpty && refreshAllowed(cpus)) {
      val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
      val target = refreshTarget(baselinePath, sfDir, heapGb)
      java.nio.file.Files.write(target, detailJson)
      if (target != baselinePath)
        println(s"[bench] clean sweep on a ${heapGb}g heap: baseline refresh " +
          s"routed to $target (canonical untouched; see BASELINE.md)")
    }
    println(renderSummaryLine(resultsFinal, sfDir, detailPath.toString, regressed))
    spark.stop()
  }
}
