package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** The bench output contract: the driver keeps only the last ~2000
  * chars of stdout, so the summary line must parse as JSON and stay
  * under 1900 chars even for a worst-case entry set — round 7's plain
  * per-entry map overflowed the window and the round's perf signal was
  * lost to a truncated line. No SparkSession needed: rendering is pure.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper

  /** Worst case: more entries than the real sweep, maximal name
    * lengths, large values (wide formatting), plus failures.
    */
  private def worstCase: Seq[(String, Option[Bench.Sample])] = {
    val groups = Seq("q", "g", "x", "p")
    (1 to 130).map { i =>
      val name = f"${groups(i % 4)}${i}%02d_${"a" * 28}"
      val sample =
        if (i % 23 == 0) None
        else Some(Bench.Sample(wall = 1234.5678, cpu = 9876.5432, gcMs = 123456L))
      name -> sample
    }
  }

  test("summary line parses as JSON and fits the driver's capture window") {
    val line = Bench.renderSummaryLine(
      worstCase, "/root/testdata/sf0.1", "/root/repo/bench_detail.json")
    assert(!line.contains("\n"))
    assert(line.length < 1900, s"summary line is ${line.length} chars")
    val root = mapper.readTree(line)
    assert(root.get("metric").asText == "corpus_sweep")
    assert(root.get("value").isNumber)
    assert(root.get("total").isArray && root.get("total").size == 3)
    assert(root.get("groups").size == 4)
    assert(root.get("queries").size == 18)      // slowest-entry cap
    assert(root.get("failed").isArray && root.get("failed").size > 0)
  }

  test("detail JSON parses, carries every entry, nulls the failed ones") {
    val detail = Bench.renderDetail(worstCase, "/root/testdata/sf0.1", 3)
    val root = mapper.readTree(detail)
    assert(root.get("entries").size == 130)
    assert(root.get("reps").asInt == 3)
    val failedName = worstCase.collectFirst { case (n, None) => n }.get
    assert(root.get("entries").get(failedName).isNull)
    // jit_ms since r11 (compile-burst attribution); evict_blocks +
    // stor_mb + task_cpu_s since r12 (storage-eviction and
    // background-JVM-CPU attribution — the r10/r11 "regressed on
    // identical code" driver anomalies)
    // ... + primes since r20 (was the double-prime decision readable
    // from the driver artifact? — the r19 x68 adjudication had to
    // assume it fired)
    assert(root.get("fmt").asText ==
      "[wall_s,cpu_s,gc_ms,jit_ms,evict_blocks,stor_mb,task_cpu_s,primes]")
    // heap_gb since r15 (baseline provenance: an 8g local sweep and the
    // driver's ~90g sweep must be distinguishable from the file alone)
    assert(root.get("heap_gb").isNumber && root.get("heap_gb").asLong >= 1)
    val okName = worstCase.collectFirst { case (n, Some(_)) => n }.get
    assert(root.get("entries").get(okName).size == 8)
    // the primes column defaults to 1 and renders 2 when the
    // persist-detection fired — both spellings must round-trip
    val primed = Bench.renderDetail(Seq(
      "a" -> Some(Bench.Sample(1.0, 1.0, 0L)),
      "b" -> Some(Bench.Sample(1.0, 1.0, 0L, primes = 2))), "sf", 3)
    val pr = mapper.readTree(primed).get("entries")
    assert(pr.get("a").get(7).asInt == 1 && pr.get("b").get(7).asInt == 2)
  }

  test("summary and detail carry the regression gate + code-cache fields") {
    val line = Bench.renderSummaryLine(
      worstCase, "sf", "d", regressed = Seq("x68_dup_spans"))
    assert(line.length < 1900, s"summary line is ${line.length} chars")
    val root = mapper.readTree(line)
    assert(root.get("regressed").get(0).asText == "x68_dup_spans")
    assert(root.get("cc_mb").isNumber)       // code-cache used MB, total
    val detail = mapper.readTree(
      Bench.renderDetail(worstCase, "sf", 3, regressed = Seq("x68_dup_spans")))
    assert(detail.get("regressed").get(0).asText == "x68_dup_spans")
    // per-pool [used_mb, max_mb]; JDK 17 segments the cache into 3
    // CodeHeap pools (or 1 unsegmented) — either way, pools exist and
    // each carries a 2-element MB pair
    val cc = detail.get("code_cache_mb")
    assert(cc.size >= 1)
    cc.properties().forEach { e =>
      assert(e.getValue.isArray && e.getValue.size == 2, e.toString)
    }
  }

  test("delta gate flags an intentional 3x CPU regression and nothing else") {
    val prev = Map(
      "x68" -> (1.36, 19.1), "x01" -> (1.0, 5.0),
      "q01" -> (0.1, 0.2), "x55" -> (1.0, 4.0))
    val cur = Seq(
      "x68" -> Some(Bench.Sample(6.5, 133.7, 0L)),   // r10's real blowup: flagged
      "x01" -> Some(Bench.Sample(1.0, 6.0, 0L)),     // 1.2x: fine
      "q01" -> Some(Bench.Sample(0.3, 0.9, 0L)),     // 4.5x but sub-floor: noise
      // the r12 q30 flutter: 4.4x CPU over the floor but FLAT
      // sub-quarter-second wall — 32-thread scheduling noise on a tiny
      // entry, not a regression (the compute-row wall floor keeps it out)
      "q30" -> Some(Bench.Sample(0.21, 2.15, 0L)),
      "x55" -> Some(Bench.Sample(1.0, 4.1, 0L)),     // ~1x: fine
      "x99" -> Some(Bench.Sample(1.0, 9.9, 0L)),     // new entry, no baseline
      // the driver-heap anomaly shape: process cpu x10 over baseline
      // but TASK cpu flat — background JVM work (concurrent GC, page
      // zeroing) charged to the entry; gates on task cpu, NOT flagged
      "x36" -> Some(Bench.Sample(4.6, 76.8, 205L, 242L, 0L, 188L, taskCpu = 5.1)),
      // and the converse: the query's own task cpu blew up — flagged
      // even though background noise could mask it in process terms
      "x40" -> Some(Bench.Sample(3.0, 19.0, 0L, 0L, 0L, 0L, taskCpu = 18.2)),
      "x97" -> None)                                 // failed: not the gate's job
    val prevAll = prev ++ Map(
      "q30" -> (0.19, 0.49), "x36" -> (0.7, 5.0), "x40" -> (1.0, 5.0))
    assert(Bench.regressions(prevAll, cur) == Seq("x68", "x40"))
    // legacy process-CPU reference (pre-task_cpu baseline file): the
    // CURRENT samples must gate on process cpu too — comparing task
    // cpu (structurally smaller) against a process-cpu reference would
    // systematically under-detect during the fallback
    assert(Bench.regressions(prevAll, cur, refIsTask = false) ==
      Seq("x68", "x36", "x40"))
    assert(Bench.regressions(Map.empty, cur).isEmpty)  // first run: no gate
  }

  test("ratio leg flags a sub-wall-floor task-CPU blowup; near-misses stay out") {
    // the r18 driver shape the wall floor hid: x68 at 3.53 task-CPU-s
    // vs canonical 0.32 (x11) inside 0.40 s of wall — a 32-core burst
    // recompute under floorWallCompute. The ratio leg must flag it.
    val prev = Map(
      "x68_dup_spans" -> (0.24, 0.32), "q15" -> (0.19, 0.14),
      "x01" -> (0.5, 0.4), "x71s" -> (1.5, 1.0))
    val cur = Seq(
      "x68_dup_spans" -> Some(Bench.Sample(0.40, 3.99, 0L, 66L, 0L, 247L,
        taskCpu = 3.53)),
      // the q15 companion reading: x5.5 at 0.77 task-CPU-s — under
      // BOTH the ratio factor and its CPU floor, stays out (it was
      // adjudicated environment: flat plan, no persist, jit 402 ms)
      "q15" -> Some(Bench.Sample(1.10, 3.21, 81L, 402L, 0L, 70L,
        taskCpu = 0.77)),
      // x9 ratio but only 0.9 CPU-s of substance: sub-ratioFloorCpu
      // flutter on a tiny entry, stays out
      "x01" -> Some(Bench.Sample(0.2, 4.0, 0L, 0L, 0L, 0L, taskCpu = 0.9)),
      // streaming row at x10 CPU on flat wall: micro-batch-split
      // noise, the ratio leg must NOT apply to streaming rows
      "x71s" -> Some(Bench.Sample(1.6, 11.0, 0L, 0L, 0L, 0L, taskCpu = 10.0)))
    assert(Bench.regressions(prev, cur, streaming = _ == "x71s") ==
      Seq("x68_dup_spans"))
    // both sides of each ratio-leg predicate: just over the factor at
    // just over the CPU floor flags; at/under either side does not
    val p2 = Map("a" -> (0.3, 0.2), "b" -> (0.3, 0.2), "c" -> (0.3, 0.2))
    def s(task: Double) =
      Some(Bench.Sample(0.3, task * 2, 0L, 0L, 0L, 0L, taskCpu = task))
    assert(Bench.regressions(p2, Seq("a" -> s(1.7))) == Seq("a"))   // x8.5, 1.7 CPU-s
    assert(Bench.regressions(p2, Seq("b" -> s(1.5))).isEmpty)       // x7.5: under factor
    assert(Bench.regressions(p2, Seq("c" -> s(0.99))).isEmpty)      // under CPU floor
    // legacy process-CPU reference (refIsTask=false): the ratio leg
    // must stand down — process CPU swings up to x10 on identical code
    // (heap paging / GC attribution) and a sub-wall-floor phantom burst
    // must not block the fallback path's baseline refresh
    assert(Bench.regressions(p2,
      Seq("a" -> Some(Bench.Sample(0.3, 1.9, 0L))), refIsTask = false).isEmpty)
    // ... and a sample WITHOUT task cpu (taskCpu = -1) can't ratio-gate
    // even under a task reference
    assert(Bench.regressions(p2,
      Seq("a" -> Some(Bench.Sample(0.3, 1.9, 0L)))).isEmpty)
  }

  test("a zero-valued reference still gates via the absolute floors") {
    // the committed baseline serializes task-cpu at 2 decimals, so a
    // sub-5ms entry's reference is exactly 0.0 — `c > 0 && ...` used to
    // exempt such entries from the gate no matter how large the blowup
    val prev = Map("g10" -> (0.01, 0.0), "x71s" -> (0.0, 0.0))
    val cur = Seq(
      "g10" -> Some(Bench.Sample(3.0, 60.0, 0L, 0L, 0L, 0L, taskCpu = 50.0)),
      "x71s" -> Some(Bench.Sample(5.0, 1.0, 0L)))
    assert(Bench.regressions(prev, cur) == Seq("g10"))
    assert(Bench.regressions(prev, cur, streaming = _ == "x71s")
      .contains("x71s"))
  }

  test("summary caps the failed list and carries the true count; names escape") {
    // a systemic breakage fails ~100 entries — uncapped, the failed
    // array alone overflowed the driver's ~2000-char stdout tail
    val manyFailed: Seq[(String, Option[Bench.Sample])] =
      (1 to 100).map(i => f"x$i%02d_some_entry_name_padding" -> None)
    val line = Bench.renderSummaryLine(
      manyFailed, "/root/testdata/sf0.1", "/root/repo/bench_detail.json")
    assert(line.length < 1900, s"${line.length} chars")
    val root = mapper.readTree(line)
    assert(root.get("failed").size == 8)
    assert(root.get("n_failed").asInt == 100)
    // env-controlled strings must not corrupt the JSON
    val odd = Bench.renderSummaryLine(
      Seq("q01" -> Some(Bench.Sample(1.0, 1.0, 0L))),
      "/data/\"quoted\"/sf\\dir", "/tmp/detail.json")
    assert(mapper.readTree(odd).get("sf").asText == "/data/\"quoted\"/sf\\dir")
    val oddDetail = Bench.renderDetail(
      Seq("q01" -> Some(Bench.Sample(1.0, 1.0, 0L))), "/data/\"q\"/sf", 3)
    assert(mapper.readTree(oddDetail).get("sf").asText == "/data/\"q\"/sf")
  }

  test("sf reference compare tolerates trailing-slash drift") {
    val p = java.nio.file.Files.createTempFile("bench_detail", ".json")
    java.nio.file.Files.writeString(p,
      """{"fmt":"[wall_s,cpu_s,gc_ms,jit_ms,evict_blocks,stor_mb,task_cpu_s]",
        |"sf":"/root/testdata/sf0.1","regressed":[],
        |"entries":{"q01":[1.0,2.0,0,0,0,1,1.5]}}""".stripMargin.replace("\n", ""))
    // same data spelled with a trailing slash must still serve as the
    // gate reference (a raw string compare stood the gate down)
    assert(Bench.previousCpu(p, "/root/testdata/sf0.1/").nonEmpty)
    assert(Bench.previousCpu(p, "/root/testdata/sf0.01").isEmpty)
  }

  test("streaming lifecycle rows gate on wall, not cpu (micro-batch-split noise)") {
    val streaming = Set("x71_streaming_dedup", "x95_tws_sessionize")
    val prev = Map(
      "x71_streaming_dedup" -> (1.5, 4.5),
      "x95_tws_sessionize" -> (1.0, 2.0),
      "x68" -> (1.36, 19.1))
    val cur = Seq(
      // the r11 adjudicated case: cpu 3.5x on an extra micro-batch of
      // state commits, wall < 2x — lifecycle noise, NOT flagged
      "x71_streaming_dedup" -> Some(Bench.Sample(2.62, 15.68, 0L)),
      // a real streaming regression: wall blows past 3x — flagged
      "x95_tws_sessionize" -> Some(Bench.Sample(4.1, 9.0, 0L)),
      // compute row keeps the cpu rule
      "x68" -> Some(Bench.Sample(6.5, 133.7, 0L)))
    assert(Bench.regressions(prev, cur, streaming) ==
      Seq("x95_tws_sessionize", "x68"))
  }

  test("streaming retry leg: a non-reproducing burst clears, a real regression stands") {
    // the r20 90g preflight shape: x52 at 6.90 s wall (canonical 0.73)
    // purely from a C2 compile burst (jit 4997 ms in the same row) that
    // a re-run three minutes later did not reproduce
    val streaming = Set("x52s", "x95s", "x71s")
    val prev = Map(
      "x52s" -> (0.73, 1.83), "x95s" -> (1.0, 2.0),
      "x71s" -> (1.5, 4.5), "x68" -> (0.24, 0.32))
    val results = Seq(
      "x52s" -> Some(Bench.Sample(6.90, 19.9, 0L, 4997L)),  // burst: flagged
      "x95s" -> Some(Bench.Sample(4.1, 9.0, 0L)),           // real: flagged
      "x71s" -> Some(Bench.Sample(1.6, 5.0, 0L)),           // fine
      "x68" -> Some(Bench.Sample(0.40, 3.99, 0L, 0L, 0L, 0L,
        taskCpu = 3.53)))                                   // compute ratio flag
    val flagged = Bench.regressions(prev, results, streaming)
    assert(flagged.toSet == Set("x52s", "x95s", "x68"))
    val remeasured = scala.collection.mutable.ArrayBuffer[String]()
    val (updated, finalFlags, retried) = Bench.retryStreamingFlags(
      prev, results, flagged, streaming, refIsTask = true,
      remeasure = { n =>
        remeasured += n
        n match {
          case "x52s" => Some(Bench.Sample(1.14, 4.26, 0L, 180L))  // burst gone
          case "x95s" => Some(Bench.Sample(4.3, 9.1, 0L))          // reproduces
          case other => fail(s"compute entry $other must not be retried")
        }
      })
    // only the flagged STREAMING entries were re-measured — never x68
    assert(remeasured.sorted == Seq("x52s", "x95s"))
    // the burst clears; the reproducing regression and the compute
    // flag both stand
    assert(finalFlags.toSet == Set("x95s", "x68"))
    // x52s now reports the steady-state retry (any future gate
    // reference built from this detail carries 1.14, not the burst)
    assert(updated.collectFirst { case ("x52s", Some(s)) => s.wall }
      .contains(1.14))
    // x95s keeps its ORIGINAL min (the retry was slower)
    assert(updated.collectFirst { case ("x95s", Some(s)) => s.wall }
      .contains(4.1))
    // the discarded burst reading stays auditable
    assert(retried == Seq("x52s" -> Bench.Sample(6.90, 19.9, 0L, 4997L)))
    // a failed remeasure keeps the flag (conservative)
    val (_, keptFlags, kept) = Bench.retryStreamingFlags(
      prev, results, flagged, streaming, refIsTask = true, _ => None)
    assert(keptFlags.toSet == Set("x52s", "x95s", "x68") && kept.isEmpty)
    // nothing streaming flagged: zero remeasures, results untouched
    val (same, sameFlags, none) = Bench.retryStreamingFlags(
      prev, results, Seq("x68"), streaming, refIsTask = true,
      _ => fail("must not remeasure"))
    assert(same == results && sameFlags == Seq("x68") && none.isEmpty)
  }

  test("detail JSON carries the retried audit field") {
    val detail = mapper.readTree(Bench.renderDetail(
      Seq("x52s" -> Some(Bench.Sample(1.14, 4.26, 0L))), "sf", 3,
      retried = Seq("x52s" -> Bench.Sample(6.90, 19.9, 0L, 4997L))))
    val row = detail.get("retried").get("x52s")
    assert(row.isArray && row.size == 8)
    assert(row.get(0).asDouble == 6.90 && row.get(3).asLong == 4997L)
    // absent by default — an empty object, parsers need no special case
    val plain = mapper.readTree(Bench.renderDetail(
      Seq("a" -> Some(Bench.Sample(1.0, 1.0, 0L))), "sf", 3))
    assert(plain.get("retried").size == 0)
  }

  test("detail JSON carries per-rep task-CPU for double-primed entries") {
    // r20 verdict task 1: the driver's x68 reading (2.95 task-CPU vs a
    // 0.45 same-heap preflight) was unadjudicable from a median-only
    // row — the artifact must show whether reps DECAY (a transient the
    // double-prime missed there) or sit FLAT (environment multiplier).
    val detail = mapper.readTree(Bench.renderDetail(Seq(
      "x68" -> Some(Bench.Sample(0.3, 0.8, 0L, primes = 2,
        repTaskCpus = Seq(2.41, 0.52, 0.47))),
      "q01" -> Some(Bench.Sample(0.1, 0.1, 0L))), "sf", 3))
    val reps = detail.get("rep_task_cpu")
    assert(reps.size == 1)                       // primed entries only
    val v = reps.get("x68")
    assert(v.isArray && v.size == 3)
    // EXECUTION order preserved (the decay shape is the signal)
    assert(v.get(0).asDouble == 2.41 && v.get(2).asDouble == 0.47)
    assert(reps.get("q01") == null)
    // the 8-column row shape is unchanged by the side field
    assert(detail.get("entries").get("x68").size == 8)
  }

  test("previousCpu reads a detail file's per-entry wall+cpu, same-sf only") {
    val dir = java.nio.file.Files.createTempDirectory("bench_gate_")
    val p = dir.resolve("bench_detail.json")
    java.nio.file.Files.write(p,
      Bench.renderDetail(Seq(
        "x68" -> Some(Bench.Sample(1.36, 19.1, 7L)),
        "x97" -> None), "/t/sf0.1", 3).getBytes("UTF-8"))
    val prev = Bench.previousCpu(p, "/t/sf0.1")
    assert(prev == Map("x68" -> (1.36, 19.1)))       // failed entry skipped
    assert(Bench.previousCpu(dir.resolve("absent.json"), "/t/sf0.1").isEmpty)
    // sf mismatch (e.g. an sf0.001 smoke run's detail on disk): the
    // gate must stand down, not flag every entry as a 100x regression
    assert(Bench.previousCpu(p, "/t/sf0.001").isEmpty)
  }

  test("gate baseline falls back to the tracked per-sf file when the detail is stale") {
    val dir = java.nio.file.Files.createTempDirectory("bench_gate_fb_")
    val detail = dir.resolve("bench_detail.json")
    val baseline = dir.resolve("bench_baseline_sf0.1.json")
    def write(p: java.nio.file.Path, sf: String, cpu: Double): Unit =
      java.nio.file.Files.write(p, Bench.renderDetail(
        Seq("x68" -> Some(Bench.Sample(1.0, cpu, 0L))), sf, 3).getBytes("UTF-8"))
    // detail present + same sf: it wins (cpu 19.1, not the baseline's 5.0)
    write(detail, "/t/sf0.1", 19.1); write(baseline, "/t/sf0.1", 5.0)
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1 == Map("x68" -> (1.0, 19.1)))
    // detail overwritten by a different-sf smoke run: baseline takes over
    write(detail, "/t/sf0.001", 0.2)
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1 == Map("x68" -> (1.0, 5.0)))
    // detail missing entirely (workspace restore drops the gitignored
    // file — the r11 session-start state): baseline still gates
    java.nio.file.Files.delete(detail)
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1 == Map("x68" -> (1.0, 5.0)))
    // neither present: gate stands down
    java.nio.file.Files.delete(baseline)
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1.isEmpty)
  }

  test("baseline refresh routes big-heap sweeps away from the tracked canonical") {
    val canonical = java.nio.file.Paths.get("/t/bench_baseline_sf0.1.json")
    // small heap: the tracked canonical is the refresh target
    assert(Bench.refreshTarget(canonical, "/root/testdata/sf0.1", 8L) == canonical)
    assert(Bench.refreshTarget(canonical, "/root/testdata/sf0.1", 16L) == canonical)
    // big heap (the r15/r16 driver round-close incident shape): the
    // refresh lands in the untracked .bigheap side file, never the
    // canonical — a driver `git add -A` then has nothing to commit
    val big = Bench.refreshTarget(canonical, "/root/testdata/sf0.1", 89L)
    assert(big != canonical)
    assert(big.getFileName.toString == "bench_baseline_sf0.1.bigheap.json")
    // the side file lands NEXT TO the canonical it shields, not in the
    // process CWD (r17 advisor finding): a bench run from another
    // working directory must not scatter .bigheap files elsewhere
    assert(big.getParent == canonical.toAbsolutePath.getParent)
  }

  test("detail artifacts are keyed by core count; refreshes only at the default") {
    // the r21 driver's 8-core scaling leg overwrote the 32-core sweep's
    // bench_detail.json (losing the per-rep vectors recorded there) and,
    // via the clean-sweep refresh, the bigheap side baseline. Per-cpu
    // detail names make two consecutive different-cpus runs leave both
    // files readable; the default count keeps the canonical name so
    // existing readers (gate fallback, baseline_check.py, the driver's
    // printed detail pointer) see no change.
    assert(Bench.detailFileName("32") == "bench_detail.json")
    assert(Bench.detailFileName("8") == "bench_detail.8c.json")
    assert(Bench.detailFileName("16") == "bench_detail.16c.json")
    // hostile env values stay file-safe
    assert(Bench.detailFileName("8/../x") == "bench_detail.8____xc.json")
    // baseline refresh (tracked canonical AND bigheap side file) is a
    // default-core-count privilege — a scaling leg is a different
    // measurement condition and must never become anyone's reference
    assert(Bench.refreshAllowed("32"))
    assert(!Bench.refreshAllowed("8"))
    assert(!Bench.refreshAllowed("64"))
    // the detail JSON self-describes its core count (like heap_gb)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val withCpus = mapper.readTree(Bench.renderDetail(
      Seq("q01" -> Some(Bench.Sample(0.1, 0.2, 0L))), "/t/sf0.1", 3, cpus = 8))
    assert(withCpus.get("cpus").asInt == 8)
    val noCpus = mapper.readTree(Bench.renderDetail(
      Seq("q01" -> Some(Bench.Sample(0.1, 0.2, 0L))), "/t/sf0.1", 3))
    assert(noCpus.get("cpus").asInt == -1)
  }

  test("sf slug strips the path and keeps the sf name file-safe") {
    assert(Bench.sfSlug("/root/testdata/sf0.1") == "sf0.1")
    assert(Bench.sfSlug("sf0.001") == "sf0.001")
    assert(Bench.sfSlug("/a b/sf 2") == "sf_2")
    // trailing slash must not degenerate to the empty slug (whose
    // baseline file would collide across scale factors)
    assert(Bench.sfSlug("/root/testdata/sf0.1/") == "sf0.1")
    assert(Bench.sfSlug("/root/testdata/sf0.1///") == "sf0.1")
    assert(Bench.sfSlug("///") == "default")
  }

  test("gate rejects a regressed-tainted detail/baseline as its reference") {
    val dir = java.nio.file.Files.createTempDirectory("bench_gate_taint_")
    val detail = dir.resolve("bench_detail.json")
    val baseline = dir.resolve("bench_baseline_sf0.1.json")
    def write(p: java.nio.file.Path, cpu: Double, reg: Seq[String]): Unit =
      java.nio.file.Files.write(p, Bench.renderDetail(
        Seq("x77" -> Some(Bench.Sample(1.0, cpu, 0L))), "/t/sf0.1", 3,
        regressed = reg).getBytes("UTF-8"))
    // detail flagged regressed (the r11 driver-sweep shape): the clean
    // baseline must gate, not the flagged values
    write(detail, 60.7, Seq("x77")); write(baseline, 2.1, Nil)
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1 == Map("x77" -> (1.0, 2.1)))
    // both tainted (legacy: r11 committed the flagged sweep as the
    // baseline): stand down rather than gate against regressed values
    write(baseline, 60.7, Seq("x77"))
    assert(Bench.gateBaseline(detail, baseline, "/t/sf0.1")._1.isEmpty)
  }

  test("group triples sum only their own prefix") {
    val rs = Seq(
      "q01" -> Some(Bench.Sample(1.0, 2.0, 10L)),
      "q02" -> Some(Bench.Sample(0.5, 1.0, 5L)),
      "x01" -> Some(Bench.Sample(3.0, 6.0, 30L)),
      "g01" -> Some(Bench.Sample(0.25, 0.5, 1L)),
      "p01" -> None)
    val root = mapper.readTree(Bench.renderSummaryLine(rs, "sf", "d"))
    assert(root.get("value").asDouble == 1.5)                    // corpus walls only
    val g = root.get("groups")
    assert(g.get("corpus_q01_q34").get(0).asDouble == 1.5)
    assert(g.get("corpus_q01_q34").get(1).asDouble == 3.0)
    assert(g.get("corpus_q01_q34").get(2).asLong == 15L)
    assert(g.get("extension").get(0).asDouble == 3.0)
    assert(g.get("pipeline").get(0).asDouble == 0.0)             // failed → excluded
    assert(root.get("failed").get(0).asText == "p01")
  }
}
