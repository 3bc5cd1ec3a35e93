#!/usr/bin/env python3
"""One-command adjudication of the bench-baseline reconciliation rule
(BASELINE.md, r15 "CANONICAL BASELINE DECLARED" entry) — so no round
ever has to re-derive it from git archaeology.

Rule being automated: the driver's per-round Bench run auto-refreshes
the working-tree bench_baseline_sf0.1.json whenever its sweep is clean,
but the driver runs ~90 GiB heap and measures 15-25 % slower wall than
a local 8g sweep. The COMMITTED file is the canonical (fastest clean 8g
sweep of the current tree); a working-tree divergence with a big
heap_gb stamp is a driver-environment measurement, NOT a new canonical.

"Clean" is BASELINE.md's definition, all three legs: zero failed
entries (Bench renders a failed entry as null AND drops it from the
total — a sweep with one is incomplete and incomparable), zero
regressed, zero cache evictions (fmt index 4 per entry).

Exit codes (distinct from 1 so an uncaught crash can never read as an
adjudication):
  0 — keep the committed canonical (no divergence, expected driver
      refresh, or a small-heap sweep that isn't faster-and-clean)
  2 — the working tree holds a FASTER CLEAN small-heap sweep: the rule
      says commit it as the new canonical
  3 — the COMMITTED file itself violates the rule (big-heap driver
      refresh got committed — the r15 incident — or unknown
      provenance): restore a proper canonical from git history

Usage: python3 tools/baseline_check.py [bench_baseline_sf0.1.json]
(run from anywhere in the repo — the script chdirs to the git root so
the working-tree read and `git show HEAD:` name the same file).
"""
import json
import os
import subprocess
import sys

SMALL_HEAP_GB = 16  # 8g sweeps are canonical; driver stamps ~89


def load_committed(path):
    out = subprocess.run(['git', 'show', f'HEAD:{path}'],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout)


def taints(d):
    """BASELINE.md's three-legged clean check."""
    out = []
    failed = [k for k, v in d['entries'].items() if v is None]
    if failed:
        out.append(f"failed entries {failed[:5]}")
    if d.get('regressed'):
        out.append(f"regressed {d['regressed']}")
    evict = sum(v[4] for v in d['entries'].values()
                if v is not None and len(v) > 4)
    if evict:
        out.append(f"evict_blocks {evict}")
    return out


def describe(tag, d):
    wall, cpu, gc = d['total']
    t = taints(d)
    print(f"  {tag}: heap_gb={d.get('heap_gb', '?')} wall={wall}s "
          f"cpu={cpu}s gc={gc}ms entries={len(d['entries'])} "
          f"taints={t if t else 'none (clean)'}")


def main():
    root = subprocess.run(['git', 'rev-parse', '--show-toplevel'],
                          capture_output=True, text=True, check=True).stdout.strip()
    os.chdir(root)
    path = sys.argv[1] if len(sys.argv) > 1 else 'bench_baseline_sf0.1.json'
    wt = json.load(open(path))
    co = load_committed(path)
    print(f"baseline reconciliation check ({path}):")
    describe('committed (canonical)', co)

    co_heap = co.get('heap_gb')
    if co_heap is None or co_heap > SMALL_HEAP_GB:
        print(f"  ADJUDICATION: the COMMITTED file is not a valid canonical "
              f"(heap_gb={co_heap!r}; rule requires a clean sweep at "
              f"<= {SMALL_HEAP_GB}g with known provenance) — the r15 "
              "incident shape, where a driver round-close commit overwrote "
              "the canonical. Restore the last small-heap canonical from "
              "git history (git log -- " + path + ").")
        return 3

    if wt == co:
        print("  working-tree == committed: nothing to reconcile")
        return 0
    describe('working-tree          ', wt)
    wt_heap = wt.get('heap_gb')
    if wt_heap is None:
        print("  ADJUDICATION: working-tree file carries no heap_gb stamp — "
              "unknown provenance (pre-r15 format?). Refusing to adjudicate; "
              "keep the committed canonical and re-measure with a stamped "
              "sweep.")
        return 0
    if wt_heap > SMALL_HEAP_GB:
        print(f"  ADJUDICATION: working-tree file is a DRIVER REFRESH "
              f"(heap_gb={wt_heap} > {SMALL_HEAP_GB}) vs committed "
              f"canonical (heap_gb={co_heap}). Expected per BASELINE.md: "
              "keep the committed canonical; the driver environment "
              "measures 15-25% slower wall. Do NOT commit this refresh.")
        return 0
    # Comparability before speed: a sweep covering a different entry
    # set (truncated file, renamed/removed entries) or a different sf
    # measures different WORK — its lower total is not "faster" and
    # must never auto-adopt. A deliberate entry-set change needs a
    # human-committed re-measure, not this adjudicator.
    wt_keys, co_keys = set(wt['entries']), set(co['entries'])
    # trailing-slash-normalized, same as Bench.gateBaseline's normSf: a
    # driver config drift from .../sf0.1 to .../sf0.1/ names the same
    # data and must not read as "different work"
    def norm_sf(v):
        return v.rstrip('/') if isinstance(v, str) else v
    if wt_keys != co_keys or norm_sf(wt.get('sf')) != norm_sf(co.get('sf')):
        diff = []
        if norm_sf(wt.get('sf')) != norm_sf(co.get('sf')):
            diff.append(f"sf {wt.get('sf')!r} vs {co.get('sf')!r}")
        if wt_keys - co_keys:
            diff.append(f"extra entries {sorted(wt_keys - co_keys)[:5]}")
        if co_keys - wt_keys:
            diff.append(f"missing entries {sorted(co_keys - wt_keys)[:5]}")
        print(f"  ADJUDICATION: INCOMPARABLE sweeps ({'; '.join(diff)}) — "
              "the totals measure different work, so faster/slower is "
              "meaningless. Keep the committed canonical; if the entry set "
              "changed deliberately, re-measure a clean small-heap sweep "
              "of the new set and commit it by hand with the change noted "
              "in BASELINE.md.")
        return 0
    wt_taints = taints(wt)
    if not wt_taints and wt['total'][0] < co['total'][0]:
        print(f"  ADJUDICATION: working-tree is a FASTER CLEAN small-heap "
              f"sweep ({wt['total'][0]}s < {co['total'][0]}s at "
              f"heap_gb={wt_heap}, zero taints). Per the fastest-clean-8g "
              "rule this SHOULD become the new committed canonical.")
        return 2
    why = (f"tainted: {wt_taints}" if wt_taints
           else f"not faster ({wt['total'][0]}s >= {co['total'][0]}s)")
    print(f"  ADJUDICATION: working-tree is a small-heap sweep but {why} — "
          "keep the committed file.")
    return 0


if __name__ == '__main__':
    sys.exit(main())
