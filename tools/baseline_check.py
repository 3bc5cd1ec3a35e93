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

Prints the adjudication and exits 0 when the divergence is the expected
driver refresh (or there is no divergence). Exits 1 only when the
working tree holds a FASTER clean small-heap sweep than the committed
canonical — i.e. when the rule says you should commit the refresh.

Usage: python3 tools/baseline_check.py [bench_baseline_sf0.1.json]
"""
import json
import subprocess
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else 'bench_baseline_sf0.1.json'
SMALL_HEAP_GB = 16  # 8g sweeps are canonical; driver stamps ~89


def load_committed():
    out = subprocess.run(['git', 'show', f'HEAD:{PATH}'],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout)


def describe(tag, d):
    wall, cpu, gc = d['total']
    print(f"  {tag}: heap_gb={d.get('heap_gb', '?')} wall={wall}s "
          f"cpu={cpu}s gc={gc}ms entries={len(d['entries'])} "
          f"regressed={d.get('regressed', [])}")


def main():
    wt = json.load(open(PATH))
    co = load_committed()
    print(f"baseline reconciliation check ({PATH}):")
    describe('committed (canonical)', co)
    if wt == co:
        print("  working-tree == committed: nothing to reconcile")
        return 0
    describe('working-tree          ', wt)
    wt_heap = wt.get('heap_gb', 0)
    clean = not wt.get('regressed')
    if wt_heap > SMALL_HEAP_GB:
        print(f"  ADJUDICATION: working-tree file is a DRIVER REFRESH "
              f"(heap_gb={wt_heap} > {SMALL_HEAP_GB}) vs committed "
              f"canonical (heap_gb={co.get('heap_gb', '?')}). Expected "
              "per BASELINE.md: keep the committed canonical; the "
              "driver environment measures 15-25% slower wall. "
              "Do NOT commit this refresh.")
        return 0
    if clean and wt['total'][0] < co['total'][0]:
        print(f"  ADJUDICATION: working-tree is a FASTER clean small-heap "
              f"sweep ({wt['total'][0]}s < {co['total'][0]}s at "
              f"heap_gb={wt_heap}). Per the fastest-clean-8g rule this "
              "SHOULD become the new committed canonical.")
        return 1
    print("  ADJUDICATION: working-tree is a small-heap sweep but not "
          "faster-and-clean vs the canonical — keep the committed file.")
    return 0


if __name__ == '__main__':
    sys.exit(main())
