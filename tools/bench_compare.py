#!/usr/bin/env python3
"""Audit a bench pair the way the committed-pair rule reads it.

Usage: python3 tools/bench_compare.py <BENCH_A.json> <BENCH_B.json>
       python3 tools/bench_compare.py <BENCH.json>           # solo audit

The committed-pair acceptance rule (PLANS.md, round 16):
  1. PAIR AGREEMENT — every query whose median exceeds 0.3 s in either
     run must agree within 2x between the runs (real regressions move
     the median; adjacent clean runs do not).
  2. INTERNAL SPREAD — any query whose WARM re-runs (the run array
     minus its first, cold entry — cold pays one-off plan codegen/JIT
     and legitimately dwarfs warm cost) spread more than 3x min-to-max
     above the 0.3 s floor marks its run as CONTENDED: a real
     regression moves every warm run, machine contention shows as one
     outlier inside a wide spread. A contended run is re-run, not
     committed.

Exit code 0 = the pair (or run) is committable; 1 = re-run needed.
Requires the "runs" per-query arrays the bench emits since round 16;
older artifacts degrade to the pair-agreement check only.
"""
import json
import sys

FLOOR_SECS = 0.3
PAIR_RATIO = 2.0
SPREAD_RATIO = 3.0


def load(path):
    with open(path) as f:
        return json.load(f)


def spread_violations(bench, label):
    """Contention shows as an outlier among the WARM re-runs. The
    FIRST run is the cold one (plan codegen + JIT, reported separately
    as cold_total) and legitimately dwarfs the re-runs — x93's
    iterative plan compiles 1700x its warm cost — so it is excluded;
    a query with fewer than two warm runs has no spread to audit."""
    bad = []
    for name, runs in (bench.get("runs") or {}).items():
        warm = runs[1:]
        if len(warm) < 2 or max(warm) < FLOOR_SECS:
            continue
        # a zero run under a >floor max is an INFINITE spread — the
        # worst contention signal, never a skip
        lo = min(warm)
        if lo <= 0 or max(warm) / lo > SPREAD_RATIO:
            bad.append((name, label, runs))
    return bad


def main(argv):
    benches = [load(p) for p in argv[1:3]]
    if not benches:
        print(__doc__)
        return 2
    ok = True

    for b, p in zip(benches, argv[1:3]):
        # the bench self-stamps since round 17; trust a true stamp even
        # if this tool's recomputation were to drift from the embedded rule
        if b.get("contended"):
            ok = False
            print(f"SELF-STAMPED CONTENDED {p}: "
                  + ", ".join(b.get("contended_queries", [])))
        for name, label, runs in spread_violations(b, p):
            ok = False
            warm = runs[1:]
            print(f"CONTENDED {name} in {label}: runs {runs} warm spread "
                  + ("inf" if min(warm) <= 0
                     else f"{max(warm) / min(warm):.1f}x"))

    if len(benches) == 2:
        # the per-query value's basis changed in round 17 (median over
        # warm re-runs, cold excluded; older artifacts are cold-inclusive
        # and systematically HIGHER) — comparing across bases silently
        # reads as a spurious speedup, so a mixed pair is never committable
        bases = [b.get("median_basis", "cold_inclusive") for b in benches]
        if bases[0] != bases[1]:
            ok = False
            print(f"BASIS MISMATCH: {argv[1]} is {bases[0]}, "
                  f"{argv[2]} is {bases[1]} — per-query medians are not "
                  "comparable across bases")
        qa, qb = benches[0]["queries"], benches[1]["queries"]
        for name in sorted(set(qa) & set(qb)):
            a, b = qa[name], qb[name]
            if max(a, b) < FLOOR_SECS:
                continue
            lo = min(a, b)
            if lo <= 0 or max(a, b) / lo > PAIR_RATIO:
                ok = False
                ratio = "inf" if lo <= 0 else f"{max(a, b) / lo:.1f}x"
                print(f"DISAGREE {name}: medians {a:.2f} vs {b:.2f} "
                      f"({ratio})")
        only = set(qa) ^ set(qb)
        if only:
            print(f"NOTE roster differs by {len(only)} queries: "
                  + ", ".join(sorted(only)[:8]))
        print(f"totals: {benches[0]['value']} vs {benches[1]['value']} s "
              f"over {len(set(qa) & set(qb))} shared queries")

    print("COMMITTABLE" if ok else "RE-RUN NEEDED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
