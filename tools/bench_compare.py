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

  3. CANARY PARITY (round 19) — the bench stamps an absolute host
     yardstick (BenchCanary: a sealed 100M-step ALU loop + a fixed
     fixed-seed 32-way Spark hash-agg, min-of-3). Rules:
       a. a run self-stamped canary-unstable (host moved mid-run) is
          refused — this is the whole-query-window contention class
          (r18 run B's x16) the warm-spread stamp cannot see;
       b. a pair whose canary levels disagree (>15% on the cpu p50,
          >30% on the spark min — the spark probe carries ~16%
          benign cross-JVM variance, measured) is refused: the two
          runs saw different hosts, their medians are not comparable;
       c. each run's level is held against the quiet-window REFERENCE
          below; a run >15% (cpu) / >30% (spark) above it ran in a
          degraded window — the r17-run-4 / r18-final-pair class that
          relative checks pass by construction — and is refused unless
          BENCH_ALLOW_DEGRADED=1 (which downgrades to a loud warning
          and prints canary-normalized values so the artifact is still
          interpretable).
     Canary-normalized totals (total / host-slowness-factor) are
     reported for any run whose canary is elevated.

Exit code 0 = the pair (or run) is committable; 1 = re-run needed.
Requires the "runs" per-query arrays the bench emits since round 16;
older artifacts degrade to the pair-agreement check only (and have no
canary — noted, not refused).
"""
import json
import os
import sys

FLOOR_SECS = 0.3
PAIR_RATIO = 2.0
SPREAD_RATIO = 3.0

# Quiet-window reference canary levels, measured 2026-08-16 on the
# bench host (local[32], idle): cpu p50 ~187-193 ms over 10 fresh
# JVMs, spark min-of-3 ~430-500 ms over 6. Re-measure and update if
# the host hardware changes; PLANS.md carries the measurement log.
REF_CPU_MS = 189.0
REF_SPARK_MS = 450.0
CPU_TOL = 1.15
SPARK_TOL = 1.30


def canary_level(bench):
    """(cpu_p50, spark_min) or None for pre-canary artifacts."""
    c = bench.get("canary")
    if not c:
        return None
    cpu = c.get("cpu_ms") or []
    spark = c.get("spark_ms") or []
    if not cpu or not spark:
        return None
    cpu_sorted = sorted(cpu)
    n = len(cpu_sorted)
    p50 = (cpu_sorted[n // 2] if n % 2 == 1
           else (cpu_sorted[n // 2 - 1] + cpu_sorted[n // 2]) / 2.0)
    return p50, min(spark)


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

    allow_degraded = os.environ.get("BENCH_ALLOW_DEGRADED") == "1"
    levels = []
    for b, p in zip(benches, argv[1:3]):
        # the bench self-stamps since round 17; trust a true stamp even
        # if this tool's recomputation were to drift from the embedded rule
        if b.get("contended"):
            ok = False
            print(f"SELF-STAMPED CONTENDED {p}: "
                  + ", ".join(b.get("contended_queries", [])))
        for name, rec in sorted((b.get("contention_reruns") or {}).items()):
            if rec.get("clean"):
                print(f"NOTE {p}: {name} warm-spread episode repaired "
                      f"in-session (original {rec['original_runs']} -> "
                      f"clean rerun adopted)")
        for name, label, runs in spread_violations(b, p):
            ok = False
            warm = runs[1:]
            print(f"CONTENDED {name} in {label}: runs {runs} warm spread "
                  + ("inf" if min(warm) <= 0
                     else f"{max(warm) / min(warm):.1f}x"))
        # canary rules (round 19)
        lvl = canary_level(b)
        levels.append(lvl)
        if lvl is None:
            print(f"NOTE {p}: pre-canary artifact (no absolute host "
                  "yardstick — degraded-window slowness undetectable)")
            continue
        if (b.get("canary") or {}).get("unstable"):
            ok = False
            print(f"CANARY UNSTABLE {p}: host moved mid-run "
                  f"(cpu spread {b['canary'].get('spread_cpu')}x, "
                  f"spark samples {b['canary'].get('spark_ms')})")
        cpu, spark = lvl
        cpu_f, spark_f = cpu / REF_CPU_MS, spark / REF_SPARK_MS
        if cpu_f > CPU_TOL or spark_f > SPARK_TOL:
            factor = max(cpu_f, spark_f)
            norm = b["value"] / factor
            msg = (f"DEGRADED WINDOW {p}: canary cpu {cpu:.0f} ms "
                   f"({cpu_f:.2f}x ref {REF_CPU_MS:.0f}), spark "
                   f"{spark:.0f} ms ({spark_f:.2f}x ref "
                   f"{REF_SPARK_MS:.0f}) — canary-normalized total "
                   f"~{norm:.1f} s (measured {b['value']} s)")
            if allow_degraded:
                print("WARNING (allowed) " + msg)
            else:
                ok = False
                print(msg + " — re-run in a quiet window, or set "
                      "BENCH_ALLOW_DEGRADED=1 to accept with the "
                      "normalized caveat on record")

    if len(benches) == 2 and all(levels):
        (ca, sa), (cb, sb) = levels
        if max(ca, cb) / min(ca, cb) > CPU_TOL:
            ok = False
            print(f"CANARY PAIR MISMATCH (cpu): {ca:.0f} vs {cb:.0f} ms "
                  f"({max(ca, cb) / min(ca, cb):.2f}x > {CPU_TOL}) — the "
                  "runs saw different hosts; medians not comparable")
        if max(sa, sb) / min(sa, sb) > SPARK_TOL:
            ok = False
            print(f"CANARY PAIR MISMATCH (spark): {sa:.0f} vs {sb:.0f} ms "
                  f"({max(sa, sb) / min(sa, sb):.2f}x > {SPARK_TOL}) — the "
                  "runs saw different hosts; medians not comparable")

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
        tb = [benches[0].get("tiebreak") or {}, benches[1].get("tiebreak") or {}]

        def agree(x, y):
            if max(x, y) < FLOOR_SECS:
                return True
            return min(x, y) > 0 and max(x, y) / min(x, y) <= PAIR_RATIO

        for name in sorted(set(qa) & set(qb)):
            a, b = qa[name], qb[name]
            if agree(a, b):
                continue
            # 2-of-3 vote: the pair legs run IDENTICAL code, so a
            # disagreement is by definition noise in one of them. A leg
            # whose in-session third-leg rerun (minutes after the first
            # measurement) reproduces its own level carries two of the
            # three measurements — the other leg's single value is the
            # convicted episode. Whole-session degradation that would
            # let a leg corroborate itself is what the canary parity
            # rules above exist to refuse.
            vote = None
            for t, p in zip(tb, argv[1:3]):
                rec = t.get(name)
                if rec and not rec.get("adopted") and \
                        agree(rec["first"], rec["rerun"]):
                    vote = (p, rec)
            if vote is not None:
                p, rec = vote
                print(f"ADJUDICATED {name}: medians {a:.2f} vs {b:.2f} — "
                      f"2-of-3 vote in {p} (first {rec['first']}, "
                      f"in-session rerun {rec['rerun']}) convicts the "
                      f"other leg's value as a transient episode")
                continue
            ok = False
            lo = min(a, b)
            ratio = "inf" if lo <= 0 else f"{max(a, b) / lo:.1f}x"
            print(f"DISAGREE {name}: medians {a:.2f} vs {b:.2f} ({ratio})")
        # adjudicated queries no longer disagree — surface the audit
        # trail so a passing pair still shows what the third leg decided
        for t, p in zip(tb, argv[1:3]):
            for name, rec in sorted(t.items()):
                if rec.get("adopted"):
                    print(f"ADJUDICATED {name} in {p}: first "
                          f"{rec['first']} was a transient episode; "
                          f"in-session third leg {rec['rerun']} agrees "
                          f"with the pair reference {rec['ref']} — adopted")
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
