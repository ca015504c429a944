#!/usr/bin/env python3
"""Emit the repo's live query/test counts (single source of truth for
the numbers quoted in README/round docs — regenerate, don't hand-edit).

- oracle queries: keys of SparkEntry.oracleSql, read from the freshest
  verify dump if one is given, else statically from the query maps.
- ScalaTest tests: static count of test(...) registrations (every spec
  in this repo registers tests statically).

Usage: python3 tools/counts.py [verifyOutDir]
"""
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_count():
    if len(sys.argv) > 1:
        oracle = os.path.join(sys.argv[1], "oracle_sql.json")
        return len(json.load(open(oracle))), "oracle_sql.json"
    # static: every '"name" ->' entry inside the queries maps; the
    # bench artifact cross-checks it when present
    bench = os.path.join(ROOT, "BENCH_FULL.json")
    if os.path.exists(bench):
        return len(json.load(open(bench))["queries"]), "BENCH_FULL.json"
    raise SystemExit("no verify dir given and no BENCH_FULL.json")


def test_count():
    n_tests, n_specs = 0, 0
    out = subprocess.run(
        ["grep", "-rc", r"^\s*test(", "--include=*.scala",
         os.path.join(ROOT, "src/test")],
        capture_output=True, text=True).stdout
    for line in out.splitlines():
        path, _, cnt = line.rpartition(":")
        c = int(cnt)
        if c > 0 and re.search(r"Spec\.scala$", path):
            n_specs += 1
            n_tests += c
    return n_tests, n_specs


if __name__ == "__main__":
    q, src = query_count()
    t, s = test_count()
    print(f"oracle queries: {q} (from {src})")
    print(f"scalatest tests: {t} across {s} spec files (static count)")
