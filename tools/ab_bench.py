"""Interleaved A/B bench for a subset of contract queries.

The repo's benchmarking discipline (NOTES.md) says: never attribute a
cross-round per-query delta to code without 3x INTERLEAVED fresh-process
runs of both revisions on the same host — same-day interleaving is the
only thing that cancels host drift (the r5->r6 "flagship regression"
was 20% host noise).  This tool packages that discipline:

    python tools/ab_bench.py --a /path/to/worktreeA --b /path/to/repoB \
        --queries text_pack ivf_knn --runs 3 [--sf-dir /root/testdata/sf0.1]

Each (run, variant) is ONE fresh subprocess that builds a session, warms
the JVM exactly like bench.py, then times the named queries through the
noop sink with bench.py's measurement window (build_sec = builder call,
exec sec = noop write).  Variants alternate A,B,A,B,... within each run
so slow-host minutes hit both sides equally.  Prints a per-query table
of mean exec sec and the B/A ratio.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from lens_sds_batch_spark.session import get_spark
spark = get_spark("ab-bench")
spark.sparkContext.setLogLevel("ERROR")
from __spark_entry__ import queries
qs = queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
    "l_returnflag").count().write.format("noop").mode("overwrite").save()
out = {}
for name in json.loads(os.environ["AB_QUERIES"]):
    b0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    build = time.perf_counter() - b0
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    out[name] = {"build": round(build, 3), "exec": round(time.perf_counter() - t0, 3)}
print("AB_RESULT " + json.dumps(out))
"""


def _run_once(repo: str, queries: list[str], sf_dir: str) -> dict:
    import os

    env = dict(os.environ, AB_QUERIES=json.dumps(queries), SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD], cwd=repo, env=env,
        capture_output=True, text=True, check=False,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"no AB_RESULT from {repo}: rc={p.returncode}\n{p.stdout[-1000:]}\n{p.stderr[-1000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="baseline repo/worktree path")
    ap.add_argument("--b", required=True, help="candidate repo path")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    res: dict[str, dict[str, list[float]]] = {
        q: {"a": [], "b": []} for q in args.queries
    }
    failures = []
    for i in range(args.runs):
        for tag, repo in (("a", args.a), ("b", args.b)):
            # One transient child failure (OOM, JVM hiccup) must not
            # discard the timings already collected across earlier
            # runs/variants (advisor r9): record it and degrade the
            # session from 3x to 2x instead of aborting.
            try:
                got = _run_once(repo, args.queries, args.sf_dir)
            except RuntimeError as exc:
                failures.append(f"run {i + 1} {tag}")
                print(f"run {i + 1} {tag}={repo}: FAILED — {exc}", file=sys.stderr)
                continue
            for q, t in got.items():
                res[q][tag].append(t["exec"])
            print(f"run {i + 1} {tag}={repo}: "
                  + " ".join(f"{q}={t['exec']:.2f}(+{t['build']:.2f}b)"
                             for q, t in got.items()),
                  file=sys.stderr)
    print(f"{'query':<24} {'A mean':>8} {'B mean':>8} {'B/A':>6}  runs(A) / runs(B)")
    for q in args.queries:
        a, b = res[q]["a"], res[q]["b"]
        if not a or not b:
            print(f"{q:<24} {'-':>8} {'-':>8} {'-':>6}  "
                  f"{[round(x, 2) for x in a]} / {[round(x, 2) for x in b]}")
            continue
        ma, mb = statistics.mean(a), statistics.mean(b)
        print(f"{q:<24} {ma:>8.2f} {mb:>8.2f} {mb / ma:>6.2f}  "
              f"{[round(x, 2) for x in a]} / {[round(x, 2) for x in b]}")
    if failures:
        print(f"WARNING: {len(failures)} failed child run(s): {failures} — "
              "means above use the surviving runs only", file=sys.stderr)
        if all(not res[q]["a"] or not res[q]["b"] for q in args.queries):
            sys.exit(1)  # nothing comparable survived


if __name__ == "__main__":
    main()
