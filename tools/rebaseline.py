"""Record a reproducible performance baseline (r9 verdict #2).

Three rounds of A/B work proved the r1/r7 BASELINE.md recordings are
not reproducible on today's host (host drift reaches ±30%+), so every
round burned effort re-discovering that.  This tool produces the
replacement drift reference: N fresh-process runs of the full contract
suite on THIS repo (ab_bench's child — same session build, same JVM
warm-up, same noop-sink measurement window), reporting the per-query
MEDIAN exec/build seconds.  Run it on an idle host; paste the table
into BASELINE.md.

A future round checks drift by running this again (or ab_bench against
a worktree of the recorded revision) — compare medians, not single
in-suite readings.

Usage: python tools/rebaseline.py [--runs 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import statistics
import subprocess
import sys

sys.path.insert(0, "/root/repo/tools")

from ab_bench import _run_once  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repo", default="/root/repo")
    args = ap.parse_args()

    # The query-name list must come from the SAME repo the children run
    # in (--repo may be a worktree of the recorded revision, whose
    # registry can differ from HEAD's — a HEAD-only name would KeyError
    # every child there).
    sys.path.insert(0, args.repo)
    import __spark_entry__ as entry

    names = list(entry.queries())
    samples: dict[str, dict[str, list[float]]] = {
        q: {"exec": [], "build": []} for q in names
    }
    rev = subprocess.run(
        ["git", "-C", args.repo, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    failed = 0
    for i in range(args.runs):
        try:
            got = _run_once(args.repo, names, args.sf_dir)
        except RuntimeError as exc:
            failed += 1
            print(f"run {i + 1}: FAILED — {exc}", file=sys.stderr)
            continue
        for q, t in got.items():
            samples[q]["exec"].append(t["exec"])
            samples[q]["build"].append(t["build"])
        print(f"run {i + 1}/{args.runs} done", file=sys.stderr)

    print(f"<!-- rebaseline: rev {rev}, {args.runs - failed}/{args.runs} runs, "
          f"{args.sf_dir}, median over fresh-process suite runs -->")
    print("| query | exec median s | build median s | exec runs |")
    print("|---|---|---|---|")
    tot_e = tot_b = 0.0
    for q in names:
        e, b = samples[q]["exec"], samples[q]["build"]
        if not e:
            print(f"| {q} | - | - | [] |")
            continue
        me, mb = statistics.median(e), statistics.median(b)
        tot_e += me
        tot_b += mb
        print(f"| {q} | {me:.2f} | {mb:.2f} | {[round(x, 2) for x in e]} |")
    print(f"| **suite total (medians)** | **{tot_e:.2f}** | **{tot_b:.2f}** | |")
    if failed:
        print(f"WARNING: {failed} failed run(s)", file=sys.stderr)
    if failed == args.runs:
        # No data at all — don't let a scripted `rebaseline.py > t.md`
        # land an all-dashes table as a "baseline".
        sys.exit(1)


if __name__ == "__main__":
    main()
