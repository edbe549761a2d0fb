"""Shuffle-ledger diff: the OFFICIAL cross-round bench signal.

Wall-clock readings at sf0.1 span +-30% under external host load (the
r13 calibration addendum measured 7.5 -> 14.1 s on identical code),
but the per-query shuffle-write bytes are a property of the PLAN —
bit-identical across reruns and hosts (driver r12 == driver r13 ==
judge solo, diffed in VERDICT r13). So the regression gate is: any
query whose code did NOT change this round must have BYTE-IDENTICAL
shuffle writes; queries named --touched may move (and the diff prints
how much, so an intended change is still reviewed, not waved through).

Usage:
  python tools/ledger_diff.py --baseline <ref-or-file> [--touched q1,q2]

``--baseline`` is either a path to a prior BENCH_LEDGER.json or a git
rev (e.g. HEAD~1, or the last round's snapshot commit) from which
BENCH_LEDGER.json is read via ``git show``. The current ledger is the
repo-root BENCH_LEDGER.json written by the latest ``python bench.py``
run. Exit 1 on any untouched-query change (including a query appearing
in or vanishing from the headline set without being named --touched).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline(ref: str) -> dict:
    if os.path.isfile(ref):
        with open(ref) as fh:
            return json.load(fh)
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:BENCH_LEDGER.json"],
        capture_output=True,
        text=True,
    )
    if out.returncode != 0:
        sys.exit(
            f"ledger_diff: baseline '{ref}' is neither a file nor a git "
            f"rev carrying BENCH_LEDGER.json: {out.stderr.strip()}"
        )
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument(
        "--touched",
        default="",
        help="comma-separated query names whose plans intentionally "
        "changed this round (their byte moves are reported, not failed)",
    )
    args = ap.parse_args()
    touched = {q for q in args.touched.split(",") if q}

    cur_path = os.path.join(REPO, "BENCH_LEDGER.json")
    if not os.path.isfile(cur_path):
        sys.exit("ledger_diff: no BENCH_LEDGER.json — run `python bench.py` first")
    with open(cur_path) as fh:
        cur = json.load(fh)
    base = load_baseline(args.baseline)

    # shuffle_write_mb is a property of the PLAN (bit-identical across
    # reruns and hosts) and gates hard; spill_mb is a property of
    # executor MEMORY PRESSURE — the same plan can spill on a loaded
    # host and not on a quiet one — so spill differences are reported
    # as warnings, never exit-1 (r14 advisor).
    failures: list[str] = []
    moved: list[str] = []
    warnings: list[str] = []
    for metric, hard in (("shuffle_write_mb", True), ("spill_mb", False)):
        b = base.get(metric, {})
        c = cur.get(metric, {})
        for q in sorted(set(b) | set(c)):
            bv, cv = b.get(q), c.get(q)
            if bv == cv:
                continue
            line = f"{metric:>16}  {q:<28} {bv} -> {cv}"
            if q in touched:
                moved.append(line)
            elif hard:
                failures.append(line)
            else:
                warnings.append(line)

    if moved:
        print("intended moves (--touched):")
        for line in moved:
            print("  " + line)
    if warnings:
        print("spill warnings (memory-pressure metric, not gated):")
        for line in warnings:
            print("  " + line)
    if failures:
        print("UNTOUCHED-QUERY LEDGER CHANGES (plan regressions?):")
        for line in failures:
            print("  " + line)
        return 1
    n = len(cur.get("shuffle_write_mb", {}))
    print(f"ledger clean: {n} per-query shuffle entries match baseline"
          + (f" ({len(moved)} intended moves)" if moved else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
