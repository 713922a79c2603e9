#!/usr/bin/env python3
"""Interleaved two-HEAD bench adjudicator (round-15 ask #1b).

The r14 record published common-93 at +29% vs r13 and only a judge-run
A/B — rebuild the r13 HEAD, re-run the identical harness on the same
machine minutes apart — could prove the code flat (+1.2%): the machine
itself had drifted ~22% between the two rounds' records. This tool puts
that adjudication in the protocol: when a round's common-N drifts >10%
from the rolling record, run

    python3 tools/bench_ab.py <baseline-ref> [--sf /root/testdata/sf0.1]
                              [--reps 2] [--cpus 32]

and it will
  1. check the baseline ref out into a git worktree (its own target/),
  2. build both HEADs,
  3. run the two Bench harnesses INTERLEAVED (A B B A ... — the
     mirrored order cancels slow monotonic machine drift within the
     session, the interleaving cancels fast drift),
  4. compare the per-side medians over the COMMON query set (q* keys
     present and >= 0 on both sides — new/renamed queries drop out),
  5. normalize by the calibration probes when both sides publish them
     (HEADs >= r15 carry "calib" in every record; for older baselines
     the interleaving itself is the control), and
  6. print a verdict: CODE-FLAT (common-N ratio within the noise band
     after calibration) or CODE-REGRESSION (the delta survives the
     machine control).

Exit code 0 = flat, 2 = regression (|delta| > --flat-band after
normalization), 1 = usage/infra error. The verdict JSON goes to stdout
(last line) for the round notes.
"""
import argparse
import json
import os
import re
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd, env=None, capture=False):
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=cwd, env=e,
                       stdout=subprocess.PIPE if capture else None,
                       stderr=subprocess.STDOUT if capture else None,
                       text=True)
    if r.returncode != 0:
        out = (r.stdout or "")[-4000:] if capture else ""
        raise RuntimeError(f"command failed ({r.returncode}): {' '.join(cmd)}\n{out}")
    return r.stdout if capture else None


def bench_once(workdir, sf_dir, cpus):
    """One Bench run; returns the parsed detail JSON (first metric line)."""
    out = run(["sbt", "-batch", "runMain graft.Bench"], cwd=workdir,
              env={"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": str(cpus)},
              capture=True)
    for line in out.splitlines():
        line = line.strip()
        # forked run output is prefixed "[info] " by sbt
        m = re.search(r'(\{"metric".*\})\s*$', line)
        if m:
            return json.loads(m.group(1))
    raise RuntimeError(f"no metric line in Bench output from {workdir}:\n{out[-3000:]}")


def common_total(runs_a, runs_b):
    """Median per-side sum over the query keys valid in EVERY run."""
    def qkeys(r):
        return {k for k, v in r["queries"].items()
                if k.startswith("q") and isinstance(v, (int, float)) and v >= 0}
    common = set.intersection(*(qkeys(r) for r in runs_a + runs_b))
    sums_a = [sum(r["queries"][k] for k in common) for r in runs_a]
    sums_b = [sum(r["queries"][k] for k in common) for r in runs_b]
    return sorted(common), statistics.median(sums_a), statistics.median(sums_b), sums_a, sums_b


def calib_of(runs):
    """Median of each calib key across a side's runs ({} pre-r15)."""
    keys = set()
    for r in runs:
        keys |= set(r.get("calib", {}).keys())
    return {k: statistics.median([r["calib"][k] for r in runs if k in r.get("calib", {})])
            for k in sorted(keys)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline", help="git ref of the previous round's HEAD")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2, help="runs per side")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--flat-band", type=float, default=0.05,
                    help="|normalized delta| below this = code flat")
    ap.add_argument("--keep-worktree", action="store_true")
    args = ap.parse_args()

    wt = os.path.join("/tmp", f"bench_ab_{re.sub(r'[^A-Za-z0-9._-]', '_', args.baseline)}")
    if os.path.exists(wt):
        run(["git", "worktree", "remove", "--force", wt], cwd=REPO)
    run(["git", "worktree", "add", "--detach", wt, args.baseline], cwd=REPO)
    try:
        print(f"[bench_ab] building HEAD ({REPO}) and baseline {args.baseline} ({wt})",
              flush=True)
        run(["sbt", "-batch", "compile"], cwd=REPO, capture=True)
        run(["sbt", "-batch", "compile"], cwd=wt, capture=True)

        runs_a, runs_b = [], []  # a = HEAD, b = baseline
        # mirrored interleave: A B B A A B B A ... cancels linear drift
        order = []
        for i in range(args.reps):
            order += (["a", "b"] if i % 2 == 0 else ["b", "a"])
        for side in order:
            workdir = REPO if side == "a" else wt
            print(f"[bench_ab] running Bench in {'HEAD' if side == 'a' else 'baseline'}",
                  flush=True)
            r = bench_once(workdir, args.sf, args.cpus)
            (runs_a if side == "a" else runs_b).append(r)

        common, med_a, med_b, sums_a, sums_b = common_total(runs_a, runs_b)
        raw_delta = (med_a - med_b) / med_b if med_b > 0 else float("nan")
        cal_a, cal_b = calib_of(runs_a), calib_of(runs_b)
        # normalize by the spark-machinery probe when both sides carry it
        # (same machine + interleave means the ratio should be ~1; a
        # ratio far from 1 would itself flag an asymmetric environment)
        norm = 1.0
        if "spark_agg10m" in cal_a and "spark_agg10m" in cal_b and cal_b["spark_agg10m"] > 0:
            norm = cal_a["spark_agg10m"] / cal_b["spark_agg10m"]
        norm_delta = (med_a / norm - med_b) / med_b if med_b > 0 else float("nan")
        # sign matters: a HEAD that got FASTER than the baseline is an
        # improvement, not a regression — only a positive delta beyond
        # the band fails the gate. A NaN delta (broken/zero baseline
        # walls) is an invalid measurement, never a pass.
        import math
        verdict = ("CODE-INVALID" if math.isnan(norm_delta)
                   else "CODE-FLAT" if abs(norm_delta) <= args.flat_band
                   else "CODE-REGRESSION" if norm_delta > 0
                   else "CODE-IMPROVEMENT")
        result = {
            "baseline_ref": args.baseline,
            "sf": args.sf,
            "common_n": len(common),
            "head_common_sec": round(med_a, 3),
            "baseline_common_sec": round(med_b, 3),
            "head_runs_sec": [round(s, 3) for s in sums_a],
            "baseline_runs_sec": [round(s, 3) for s in sums_b],
            "raw_delta_pct": round(100 * raw_delta, 2),
            "calib_head": cal_a,
            "calib_baseline": cal_b,
            "calib_norm_ratio": round(norm, 4),
            "normalized_delta_pct": round(100 * norm_delta, 2),
            "verdict": verdict,
        }
        print(json.dumps(result))
        return 2 if verdict in ("CODE-REGRESSION", "CODE-INVALID") else 0
    finally:
        if not args.keep_worktree:
            run(["git", "worktree", "remove", "--force", wt], cwd=REPO)


if __name__ == "__main__":
    sys.exit(main())
