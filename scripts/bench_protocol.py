"""Run the round perf protocol (PLANS.md "Round-8 perf protocol"): N full
exclusive bench.py runs, per-query medians, per-run totals, and
like-for-like shared-subset comparisons against prior driver artifacts.

    python scripts/bench_protocol.py [N] [BENCH_r06.json BENCH_r07.json ...]

Prints a report; never composites minima across runs. Run it EXCLUSIVELY
(nothing else on the box) — that is part of the protocol, not a
nice-to-have.
"""

from __future__ import annotations

import json
import os
import statistics as st
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_artifact(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d["parsed"] if "parsed" in d else d


def main() -> int:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 3
    priors = [a for a in args if not a.isdigit()]
    runs = []
    for i in range(n):
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, timeout=3600)
        if out.returncode != 0:
            print(f"run {i + 1} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            return 1
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(f"run {i + 1}/{n}: total {runs[-1]['value']} s", flush=True)
        # the protocol requires the raw per-run JSONs committed — save
        # under the SPARK_BENCH_TAG prefix (default: protocol_run)
        tag = os.environ.get("SPARK_BENCH_TAG", "protocol")
        dst = os.path.join(REPO, ".bench_tmp", f"{tag}_run{i + 1}.json")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            json.dump(runs[-1], f)
    names = list(runs[0]["queries"])
    med = {q: st.median([r["queries"][q] for r in runs]) for q in names}
    print(f"\nper-run totals: {[r['value'] for r in runs]}")
    print(f"median composite: {round(sum(med.values()), 2)} s over {len(names)} queries")
    for p in priors:
        prior = _load_artifact(p)
        shared = [q for q in names if q in prior["queries"]]
        pt = sum(prior["queries"][q] for q in shared)
        mt = sum(med[q] for q in shared)
        per_run = [round(sum(r["queries"][q] for q in shared), 2) for r in runs]
        print(f"\nshared with {os.path.basename(p)} ({len(shared)} queries): "
              f"artifact {pt:.1f} s | median {mt:.1f} s | per-run {per_run}")
        moves = sorted(((med[q] - prior["queries"][q], q) for q in shared),
                       key=lambda x: x[0])
        print("  biggest improvements:")
        for d, q in moves[:5]:
            print(f"    {q}: {prior['queries'][q]:.2f} -> {med[q]:.2f}")
        regs = [(d, q) for d, q in moves if d > 0.15]
        if regs:
            print("  regressions > 0.15 s:")
            for d, q in regs:
                print(f"    {q}: {prior['queries'][q]:.2f} -> {med[q]:.2f}")
        else:
            print("  no regressions > 0.15 s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
