"""Interleaved A/B of two repo checkouts' bench.py (CLAUDE.md protocol).

Bench wall-clock swings +/-25% with machine load, so a regression claim
needs back-to-back interleaved runs, not two numbers from different hours.
Usage:  python tools/ab_bench.py /root/repo /tmp/ab_r4 [n_pairs]

Each iteration runs A's bench.py then B's (fresh processes, same env),
alternating, and reports per-side best/median of the headline total plus
the per-query deltas of the best runs.  Exit 0 always — this is a
measurement tool, not a gate.
"""

from __future__ import annotations

import json
import re
import statistics
import subprocess
import sys


def run_bench(repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = None
    for ln in out.stdout.splitlines():
        if ln.startswith("{") and '"metric"' in ln:
            line = ln
    if line is None:
        raise RuntimeError(f"no JSON line from {repo}: {out.stdout[-500:]}\n{out.stderr[-500:]}")
    return json.loads(line)


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results: dict[str, list[dict]] = {"A": [], "B": []}
    for i in range(n):
        for side, repo in (("A", a), ("B", b)):
            r = run_bench(repo)
            results[side].append(r)
            print(
                f"pair {i + 1}/{n} side {side} ({repo}): "
                f"best={r['value']:.2f}s median={r.get('value_median', r['value']):.2f}s",
                flush=True,
            )
    summary = {}
    for side in ("A", "B"):
        bests = [r["value"] for r in results[side]]
        medians = [r.get("value_median", r["value"]) for r in results[side]]
        summary[side] = {
            "repo": a if side == "A" else b,
            "best_of_bests": min(bests),
            "median_of_medians": statistics.median(medians),
            "bests": [round(x, 3) for x in bests],
        }
    best_a = min(results["A"], key=lambda r: r["value"])
    best_b = min(results["B"], key=lambda r: r["value"])
    shared = sorted(set(best_a["queries"]) & set(best_b["queries"]))
    deltas = {
        q: round(best_a["queries"][q] - best_b["queries"][q], 3) for q in shared
    }
    summary["per_query_delta_A_minus_B_best"] = dict(
        sorted(deltas.items(), key=lambda kv: -abs(kv[1]))
    )
    only_a = sorted(set(best_a["queries"]) - set(best_b["queries"]))
    if only_a:
        summary["queries_only_in_A"] = {
            q: best_a["queries"][q] for q in only_a
        }
        summary["A_total_on_shared_set"] = round(
            sum(best_a["queries"][q] for q in shared), 3
        )
        summary["B_total_on_shared_set"] = round(
            sum(best_b["queries"][q] for q in shared), 3
        )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
