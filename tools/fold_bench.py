#!/usr/bin/env python3
"""Element-wise fold of N solo graft.Bench JSON lines (see bench_fold.sh).

Per-query value = min over runs (min-of-N suppresses GC/JIT/page-cache
one-offs; the sum of minima approximates a dedicated box). Stream rate =
max over runs (best sustained rate). Fails loudly if any run recorded
errors or the runs disagree on the query set — a crash or a registry
mismatch must never fold into a fast minimum.
"""
import json
import sys


def main() -> None:
    out, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append(json.load(f))
    if not runs:
        sys.exit("fold_bench: no runs")
    names = set(runs[0]["queries"])
    for i, r in enumerate(runs):
        if r.get("n_err", 0) != 0:
            sys.exit(f"fold_bench: run {run_paths[i]} has n_err={r['n_err']}")
        if set(r["queries"]) != names:
            sys.exit(f"fold_bench: run {run_paths[i]} query set differs")
    queries = {q: round(min(r["queries"][q] for r in runs), 3)
               for q in runs[0]["queries"]}  # keep registry order
    fold = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "n_ok": runs[0]["n_ok"],
        "n_err": 0,
        "stream_events_per_sec": round(
            max(r.get("stream_events_per_sec", 0.0) for r in runs), 3),
        "sf": runs[0]["sf"],
        "folds": len(runs),
        "protocol": f"element-wise minima of {len(runs)} solo runs",
    }
    with open(out, "w") as f:
        json.dump(fold, f)
        f.write("\n")


if __name__ == "__main__":
    main()
