"""Summarize the round-2 confirmation suite (results_confirm_r2.json) as a
seed-paired base-vs-regen markdown table per dataset.

run_suite keys look like ``SASRec/<dataset>_base[train.seed=S]`` (base arm) and
``SASRec/<dataset>_sw_<trial>[train.seed=S]`` / ``..._regen[...]`` (regen arm).
Pairs are matched on (dataset, seed); the paired delta and per-seed win count
are the headline numbers (VERDICT r1 #1 done-criterion).

  python scripts/summarize_confirm.py [results_confirm_r2.json] > RESULTS_R2_CONFIRM.md
"""

import json
import re
import statistics
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "results_confirm_r2.json"
    with open(path) as f:
        res = json.load(f)

    # (dataset, seed) -> {"base": n20, "regen": n20, "regen_file": suffix}
    pairs = {}
    for key, rec in res.items():
        m = re.match(r"SASRec/([\w-]+?)(_base|_regen|_sw_\S+?)\[train\.seed=(\d+)\]$", key)
        if not m or "metrics" not in rec:
            continue
        ds, arm, seed = m.group(1), m.group(2), int(m.group(3))
        slot = pairs.setdefault((ds, seed), {})
        n20 = rec["metrics"].get("ndcg@20")
        if arm == "_base":
            slot["base"] = n20
        else:
            slot["regen"] = n20
            slot["regen_file"] = arm

    datasets = sorted({ds for ds, _ in pairs})
    print("# Round-2 confirmation: seed-paired base vs regenerated (SASRec, test NDCG@20)\n")
    print("One protocol for every arm: strict-improvement early stop, patience 20,")
    print("selection on validation; regen arm = the per-dataset sweep winner on val.\n")
    for ds in datasets:
        seeds = sorted(s for d, s in pairs if d == ds)
        complete = [s for s in seeds if {"base", "regen"} <= pairs[(ds, s)].keys()]
        rf = next((pairs[(ds, s)].get("regen_file") for s in seeds
                   if pairs[(ds, s)].get("regen_file")), "?")
        print(f"## {ds}  (regen arm: `{rf}`)\n")
        print("| seed | base | regen | Δ |")
        print("|---|---|---|---|")
        deltas = []
        for s in seeds:
            b = pairs[(ds, s)].get("base")
            r = pairs[(ds, s)].get("regen")
            d = (r - b) if (b is not None and r is not None) else None
            if d is not None:
                deltas.append(d)
            fmtv = lambda x: f"{x:.4f}" if x is not None else "—"
            print(f"| {s} | {fmtv(b)} | {fmtv(r)} | "
                  f"{f'{d:+.4f}' if d is not None else '—'} |")
        if deltas:
            wins = sum(d > 0 for d in deltas)
            mu = statistics.mean(deltas)
            sd = statistics.stdev(deltas) if len(deltas) > 1 else 0.0
            rel = mu / statistics.mean(
                [pairs[(ds, s)]["base"] for s in complete]) * 100
            print(f"\npaired Δ = {mu:+.4f} ± {sd:.4f} ({rel:+.1f}%), "
                  f"regen wins {wins}/{len(deltas)} seeds\n")
        else:
            print("\n(no complete pairs yet)\n")


if __name__ == "__main__":
    main()
