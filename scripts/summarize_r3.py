"""Summarize the round-3 evidence matrix into RESULTS_R3.md.

Produces, from results_r3_matrix.json (all arms under the restored '>='
early-stop protocol):
  * DR4SR: seed-paired base vs per-dataset regen winner, with paired Δ and
    (for >=4 seeds) a t-based 95% CI — the beauty ceiling-vs-regression call
    (VERDICT r2 next-#3);
  * DR4SR+: seed-paired plain-regen vs MetaModel with per-dataset
    meta-hyperparams (next-#1);
  * per-backbone DR4SR: base vs regen for FMLP/CL4SRec/GRU4Rec (next-#4).

  python scripts/summarize_r3.py [--results results_r3_matrix.json]
"""

import argparse
import json
import math
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# two-sided 95% t quantiles by degrees of freedom
T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447, 7: 2.365}


def load(path):
    with open(path) as f:
        return json.load(f)


def parse_key(key):
    """'Model/dataset<file>[ov1,ov2,...]' -> (model, dataset, file, seed, ov)."""
    m = re.match(r"^(\w+)/([\w-]+?)(_[\w]+|_base)\[(.*)\]$", key)
    if not m:
        return None
    model, ds, tf, ov = m.groups()
    sd = re.search(r"train\.seed=(\d+)", ov)
    seed = int(sd.group(1)) if sd else 2023
    base_ov = ",".join(o for o in ov.split(",") if not o.startswith("train.seed"))
    return model, ds, tf, seed, base_ov


def cell(results, model, ds, tf, seed, ov="", metric="ndcg@20"):
    for key, rec in results.items():
        p = parse_key(key)
        if p and p[:4] == (model, ds, tf, seed) and p[4] == ov:
            if "metrics" in rec:
                return rec["metrics"].get(metric), rec["metrics"].get("val_best")
            return None, None
    return None, None


def paired_stats(deltas):
    n = len(deltas)
    mean = sum(deltas) / n
    if n < 2:
        return mean, None, None
    sd = math.sqrt(sum((d - mean) ** 2 for d in deltas) / (n - 1))
    half = T95.get(n - 1, 1.96) * sd / math.sqrt(n)
    return mean, sd, half


def fmt(x, nd=4):
    return "—" if x is None else f"{x:.{nd}f}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="results_r3_matrix.json")
    p.add_argument("--out", default="RESULTS_R3.md")
    p.add_argument("--metric", default="ndcg@20")
    args = p.parse_args()

    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from r3_matrix import META_OV, REGEN_FILE

    res = load(os.path.join(REPO, args.results))
    L = ["# Round-3 evidence matrix (restored '>=' early-stop protocol, "
         f"test {args.metric})\n"]

    # ---------------- DR4SR: base vs regen, SASRec ----------------
    L += ["## DR4SR: seed-paired base vs regen (SASRec)\n",
          "| dataset | seed | base | regen | Δ |", "|---|---|---|---|---|"]
    for ds, tf in REGEN_FILE.items():
        deltas = []
        for seed in (2023, 7, 42, 2024):
            b, _ = cell(res, "SASRec", ds, "_base", seed)
            r, _ = cell(res, "SASRec", ds, tf, seed)
            if b is None and r is None:
                continue
            d = None if (b is None or r is None) else r - b
            if d is not None:
                deltas.append(d)
            L.append(f"| {ds} | {seed} | {fmt(b)} | {fmt(r)} | "
                     f"{'—' if d is None else f'{d:+.4f}'} |")
        if deltas:
            mean, sd, half = paired_stats(deltas)
            ci = (f" (95% CI ±{half:.4f} → "
                  f"{'excludes' if half is not None and abs(mean) > half else 'includes'} 0)"
                  if half is not None else "")
            L.append(f"| {ds} | **mean** |  |  | **{mean:+.4f}**{ci} |")
    L.append("")

    # ---------------- DR4SR+: plain regen vs MetaModel ----------------
    # success criterion (VERDICT r2 next-#1): DR4SR+ >= DR4SR on VAL
    # everywhere, seed-paired TEST wins on >=3/4 datasets — so both the
    # val ordering and the test delta are reported per cell
    L += ["## DR4SR+: seed-paired plain regen vs MetaModel "
          "(per-dataset val-selected meta-hyperparams)\n",
          "| dataset | seed | regen val | DR4SR+ val | regen test | "
          "DR4SR+ test | Δtest |", "|---|---|---|---|---|---|---|"]
    wins = total = val_wins = val_total = 0
    gated_wins = gated_losses = gated_total = 0
    gated_delta_sum = 0.0
    for ds, tf in REGEN_FILE.items():
        for seed in (2023, 7, 42, 2024, 17):
            r, rv = cell(res, "SASRec", ds, tf, seed)
            m, mv = cell(res, "MetaModel", ds, tf, seed, ov=META_OV[ds])
            if m is None and mv is None:
                continue
            d = None if (r is None or m is None) else m - r
            if d is not None:
                total += 1
                wins += d > 0
            if rv is not None and mv is not None:
                val_total += 1
                val_wins += mv >= rv
                if d is not None:
                    # val-gated deployment: use meta only where its val >=
                    # regen's val, else keep regen (delta 0 for that cell)
                    gated_total += 1
                    gd = d if mv >= rv else 0.0
                    gated_delta_sum += gd
                    gated_wins += gd > 0
                    gated_losses += gd < 0
            L.append(f"| {ds} | {seed} | {fmt(rv)} | {fmt(mv)} | {fmt(r)} | "
                     f"{fmt(m)} | {'—' if d is None else f'{d:+.4f}'} |")
    if gated_total:
        L.append(
            f"\n**Val-gated deployment** (deploy DR4SR+ only where meta-val >= "
            f"regen-val, else keep regen — the criterion a practitioner can "
            f"actually apply): improves **{gated_wins}/{gated_total}** cells, "
            f"regresses **{gated_losses}/{gated_total}**, mean test Δ "
            f"**{gated_delta_sum / gated_total:+.4f}**.")
    L.append(f"\nUngated: DR4SR+ wins **{wins}/{total}** seed-paired test "
             f"cells; val ordering DR4SR+ >= regen holds in "
             f"**{val_wins}/{val_total}** cells.\n")

    # ---------------- per-backbone ----------------
    L += ["## Per-backbone DR4SR (paper Table 2 claim)\n",
          "| backbone | dataset | seed | base | regen | Δ |",
          "|---|---|---|---|---|---|"]
    for bb in ("FMLP", "CL4SRec", "GRU4Rec", "GNN"):
        for ds in ("amazon-toys", "yelp", "amazon-sport", "amazon-beauty"):
            deltas = []
            for seed in (2023, 7, 42):
                b, _ = cell(res, bb, ds, "_base", seed)
                r, _ = cell(res, bb, ds, REGEN_FILE[ds], seed)
                if b is None and r is None:
                    continue
                d = None if (b is None or r is None) else r - b
                if d is not None:
                    deltas.append(d)
                L.append(f"| {bb} | {ds} | {seed} | {fmt(b)} | {fmt(r)} | "
                         f"{'—' if d is None else f'{d:+.4f}'} |")
            if deltas:
                mean, _, _ = paired_stats(deltas)
                L.append(f"| {bb} | {ds} | **mean** |  |  | **{mean:+.4f}** |")

    # ------- GNN on the r4 val-selected swept arms (round-5 stage 11) -------
    # follow-up to the GNN-negative result: plain _regen hurt GNN on
    # toys/yelp in r3/r4; does the sweep-winning mixture (or2+ml3 rebalance)
    # behave differently?
    arm = "_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3"
    rows = []
    for ds in ("amazon-toys", "yelp"):
        for seed in (2023, 7):
            b, _ = cell(res, "GNN", ds, "_base", seed)
            r, _ = cell(res, "GNN", ds, "_regen", seed)
            a, _ = cell(res, "GNN", ds, arm, seed)
            if a is None:
                continue
            d = None if b is None else a - b
            rows.append(f"| {ds} | {seed} | {fmt(b)} | {fmt(r)} | {fmt(a)} | "
                        f"{'—' if d is None else f'{d:+.4f}'} |")
    if rows:
        L += ["\n## GNN × r4 swept arms (round-5 stage 11)\n",
              "| dataset | seed | base | plain regen | swept arm | "
              "Δ(arm−base) |", "|---|---|---|---|---|---|"] + rows

    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        f.write("\n".join(L) + "\n")
    print(f"wrote {out_path}")
    print("\n".join(L))


if __name__ == "__main__":
    main()
