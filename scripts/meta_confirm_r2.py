"""DR4SR+ confirmation (VERDICT r1 #2 done-criterion): MetaModel(SASRec) must
beat plain-regen SASRec on toys AND yelp, val+test.

Reads the toys meta-hyperparameter sweep (results_meta_sweep.json), picks the
winning override set on val_best, then runs that config

  * on toys at seed 7 (the sweep already has seed 2023), and
  * on yelp at seeds 2023 and 7,

via run_suite (subprocess isolation, sequential TPU jobs). The plain-regen
comparison band at the same seeds comes from the round-2 confirmation suite
(results_confirm_r2.json), which runs earlier in the queue.

  python scripts/meta_confirm_r2.py [--out results_meta_confirm.json]
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def winner_overrides(path):
    """Best toys meta trial on val_best -> its override string (incl.
    model.sub_model=SASRec), with any train.seed stripped."""
    with open(path) as f:
        res = json.load(f)
    best_key, best_val = None, -1.0
    for key, rec in res.items():
        m = rec.get("metrics")
        if not m:
            continue
        if m.get("val_best", -1) > best_val:
            best_key, best_val = key, m["val_best"]
    if best_key is None:
        return None, None
    ov = (re.search(r"\[(.*)\]$", best_key) or [None, ""])[1]
    ov = ",".join(o for o in ov.split(",") if o and not o.startswith("train.seed"))
    return ov, best_val


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", default="results_meta_sweep.json")
    p.add_argument("--out", default="results_meta_confirm.json")
    p.add_argument("--timeout", type=int, default=2700)
    p.add_argument("--yelp_seeds", default="2023,7",
                   help="comma list; trim to '2023' when the round clock is "
                        "tight (the seed-7 arm re-runs cached later)")
    args = p.parse_args()

    ov, val = winner_overrides(os.path.join(REPO, args.sweep))
    if ov is None:
        print("!! no completed meta-sweep trials; aborting", flush=True)
        return 1
    print(f"meta winner (toys val {val:.4f}): {ov}", flush=True)

    jobs = [f"MetaModel:amazon-toys:_regen:{ov},train.seed=7"]
    for s in args.yelp_seeds.split(","):
        s = s.strip()
        seed_ov = "" if s == "2023" else f",train.seed={s}"
        jobs.append(f"MetaModel:yelp:_regen:{ov}{seed_ov}")
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "run_suite.py"),
         "--out", args.out, "--timeout", str(args.timeout),
         "--jobs"] + jobs, cwd=REPO)
    print(f"META_CONFIRM_DONE rc={rc}", flush=True)
    summarize(args.sweep, args.out, ov)
    return rc


def summarize(sweep_path, confirm_path, winner_ov):
    """Seed-paired MetaModel (DR4SR+) vs plain-regen SASRec (DR4SR) table,
    written to RESULTS_R2_META_CONFIRM.md. Plain-regen band comes from the
    round-2 confirmation suite at the same seeds."""
    def load(p):
        p = os.path.join(REPO, p)
        return json.load(open(p)) if os.path.exists(p) else {}

    meta = {}  # (dataset, seed) -> test ndcg@20
    for src in (load(sweep_path), load(confirm_path)):
        for key, rec in src.items():
            m = re.match(r"MetaModel/([\w-]+?)_regen\[(.*)\]$", key)
            if not m or "metrics" not in rec:
                continue
            ov = m.group(2)
            sd = re.search(r"train\.seed=(\d+)", ov)
            seed = int(sd.group(1)) if sd else 2023
            base_ov = ",".join(o for o in ov.split(",")
                               if not o.startswith("train.seed"))
            if base_ov != winner_ov:
                continue
            meta[(m.group(1), seed)] = rec["metrics"].get("ndcg@20")

    plain = {}
    for key, rec in load("results_confirm_r2.json").items():
        m = re.match(r"SASRec/([\w-]+?)_regen\[train\.seed=(\d+)\]$", key)
        if m and "metrics" in rec:
            plain[(m.group(1), int(m.group(2)))] = rec["metrics"].get("ndcg@20")

    lines = [
        "# DR4SR+ vs DR4SR (SASRec backbone, test NDCG@20)\n",
        f"MetaModel winner config (toys val selection): `{winner_ov}`",
        "Plain-regen arm: round-2 confirmation suite, same seeds/protocol.\n",
        "| dataset | seed | plain regen | MetaModel | Δ |",
        "|---|---|---|---|---|",
    ]
    wins = total = 0
    for (ds, seed) in sorted(meta):
        mm, pl = meta[(ds, seed)], plain.get((ds, seed))
        if mm is None or pl is None:
            lines.append(f"| {ds} | {seed} | {pl} | {mm} | (incomplete) |")
            continue
        total += 1
        wins += mm > pl
        lines.append(f"| {ds} | {seed} | {pl:.4f} | {mm:.4f} | {mm - pl:+.4f} |")
    lines.append(f"\nMetaModel wins {wins}/{total} seed-paired comparisons.")
    out = os.path.join(REPO, "RESULTS_R2_META_CONFIRM.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    sys.exit(main())
