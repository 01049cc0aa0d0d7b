"""Round-3 evidence matrix (VERDICT r2 next-#1/#3/#4): one protocol, one
results file, every headline claim seed-paired.

Round 3 restored the reference's '>=' early-stop semantics (ADVICE r2), so
every arm is re-run under the restored protocol rather than mixing with
round-2 numbers. Stages, in priority order (all resumable via run_suite's
key cache in --out):

  1. DR4SR core: base + per-dataset-winner regen, 4 datasets x seeds {2023,7}
  2. DR4SR+ : MetaModel with per-dataset val-selected meta-hyperparams
     (toys/sport/beauty: sum-scale + interval10/warmup5 at reference tau;
     yelp: tau-sharp — tau_init=1, meta/hpo lr 0.01), same datasets/seeds
  3. beauty + sport extra seeds {42, 2024} for base/regen (paired CI,
     VERDICT #3: >=4 seeds to call ceiling-vs-regression)
  4. per-backbone DR4SR (paper Table 2): FMLP / CL4SRec / GRU4Rec,
     base vs regen on toys + yelp, seeds {2023, 7}
  5. sport MetaModel extra seeds (its margin sits inside seed noise)

  python scripts/r3_matrix.py [--stages 1,2,3,4,5] [--out results_r3_matrix.json]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-dataset regen winner train file (round-2 sweeps, val-selected)
REGEN_FILE = {
    "amazon-toys": "_regen",
    "yelp": "_regen",
    "amazon-sport": "_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3",
    "amazon-beauty": "_sw_ewm1p0_g0p0_both_a5b2K5_or2_ml3",
}

# per-dataset val-selected meta-hyperparams (RESULTS.md round-2 selection)
META_OV = {
    "amazon-toys": "model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5",
    "amazon-sport": "model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5",
    "amazon-beauty": "model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5",
    "yelp": ("model.sub_model=SASRec,train.interval=10,train.warmup_epoch=5,"
             "model.tau_init=1.0,train.meta_learning_rate=0.01,"
             "train.hpo_learning_rate=0.01"),
}

DATASETS = ["amazon-toys", "yelp", "amazon-sport", "amazon-beauty"]
CORE_SEEDS = [2023, 7]
EXTRA_SEEDS = [42, 2024]
BACKBONES = ["FMLP", "CL4SRec", "GRU4Rec"]


def seed_ov(seed):
    return f"train.seed={seed}"


def stage_jobs(stage):
    jobs = []
    if stage == 1:
        for ds in DATASETS:
            for s in CORE_SEEDS:
                jobs.append(f"SASRec:{ds}::{seed_ov(s)}")
                jobs.append(f"SASRec:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 2:
        for ds in DATASETS:
            for s in CORE_SEEDS:
                jobs.append(
                    f"MetaModel:{ds}:{REGEN_FILE[ds]}:{META_OV[ds]},{seed_ov(s)}"
                )
    elif stage == 3:
        for ds in ("amazon-beauty", "amazon-sport"):
            for s in EXTRA_SEEDS:
                jobs.append(f"SASRec:{ds}::{seed_ov(s)}")
                jobs.append(f"SASRec:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 4:
        # seed-2023 rows for every backbone/dataset first: if the round ends
        # mid-stage, truncation costs seed REPLICATES, not paired coverage
        for s in CORE_SEEDS:
            for ds in ("amazon-toys", "yelp"):
                for bb in BACKBONES:
                    jobs.append(f"{bb}:{ds}::{seed_ov(s)}")
                    jobs.append(f"{bb}:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 6:
        # GNN completes the paper-Table-2 backbone set (VERDICT r2 asked for
        # FMLP/CL4SRec/GRU4Rec; the paper's claim also covers GNN)
        for ds in ("amazon-toys", "yelp"):
            for s in CORE_SEEDS:
                jobs.append(f"GNN:{ds}::{seed_ov(s)}")
                jobs.append(f"GNN:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 7:
        # round-4: backbone rows on the two sweep-arm datasets (VERDICT r3
        # missing-#1 asked for "at least one backbone row each on beauty and
        # sport"). Seed 2023 first — wall-clock budget; stage 9 adds the
        # seed-7 pairs when time allows.
        for ds in ("amazon-sport", "amazon-beauty"):
            for bb in BACKBONES:
                jobs.append(f"{bb}:{ds}::{seed_ov(2023)}")
                jobs.append(f"{bb}:{ds}:{REGEN_FILE[ds]}:{seed_ov(2023)}")
    elif stage == 9:
        for ds in ("amazon-sport", "amazon-beauty"):
            for bb in BACKBONES:
                jobs.append(f"{bb}:{ds}::{seed_ov(7)}")
                jobs.append(f"{bb}:{ds}:{REGEN_FILE[ds]}:{seed_ov(7)}")
    elif stage == 8:
        # round-4: 3rd seed for the two contested n=2 backbone cells
        # (FMLP/toys negative at both seeds, CL4SRec/yelp sign-flips)
        for bb, ds in (("FMLP", "amazon-toys"), ("CL4SRec", "yelp")):
            jobs.append(f"{bb}:{ds}::{seed_ov(42)}")
            jobs.append(f"{bb}:{ds}:{REGEN_FILE[ds]}:{seed_ov(42)}")
    elif stage == 10:
        # round-5: GNN rows on sport/beauty (VERDICT r4 missing-#1 — the
        # Table-2 matrix had no GNN cells on these two datasets at all)
        for ds in ("amazon-sport", "amazon-beauty"):
            for s in CORE_SEEDS:
                jobs.append(f"GNN:{ds}::{seed_ov(s)}")
                jobs.append(f"GNN:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 11:
        # round-5: GNN on the r4 val-selected swept arms for toys/yelp —
        # the builder's stated follow-up for the GNN-negative result
        # (plain _regen hurt GNN on toys/yelp; do the winner arms too?)
        for ds in ("amazon-toys", "yelp"):
            for s in CORE_SEEDS:
                jobs.append(
                    f"GNN:{ds}:_sw_ew1p0_g0p0_both_a5b2K5_or2_ml3:{seed_ov(s)}"
                )
    elif stage == 13:
        # round-5: toys/yelp base/regen extra seeds so the DR4SR core table
        # is n=4 on ALL datasets (sport/beauty got theirs in stage 3)
        for ds in ("amazon-toys", "yelp"):
            for s in EXTRA_SEEDS:
                jobs.append(f"SASRec:{ds}::{seed_ov(s)}")
                jobs.append(f"SASRec:{ds}:{REGEN_FILE[ds]}:{seed_ov(s)}")
    elif stage == 12:
        # round-5: third seed for the remaining DR4SR+ rows (sport gets its
        # extras from stage 5) so every DR4SR+ cell is n>=3 — the yelp meta
        # row in particular sits inside seed noise (VERDICT r4 weak-#4)
        for ds in ("amazon-toys", "yelp", "amazon-beauty"):
            jobs.append(
                f"MetaModel:{ds}:{REGEN_FILE[ds]}:{META_OV[ds]},{seed_ov(42)}"
            )
    elif stage == 5:
        for s in EXTRA_SEEDS:
            jobs.append(
                f"MetaModel:amazon-sport:{REGEN_FILE['amazon-sport']}:"
                f"{META_OV['amazon-sport']},{seed_ov(s)}"
            )
        # the round-2 meta-sweep seed-17 replicate died in the axon outage
        # and was left unmeasured (VERDICT r2 weak-#2/hygiene-#8)
        jobs.append(
            f"MetaModel:amazon-toys:_regen:{META_OV['amazon-toys']},"
            f"{seed_ov(17)}"
        )
    return jobs


# MetaModel bilevel runs are ~5-10x a plain run; beauty is the biggest
STAGE_TIMEOUT = {1: 2700, 2: 5400, 3: 2700, 4: 2700, 5: 5400, 6: 2700,
                 7: 2700, 8: 2700, 9: 2700, 10: 2700, 11: 2700, 12: 5400,
                 13: 2700}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="1,2,3,4,5")
    p.add_argument("--out", default="results_r3_matrix.json")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--chunk", type=int, default=4,
                   help="same-dataset jobs per TPU client (run_suite --chunk)")
    args = p.parse_args()

    for stage in [int(s) for s in args.stages.split(",")]:
        jobs = stage_jobs(stage)
        if not jobs:
            continue
        print(f"##### stage {stage}: {len(jobs)} jobs "
              f"(timeout {STAGE_TIMEOUT[stage]}s each)", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "scripts", "run_suite.py"),
             "--out", args.out, "--epochs", str(args.epochs),
             "--timeout", str(STAGE_TIMEOUT[stage]),
             "--chunk", str(args.chunk), "--jobs"] + jobs,
            cwd=REPO,
        )
        print(f"##### stage {stage} done rc={rc}", flush=True)
    print("R3_MATRIX_DONE", flush=True)


if __name__ == "__main__":
    main()
