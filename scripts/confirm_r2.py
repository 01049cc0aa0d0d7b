"""Round-2 confirmation suite: seed-paired base-vs-regen runs for all four
datasets under ONE protocol (patience 20; NOTE: the round-2 runs used a
strict '>' improvement rule that DEVIATES from the reference's '>='
(utils/callbacks.py:98,106) — both arms ran under the same rule, so the
paired deltas stand, but absolute numbers used a stricter selection than the
reference. The '>=' semantics were restored in round 3; ADVICE r2).

Reads the phase-1 sweep results, picks the best trial per dataset on
``val_best``, copies its regenerated train file out of the sweep snapshot,
then runs base and regen arms at matched seeds via run_suite (subprocess
isolation per job).

  python scripts/confirm_r2.py [--snapshot /tmp/sweep_r2_snapshot]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_trial(path):
    """Winner on validation. Trials re-run at extra seeds carry an ``_s<seed>``
    suffix and share the seedless trial's train file; selection uses the MEAN
    val_best across seeds (seed noise ~±0.0005 exceeds the gaps between top
    candidates, so single-seed argmax is a coin flip)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        res = json.load(f)
    done = {k: v for k, v in res.items() if "metrics" in v}
    if not done:
        return None
    import re as _re

    groups = {}
    for k, v in done.items():
        base = _re.sub(r"_s\d+$", "", k)
        groups.setdefault(base, []).append(v)
    def mean_val(recs):
        vals = [r["metrics"].get("val_best", -1) for r in recs]
        return sum(vals) / len(vals)
    name = max(groups, key=lambda k: mean_val(groups[k]))
    rec = max(groups[name], key=lambda r: r["metrics"].get("val_best", -1))
    print(f"  (selection: {len(groups[name])}-seed mean val "
          f"{mean_val(groups[name]):.4f} for {name})", flush=True)
    return name, rec


def domain_of(dataset):
    with open(os.path.join(REPO, "configs", f"{dataset}.yaml")) as f:
        return yaml.safe_load(f)["domain_name_list"][0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", default="/tmp/sweep_r2_snapshot")
    p.add_argument("--out", default="results_confirm_r2.json")
    p.add_argument("--timeout", type=int, default=2700)
    args = p.parse_args()

    # (dataset, regen-train-file suffix) arms. beauty/sport use their sweep
    # winner on val_best; toys/yelp the default-pipeline train_regen.npz
    # (ew already per-dataset, round-1 winners re-measured under the new
    # strict-improvement protocol).
    arms = []
    for ds, resfile in (("amazon-beauty", "results_sweep_beauty.json"),
                        ("amazon-sport", "results_sweep_sport.json")):
        best = best_trial(os.path.join(REPO, resfile))
        if best is None:
            print(f"!! no sweep results for {ds}, skipping", flush=True)
            continue
        name, rec = best
        print(f"{ds} winner: {name} -> {rec['metrics'].get('val_best')}", flush=True)
        dom = domain_of(ds)
        src = os.path.join(args.snapshot, "dataset", ds, dom,
                           f"train_sw_{name}.npz")
        dst = os.path.join(REPO, "dataset", ds, dom, f"train_sw_{name}.npz")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
        if not os.path.exists(dst):
            print(f"!! winning train file missing for {ds}: {src}", flush=True)
            continue
        arms.append((ds, f"_sw_{name}"))
    arms += [("amazon-toys", "_regen"), ("yelp", "_regen")]

    # seed-major, base/regen adjacent: partial completion (if the round's
    # wall clock ends mid-suite) still leaves complete seed-paired arms.
    jobs = []
    for s in (2023, 7):
        for ds, regen_file in arms:
            jobs.append(f"SASRec:{ds}::train.seed={s}")
            jobs.append(f"SASRec:{ds}:{regen_file}:train.seed={s}")

    print(f"{len(jobs)} confirmation jobs", flush=True)
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "scripts", "run_suite.py"),
         "--out", args.out, "--timeout", str(args.timeout),
         "--jobs"] + jobs, cwd=REPO)
    print(f"CONFIRM_DONE rc={rc}", flush=True)


if __name__ == "__main__":
    main()
