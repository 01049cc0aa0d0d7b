"""Re-run the top-N validation trials of a regen sweep at an extra seed, so
the confirmation suite can select its arm on a seeds-mean validation score
(single-seed val gaps between top candidates are inside seed noise ±0.0005).
Selection never touches test metrics.

  python scripts/seed_repeat_r2.py --results results_sweep_beauty.json \
      --sweep_dir /root/repo --dataset amazon-beauty --top 4 --seed 7 \
      [--embedding ...]
"""

import argparse
import json
import os
import re
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--sweep_dir", required=True,
                   help="repo/snapshot dir whose scripts/regen_sweep.py and "
                        "dataset caches to use")
    p.add_argument("--dataset", required=True)
    p.add_argument("--top", type=int, default=3)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--embedding", default=None)
    p.add_argument("--patience", type=int, default=10)
    args = p.parse_args()

    with open(args.results) as f:
        res = json.load(f)
    done = [(k, v) for k, v in res.items()
            if "metrics" in v and not re.search(r"_s\d+$", k)]
    done.sort(key=lambda kv: -kv[1]["metrics"].get("val_best", -1))
    trials = []
    for name, rec in done[: args.top]:
        t = dict(rec["trial"])
        t["seed"] = args.seed
        trials.append(t)
    print(f"seed-{args.seed} repeats for top {len(trials)}: "
          f"{[n for n, _ in done[:args.top]]}", flush=True)
    if not trials:
        return

    cmd = [sys.executable, "scripts/regen_sweep.py",
           "--dataset", args.dataset,
           "--out", os.path.abspath(args.results),
           "--trials_json", json.dumps(trials),
           "--patience", str(args.patience)]
    if args.embedding:
        cmd += ["--embedding", args.embedding]
    rc = subprocess.call(cmd, cwd=args.sweep_dir)
    print(f"SEED_REPEAT_DONE rc={rc}", flush=True)


if __name__ == "__main__":
    main()
