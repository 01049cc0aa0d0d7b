"""Sequentially train a suite of (model, dataset, train_file) configs and
collect test metrics into a JSON file — the BASELINE-reproduction runner.

  python scripts/run_suite.py --out results.json \
      --jobs SASRec:amazon-toys:_regen GRU4Rec:amazon-toys: FMLP:amazon-toys:
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--jobs", nargs="+", required=True,
                        help="Model:dataset:train_file triples")
    parser.add_argument("--out", type=str, default="results.json")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--root", type=str, default="dataset")
    args = parser.parse_args()

    from dr4sr_tpu import quickstart
    from dr4sr_tpu.config import load_config

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for job in args.jobs:
        model, dataset, train_file = job.split(":")
        key = f"{model}/{dataset}{train_file or '_base'}"
        if key in results:
            print(f"skip {key} (already done)")
            continue
        print(f"=== {key} ===", flush=True)
        config = load_config(model, dataset)
        config["data"]["train_file"] = train_file
        config["train"]["epochs"] = args.epochs
        t0 = time.time()
        try:
            out = quickstart.run(config, root=args.root)
            results[key] = {
                "metrics": {k: float(v) for k, v in out.items()},
                "wall_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # keep the suite going
            traceback.print_exc()
            results[key] = {"error": str(e), "wall_s": round(time.time() - t0, 1)}
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results[key], indent=1), flush=True)


if __name__ == "__main__":
    main()
