"""CLI: grid hyperparameter sweep (reference ``tune.py``, without wandb).

Sweep spec lives in ``sweep/<model>.yaml`` as ``{section.key: [values...]}``.
"""

import argparse
import json
import os

import yaml

from dr4sr_tpu import quickstart
from dr4sr_tpu.config import load_config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="SASRec")
    parser.add_argument("--dataset", "-d", type=str, default="amazon-toys")
    parser.add_argument("--root", type=str, default="dataset")
    parser.add_argument("--sweep", type=str, default=None,
                        help="sweep yaml path (default sweep/<model>.yaml)")
    parser.add_argument("--method", type=str, default=None,
                        choices=["grid", "random", "bayes"],
                        help="override the sweep file's `method` (default grid)")
    parser.add_argument("--samples", type=int, default=None,
                        help="number of draws for random/bayes search")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    config = load_config(args.model, args.dataset)
    sweep_path = args.sweep or os.path.join("sweep", args.model.lower() + ".yaml")
    with open(sweep_path) as f:
        sweep = yaml.safe_load(f)
    # sweep files may carry wandb-style meta keys alongside the grid; always
    # strip them so CLI overrides can't leave them behind as fake dimensions
    file_method = sweep.pop("method", "grid")
    file_samples = sweep.pop("samples", None)
    sweep.pop("metric", None)
    method = args.method or file_method
    samples = args.samples or file_samples

    best, results = quickstart.tune(config, sweep, root=args.root,
                                    method=method, samples=samples,
                                    seed=args.seed)
    print(json.dumps({"best": best, "all": results}, indent=1, default=str))


if __name__ == "__main__":
    main()
