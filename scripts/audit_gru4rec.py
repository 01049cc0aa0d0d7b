"""GRU4Rec quality audit (VERDICT r2 weak-#4 / next-#5).

Our GRU4Rec reports test NDCG@20 0.0133 on toys vs SASRec's 0.0451 — is that
a bug in ``GRUStack`` (modules/layers.py) or just GRU4Rec being weak on
sparse Amazon data? Evidence: run the UNMODIFIED torch reference's GRU4Rec
(``/root/reference/model/gru4rec.py``) to convergence on the SAME rebuilt
split our framework trains on, early stopping + checkpoint selection per the
reference protocol, and report test metrics side by side.

Reuses scripts/measure_reference_baseline.py's dataset materialization and
module stubs (torch CPU; no GPU in this container).

  python scripts/audit_gru4rec.py --dataset amazon-toys [--model GRU4Rec]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

from measure_reference_baseline import (  # noqa: E402
    REF, materialize_dataset, stub_missing_modules,
)

WORK = "/tmp/refaudit"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="amazon-toys")
    parser.add_argument("--model", type=str, default="GRU4Rec")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--patience", type=int, default=20)
    parser.add_argument("--threads", type=int, default=8)
    parser.add_argument("--seed", type=int, default=2023)
    parser.add_argument("--out", type=str,
                        default=os.path.join(REPO, "results_gru4rec_audit.json"))
    args = parser.parse_args()

    import torch

    torch.set_num_threads(args.threads)
    stub_missing_modules()

    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(os.path.join(WORK, "configs")):
        os.symlink(os.path.join(REF, "configs"), os.path.join(WORK, "configs"))
    domain = os.listdir(os.path.join(REPO, "dataset", args.dataset))[0]
    materialize_dataset(
        os.path.join(WORK, "dataset", args.dataset, domain),
        os.path.join(REPO, "dataset", args.dataset, domain),
    )
    os.makedirs(os.path.join(WORK, "log"), exist_ok=True)
    sys.path.insert(0, REF)
    os.chdir(WORK)

    import logging

    logger = logging.getLogger("CDR")
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.FileHandler(
        os.path.join(WORK, "log", "audit.log")))
    logger.addHandler(logging.StreamHandler())

    from utils.utils import load_config, prepare_datasets, prepare_model, seed_everything

    config = load_config({"model": args.model, "dataset": args.dataset})
    seed_everything(args.seed)
    config["train"]["device"] = "cpu"
    config["train"]["epochs"] = args.epochs
    config["train"]["early_stop_patience"] = args.patience
    config["data"]["train_file"] = ""  # original rows, same as our base runs

    datasets = prepare_datasets(config)
    model = prepare_model(config, datasets)
    t0 = time.time()
    model.fit()
    fit_s = time.time() - t0
    test = model.evaluate()

    record = {
        "model": args.model,
        "dataset": args.dataset,
        "seed": args.seed,
        "torch_reference_test": {k: float(v) for k, v in test.items()},
        "fit_wall_s": round(fit_s, 1),
        "epochs_cap": args.epochs,
        "patience": args.patience,
        "note": "unmodified /root/reference code on our rebuilt split "
                "(device cuda->cpu only)",
    }
    existing = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.append(record)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
