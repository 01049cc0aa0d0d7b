"""Measure the reference implementation's throughput on this machine
(VERDICT r1 #6: replace bench.py's poster-derived estimates with numbers
measured by actually running /root/reference).

Runs the UNMODIFIED reference code (torch, CPU — no GPU in this container):

* SASRec training: ``BaseModel.fit`` for --epochs epochs on the same
  amazon-toys rows our framework trains on (materialized into the
  reference's ``.pth`` layout), reporting train seqs/s.
* Stage-3 hybrid-inference decode: the reference's batch=1
  ``translate``/``greedy_decode`` loop (``3.Hybrid_inference.py:185-263``)
  over --decode_seqs sequences, reporting decode seqs/s. The only change is
  the hard-coded 'cuda' device strings -> 'cpu' (no CUDA here); the loop
  structure, masks and batch=1 shape are untouched.

Results are appended to BASELINE_MEASURED.json.

  python scripts/measure_reference_baseline.py --epochs 2 --decode_seqs 200
"""

import argparse
import importlib
import json
import os
import shutil
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
WORK = "/tmp/refbench"


def stub_missing_modules():
    """wandb + torchmetrics are not installed; the reference only needs
    no-op logging (wandb) and never calls the torchmetrics paths we run."""
    wandb = types.ModuleType("wandb")
    wandb.log = lambda *a, **k: None
    wandb.init = lambda *a, **k: None
    wandb.Image = lambda *a, **k: None
    wandb.config = {}
    sys.modules["wandb"] = wandb
    tm = types.ModuleType("torchmetrics")
    tmf = types.ModuleType("torchmetrics.functional")
    tm.functional = tmf
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.functional"] = tmf
    # faiss backs only the dead aux-model paths (never reached by SASRec fit)
    sys.modules["faiss"] = types.ModuleType("faiss")


def materialize_dataset(domain_dir_out, domain_dir_src):
    """Our .npz split -> the reference's list-row .pth layout + inter.csv."""
    import torch

    os.makedirs(domain_dir_out, exist_ok=True)

    def load(path):
        # materialize every array up front: indexing a lazy NpzFile per row
        # re-decompresses the whole member each access
        with np.load(path) as z:
            return {k: np.asarray(v) for k, v in z.items()}

    def rows_train(z):
        return [
            [int(z["user_id"][i]), z["in_item_id"][i].tolist(),
             z["item_id"][i].tolist(), int(z["seqlen"][i]),
             z["label"][i].tolist(), int(z["domain_id"][i])]
            for i in range(len(z["user_id"]))
        ]

    def rows_eval(z):
        return [
            [int(z["user_id"][i]), z["in_item_id"][i].tolist(),
             int(z["item_id"][i]), int(z["seqlen"][i]),
             float(z["label"][i]), int(z["domain_id"][i])]
            for i in range(len(z["user_id"]))
        ]

    z = load(os.path.join(domain_dir_src, "train.npz"))
    torch.save(rows_train(z), os.path.join(domain_dir_out, "train.pth"))
    n_rows = len(z["user_id"])
    for phase in ("val", "test"):
        z = load(os.path.join(domain_dir_src, phase + ".npz"))
        torch.save(rows_eval(z), os.path.join(domain_dir_out, phase + ".pth"))

    with np.load(os.path.join(domain_dir_src, "meta.npz")) as z:
        num_users, num_items = int(z["num_users"]), int(z["num_items"])
    # inter.csv only feeds id-space sizes + domain mappings
    n = max(num_users - 1, num_items - 1)
    users = [(i % (num_users - 1)) + 1 for i in range(n)]
    items = [(i % (num_items - 1)) + 1 for i in range(n)]
    import pandas as pd

    pd.DataFrame({"user_id": users, "item_id": items,
                  "domain": [0] * n}).to_csv(
        os.path.join(domain_dir_out, "inter.csv"), index=False)
    return n_rows, num_items


def measure_training(epochs):
    import logging

    # the reference's EarlyStopping derives its ckpt filename from the 'CDR'
    # logger's FileHandler (utils/callbacks.py:81-84)
    logger = logging.getLogger("CDR")
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.FileHandler(os.path.join(WORK, "log", "refbench.log")))

    cfg = {"model": "SASRec", "dataset": "amazon-toys"}
    from utils.utils import load_config, seed_everything

    config = load_config(cfg)
    seed_everything(2023)
    config["train"]["device"] = "cpu"
    config["train"]["epochs"] = epochs
    config["train"]["early_stop_patience"] = epochs + 1
    config["data"]["train_file"] = ""  # original rows (same as our base runs)

    from utils.utils import prepare_datasets, prepare_model

    datasets = prepare_datasets(config)
    model = prepare_model(config, datasets)
    t0 = time.time()
    model.fit()
    wall = time.time() - t0
    n_rows = len(datasets[0])
    per_epoch = model.training_time / epochs
    return {
        "train_rows": n_rows,
        "epochs": epochs,
        "train_s_per_epoch": per_epoch,
        "train_seqs_per_sec": n_rows / per_epoch,
        "fit_wall_s": wall,
    }


def measure_decode(decode_seqs):
    """Reference stage-3 loop with 'cuda' -> 'cpu' (measurement harness
    change only)."""
    import torch

    src_path = os.path.join(REF, "3.Hybrid_inference.py")
    with open(src_path) as f:
        source = f.read().replace("'cuda'", "'cpu'")
    ns = {"__name__": "ref_hybrid_inference", "__file__": src_path, "os": os}
    exec(compile(source, src_path, "exec"), ns)

    # module globals normally set in its __main__ block
    ns["K"] = 5
    ns["args"] = types.SimpleNamespace(root_path=os.path.join(
        REF, "dataset", "amazon-toys", "toy"))
    with np.load(os.path.join(REPO, "dataset", "amazon-toys", "toy", "meta.npz")) as z:
        num_items = int(z["num_items"])
    ns["num_item"] = num_items
    ns["SOS"], ns["EOS"] = num_items, num_items + 1

    gen = ns["Generator"]()
    gen.device = "cpu"
    gen.set_condition(0)  # per-condition decode, as the __main__ loop does
    gen.eval()

    with np.load(os.path.join(REPO, "dataset", "amazon-toys", "toy", "train.npz")) as z:
        seqs = [
            z["in_item_id"][i][: z["seqlen"][i]].tolist()
            for i in range(min(decode_seqs, len(z["user_id"])))
        ]
    t0 = time.time()
    with torch.no_grad():
        for s in seqs:
            src = torch.tensor([ns["SOS"]] + s + [ns["EOS"]])
            ns["translate"](gen, src)
    dt = time.time() - t0
    return {
        "decode_seqs": len(seqs),
        "decode_s_total": dt,
        "decode_seqs_per_sec": len(seqs) / dt,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--decode_seqs", type=int, default=200)
    parser.add_argument("--threads", type=int, default=4)
    args = parser.parse_args()

    import torch

    torch.set_num_threads(args.threads)

    stub_missing_modules()
    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(os.path.join(WORK, "configs")):
        os.symlink(os.path.join(REF, "configs"), os.path.join(WORK, "configs"))
    n_rows, _ = materialize_dataset(
        os.path.join(WORK, "dataset", "amazon-toys", "toy"),
        os.path.join(REPO, "dataset", "amazon-toys", "toy"),
    )
    os.makedirs(os.path.join(WORK, "log"), exist_ok=True)
    sys.path.insert(0, REF)
    os.chdir(WORK)

    out = {
        "hardware": f"cpu x{args.threads} threads (no GPU in container)",
        "torch": torch.__version__,
        "dataset": "amazon-toys (our rebuilt split, same rows the framework trains on)",
    }
    print("measuring reference decode loop...", flush=True)
    out.update(measure_decode(args.decode_seqs))
    print(json.dumps(out, indent=1), flush=True)
    print("measuring reference training...", flush=True)
    out.update(measure_training(args.epochs))

    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
