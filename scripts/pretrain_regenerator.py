"""Stage 2 CLI: pre-train the regenerator (reference ``2.Pretrain_regenerator.py``).

  python scripts/pretrain_regenerator.py --root_path dataset/amazon-toys/toy \
      --K 5 --epochs 40 --seed 2024

num_items comes from the domain's ``meta.npz``/``inter.csv`` (the reference
hard-codes a per-dataset table — a wart SURVEY §5.6 flags); the pre-trained
item embedding is read from ``pre-trained_embedding.ckpt`` (torch) or any
framework checkpoint passed via ``--embedding``.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr4sr_tpu.regen.pipeline import pretrain_regenerator  # noqa: E402
from dr4sr_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dr4sr_tpu.train.checkpoint import load_torch_embedding  # noqa: E402
from flax import serialization  # noqa: E402


def domain_num_items(root):
    meta = os.path.join(root, "meta.npz")
    if os.path.exists(meta):
        with np.load(meta) as z:
            return int(z["num_items"])
    import pandas as pd

    df = pd.read_csv(os.path.join(root, "inter.csv"))
    return int(df["item_id"].max()) + 1


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_path", type=str, required=True)
    parser.add_argument("--output_name", type=str, default="regenerator.msgpack")
    parser.add_argument("--pairs_name", type=str, default="seq-pat-pair.pkl")
    parser.add_argument("--K", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--embedding", type=str, default=None,
                        help="path to a pre-trained embedding ckpt")
    parser.add_argument("--entropy_weight", type=float, default=1.0,
                        help="condition-entropy coefficient; +1 matches the "
                             "reference (penalize entropy -> peaked conditions), "
                             "negative values maximize condition entropy")
    args = parser.parse_args()

    with open(os.path.join(args.root_path, args.pairs_name), "rb") as f:
        pairs = pickle.load(f)
    num_items = domain_num_items(args.root_path)
    print(f"{len(pairs)} pairs, num_items={num_items}")

    emb = None
    emb_path = args.embedding or os.path.join(args.root_path, "pre-trained_embedding.ckpt")
    if os.path.exists(emb_path):
        emb = load_torch_embedding(emb_path)
        print(f"loaded pre-trained embedding {None if emb is None else emb.shape}")

    gen, variables = pretrain_regenerator(
        pairs, num_items, k=args.K, epochs=args.epochs,
        batch_size=args.batch_size, seed=args.seed, pretrained_embedding=emb,
        entropy_weight=args.entropy_weight,
    )
    out = os.path.join(args.root_path, args.output_name)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(__import__("jax").device_get(variables)))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
