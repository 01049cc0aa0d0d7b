"""Stage 1 CLI: pattern mining + pair building
(reference ``1.Build_pretraining_dataset.py``).

  python scripts/build_pretraining_dataset.py --root_path dataset/amazon-toys/toy \
      --alpha 5 --beta 2 --n_jobs 0
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr4sr_tpu.data.dataset import RowData, load_rows  # noqa: E402
from dr4sr_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dr4sr_tpu.regen.pipeline import build_pretraining_dataset  # noqa: E402


def load_seq2pat(root):
    npz = os.path.join(root, "seq2pat_data.npz")
    pth = os.path.join(root, "seq2pat_data.pth")
    if os.path.exists(npz):
        with np.load(npz) as z:
            flat, offsets = z["flat"], z["offsets"]
        return [flat[offsets[i] : offsets[i + 1]].tolist() for i in range(len(offsets) - 1)]
    import torch

    return [list(s) for s in torch.load(pth, weights_only=False)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_path", type=str, required=True)
    parser.add_argument("--alpha", type=int, default=5, help="max pattern span")
    parser.add_argument("--beta", type=int, default=2, help="min frequency")
    parser.add_argument("--n_jobs", type=int, default=0)
    parser.add_argument("--max_seq_len", type=int, default=50)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--patterns_out", type=str, default="patterns",
                        help="basename (no .npz) for the pattern-rows output")
    parser.add_argument("--pairs_out", type=str, default="seq-pat-pair.pkl")
    args = parser.parse_args()

    sequences = load_seq2pat(args.root_path)
    print(f"loaded {len(sequences)} seq2pat sequences")
    train = load_rows(os.path.join(args.root_path, "train"), True, args.max_seq_len)

    pat_rows, pairs = build_pretraining_dataset(
        sequences, train, alpha=args.alpha, beta=args.beta,
        n_jobs=args.n_jobs, seed=args.seed,
    )

    # patterns.npz = pattern rows + original train (reference patterns.pth)
    from dr4sr_tpu.data.dataset import rows_from_lists

    combined = RowData.concat([
        rows_from_lists(pat_rows, True, args.max_seq_len), train
    ])
    combined.save_npz(os.path.join(args.root_path, args.patterns_out + ".npz"))

    with open(os.path.join(args.root_path, args.pairs_out), "wb") as f:
        pickle.dump(pairs, f)
    print(f"wrote {len(pat_rows)} pattern rows + {len(pairs)} pairs")


if __name__ == "__main__":
    main()
