"""Fused regeneration pipeline: miner → regenerator pretrain → hybrid decode
→ target-model training, ONE process, NO intermediate files (SURVEY §3.4
"fuse procs 2-3 into one program"; VERDICT r2 next-#7).

The reference chains three CLIs plus run.py through ``.pth`` files on disk
(``1.Build_pretraining_dataset.py`` → ``2.Pretrain_regenerator.py`` →
``3.Hybrid_inference.py`` → ``run.py``). Here every stage is a library call
(``dr4sr_tpu/regen/pipeline.py``) and the regenerated rows flow to the
trainer as in-memory arrays — same artifacts, zero serialization, one TPU
client (no per-process compile/init, no axon inter-process cooldown).

  python scripts/fused_pipeline.py --dataset amazon-toys \
      [--regen-epochs 40] [--train-epochs 150] [--cpu]

Prints one JSON line: per-stage seconds, total wall, test metrics.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="amazon-toys")
    parser.add_argument("--root", type=str, default=os.path.join(REPO, "dataset"))
    parser.add_argument("--model", type=str, default="SASRec")
    parser.add_argument("--alpha", type=int, default=5)
    parser.add_argument("--beta", type=int, default=2)
    parser.add_argument("--K", type=int, default=5)
    parser.add_argument("--regen-epochs", type=int, default=40)
    parser.add_argument("--train-epochs", type=int, default=None)
    parser.add_argument("--gamma", type=float, default=0.0)
    parser.add_argument("--max-len", type=int, default=25)
    parser.add_argument("--decode-batch", type=int, default=1024)
    parser.add_argument("--original-repeat", type=int, default=1)
    parser.add_argument("--min-regen-len", type=int, default=2)
    parser.add_argument("--entropy-weight", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=2024)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dr4sr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    sys.path.insert(0, os.path.join(REPO, "scripts"))

    from dr4sr_tpu.config import load_config
    from dr4sr_tpu.data.dataset import prepare_datasets, RowData
    from dr4sr_tpu.regen.pipeline import (
        assemble_train_regen, build_pretraining_dataset, hybrid_inference,
        pretrain_regenerator,
    )
    from dr4sr_tpu.train.trainer import Trainer
    from build_pretraining_dataset import load_seq2pat

    t_all = time.time()
    timings = {}

    config = load_config(args.model, args.dataset)
    config["data"]["train_file"] = ""  # base rows; regen assembled in-memory
    if args.train_epochs is not None:
        config["train"]["epochs"] = args.train_epochs
    config["train"]["seed"] = args.seed

    datasets = prepare_datasets(config, root=args.root)
    train_ds, val_ds, test_ds = datasets
    domain = train_ds.domain_name_list[0]
    domain_root = os.path.join(args.root, args.dataset, domain)
    max_seq_len = train_ds.max_seq_len

    # ---------------- stage 1: mine patterns + pairs (C++ miner, in-proc)
    t0 = time.time()
    if os.path.exists(os.path.join(domain_root, "seq2pat_data.npz")) or \
            os.path.exists(os.path.join(domain_root, "seq2pat_data.pth")):
        sequences = load_seq2pat(domain_root)
    else:  # datasets without a bundled mining corpus: mine the train rows
        from dr4sr_tpu.regen.pipeline import train_sequences_from_rows

        sequences = train_sequences_from_rows(train_ds.rows())
    pat_rows, pairs = build_pretraining_dataset(
        sequences, train_ds.rows(), alpha=args.alpha, beta=args.beta,
        seed=args.seed,
    )
    timings["stage1_mine_s"] = round(time.time() - t0, 1)

    # ---------------- stage 2: pretrain the regenerator (no ckpt file)
    t0 = time.time()
    gen, variables = pretrain_regenerator(
        pairs, train_ds.num_items, k=args.K, epochs=args.regen_epochs,
        seed=args.seed, entropy_weight=args.entropy_weight,
    )
    timings["stage2_pretrain_s"] = round(time.time() - t0, 1)

    # ---------------- stage 3: hybrid decode (generator stays on device)
    t0 = time.time()
    regen_rows, stats = hybrid_inference(
        gen, variables, train_ds.rows(), k_conditions=args.K,
        batch_size=args.decode_batch, max_len=args.max_len,
        gamma=args.gamma, seed=args.seed,
    )
    if args.min_regen_len > 2:
        regen_rows = [r for r in regen_rows if r[3] >= args.min_regen_len - 1]
    timings["stage3_decode_s"] = round(time.time() - t0, 1)
    timings["decode_seqs_per_sec"] = round(stats["seqs_per_sec"], 1)

    # ---------------- fuse: assembled train_regen rows straight into the
    # trainer — the file-mediated path would save_npz + reload here
    base = RowData.concat([train_ds.rows()] * args.original_repeat)
    combined = assemble_train_regen(base, pat_rows, regen_rows, max_seq_len)
    train_ds.data = combined

    # ---------------- stage 4: train the target model on the fused rows
    t0 = time.time()
    trainer = Trainer(config, (train_ds, val_ds, test_ds))
    trainer.fit()
    test = trainer.evaluate()
    timings["stage4_train_s"] = round(time.time() - t0, 1)

    out = {
        "fused": True,
        "dataset": args.dataset,
        "model": args.model,
        "train_rows_fused": len(combined),
        "regen_rows": len(regen_rows),
        "pattern_rows": len(pat_rows),
        "total_wall_s": round(time.time() - t_all, 1),
        **timings,
        "test": {k: float(v) for k, v in test.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
