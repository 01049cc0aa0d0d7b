"""Stage 3 CLI: batched hybrid inference → train_regen
(reference ``3.Hybrid_inference.py``; the batch=1 loop and manual
``--begin/--end`` process sharding are replaced by on-device batched decode).

  python scripts/hybrid_inference.py --root_path dataset/amazon-toys/toy \
      --ckpt_name regenerator.msgpack --K 5
"""

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr4sr_tpu.data.dataset import RowData, load_rows  # noqa: E402
from dr4sr_tpu.utils.env import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from dr4sr_tpu.regen.generator import Generator  # noqa: E402
from dr4sr_tpu.regen.pipeline import assemble_train_regen, hybrid_inference  # noqa: E402
from flax import serialization  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_path", type=str, required=True)
    parser.add_argument("--ckpt_name", type=str, default="regenerator.msgpack")
    parser.add_argument("--K", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--max_len", type=int, default=25)
    parser.add_argument("--gamma", type=float, default=0.0,
                        help="per-step probability of generative masking")
    parser.add_argument("--max_seq_len", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_name", type=str, default="train_regen",
                        help="basename (no .npz) of the assembled train file")
    parser.add_argument("--patterns_name", type=str, default="patterns")
    parser.add_argument("--no_patterns", action="store_true",
                        help="assemble original+regen only (drop pattern rows)")
    parser.add_argument("--beam_width", type=int, default=1,
                        help="beam search width for the decode (1 = greedy, "
                             "the reference's behavior; >1 generalizes the "
                             "KV-cached loop to batched beam search)")
    parser.add_argument("--regen_cache", type=str, default=None,
                        help="pickle path caching the decoded sequences; decode "
                             "is skipped when it already exists")
    parser.add_argument("--original_repeat", type=int, default=1,
                        help="include the original train rows this many times "
                             "in the assembled file (counteracts dilution when "
                             "pattern+regen rows outnumber originals, e.g. "
                             "amazon-beauty's 2:1 pattern:original ratio)")
    parser.add_argument("--min_regen_len", type=int, default=2,
                        help="drop regenerated sequences shorter than this "
                             "many items before assembly (beauty phase-1: 97%% "
                             "of its regen rows are trivial 2-item sequences "
                             "and regen-bearing mixtures underperform; "
                             "pattern rows are unaffected)")
    args = parser.parse_args()

    from scripts.pretrain_regenerator import domain_num_items

    num_items = domain_num_items(args.root_path)
    gen = Generator(num_items=num_items, k=args.K)

    train = load_rows(os.path.join(args.root_path, "train"), True, args.max_seq_len)

    # target structure for deserialization
    rng = jax.random.PRNGKey(0)
    src0 = np.zeros((1, 4), np.int32)
    variables = gen.init(
        {"params": rng, "dropout": rng, "gumbel": rng},
        src0, src0[:, :-1], np.ones(1, np.int32), np.asarray(1.0),
    )
    with open(os.path.join(args.root_path, args.ckpt_name), "rb") as f:
        variables = serialization.from_bytes(jax.device_get(variables), f.read())

    import json
    import pickle

    # decode-affecting parameters; a cache hit is only valid if they match
    # (orep/minlen/patterns knobs are post-decode and don't belong here)
    decode_params = {"ckpt_name": args.ckpt_name, "K": args.K,
                     "max_len": args.max_len, "gamma": args.gamma,
                     "seed": args.seed}
    if args.beam_width != 1:  # keep pre-beam cache sidecars valid
        decode_params["beam_width"] = args.beam_width
    sidecar = (args.regen_cache + ".params.json") if args.regen_cache else None

    if args.regen_cache and os.path.exists(args.regen_cache):
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                cached_params = json.load(f)
            if cached_params != decode_params:
                raise SystemExit(
                    f"--regen_cache {args.regen_cache} was decoded with "
                    f"{cached_params}, current flags are {decode_params}; "
                    "refusing to mix — delete the cache or change its path")
        else:
            print(f"warning: {args.regen_cache} has no params sidecar "
                  "(pre-guard cache); trusting the filename", flush=True)
        with open(args.regen_cache, "rb") as f:
            regen_rows = pickle.load(f)
        stats = {"cached": True, "unique_regenerated": len(regen_rows)}
    else:
        regen_rows, stats = hybrid_inference(
            gen, variables, train, k_conditions=args.K,
            batch_size=args.batch_size, max_len=args.max_len, gamma=args.gamma,
            seed=args.seed, beam_width=args.beam_width,
        )
        if args.regen_cache:
            with open(args.regen_cache, "wb") as f:
                pickle.dump(regen_rows, f)
            with open(sidecar, "w") as f:
                json.dump(decode_params, f)

    if args.min_regen_len > 2:
        # rows are reference-style [user_id, seq, target, seqlen, label,
        # domain]; total items = history seqlen + 1 target
        kept = [r for r in regen_rows if int(r[3]) + 1 >= args.min_regen_len]
        stats["regen_len_filtered"] = len(regen_rows) - len(kept)
        regen_rows = kept

    # patterns rows (stage 1 output) are folded in if present
    pat_path = os.path.join(args.root_path, args.patterns_name)
    if not args.no_patterns and os.path.exists(pat_path + ".npz"):
        patterns = load_rows(pat_path, True, args.max_seq_len)
        base = RowData.concat([patterns])  # already includes original train
        from dr4sr_tpu.data.dataset import rows_from_lists

        extra = rows_from_lists(regen_rows, True, args.max_seq_len)
        combined = RowData.concat([base, extra])
    else:
        combined = assemble_train_regen(train, [], regen_rows, args.max_seq_len)
    if args.original_repeat > 1:
        combined = RowData.concat(
            [combined] + [train] * (args.original_repeat - 1)
        )
    combined.save_npz(os.path.join(args.root_path, args.out_name + ".npz"))
    print(f"wrote {args.out_name}.npz with {len(combined)} rows; stats={stats}")


if __name__ == "__main__":
    main()
