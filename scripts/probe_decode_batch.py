"""Probe KV-cached decode throughput vs lane count (round-3 tuning input).

The bench default is B=2048 (22.6k seqs/s on v5e, ~850x the measured
reference batch=1 loop). Decode at D=64 underutilizes the chip per step, so
more lanes should be ~free until HBM or the [B, V] mask/argmax saturates.

Each batch size runs in its OWN subprocess: a fatal axon backend error (OOM
included) poisons the whole process's TPU client, so an in-process loop would
report bogus numbers for every size after the first failure.

  python scripts/probe_decode_batch.py            # orchestrates subprocesses
  python scripts/probe_decode_batch.py --bs 4096  # one measurement (child)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(bs: int) -> None:
    import bench

    name, seqs, _, _, _, n_items = bench.load_workload()
    t0 = time.perf_counter()
    sps = bench.bench_decode(n_items, seqs, batch_size=bs, n_batches=4)
    print(json.dumps({
        "workload": name,
        f"decode_sps_b{bs}": round(sps, 1),
        f"wall_b{bs}": round(time.perf_counter() - t0, 1),
    }), flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=None)
    p.add_argument("--timeout", type=int, default=420)
    args = p.parse_args()
    if args.bs is not None:
        measure(args.bs)
        return 0

    out = {}
    for bs in (2048, 4096, 8192):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--bs", str(bs)],
                capture_output=True, text=True, timeout=args.timeout, cwd=REPO,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None)
            if proc.returncode == 0 and line:
                out.update(json.loads(line))
            else:
                out[f"error_b{bs}"] = (
                    f"rc={proc.returncode} " + proc.stderr.strip()[-160:])
        except subprocess.TimeoutExpired:
            out[f"error_b{bs}"] = "timeout"
        time.sleep(30)  # axon inter-client cooldown
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
