"""Probe KV-cached decode throughput vs lane count (round-3 tuning input).

The bench default is B=2048 (22.6k seqs/s on v5e, ~850x the measured
reference batch=1 loop). Decode at D=64 underutilizes the chip per step, so
more lanes should be ~free until HBM or the [B, V] mask/argmax saturates.
Runs bench.bench_decode at several batch sizes and prints one JSON line.

  python scripts/probe_decode_batch.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import bench

    name, seqs, _, _, _, n_items = bench.load_workload()
    out = {"workload": name}
    for bs in (2048, 4096, 8192):
        try:
            t0 = time.perf_counter()
            sps = bench.bench_decode(n_items, seqs, batch_size=bs, n_batches=4)
            out[f"decode_sps_b{bs}"] = round(sps, 1)
            out[f"wall_b{bs}"] = round(time.perf_counter() - t0, 1)
        except Exception as e:  # OOM etc. — record and continue
            out[f"error_b{bs}"] = str(e)[:120]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
