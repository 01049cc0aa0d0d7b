"""Fused vs file-mediated pipeline timing (VERDICT r2 next-#7 done-criterion).

Times the SAME regeneration+train workload two ways:
  (a) fused  — scripts/fused_pipeline.py: one process, rows flow in memory;
  (b) files  — the reference-shaped chain: 4 subprocesses
      (build_pretraining_dataset -> pretrain_regenerator -> hybrid_inference
      -> run.py) handing off .npz/.pkl/.msgpack artifacts on disk, each
      paying its own process start + backend init + compile.

  python scripts/compare_fused_vs_files.py --dataset synthetic --cpu \
      --regen-epochs 5 --train-epochs 10

Appends one record to results_fused_compare.json and prints it.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, timeout, env=None):
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout, env=env)
    dt = time.time() - t0
    if proc.returncode != 0:
        tail = (proc.stdout + proc.stderr)[-800:]
        raise RuntimeError(f"{' '.join(cmd[:3])}... rc={proc.returncode}\n{tail}")
    return dt, proc.stdout


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--regen-epochs", type=int, default=5)
    p.add_argument("--train-epochs", type=int, default=10)
    p.add_argument("--K", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--sleep", type=int, default=0,
                   help="cooldown between TPU subprocesses (axon wedge quirk)")
    p.add_argument("--out", default="results_fused_compare.json")
    args = p.parse_args()

    py = [sys.executable]
    env = dict(os.environ)
    if args.cpu:
        # DR4SR_PLATFORM is honored by every entry point via
        # dr4sr_tpu.utils.env.apply_platform_override
        env["DR4SR_PLATFORM"] = "cpu"
    domain = os.listdir(os.path.join(REPO, "dataset", args.dataset))[0]
    root = os.path.join("dataset", args.dataset, domain)

    # ---------------- (a) fused, one process
    _, out = run(
        py + ["scripts/fused_pipeline.py", "--dataset", args.dataset,
              "--regen-epochs", str(args.regen_epochs),
              "--train-epochs", str(args.train_epochs), "--K", str(args.K)]
        + (["--cpu"] if args.cpu else []),
        args.timeout, env=env,
    )
    fused_rec = json.loads(out.strip().splitlines()[-1])

    # ---------------- (b) file-mediated, 4 processes
    env_note = "same host, sequential subprocesses"
    t0 = time.time()
    stage_times = {}
    for name, cmd in [
        ("stage1", ["scripts/build_pretraining_dataset.py",
                    "--root_path", root]),
        ("stage2", ["scripts/pretrain_regenerator.py", "--root_path", root,
                    "--K", str(args.K), "--epochs", str(args.regen_epochs)]),
        ("stage3", ["scripts/hybrid_inference.py", "--root_path", root,
                    "--K", str(args.K)]),
        ("stage4", ["run.py", "-m", "SASRec", "-d", args.dataset,
                    "--train-file", "_regen",
                    "--epochs", str(args.train_epochs)]),
    ]:
        dt, _ = run(py + cmd, args.timeout, env=env)
        stage_times[name + "_s"] = round(dt, 1)
        if args.sleep:
            time.sleep(args.sleep)
    dt_files = time.time() - t0 - args.sleep * 4

    record = {
        "dataset": args.dataset,
        "device": "cpu" if args.cpu else "tpu",
        "regen_epochs": args.regen_epochs,
        "train_epochs": args.train_epochs,
        "fused_total_s": fused_rec["total_wall_s"],
        "fused_stages": {k: v for k, v in fused_rec.items()
                         if k.endswith("_s") and k != "total_wall_s"},
        "files_total_s": round(dt_files, 1),
        "files_stages": stage_times,
        "speedup": round(dt_files / fused_rec["total_wall_s"], 2),
        "note": env_note,
    }
    existing = []
    out_path = os.path.join(REPO, args.out)
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.append(record)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
