"""Per-dataset regeneration-hyperparameter sweep (round-2 quality work).

Sweeps the DR4SR pipeline knobs the paper tuned per dataset (entropy weight,
generative-decode probability γ, data-mixture composition, mining α/β, K) and
trains a downstream model on each regenerated dataset, selecting on the
VALIDATION monitor. Stage products are cached by tag, every TPU-touching step
runs as its own subprocess (axon quirk: a fatal backend error poisons the
client), and results are checkpointed to JSON after every trial so the sweep
is resumable.

  python scripts/regen_sweep.py --dataset amazon-beauty \
      --embedding /root/reference/dataset/amazon-beauty/beauty/pre-trained_embedding.ckpt \
      --out results_sweep_beauty.json --phase phase1
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TPU_RUN = os.path.join(REPO, "scripts", "tpu_run.sh")

from dr4sr_tpu.utils.parsing import parse_metric_line  # noqa: E402


def log(msg):
    print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_tpu(logfile, grace, total, cmd):
    """Run a TPU job under the stall-aware wrapper; returns (rc, output)."""
    rc = subprocess.run(["bash", TPU_RUN, logfile, str(grace), str(total)] + cmd,
                        cwd=REPO).returncode
    out = ""
    if os.path.exists(logfile):
        with open(logfile) as f:
            out = f.read()
    time.sleep(75)  # axon quirk: a client starting <~1-2min after another exits wedges
    return rc, out


def parse_final_dict(out):
    # nan/inf-tolerant, eval-free parse (dr4sr_tpu/utils/parsing.py; ADVICE r2)
    for line in reversed(out.strip().splitlines()):
        metrics = parse_metric_line(line)
        if metrics is not None:
            return metrics
    return None


def fmt(x):
    return str(x).replace("-", "m").replace(".", "p")


def phase1_trials():
    t = []
    for ew in (-1.0, 1.0):
        for gamma in (0.0, 0.3, 0.6):
            t.append(dict(ew=ew, gamma=gamma, variant="both"))
    t.append(dict(ew=-1.0, gamma=0.0, variant="regen"))
    t.append(dict(variant="patterns"))
    return t


def trial_name(t):
    if t["variant"] == "patterns":
        return (f"pat_a{t.get('alpha',5)}b{t.get('beta',2)}"
                + (f"_s{t['seed']}" if t.get("seed", 2023) != 2023 else ""))
    return (f"ew{fmt(t['ew'])}_g{fmt(t['gamma'])}_{t['variant']}"
            f"_a{t.get('alpha',5)}b{t.get('beta',2)}K{t.get('K',5)}"
            + (f"_L{t['max_len']}" if t.get("max_len", 25) != 25 else "")
            + (f"_or{t['orep']}" if t.get("orep", 1) != 1 else "")
            + (f"_ml{t['minlen']}" if t.get("minlen", 2) != 2 else "")
            + (f"_bw{t['beam']}" if t.get("beam", 1) != 1 else "")
            + (f"_s{t['seed']}" if t.get("seed", 2023) != 2023 else ""))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--root", default="dataset")
    parser.add_argument("--embedding", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--phase", default="phase1", choices=["phase1"],
                        help="named preset; later phases are passed as "
                             "explicit --trials_json lists")
    parser.add_argument("--trials_json", default=None,
                        help="explicit JSON list of trial dicts (overrides --phase)")
    parser.add_argument("--downstream_model", default="SASRec")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--regen_epochs", type=int, default=40)
    parser.add_argument("--n_jobs", type=int, default=4)
    parser.add_argument("--extra_set", action="append", default=[],
                        help="extra --set overrides for the downstream train "
                             "(e.g. train.steps_per_dispatch=16 — bit-parity "
                             "with the per-step loop, tests/test_trainer_fused.py)")
    args = parser.parse_args()

    with open(os.path.join(REPO, "configs", f"{args.dataset}.yaml")) as f:
        domain = yaml.safe_load(f)["domain_name_list"][0]
    root_path = os.path.join(args.root, args.dataset, domain)
    abs_root = os.path.join(REPO, root_path)
    logdir = os.path.join(REPO, "log", "sweep", args.dataset)
    os.makedirs(logdir, exist_ok=True)

    trials = (json.loads(args.trials_json) if args.trials_json
              else phase1_trials())

    out_path = os.path.join(REPO, args.out)
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    def save():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    py = sys.executable
    for t in trials:
        name = trial_name(t)
        if name in results and "metrics" in results[name]:
            log(f"skip {name} (done)")
            continue
        log(f"=== trial {name}: {t}")
        t0 = time.time()
        alpha, beta = t.get("alpha", 5), t.get("beta", 2)
        k = t.get("K", 5)
        tag1 = f"a{alpha}b{beta}"
        pat_file = f"patterns_{tag1}"
        pairs_file = f"pairs_{tag1}.pkl"

        # ---- stage 1 (cached by mining params) -------------------------------
        # the CLI writes patterns npz BEFORE pairs pkl; require both so a
        # timeout between the two writes doesn't poison the cache for every
        # trial sharing this mining tag
        if not (os.path.exists(os.path.join(abs_root, pat_file + ".npz"))
                and os.path.exists(os.path.join(abs_root, pairs_file))):
            rc, out = run_tpu(
                os.path.join(logdir, f"s1_{tag1}.log"), 600, 1200,
                [py, "scripts/build_pretraining_dataset.py",
                 "--root_path", root_path, "--alpha", str(alpha),
                 "--beta", str(beta), "--n_jobs", str(args.n_jobs),
                 "--patterns_out", pat_file, "--pairs_out", pairs_file])
            if rc != 0:
                results[name] = {"error": f"stage1 rc={rc}", "tail": out[-2000:]}
                save()
                continue

        if t["variant"] == "patterns":
            # patterns.npz already contains original train ∪ pattern rows
            shutil.copyfile(os.path.join(abs_root, pat_file + ".npz"),
                            os.path.join(abs_root, f"train_sw_{name}.npz"))
        else:
            # ---- stage 2 (cached by mining+K+entropy) ------------------------
            tag2 = f"{tag1}K{k}ew{fmt(t['ew'])}"
            regen_ckpt = f"regenerator_{tag2}.msgpack"
            if not os.path.exists(os.path.join(abs_root, regen_ckpt)):
                cmd = [py, "scripts/pretrain_regenerator.py",
                       "--root_path", root_path, "--K", str(k),
                       "--epochs", str(args.regen_epochs),
                       "--pairs_name", pairs_file,
                       "--output_name", regen_ckpt,
                       "--entropy_weight", str(t["ew"])]
                if args.embedding:
                    cmd += ["--embedding", args.embedding]
                rc, out = run_tpu(os.path.join(logdir, f"s2_{tag2}.log"),
                                  600, 3600, cmd)
                if rc != 0:
                    results[name] = {"error": f"stage2 rc={rc}", "tail": out[-2000:]}
                    save()
                    continue

            # ---- stage 3 (decode cached by tag2+γ+len(+beam)) ----------------
            tag3 = f"{tag2}_g{fmt(t['gamma'])}_L{t.get('max_len', 25)}"
            if t.get("beam", 1) != 1:
                tag3 += f"_bw{t['beam']}"
            cmd = [py, "scripts/hybrid_inference.py",
                   "--root_path", root_path, "--ckpt_name", regen_ckpt,
                   "--K", str(k), "--batch_size", "2048",
                   "--gamma", str(t["gamma"]),
                   "--max_len", str(t.get("max_len", 25)),
                   "--patterns_name", pat_file,
                   "--out_name", f"train_sw_{name}",
                   "--regen_cache", os.path.join(abs_root, f"regen_{tag3}.pkl")]
            if t["variant"] == "regen":
                cmd.append("--no_patterns")
            if t.get("orep", 1) != 1:
                cmd += ["--original_repeat", str(t["orep"])]
            if t.get("minlen", 2) != 2:
                cmd += ["--min_regen_len", str(t["minlen"])]
            if t.get("beam", 1) != 1:
                cmd += ["--beam_width", str(t["beam"])]
            rc, out = run_tpu(os.path.join(logdir, f"s3_{name}.log"), 600, 2400, cmd)
            if rc != 0:
                results[name] = {"error": f"stage3 rc={rc}", "tail": out[-2000:]}
                save()
                continue

        # ---- downstream training on the regenerated data ---------------------
        seed = t.get("seed", 2023)
        cmd = [py, "run.py", "-m", args.downstream_model, "-d", args.dataset,
               "--train-file", f"_sw_{name}",
               "--set", f"train.early_stop_patience={args.patience}",
               "--set", f"train.seed={seed}"]
        for ov in args.extra_set:
            cmd += ["--set", ov]
        rc, out = run_tpu(os.path.join(logdir, f"train_{name}.log"), 600, 3600, cmd)
        metrics = parse_final_dict(out)
        if metrics is None:
            results[name] = {"error": f"train rc={rc}", "tail": out[-2000:]}
        else:
            results[name] = {"trial": t, "metrics": metrics,
                             "wall_s": round(time.time() - t0, 1)}
            log(f"{name}: val_best={metrics.get('val_best')} "
                f"test ndcg@20={metrics.get('ndcg@20')}")
        save()

    done = {k: v for k, v in results.items() if "metrics" in v}
    if done:
        best = max(done, key=lambda k: done[k]["metrics"].get("val_best", -1))
        log(f"BEST on val: {best} -> {done[best]['metrics']}")
    log("SWEEP_DONE")


if __name__ == "__main__":
    main()
