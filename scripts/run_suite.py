"""Sequentially train a suite of (model, dataset, train_file) configs and
collect test metrics into a JSON file — the BASELINE-reproduction runner.

Each job runs in its own subprocess so a backend failure in one job cannot
poison the TPU client of the rest.

  python scripts/run_suite.py --out results.json \
      --jobs SASRec:amazon-toys:_regen GRU4Rec:amazon-toys: FMLP:amazon-toys:

A 4th colon-field adds per-job config overrides (comma-separated
section.key=value pairs), e.g.
  MetaModel:amazon-toys:_regen:train.inner_loss_scale=mean,train.interval=10
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dr4sr_tpu.utils.parsing import parse_metric_line  # noqa: E402


def run_job(model, dataset, train_file, epochs, timeout, overrides=""):
    cmd = [
        sys.executable, os.path.join(REPO, "run.py"),
        "-m", model, "-d", dataset,
        "--train-file", train_file, "--epochs", str(epochs),
    ]
    for ov in filter(None, overrides.split(",")):
        cmd += ["--set", ov]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO
    )
    out = proc.stdout.strip().splitlines()
    # run.py prints the final metric dict on the last line; nan/inf-tolerant
    # parse without eval (dr4sr_tpu/utils/parsing.py; ADVICE r2)
    for line in reversed(out):
        metrics = parse_metric_line(line)
        if metrics is not None:
            return {"metrics": metrics}, proc
        if line.strip().startswith("{") and line.strip().endswith("}"):
            break  # looked like the dict line but unparseable: record error
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-12:])
    return {"error": f"exit {proc.returncode}", "tail": tail}, proc


def transient_backend_failure(record):
    """True when a job died at TPU-client init (axon wedge / tunnel outage) —
    a machine-state failure worth one backoff-retry, unlike a config error."""
    return ("error" in record
            and "Unable to initialize backend" in record.get("tail", ""))


def parse_chunk_output(stdout):
    """RESULT\t<key>\t<json> lines from scripts/run_chunk.py."""
    records = {}
    for line in (stdout or "").splitlines():
        if line.startswith("RESULT\t"):
            try:
                _, key, payload = line.split("\t", 2)
                records[key] = json.loads(payload)
            except (ValueError, json.JSONDecodeError):
                continue
    return records


def run_chunk(chunk, epochs, timeout):
    """One subprocess / one TPU client for a list of (key, jobspec) pairs.

    Returns {key: record}. Jobs the chunk died before reaching are absent
    (they stay uncached, so a rerun picks them up); the job in flight at a
    chunk timeout is recorded as a timeout.
    """
    cmd = [sys.executable, os.path.join(REPO, "scripts", "run_chunk.py"),
           "--epochs", str(epochs), "--timeout", str(timeout),
           "--jobs"] + [spec for _, spec in chunk]
    budget = timeout * len(chunk) + 120
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=budget, cwd=REPO)
        records = parse_chunk_output(proc.stdout)
        if not records and proc.returncode != 0:
            tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-12:])
            records = {chunk[0][0]: {"error": f"exit {proc.returncode}",
                                     "tail": tail}}
    except subprocess.TimeoutExpired as exc:
        out = exc.stdout
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        records = parse_chunk_output(out)
        for key, _ in chunk:  # first unreached job was in flight: timeout
            if key not in records:
                records[key] = {"error": "timeout"}
                break
    return records


def run_chunked(args, results):
    """Chunked execution path: consecutive pending jobs of the same dataset
    share one subprocess (one TPU client, warm compile caches)."""
    pending = []
    for job in args.jobs:
        parts = job.split(":", 3)
        model, dataset, train_file = parts[0], parts[1], parts[2]
        overrides = parts[3] if len(parts) > 3 else ""
        key = f"{model}/{dataset}{train_file or '_base'}"
        if overrides:
            key += "[" + overrides + "]"
        if key in results and "metrics" in results[key] and not args.force:
            print(f"skip {key} (already done)")
            continue
        pending.append((key, job, dataset))

    chunks = []
    for key, job, dataset in pending:
        if (chunks and len(chunks[-1]) < args.chunk
                and chunks[-1][0][2] == dataset):
            chunks[-1].append((key, job, dataset))
        else:
            chunks.append([(key, job, dataset)])

    dropped = []
    for chunk in chunks:
        keys = [k for k, _, _ in chunk]
        print(f"=== chunk: {keys} ===", flush=True)
        t0 = time.time()
        records = run_chunk([(k, j) for k, j, _ in chunk], args.epochs,
                            args.timeout)
        # retry just the transiently-failed subset (a chunk whose TPU client
        # wedges mid-way has mixed success + backend-init failures; ADVICE r3)
        retry = [(k, j) for k, j, _ in chunk
                 if transient_backend_failure(records.get(k, {}))]
        if retry:
            print(f"backend unavailable for {[k for k, _ in retry]}; "
                  "retrying in 300s", flush=True)
            time.sleep(300)
            records.update(run_chunk(retry, args.epochs, args.timeout))
        for key, record in records.items():
            record.setdefault("wall_s", round(time.time() - t0, 1))
            results[key] = record
            print(key, json.dumps(record)[:200], flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        missing = [k for k in keys if k not in records]
        if missing:
            print(f"chunk died before: {missing} (left uncached)", flush=True)
            dropped += missing
        time.sleep(75)  # axon cool-down between clients
    if dropped:
        print(f"PENDING (uncached, rerun to pick up): {dropped}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--jobs", nargs="+", required=True,
                        help="Model:dataset:train_file triples")
    parser.add_argument("--out", type=str, default="results.json")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--timeout", type=int, default=3600)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--chunk", type=int, default=1,
                        help="run up to N consecutive same-dataset jobs "
                             "inside one subprocess/TPU client "
                             "(scripts/run_chunk.py) — amortizes the axon "
                             "client init and the inter-client cool-down")
    args = parser.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    if args.chunk > 1:
        run_chunked(args, results)
        return

    for job in args.jobs:
        parts = job.split(":", 3)
        model, dataset, train_file = parts[0], parts[1], parts[2]
        overrides = parts[3] if len(parts) > 3 else ""
        key = f"{model}/{dataset}{train_file or '_base'}"
        if overrides:
            key += "[" + overrides + "]"
        if key in results and "metrics" in results[key] and not args.force:
            print(f"skip {key} (already done)")
            continue
        print(f"=== {key} ===", flush=True)
        t0 = time.time()
        try:
            record, _ = run_job(model, dataset, train_file, args.epochs,
                                args.timeout, overrides)
            if transient_backend_failure(record):
                # axon wedge/outage: the job fast-fails at client init, and so
                # would every job after it — back off once and retry before
                # recording, instead of burning the whole suite
                print(f"backend unavailable for {key}; retrying in 300s",
                      flush=True)
                time.sleep(300)
                record, _ = run_job(model, dataset, train_file, args.epochs,
                                    args.timeout, overrides)
        except subprocess.TimeoutExpired:
            record = {"error": "timeout"}
        record["wall_s"] = round(time.time() - t0, 1)
        results[key] = record
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(record)[:300], flush=True)
        time.sleep(75)  # axon quirk: a client starting <~1-2min after another exits wedges


if __name__ == "__main__":
    main()
