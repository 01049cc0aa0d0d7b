"""Run several suite jobs inside ONE process / ONE TPU client.

Each axon TPU client pays a multi-minute init (tunnel handshake + first
compile) and the suite adds a 75s cool-down between client exits; running a
chunk of same-shape jobs (e.g. the seed pair of a base/regen arm) in one
process amortizes both — seed-only variants of the same config reuse the
in-process/persistent compile caches.

Protocol: for every job spec (run_suite's ``Model:dataset:train_file[:ov]``)
one flushed line is emitted:

    RESULT\t<key>\t<json record>

where ``key`` matches run_suite's cache key and the record is either
``{"metrics": {...}, "wall_s": s}`` or ``{"error": "...", "tail": "..."}``.
A job failure (including a dead TPU client) does not abort the chunk.
"""

import argparse
import json
import os
import signal
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def job_key(model, dataset, train_file, overrides):
    key = f"{model}/{dataset}{train_file or '_base'}"
    if overrides:
        key += "[" + overrides + "]"
    return key


def build_config(model, dataset, train_file, epochs, overrides):
    """Mirror run.py's config assembly (load + train-file + CLI overrides)."""
    import yaml

    from dr4sr_tpu.config import load_config

    config = load_config(model, dataset)
    if train_file is not None:
        config["data"]["train_file"] = train_file
    cli: dict = {}
    if epochs is not None:
        cli.setdefault("train", {})["epochs"] = epochs
    for ov in filter(None, overrides.split(",")):
        key, _, value = ov.partition("=")
        section, _, name = key.partition(".")
        cli.setdefault(section, {})[name] = yaml.safe_load(value)
    for section, kv in cli.items():
        config.setdefault(section, {}).update(kv)
    config["_cli_overrides"] = cli
    return config


class JobTimeout(Exception):
    pass


def _alarm(signum, frame):  # noqa: ARG001
    raise JobTimeout()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--jobs", nargs="+", required=True)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--root", type=str, default="dataset")
    parser.add_argument("--timeout", type=int, default=0,
                        help="per-job watchdog (s); 0 disables. Best-effort "
                             "SIGALRM so one hung job cannot silently burn "
                             "the whole pooled chunk budget (ADVICE r3): the "
                             "handler fires between Python bytecodes, which "
                             "covers the epoch loop, though not a wedged "
                             "blocking C call inside a single XLA dispatch.")
    args = parser.parse_args()

    from dr4sr_tpu import quickstart

    if args.timeout > 0:
        signal.signal(signal.SIGALRM, _alarm)

    for job in args.jobs:
        parts = job.split(":", 3)
        model, dataset, train_file = parts[0], parts[1], parts[2]
        overrides = parts[3] if len(parts) > 3 else ""
        key = job_key(model, dataset, train_file, overrides)
        t0 = time.time()
        try:
            if args.timeout > 0:
                signal.alarm(args.timeout)
            config = build_config(model, dataset, train_file, args.epochs,
                                  overrides)
            out = quickstart.run(config, root=args.root)
            record = {"metrics": {k: float(v) for k, v in out.items()},
                      "wall_s": round(time.time() - t0, 1)}
        except JobTimeout:
            record = {"error": "timeout",
                      "tail": f"per-job watchdog fired at {args.timeout}s",
                      "wall_s": round(time.time() - t0, 1)}
            # the interrupted dispatch may have wedged this process's TPU
            # client; running the rest of the chunk against it would burn
            # up to timeout seconds each on serial failures (ADVICE r4
            # low-#5). Emit this record and abort — run_suite leaves the
            # unreached jobs uncached and reports them PENDING, so a rerun
            # picks them up in a fresh client.
            print(f"RESULT\t{key}\t{json.dumps(record)}", flush=True)
            print("CHUNK_ABORT: job timeout — remaining jobs left uncached "
                  "for a fresh client", flush=True)
            if args.timeout > 0:
                signal.alarm(0)
            sys.exit(3)
        except Exception as exc:  # noqa: BLE001 - keep the chunk alive
            tail = traceback.format_exc().splitlines()[-12:]
            record = {"error": f"{type(exc).__name__}: {exc}",
                      "tail": "\n".join(tail),
                      "wall_s": round(time.time() - t0, 1)}
        finally:
            if args.timeout > 0:
                signal.alarm(0)
        print(f"RESULT\t{key}\t{json.dumps(record)}", flush=True)


if __name__ == "__main__":
    main()
