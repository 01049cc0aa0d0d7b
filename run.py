"""CLI: train + evaluate one model on one dataset.

Usage (mirrors the reference ``run.py``):
    python run.py -m SASRec -d amazon-toys [--root dataset] [--train-file _ori]
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="SASRec")
    parser.add_argument("--dataset", "-d", type=str, default="amazon-toys")
    parser.add_argument("--root", type=str, default="dataset", help="dataset root dir")
    parser.add_argument("--train-file", type=str, default=None,
                        help="override data.train_file (e.g. _ori, _regen)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--data-parallel", type=int, default=None,
                        help="size of the data mesh axis (default: all devices)")
    parser.add_argument("--shard-embedding", action="store_true",
                        help="row-shard the item table over the model axis")
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="size of the model mesh axis")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the harness pins "
                             "JAX_PLATFORMS=axon; this is the only override)")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="section.key=value",
                        help="config override, e.g. --set model.sub_model=SASRec")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dr4sr_tpu.config import load_config
    from dr4sr_tpu import quickstart

    if args.multihost:
        from dr4sr_tpu.parallel.mesh import init_distributed

        init_distributed()

    config = load_config(args.model, args.dataset)
    if args.train_file is not None:
        config["data"]["train_file"] = args.train_file
    # collected so wrapper trainers (MetaModel) can re-apply the explicit CLI
    # overrides to their freshly-loaded sub-model config — otherwise
    # --set train.seed=... / --epochs silently apply only to the meta loop
    cli: dict = {}
    if args.epochs is not None:
        cli.setdefault("train", {})["epochs"] = args.epochs
    for ov in args.overrides:
        key, _, value = ov.partition("=")
        section, _, name = key.partition(".")
        import yaml as _yaml

        cli.setdefault(section, {})[name] = _yaml.safe_load(value)
    for section, kv in cli.items():
        config.setdefault(section, {}).update(kv)
    config["_cli_overrides"] = cli

    mesh_plan = None
    if (args.data_parallel is not None and args.data_parallel > 1) or args.model_parallel > 1:
        from dr4sr_tpu.parallel.mesh import MeshPlan, create_mesh

        mesh_plan = MeshPlan(
            mesh=create_mesh(data=args.data_parallel, model=args.model_parallel),
            shard_embedding=args.shard_embedding,
        )

    out = quickstart.run(config, root=args.root, mesh_plan=mesh_plan)
    print(out)


if __name__ == "__main__":
    main()
