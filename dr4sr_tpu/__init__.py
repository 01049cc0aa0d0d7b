"""dr4sr_tpu — a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
USTC-StarTeam/DR4SR ("Dataset Regeneration for Sequential Recommendation",
KDD'24): pattern mining, diversity-promoted dataset regeneration, sequential
recommenders (SASRec / GRU4Rec / FMLP / CL4SRec / GNN), and bilevel
(implicit-gradient) sample reweighting — built SPMD-first on a
``jax.sharding.Mesh`` with Pallas kernels on the hot paths.

Layering (bottom → top):
    config  -> data -> modules/ops -> models -> train -> quickstart CLIs
    parallel (mesh/sharding) cuts across data/models/train.
    regen + meta are vertical features on top of the core stack.
"""

__version__ = "0.1.0"

from dr4sr_tpu.config import load_config  # noqa: F401
