"""Environment setup.

The reference seeds torch/np/random and pins CUDA devices
(``utils/utils.py:13-30``). Under JAX, randomness is explicit (threaded PRNG
keys), so "seeding" means choosing the root key; numpy seeding covers the
host-side input pipeline. Debug toggles map to JAX equivalents of the
reference's ``detect_anomaly``: NaN checks and disabled jit.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict

import numpy as np


def seed_everything(seed: int = 1111) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def apply_platform_override() -> None:
    """Honor ``DR4SR_PLATFORM`` (e.g. ``cpu``). The harness pins
    ``JAX_PLATFORMS=axon`` at the env level, which JAX reads before any
    config update — this is the only way to force another backend for a
    whole subprocess tree (orchestrators set it when the TPU tunnel is
    down)."""
    plat = os.environ.get("DR4SR_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: repeat CLI invocations (pipeline
    stages, suite runs) skip the multi-minute recompile."""
    import jax

    apply_platform_override()
    path = path or os.environ.get(
        "DR4SR_COMPILE_CACHE", os.path.expanduser("~/.cache/dr4sr_jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass


def setup_environment(train_config: Dict[str, Any]) -> None:
    seed_everything(int(train_config.get("seed", 2023)))
    if not train_config.get("no_compile_cache"):
        enable_compilation_cache()
    if train_config.get("debug_nans"):
        import jax

        jax.config.update("jax_debug_nans", True)
    if train_config.get("disable_jit"):
        import jax

        jax.config.update("jax_disable_jit", True)
    if train_config.get("rng_impl"):
        # train.rng_impl: rbg — the TPU-cheap counter RNG for dropout/
        # sampling keys. The validated stress decomposition
        # (results_stress_decompose.json) measured the B128/L512/D256/1M
        # train step at 110 ms with the default threefry vs 64 ms with rbg
        # (-42%): threefry mask generation is a major VPU cost at big
        # activation shapes. Default stays threefry for bit-compatibility
        # with earlier rounds' recorded runs.
        import jax

        jax.config.update("jax_default_prng_impl",
                          str(train_config["rng_impl"]))
