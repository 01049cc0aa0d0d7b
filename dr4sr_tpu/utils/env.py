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


def setup_environment(train_config: Dict[str, Any]) -> None:
    seed_everything(int(train_config.get("seed", 2023)))
    if train_config.get("debug_nans"):
        import jax

        jax.config.update("jax_debug_nans", True)
    if train_config.get("disable_jit"):
        import jax

        jax.config.update("jax_disable_jit", True)
