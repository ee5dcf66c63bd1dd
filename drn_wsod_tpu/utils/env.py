"""Environment helpers (reference: detectron2/utils/{env,collect_env}.py)."""

from __future__ import annotations

import os
import random
import sys

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed numpy + python RNGs; returns the seed
    (reference env.py seed_all_rng). JAX randomness is explicit PRNG keys,
    so nothing global to seed there."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def collect_env_info() -> str:
    import jax
    import flax
    import optax

    lines = [
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"flax: {flax.__version__}",
        f"optax: {optax.__version__}",
        f"numpy: {np.__version__}",
        f"devices: {jax.devices()}",
        f"default backend: {jax.default_backend()}",
    ]
    return "\n".join(lines)
