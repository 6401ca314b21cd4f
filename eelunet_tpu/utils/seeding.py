"""Seeding utilities (reference set_seed, train.py:24-33).

JAX is functionally seeded via PRNG keys threaded through the TrainState, so
there is no cudnn-determinism switch to flip; this helper seeds the host-side
numpy RNG (data shuffling) and returns the root JAX key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def set_seed(seed: Optional[int] = None) -> Tuple[int, jax.Array]:
    if seed is None:
        seed = int(np.random.randint(0, 10000))
        print(f"Using seed: {seed}")
    np.random.seed(seed)
    return seed, jax.random.PRNGKey(seed)
