"""Reproducibility helpers.

Reference equivalent: ``set_seed`` / ``seed_worker``
(`/root/reference/utils.py:138-160`).  In this framework all stochastic
device compute flows from explicit ``jax.random`` keys threaded through
the train loop, and all host-side data randomness flows from
``np.random.Generator`` objects seeded per (seed, epoch, batch, row)
tuples (see data/dataset.py) — so runs are reproducible by construction.
This function seeds the legacy global numpy/python RNGs for any stray
library code.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
