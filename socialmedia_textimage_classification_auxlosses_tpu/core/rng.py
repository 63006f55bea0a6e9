"""Threaded PRNG keys replacing the reference's global seeding.

The reference seeds two global RNGs per process (``torch.manual_seed`` /
``np.random.seed`` — reference ``run_mm_late.py:48-49``). Here every source of
randomness is an explicit ``jax.random`` key derived from one root seed, so a
compiled train step is a pure function and runs are reproducible across hosts
and device counts.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@dataclasses.dataclass
class RngStreams:
    """Named independent streams derived from one seed."""

    seed: int

    def __post_init__(self):
        self.root = jax.random.PRNGKey(self.seed)
        # Host-side numpy generator for data-order shuffling / subsampling
        # (mirrors the reference's np.random.seed(seed) usage).
        self.host = np.random.RandomState(self.seed)

    def fold(self, name: str, step: int = 0) -> jax.Array:
        key = jax.random.fold_in(self.root, _stable_hash(name))
        if step:
            key = jax.random.fold_in(key, step)
        return key


def _stable_hash(name: str) -> int:
    h = 0
    for ch in name.encode():
        h = (h * 131 + ch) % (2**31 - 1)
    return h
