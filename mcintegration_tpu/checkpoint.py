"""Checkpoint / resume of trained integration state.

The reference has no serialization; its warm-start pattern is passing
``config=result.config`` into a new ``integrate`` call
(docs/src/index.md:129-150).  Here the trained state (grids, CDFs,
reweights) is an explicit plain-array pytree, so checkpointing is a
``np.savez`` away — resume either in-process (warm start) or across runs.
"""

from __future__ import annotations

import numpy as np

from .configuration import Configuration
from .models.variable import Continuous, Discrete, FermiK


def state_dict(config: Configuration) -> dict:
    out = {"reweight": config.reweight.copy(), "seed": np.asarray(config.seed)}
    for i, (_, leaf) in enumerate(config.var_leaves()):
        if isinstance(leaf, Continuous):
            out[f"leaf{i}_grid"] = leaf.grid.copy()
        elif isinstance(leaf, Discrete):
            out[f"leaf{i}_distribution"] = leaf.distribution.copy()
            out[f"leaf{i}_accumulation"] = leaf.accumulation.copy()
        out[f"leaf{i}_histogram"] = leaf.histogram.copy()
    return out


def load_state_dict(config: Configuration, state: dict):
    config.reweight[:] = state["reweight"]
    for i, (_, leaf) in enumerate(config.var_leaves()):
        if isinstance(leaf, Continuous):
            leaf.grid = np.asarray(state[f"leaf{i}_grid"], dtype=np.float64)
        elif isinstance(leaf, Discrete):
            leaf.distribution = np.asarray(state[f"leaf{i}_distribution"], np.float64)
            leaf.accumulation = np.asarray(state[f"leaf{i}_accumulation"], np.float64)
        leaf.histogram = np.asarray(state[f"leaf{i}_histogram"], dtype=np.float64)
    return config


def save_state(config: Configuration, path: str):
    np.savez(path, **state_dict(config))


def load_state(config: Configuration, path: str) -> Configuration:
    with np.load(path) as data:
        return load_state_dict(config, dict(data))
