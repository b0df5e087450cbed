"""Distributed scalar training statistics.

Equivalent of the reference `torch_utils/training_stats.py`: each metric
accumulates a [count, sum, sum-of-squares] moment triple; cross-replica
reduction is a `psum` of the triples inside the jitted step (instead of a
separate all_reduce pass); the host-side Collector turns deltas into
mean/std and streams them to stats.jsonl."""

from __future__ import annotations

import json
import re
import time
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def moments(x: jax.Array) -> jax.Array:
    """[n, sum, sum_sq] float32 triple of a tensor (device-side)."""
    x = x.astype(jnp.float32).reshape(-1)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(x * x)])


def psum_stats(stats: Mapping[str, jax.Array], axis_name: str) -> dict:
    """Reduce a dict of moment triples across replicas inside pmap/shard_map."""
    return {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}


class Collector:
    """Accumulates moment triples on host and reports mean/std.

    Mirrors reference `training_stats.Collector` (regex filter, as_dict,
    jsonl streaming)."""

    def __init__(self, regex: str = ".*"):
        self.regex = re.compile(regex)
        self._totals: dict[str, np.ndarray] = {}
        self._deltas: dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        """Accumulate a scalar or tensor of raw values."""
        value = np.asarray(jax.device_get(value), dtype=np.float64)
        flat = value.reshape(-1)
        self._fold(name, np.array([flat.size, flat.sum(), (flat * flat).sum()]))

    def report_moments(self, name: str, triple) -> None:
        """Accumulate a precomputed [n, sum, sum_sq] triple (from
        `moments()` / `psum_stats()` on device)."""
        triple = np.asarray(jax.device_get(triple), dtype=np.float64)
        assert triple.shape == (3,)
        self._fold(name, triple)

    def _fold(self, name: str, m: np.ndarray) -> None:
        for store in (self._totals, self._deltas):
            store[name] = store.get(name, np.zeros(3)) + m

    def update(self) -> dict[str, dict]:
        """Flush deltas -> {name: {num, mean, std}}."""
        out = {}
        for name, m in self._deltas.items():
            if not self.regex.fullmatch(name):
                continue
            n, s, ss = m
            mean = s / max(n, 1)
            var = max(ss / max(n, 1) - mean * mean, 0.0)
            out[name] = {"num": int(n), "mean": float(mean), "std": float(np.sqrt(var))}
        self._deltas = {}
        self._last = out
        return out

    def as_dict(self) -> dict[str, dict]:
        return dict(getattr(self, "_last", {}))

    def write_jsonl(self, path: str, extra: Optional[Mapping[str, Any]] = None) -> None:
        entry = {k: v for k, v in self.as_dict().items()}
        entry["timestamp"] = time.time()
        if extra:
            entry.update(extra)
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")
