"""Tracing / profiling helpers (aux subsystem, SURVEY.md section 5.1).

Replaces the reference's `misc.profiled_function` /
`torch.autograd.profiler.record_function` scopes with `jax.profiler`
equivalents: named traces show up in TensorBoard / Perfetto captures."""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Optional

import jax


def profiled_function(fn):
    """Wrap a function in a named jax profiler trace scope."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def trace(run_dir: str):
    """Capture a device trace for the enclosed block:

        with profiling.trace('/tmp/trace'):
            step(...)
    View with TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(run_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@jax.jit
def _fence_sum(leaf):
    # fp32-ACCUMULATING reduce, jitted: the naive eager
    # `jnp.sum(l.astype(f32))` materializes a full fp32 copy of the leaf
    # first — on multi-GB bf16 outputs (the 96-spp packed-rows tensors)
    # that transient doubles the footprint and OOMs the profiler.
    import jax.numpy as jnp

    return jnp.sum(leaf, dtype=jnp.float32)


def scalar_fence(x) -> float:
    """Force completion of a computation by fetching a scalar reduction.

    Through the axon dev relay `block_until_ready` is NOT a reliable
    barrier (CLAUDE.md); summing every leaf to one host float is. Returns
    the float so callers can also use it as a cheap checksum."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(_fence_sum(l) for l in leaves))


def timed_median(fn, *args, reps: int = 3, warmup: int = 1) -> float:
    """Median wall seconds of fn(*args), scalar-fenced (see scalar_fence).

    THE timing recipe for every profiler in tools/ — one implementation so
    BASELINE.md rows stay cross-tool comparable. NB: isolated calls carry
    ~30 ms relay dispatch overhead; prefer config ablation of the full
    program for sub-stage attribution (CLAUDE.md)."""
    import numpy as np

    for _ in range(warmup):
        scalar_fence(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        scalar_fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


class StepTimer:
    """sec/tick + sec/kimg status-line bookkeeping (the reference's
    training_loop status fields)."""

    def __init__(self):
        self.start = time.time()
        self.tick_start = self.start
        self.tick_start_nimg = 0

    def tick(self, cur_nimg: int) -> dict:
        now = time.time()
        dt = now - self.tick_start
        dn = max(cur_nimg - self.tick_start_nimg, 1)
        out = {
            "Timing/total_sec": now - self.start,
            "Timing/sec_per_tick": dt,
            "Timing/sec_per_kimg": dt / (dn / 1000.0),
        }
        self.tick_start = now
        self.tick_start_nimg = cur_nimg
        return out
