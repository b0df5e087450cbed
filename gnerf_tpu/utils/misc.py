"""Runtime utilities: shape asserts, EMA, infinite sampler, summaries.

JAX equivalents of the reference `torch_utils/misc.py` pieces the framework
actually needs (shape assertions, the InfiniteSampler data-sharding
iterator, EMA parameter tracking, module summaries)."""

from __future__ import annotations

from typing import Any, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(x: jax.Array, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert tensor shape; None entries are wildcards
    (reference `misc.assert_shape`, `torch_utils/misc.py:84-97`)."""
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dims: got {x.ndim}, expected {len(ref_shape)}")
    for i, (size, ref) in enumerate(zip(x.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(f"Wrong size for dim {i}: got {size}, expected {ref}")


def nan_to_num(tree: Any, nan=0.0, posinf=1e5, neginf=-1e5) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf), tree
    )


def ema_update(ema_tree: Any, new_tree: Any, beta: float) -> Any:
    """ema = ema*beta + new*(1-beta), leafwise (G_ema tracking)."""
    return jax.tree_util.tree_map(
        lambda e, n: e * beta + n.astype(e.dtype) * (1 - beta), ema_tree, new_tree
    )


def ema_beta_from_kimg(batch_size: int, ema_kimg: float, ema_rampup=None,
                       cur_nimg: int = 0) -> float:
    """StyleGAN2-style EMA half-life schedule."""
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))


class InfiniteSampler:
    """Endless shuffled index stream, sharded across hosts.

    Host-side equivalent of reference `misc.InfiniteSampler`
    (`torch_utils/misc.py:113-144`): every num_replicas-th index of an
    endlessly reshuffled order, with a window-swap perturbation."""

    def __init__(self, dataset_size: int, rank: int = 0, num_replicas: int = 1,
                 shuffle: bool = True, seed: int = 0, window_size: float = 0.5):
        assert dataset_size > 0
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def count_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def print_module_summary(name: str, tree: Any) -> None:
    """Parameter-count table per top-level entry
    (spirit of reference `misc.print_module_summary`)."""
    print(f"\n{name:<40s} {'params':>12s}")
    print("-" * 54)
    if isinstance(tree, dict):
        for key in sorted(tree):
            print(f"{key:<40s} {count_params(tree[key]):>12,d}")
    print("-" * 54)
    print(f"{'Total':<40s} {count_params(tree):>12,d}")
