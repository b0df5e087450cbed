"""Checkpoint I/O: param pytrees as flat npz archives (+ torch converter).

Replaces the reference's source-embedding pickle system
(`/root/reference/g_nerf/torch_utils/persistence.py`,
`legacy.py:24-61`): instead of pickling live nn.Modules with their source
code, checkpoints here are (config dict, flat name->ndarray) pairs — fully
inspectable, no code execution on load, and trivially mappable onto any
device mesh. A converter ingests the reference's torch `state_dict`
name space (exported offline with torch, never in the serving path) and
rewrites it into our tree layout.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, f"{path}{SEP}{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}{SEP}{i}" if path else str(i))
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def unflatten_tree(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_checkpoint(path: str, trees: Mapping[str, Any],
                    config: Optional[Mapping[str, Any]] = None) -> None:
    """Save named pytrees (e.g. {'G': ..., 'E': ..., 'D': ...}) + config.

    Layout mirrors the reference pkl keys (G_ema / E / D) so the two formats
    correspond 1:1.
    """
    flat: dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(flatten_tree(tree, prefix=name))
    if config is not None:
        flat["__config__"] = np.frombuffer(
            json.dumps(config).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_checkpoint(path: str) -> tuple[dict[str, Any], Optional[dict]]:
    """Returns ({name: pytree}, config_dict_or_None)."""
    data = np.load(path, allow_pickle=False)
    config = None
    flat: dict[str, np.ndarray] = {}
    for key in data.files:
        if key == "__config__":
            config = json.loads(bytes(data[key]).decode())
        else:
            flat[key] = data[key]
    roots: dict[str, dict[str, np.ndarray]] = {}
    for key, value in flat.items():
        root, rest = key.split(SEP, 1)
        roots.setdefault(root, {})[rest] = value
    return {r: unflatten_tree(f) for r, f in roots.items()}, config


def copy_params(src_tree: Any, dst_tree: Any, verbose: bool = True) -> Any:
    """Shape-tolerant parameter copy: leaves present in both trees with
    matching shapes are taken from src, everything else keeps dst — the
    resume semantics of reference `misc.copy_params_and_buffers`
    (`torch_utils/misc.py:157-184`)."""
    src = flatten_tree(src_tree)
    dst = flatten_tree(dst_tree)
    out: dict[str, np.ndarray] = {}
    for name, value in dst.items():
        if name in src and src[name].shape == value.shape:
            out[name] = src[name]
        else:
            if verbose and name in src:
                print(f"copy_params: shape mismatch at {name}: "
                      f"{src[name].shape} vs {value.shape}, keeping dst")
            elif verbose:
                print(f"copy_params: {name} missing in src, keeping dst")
            out[name] = value
    return unflatten_tree(out)


# ---------------------------------------------------------------------------
# Orbax backend (optional; same tree layout, async-capable, multi-host-safe)


def save_checkpoint_orbax(path: str, trees: Mapping[str, Any],
                          config: Optional[Mapping[str, Any]] = None) -> None:
    """Save via orbax (directory-based; preferred for large multi-host runs)."""
    import orbax.checkpoint as ocp

    payload = dict(trees)
    if config is not None:
        payload["__config__"] = {
            "json": np.frombuffer(json.dumps(config).encode(), dtype=np.uint8).copy()
        }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> tuple[dict[str, Any], Optional[dict]]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    config = None
    if "__config__" in payload:
        raw = np.asarray(payload.pop("__config__")["json"], dtype=np.uint8)
        config = json.loads(raw.tobytes().decode())
    return dict(payload), config


# ---------------------------------------------------------------------------
# Torch state_dict conversion (offline tool; torch tensors arrive as numpy)


def convert_torch_encoder(state: Mapping[str, np.ndarray]) -> dict:
    """Map a reference ResNeXt50 encoder state_dict (torchvision names under
    `model.`, plus `fc.`) onto the ResNeXt50Encoder tree."""
    flat: dict[str, np.ndarray] = {}

    def bn(dst, src):
        flat[f"{dst}{SEP}scale"] = state[f"{src}.weight"]
        flat[f"{dst}{SEP}bias"] = state[f"{src}.bias"]

    flat["conv1"] = state["model.conv1.weight"]
    bn("bn1", "model.bn1")
    for stage in range(1, 5):
        b = 0
        while f"model.layer{stage}.{b}.conv1.weight" in state:
            src = f"model.layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            for i in (1, 2, 3):
                flat[f"{dst}{SEP}conv{i}"] = state[f"{src}.conv{i}.weight"]
                bn(f"{dst}{SEP}bn{i}", f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in state:
                flat[f"{dst}{SEP}downsample_conv"] = state[f"{src}.downsample.0.weight"]
                bn(f"{dst}{SEP}downsample_bn", f"{src}.downsample.1")
            b += 1
    flat[f"fc{SEP}weight"] = state["fc.weight"]
    flat[f"fc{SEP}bias"] = state["fc.bias"]
    return unflatten_tree(flat)


def convert_torch_encoder_state(state: Mapping[str, np.ndarray]) -> dict:
    """Running BN statistics for the encoder (the `state` tree)."""
    flat: dict[str, np.ndarray] = {}

    def bn(dst, src):
        flat[f"{dst}{SEP}mean"] = state[f"{src}.running_mean"]
        flat[f"{dst}{SEP}var"] = state[f"{src}.running_var"]

    bn("bn1", "model.bn1")
    for stage in range(1, 5):
        b = 0
        while f"model.layer{stage}.{b}.conv1.weight" in state:
            src = f"model.layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            for i in (1, 2, 3):
                bn(f"{dst}{SEP}bn{i}", f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in state:
                bn(f"{dst}{SEP}downsample_bn", f"{src}.downsample.1")
            b += 1
    return unflatten_tree(flat)


def convert_torch_generator(state: Mapping[str, np.ndarray]) -> dict:
    """Map a reference TriPlaneGenerator state_dict onto our G tree.

    Name correspondences (reference -> ours):
      backbone.mapping.fcN.*          -> backbone/mapping/fcN/*
      backbone.mapping.w_avg          -> backbone/mapping/w_avg
      backbone.synthesis.bR.*        -> backbone/synthesis/bR/*
      decoder.net.0/2.*               -> decoder/fc0|fc1/*
      superresolution.blockX.*        -> superresolution/blockX/*
    Noise constants ride along so noise_mode='const' is reproducible.
    """
    flat: dict[str, np.ndarray] = {}
    for name, value in state.items():
        n = name
        n = n.replace("backbone.mapping.", f"backbone{SEP}mapping{SEP}")
        n = n.replace("backbone.synthesis.", f"backbone{SEP}synthesis{SEP}")
        n = n.replace("decoder.net.0.", f"decoder{SEP}fc0{SEP}")
        n = n.replace("decoder.net.2.", f"decoder{SEP}fc1{SEP}")
        n = n.replace("superresolution.", f"superresolution{SEP}")
        n = n.replace(".", SEP)
        if n.endswith(f"{SEP}resample_filter"):
            continue  # filters are recomputed, not parameters
        flat[n] = value
    return unflatten_tree(flat)
