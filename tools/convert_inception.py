"""OFFLINE converter: torchvision `inception_v3` weights -> npz for FID.

    python tools/convert_inception.py --pt inception_v3_google-*.pth \
        --out inception_fid.npz

Accepts a torchvision state_dict checkpoint (or a full module / torchscript
that exposes state_dict). Fills the reference's missing-`metrics` hole
(`/root/reference/g_nerf/train.py:31` imports a package its repo doesn't
ship) with pinned pretrained features so Fréchet numbers are comparable
across runs — see `gnerf_tpu/training/inception.py` and
`training/metrics.py::make_inception_feature_fn`.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True,
                    help="torchvision inception_v3 .pth (state_dict)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import numpy as np
    import torch

    from gnerf_tpu.training.inception import convert_torch_inception
    from gnerf_tpu.utils import checkpoint as ckpt_lib

    obj = torch.load(args.pt, map_location="cpu")
    if not isinstance(obj, dict):
        obj = obj.state_dict()
    state = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v) for k, v in obj.items()}
    tree = convert_torch_inception(state)
    ckpt_lib.save_checkpoint(
        args.out, {"inception": tree},
        config={"source": os.path.basename(args.pt), "pretrained": True,
                "feature": "pool3-2048"})
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"wrote {args.out}: {n / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
