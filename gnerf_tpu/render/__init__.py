"""L3 volumetric rendering core."""

from .importance import sample_importance, sample_pdf, sample_stratified, smooth_weights
from .math_utils import get_ray_limits_box, linspace_batched, normalize_vecs
from .ray_marcher import march_rays
from .ray_sampler import sample_rays
from .renderer import (
    PackedPlanes,
    pack_planes,
    project_onto_planes,
    march_merged,
    render_rays,
    run_model,
    sample_from_planes,
    sample_packed_planes,
    unify_samples,
)

__all__ = [
    "get_ray_limits_box",
    "linspace_batched",
    "march_merged",
    "march_rays",
    "normalize_vecs",
    "PackedPlanes",
    "pack_planes",
    "sample_packed_planes",
    "project_onto_planes",
    "render_rays",
    "run_model",
    "sample_from_planes",
    "sample_importance",
    "sample_pdf",
    "sample_rays",
    "sample_stratified",
    "smooth_weights",
    "unify_samples",
]
