"""L6 inference surface: video generation + shape extraction."""

from .shape_utils import (
    convert_mrc,
    create_samples,
    extract_sigma_grid,
    marching_tetrahedra,
    read_mrc,
    write_mrc,
    write_ply,
)

__all__ = [
    "convert_mrc",
    "create_samples",
    "extract_sigma_grid",
    "marching_tetrahedra",
    "read_mrc",
    "write_mrc",
    "write_ply",
]
