"""Sampling pipelines: pure-functional scan core + SAFREE/SLD math."""

from .safree import (
    f_beta,
    projection_and_orthogonal,
    projection_matrix,
    safree_projection,
    svf_beta,
)
from .sampler import GuidanceConfig, RepellencyWindow, sample_sd, sample_sd3

__all__ = [
    "GuidanceConfig", "RepellencyWindow", "sample_sd", "sample_sd3",
    "projection_matrix", "safree_projection", "projection_and_orthogonal",
    "svf_beta", "f_beta",
]
