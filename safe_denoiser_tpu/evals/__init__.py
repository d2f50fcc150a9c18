"""Evaluation stack: online gates (NudeNet/Q16) + offline metrics (FID/KID/
CLIPScore/AES/IS/style), rebuilt on the framework's own CLIP/Inception towers."""

from .clip_metrics import Q16Classifier, aes_score, clip_score, convert_aes_mlp
from .metrics import (
    frechet_distance,
    inception_score_from_logits,
    kid_from_features,
    stats_from_features,
)

__all__ = [
    "frechet_distance", "stats_from_features", "kid_from_features",
    "inception_score_from_logits",
    "clip_score", "Q16Classifier", "aes_score", "convert_aes_mlp",
]
