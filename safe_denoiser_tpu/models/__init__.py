"""Model zoo: SD-v1.x (UNet/VAE/CLIP) and SD3 (MMDiT/VAE/CLIP-L/bigG/T5)."""

from .clip_text import CLIP_BIG_G, CLIP_VIT_L_14, CLIPTextConfig, CLIPTextModel
from .clip_vision import (
    CLIP_VISION_VIT_B_32,
    CLIP_VISION_VIT_H_14,
    CLIP_VISION_VIT_L_14,
    CLIPVisionConfig,
    CLIPVisionModel,
    preprocess_clip,
)
from .fourier import FreeUConfig
from .openclip_factory import create_model_and_transforms
from .mmdit import MMDiT, MMDiTConfig, SD3_MEDIUM
from .t5 import T5Config, T5Encoder, T5_XXL
from .unet import SD14_UNET, UNet2DCondition, UNetConfig
from .vae import SD14_VAE, SD3_VAE, AutoencoderKL, VAEConfig

__all__ = [
    "AutoencoderKL", "VAEConfig", "SD14_VAE", "SD3_VAE",
    "UNet2DCondition", "UNetConfig", "SD14_UNET",
    "CLIPTextModel", "CLIPTextConfig", "CLIP_VIT_L_14", "CLIP_BIG_G",
    "CLIPVisionModel", "CLIPVisionConfig", "CLIP_VISION_VIT_L_14",
    "CLIP_VISION_VIT_B_32", "CLIP_VISION_VIT_H_14", "preprocess_clip", "create_model_and_transforms",
    "MMDiT", "MMDiTConfig", "SD3_MEDIUM",
    "T5Encoder", "T5Config", "T5_XXL",
    "FreeUConfig",
]
