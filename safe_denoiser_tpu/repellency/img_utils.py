"""Image-domain utilities (reference repellency/utils/img_utils.py +
fastmri_utils.py, inherited from a diffusion-posterior-sampling codebase).

The reference never imports these from its own pipelines (SURVEY.md §2.1
marks them dead), but they are part of the published surface; the genuinely
reusable pieces are provided here as pure jnp functions:

  * centered 2-D FFT pair (``fft2c``/``ifft2c`` — fastmri_utils semantics)
  * ``dynamic_thresholding`` — Imagen-style percentile clamp of x̂₀, wired
    to the task-YAML ``mean_processor.dynamic_threshold`` flag
  * ``gaussian_blur_kernel`` / ``apply_blur`` — degradation kernels
  * ``mask_generator`` — box/random inpainting masks
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2-D FFT over the last two axes."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.fftn(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifft2c(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    x = jnp.fft.ifftn(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def dynamic_thresholding(x0: jnp.ndarray, percentile: float = 0.995,
                         floor: float = 1.0) -> jnp.ndarray:
    """Percentile-clamp + rescale of the Tweedie estimate (per sample)."""
    n = x0.shape[0]
    flat = jnp.abs(x0.reshape(n, -1))
    s = jnp.quantile(flat, percentile, axis=-1)
    s = jnp.maximum(s, floor)[:, None, None, None]
    return jnp.clip(x0, -s, s) / s


def gaussian_blur_kernel(size: int, sigma: float) -> np.ndarray:
    """[size, size] normalized Gaussian kernel."""
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def apply_blur(images: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Depthwise 2-D convolution of NHWC images with one blur kernel."""
    c = images.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))                       # HWIO, per-channel
    return jax.lax.conv_general_dilated(
        images, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def mask_generator(shape: tuple[int, int], mask_type: str = "box",
                   box_size: int = 128, prob: float = 0.5,
                   seed: int = 0) -> np.ndarray:
    """[H, W] binary mask: 1 = keep, 0 = masked."""
    h, w = shape
    rng = np.random.RandomState(seed)
    mask = np.ones((h, w), dtype=np.float32)
    if mask_type == "box":
        top = rng.randint(0, max(h - box_size, 1))
        left = rng.randint(0, max(w - box_size, 1))
        mask[top:top + box_size, left:left + box_size] = 0.0
    elif mask_type == "random":
        mask = (rng.rand(h, w) > prob).astype(np.float32)
    else:
        raise ValueError(f"unknown mask_type {mask_type}")
    return mask
