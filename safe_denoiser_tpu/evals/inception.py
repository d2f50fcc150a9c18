"""FID InceptionV3 (Flax, NHWC) — the pool3 feature extractor.

Architectural parity with the network the reference FID uses
(evaluations/utils/inception.py — pytorch-fid's `pt_inception-2015-12-05`
variant of torchvision inception_v3): the FID-specific deviations are
reproduced — average pools inside Inception blocks exclude padding
(count_include_pad=False), Mixed_7b (E_1) uses average branch-pool while
Mixed_7c (E_2) uses max branch-pool, and the classifier head has 1008
logits. Inference-only: BatchNorm runs from stored running statistics held
in the params tree.

Input: [B, 299, 299, 3] in [0, 1]; ``normalize_input`` maps to [-1, 1]
(pytorch-fid semantics). Outputs (pool3 [B, 2048], logits [B, 1008]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_edge_excl(x, window=3):
    """3×3 stride-1 SAME average pool with count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                 (1, window, window, 1), (1, 1, 1, 1), "SAME")
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                (1, window, window, 1), (1, 1, 1, 1), "SAME")
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1),
                                 (1, stride, stride, 1), padding)


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple[int, int] = (3, 3)
    stride: int = 1
    padding: tuple[tuple[int, int], tuple[int, int]] | int = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.out_channels, self.kernel,
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.out_channels,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones,
                         (self.out_channels,), jnp.float32)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_edge_excl(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_edge_excl(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


class InceptionE(nn.Module):
    max_branch_pool: bool = False  # True for Mixed_7c (FIDInceptionE_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        if self.max_branch_pool:
            bp = _max_pool(x, 3, 1, "SAME")
        else:
            bp = _avg_pool_edge_excl(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    normalize_input: bool = True
    num_classes: int = 1008

    @nn.compact
    def __call__(self, x):
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(max_branch_pool=True, name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))                      # [B, 2048]
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return pool3, logits


def convert_inception(sd) -> dict:
    """pt_inception/torchvision state dict → InceptionV3 params."""
    params: dict = {}
    convs: dict[str, dict] = {}
    for key, val in sd.items():
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "fc":
            params.setdefault("fc", {})[
                "kernel" if parts[1] == "weight" else "bias"] = (
                np.ascontiguousarray(val.T) if parts[1] == "weight" else val)
            continue
        if parts[-2] == "conv" and parts[-1] == "weight":
            path = ".".join(parts[:-2])
            convs.setdefault(path, {})["conv"] = {
                "kernel": np.ascontiguousarray(np.transpose(val, (2, 3, 1, 0)))}
        elif parts[-2] == "bn":
            path = ".".join(parts[:-2])
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}.get(parts[-1])
            if name:
                convs.setdefault(path, {})[name] = val
    for path, leaf in convs.items():
        node = params
        for part in path.split("."):
            node = node.setdefault(part, {})
        node.update(leaf)
    return {"params": params}
