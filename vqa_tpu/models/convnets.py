"""CNN feature extractors for the offline grid path (SURVEY.md C15).

Flax ResNet-{50,101,152} producing the legacy grid features the reference
lineage extracts with torchvision: a [14x14, 2048] grid ('att' mode, stored
region-major — the TPU layout our attention kernels consume — rather than
the reference's CHW) or a pooled [2048] vector ('noatt').

Off the hot path by design (BASELINE north star: the training/eval pipeline
consumes precomputed features). Pretrained weights are unobtainable in this
offline image; pass --params (an .npz of this module's param tree) to load
weights, otherwise extraction runs with seeded random init — the pipeline
mechanics (decode -> batch -> jit forward -> HDF5 shards) are what this
component provides.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_DEPTHS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, use_bias=False, name="conv1")(x)
        y = jax.nn.relu(norm("bn1")(y))
        # explicit pad=1 (not SAME): for the strided 3x3 convs SAME pads
        # (0,1) on even inputs while the torchvision lineage pads (1,1) —
        # one-pixel window misalignment that breaks imported-weight parity
        # (pinned by tests/test_importers.py)
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype, use_bias=False, name="conv2",
        )(y)
        y = jax.nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), dtype=self.dtype, use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), (self.strides, self.strides),
                dtype=self.dtype, use_bias=False, name="proj",
            )(residual)
            residual = norm("bn_proj")(residual)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        """images [B, 448, 448, 3] -> conv5 grid [B, 14, 14, 2048]."""
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, use_bias=False, name="stem")(x)
        x = jax.nn.relu(
            nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_stem")(x)
        )
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    64 * 2**stage, strides, self.dtype, name=f"s{stage}_b{block}"
                )(x, train=train)
        return x


def factory(arch: str, dtype=jnp.float32) -> ResNet:
    if arch not in _DEPTHS:
        raise KeyError(f"unknown convnet {arch!r}; known: {sorted(_DEPTHS)}")
    return ResNet(stage_sizes=_DEPTHS[arch], dtype=dtype)


def grid_features(grid: jax.Array, mode: str) -> jax.Array:
    """conv5 [B, 14, 14, 2048] -> 'att' [B, 196, 2048] | 'noatt' [B, 2048]."""
    b, h, w, d = grid.shape
    if mode == "att":
        return grid.reshape(b, h * w, d)
    if mode == "noatt":
        return grid.mean(axis=(1, 2))
    raise KeyError(f"mode must be att|noatt, got {mode!r}")
