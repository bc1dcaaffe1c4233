"""CNN 3DMM-coefficient regressor — SURVEY.md §3 C14.

ResNet-50-style flax backbone with a final dense head emitting the
concatenated coefficient vector (BASELINE.json:5 "CNN 3DMM-coefficient
regressor ... compiles to XLA"). TPU-first choices:
  - bfloat16 activations/conv compute (MXU-native), float32 params and
    float32 head output so coefficients keep full precision;
  - BatchNorm statistics in float32 (flax's forced-f32 reductions) with
    BN input/output in the model dtype — f32 BN I/O measured as pure
    activation-bandwidth fat in the stem/s1/s2 stages;
  - NHWC layout (XLA:TPU's preferred conv layout).

The final dense head is zero-initialized so an untrained net predicts the
mean face (all-zero coefficients) — the standard stable self-supervised
start for this model family.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from facerecon_tpu.config import FaceReconConfig


class BottleneckBlock(nn.Module):
    features: int
    strides: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        # BN I/O in the model dtype: flax computes the batch statistics in
        # f32 regardless (normalization._compute_stats
        # force_float32_reductions), so bf16 here only rounds the
        # normalized output — and halves the elementwise HBM traffic of
        # every BN+relu chain fwd AND bwd (the off-roofline fat in the
        # stem/s1/s2 stages was exactly these f32 activation passes).
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1))(x)
        y = nn.relu(norm()(y))
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides))(y)
        y = nn.relu(norm()(y))
        y = conv(self.features * 4, (1, 1))(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides))(residual)
            residual = norm()(residual)
        return nn.relu(y + residual.astype(y.dtype))


class ResNetRegressor(nn.Module):
    """ResNet backbone -> global pool -> dense coeff head."""
    n_coeff: int
    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    width: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images (B,H,W,3) float32 in [0,1] -> coeffs (B,n_coeff) float32."""
        x = images.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)  # f32 stats

        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if (i > 0 and b == 0) else 1
                x = BottleneckBlock(self.width * 2 ** i, strides,
                                    self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))             # global average pool
        x = x.astype(jnp.float32)
        # zero-init head: untrained net -> mean face (stable self-sup start)
        return nn.Dense(self.n_coeff, param_dtype=jnp.float32,
                        dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros)(x)


def build_model(cfg: FaceReconConfig, depth: int = 50,
                dtype=jnp.bfloat16) -> ResNetRegressor:
    stages = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}[depth]
    return ResNetRegressor(n_coeff=cfg.n_coeff, stage_sizes=stages,
                           dtype=dtype)
