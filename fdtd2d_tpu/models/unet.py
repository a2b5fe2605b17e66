"""Flax UNet for the diffusion surrogate.

Architecture-equivalent of the reference's PyTorch model (reference:
python-src/diffusion_model.py:35-132): 3-level encoder 4->64->128->256 with
512-channel bottleneck, double Conv3x3+BatchNorm+ReLU blocks, sinusoidal
time embedding injected at the bottleneck only, per-scale omega-embedding
MLPs added after each max-pool, nearest-neighbor-upsample decoder with skip
concatenation, 1x1 conv head predicting noise.

Laid out NHWC (TPU-native); inputs are the stacked physical channels
(eps, mu, src, noisy_Ez) as (B, H, W, 4).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Reference SinusoidalPosEmb (diffusion_model.py:7-21): [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ConvBlock(nn.Module):
    """Conv3x3 + BatchNorm + ReLU, twice (reference make_block, :24-32).

    ``dtype`` is the COMPUTE dtype (conv math / activations); parameters
    always live in float32 (flax ``param_dtype`` default). BatchNorm keeps
    its statistics in float32 regardless (flax promotes internally) — the
    mixed-precision-safe part of the block."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class OmegaMLP(nn.Module):
    """Per-scale omega embedding: Linear(1,C) -> ReLU -> Linear(C,C)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, omega):
        h = nn.Dense(self.features, dtype=self.dtype)(omega[:, None])
        h = nn.relu(h)
        return nn.Dense(self.features, dtype=self.dtype)(h)


class UNet2D(nn.Module):
    time_embed_dim: int = 512
    channels: Sequence[int] = (64, 128, 256)
    bottleneck: int = 512
    # compute dtype for the conv/dense math. float32 inputs on a v5e MXU
    # run as multiple bf16 passes; dtype=jnp.bfloat16 does ONE pass per
    # matmul at bf16 precision while master params, BatchNorm statistics,
    # the 1x1 head, and the loss stay float32 (standard mixed precision).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, eps, mu, src, noisy, t, omega, *, train: bool = False):
        """All field inputs (B, H, W); t and omega (B,). Returns (B, H, W)
        in float32 regardless of the compute dtype."""
        x = jnp.stack([eps, mu, src, noisy], axis=-1).astype(self.dtype)

        c1, c2, c3 = self.channels
        dt = self.dtype
        e1 = ConvBlock(c1, dtype=dt)(x, train)
        p1 = nn.max_pool(e1, (2, 2), strides=(2, 2))
        p1 = p1 + OmegaMLP(c1, dtype=dt)(omega.astype(dt))[:, None, None, :]

        e2 = ConvBlock(c2, dtype=dt)(p1, train)
        p2 = nn.max_pool(e2, (2, 2), strides=(2, 2))
        p2 = p2 + OmegaMLP(c2, dtype=dt)(omega.astype(dt))[:, None, None, :]

        e3 = ConvBlock(c3, dtype=dt)(p2, train)
        p3 = nn.max_pool(e3, (2, 2), strides=(2, 2))
        p3 = p3 + OmegaMLP(c3, dtype=dt)(omega.astype(dt))[:, None, None, :]

        b = ConvBlock(self.bottleneck, dtype=dt)(p3, train)
        temb = sinusoidal_embedding(t, self.time_embed_dim).astype(dt)
        temb = nn.Dense(self.time_embed_dim, dtype=dt)(temb)
        temb = nn.relu(temb)
        temb = nn.Dense(self.time_embed_dim, dtype=dt)(temb)
        b = b + temb[:, None, None, :]

        def up_to(h, ref):
            return jax.image.resize(h, ref.shape[:3] + (h.shape[-1],), "nearest")

        d3 = ConvBlock(c3, dtype=dt)(jnp.concatenate([up_to(b, e3), e3], axis=-1), train)
        d2 = ConvBlock(c2, dtype=dt)(jnp.concatenate([up_to(d3, e2), e2], axis=-1), train)
        d1 = ConvBlock(c1, dtype=dt)(jnp.concatenate([up_to(d2, e1), e1], axis=-1), train)

        # head stays float32: the regression target spans orders of magnitude
        out = nn.Conv(1, (1, 1), dtype=jnp.float32)(d1.astype(jnp.float32))
        return out[..., 0]
