"""WGAN-GP critic for adversarial fine-tuning.

Architecture of ``SynthSR/fine_tuning_with_adversary.py:482-508``: n_levels
blocks of [Conv3D(f·2^l, 3³, stride 1) + LeakyReLU(0.2), Conv3D(same, stride
2) + LeakyReLU(0.2)], flatten, Dense(f·2^n_levels) + LeakyReLU(0.2), Dense(1)
with no activation.  Optional anatomy-mask input multiplies the image before
the first conv (:485-487).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class Discriminator3D(nn.Module):
    n_filters: int = 32
    n_levels: int = 4
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None):
        """x: (B, X, Y, Z, C) -> (B, 1) critic scores."""
        x = x.astype(self.compute_dtype)
        if mask is not None:
            x = x * mask.astype(x.dtype)
        for level in range(self.n_levels):
            f = self.n_filters * (2 ** level)
            x = nn.Conv(f, (3, 3, 3), strides=(1, 1, 1), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name=f"conv_{level}_0")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            x = nn.Conv(f, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name=f"conv_{level}_1")(x)
            x = jax.nn.leaky_relu(x, 0.2)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_filters * (2 ** self.n_levels), dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="dense_0")(x)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="dense_out")(x)
        return x.astype(jnp.float32)
