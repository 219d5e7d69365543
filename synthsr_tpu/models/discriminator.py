"""WGAN-GP critic for adversarial fine-tuning.

Architecture of ``SynthSR/fine_tuning_with_adversary.py:482-508``: n_levels
blocks of [Conv3D(f·2^l, 3³, stride 1) + LeakyReLU(0.2), Conv3D(same, stride
2) + LeakyReLU(0.2)], flatten, Dense(f·2^n_levels) + LeakyReLU(0.2), Dense(1)
with no activation.  Optional anatomy-mask input multiplies the image before
the first conv (:485-487).

``stride2_impl`` selects between the plain strided conv and a
space-to-depth + 2³ stride-1 decomposition (exact same math, identical
parameter tree): XLA lowers the INPUT gradient of a strided conv as a
base-dilated (lhs_dilation=2) conv, and the WGAN-GP loss differentiates
through that input gradient a SECOND time (the gradient penalty's parameter
gradient), compounding the TPU backend's weak dilated lowering.  Folding the
stride into channels keeps every conv stride-1 on both derivative orders.

Measured on v5e (tools/probe_disc.py, in-jit loop, 128³ bf16):

    piece                      strided    s2d
    D forward                    9.50    12.06 ms   (s2d transposes lose)
    WGAN d(loss)/d(params)      73.81    82.86      (first-order: lose)
    GP d(loss)/d(params)        69.62    57.89      (second-order: WIN)
    full critic d(loss)/d(p)   145.61   139.87
    full hybrid (GP=s2d)       130.79

so the default stays "strided" and the adversarial loop applies an s2d
CLONE of the critic (same params) to the gradient-penalty term only.
The s2d path falls back to the strided conv when a spatial dim is odd
(never the case for the power-of-two crops the critic sees in training).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _space_to_depth2(x):
    """(B, D, H, W, C) -> (B, D/2, H/2, W/2, 8C), channel layout p·C + c
    with phase p = 4·p_d + 2·p_h + p_w."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def _s2d_kernel(kernel):
    """(3,3,3,C,F) stride-2 kernel -> (2,2,2,8C,F) stride-1 kernel over the
    8 input phases: tap k = 2t + p per axis (k=3 taps don't exist -> 0).

    One pad + reshape + transpose: pad each spatial axis to 4 taps (the
    k=3 tap is the missing 2t+p=3 combination, identically zero), split
    k -> (t, p) by reshape, and fold the phase axes into channels —
    constant-free, one op in the jaxpr (vs 64 traced dynamic-update-slices,
    which bloated every apply including the double-differentiated
    gradient-penalty path)."""
    c, f = kernel.shape[3], kernel.shape[4]
    k4 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    # (td, pd, th, ph, tw, pw, c, f) -> (td, th, tw, pd, ph, pw, c, f):
    # channel index p·c + c_i with p = 4·pd + 2·ph + pw
    return k4.reshape(2, 2, 2, 2, 2, 2, c, f) \
        .transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(2, 2, 2, 8 * c, f)


class _Conv3x3Stride2(nn.Module):
    """3³ stride-2 SAME conv with the same parameter tree as nn.Conv
    (kernel (3,3,3,C,F) + bias (F,)), computed stride-1 via space-to-depth
    on even spatial dims."""
    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.compute_dtype
        x = x.astype(dt)
        dn = ("NDHWC", "DHWIO", "NDHWC")
        if all(s % 2 == 0 for s in x.shape[1:4]):
            # out[o] = Σ_k w[k]·x[2o+k] (SAME stride-2 on even size pads
            # (0,1)); regrouped over phases it is a 2³ stride-1 conv with
            # (0,1) padding per axis — validated exact vs the strided conv
            y = lax.conv_general_dilated(
                _space_to_depth2(x), _s2d_kernel(kernel).astype(dt),
                (1, 1, 1), [(0, 1), (0, 1), (0, 1)], dimension_numbers=dn)
        else:
            y = lax.conv_general_dilated(
                x, kernel.astype(dt), (2, 2, 2), "SAME",
                dimension_numbers=dn)
        return y + bias.astype(dt)


class Discriminator3D(nn.Module):
    n_filters: int = 32
    n_levels: int = 4
    compute_dtype: Any = jnp.float32
    # "strided" (plain XLA strided conv, fastest forward/first-order) or
    # "s2d" (space-to-depth stride-1 decomposition, fastest second-order —
    # used by the adversarial loop's gradient-penalty term via clone()).
    # Identical parameter tree either way.
    stride2_impl: str = "strided"

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
            if self.stride2_impl == "s2d":
                x = _Conv3x3Stride2(f, compute_dtype=self.compute_dtype,
                                    name=f"conv_{level}_1")(x)
            else:
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
