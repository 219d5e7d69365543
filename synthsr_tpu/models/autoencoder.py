"""Auto-encoder model family + per-voxel layers (the neuron extras).

Re-implementation of the parts of ``ext/neuron`` that SynthSR ships but does
not use in its pipelines (SURVEY.md §2 'AE/VAE extras'): the convolutional
auto-encoder with optional dense/VAE bottleneck (``ae`` models.py:148,
``single_ae`` :558, ``_VAESample`` :760) and the per-voxel ``LocalBias``
layer (neuron/layers.py:405-434).  Flax, NDHWC, same encoder/decoder
structure as UNet3D but without skip connections.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import _activation, upsample_nearest


class LocalBias(nn.Module):
    """Per-voxel additive bias: out[v] = in[v] + b[v]·biasmult
    (neuron/layers.py:405-434)."""

    biasmult: float = 1.0

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.normal(stddev=0.05),
                            x.shape[1:])
        return x + kernel * self.biasmult


class SingleAE(nn.Module):
    """Bottleneck auto-encoder stage: dense or conv encoding of the feature
    map, optional variational sampling (models.py:558-757)."""

    enc_size: Sequence[int]
    ae_type: str = "conv"  # 'conv' or 'dense'
    conv_size: int = 3
    do_vae: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        nc = x.shape[-1]
        spatial = x.shape[1:-1]
        if self.ae_type == "dense":
            flat = x.reshape((x.shape[0], -1))
            mu = nn.Dense(int(jnp.prod(jnp.asarray(self.enc_size))),
                          dtype=self.compute_dtype, name="mu_enc")(flat)
            if self.do_vae:
                logvar = nn.Dense(mu.shape[-1], dtype=self.compute_dtype,
                                  name="logvar_enc")(flat)
                z = _vae_sample(mu, logvar, rng, self.make_rng)
            else:
                logvar = None
                z = mu
            out = nn.Dense(int(flat.shape[-1]), dtype=self.compute_dtype,
                           name="ae_mu_dec")(z)
            out = out.reshape(x.shape)
        else:  # conv bottleneck over channels
            mu = nn.Conv(self.enc_size[-1], (self.conv_size,) * 3, padding="SAME",
                         dtype=self.compute_dtype, name="mu_enc_conv")(x)
            if self.do_vae:
                logvar = nn.Conv(self.enc_size[-1], (self.conv_size,) * 3,
                                 padding="SAME", dtype=self.compute_dtype,
                                 name="logvar_enc_conv")(x)
                z = _vae_sample(mu, logvar, rng, self.make_rng)
            else:
                logvar = None
                z = mu
            out = nn.Conv(nc, (self.conv_size,) * 3, padding="SAME",
                          dtype=self.compute_dtype, name="ae_dec_conv")(z)
        self.sow("intermediates", "mu", mu)
        if logvar is not None:
            self.sow("intermediates", "logvar", logvar)
        return out


def _vae_sample(mu, logvar, rng, make_rng):
    """z = mu + exp(logvar/2)·eps (reference _VAESample, models.py:760-768)."""
    if rng is None:
        rng = make_rng("vae")
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + jnp.exp(logvar / 2.0) * eps


class AutoEncoder3D(nn.Module):
    """Convolutional auto-encoder, optionally variational (models.py:148-253):
    UNet-style encoder, dense/conv bottleneck, decoder WITHOUT skips."""

    nb_features: int = 16
    nb_levels: int = 3
    conv_size: int = 3
    nb_labels: int = 1
    enc_size: Sequence[int] = (16,)
    feat_mult: float = 2
    pool_size: int = 2
    nb_conv_per_level: int = 1
    activation: str = "elu"
    final_pred_activation: str = "softmax"
    ae_type: str = "conv"
    do_vae: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        act = _activation(self.activation)
        pool = (self.pool_size,) * 3
        x = x.astype(self.compute_dtype)
        for level in range(self.nb_levels):
            feats = int(round(self.nb_features * self.feat_mult ** level))
            for conv in range(self.nb_conv_per_level):
                x = nn.Conv(feats, (self.conv_size,) * 3, padding="SAME",
                            dtype=self.compute_dtype,
                            name=f"conv_downarm_{level}_{conv}")(x)
                x = act(x)
            if level < self.nb_levels - 1:
                x = nn.max_pool(x, pool, strides=pool, padding="SAME")

        x = SingleAE(enc_size=self.enc_size, ae_type=self.ae_type,
                     conv_size=self.conv_size, do_vae=self.do_vae,
                     compute_dtype=self.compute_dtype, name="single_ae")(x, rng)

        for level in range(self.nb_levels - 1):
            src = self.nb_levels - 2 - level
            feats = int(round(self.nb_features * self.feat_mult ** src))
            x = upsample_nearest(x, self.pool_size)
            for conv in range(self.nb_conv_per_level):
                x = nn.Conv(feats, (self.conv_size,) * 3, padding="SAME",
                            dtype=self.compute_dtype,
                            name=f"conv_uparm_{self.nb_levels + level}_{conv}")(x)
                x = act(x)

        x = nn.Conv(self.nb_labels, (1, 1, 1), padding="SAME", dtype=jnp.float32,
                    name="likelihood")(x)
        if self.final_pred_activation == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        return x.astype(jnp.float32)
