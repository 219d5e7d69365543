"""Parametric 3-D U-Net in flax, XLA-native.

Fresh implementation of the network family of the reference
(``ext/neuron/models.py``: unet :26, conv_enc :256, conv_dec :363): an
encoder of ``nb_levels`` levels × ``nb_conv_per_level`` same-padded
``conv_size``³ convolutions with ``activation``, features
``nb_features·feat_mult^level``, max-pool 2 between levels; a decoder of
nearest-neighbour ×2 upsampling, skip concatenations (encoder features first),
the mirrored conv stack, and a final 1×1×1 'likelihood' convolution with
linear or softmax head.

TPU-first specifics:
- NDHWC layout (channels on the 128-lane axis), bfloat16 compute with float32
  params (``compute_dtype``) so the 3-D convs hit the MXU at full rate.
- Module names mirror the reference layer names (``conv_downarm_{l}_{c}``,
  ``conv_uparm_{l}_{c}``, ``likelihood``) so Keras .h5 checkpoints map
  one-to-one (see models/h5_import.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def upsample_nearest(x: jnp.ndarray, factor=2) -> jnp.ndarray:
    """Nearest-neighbour ×factor upsampling of NDHWC (Keras UpSampling3D)."""
    if isinstance(factor, int):
        factor = (factor,) * 3
    for ax, f in zip((1, 2, 3), factor):
        if f != 1:
            x = jnp.repeat(x, f, axis=ax)
    return x


def _activation(name: str):
    if name is None or name == "linear":
        return lambda x: x
    return getattr(jax.nn, name)


class UNet3D(nn.Module):
    """3-D U-Net matching the reference parameter surface (models.py:26-47).

    SynthSR flagship config: nb_features=24, nb_levels=5, conv_size=3,
    nb_labels=1, feat_mult=2, nb_conv_per_level=2, activation='elu',
    final_pred_activation='linear' (scripts/predict_command_line.py:65-77).
    """

    nb_features: int = 24
    nb_levels: int = 5
    conv_size: int = 3
    nb_labels: int = 1
    feat_mult: float = 2
    pool_size: int = 2
    nb_conv_per_level: int = 2
    activation: str = "elu"
    final_pred_activation: str = "linear"
    skip_n_concatenations: int = 0
    layer_nb_feats: Optional[Sequence[int]] = None
    use_batch_norm: bool = True  # every SynthSR build passes batch_norm=-1
    compute_dtype: Any = jnp.float32

    def _conv(self, feats: int, ksize: int, name: str):
        return nn.Conv(feats, (ksize,) * 3, padding="SAME", dtype=self.compute_dtype,
                       param_dtype=jnp.float32, name=name)

    def _bn(self, name: str, train: bool):
        # Keras BatchNormalization defaults: momentum 0.99, epsilon 1e-3
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.compute_dtype,
                            param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (batch, X, Y, Z, C) -> (batch, X, Y, Z, nb_labels)."""
        act = _activation(self.activation)
        pool = (self.pool_size,) * 3
        lnf = list(self.layer_nb_feats) if self.layer_nb_feats is not None else None
        lfidx = 0

        x = x.astype(self.compute_dtype)
        skips = {}
        for level in range(self.nb_levels):
            feats = int(round(self.nb_features * self.feat_mult ** level))
            for conv in range(self.nb_conv_per_level):
                if lnf is not None:
                    feats = lnf[lfidx]
                    lfidx += 1
                x = self._conv(feats, self.conv_size, f"conv_downarm_{level}_{conv}")(x)
                x = act(x)
            # decoder skips tap the conv output; BN feeds only the pooled path
            # (Keras wires cat_tensor to the conv layer's output, models.py:430-434)
            # level-boundary tags: no-ops unless a surrounding jax.checkpoint
            # uses save_only_these_names (per-level rematerialization — the
            # backward pass then recomputes one level's convs at a time
            # instead of holding every activation in HBM)
            x = checkpoint_name(x, f"unet_skip_{level}")
            skips[level] = x
            if self.use_batch_norm:
                x = self._bn(f"bn_down_{level}", train)(x)
            if level < self.nb_levels - 1:
                x = nn.max_pool(x, pool, strides=pool, padding="SAME")

        for level in range(self.nb_levels - 1):
            src = self.nb_levels - 2 - level
            feats = int(round(self.nb_features * self.feat_mult ** src))
            x = upsample_nearest(x, self.pool_size)
            if level < self.nb_levels - self.skip_n_concatenations - 1:
                x = jnp.concatenate([skips[src].astype(x.dtype), x], axis=-1)
            for conv in range(self.nb_conv_per_level):
                if lnf is not None:
                    feats = lnf[lfidx]
                    lfidx += 1
                x = self._conv(feats, self.conv_size,
                               f"conv_uparm_{self.nb_levels + level}_{conv}")(x)
                x = act(x)
            if self.use_batch_norm:
                x = self._bn(f"bn_up_{level}", train)(x)
            x = checkpoint_name(x, f"unet_dec_{level}")

        x = nn.Conv(self.nb_labels, (1, 1, 1), padding="SAME", dtype=jnp.float32,
                    param_dtype=jnp.float32, name="likelihood")(x)
        if self.final_pred_activation == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        return x.astype(jnp.float32)


def synthsr_unet(nb_channels: int = 1, **overrides) -> UNet3D:
    """The shipped SynthSR all-purpose architecture (predict_command_line.py:65-77);
    ``nb_channels`` is the input channel count (2 for hyperfine)."""
    del nb_channels  # input channels are inferred from the input tensor
    cfg = dict(nb_features=24, nb_levels=5, conv_size=3, nb_labels=1, feat_mult=2,
               nb_conv_per_level=2, activation="elu", final_pred_activation="linear")
    cfg.update(overrides)
    return UNet3D(**cfg)
