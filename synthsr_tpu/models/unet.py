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
    conv_dropout: float = 0.0  # feature-space dropout (models.py:319-324)
    use_residuals: bool = False  # residual levels (models.py:325-347)
    dilation_rate_mult: int = 1  # per-level conv dilation (models.py:307)
    compute_dtype: Any = jnp.float32

    def _conv(self, feats: int, ksize: int, name: str, dilation: int = 1):
        return nn.Conv(feats, (ksize,) * 3, padding="SAME",
                       kernel_dilation=(dilation,) * 3, dtype=self.compute_dtype,
                       param_dtype=jnp.float32, name=name)

    def _dropout(self, x, train: bool):
        """Keras feature-space Dropout (noise_shape=[None, 1, 1, 1, feats],
        models.py:319-324): one mask per (batch, channel), broadcast over
        space; inverted scaling 1/(1-rate); identity at inference."""
        if not self.conv_dropout:
            return x
        return nn.Dropout(rate=self.conv_dropout, broadcast_dims=(1, 2, 3),
                          deterministic=not train)(x)

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
            dil = int(self.dilation_rate_mult ** level)
            lvl_first = x
            tap = None
            for conv in range(self.nb_conv_per_level):
                if lnf is not None:
                    feats = lnf[lfidx]
                    lfidx += 1
                last = conv == self.nb_conv_per_level - 1
                x = self._conv(feats, self.conv_size,
                               f"conv_downarm_{level}_{conv}", dil)(x)
                # residual levels: the LAST conv has no activation — it comes
                # after the residual add (models.py:313-317,345-347)
                if not (self.use_residuals and last):
                    x = act(x)
                if last:
                    # Keras skips tap the conv LAYER output (models.py:430-434):
                    # pre-dropout, and in residual mode pre-activation
                    tap = x
                x = self._dropout(x, train)
            if self.use_residuals:
                # add the level input, expanded by a conv when the feature
                # counts differ and both exceed 1 (models.py:325-347).
                # Documented deviation: with dropout+expansion the reference
                # REPLACES the conv arm by dropout(expand) (models.py:337-341,
                # a graph-wiring bug); we keep the conv arm.
                add_layer = lvl_first
                cin, cf = lvl_first.shape[-1], x.shape[-1]
                if cin > 1 and cf > 1 and cin != cf:
                    add_layer = act(self._conv(
                        feats, self.conv_size, f"expand_down_merge_{level}",
                        dil)(lvl_first))
                x = act(x + add_layer)
            # decoder skips tap the conv output; BN feeds only the pooled path
            # (Keras wires cat_tensor to the conv layer's output, models.py:430-434)
            # level-boundary tags: no-ops unless a surrounding jax.checkpoint
            # uses save_only_these_names (per-level rematerialization — the
            # backward pass then recomputes one level's convs at a time
            # instead of holding every activation in HBM)
            tap = checkpoint_name(tap, f"unet_skip_{level}")
            skips[level] = tap
            if not self.use_residuals and not self.conv_dropout:
                # tap IS x here (every shipped config); reuse the tagged
                # tensor so per-level remat saves one tensor per level
                x = tap
            if self.use_batch_norm:
                x = self._bn(f"bn_down_{level}", train)(x)
            if level < self.nb_levels - 1:
                x = nn.max_pool(x, pool, strides=pool, padding="SAME")

        for level in range(self.nb_levels - 1):
            src = self.nb_levels - 2 - level
            feats = int(round(self.nb_features * self.feat_mult ** src))
            dil = int(self.dilation_rate_mult ** src)
            x = upsample_nearest(x, self.pool_size)
            up_tensor = x
            if level < self.nb_levels - self.skip_n_concatenations - 1:
                x = jnp.concatenate([skips[src].astype(x.dtype), x], axis=-1)
            for conv in range(self.nb_conv_per_level):
                if lnf is not None:
                    feats = lnf[lfidx]
                    lfidx += 1
                last = conv == self.nb_conv_per_level - 1
                x = self._conv(feats, self.conv_size,
                               f"conv_uparm_{self.nb_levels + level}_{conv}",
                               dil)(x)
                if not (self.use_residuals and last):
                    x = act(x)
                x = self._dropout(x, train)
            if self.use_residuals:
                # residual add with the PRE-concat upsampled tensor
                # (models.py:459-473)
                add_layer = up_tensor
                cin, cf = up_tensor.shape[-1], x.shape[-1]
                if cin > 1 and cf > 1 and cin != cf:
                    add_layer = act(self._conv(
                        feats, self.conv_size, f"expand_up_merge_{level}",
                        dil)(up_tensor))
                x = act(x + add_layer)
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
