"""Prediction assembly + regression loss (the metrics_model as a function).

Replaces ``SynthSR/metrics_model.py:29-132``: residual-channel addition,
centre loss-cropping, laplace intensity/spread split, and the l1/l2/ssim/
laplace metrics — as a pure function usable inside a jitted train step
instead of a loss-as-graph-output Keras model.

Deviation (documented): the reference doubles residual indices for
reliability-map interleaving with ``2 * list`` — python list *repetition*
(training.py:270-271), which only approximates the intent for index 0.  We
double elementwise (synthetic channel i lives at image_out index 2i when
reliability maps are interleaved).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops.losses import l1_loss, l2_loss, laplace_nll, ssim3d_loss
from ..utils.misc import reformat_to_list


def center_crop(x: jnp.ndarray, crop: Optional[Sequence[int]]):
    """Centre-crop (B, X, Y, Z, C) spatially to ``crop`` (metrics_model.py:72-91)."""
    if crop is None:
        return x
    spatial = x.shape[1:-1]
    crop = reformat_to_list(crop, length=len(spatial))
    begin = [int((spatial[i] - crop[i]) / 2) for i in range(len(spatial))]
    slicer = tuple([slice(None)] + [slice(b, b + c) for b, c in zip(begin, crop)]
                   + [slice(None)])
    return x[slicer]


def assemble_prediction(net_out, image_out, metrics="l1",
                        work_with_residual_channel=None):
    """Split laplace channels and add residual input channels
    (metrics_model.py:31-65). Returns (intensities, spreads_or_None)."""
    spreads = None
    if metrics == "laplace":
        nc = net_out.shape[-1] // 2
        intensities = net_out[..., :nc]
        spreads = net_out[..., nc:]
    else:
        intensities = net_out

    if work_with_residual_channel is not None:
        slices = jnp.stack([image_out[..., c] for c in work_with_residual_channel],
                           axis=-1)
        intensities = intensities + slices
    return intensities, spreads


def regression_loss(net_out, image_out, target, metrics="l1", loss_cropping=16,
                    work_with_residual_channel=None):
    """Full metrics-model equivalent: assemble -> crop -> metric scalar."""
    intensities, spreads = assemble_prediction(net_out, image_out, metrics,
                                               work_with_residual_channel)
    intensities = center_crop(intensities, loss_cropping)
    target = center_crop(target, loss_cropping)
    if metrics == "laplace":
        spreads = center_crop(spreads, loss_cropping)
        return laplace_nll(intensities, spreads, target)
    if metrics == "l2":
        return l2_loss(intensities, target)
    if metrics == "l1":
        return l1_loss(intensities, target)
    if metrics == "ssim":
        if target.shape[-1] > 1:
            raise ValueError("SSIM metric does not currently support multiple channels")
        return ssim3d_loss(intensities, target)
    raise ValueError(f"metrics should be l1/l2/ssim/laplace, got {metrics}")


def doubled_residual_indices(work_with_residual_channel, build_reliability_maps,
                             input_channels=None):
    """Map synthetic-channel indices to image_out positions.

    image_out stacks only the INPUT channels (optionally interleaved with
    reliability maps), so synthetic channel i sits at
    rank(i among input channels) · (2 if reliability maps else 1).
    Fixes the reference's ``2 * list`` repetition (training.py:270-271) and
    its direct indexing that ignores non-input channels."""
    if work_with_residual_channel is None:
        return None
    idx = reformat_to_list(work_with_residual_channel)
    if input_channels is not None:
        rank = {}
        r = 0
        for i, c in enumerate(input_channels):
            if c:
                rank[i] = r
                r += 1
        for i in idx:
            if i not in rank:
                raise ValueError(f"residual channel {i} is not an input channel")
        idx = [rank[i] for i in idx]
    return [2 * i for i in idx] if build_reliability_maps else idx
