"""Separable 1-D linear operators applied as MXU matmuls.

TPU-first redesign of the reference's blur / resample tensor ops
(``ext/lab2im/edit_tensors.py``: gaussian_kernel :86, resample_tensor :257;
``ext/lab2im/layers.py``: GaussianBlur :655, DynamicGaussianBlur :770,
MimicAcquisition :835).

Key idea: every per-axis linear operation in the synthesis pipeline —
gaussian blur (any, possibly traced, sigma), nearest-neighbour downsampling
to a random grid, linear up/re-sampling, and their compositions — is a
(out_size, in_size) matrix whose *values* depend on the traced parameters but
whose *shape* is static.  Applying one matrix per axis via einsum keeps all
shapes static under jit (no data-dependent grid sizes, the reference's
hardest-to-port behavior) and runs on the MXU instead of gather units.
A full "blur -> NN-downsample -> linear-upsample" acquisition chain composes
into ONE matrix per axis before ever touching the volume.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def gaussian_window_size(max_sigma: float) -> int:
    """Static kernel window for a given maximum sigma: int(ceil(2.5σ)/2)*2+1
    (reference edit_tensors.py:124)."""
    return int(np.int32(math.ceil(2.5 * float(max_sigma)) / 2)) * 2 + 1


def gaussian_kernel_1d(sigma, window_size: int):
    """Normalized 1-D gaussian taps of static length ``window_size`` with
    (possibly traced) ``sigma``; sigma == 0 yields a delta.

    Matches reference edit_tensors.gaussian_kernel (:86-181): taps
    exp(-x²/2σ²)/(√(2π)σ) normalized to sum 1 over the window.
    """
    sigma = jnp.asarray(sigma, jnp.float32)
    half = (window_size - 1) / 2.0
    x = jnp.arange(window_size, dtype=jnp.float32) - half
    safe = jnp.where(sigma > 0, sigma, 1.0)
    g = jnp.exp(-(x ** 2) / (2.0 * safe ** 2))
    g = g / jnp.sum(g)
    delta = (x == 0).astype(jnp.float32)
    return jnp.where(sigma > 0, g, delta)


def blur_matrix(size: int, sigma, max_sigma: float | None = None):
    """(size, size) banded gaussian-blur matrix with zero (SAME-conv) padding.

    Row i holds the kernel centered at i; rows near the edge lose taps, which
    reproduces the reference's zero-padded tf.nn.convolution semantics
    (lab2im/layers.py:745-757).
    """
    if max_sigma is None:
        max_sigma = float(sigma)
    win = gaussian_window_size(max_sigma)
    if win <= 1:
        return jnp.eye(size, dtype=jnp.float32)
    k = gaussian_kernel_1d(sigma, win)
    i = jnp.arange(size)[:, None]
    j = jnp.arange(size)[None, :]
    off = j - i + (win - 1) // 2  # tap index for entry (i, j)
    valid = (off >= 0) & (off < win)
    return jnp.where(valid, k[jnp.clip(off, 0, win - 1)], 0.0)


def resize_matrix(out_size: int, in_size: int, zoom=None, method: str = "linear"):
    """(out_size, in_size) matrix realizing the reference resize convention:
    output index g samples input coordinate g / zoom, clipped to the bounds
    (neuron/utils.py:127-156 + interpn clipping).

    ``zoom`` may be a traced scalar; defaults to out_size / in_size.
    """
    if zoom is None:
        zoom = out_size / in_size
    zoom = jnp.asarray(zoom, jnp.float32)
    g = jnp.arange(out_size, dtype=jnp.float32)
    coord = jnp.clip(g / zoom, 0.0, in_size - 1.0)
    return _interp_rows(coord, in_size, method)


def sample_matrix(coords, in_size: int, method: str = "linear"):
    """(len(coords), in_size) interpolation matrix sampling arbitrary
    (possibly traced) coordinates, clipped to bounds."""
    coords = jnp.clip(jnp.asarray(coords, jnp.float32), 0.0, in_size - 1.0)
    return _interp_rows(coords, in_size, method)


def _interp_rows(coord, in_size: int, method: str):
    j = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    c = coord[:, None]
    if method == "linear":
        w = jnp.maximum(0.0, 1.0 - jnp.abs(c - j))
        # edge accumulation: coordinates clipped exactly onto 0 / in-1 already
        # produce a single weight-1 tap, so no renormalization is needed
        return w
    if method == "nearest":
        nearest = jnp.clip(jnp.round(c), 0, in_size - 1)
        return (j == nearest).astype(jnp.float32)
    raise ValueError(f"method must be 'linear' or 'nearest', got {method}")


def nn_downsample_matrix(out_size: int, in_size: int, zoom, lr_count=None):
    """(out_size, in_size) one-hot matrix taking nearest input voxel for LR
    grid node g at coordinate g / zoom, rows >= lr_count zeroed.

    This is the static-shape form of the reference MimicAcquisition
    downsample (lab2im/layers.py:946-951): the LR grid physically has
    ``lr_count`` nodes (a traced value) but is materialized at the static
    ``out_size`` with dead rows masked off.
    """
    zoom = jnp.asarray(zoom, jnp.float32)
    g = jnp.arange(out_size, dtype=jnp.float32)
    coord = jnp.clip(g / zoom, 0.0, in_size - 1.0)
    m = _interp_rows(coord, in_size, "nearest")
    if lr_count is not None:
        m = m * (jnp.arange(out_size)[:, None] < lr_count)
    return m


def apply_axis_ops(vol: jnp.ndarray, mats) -> jnp.ndarray:
    """Apply one (out_d, in_d) matrix per leading spatial axis of ``vol``.

    ``vol``: (X, Y, Z, ...) — trailing axes (channels) pass through.
    ``mats``: sequence of 3 matrices (or None for identity). All contractions
    run as einsums → MXU.
    """
    import jax

    mx, my, mz = mats
    out = vol.astype(jnp.float32)
    # full f32 accumulation: on TPU the MXU would otherwise run these in
    # bf16, injecting ~1e-3 noise into parity-sensitive resampling chains.
    # These contractions are tiny next to the U-Net, so HIGHEST is free.
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    if mx is not None:
        out = jnp.einsum("ax,xyz...->ayz...", mx, out, **kw)
    if my is not None:
        out = jnp.einsum("by,xyz...->xbz...", my, out, **kw)
    if mz is not None:
        out = jnp.einsum("cz,xyz...->xyc...", mz, out, **kw)
    return out


def blur3d(vol: jnp.ndarray, sigmas, max_sigmas=None) -> jnp.ndarray:
    """Separable 3-D gaussian blur of (X, Y, Z[, C]) with per-axis sigma
    (static or traced). Equivalent to the reference GaussianBlur /
    DynamicGaussianBlur layers (lab2im/layers.py:655-832)."""
    spatial = vol.shape[:3]
    if max_sigmas is None:
        max_sigmas = [float(s) for s in sigmas]
    mats = [blur_matrix(spatial[d], sigmas[d], max_sigmas[d]) for d in range(3)]
    return apply_axis_ops(vol, mats)
