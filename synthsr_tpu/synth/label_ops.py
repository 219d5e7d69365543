"""Utility tensor ops: label remapping, value resets, edge masking, image
gradients, GPU-style morphology.

Re-implementation of the reference's utility layers
(``ext/lab2im/layers.py``: ResetValuesToZero :1619, ConvertLabels :1659,
MaskEdges :1758, ImageGradients :1852, RandomDilationErosion :1953) as pure
functions over single samples (X, Y, Z, C), plus the sobel / unit-ball kernel
builders of ``ext/lab2im/edit_tensors.py:184-256``.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import get_mapping_lut, reformat_to_list
from .sampling import bernoulli


def reset_values_to_zero(x, values):
    """Set every listed value to 0 (reference ResetValuesToZero:1619-1656)."""
    for v in reformat_to_list(values):
        x = jnp.where(x == v, jnp.zeros_like(x), x)
    return x


def convert_labels(labels, source_values, dest_values=None):
    """LUT remap of label values (reference ConvertLabels:1659-1689)."""
    lut = jnp.asarray(get_mapping_lut(source_values, dest=dest_values))
    return lut[labels.astype(jnp.int32)]


def mask_edges(key, x, axes, boundaries, prob_mask=1.0):
    """Zero bands at random positions along the given axes
    (reference MaskEdges:1758-1849).  boundaries: (len(axes), 4) relative
    bounds [lo1, hi1, lo2, hi2] for each side.

    Static-shape formulation: band edges become comparisons against an iota
    instead of dynamic splits.  Returns (masked tensor, mask)."""
    from ..utils.misc import reformat_to_n_channels_array

    axes = reformat_to_list(axes, dtype="int")
    boundaries = reformat_to_n_channels_array(boundaries, n_dims=4,
                                              n_channels=len(axes))
    mask = jnp.ones_like(x, jnp.float32)
    keys = jax.random.split(key, len(axes) + 1)
    for i, axis in enumerate(axes):
        size = x.shape[axis]
        b = boundaries[i]
        idx1 = jnp.round(jax.random.uniform(keys[i], (), minval=b[0] * size,
                                            maxval=b[1] * size))
        idx2 = jnp.round(jax.random.uniform(jax.random.fold_in(keys[i], 1), (),
                                            minval=b[2] * size,
                                            maxval=b[3] * size - 1) - idx1)
        pos = jnp.arange(size, dtype=jnp.float32)
        band = ((pos >= idx1) & (pos < idx1 + idx2)).astype(jnp.float32)
        shape = [1] * x.ndim
        shape[axis] = size
        mask = mask * band.reshape(shape)
    gated = jnp.where(bernoulli(keys[-1], prob_mask), x * mask.astype(x.dtype), x)
    return gated, mask


def sobel_kernels_np(n_dims=3):
    """Separable sobel kernel factors per derivative direction
    (reference edit_tensors.sobel_kernels:184-204)."""
    in_dir = np.array([1.0, 0.0, -1.0], np.float32)
    ortho = np.array([1.0, 2.0, 1.0], np.float32)
    return [[in_dir if axis == dim else ortho for axis in range(n_dims)]
            for dim in range(n_dims)]


def image_gradients(x, gradient_type="sobel", return_magnitude=False):
    """Spatial gradients of (X, Y, Z, C) (reference ImageGradients:1852-1950).

    sobel: separable [1,0,-1]/[1,2,1] convs per direction (SAME, zero pad);
    1-step_diff: forward differences, zero-padded at the far end.
    """
    ndims = 3
    grads = []
    if gradient_type == "sobel":
        kernels = sobel_kernels_np(ndims)
        for dim in range(ndims):
            g = x.astype(jnp.float32)
            for axis in range(ndims):
                k = jnp.asarray(kernels[dim][axis])
                g = _conv1d_same(g, k, axis)
            grads.append(g)
    elif gradient_type == "1-step_diff":
        for axis in range(ndims):
            d = jnp.diff(x, axis=axis)
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, 1)
            grads.append(jnp.pad(d, pad))
    else:
        raise ValueError("gradient_type should be 'sobel' or '1-step_diff'")
    if return_magnitude:
        return jnp.sqrt(jnp.sum(jnp.square(jnp.stack(grads, axis=-1)), axis=-1))
    return grads


def _conv1d_same(x, taps, axis):
    """SAME zero-padded 1-D correlation of (X, Y, Z, C) along a spatial axis."""
    n = taps.shape[0]
    half = (n - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (half, n - 1 - half)
    xp = jnp.pad(x, pad)
    out = 0.0
    for t in range(n):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, t + x.shape[axis])
        out = out + taps[t] * xp[tuple(sl)]
    return out


def unit_kernel_np(dist_threshold: int, n_dims: int = 3):
    """Binary ball kernel of radius dist_threshold
    (reference edit_tensors.unit_kernel:207-256)."""
    w = int(dist_threshold) * 2 + 1
    mesh = np.stack(np.meshgrid(*[np.arange(w)] * n_dims, indexing="ij"), -1)
    dist = np.sqrt(np.sum((mesh - (w - 1) / 2) ** 2, axis=-1))
    return (dist <= dist_threshold).astype(np.float32)


def _ball_conv(mask, radius_sq, max_factor):
    """Binary dilation of (X, Y, Z, 1) with a traced-radius ball at static
    window 2·max_factor+1, via conv."""
    w = 2 * int(max_factor) + 1
    mesh = np.stack(np.meshgrid(*[np.arange(w)] * 3, indexing="ij"), -1)
    dist_sq = jnp.asarray(np.sum((mesh - (w - 1) / 2) ** 2, axis=-1),
                          jnp.float32)
    kernel = (dist_sq <= radius_sq).astype(jnp.float32)[..., None, None]
    out = jax.lax.conv_general_dilated(
        mask[None], kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    return (out > 0.01).astype(jnp.float32)


def random_dilation_erosion(key, x, min_factor, max_factor, max_factor_dilate=None,
                            prob=1.0, operation="random", return_mask=False):
    """Random binary dilation/erosion via ball-kernel convolution
    (reference RandomDilationErosion:1953-2060).

    Dilation: conv(mask, ball) > 0; erosion: 1 - (conv(1-mask, ball) > 0).
    The kernel window is static at the maximum factor; the traced factor only
    changes which taps are non-zero."""
    if max_factor_dilate is None:
        max_factor_dilate = max_factor
    k_op, k_f1, k_f2 = jax.random.split(key, 3)
    if operation == "dilation":
        p = jax.random.uniform(k_op, (), minval=0.0, maxval=1.0)
    elif operation == "erosion":
        p = jax.random.uniform(k_op, (), minval=-1.0, maxval=0.0)
    elif operation == "random":
        p = jax.random.uniform(k_op, (), minval=-1.0, maxval=1.0)
    else:
        raise ValueError("operation should be 'dilation', 'erosion' or 'random'")

    if min_factor == max_factor:
        factor = jnp.asarray(min_factor, jnp.float32)
    else:
        f_erode = jax.random.randint(k_f1, (), min_factor, max_factor).astype(jnp.float32)
        f_dilate = jax.random.randint(k_f2, (), min_factor, max_factor_dilate).astype(jnp.float32)
        factor = jnp.where(p < 0, f_erode, f_dilate)

    static_max = max(int(max_factor), int(max_factor_dilate))
    mask = (x != 0).astype(jnp.float32)
    radius_sq = factor ** 2
    dilated = _ball_conv(mask, radius_sq, static_max)
    eroded = 1.0 - _ball_conv(1.0 - mask, radius_sq, static_max)
    thr = 1.0 - prob + 0.001
    new_mask = jnp.where(p > thr, dilated, mask)
    new_mask = jnp.where(p < -thr, eroded, new_mask)
    if return_mask:
        return new_mask.astype(bool)
    return x * new_mask.astype(x.dtype)
