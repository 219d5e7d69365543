"""Blurring sigma rules + masked blur (device twins of the reference rules).

Reference: ``ext/lab2im/edit_tensors.py:41-83`` (blurring_sigma_for_downsampling)
and the mask-renormalized path of GaussianBlur (``lab2im/layers.py:747-757``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .linops import blur3d


def blurring_sigma_for_downsampling(current_res, downsample_res, mult_coef=None,
                                    thickness=None):
    """Per-axis PSF sigma when acquiring at ``downsample_res`` from
    ``current_res``: 0.75·down/current, exactly 0.5 where equal, 0 where the
    target res is 0; ``mult_coef`` overrides the 0.75 (and disables the
    0.5-at-equality rule).  Works on numpy arrays and traced jnp arrays alike.
    """
    current = jnp.asarray(current_res, jnp.float32)
    down = jnp.asarray(downsample_res, jnp.float32)
    if thickness is not None:
        down = jnp.minimum(down, jnp.asarray(thickness, jnp.float32))
    if mult_coef is None:
        sigma = jnp.where(down == current, 0.5, 0.75 * down / current)
    else:
        sigma = mult_coef * down / current
    return jnp.where(down == 0.0, 0.0, sigma)


def blurring_sigma_np(current_res, downsample_res, mult_coef=None, thickness=None):
    """Numpy twin (for host-side shape planning)."""
    current = np.asarray(current_res, np.float32)
    down = np.asarray(downsample_res, np.float32)
    if thickness is not None:
        down = np.minimum(down, np.asarray(thickness, np.float32))
    if mult_coef is None:
        sigma = np.where(down == current, 0.5, 0.75 * down / current)
    else:
        sigma = mult_coef * down / current
    return np.where(down == 0.0, 0.0, sigma).astype(np.float32)


def blur_with_mask(vol: jnp.ndarray, sigmas, mask: jnp.ndarray, max_sigmas=None):
    """Blur only inside a mask, renormalizing by the blurred mask
    (reference GaussianBlur use_mask path, lab2im/layers.py:747-757)."""
    mask = (mask > 0).astype(vol.dtype)
    blurred = blur3d(vol * mask, sigmas, max_sigmas)
    weights = blur3d(mask, sigmas, max_sigmas)
    out = blurred / jnp.maximum(weights, 1e-9)
    return jnp.where(mask > 0, out, 0.0)
