"""Loss functions: image-regression metrics + segmentation losses.

Replaces the reference's losses-as-graph-layers: the image metrics of
``SynthSR/metrics_model.py:93-128`` (l1 / l2 / 3-plane ssim / laplace NLL) and
the loss layers of ``ext/lab2im/layers.py`` (DiceLoss :1264, WeightedL2Loss
:1382, CrossEntropyLoss :1418, MomentLoss :1532) as plain jax functions used
directly inside jitted train steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7  # tf.keras.backend.epsilon()


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def laplace_nll(pred_intensities, pred_spreads, target):
    """b = 1e-5 + 0.02·exp(spread); mean(log(2b) + |err|/b)
    (metrics_model.py:95-99)."""
    b = 1e-5 + 0.02 * jnp.exp(pred_spreads)
    err = pred_intensities - target
    return jnp.mean(jnp.log(2.0 * b) + jnp.abs(err) / b)


def ssim_plane_map(x, y, max_val=1.0, filter_size=11, filter_sigma=1.5,
                   k1=0.01, k2=0.03):
    """Per-window SSIM map of (..., H, W) planes with tf.image.ssim
    semantics: 11-tap gaussian window (σ=1.5), VALID padding, biased
    (co)variances.  Returns the (..., H-10, W-10) lum·cs map (exposed so the
    spatially-sharded loss can mask windows by global coordinate,
    parallel/halo_train.py)."""
    off = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2
    w = np.exp(-(off ** 2) / (2 * filter_sigma ** 2))
    w /= w.sum()
    w = jnp.asarray(w, jnp.float32)

    def filt2(v):
        # conv along axis -1 then axis -2, VALID
        def conv_last(a):
            n = a.shape[-1]
            out_n = n - filter_size + 1
            idx = jnp.arange(out_n)[:, None] + jnp.arange(filter_size)[None, :]
            return jnp.einsum("...ok,k->...o", a[..., idx], w)

        v = conv_last(v)
        v = jnp.swapaxes(conv_last(jnp.swapaxes(v, -1, -2)), -1, -2)
        return v

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_x = filt2(x)
    mu_y = filt2(y)
    mu_xx = filt2(x * x) - mu_x * mu_x
    mu_yy = filt2(y * y) - mu_y * mu_y
    mu_xy = filt2(x * y) - mu_x * mu_y
    lum = (2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)
    cs = (2 * mu_xy + c2) / (mu_xx + mu_yy + c2)
    return lum * cs


def _ssim_plane(x, y, max_val=1.0, **kw):
    return jnp.mean(ssim_plane_map(x, y, max_val, **kw), axis=(-2, -1))


def ssim3d_loss(pred, target, max_val=1.0):
    """-mean of 2-D SSIM over the three plane orientations
    (metrics_model.py:108-128: tf.image.ssim over the last two spatial dims
    under three permutations). pred/target: (B, X, Y, Z, 1)."""
    p = pred[..., 0]
    t = target[..., 0]
    s1 = _ssim_plane(p, t, max_val)                       # planes (Y,Z), batch (B,X)
    s2 = _ssim_plane(jnp.swapaxes(p, 2, 3), jnp.swapaxes(t, 2, 3), max_val)
    s3 = _ssim_plane(jnp.transpose(p, (0, 2, 3, 1)), jnp.transpose(t, (0, 2, 3, 1)),
                     max_val)
    return -(jnp.mean(s1) + jnp.mean(s2) + jnp.mean(s3)) / 3.0


def dice_loss(gt, pred, class_weights=None, boundary_weights=0, boundary_dist=3,
              skip_background=True, enable_checks=True):
    """Soft Dice loss over one-hot maps (B, *spatial, n_labels)
    (lab2im/layers.py:1264-1379): 1 - (2Σgp+ε)/(Σg²+Σp²+ε) per class, with
    optional class weighting (-1 = inverse gt volume) and boundary bonus
    weighting within ``boundary_dist`` of region boundaries."""
    n_labels = gt.shape[-1]
    ndims = gt.ndim - 2
    spatial_axes = tuple(range(1, ndims + 1))
    if n_labels == 1:
        skip_background = False

    if enable_checks:
        gt = jnp.clip(gt / (jnp.sum(gt, -1, keepdims=True) + _EPS), 0, 1)
        pred = jnp.clip(pred / (jnp.sum(pred, -1, keepdims=True) + _EPS), 0, 1)

    top = 2.0 * gt * pred
    bottom = jnp.square(gt) + jnp.square(pred)

    bw_tensor = None
    if boundary_weights:
        k = 2 * boundary_dist + 1
        window = (1,) + (k,) * ndims + (1,)
        avg = jax.lax.reduce_window(gt, 0.0, jax.lax.add, window, (1,) * gt.ndim,
                                    "SAME") / float(k ** ndims)
        boundaries = ((avg > 0.0) & (avg < (1.0 / ndims - 1e-4))).astype(jnp.float32)
        if skip_background:
            boundaries = boundaries.at[..., 0].set(0.0)
        bw_tensor = 1.0 + boundary_weights * boundaries
        top = top * bw_tensor
        bottom = bottom * bw_tensor

    top = jnp.sum(top, spatial_axes)
    bottom = jnp.sum(bottom, spatial_axes)
    loss = 1.0 - (top + _EPS) / (bottom + _EPS)  # (B, n_labels)

    if class_weights is not None:
        if np.isscalar(class_weights) and class_weights == -1:
            vol = jnp.sum(gt * bw_tensor, spatial_axes) if bw_tensor is not None \
                else jnp.sum(gt, spatial_axes)
            cw = 1.0 / vol
        else:
            cw = jnp.broadcast_to(jnp.asarray(class_weights, jnp.float32)[None],
                                  loss.shape)
        cw = cw / jnp.sum(cw, -1, keepdims=True)
        loss = jnp.sum(loss * cw, -1)
    return jnp.mean(loss)


def weighted_l2_loss(gt, pred, target_value=5.0):
    """Pre-softmax weighted L2 (lab2im/layers.py:1382-1415): weights
    1-gt[...,0], targets ±target_value."""
    n_labels = gt.shape[-1]
    weights = (1.0 - gt[..., 0] + 1e-8)[..., None]
    return jnp.sum(weights * jnp.square(pred - target_value * (2 * gt - 1))) / \
        (jnp.sum(weights) * n_labels)


def cross_entropy_loss(gt, pred, class_weights=None, enable_checks=True):
    """Per-voxel CE summed over labels, averaged over voxels
    (lab2im/layers.py:1418-1529)."""
    if enable_checks:
        gt = jnp.clip(gt / (jnp.sum(gt, -1, keepdims=True) + _EPS), 0, 1)
        pred = pred / (jnp.sum(pred, -1, keepdims=True) + _EPS)
        pred = jnp.clip(pred, _EPS, 1 - _EPS)
    ce = -gt * jnp.log(pred)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        cw = cw / jnp.sum(cw)
        ce = ce * cw
    return jnp.mean(jnp.sum(ce, axis=-1))


def moment_loss(gt, pred, enable_checks=True):
    """Distance between centres of gravity per channel
    (lab2im/layers.py:1532-1616)."""
    ndims = gt.ndim - 2
    spatial_axes = tuple(range(1, ndims + 1))
    if enable_checks:
        gt = gt / (jnp.sum(gt, -1, keepdims=True) + _EPS)
        pred = pred / (jnp.sum(pred, -1, keepdims=True) + _EPS)
    spatial = gt.shape[1:-1]
    coords = jnp.stack(jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32)
                                      for s in spatial], indexing="ij"), -1)
    coords = coords[None, ..., None, :]  # (1, *spatial, 1, ndims)

    def centre(x):
        num = jnp.sum(x[..., None] * coords, spatial_axes)   # (B, nchan, ndims)
        den = jnp.sum(x, spatial_axes)[..., None] + _EPS
        return num / den

    d = jnp.sqrt(jnp.sum(jnp.square(centre(pred) - centre(gt)), axis=-1))
    return jnp.mean(d)
