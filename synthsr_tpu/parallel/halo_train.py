"""Spatially-sharded TRAINING with halo-exchange convolutions.

Completes the volume-scaling story of ``parallel/halo.py`` (SURVEY.md §5
"long-context" analogue): a single training example is sharded along its
first spatial axis across the mesh, every 3³ convolution halo-exchanges one
voxel with its neighbours (``ppermute`` over ICI), and the BACKWARD pass is
obtained by differentiating straight through the ``shard_map``-ed step — the
transpose of a halo exchange is the reversed halo exchange, which JAX derives
automatically.  Parameters stay replicated; their gradients are ``psum``-med
across the spatial axis, making one sharded step numerically equivalent to
the unsharded step on the full volume (tested to f32 tolerance on a CPU
mesh, tests/test_halo.py).

This is how a 16G chip trains beyond its single-chip volume ceiling: a 256³
supervised step peaks well over HBM with batch 1 (CLAUDE.md), but X-sharding
over N chips divides every activation N ways.  Generation is NOT sharded —
this step consumes pre-generated (image, target) pairs (e.g. real-image
fine-tuning, or a DP generator feeding a spatial-sharded trainer).

BatchNorm in train mode computes its statistics GLOBALLY (psum of per-shard
sums), matching flax's ``use_fast_variance`` math (mean of squares minus
squared mean) so sharded and unsharded steps see identical normalization.

The reference has no analogue (single-GPU Keras, SURVEY.md §2 bottom rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.unet import _activation
from ..ops.losses import ssim_plane_map
from .halo import _halo_conv


def _bn_train_global(x, p, s, axis_name, momentum=0.99, eps=1e-3):
    """flax nn.BatchNorm train-mode math with cross-shard statistics.

    Returns (y, new_stats). Statistics are computed in f32 over all axes but
    channels, summed across the sharded axis with psum (use_fast_variance
    semantics: var = E[x²] − E[x]²)."""
    xf = x.astype(jnp.float32)
    local_n = float(np.prod(x.shape[:-1]))
    n = jax.lax.psum(jnp.float32(local_n), axis_name)
    mean = jax.lax.psum(jnp.sum(xf, axis=(0, 1, 2, 3)), axis_name) / n
    mean2 = jax.lax.psum(jnp.sum(jnp.square(xf), axis=(0, 1, 2, 3)), axis_name) / n
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    dt = x.dtype
    inv = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(eps, dt))
    y = (x - mean.astype(dt)) * inv * p["scale"].astype(dt) + p["bias"].astype(dt)
    new_stats = {"mean": momentum * s["mean"] + (1 - momentum) * mean,
                 "var": momentum * s["var"] + (1 - momentum) * var}
    return y, new_stats


def local_unet_forward_train(params, batch_stats, x, model, axis_name):
    """Train-mode UNet3D forward (models/unet.py semantics) with
    halo-exchanged convolutions; returns (out, new_batch_stats)."""
    act = _activation(model.activation)
    dt = model.compute_dtype
    pool = (model.pool_size,) * 3
    x = x.astype(dt)
    skips = {}
    new_stats = {}
    for level in range(model.nb_levels):
        for conv in range(model.nb_conv_per_level):
            p = params[f"conv_downarm_{level}_{conv}"]
            x = act(_halo_conv(x, p["kernel"], p["bias"], axis_name, dt))
        skips[level] = x
        if model.use_batch_norm:
            name = f"bn_down_{level}"
            x, new_stats[name] = _bn_train_global(x, params[name],
                                                  batch_stats[name], axis_name)
        if level < model.nb_levels - 1:
            import flax.linen as nn

            x = nn.max_pool(x, pool, strides=pool, padding="SAME")
    for level in range(model.nb_levels - 1):
        src = model.nb_levels - 2 - level
        for ax, f in zip((1, 2, 3), pool):
            x = jnp.repeat(x, f, axis=ax)
        x = jnp.concatenate([skips[src].astype(x.dtype), x], axis=-1)
        for conv in range(model.nb_conv_per_level):
            p = params[f"conv_uparm_{model.nb_levels + level}_{conv}"]
            x = act(_halo_conv(x, p["kernel"], p["bias"], axis_name, dt))
        if model.use_batch_norm:
            name = f"bn_up_{level}"
            x, new_stats[name] = _bn_train_global(x, params[name],
                                                  batch_stats[name], axis_name)
    p = params["likelihood"]
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["kernel"].astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    return x.astype(jnp.float32), new_stats


def _global_masked_loss(err, crop, axis_name, local_x, global_x):
    """LOCAL SHARD of the mean of a POINTWISE per-voxel error tensor over the
    centre ``crop`` of the GLOBAL volume: this device's masked error sum over
    the psummed global count.  Covers l1, l2 and the laplace NLL
    (metrics_model.py:93-106 — all pointwise maps of (pred, target)).
    Shards SUM to regression_loss's center_crop + mean on the unsharded
    volume — psum the returned value for display only, OUTSIDE jax.grad.

    Differentiating the local shard (not the psummed total) matters: the
    transpose of psum is psum, so a replicated (pre-psummed) objective would
    hand every device an n×-scaled cotangent, and the later psum of the
    parameter gradients would then double-count — n× gradients overall.
    The count psums are AD-inert (data-independent)."""
    if crop is None:
        count = jax.lax.psum(jnp.float32(err.size), axis_name)
        return jnp.sum(err) / count
    from ..utils.misc import reformat_to_list

    spatial = (global_x,) + tuple(err.shape[2:-1])
    crop = reformat_to_list(crop, length=3)
    begin = [int((spatial[i] - crop[i]) / 2) for i in range(3)]
    # sharded X axis: mask by global coordinate
    x0 = jax.lax.axis_index(axis_name) * local_x
    gx = x0 + jnp.arange(local_x)
    mx = ((gx >= begin[0]) & (gx < begin[0] + crop[0]))
    mask = mx.astype(jnp.float32).reshape(1, -1, 1, 1, 1)
    # local Y/Z axes: static slice
    sl = (slice(None), slice(None),
          slice(begin[1], begin[1] + crop[1]),
          slice(begin[2], begin[2] + crop[2]), slice(None))
    masked = err[sl] * mask
    # count = (#selected x planes) * batch * crop_y * crop_z * channels
    count = jax.lax.psum(jnp.sum(mask) * jnp.float32(
        err[sl].shape[0] * err[sl].shape[2] * err[sl].shape[3] * err[sl].shape[4]),
        axis_name)
    return jnp.sum(masked) / count


def _halo_pad_last(v, axis_name, h):
    """Pad the LAST axis (the sharded global X, transposed trailing) with h
    neighbour voxels via ppermute; global edges get zeros (same machinery as
    halo.halo_pad, different axis)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    left_edge = v[..., :h]
    right_edge = v[..., -h:]
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(left_edge)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, v, from_right], axis=-1)


def _global_ssim3d_loss(pred, target, crop, axis_name, local_x, global_x,
                        max_val=1.0, filter_size=11):
    """LOCAL SHARD of the 3-plane SSIM loss (ops/losses.ssim3d_loss semantics,
    reference metrics_model.py:108-128) over the centre ``crop`` of the
    GLOBAL X-sharded volume; shards SUM to crop-then-ssim on the unsharded
    volume (differentiate the local shard — see _global_masked_loss).

    Crop-exactness: the SSIM window conv is VALID, so the windows of the
    CROPPED volume are exactly the full-volume windows lying fully inside the
    crop — cropping the sharded X axis therefore reduces to masking window
    centres by global coordinate, no data movement.  Two of the three plane
    orientations window only (Y, Z) and are fully local; the third windows
    along X and needs a (filter_size//2)-voxel halo exchange — the same
    ppermute machinery as the convolutions."""
    hw = filter_size // 2
    assert local_x >= hw, \
        (f"ssim needs a {hw}-voxel halo: local X shard {local_x} is too thin "
         f"(use fewer shards or a larger volume)")
    p = pred[..., 0].astype(jnp.float32)
    t = target[..., 0].astype(jnp.float32)
    b, y, z = p.shape[0], p.shape[2], p.shape[3]
    if crop is None:
        bx0, cx, by0, cy, bz0, cz = 0, global_x, 0, y, 0, z
    else:
        from ..utils.misc import reformat_to_list

        crop3 = reformat_to_list(crop, length=3)
        bx0, cx = int((global_x - crop3[0]) / 2), crop3[0]
        by0, cy = int((y - crop3[1]) / 2), crop3[1]
        bz0, cz = int((z - crop3[2]) / 2), crop3[2]
    # Y/Z crops are local static slices
    p = p[:, :, by0:by0 + cy, bz0:bz0 + cz]
    t = t[:, :, by0:by0 + cy, bz0:bz0 + cz]
    gx = jax.lax.axis_index(axis_name) * local_x + jnp.arange(local_x)

    # orientations 1+2: (Y,Z) and (Z,Y) windows, local; any x plane inside
    # the crop contributes
    in_x = ((gx >= bx0) & (gx < bx0 + cx)).astype(jnp.float32)
    m1 = ssim_plane_map(p, t, max_val)
    m2 = ssim_plane_map(jnp.swapaxes(p, 2, 3), jnp.swapaxes(t, 2, 3), max_val)
    cnt12 = float(b * cx * (cy - 2 * hw) * (cz - 2 * hw))
    s12 = (jnp.sum(m1 * in_x[None, :, None, None])
           + jnp.sum(m2 * in_x[None, :, None, None])) / cnt12

    # orientation 3: (Z, X) windows — halo-exchange hw voxels along X; the
    # VALID conv over [halo, local, halo] yields one window per local plane,
    # centred at that plane's global x; keep centres fully inside the crop
    p3 = _halo_pad_last(jnp.transpose(p, (0, 2, 3, 1)), axis_name, hw)
    t3 = _halo_pad_last(jnp.transpose(t, (0, 2, 3, 1)), axis_name, hw)
    m3 = ssim_plane_map(p3, t3, max_val)  # (b, cy, cz-2hw, local_x)
    vx = ((gx >= bx0 + hw) & (gx <= bx0 + cx - 1 - hw)).astype(jnp.float32)
    cnt3 = float(b * cy * (cz - 2 * hw) * (cx - 2 * hw))
    s3 = jnp.sum(m3 * vx[None, None, None, :]) / cnt3

    return -(s12 + s3) / 3.0


def make_halo_train_step(model, optimizer, mesh, axis="space", metrics="l1",
                         loss_cropping=None, residual_indices=None,
                         global_x=None):
    """Jitted spatially-sharded train step:
    (params, batch_stats, opt_state, image, target) -> (state..., loss).

    image/target: (1, X, Y, Z, C) sharded along X over ``mesh[axis]``;
    X must be divisible by n_devices·2^(nb_levels−1).  metrics: l1 | l2 |
    ssim | laplace (ssim halo-exchanges 5 voxels for its cross-shard X
    windows; laplace — metrics_model.py:93-106's pointwise NLL with the net
    output split into intensity/spread channel halves — needs no exchange).
    """
    if metrics not in ("l1", "l2", "ssim", "laplace"):
        raise ValueError(
            "halo-sharded training supports l1/l2/ssim/laplace metrics")
    from jax import shard_map

    n = mesh.shape[axis]

    def local_step(params, batch_stats, opt_state, image, target):
        local_x = image.shape[1]

        def loss_fn(p):
            out, updates = local_unet_forward_train(p, batch_stats, image,
                                                    model, axis)
            if metrics == "laplace":
                nc = out.shape[-1] // 2
                intens, spreads = out[..., :nc], out[..., nc:]
            else:
                intens, spreads = out, None
            if residual_indices is not None:
                res = jnp.stack([image[..., i] for i in residual_indices], -1)
                intens = intens + res
            if metrics == "ssim":
                loss = _global_ssim3d_loss(intens, target, loss_cropping,
                                           axis, local_x, local_x * n)
            else:
                if metrics == "laplace":
                    # ops/losses.laplace_nll per-voxel map
                    b = 1e-5 + 0.02 * jnp.exp(spreads)
                    err = jnp.log(2.0 * b) + jnp.abs(intens - target) / b
                elif metrics == "l1":
                    err = jnp.abs(intens - target)
                else:
                    err = jnp.square(intens - target)
                loss = _global_masked_loss(err, loss_cropping, axis,
                                           local_x, local_x * n)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, axis)
        loss = jax.lax.psum(loss, axis)  # display value; outside the grad
        upd, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, upd)
        return new_params, updates, new_opt_state, loss

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    def step(params, batch_stats, opt_state, image, target):
        image = jax.lax.with_sharding_constraint(
            image, NamedSharding(mesh, P(None, axis)))
        target = jax.lax.with_sharding_constraint(
            target, NamedSharding(mesh, P(None, axis)))
        return sharded(params, batch_stats, opt_state, image, target)

    return jax.jit(step)
