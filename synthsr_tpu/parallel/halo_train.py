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


def _global_masked_loss(pred, target, crop, axis_name, metrics, local_x,
                        global_x):
    """LOCAL SHARD of the l1/l2 loss over the centre ``crop`` of the GLOBAL
    volume: this device's masked error sum over the psummed global count.
    Shards SUM to regression_loss's center_crop + mean on the unsharded
    volume — psum the returned value for display only, OUTSIDE jax.grad.

    Differentiating the local shard (not the psummed total) matters: the
    transpose of psum is psum, so a replicated (pre-psummed) objective would
    hand every device an n×-scaled cotangent, and the later psum of the
    parameter gradients would then double-count — n× gradients overall.
    The count psums are AD-inert (data-independent)."""
    err = jnp.abs(pred - target) if metrics == "l1" else jnp.square(pred - target)
    if crop is None:
        count = jax.lax.psum(jnp.float32(err.size), axis_name)
        return jnp.sum(err) / count
    from ..utils.misc import reformat_to_list

    spatial = (global_x,) + tuple(pred.shape[2:-1])
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


def make_halo_train_step(model, optimizer, mesh, axis="space", metrics="l1",
                         loss_cropping=None, residual_indices=None,
                         global_x=None):
    """Jitted spatially-sharded train step:
    (params, batch_stats, opt_state, image, target) -> (state..., loss).

    image/target: (1, X, Y, Z, C) sharded along X over ``mesh[axis]``;
    X must be divisible by n_devices·2^(nb_levels−1).  metrics: l1 | l2
    (ssim needs cross-shard windows — unsupported here; use DP for it).
    """
    if metrics not in ("l1", "l2"):
        raise ValueError("halo-sharded training supports l1/l2 metrics only")
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]

    def local_step(params, batch_stats, opt_state, image, target):
        local_x = image.shape[1]

        def loss_fn(p):
            out, updates = local_unet_forward_train(p, batch_stats, image,
                                                    model, axis)
            if residual_indices is not None:
                res = jnp.stack([image[..., i] for i in residual_indices], -1)
                out = out + res
            loss = _global_masked_loss(out, target, loss_cropping, axis,
                                       metrics, local_x, local_x * n)
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
        check_rep=False)

    def step(params, batch_stats, opt_state, image, target):
        image = jax.lax.with_sharding_constraint(
            image, NamedSharding(mesh, P(None, axis)))
        target = jax.lax.with_sharding_constraint(
            target, NamedSharding(mesh, P(None, axis)))
        return sharded(params, batch_stats, opt_state, image, target)

    return jax.jit(step)
