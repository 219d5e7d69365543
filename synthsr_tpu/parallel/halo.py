"""Spatially-sharded U-Net inference with halo exchange.

The reference is single-GPU and caps volume size by HBM (SURVEY.md §5
'long-context' analogue).  Here a single volume is sharded along its first
spatial axis across the mesh; every 3³ convolution exchanges a 1-voxel halo
with its neighbours (``ppermute`` over ICI) and runs VALID locally, which is
EXACT — bit-comparable to the unsharded forward, unlike overlap-tile
stitching.  Pools, upsampling, batch-norm (inference stats) and skip concats
are local.  This is the context-parallelism analogue for 3-D volumes: a 16G
chip tops out just under 256³ (13.6G single-pass temp), so sharding the X
axis over N chips scales the feasible volume ~linearly.

Use: ``sharded_unet_apply(model, variables, x, mesh, axis='space')`` where x
is the full (1, X, Y, Z, C) volume; X must be divisible by
n_devices · 2^(nb_levels-1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import _activation


def halo_pad(x, axis_name: str, halo: int = 1):
    """Pad the local X axis (axis 1 of NDHWC) with neighbour slices; global
    boundaries get zeros (SAME-conv semantics)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    left_edge = x[:, :halo]
    right_edge = x[:, -halo:]
    # send my right edge to my right neighbour (it becomes their left halo)
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(left_edge)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _halo_conv(x, kernel, bias, axis_name, compute_dtype):
    """3³ SAME conv with the sharded X axis halo-exchanged."""
    k = kernel.shape[0]
    h = (k - 1) // 2
    if h > 0:
        x = halo_pad(x, axis_name, h)
        # X is VALID over the exchanged halo; Y/Z keep SAME zero padding
        padding = [(0, 0), (h, h), (h, h)]
    else:
        padding = "SAME"
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype), (1, 1, 1), padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias.astype(compute_dtype)


def _bn_inference(x, scale, b, mean, var, eps=1e-3):
    inv = jax.lax.rsqrt(var.astype(x.dtype) + eps)
    return (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype) + b.astype(x.dtype)


def _local_unet_forward(params, batch_stats, x, model, axis_name):
    """The UNet3D forward (models/unet.py) with halo-exchanged convolutions."""
    act = _activation(model.activation)
    dt = model.compute_dtype
    pool = (model.pool_size,) * 3
    x = x.astype(dt)
    skips = {}
    for level in range(model.nb_levels):
        for conv in range(model.nb_conv_per_level):
            p = params[f"conv_downarm_{level}_{conv}"]
            x = act(_halo_conv(x, p["kernel"], p["bias"], axis_name, dt))
        skips[level] = x
        if model.use_batch_norm:
            bnp = params[f"bn_down_{level}"]
            bns = batch_stats[f"bn_down_{level}"]
            x = _bn_inference(x, bnp["scale"], bnp["bias"], bns["mean"], bns["var"])
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
            bnp = params[f"bn_up_{level}"]
            bns = batch_stats[f"bn_up_{level}"]
            x = _bn_inference(x, bnp["scale"], bnp["bias"], bns["mean"], bns["var"])
    p = params["likelihood"]
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["kernel"].astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    return x.astype(jnp.float32)


def make_spatial_mesh(n_devices=None, axis="space"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_unet_apply(model, variables, x, mesh, axis="space", jit=True):
    """Exact spatially-sharded forward of (1, X, Y, Z, C) over ``mesh``."""
    n = mesh.shape[axis]
    assert x.shape[1] % (n * model.pool_size ** (model.nb_levels - 1)) == 0, \
        (f"X={x.shape[1]} must be divisible by n_devices*2^(levels-1)="
         f"{n * model.pool_size ** (model.nb_levels - 1)}")
    from jax import shard_map

    fwd = shard_map(
        partial(_local_unet_forward, model=model, axis_name=axis),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False)

    def run(variables, x):
        return fwd(variables["params"], variables["batch_stats"], x)

    if jit:
        run = jax.jit(run)
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    return run(variables, x)
