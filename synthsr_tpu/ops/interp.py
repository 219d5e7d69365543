"""N-D interpolation / warping / resizing primitives in pure JAX.

TPU-first re-design of the tensor-math layer of the reference
(``ext/neuron/utils.py``: interpn :25, resize :127, affine_to_shift :160,
combine_non_linear_and_aff_to_shift :222, transform :289, integrate_vec :323).
Everything is a pure function over static shapes — vectorized gathers replace
the reference's per-corner python loops over ``tf.map_fn``, and batching is
obtained with ``jax.vmap`` at call sites.

Coordinate conventions (identical to the reference):
- ``interpn`` clips sample locations to ``[0, dim-1]`` (edge replication).
- ``resize`` maps output index ``g`` to input coordinate ``g / zoom``
  (corner-aligned at 0).
- ``affine_to_shift`` applies the affine around the volume centre
  ``(shape-1)/2`` and returns a dense shift (displacement) field.
- ``integrate_vec`` is scaling-and-squaring: ``v /= 2**k`` then ``k`` times
  ``v += warp(v, v)``.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


def ndgrid(shape, dtype=jnp.float32):
    """List of len(shape) index grids, 'ij' indexing (ref neuron/utils.py:433)."""
    return [g.astype(dtype) for g in
            jnp.meshgrid(*[jnp.arange(s) for s in shape], indexing="ij")]


def interpn(vol: jnp.ndarray, loc: jnp.ndarray, method: str = "linear") -> jnp.ndarray:
    """Interpolate ``vol`` at locations ``loc``.

    :param vol: array of shape (*spatial,) or (*spatial, C).
    :param loc: float array (..., ndims) of sample coordinates in voxel units.
    :param method: 'linear' or 'nearest'.
    :return: (..., C) samples, or (...) if ``vol`` had no channel axis.

    Mirrors reference ``interpn`` (neuron/utils.py:25-124): coordinates are
    clipped to the volume bounds, so out-of-range samples replicate the edge.
    """
    ndims = loc.shape[-1]
    squeeze_ch = vol.ndim == ndims
    if squeeze_ch:
        vol = vol[..., None]
    if vol.ndim != ndims + 1:
        raise ValueError(f"vol rank {vol.ndim} does not match loc dims {ndims}")
    spatial = vol.shape[:-1]
    nc = vol.shape[-1]
    flat = vol.reshape(-1, nc)
    # row strides for flattened (C-order) spatial indexing
    strides = []
    s = 1
    for d in reversed(spatial):
        strides.insert(0, s)
        s *= d
    loc = loc.astype(jnp.float32)

    if method == "nearest":
        idx = 0
        for d in range(ndims):
            c = jnp.clip(jnp.round(loc[..., d]).astype(jnp.int32), 0, spatial[d] - 1)
            idx = idx + c * strides[d]
        out = jnp.take(flat, idx, axis=0)
    elif method == "linear":
        loc0 = jnp.floor(loc)
        clipped = [jnp.clip(loc[..., d], 0, spatial[d] - 1) for d in range(ndims)]
        idx0 = [jnp.clip(loc0[..., d], 0, spatial[d] - 1).astype(jnp.int32)
                for d in range(ndims)]
        idx1 = [jnp.minimum(idx0[d] + 1, spatial[d] - 1) for d in range(ndims)]
        # weight of the 'low' corner along d is (idx1 - clipped); 'high' corner 1-that
        w_lo = [idx1[d].astype(jnp.float32) - clipped[d] for d in range(ndims)]
        out = 0.0
        for corner in itertools.product((0, 1), repeat=ndims):
            idx = 0
            wt = 1.0
            for d in range(ndims):
                idx = idx + (idx1[d] if corner[d] else idx0[d]) * strides[d]
                wt = wt * (1.0 - w_lo[d] if corner[d] else w_lo[d])
            out = out + wt[..., None] * jnp.take(flat, idx, axis=0).astype(jnp.float32)
    else:
        raise ValueError(f"method must be 'linear' or 'nearest', got {method}")

    return out[..., 0] if squeeze_ch else out


def interpn_packed(vol: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Trilinear ``interpn`` via ONE wide gather of a packed corner table.

    Builds a (nvox, 8·C) table whose row i holds the 8 corner values of cell
    i (vol edge-padded by one on the high side, so ``idx0+1`` is always
    valid), then gathers one row per sample instead of 8 scalar-row gathers.
    TPU gathers pay per ROW, so the 8× wider row is ~free while the gather
    count drops 8× — at the cost of materializing the 8× table (cheap,
    sequential HBM writes).  Same math as ``interpn``'s linear path — same
    corner set, weights and accumulation order (edge samples hit padded rows
    that replicate the edge value, so the different weight-split at the
    boundary multiplies equal values) — equal up to 1-ulp f32 rounding in
    the weight computation.

    3-D only.  Reference semantics: neuron/utils.py:25-124."""
    ndims = loc.shape[-1]
    assert ndims == 3, "interpn_packed is 3-D only"
    squeeze_ch = vol.ndim == ndims
    if squeeze_ch:
        vol = vol[..., None]
    spatial = vol.shape[:-1]
    nc = vol.shape[-1]
    # high-side edge pad: corner idx0+1 at the boundary reads the replica
    padded = jnp.pad(vol, [(0, 1)] * 3 + [(0, 0)], mode="edge")
    X, Y, Z = spatial
    # packed[i, c] = vol cell-corner c of cell i (C-order over (X, Y, Z))
    corners = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                corners.append(jax.lax.slice(
                    padded, (cx, cy, cz, 0), (cx + X, cy + Y, cz + Z, nc)))
    packed = jnp.concatenate(corners, axis=-1).reshape(-1, 8 * nc)

    loc = loc.astype(jnp.float32)
    clipped = [jnp.clip(loc[..., d], 0, spatial[d] - 1) for d in range(3)]
    loc0 = jnp.floor(loc)
    idx0 = [jnp.clip(loc0[..., d], 0, spatial[d] - 1).astype(jnp.int32)
            for d in range(3)]
    w_hi = [clipped[d] - idx0[d].astype(jnp.float32) for d in range(3)]
    rows = jnp.take(packed, (idx0[0] * Y + idx0[1]) * Z + idx0[2], axis=0)
    out = 0.0
    c = 0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                wt = ((w_hi[0] if cx else 1.0 - w_hi[0])
                      * (w_hi[1] if cy else 1.0 - w_hi[1])
                      * (w_hi[2] if cz else 1.0 - w_hi[2]))
                out = out + wt[..., None] * rows[..., c * nc:(c + 1) * nc]
                c += 1
    return out[..., 0] if squeeze_ch else out


def transform(vol: jnp.ndarray, loc_shift: jnp.ndarray, method: str = "linear",
              packed: bool = False):
    """Warp ``vol`` by a dense shift field (ref neuron/utils.py:289-320).

    Output at x takes data from ``vol[x + loc_shift[x]]``.
    ``loc_shift``: (*spatial, ndims).

    ``packed``: route linear warps through the packed-corner single gather
    (``interpn_packed``, 3.7× on big-table warps; costs an 8× table
    materialization, so keep it for full-volume warps, not tiny fields).
    """
    spatial = loc_shift.shape[:-1]
    ndims = loc_shift.shape[-1]
    mesh = ndgrid(spatial)
    loc = jnp.stack([mesh[d] + loc_shift[..., d] for d in range(ndims)], axis=-1)
    if packed and method == "linear" and ndims == 3:
        return interpn_packed(vol, loc)
    return interpn(vol, loc, method=method)


def affine_to_shift(affine: jnp.ndarray, shape, shift_center: bool = True):
    """Dense shift field realizing an affine transform (ref neuron/utils.py:160-219).

    ``affine``: (ndims, ndims+1) or (ndims+1, ndims+1) matrix mapping output to
    input coordinates, applied around the volume centre when ``shift_center``.
    """
    ndims = len(shape)
    affine = affine.astype(jnp.float32)
    if affine.ndim == 1:
        affine = affine.reshape(ndims, ndims + 1)
    mesh = ndgrid(shape)
    if shift_center:
        mesh = [mesh[d] - (shape[d] - 1) / 2.0 for d in range(ndims)]
    nvox = 1
    for s in shape:
        nvox *= int(s)
    flat = jnp.stack([m.reshape(-1) for m in mesh] + [jnp.ones(nvox)], axis=0)  # (ndims+1, nvox)
    loc = (affine[:ndims] @ flat).T.reshape(*shape, ndims)
    return loc - jnp.stack(mesh, axis=-1)


def combine_nonlinear_and_affine_shift(svf_shift: jnp.ndarray, affine: jnp.ndarray,
                                       shift_center: bool = True):
    """Shift field for affine∘nonlinear (ref neuron/utils.py:222-286).

    The affine is applied to (centered mesh + nonlinear shift).
    """
    shape = svf_shift.shape[:-1]
    ndims = svf_shift.shape[-1]
    affine = affine.astype(jnp.float32)
    if affine.ndim == 1:
        affine = affine.reshape(ndims, ndims + 1)
    mesh = ndgrid(shape)
    if shift_center:
        mesh = [mesh[d] - (shape[d] - 1) / 2.0 for d in range(ndims)]
    moved = [mesh[d] + svf_shift[..., d] for d in range(ndims)]
    flat = jnp.stack([m.reshape(-1) for m in moved] + [jnp.ones(moved[0].size)], axis=0)
    loc = (affine[:ndims] @ flat).T.reshape(*shape, ndims)
    return loc - jnp.stack(mesh, axis=-1)


def resize(vol: jnp.ndarray, new_shape, zoom_factor=None, method: str = "linear"):
    """Zoom-style resize: output index g samples input at g / zoom
    (ref neuron/utils.py:127-156).

    ``vol``: (*spatial,) or (*spatial, C). ``zoom_factor`` defaults to
    new_shape / old_shape per axis; may be traced scalars.

    TPU note: resize is separable, so for 3-D volumes it runs as one
    per-axis sampling matrix per dimension on the MXU (~50x faster than the
    gather formulation on TPU); the result is numerically identical.
    """
    ndims = len(new_shape)
    spatial = vol.shape[:ndims]
    if zoom_factor is None:
        zoom_factor = [new_shape[d] / spatial[d] for d in range(ndims)]
    elif not isinstance(zoom_factor, (list, tuple)):
        zoom_factor = [zoom_factor] * ndims

    if ndims == 3:
        from .linops import apply_axis_ops, sample_matrix

        mats = []
        for d in range(3):
            coords = jnp.arange(new_shape[d], dtype=jnp.float32) / zoom_factor[d]
            mats.append(sample_matrix(coords, spatial[d], method=method))
        out = apply_axis_ops(vol, mats)
        if jnp.issubdtype(vol.dtype, jnp.integer):
            out = jnp.round(out).astype(vol.dtype)
        return out

    mesh = ndgrid(new_shape)
    loc = jnp.stack([mesh[d] / zoom_factor[d] for d in range(ndims)], axis=-1)
    return interpn(vol, loc, method=method)


def stencil_warp(vol: jnp.ndarray, shift: jnp.ndarray, radius: int):
    """Trilinear warp for displacement fields bounded by ``radius``.

    When |shift| ≤ radius pointwise, the clipped-gather warp (transform) is
    EXACTLY a weighted sum of the (2·radius+1)³ edge-padded shifted copies of
    the volume with separable hat weights max(0, 1-|s-d|) — pure VPU
    slice-multiply-adds, ~30× faster than the gather path on TPU.
    ``vol``: (*spatial, C); ``shift``: (*spatial, 3)."""
    r = int(radius)
    spatial = shift.shape[:-1]
    padded = jnp.pad(vol, [(r, r)] * 3 + [(0, 0)], mode="edge")
    # per-axis hat weights for each tap offset d in [-r, r]
    w_ax = []
    for a in range(3):
        s = shift[..., a]
        w_ax.append([jnp.maximum(0.0, 1.0 - jnp.abs(s - d))
                     for d in range(-r, r + 1)])
    out = jnp.zeros(spatial + (vol.shape[-1],), jnp.float32)
    X, Y, Z = spatial
    for ix, dx in enumerate(range(-r, r + 1)):
        wx = w_ax[0][ix]
        for iy, dy in enumerate(range(-r, r + 1)):
            wxy = wx * w_ax[1][iy]
            for iz, dz in enumerate(range(-r, r + 1)):
                w = (wxy * w_ax[2][iz])[..., None]
                view = jax.lax.slice(
                    padded, (r + dx, r + dy, r + dz, 0),
                    (r + dx + X, r + dy + Y, r + dz + Z, vol.shape[-1]))
                out = out + w * view
    return out


def integrate_vec(vec: jnp.ndarray, nb_steps: int = 7,
                  max_displacement: float | None = None,
                  stencil_radius_cap: int = 3,
                  runtime_stencil: bool | None = None):
    """Integrate a stationary velocity field by scaling-and-squaring
    (ref neuron/utils.py:323-386, method='ss').

    ``vec``: (*spatial, ndims). Returns the displacement field.

    ``max_displacement``: optional STATIC bound on |vec| (per component, in
    voxels). Scaling-and-squaring guarantees |v_j| ≤ max_displacement/2^(k-j),
    so early squaring steps can run as exact stencil warps (see stencil_warp)
    instead of gathers; steps whose bound exceeds ``stencil_radius_cap`` fall
    back to the gather. Identical results for fields within the bound.

    ``runtime_stencil``: over-cap steps dispatch at RUNTIME on the realized
    ``max |v_j|`` — the static bound is the loose 4σ clip of the raw draw,
    while the integrated field is usually well inside the stencil cap, so
    the common case takes the stencil and only tail draws pay the gather.
    Both branches are exact, so this only reorders f32 rounding.  NOTE: the
    dispatch survives as a true branch only OUTSIDE ``jax.vmap`` (vmap turns
    a batched-predicate ``cond`` into run-both-and-select) — the train step
    calls the generator unvmapped at local batch 1 for exactly this reason.
    Default ON via $SYNTHSR_RUNTIME_STENCIL (round-4 A/B, tools/ab_svf.sh:
    7.665 -> 8.009 steps/s on bench_train; the all-gather policy
    SYNTHSR_SVF_GATHER=1 measured 3.828 — a recorded negative: in-context
    gathers are ~2x the whole stencil mix even though a STANDALONE squaring
    gather probes at 0.15 ms, tools/probe_warp.py).
    """
    import math
    import os

    if nb_steps == 0:
        return vec
    vec = vec / (2 ** nb_steps)

    # SYNTHSR_SVF_GATHER=1: ignore the stencil fast path entirely (all
    # squaring steps as 8-corner gathers) — A/B switch for the integration
    # policy; see the round-4 probe notes in STATUS.md
    if max_displacement is None or \
            os.environ.get("SYNTHSR_SVF_GATHER", "0") == "1":
        def body(_, v):
            return v + transform(v, v, method="linear")

        return jax.lax.fori_loop(0, nb_steps, body, vec)

    if runtime_stencil is None:
        runtime_stencil = os.environ.get("SYNTHSR_RUNTIME_STENCIL", "1") == "1"
    if runtime_stencil:
        try:  # under vmap (batch >= 2) a cond runs BOTH branches — costs
            # strictly more than the static gather; keep the static dispatch
            from jax.interpreters.batching import BatchTracer

            if isinstance(vec, BatchTracer):
                runtime_stencil = False
        except ImportError:  # pragma: no cover - jax internals moved
            pass

    v = vec
    for j in range(nb_steps):
        bound = max_displacement / (2 ** (nb_steps - j))
        radius = max(1, int(math.ceil(bound)))
        if radius <= stencil_radius_cap:
            v = v + stencil_warp(v, v, radius)
        elif runtime_stencil:
            v = v + jax.lax.cond(
                jnp.max(jnp.abs(v)) <= float(stencil_radius_cap),
                lambda u: stencil_warp(u, u, stencil_radius_cap),
                lambda u: transform(u, u, method="linear"), v)
        else:
            v = v + transform(v, v, method="linear")
    return v
