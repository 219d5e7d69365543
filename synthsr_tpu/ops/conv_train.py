"""Differentiable channels-first Pallas conv for the TRAINING path.

Round-2 verdict: the inference-only Pallas conv family (ops/conv_pallas.py)
left the training step's convolutions on XLA's channels-last path at the
very <=19% MXU utilization the kernel family was built to escape (reference
hot loop: SynthSR/training.py:449-453).  This module closes that gap with a
``jax.custom_vjp`` around the same kernels:

- **forward**: ``y = act(conv3d(x, w) + b)`` through the plane-streaming /
  grouped / blocked kernel dispatch of models/unet_cf.py (bias + activation
  fused in the kernel epilogue), falling back to a channels-first XLA conv
  for shapes outside the kernels' layout constraints;
- **input gradient**: the vjp of a SAME stride-1 3-cubed conv is ITSELF a
  SAME conv with spatially-flipped, in/out-transposed weights — so ``dx``
  runs back through the SAME Pallas dispatch (the flipped-weight TTA
  machinery already proves the kernels are weight-transform-agnostic);
- **weight gradient**: the canonical XLA kgrad convolution — a contraction
  over the (huge) spatial volume producing the (3, 3, 3, cin, cout) tensor,
  expressed in the giant-kernel form XLA's TPU backend pattern-matches
  (lhs = x with channels as batch, rhs = dy as a D-by-H-by-W kernel);
- **activation gradient**: recovered from the SAVED OUTPUT ``y`` (elu' =
  1 if y > 0 else y + 1; relu' = [y > 0]), so no pre-activation tensor is
  ever stored — residual memory equals the standard conv+act pair.

Multi-source inputs (the decoder's [skip, upsampled] pair) are accepted as a
tuple and never concatenated in the forward (multi-plane DMA); the backward
splits ``dx`` by channel offset and computes per-source weight gradients, so
the concatenated tensor never materializes in HBM in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .conv_pallas import (PREFER_FLAT, _flat_layout, _plane_layout,
                          _wgrad_flat_layout, _wgrad_layout, conv3d_cf,
                          conv3d_cf_flat, conv3d_cf_flat_grouped,
                          conv3d_cf_grouped, conv3d_cf_planes,
                          conv3d_cf_wgrad, split_flat_group_for,
                          split_group_for)


def train_conv_ok(cin, cout, spatial):
    """True when (cin, spatial) -> cout qualifies for a fast channels-first
    path worth using in training: a Pallas kernel (plane-streaming or
    grouped; the blocked kernel's halo re-reads are not competitive at
    training sizes) or the im2col-dot form (mid-level shapes)."""
    d, h, w = spatial
    if _plane_layout(cin, cout, d, h, w) is not None:
        return True
    if (w % 128 == 0 and d % 4 == 0
            and split_group_for(cin, cout, d, h, w) is not None):
        return True
    if _flat_layout(cin, cout, d, h, w) is not None:
        return True
    if split_flat_group_for(cin, cout, d, h, w) is not None:
        return True
    return _dot_conv_ok(cin, cout, spatial)


def _dot_conv_ok(cin, cout, spatial):
    """im2col-dot qualification — OPT-IN (SYNTHSR_DOT_CONV=1), recorded
    negative result: the spatial-on-lanes dot form looked ~2-5x faster than
    XLA's channels-last conv in per-layer microbenches, but those were
    dominated by per-dispatch tunnel overhead; inside the fused train step
    the 9x patch-matrix materialization (pad+slice+concat+reshape copies)
    costs more than it saves — 128-cubed tutorial-7 step measured 4.54
    steps/s with XLA channels-last mid levels vs 4.24 with the dot form.
    Kept for reference and for the oracle test; the winning mid-level
    layout remains channels-last XLA (unet_cf_train switches at 64-cubed)."""
    import os

    if not os.environ.get("SYNTHSR_DOT_CONV"):
        return False
    d, h, w = spatial
    s = d * h * w
    return 32 ** 3 <= s <= 64 ** 3 and max(cin, cout) <= 160 \
        and 9 * cin * s * 2 <= 2 ** 31


def _conv_dot(x, w, b, activation):
    """act(conv3d(x, w) + b) channels-first as ONE wide MXU dot: spatial on
    the lane axis instead of channels.

    im2col over the in-plane taps only — P (9·ci, S) holds the 9
    (dy, dx)-shifted views of the zero-padded input; the z-stacked weights
    (3·co, 9·ci) hit it in a single dot, and the three (co, S) z-parts
    combine with a padded shift-add over D (part dz evaluated at input plane
    z belongs to output plane z − dz + 1).  Same scheme as the Pallas
    plane-streaming kernel (conv_pallas.py) but at XLA level: ~9x input HBM
    traffic for the materialized P, affordable at <=64-cubed volumes where
    XLA's native channels-last conv runs at <=5 TFLOP/s for these channel
    counts (measured; the dot form is traffic-bound at ~80+ TFLOP/s MXU
    utilization)."""
    ci, d, h, wd = x.shape
    co = w.shape[-1]
    s = d * h * wd
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    p = jnp.concatenate([
        jax.lax.slice(xp, (0, 0, dy, dx), (ci, d, dy + h, dx + wd))
        for dy in range(3) for dx in range(3)], axis=0).reshape(9 * ci, s)
    wz = jnp.transpose(w, (0, 4, 1, 2, 3)).reshape(3 * co, 9 * ci)
    parts = jax.lax.dot_general(
        wz.astype(x.dtype), p,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(3, co, d, h, wd)
    # part dz computed at input plane q contributes to output plane q - dz + 1
    pre = parts[1]
    pre = pre + jnp.pad(parts[0, :, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    pre = pre + jnp.pad(parts[2, :, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    if b is not None:
        pre = pre + b.astype(pre.dtype).reshape(-1, 1, 1, 1)
    if activation == "elu":
        pre = jax.nn.elu(pre)
    elif activation == "relu":
        pre = jax.nn.relu(pre)
    elif activation == "leaky":
        pre = jax.nn.leaky_relu(pre, 0.2)
    return pre.astype(x.dtype)


def _apply_fused(sources, w, b, activation, interpret):
    """act(conv(x, w) + b) channels-first via the best-qualifying kernel.

    sources: tuple of (C_i, D, H, W) tensors conceptually concatenated on C.
    w: (3, 3, 3, cin_total, cout) float32; b: (cout,) float32 or None.
    """
    sources = [jax.lax.optimization_barrier(s) for s in sources]
    cin = sum(s.shape[0] for s in sources)
    d, h, wd = sources[0].shape[1:]
    cout = w.shape[-1]
    dt = sources[0].dtype
    x1 = sources[0] if len(sources) == 1 else list(sources)
    # SYNTHSR_PREFER_FLAT A/B (see conv_pallas.PREFER_FLAT)
    if PREFER_FLAT and _flat_layout(cin, cout, d, h, wd) is not None:
        y = conv3d_cf_flat(x1, w.astype(dt), bias=b, activation=activation,
                           interpret=interpret)
    elif PREFER_FLAT and all(
            _flat_layout(s.shape[0], cout, d, h, wd,
                         with_accum=True) is not None
            or split_flat_group_for(s.shape[0], cout, d, h, wd) is not None
            for s in sources):
        y = conv3d_cf_flat_grouped(x1, w, bias=b, activation=activation,
                                   interpret=interpret)
    elif _plane_layout(cin, cout, d, h, wd) is not None:
        y = conv3d_cf_planes(x1, w.astype(dt), bias=b, activation=activation,
                             interpret=interpret)
    elif wd % 128 == 0 and d % 4 == 0 and all(
            _plane_layout(s.shape[0], cout, d, h, wd) is not None
            or split_group_for(s.shape[0], cout, d, h, wd) is not None
            for s in sources):
        y = conv3d_cf_grouped(x1, w, bias=b, activation=activation,
                              interpret=interpret)
    elif len(sources) == 1 and cin <= 48 and wd % 128 == 0 and h % 16 == 0 \
            and d % 2 == 0:
        # blocked kernel: 128-multiple widths only (its strided halo
        # re-reads lose to both flat and XLA at w=160, measured)
        y = conv3d_cf(sources[0], w.astype(dt), bias=b,
                      activation=activation, interpret=interpret)
    elif _dot_conv_ok(cin, cout, (d, h, wd)):  # explicit opt-in overrides
        x = jnp.concatenate(sources, 0) if len(sources) > 1 else sources[0]
        y = _conv_dot(x, w, b, activation)
    elif _flat_layout(cin, cout, d, h, wd) is not None:
        # folded-plane kernel (64/32-cubed levels, pad-to-32 widths)
        y = conv3d_cf_flat(x1, w.astype(dt), bias=b, activation=activation,
                           interpret=interpret)
    elif all(_flat_layout(s.shape[0], cout, d, h, wd,
                          with_accum=True) is not None
             or split_flat_group_for(s.shape[0], cout, d, h, wd) is not None
             for s in sources):
        # channel-grouped folded-plane chaining (big-cin decoder convs at
        # non-128-multiple widths)
        y = conv3d_cf_flat_grouped(x1, w, bias=b, activation=activation,
                                   interpret=interpret)
    else:
        # channels-first XLA fallback (shapes the kernels don't cover —
        # mid-level 64-cubed training shapes; XLA lays out as it pleases)
        x = jnp.concatenate(sources, 0) if len(sources) > 1 else sources[0]
        y = jax.lax.conv_general_dilated(
            x[None], w.astype(dt), (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0]
        if b is not None:
            y = y + b.astype(y.dtype).reshape(-1, 1, 1, 1)
        if activation == "elu":
            y = jax.nn.elu(y)
        elif activation == "relu":
            y = jax.nn.relu(y)
        elif activation == "leaky":
            y = jax.nn.leaky_relu(y, 0.2)
    return jax.lax.optimization_barrier(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3d_cf_train(sources, w, b, activation=None, interpret=False,
                    want_dx=True):
    """Differentiable fused act(conv3d(x, w) + b), channels-first, batch-free.

    ``sources``: tuple of (C_i, D, H, W) inputs concatenated conceptually on
    the channel axis (pass a 1-tuple for plain convs).  Gradients flow to
    every source, ``w`` (3, 3, 3, cin, cout) and ``b`` (cout,).
    ``activation``: None | 'elu' | 'relu' — fused in the kernel epilogue and
    differentiated from the saved OUTPUT, so no preactivation is stored.
    ``want_dx=False`` skips the input-gradient conv in the backward and
    returns zero source cotangents: for FIRST-layer convs whose input is a
    constant w.r.t. the differentiated parameters, the custom_vjp otherwise
    computes a dead dx — e.g. the WGAN critic's 32→1-channel transposed conv
    at 128³, M = 3·cout = 3 of the MXU's 128 rows (jax can't prune inside a
    custom_vjp, so the caller must declare it).
    """
    return _apply_fused(sources, w, b, activation, interpret)


def _conv_train_fwd(sources, w, b, activation, interpret, want_dx):
    y = _apply_fused(sources, w, b, activation, interpret)
    return y, (tuple(sources), w, y)


def _act_grad_from_output(activation, y, dy):
    """dL/d(preactivation) from the saved post-activation output."""
    if activation == "elu":
        # elu(p) = p if p > 0 else exp(p) - 1  =>  elu' = 1 / (elu + 1);
        # y > 0 <=> p > 0 (elu is monotone through 0)
        g = jnp.where(y > 0, jnp.ones((), y.dtype), y + jnp.ones((), y.dtype))
        return dy * g.astype(dy.dtype)
    if activation == "relu":
        return jnp.where(y > 0, dy, jnp.zeros((), dy.dtype))
    if activation == "leaky":
        # leaky(0.2) is a monotone bijection: y >= 0 <=> p >= 0, and
        # leaky' = 1 if p >= 0 else 0.2 (matches jax.nn.leaky_relu's vjp,
        # which uses where(x >= 0, ...))
        return jnp.where(y >= 0, dy, jnp.asarray(0.2, dy.dtype) * dy)
    return dy


def _weight_grad(x, dpre):
    """(3, 3, 3, ci, co) weight gradient of a SAME stride-1 conv as ONE
    wide MXU contraction.

    The tap sum  dw[dz,dy,dx] = Σ_{z,h,w} x[z+dz-1, h+dy-1, w+dx-1]·dpre[z,h,w]
    factors over the kernel axes: the (dy, dx) shift touches only x (pad in
    H/W) and the dz shift can be moved onto dpre (pad in D), so stacking the
    9 (dy, dx)-shifted x views on the M axis and the 3 (−dz)-shifted dpre
    views on the N axis computes ALL 27 taps in one (9·ci, S) @ (S, 3·co)
    dot — M = 9·ci ≥ 216 rows and N = 3·co lanes instead of the 27 separate
    (ci, S) @ (S, co) dots whose 24×24 outputs left >96% of the MXU idle
    (27-dot version measured ~5–7 TFLOP/s; this form is ~5× faster at the
    128³ shapes that dominate the backward).  The giant-kernel conv
    formulation (x as batch, dy as a D·H·W kernel) was measured far slower
    still — XLA lowers it through low-utilization paths."""
    ci, d, h, w = x.shape
    co = dpre.shape[0]
    s = d * h * w
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    lhs = jnp.concatenate([
        jax.lax.slice(xp, (0, 0, dy, dx), (ci, d, dy + h, dx + w))
        for dy in range(3) for dx in range(3)], axis=0).reshape(9 * ci, s)
    dp = jnp.pad(dpre.astype(x.dtype), ((0, 0), (1, 1), (0, 0), (0, 0)))
    # tap dz pairs x plane z+dz-1 with dpre plane z == dpre shifted by 1-dz
    rhs = jnp.concatenate([
        jax.lax.slice(dp, (0, 2 - dz, 0, 0), (co, 2 - dz + d, h, w))
        for dz in range(3)], axis=0).reshape(3 * co, s)
    dw = jax.lax.dot_general(
        lhs, rhs, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (9·ci, 3·co)
    dw = dw.reshape(3, 3, ci, 3, co)                 # (dy, dx, ci, dz, co)
    return jnp.transpose(dw, (3, 0, 1, 2, 4))        # (dz, dy, dx, ci, co)


def _conv_train_bwd(activation, interpret, want_dx, res, dy):
    sources, w, y = res
    dpre = _act_grad_from_output(activation, y, dy)
    db = jnp.sum(dpre.astype(jnp.float32), axis=(1, 2, 3)).astype(w.dtype)
    if want_dx:
        # dx: SAME conv of dpre with flipped, in/out-transposed weights
        wt = jnp.transpose(jnp.flip(w, (0, 1, 2)), (0, 1, 2, 4, 3))
        dx = _apply_fused((dpre,), wt, None, None, interpret)
        dxs, off = [], 0
        for s in sources:
            dxs.append(dx[off:off + s.shape[0]].astype(s.dtype))
            off += s.shape[0]
    else:
        dxs = [jnp.zeros_like(s) for s in sources]
    # per-source weight gradients: slices along ci are independent, so the
    # concatenated input never materializes for the kgrad either.  The
    # Pallas wgrad kernel (in-VMEM patch building, zero HBM patch traffic)
    # takes every qualifying shape; _weight_grad's one-dot XLA form covers
    # the rest (mid-level volumes, CPU).
    def wgrad(s):
        args = (s.shape[0], dpre.shape[0]) + tuple(s.shape[1:])
        if _wgrad_layout(*args) is not None \
                or _wgrad_flat_layout(*args) is not None:
            return conv3d_cf_wgrad(s, dpre, interpret=interpret)
        return _weight_grad(s, dpre)

    dws = [wgrad(s) for s in sources]
    dw = jnp.concatenate(dws, axis=3) if len(dws) > 1 else dws[0]
    return tuple(dxs), dw.astype(w.dtype), db


conv3d_cf_train.defvjp(_conv_train_fwd, _conv_train_bwd)
