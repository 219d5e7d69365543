"""Channels-first fast forward/backward paths for the WGAN-GP critic.

The critic (models/discriminator.py, reference
``SynthSR/fine_tuning_with_adversary.py:482-508``) is the bound of the
adversarial fine-tuning cycle: its four *stride-1* 3³ convs carry ~2/3 of the
critic FLOPs and are exactly the small-channel shapes the channels-first
Pallas conv family was built for.  This module routes them there:

- ``make_fast_disc_apply``: a drop-in for ``disc_model.apply`` built on
  ``ops/conv_train.conv3d_cf_train`` (custom_vjp: Pallas forward with the
  LeakyReLU(0.2) epilogue fused, Pallas flipped-weight input-gradient conv,
  Pallas/one-dot weight gradient).  First-order differentiable — used for
  the WGAN terms (critic update d/dp, generator update's critic forward +
  input gradient), NOT for the gradient penalty.

- ``make_fast_disc_input_grad``: ``g(p, x) = d(Σ D)/dx`` written out as an
  explicit FIRST-ORDER program (forward pass saving post-activations, then
  the hand-rolled backward chain).  ``jax.grad`` of a custom_vjp is not
  twice differentiable, so the gradient penalty's parameter gradient —
  mathematically a second derivative of D — cannot reach the Pallas kernels
  through autodiff.  Unrolling the input gradient into a plain program makes
  the outer d/dp a FIRST derivative of every op in it: the 3³ convs (both
  the forward activations and the transposed backward convs) run through
  ``conv3d_cf_train``'s custom_vjp, and the stride-2 convs run in the
  space-to-depth stride-1 form (models/discriminator.py docstring: XLA's
  base-dilated lowering of strided-conv input gradients compounds under
  double differentiation), so no op in the whole GP computation is ever a
  dilated conv.  Equality vs ``jax.grad`` of ``disc_model.apply`` is tested
  in f32/interpret (values AND the GP's parameter gradients).

Both paths keep the EXACT parameter tree of ``Discriminator3D`` and its
numerical semantics (bf16 compute / f32 params, f32 conv accumulation,
final Dense in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv_train import conv3d_cf_train
from .discriminator import Discriminator3D, _s2d_kernel


def can_fast_disc(model, spatial) -> bool:
    """True when the critic + input shape qualify for the fast paths: a
    plain ``Discriminator3D`` over spatial dims that stay even through every
    stride-2 level (the power-of-two crops of adversarial training)."""
    if not isinstance(model, Discriminator3D):
        return False
    return all(s % (2 ** model.n_levels) == 0 for s in spatial)


def _s2d_cf(x):
    """(C, D, H, W) -> (8C, D/2, H/2, W/2), phase-major channel layout
    p·C + c with p = 4·p_d + 2·p_h + p_w (matches _s2d_kernel)."""
    c, d, h, w = x.shape
    return x.reshape(c, d // 2, 2, h // 2, 2, w // 2, 2) \
        .transpose(2, 4, 6, 0, 1, 3, 5).reshape(8 * c, d // 2, h // 2, w // 2)


def _d2s_cf(x):
    """Inverse of _s2d_cf."""
    c8, d, h, w = x.shape
    c = c8 // 8
    return x.reshape(2, 2, 2, c, d, h, w) \
        .transpose(3, 4, 0, 5, 1, 6, 2).reshape(c, 2 * d, 2 * h, 2 * w)


_CF_DN = ("NCDHW", "DHWIO", "NCDHW")


def _conv_s2_cf(x, kernel, bias, *, s2d):
    """SAME 3³ stride-2 conv, channels-first single example.

    ``s2d``: compute via space-to-depth + 2³ stride-1 (pad (0,1) per axis —
    exact same math on even dims; keeps the op stride-1 so every derivative
    order lowers as a stride-1 conv).  Otherwise the plain strided conv
    (fastest when only first-order derivatives are taken)."""
    dt = x.dtype
    if s2d:
        q = _s2d_cf(x)
        y = lax.conv_general_dilated(
            q[None], _s2d_kernel(kernel).astype(dt), (1, 1, 1),
            [(0, 1)] * 3, dimension_numbers=_CF_DN)[0]
    else:
        y = lax.conv_general_dilated(
            x[None], kernel.astype(dt), (2, 2, 2), "SAME",
            dimension_numbers=_CF_DN)[0]
    return y + bias.astype(dt).reshape(-1, 1, 1, 1)


def _conv_s2_cf_transpose(g, kernel):
    """Input gradient of ``_conv_s2_cf(..., s2d=True)``: transpose of the
    2³ stride-1 pad-(0,1) conv (flipped taps, in/out swapped, pad (1,0)),
    then depth-to-space."""
    k2 = _s2d_kernel(kernel)
    kt = jnp.flip(k2, (0, 1, 2)).swapaxes(3, 4)
    dq = lax.conv_general_dilated(
        g[None], kt.astype(g.dtype), (1, 1, 1), [(1, 0)] * 3,
        dimension_numbers=_CF_DN)[0]
    return _d2s_cf(dq)


def _leaky_mul(g, y):
    """g · leaky'(pre) recovered from the post-activation output: leaky(0.2)
    is a sign-preserving monotone bijection, so y >= 0 <=> pre >= 0 (matches
    jax.nn.leaky_relu's where(x >= 0, ...) vjp exactly)."""
    return g * jnp.where(y >= 0, jnp.ones((), g.dtype),
                         jnp.asarray(0.2, g.dtype))


def _flipT(w):
    """Weights of the transposed SAME stride-1 conv: spatial flip +
    in/out channel swap."""
    return jnp.transpose(jnp.flip(w, (0, 1, 2)), (0, 1, 2, 4, 3))


def _levels_forward(params, xi, n_levels, interpret, *, s2d, save=False,
                    first_dx=True):
    """The critic's conv trunk on one channels-first example: per level a
    stride-1 3³ conv + LeakyReLU (Pallas via conv3d_cf_train — the leaky
    epilogue is fused in-kernel; XLA channels-first fallback at the deep
    levels whose tiny planes don't qualify) then a stride-2 conv + LeakyReLU.

    ``first_dx=False``: the caller's loss treats ``xi`` as a constant (the
    WGAN critic update differentiates w.r.t. params only), so the level-0
    conv's input-gradient conv — a cout=1, M=3-MXU-row transposed conv at
    the full volume — is dead work the custom_vjp can skip.

    Returns the trunk output and, when ``save``, the post-activation pair
    per level (what the hand-rolled backward chain needs)."""
    saved = []
    for level in range(n_levels):
        p0 = params[f"conv_{level}_0"]
        p1 = params[f"conv_{level}_1"]
        s0 = conv3d_cf_train((xi,), p0["kernel"], p0["bias"], "leaky",
                             interpret, level > 0 or first_dx)
        s1 = jax.nn.leaky_relu(
            _conv_s2_cf(s0, p1["kernel"], p1["bias"], s2d=s2d), 0.2)
        if save:
            saved.append((s0, s1))
        xi = s1
    return xi, saved


def _head_forward(params, xi, dt):
    """Flatten (channels-LAST order — the Dense kernels are laid out for the
    reference's NDHWC flatten) + Dense/LeakyReLU + f32 Dense head, one
    example.  Returns (score, (feat, h)) for the backward chain."""
    feat = jnp.transpose(xi, (1, 2, 3, 0)).reshape(-1)
    w0, b0 = params["dense_0"]["kernel"], params["dense_0"]["bias"]
    h = jax.nn.leaky_relu(feat @ w0.astype(dt) + b0.astype(dt), 0.2)
    w1, b1 = params["dense_out"]["kernel"], params["dense_out"]["bias"]
    score = h.astype(jnp.float32) @ w1 + b1
    return score, (feat, h)


_CL_DN = ("NDHWC", "DHWIO", "NDHWC")


def make_fast_disc_apply(model: Discriminator3D, interpret: bool = False,
                         input_grad_needed: bool = True,
                         pallas_levels: int | None = None):
    """Build ``apply(params, x, mask=None) -> (B, 1)`` — a drop-in for
    ``disc_model.apply({"params": p}, x, mask)`` with the stride-1 3³ convs
    on the Pallas channels-first family (first-order differentiable via
    conv3d_cf_train's custom_vjp; do NOT use under the gradient penalty —
    see make_fast_disc_input_grad).

    ``input_grad_needed=False`` declares that no caller differentiates
    through ``x`` (the critic UPDATE — x is the generated constant), letting
    the level-0 conv skip its dead input-gradient conv in the backward.
    Keep True for the generator update, whose adversarial term needs
    d(D(fake))/d(fake).

    ``pallas_levels``: how many leading levels run the per-example
    channels-first Pallas trunk; the remaining (deeper) levels transpose
    back to channels-LAST and run batched XLA convs — the deep levels' small
    spatial dims don't qualify for the kernels' layouts (they fall back to
    channels-first XLA, a layout XLA lowers poorly), while their growing
    channel counts are exactly where XLA's native channels-last conv and
    true batching over the 2B WGAN examples do well.  A half-integral value
    (e.g. 0.5) additionally runs the NEXT level's stride-1 conv in CF Pallas
    before switching — 0.5 = only the cin=1 first conv (XLA's weakest, the
    kernel family's best shape) runs Pallas.  None = all levels (the
    original full-CF path)."""
    dt = model.compute_dtype
    nl = model.n_levels
    pl = float(nl if pallas_levels is None else
               max(0.0, min(float(pallas_levels), float(nl))))
    pl_whole = int(pl)
    half = (pl - pl_whole) > 0 and pl_whole < nl

    def apply(params, x, mask=None):
        x = x.astype(dt)
        if mask is not None:
            x = x * mask.astype(dt)
        feats = []
        for i in range(x.shape[0]):
            xi = jnp.transpose(x[i], (3, 0, 1, 2))
            xi, _ = _levels_forward(params, xi, pl_whole, interpret,
                                    s2d=False, first_dx=input_grad_needed)
            if half:
                p0 = params[f"conv_{pl_whole}_0"]
                xi = conv3d_cf_train((xi,), p0["kernel"], p0["bias"],
                                     "leaky", interpret,
                                     pl_whole > 0 or input_grad_needed)
            feats.append(xi)
        if pl_whole == nl:
            scores = [
                _head_forward(params, f, dt)[0] for f in feats]
            return jnp.stack(scores).astype(jnp.float32)
        # deep levels: batched channels-last XLA
        xb = jnp.stack([jnp.transpose(f, (1, 2, 3, 0)) for f in feats])
        start = pl_whole
        if half:
            p1 = params[f"conv_{start}_1"]
            xb = lax.conv_general_dilated(
                xb, p1["kernel"].astype(dt), (2, 2, 2), "SAME",
                dimension_numbers=_CL_DN) + p1["bias"].astype(dt)
            xb = jax.nn.leaky_relu(xb, 0.2)
            start += 1
        for level in range(start, nl):
            p0 = params[f"conv_{level}_0"]
            p1 = params[f"conv_{level}_1"]
            xb = lax.conv_general_dilated(
                xb, p0["kernel"].astype(dt), (1, 1, 1), "SAME",
                dimension_numbers=_CL_DN) + p0["bias"].astype(dt)
            xb = jax.nn.leaky_relu(xb, 0.2)
            xb = lax.conv_general_dilated(
                xb, p1["kernel"].astype(dt), (2, 2, 2), "SAME",
                dimension_numbers=_CL_DN) + p1["bias"].astype(dt)
            xb = jax.nn.leaky_relu(xb, 0.2)
        feat = xb.reshape(xb.shape[0], -1)
        w0, b0 = params["dense_0"]["kernel"], params["dense_0"]["bias"]
        h = jax.nn.leaky_relu(feat @ w0.astype(dt) + b0.astype(dt), 0.2)
        w1, b1 = params["dense_out"]["kernel"], params["dense_out"]["bias"]
        return (h.astype(jnp.float32) @ w1 + b1).astype(jnp.float32)

    return apply


def _s2d_cl(x):
    """(D, H, W, C) -> (D/2, H/2, W/2, 8C), phase-major channel layout
    p·C + c with p = 4·p_d + 2·p_h + p_w (matches _s2d_kernel)."""
    d, h, w, c = x.shape
    return x.reshape(d // 2, 2, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 2, 4, 1, 3, 5, 6).reshape(d // 2, h // 2, w // 2, 8 * c)


def _d2s_cl(x):
    """Inverse of _s2d_cl."""
    d, h, w, c8 = x.shape
    c = c8 // 8
    return x.reshape(d, h, w, 2, 2, 2, c) \
        .transpose(0, 3, 1, 4, 2, 5, 6).reshape(2 * d, 2 * h, 2 * w, c)


def _conv_s2_cl(x, kernel, bias, dt):
    """SAME 3³ stride-2 conv, channels-last single example, computed via
    space-to-depth + 2³ stride-1 (exact on even dims; keeps every derivative
    order a stride-1 conv)."""
    q = _s2d_cl(x)
    y = lax.conv_general_dilated(
        q[None], _s2d_kernel(kernel).astype(dt), (1, 1, 1),
        [(0, 1)] * 3, dimension_numbers=_CL_DN)[0]
    return y + bias.astype(dt)


def _conv_s2_cl_transpose(g, kernel):
    """Input gradient of ``_conv_s2_cl``: transpose of the 2³ stride-1
    pad-(0,1) conv (flipped taps, in/out swapped, pad (1,0)), then
    depth-to-space — all channels-last."""
    k2 = _s2d_kernel(kernel)
    kt = jnp.flip(k2, (0, 1, 2)).swapaxes(3, 4)
    dq = lax.conv_general_dilated(
        g[None], kt.astype(g.dtype), (1, 1, 1), [(1, 0)] * 3,
        dimension_numbers=_CL_DN)[0]
    return _d2s_cl(dq)


def _conv_s1_cl(x, kernel, dt, bias=None):
    """SAME 3³ stride-1 conv, channels-last single example."""
    y = lax.conv_general_dilated(
        x[None], kernel.astype(dt), (1, 1, 1), "SAME",
        dimension_numbers=_CL_DN)[0]
    return y if bias is None else y + bias.astype(dt)


def make_fast_disc_input_grad(model: Discriminator3D, interpret: bool = False,
                              pallas_levels: float | None = None):
    """Build ``input_grad(params, x, mask=None) -> d(Σ_b D(x))/dx`` as an
    explicit first-order program (module docstring): forward trunk saving
    post-activations, then the hand-rolled backward chain — LeakyReLU
    derivative masks recovered from the saved outputs, transposed stride-1
    convs, stride-2 transposes in the space-to-depth stride-1 form.
    ``jax.grad`` of any function of its output (the gradient penalty)
    differentiates every op here exactly ONCE, which the Pallas custom_vjp
    supports.

    ``pallas_levels``: None = the full channels-first trunk (Pallas
    stride-1 convs, CF-XLA s2d stride-2).  ``0.5`` = only the cin=1 first
    conv runs the Pallas CF kernel; every other op — forward AND backward
    chain — runs channels-LAST XLA with s2d stride-2 (still stride-1 at
    every derivative order), the layout XLA lowers best at the critic's
    32-256-channel interior shapes (same A/B rationale as
    make_fast_disc_apply's pallas_levels=0.5)."""
    dt = model.compute_dtype
    nl = model.n_levels
    if pallas_levels is not None and pallas_levels != 0.5:
        raise ValueError("input-grad program supports pallas_levels in "
                         "(None, 0.5)")

    def input_grad_one_cl(params, xi_cf, mask_cf=None):
        """pallas_levels=0.5 variant: xi_cf (1, D, H, W); returns CF grad."""
        if mask_cf is not None:
            xi_cf = xi_cf * mask_cf
        p00 = params["conv_0_0"]
        s0_cf = conv3d_cf_train((xi_cf,), p00["kernel"], p00["bias"],
                                "leaky", interpret, False)
        x = jnp.transpose(s0_cf, (1, 2, 3, 0))          # -> channels-last
        s0 = x
        saved = []
        for level in range(nl):
            if level > 0:
                p0 = params[f"conv_{level}_0"]
                x = jax.nn.leaky_relu(
                    _conv_s1_cl(x, p0["kernel"], dt, p0["bias"]), 0.2)
            pre = x
            p1 = params[f"conv_{level}_1"]
            x = jax.nn.leaky_relu(
                _conv_s2_cl(x, p1["kernel"], p1["bias"], dt), 0.2)
            saved.append((pre, x))
        feat = x.reshape(-1)                            # CL flatten order
        w0, b0 = params["dense_0"]["kernel"], params["dense_0"]["bias"]
        h = jax.nn.leaky_relu(feat @ w0.astype(dt) + b0.astype(dt), 0.2)

        # ----- backward chain, channels-last -----
        w1 = params["dense_out"]["kernel"][:, 0]
        dh = _leaky_mul(w1.astype(dt), h)
        g = (params["dense_0"]["kernel"].astype(dt) @ dh).reshape(x.shape)
        for level in reversed(range(nl)):
            pre, post = saved[level]
            p1 = params[f"conv_{level}_1"]
            g = _leaky_mul(g, post)
            g = _conv_s2_cl_transpose(g, p1["kernel"])
            if level > 0:
                p0 = params[f"conv_{level}_0"]
                g = _leaky_mul(g, pre)
                g = _conv_s1_cl(
                    g, jnp.transpose(jnp.flip(p0["kernel"], (0, 1, 2)),
                                     (0, 1, 2, 4, 3)), dt)
        g = _leaky_mul(g, s0)
        # final transposed first conv (32 -> 1 channel) in CL XLA
        p00k = jnp.transpose(jnp.flip(p00["kernel"], (0, 1, 2)),
                             (0, 1, 2, 4, 3))
        g = _conv_s1_cl(g, p00k, dt)
        g = jnp.transpose(g, (3, 0, 1, 2))              # back to CF
        if mask_cf is not None:
            g = g * mask_cf
        return g

    def input_grad_one(params, xi, mask_i=None):
        # ----- forward, saving per-level post-activations -----
        if mask_i is not None:
            xi = xi * mask_i
        # first_dx=False: the only caller (the gradient penalty in the
        # critic update) differentiates this program w.r.t. params, never
        # w.r.t. x_hat — the outer vjp can skip the trunk's dead level-0
        # input-gradient conv
        top, saved = _levels_forward(params, xi, nl, interpret, s2d=True,
                                     save=True, first_dx=False)
        _, (feat, h) = _head_forward(params, top, dt)

        # ----- backward chain: d(score)/d(xi) -----
        w1 = params["dense_out"]["kernel"][:, 0]
        dh = _leaky_mul(w1.astype(dt), h)
        df = params["dense_0"]["kernel"].astype(dt) @ dh
        c_top = top.shape[0]
        g = jnp.transpose(
            df.reshape(*top.shape[1:], c_top), (3, 0, 1, 2))
        for level in reversed(range(nl)):
            s0, s1 = saved[level]
            p0 = params[f"conv_{level}_0"]
            p1 = params[f"conv_{level}_1"]
            g = _leaky_mul(g, s1)
            g = _conv_s2_cf_transpose(g, p1["kernel"])
            g = _leaky_mul(g, s0)
            g = conv3d_cf_train((g,), _flipT(p0["kernel"]), None, None,
                                interpret)
        if mask_i is not None:
            g = g * mask_i
        return g

    one = input_grad_one_cl if pallas_levels == 0.5 else input_grad_one

    def input_grad(params, x, mask=None):
        x = x.astype(dt)
        mask = None if mask is None else mask.astype(dt)
        grads = []
        for i in range(x.shape[0]):
            xi = jnp.transpose(x[i], (3, 0, 1, 2))
            mi = None if mask is None else jnp.transpose(mask[i], (3, 0, 1, 2))
            g = one(params, xi, mi)
            grads.append(jnp.transpose(g, (1, 2, 3, 0)))
        return jnp.stack(grads)

    return input_grad
