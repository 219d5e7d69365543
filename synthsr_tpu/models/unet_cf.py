"""Channels-first fast inference forward for the SynthSR U-Net.

Integrates the Pallas channels-on-sublanes conv kernel (ops/conv_pallas.py)
into a full forward pass: shallow levels (small channel counts, large
spatial dims — where XLA convs run at ≤19% MXU utilization AND channels-last
activations pad 24→128 lanes, wasting 5.3× HBM) run channels-first through
the Pallas kernel; deep levels (≥64 channels, small spatial dims — where XLA
is efficient) transpose once to NDHWC and use regular convs.

Numerically equivalent to ``UNet3D.apply`` in inference mode (bf16 tolerance;
tested).  Used by the predict bench/CLI via ``use_fast_inference``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv_pallas import (PREFER_FLAT, _flat_layout, _plane_layout,
                               conv3d_cf, conv3d_cf_flat,
                               conv3d_cf_flat_grouped, conv3d_cf_grouped,
                               conv3d_cf_planes, split_flat_group_for,
                               split_group_for)
from .unet import UNet3D, _activation, upsample_nearest


def _bn_cf(p, s, x, eps=1e-3):
    shape = (-1, 1, 1, 1)
    inv = jax.lax.rsqrt(s["var"].astype(x.dtype).reshape(shape) + eps)
    return ((x - s["mean"].astype(x.dtype).reshape(shape)) * inv
            * p["scale"].astype(x.dtype).reshape(shape)
            + p["bias"].astype(x.dtype).reshape(shape))


def _bn_cl(p, s, x, eps=1e-3):
    inv = jax.lax.rsqrt(s["var"].astype(x.dtype) + eps)
    return (x - s["mean"].astype(x.dtype)) * inv * p["scale"].astype(x.dtype) \
        + p["bias"].astype(x.dtype)


def _maxpool_cf(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 2),
                                 (1, 2, 2, 2), "SAME")


def _bn_affine(p, s, eps=1e-3):
    """Inference BatchNorm as a per-channel (scale, bias) affine, (2, C) f32."""
    import numpy as np  # noqa: F401  (shapes only)
    inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + eps)
    a = p["scale"].astype(jnp.float32) * inv
    b = p["bias"].astype(jnp.float32) - s["mean"].astype(jnp.float32) * a
    return jnp.stack([a, b])


def _conv_cf(p, x, interpret=False, activation=None, post=None, head=None):
    # optimization barriers keep XLA from folding the pallas output into
    # VMEM-resident fusions (full-graph scheduling OOMs otherwise); bias and
    # activation run fused inside the kernel epilogue (saves one full HBM
    # round trip per conv).  Prefer the plane-streaming kernel (one DMA per
    # input plane, no halo re-reads, no host pad pass) wherever its layout
    # fits; for big-cin convs past its compile-cost cap (the 72ch decoder
    # concat), split the input channels into equal groups by conv LINEARITY
    # — every group reuses ONE compiled executable — and let XLA fuse the
    # partial sums + bias + activation into a single pass.  Fall back to the
    # blocked kernel otherwise.
    x = jax.lax.optimization_barrier(x)
    cin, d, h, wdim = x.shape
    kern = p["kernel"]
    cout = kern.shape[-1]
    act = _activation_fn(activation)
    # SYNTHSR_PREFER_FLAT A/B: try the folded-plane kernel ahead of the
    # plane-streaming one wherever both qualify (head folding exists only on
    # the plane path, so head convs always keep their order)
    flat_first = PREFER_FLAT and head is None
    if flat_first and _flat_layout(cin, cout, d, h, wdim) is not None:
        y = conv3d_cf_flat(x, kern.astype(x.dtype), bias=p["bias"],
                           activation=activation, post=post,
                           interpret=interpret)
    elif flat_first and split_flat_group_for(cin, cout, d, h, wdim) is not None:
        y = conv3d_cf_flat_grouped(x, kern, bias=p["bias"],
                                   activation=activation, post=post,
                                   interpret=interpret)
    elif _plane_layout(cin, cout, d, h, wdim) is not None:
        y = conv3d_cf_planes(x, kern.astype(x.dtype), bias=p["bias"],
                             activation=activation, post=post, head=head,
                             interpret=interpret)
    elif wdim % 128 == 0 and d % 4 == 0 and \
            split_group_for(cin, cout, d, h, wdim) is not None:
        y = conv3d_cf_grouped(x, kern, bias=p["bias"], activation=activation,
                              post=post, head=head, interpret=interpret)
    elif _flat_layout(cin, cout, d, h, wdim) is not None:
        # folded-plane kernel (the 64/32-cubed levels of a 256-cubed
        # predict, and any pad-to-32 width); BN affine fused in the epilogue
        assert head is None, "head folding requires a plane-kernel path"
        y = conv3d_cf_flat(x, kern.astype(x.dtype), bias=p["bias"],
                           activation=activation, post=post,
                           interpret=interpret)
    elif split_flat_group_for(cin, cout, d, h, wdim) is not None:
        # channel-grouped folded-plane chaining: big-cin decoder convs at
        # non-128-multiple widths (the blocked kernel measured 62 vs XLA's
        # 35 ms on the 72ch conv at 160-cubed; flat groups beat both)
        assert head is None, "head folding requires a plane-kernel path"
        y = conv3d_cf_flat_grouped(x, kern, bias=p["bias"],
                                   activation=activation, post=post,
                                   interpret=interpret)
    elif cin <= 48:
        assert head is None, "head folding requires a plane-kernel path"
        y = conv3d_cf(x, kern.astype(x.dtype), bias=p["bias"],
                      activation=activation, interpret=interpret)
        if post is not None:
            y = y * post[0].astype(y.dtype).reshape(-1, 1, 1, 1) \
                + post[1].astype(y.dtype).reshape(-1, 1, 1, 1)
    else:
        # big-cin blocked kernel: run UNFUSED (the fused 72ch variant never
        # finished Mosaic compile); bias + activation as one XLA pass
        assert head is None, "head folding requires a plane-kernel path"
        y = conv3d_cf(x, kern.astype(x.dtype), interpret=interpret)
        y = act(y + p["bias"].astype(y.dtype).reshape(-1, 1, 1, 1))
        if post is not None:
            y = y * post[0].astype(y.dtype).reshape(-1, 1, 1, 1) \
                + post[1].astype(y.dtype).reshape(-1, 1, 1, 1)
    return jax.lax.optimization_barrier(y)


def _activation_fn(activation):
    if activation == "elu":
        return jax.nn.elu
    if activation == "relu":
        return jax.nn.relu
    return lambda v: v


def _conv_cl(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"].astype(y.dtype)


def _pallas_ok(cin, cout, spatial):
    # direct plane-streaming layout, or a channel-group split onto one
    # (covers the 72ch/144ch decoder concats), or the folded-plane kernel /
    # its channel-group split (arbitrary pad-to-32 widths); else the blocked
    # kernel — 128-MULTIPLE widths only (at w=160 its strided halo re-reads
    # measured 62 ms vs XLA's 35 on the 72ch decoder conv; at w%128==0 it
    # remains the only kernel for shapes past the other layouts' caps):
    # H divisible by the block, VMEM-bounded patch matrix
    d, h, w = spatial
    if _plane_layout(cin, cout, d, h, w) is not None:
        return True
    if w % 128 == 0 and d % 4 == 0 and \
            split_group_for(cin, cout, d, h, w) is not None:
        return True
    if _flat_layout(cin, cout, d, h, w) is not None:
        return True
    if split_flat_group_for(cin, cout, d, h, w) is not None:
        return True
    return (cin <= 96 and w % 128 == 0 and h % 16 == 0
            and cin * w <= 96 * 256)


def fast_unet_forward(model: UNet3D, variables, x, interpret=False,
                      dtype=jnp.bfloat16, stop_before_level=None,
                      resume_state=None):
    """Inference forward of (1, X, Y, Z, C) -> (1, X, Y, Z, nb_labels).

    Requires model.nb_conv_per_level levels etc. as in UNet3D; batch size 1.
    Falls back to channels-last XLA convs wherever the Pallas kernel's
    constraints don't hold, so any shape works.

    ``stop_before_level``/``resume_state`` split the DECODER across two
    executables (XLA's VMEM prefetch pass mis-sizes pallas outputs when the
    whole 256³ graph compiles as one program): stage 1 runs with
    stop_before_level=k and returns (xx, cf, skips-needed); stage 2 resumes
    with resume_state=that tuple.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    act = _activation(model.activation)
    fused_act = model.activation if model.activation in ("elu", "relu") else None
    nl = model.nb_levels
    dt = dtype

    if resume_state is None:
        xx = jnp.transpose(x[0].astype(dt), (3, 0, 1, 2))  # (C, X, Y, Z)
        skips = {}
        cf = True  # currently channels-first
    else:
        xx, cf, skips, _ = resume_state
    enc_levels = range(nl) if resume_state is None else range(0)
    for level in enc_levels:
        for conv in range(model.nb_conv_per_level):
            p = params[f"conv_downarm_{level}_{conv}"]
            cin = p["kernel"].shape[3]
            if cf and not _pallas_ok(cin, p["kernel"].shape[-1], xx.shape[1:]):
                xx = jnp.transpose(xx, (1, 2, 3, 0))[None]
                cf = False
            if cf:
                y = _conv_cf(p, xx, interpret=interpret, activation=fused_act)
                xx = y if fused_act else act(y)
            else:
                xx = act(_conv_cl(p, xx))
        skips[level] = (xx, cf)
        bnp, bns = params[f"bn_down_{level}"], stats[f"bn_down_{level}"]
        xx = _bn_cf(bnp, bns, xx) if cf else _bn_cl(bnp, bns, xx)
        if level < nl - 1:
            if cf:
                xx = _maxpool_cf(xx)
            else:
                import flax.linen as nn

                xx = nn.max_pool(xx, (2, 2, 2), (2, 2, 2), "SAME")

    dec_start = 0 if resume_state is None else resume_state[3]
    for level in range(dec_start, nl - 1):
        if stop_before_level is not None and level == stop_before_level:
            needed = {nl - 2 - k: skips[nl - 2 - k] for k in range(level, nl - 1)}
            return xx, cf, needed, level
        src = nl - 2 - level
        if cf:
            # single-pass nearest upsample (broadcast + reshape fuse into ONE
            # XLA kernel; three jnp.repeat passes materialized 2.8 GB of
            # intermediates at 256^3)
            c0, dd, hh, ww = xx.shape
            xx = jnp.broadcast_to(
                xx[:, :, None, :, None, :, None],
                (c0, dd, 2, hh, 2, ww, 2)).reshape(c0, 2 * dd, 2 * hh, 2 * ww)
        else:
            xx = upsample_nearest(xx, 2)
        skip, skip_cf = skips[src]
        # unify layouts: prefer the skip's layout (it is the bigger tensor)
        if skip_cf and not cf:
            xx = jnp.transpose(xx[0], (3, 0, 1, 2))
            cf = True
        elif not skip_cf and cf:
            xx = jnp.transpose(xx, (1, 2, 3, 0))[None]
            cf = False
        conv_start = 0
        if cf:
            # concat-FREE path for big decoder concats: when the combined
            # conv must be channel-grouped anyway, feed the grouped conv its
            # sources directly and never materialize the (C_skip+C_up)
            # concatenated tensor in HBM (saves ~2.4 GB w + r at 256^3)
            p0 = params[f"conv_uparm_{nl + level}_0"]
            d0, h0_, w0 = xx.shape[1:]
            cin_tot = p0["kernel"].shape[3]
            cout0 = p0["kernel"].shape[-1]
            srcs = [skip.astype(xx.dtype), xx]
            planes_ok = (
                w0 % 128 == 0 and d0 % 4 == 0
                and (_plane_layout(cin_tot, cout0, d0, h0_, w0)
                     is not None  # monolith (possibly rolled chunks)
                     or all(_plane_layout(s.shape[0], cout0,
                                          d0, h0_, w0) is not None
                            or split_group_for(s.shape[0], cout0,
                                               d0, h0_, w0) is not None
                            for s in srcs)))
            flat_ok = (
                _flat_layout(cin_tot, cout0, d0, h0_, w0) is not None
                or all(_flat_layout(s.shape[0], cout0, d0, h0_, w0,
                                    with_accum=True) is not None
                       or split_flat_group_for(s.shape[0], cout0,
                                               d0, h0_, w0) is not None
                       for s in srcs))
            if planes_ok and not (PREFER_FLAT and flat_ok):
                srcs = [jax.lax.optimization_barrier(s) for s in srcs]
                y = conv3d_cf_grouped(srcs, p0["kernel"], bias=p0["bias"],
                                      activation=fused_act,
                                      interpret=interpret)
                y = jax.lax.optimization_barrier(y)
                xx = y if fused_act else act(y)
                conv_start = 1
            elif flat_ok:
                # folded-plane multi-source: the 64/32-cubed decoder concats
                # and, channel-grouped, the big-cin decoder convs of the
                # non-128-multiple clinical sizes (160/192/224-cubed)
                srcs = [jax.lax.optimization_barrier(s) for s in srcs]
                y = conv3d_cf_flat_grouped(srcs, p0["kernel"],
                                           bias=p0["bias"],
                                           activation=fused_act,
                                           interpret=interpret)
                y = jax.lax.optimization_barrier(y)
                xx = y if fused_act else act(y)
                conv_start = 1
        if conv_start == 0:
            xx = jnp.concatenate([skip.astype(xx.dtype), xx],
                                 axis=0 if cf else -1)
        bnp, bns = params[f"bn_up_{level}"], stats[f"bn_up_{level}"]
        bn_folded = False
        for conv in range(conv_start, model.nb_conv_per_level):
            p = params[f"conv_uparm_{nl + level}_{conv}"]
            cin = p["kernel"].shape[3]
            if cf and not _pallas_ok(cin, p["kernel"].shape[-1], xx.shape[1:]):
                xx = jnp.transpose(xx, (1, 2, 3, 0))[None]
                cf = False
            if cf:
                # fold this level's BatchNorm into the LAST conv's epilogue:
                # decoder BNs have no skip consumers (the encoder's do), so
                # the post-activation affine replaces a whole-volume XLA
                # pass.  Only valid when the activation is fused in-kernel
                # (the affine must come after it).  On the FINAL level the
                # 1x1x1 likelihood conv folds in too (single regression
                # output, linear final activation): the 24-channel
                # penultimate tensor never reaches HBM.
                last = conv == model.nb_conv_per_level - 1
                post = _bn_affine(bnp, bns) if (last and fused_act) else None
                lik = params["likelihood"]
                d_, h_, w_ = xx.shape[1:]
                cout_ = p["kernel"].shape[-1]
                can_head = (
                    last and fused_act and level == nl - 2
                    and model.final_pred_activation != "softmax"
                    and lik["kernel"].shape[-1] == 1
                    and (_plane_layout(cin, cout_, d_, h_, w_) is not None
                         or (w_ % 128 == 0 and d_ % 4 == 0
                             and split_group_for(cin, cout_, d_, h_, w_)
                             is not None)))
                head = None
                if can_head:
                    head = (lik["kernel"].reshape(-1),
                            lik["bias"].reshape(()))
                y = _conv_cf(p, xx, interpret=interpret, activation=fused_act,
                             post=post, head=head)
                if head is not None:
                    # y is the final (1, X, Y, Z) f32 prediction
                    return jnp.transpose(y, (1, 2, 3, 0))[None]
                xx = y if fused_act else act(y)
                bn_folded = post is not None
            else:
                xx = act(_conv_cl(p, xx))
        if not bn_folded:
            xx = _bn_cf(bnp, bns, xx) if cf else _bn_cl(bnp, bns, xx)

    p = params["likelihood"]
    if cf:
        # 1x1x1 conv as a dot in the network compute dtype with f32
        # accumulation — casting the whole volume to f32 first cost an extra
        # 2.4 GB HBM pass at 256^3 for sub-bf16-noise precision
        c = xx.shape[0]
        k = p["kernel"].reshape(c, -1).astype(xx.dtype)  # (cin, cout)
        flat = xx.reshape(c, -1)
        out = jax.lax.dot_general(
            k, flat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out.reshape(-1, *xx.shape[1:]) \
            + p["bias"].astype(jnp.float32).reshape(-1, 1, 1, 1)
        out = jnp.transpose(out, (1, 2, 3, 0))[None]
    else:
        out = jax.lax.conv_general_dilated(
            xx.astype(jnp.float32), p["kernel"].astype(jnp.float32), (1, 1, 1),
            "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    if model.final_pred_activation == "softmax":
        out = jax.nn.softmax(out, axis=-1)
    return out.astype(jnp.float32)


def flip_d_variables(variables):
    """Weights for the flip-TTA pass: net(flip_D(x)) == flip_D(net_fd(x))
    where net_fd uses every conv kernel flipped along its D axis (axis 0 of
    DHWIO; 1x1x1 kernels are unchanged).  The U-Net is exactly equivariant
    to the flip (SAME convs, 2x pools/upsamples on even dims, per-channel
    BN/activations).  Equivalently net_fd(x) == flip_D(net(flip_D(x))): the
    forward with these variables IS the aligned flipped-back TTA prediction —
    the TTA pass reuses the SAME compiled executables with NO input flip and
    NO output flip."""
    def f(p):
        if hasattr(p, "ndim") and p.ndim == 5 and p.shape[0] > 1:
            return jnp.flip(p, axis=0)
        return p

    return jax.tree.map(f, variables)


def make_fast_predictor(model: UNet3D, variables, example_shape,
                        split_level: int = 3, interpret: bool = False):
    """Two-executable fast inference pipeline: run(x) -> (1, X, Y, Z, labels).

    Splits the decoder before ``split_level`` so XLA's VMEM prefetch pass
    never sees the whole 256³ graph at once (it mis-places pallas outputs).
    Layout flags (channels-first or not) are static per shape, recorded by an
    abstract trace of stage 1.
    """
    meta = {}

    def s1(v, x):
        xx, cf, skips, level = fast_unet_forward(
            model, v, x, interpret=interpret, stop_before_level=split_level)
        meta["cf"] = cf
        meta["skip_cf"] = {k: skips[k][1] for k in skips}
        meta["keys"] = sorted(skips.keys())
        return (xx,) + tuple(skips[k][0] for k in sorted(skips.keys()))

    s1_jit = jax.jit(s1)
    jax.eval_shape(s1, jax.eval_shape(lambda t: t, variables),
                   jax.ShapeDtypeStruct(example_shape, jnp.float32))

    cf_flag = meta["cf"]
    skip_cf = meta["skip_cf"]
    keys = meta["keys"]

    def s2(v, xx, *skip_tensors):
        skips = {k: (t, skip_cf[k]) for k, t in zip(keys, skip_tensors)}
        return fast_unet_forward(model, v, None, interpret=interpret,
                                 resume_state=(xx, cf_flag, skips, split_level))

    s2_jit = jax.jit(s2)

    def run(x, v=None):
        v = variables if v is None else v
        out = s1_jit(v, x)
        return s2_jit(v, out[0], *out[1:])

    return run
