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

from ..ops.conv_pallas import conv3d_cf
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


def _conv_cf(p, x, interpret=False, activation=None):
    # optimization barriers keep XLA from folding the pallas output into
    # VMEM-resident fusions (full-graph scheduling OOMs otherwise); bias and
    # activation run fused inside the kernel epilogue (saves one full HBM
    # round trip per conv)
    x = jax.lax.optimization_barrier(x)
    y = conv3d_cf(x, p["kernel"].astype(x.dtype), bias=p["bias"],
                  activation=activation, interpret=interpret)
    return jax.lax.optimization_barrier(y)


def _conv_cl(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"].astype(y.dtype)


def _pallas_ok(cin, spatial):
    # W >= 128 for lane efficiency, H divisible by the block, VMEM-bounded
    # patch matrix (9*cin x block_h x W in bf16 must stay well under VMEM)
    return (cin <= 96 and spatial[2] >= 128 and spatial[1] % 16 == 0
            and cin * spatial[2] <= 96 * 256)


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
            if cf and not _pallas_ok(cin, xx.shape[1:]):
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
            for ax in (1, 2, 3):
                xx = jnp.repeat(xx, 2, axis=ax)
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
        xx = jnp.concatenate([skip.astype(xx.dtype), xx], axis=0 if cf else -1)
        for conv in range(model.nb_conv_per_level):
            p = params[f"conv_uparm_{nl + level}_{conv}"]
            cin = p["kernel"].shape[3]
            if cf and not _pallas_ok(cin, xx.shape[1:]):
                xx = jnp.transpose(xx, (1, 2, 3, 0))[None]
                cf = False
            if cf:
                y = _conv_cf(p, xx, interpret=interpret, activation=fused_act)
                xx = y if fused_act else act(y)
            else:
                xx = act(_conv_cl(p, xx))
        bnp, bns = params[f"bn_up_{level}"], stats[f"bn_up_{level}"]
        xx = _bn_cf(bnp, bns, xx) if cf else _bn_cl(bnp, bns, xx)

    p = params["likelihood"]
    if cf:
        c = xx.shape[0]
        k = p["kernel"].reshape(c, -1).astype(jnp.float32)  # (cin, cout)
        flat = xx.reshape(c, -1).astype(jnp.float32)
        out = (k.T @ flat).reshape(-1, *xx.shape[1:]) \
            + p["bias"].astype(jnp.float32).reshape(-1, 1, 1, 1)
        out = jnp.transpose(out, (1, 2, 3, 0))[None]
    else:
        out = jax.lax.conv_general_dilated(
            xx.astype(jnp.float32), p["kernel"].astype(jnp.float32), (1, 1, 1),
            "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
    if model.final_pred_activation == "softmax":
        out = jax.nn.softmax(out, axis=-1)
    return out.astype(jnp.float32)


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

    def run(x):
        out = s1_jit(variables, x)
        return s2_jit(variables, out[0], *out[1:])

    return run
