"""Channels-first fast TRAINING forward for the SynthSR U-Net.

The training twin of models/unet_cf.py: the same channels-on-sublanes Pallas
conv dispatch, made differentiable through ``ops/conv_train.conv3d_cf_train``
(custom_vjp: Pallas forward, Pallas input-gradient conv with flipped /
transposed weights, XLA kgrad weight-gradient), with flax-exact train-mode
BatchNorm (momentum 0.99, eps 1e-3, fast-variance f32 stats — the math of
``flax.linen.BatchNorm`` replicated so ``make_fast_train_apply`` is a
drop-in for ``model.apply(..., train=True, mutable=["batch_stats"])``).

Differences from the inference path, forced by training semantics:
- BatchNorm uses BATCH statistics jointly over all examples, so convs run
  per example (the kernels are batch-free) but levels run batch-synchronous;
- no BN folding into conv epilogues (stats depend on the live batch) and no
  likelihood-head folding (the backward needs the penultimate tensor);
- every op is differentiable; the decoder's [skip, upsampled] pair still
  skips HBM concatenation in BOTH directions (see conv_train).

Layout policy mirrors inference: channels-first through the Pallas kernels
while shapes qualify (``train_conv_ok``), channels-last XLA elsewhere (the
mid-level 64-cubed shapes of 128-cubed training, and all deep levels).

Reference: the training graph of SynthSR/training.py:324-453 (generator +
ext/neuron U-Net + regression loss); network wiring ext/neuron/models.py:
313-481 — numerically equal to models/unet.UNet3D in train mode (tested
f32-interpret against model.apply: outputs, batch_stats AND gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.conv_train import conv3d_cf_train, train_conv_ok
from .unet import UNet3D, upsample_nearest

_MOMENTUM = 0.99  # UNet3D._bn (Keras BatchNormalization defaults)
_EPS = 1e-3


def can_fast_train(model: UNet3D) -> bool:
    """True when the model's options are covered by the fast train forward
    (every shipped SynthSR config is)."""
    return (model.conv_dropout == 0.0 and not model.use_residuals
            and model.dilation_rate_mult == 1 and model.pool_size == 2
            and model.layer_nb_feats is None and model.use_batch_norm
            and model.conv_size == 3
            and model.activation in ("elu", "relu"))


def _up_cf(x):
    """Nearest x2 upsample, channels-first, one fused broadcast+reshape."""
    c, d, h, w = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :, None],
        (c, d, 2, h, 2, w, 2)).reshape(c, 2 * d, 2 * h, 2 * w)


def _pool_cf(x):
    """2x max pool, channels-first.  Reshape-max instead of reduce_window:
    the (C, D, H, W) layout leaves only ONE inactive dim, and TPU does not
    implement SelectAndScatter (reduce_window's gradient) below 2 inactive
    dims — the reshape form differentiates as plain eltwise max/select.
    Odd dims fall back (train shapes are powers of two throughout)."""
    c, d, h, w = x.shape
    if d % 2 or h % 2 or w % 2:
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 2),
                                     (1, 2, 2, 2), "SAME")
    r = x.reshape(c, d // 2, 2, h // 2, 2, w // 2, 2)
    return r.max(axis=(2, 4, 6))


def make_fast_train_apply(model: UNet3D, interpret: bool = False,
                          bn_axis: str | None = None):
    """Build ``apply(variables, x) -> (out, {"batch_stats": new_stats})`` —
    a drop-in for ``model.apply(variables, x, train=True,
    mutable=["batch_stats"])`` running the Pallas conv family forward AND
    backward wherever shapes qualify.

    ``bn_axis``: mesh axis name when running inside a ``shard_map``-ed
    data-parallel step — BatchNorm batch statistics are ``pmean``-ed over it,
    so every device normalizes with GLOBAL batch stats, exactly like the
    auto-sharded jit step (where XLA turns the batch-axis mean into the same
    cross-device reduction)."""
    assert can_fast_train(model), "model options outside the fast train path"
    nl, ncpl = model.nb_levels, model.nb_conv_per_level
    act_name = model.activation
    dt = model.compute_dtype

    def cl_conv(p, x, act=True):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        y = y + p["bias"].astype(y.dtype)
        if act:
            y = jax.nn.elu(y) if act_name == "elu" else jax.nn.relu(y)
        return y

    def to_cl(state_cf):
        # per-example channels-first tuples -> one (B, D, H, W, C) tensor
        return jnp.stack([
            jnp.transpose(srcs[0] if len(srcs) == 1
                          else jnp.concatenate(srcs, 0), (1, 2, 3, 0))
            for srcs in state_cf])

    def conv_step(name, cf, state_cf, cl):
        p = params_box[0][name]
        kern = p["kernel"]
        cin, cout = kern.shape[3], kern.shape[4]
        if cf and not train_conv_ok(cin, cout, state_cf[0][0].shape[1:]):
            cl, state_cf, cf = to_cl(state_cf), None, False
        if cf:
            state_cf = [(conv3d_cf_train(srcs, kern, p["bias"], act_name,
                                         interpret),)
                        for srcs in state_cf]
        else:
            cl = cl_conv(p, cl)
        return cf, state_cf, cl

    def bn_step(name, cf, state_cf, cl, new_stats):
        """flax BatchNorm train mode: f32 fast-variance batch stats over
        (batch, spatial), running-average update, f32 normalize -> dt."""
        p, s = params_box[0][name], stats_box[0][name]
        if cf:
            xs = [srcs[0] for srcs in state_cf]
            n = len(xs)
            mu = sum(jnp.mean(xi.astype(jnp.float32), axis=(1, 2, 3))
                     for xi in xs) / n
            mu2 = sum(jnp.mean(jnp.square(xi.astype(jnp.float32)),
                               axis=(1, 2, 3)) for xi in xs) / n
        else:
            xf = cl.astype(jnp.float32)
            mu = jnp.mean(xf, axis=(0, 1, 2, 3))
            mu2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))
        if bn_axis is not None:
            # equal per-device batch shards: pmean of per-shard means IS the
            # global batch mean
            mu = jax.lax.pmean(mu, bn_axis)
            mu2 = jax.lax.pmean(mu2, bn_axis)
        var = jnp.maximum(0.0, mu2 - jnp.square(mu))
        new_stats[name] = {
            "mean": _MOMENTUM * s["mean"] + (1.0 - _MOMENTUM) * mu,
            "var": _MOMENTUM * s["var"] + (1.0 - _MOMENTUM) * var}
        mul = jax.lax.rsqrt(var + _EPS) * p["scale"].astype(jnp.float32)
        add = p["bias"].astype(jnp.float32)
        if cf:
            m4, u4, a4 = (t.reshape(-1, 1, 1, 1) for t in (mu, mul, add))
            state_cf = [(((srcs[0].astype(jnp.float32) - m4) * u4 + a4)
                         .astype(dt),) for srcs in state_cf]
        else:
            cl = ((cl.astype(jnp.float32) - mu) * mul + add).astype(dt)
        return state_cf, cl

    params_box, stats_box = [None], [None]

    def apply(variables, x):
        params_box[0] = variables["params"]
        stats_box[0] = variables["batch_stats"]
        new_stats = {}
        b = x.shape[0]
        state_cf = [(jnp.transpose(x[i].astype(dt), (3, 0, 1, 2)),)
                    for i in range(b)]
        cl = None
        cf = True
        skips = {}

        for level in range(nl):
            for conv in range(ncpl):
                cf, state_cf, cl = conv_step(
                    f"conv_downarm_{level}_{conv}", cf, state_cf, cl)
            # skips tap the conv output (pre-BN), tagged for per-level remat
            if cf:
                state_cf = [(checkpoint_name(srcs[0], f"unet_skip_{level}"),)
                            for srcs in state_cf]
                skips[level] = ([srcs[0] for srcs in state_cf], True)
            else:
                cl = checkpoint_name(cl, f"unet_skip_{level}")
                skips[level] = (cl, False)
            state_cf, cl = bn_step(f"bn_down_{level}", cf, state_cf, cl,
                                   new_stats)
            if level < nl - 1:
                if cf:
                    state_cf = [(_pool_cf(srcs[0]),) for srcs in state_cf]
                else:
                    import flax.linen as nn

                    cl = nn.max_pool(cl, (2, 2, 2), (2, 2, 2), "SAME")

        for level in range(nl - 1):
            src = nl - 2 - level
            if cf:
                state_cf = [(_up_cf(srcs[0]),) for srcs in state_cf]
            else:
                cl = upsample_nearest(cl, 2)
            skip_val, skip_cf = skips[src]
            # unify to the skip's layout (the bigger tensor stays put)
            if skip_cf and not cf:
                state_cf = [(jnp.transpose(cl[i], (3, 0, 1, 2)),)
                            for i in range(b)]
                cl, cf = None, True
            elif not skip_cf and cf:
                cl, state_cf, cf = to_cl(state_cf), None, False
            if level < nl - model.skip_n_concatenations - 1:
                if cf:
                    # 2-source tuples: the conv DMAs both at channel offsets,
                    # the concat never reaches HBM (fwd AND bwd)
                    state_cf = [(skip_val[i].astype(dt), state_cf[i][0])
                                for i in range(b)]
                else:
                    cl = jnp.concatenate([skip_val.astype(cl.dtype), cl], -1)
            for conv in range(ncpl):
                cf, state_cf, cl = conv_step(
                    f"conv_uparm_{nl + level}_{conv}", cf, state_cf, cl)
            state_cf, cl = bn_step(f"bn_up_{level}", cf, state_cf, cl,
                                   new_stats)
            if cf:
                state_cf = [(checkpoint_name(srcs[0], f"unet_dec_{level}"),)
                            for srcs in state_cf]
            else:
                cl = checkpoint_name(cl, f"unet_dec_{level}")

        p = params_box[0]["likelihood"]
        if cf:
            outs = []
            for srcs in state_cf:
                xx = srcs[0].astype(jnp.float32)  # flax likelihood is f32
                c = xx.shape[0]
                k = p["kernel"].reshape(c, -1)
                o = jax.lax.dot_general(
                    k, xx.reshape(c, -1),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = o.reshape(-1, *xx.shape[1:]) \
                    + p["bias"].reshape(-1, 1, 1, 1)
                outs.append(jnp.transpose(o, (1, 2, 3, 0)))
            out = jnp.stack(outs)
        else:
            out = jax.lax.conv_general_dilated(
                cl.astype(jnp.float32), p["kernel"], (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + p["bias"]
        if model.final_pred_activation == "softmax":
            out = jax.nn.softmax(out, axis=-1)
        return out.astype(jnp.float32), {"batch_stats": new_stats}

    return apply
