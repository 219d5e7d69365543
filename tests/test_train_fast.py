"""The differentiable channels-first Pallas training path (ops/conv_train,
models/unet_cf_train) against the flax reference forward.

The fast train apply must be a drop-in for
``model.apply(..., train=True, mutable=["batch_stats"])``: same outputs,
same new batch_stats, same parameter gradients — here pinned in f32
interpret mode at a kernel-qualifying shape (W % 128 == 0, D % 4 == 0) that
exercises the channels-first kernels at the top level AND the layout
fallback at the pooled levels (W=64 no longer qualifies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synthsr_tpu.models.unet import UNet3D
from synthsr_tpu.models.unet_cf_train import (can_fast_train,
                                              make_fast_train_apply)

SHAPE = (2, 8, 16, 128, 1)  # batch 2: BN batch-joint stats must match too


def _model_and_vars():
    model = UNet3D(nb_features=4, nb_levels=2, nb_conv_per_level=2,
                   nb_labels=1, activation="elu",
                   final_pred_activation="linear",
                   compute_dtype=jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros(SHAPE, jnp.float32)))
    return model, variables


def _tree_allclose(a, b, atol):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-5)


def test_can_fast_train_gates_options():
    def mk(**kw):
        return UNet3D(nb_features=4, nb_levels=2, nb_conv_per_level=2,
                      nb_labels=1, activation="elu",
                      final_pred_activation="linear",
                      compute_dtype=jnp.float32, **kw)

    assert can_fast_train(mk())
    assert not can_fast_train(mk(conv_dropout=0.5))
    assert not can_fast_train(mk(use_residuals=True))
    assert not can_fast_train(mk(dilation_rate_mult=2))


def test_fast_train_apply_matches_model_apply():
    model, variables = _model_and_vars()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=SHAPE).astype(np.float32))

    fast = make_fast_train_apply(model, interpret=True)
    out_f, upd_f = fast(variables, x)
    out_r, upd_r = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)
    _tree_allclose(upd_f["batch_stats"], upd_r["batch_stats"], atol=1e-5)


def test_fast_train_grads_match_model_apply():
    # batch 1 and D=4 keep every gradient-coupling mechanism (BN reduces
    # jointly over N,D,H,W — the cross-voxel terms exercise the same path as
    # cross-example) at 1/4 the interpret-mode cost; batch-joint BN stats
    # themselves are pinned by test_fast_train_apply_matches_model_apply.
    gshape = (1, 4, SHAPE[2], SHAPE[3], SHAPE[4])
    model, variables = _model_and_vars()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=gshape).astype(np.float32))
    target = jnp.asarray(rng.normal(size=gshape).astype(np.float32))

    fast = make_fast_train_apply(model, interpret=True)

    def loss_fast(p):
        out, _ = fast({"params": p,
                       "batch_stats": variables["batch_stats"]}, x)
        return jnp.mean(jnp.abs(out - target))

    def loss_ref(p):
        out, _ = model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]}, x,
                             train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(out - target))

    lf, gf = jax.value_and_grad(loss_fast)(variables["params"])
    lr, gr = jax.value_and_grad(loss_ref)(variables["params"])
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-6)
    _tree_allclose(gf, gr, atol=1e-5)


def test_vmap_examples_matches_vmap():
    """The batch-1 vmap bypass (kept so integrate_vec's runtime-bounded
    lax.cond stays a true branch) must reproduce jax.vmap exactly at batch 1
    and fall through to vmap at batch > 1 — including the per-example key
    stream."""
    from synthsr_tpu.train.training import vmap_examples

    def fn(key, x):
        return jax.random.uniform(key, x.shape) + x, 2.0 * x

    for b in (1, 3):
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        x = jnp.arange(b * 4, dtype=jnp.float32).reshape(b, 4)
        ref = jax.vmap(fn)(keys, x)
        got = vmap_examples(fn)(keys, x)
        for r, g in zip(ref, got):
            assert r.shape == g.shape
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_make_train_step_fast_forward_wiring():
    """fast_forward='interpret' in make_train_step must reproduce the 'off'
    step bit-for-bit-ish (same loss, same params) — here at a non-qualifying
    16-cubed shape, so it also proves the all-fallback layout path."""
    from synthsr_tpu.synth.labels_to_image import (GenerationConfig,
                                                   build_generator)
    from synthsr_tpu.train.metrics import doubled_residual_indices
    from synthsr_tpu.train.training import make_optimizer, make_train_step

    # nonlin_std=0: the SVF-integration subgraph is the single biggest
    # compile cost and orthogonal to the fast-forward wiring under test
    # (the driver dryrun covers the elastic graph every round)
    cfg = GenerationConfig(
        labels_shape=[16, 16, 16], input_channels=[True], output_channel=[0],
        generation_labels=np.array([0, 2, 4], np.int32), n_neutral_labels=3,
        atlas_res=[1.0, 1.0, 1.0], output_shape=16, output_div_by_n=4,
        flipping=True, aff=np.eye(4), randomise_res=False, nonlin_std=0.0,
        data_res=np.array([[1.0, 1.0, 2.0]]), downsample=True,
        build_reliability_maps=True, simulate_registration_error=False)
    generate_fn = build_generator(cfg)
    model = UNet3D(nb_features=2, nb_levels=2, nb_conv_per_level=1,
                   nb_labels=1, compute_dtype=jnp.float32)
    variables = dict(jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 2))))
    optimizer = make_optimizer(1e-3)

    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 2, (2, 16, 16, 16, 1)).astype(np.int32) * 2,
             rng.uniform(20, 200, (2, 3, 1)).astype(np.float32),
             rng.uniform(1, 10, (2, 3, 1)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    results = {}
    for mode in ("off", "interpret"):
        step = make_train_step(model, generate_fn, optimizer, metrics="l1",
                               loss_cropping=12,
                               residual_indices=doubled_residual_indices(
                                   [0], True),
                               fast_forward=mode)
        p = jax.tree.map(jnp.copy, variables["params"])
        b = jax.tree.map(jnp.copy, variables["batch_stats"])
        opt_state = optimizer.init(p)
        p, b, opt_state, loss = step(p, b, opt_state, key, batch)
        results[mode] = (jax.device_get(p), float(loss))
    np.testing.assert_allclose(results["off"][1], results["interpret"][1],
                               rtol=1e-6)
    _tree_allclose(results["interpret"][0], results["off"][0], atol=1e-6)


def test_fast_train_apply_bn_axis_pmean():
    """bn_axis fast apply under shard_map (2 devices, local batch 1) must
    reproduce the single-device batch-2 apply exactly — outputs, new
    batch_stats, loss and parameter gradients: the pmean-ed BN stats ARE the
    global batch stats.  Shape chosen flat-kernel-qualifying (H*W = 1024) so
    the Pallas kernels run (interpret) inside the shard_map."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from synthsr_tpu.parallel.mesh import make_data_mesh

    shape = (2, 4, 32, 32, 1)  # D=4: smallest flat-eligible depth (d % 4)
    model = UNet3D(nb_features=4, nb_levels=2, nb_conv_per_level=2,
                   nb_labels=1, activation="elu",
                   final_pred_activation="linear",
                   compute_dtype=jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros(shape, jnp.float32)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    t = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    fast = make_fast_train_apply(model, interpret=True)
    fast_dp = make_fast_train_apply(model, interpret=True, bn_axis="data")

    def body(p, x, t):
        def loss_fn(p):
            out, upd = fast_dp({"params": p,
                                "batch_stats": variables["batch_stats"]}, x)
            return jnp.mean(jnp.abs(out - t)), (out, upd["batch_stats"])

        (loss, (out, stats)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        return (jax.lax.pmean(loss, "data"), jax.lax.pmean(g, "data"),
                stats, out)

    mesh = make_data_mesh(2)
    sh = jax.jit(shard_map(body, mesh=mesh,
                           in_specs=(P(), P("data"), P("data")),
                           out_specs=(P(), P(), P(), P("data")),
                           check_vma=False))
    loss_dp, g_dp, stats_dp, out_dp = sh(variables["params"], x, t)

    def loss_ref(p):
        out, upd = fast({"params": p,
                         "batch_stats": variables["batch_stats"]}, x)
        return jnp.mean(jnp.abs(out - t)), (out, upd["batch_stats"])

    (loss_r, (out_r, stats_r)), g_r = jax.value_and_grad(
        loss_ref, has_aux=True)(variables["params"])

    # per-shard mean + pmean reduces in a different f32 order than the joint
    # batch mean: agreement is ~1e-6 relative, not bit-exact
    np.testing.assert_allclose(float(loss_dp), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_r),
                               atol=1e-4, rtol=1e-5)
    _tree_allclose(g_dp, g_r, atol=1e-4)
    _tree_allclose(stats_dp, stats_r, atol=1e-5)


def test_make_train_step_dp_fast_matches_single_jit():
    """make_train_step with data_mesh over 4 devices (batch 4, fast path)
    must equal the meshless single-jit fast step: same loss, same updated
    params — the per-example key stream is preserved (keys split for the
    GLOBAL batch, sliced per device) and the BN/grad/loss pmeans reproduce
    the global-batch math."""
    from synthsr_tpu.parallel.mesh import make_data_mesh, shard_batch
    from synthsr_tpu.synth.labels_to_image import (GenerationConfig,
                                                   build_generator)
    from synthsr_tpu.train.metrics import doubled_residual_indices
    from synthsr_tpu.train.training import make_optimizer, make_train_step

    # nonlin_std=0: see test_make_train_step_fast_forward_wiring
    cfg = GenerationConfig(
        labels_shape=[16, 16, 16], input_channels=[True], output_channel=[0],
        generation_labels=np.array([0, 2, 4], np.int32), n_neutral_labels=3,
        atlas_res=[1.0, 1.0, 1.0], output_shape=16, output_div_by_n=4,
        flipping=True, aff=np.eye(4), randomise_res=False, nonlin_std=0.0,
        data_res=np.array([[1.0, 1.0, 2.0]]), downsample=True,
        build_reliability_maps=True, simulate_registration_error=False)
    generate_fn = build_generator(cfg)
    model = UNet3D(nb_features=2, nb_levels=2, nb_conv_per_level=1,
                   nb_labels=1, compute_dtype=jnp.float32)
    variables = dict(jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 2))))
    optimizer = make_optimizer(1e-3)

    rng = np.random.default_rng(5)
    batch = (rng.integers(0, 2, (4, 16, 16, 16, 1)).astype(np.int32) * 2,
             rng.uniform(20, 200, (4, 3, 1)).astype(np.float32),
             rng.uniform(1, 10, (4, 3, 1)).astype(np.float32))
    key = jax.random.PRNGKey(11)
    mesh = make_data_mesh(4)
    results = {}
    for name, data_mesh in (("single", None), ("dp", mesh)):
        step = make_train_step(model, generate_fn, optimizer, metrics="l1",
                               loss_cropping=12,
                               residual_indices=doubled_residual_indices(
                                   [0], True),
                               fast_forward="interpret", data_mesh=data_mesh)
        p = jax.tree.map(jnp.copy, variables["params"])
        b = jax.tree.map(jnp.copy, variables["batch_stats"])
        opt_state = optimizer.init(p)
        dev_batch = shard_batch(mesh, batch) if data_mesh is not None \
            else batch
        p, b, opt_state, loss = step(p, b, opt_state, key, dev_batch)
        results[name] = (jax.device_get(p), jax.device_get(b), float(loss))
    # per-shard mean + pmean reduces in a different f32 order than the joint
    # batch mean: agreement is ~2e-6 relative, not bit-exact
    np.testing.assert_allclose(results["dp"][2], results["single"][2],
                               rtol=1e-5)
    _tree_allclose(results["dp"][0], results["single"][0], atol=1e-5)
    _tree_allclose(results["dp"][1], results["single"][1], atol=1e-5)


def test_dot_conv_matches_xla_and_grads():
    """The im2col-dot conv (_conv_dot, opt-in via SYNTHSR_DOT_CONV=1; kept
    as a recorded negative result) against lax.conv, forward and both
    gradients, through the conv3d_cf_train custom_vjp at a dot-qualifying
    shape."""
    import os

    from synthsr_tpu.ops.conv_train import (_conv_dot, _dot_conv_ok,
                                            conv3d_cf_train)

    rng = np.random.default_rng(3)
    ci, co, s = 5, 7, 32
    x = jnp.asarray(rng.normal(size=(ci, s, s, s)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0] \
        + b.reshape(-1, 1, 1, 1)
    ref = jax.nn.elu(ref)
    got = _conv_dot(x, w, b, "elu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-5)

    dy = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def loss_fast(x, w, b):
        # interpret=True: the backward's wgrad kernel qualifies at this
        # shape and must run in interpret mode on the CPU test backend
        return jnp.sum(conv3d_cf_train((x,), w, b, "elu", True) * dy)

    def loss_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x[None], w, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0] \
            + b.reshape(-1, 1, 1, 1)
        return jnp.sum(jax.nn.elu(y) * dy)

    os.environ["SYNTHSR_DOT_CONV"] = "1"
    try:
        assert _dot_conv_ok(ci, co, (s, s, s))
        gf = jax.grad(loss_fast, argnums=(0, 1, 2))(x, w, b)
    finally:
        del os.environ["SYNTHSR_DOT_CONV"]
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(jax.tree.leaves(gf[0]) + [gf[1], gf[2]],
                    jax.tree.leaves(gr[0]) + [gr[1], gr[2]]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-3, rtol=1e-4)
