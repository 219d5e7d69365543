"""Spatial halo-sharding tests: the sharded forward must be EXACT vs the
unsharded model on the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthsr_tpu.models.unet import UNet3D
from synthsr_tpu.parallel.halo import make_spatial_mesh, sharded_unet_apply


def _model_and_vars(levels=3, feats=3, size=48, ch=1, rng_seed=0):
    model = UNet3D(nb_features=feats, nb_levels=levels, nb_conv_per_level=2,
                   nb_labels=1, compute_dtype=jnp.float32)
    x = jnp.zeros((1, size, size, size, ch))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), x))
    rng = np.random.default_rng(rng_seed)
    variables["params"] = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.1).astype(np.float32)),
        variables["params"])
    bs = {}
    for l, t in variables["batch_stats"].items():
        bs[l] = {"mean": jnp.asarray(rng.normal(size=t["mean"].shape, scale=0.1).astype(np.float32)),
                 "var": jnp.asarray(rng.uniform(0.5, 1.5, size=t["var"].shape).astype(np.float32))}
    variables["batch_stats"] = bs
    return model, variables


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_forward_exact(n_dev):
    model, variables = _model_and_vars(levels=3, size=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 48, 48, 1)).astype(np.float32))
    ref = np.asarray(model.apply(variables, x))
    mesh = make_spatial_mesh(n_dev)
    out = np.asarray(sharded_unet_apply(model, variables, x, mesh))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sharded_forward_flagship_arch():
    """The 24-feature 5-level flagship on 8 shards (tiny spatial size)."""
    model, variables = _model_and_vars(levels=5, feats=4, size=128)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 128, 64, 64, 1)).astype(np.float32))
    ref = np.asarray(model.apply(variables, x))
    mesh = make_spatial_mesh(8)
    out = np.asarray(sharded_unet_apply(model, variables, x, mesh))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_sharded_rejects_indivisible():
    model, variables = _model_and_vars(levels=3, size=48)
    mesh = make_spatial_mesh(8)
    x = jnp.zeros((1, 40, 48, 48, 1))
    with pytest.raises(AssertionError):
        sharded_unet_apply(model, variables, x, mesh)


def _unsharded_step(model, optimizer, metrics="l1", loss_cropping=None,
                    residual_indices=None):
    """Reference step: plain train-mode apply + same loss + same update."""
    import optax

    from synthsr_tpu.train.metrics import regression_loss

    def step(params, batch_stats, opt_state, image, target):
        def loss_fn(p):
            out, updates = model.apply({"params": p, "batch_stats": batch_stats},
                                       image, train=True,
                                       mutable=["batch_stats"])
            loss = regression_loss(out, image, target, metrics=metrics,
                                   loss_cropping=loss_cropping,
                                   work_with_residual_channel=residual_indices)
            return loss, updates
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), updates["batch_stats"], new_opt, loss
    return jax.jit(step)


@pytest.mark.parametrize("loss_cropping,n_dev", [(None, 4), (16, 8)])
def test_halo_train_step_matches_unsharded(loss_cropping, n_dev):
    """One spatially-sharded train step == one unsharded step (params, BN
    running stats, loss) to f32 tolerance on the fake CPU mesh."""
    import optax

    from synthsr_tpu.parallel.halo_train import make_halo_train_step

    model, variables = _model_and_vars(levels=3, size=32)
    # SGD: updates are linear in the gradient, so f32 summation-order noise
    # stays ~1e-6.  (Adam's bias-corrected first step is sign(g)·lr, which
    # amplifies 1e-7 gradient noise on near-zero grads to ±lr.)
    optimizer = optax.sgd(1e-2)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.normal(size=(1, 32, 24, 24, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 32, 24, 24, 1)).astype(np.float32))

    ref_step = _unsharded_step(model, optimizer, loss_cropping=loss_cropping)
    p_ref, bs_ref, _, loss_ref = ref_step(params, batch_stats, opt_state,
                                          image, target)

    mesh = make_spatial_mesh(n_dev)
    step = make_halo_train_step(model, optimizer, mesh,
                                loss_cropping=loss_cropping)
    p_sh, bs_sh, _, loss_sh = step(params, batch_stats, opt_state, image, target)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    # f32 rounding only: the X-split convs + psum-BN reduce in a different
    # order than the unsharded program (exact wiring proven at 1e-9 by
    # test_halo_train_grads_exact_f64 below).
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), p_sh, p_ref)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), bs_sh, bs_ref)


@pytest.mark.parametrize("loss_cropping,n_dev", [(None, 2), (16, 4)])
def test_halo_train_step_ssim_matches_unsharded(loss_cropping, n_dev):
    """Sharded SSIM training (5-voxel window halo + crop-as-center-masking)
    equals the unsharded crop-then-ssim step (VERDICT round-2 item #7)."""
    import optax

    from synthsr_tpu.parallel.halo_train import make_halo_train_step

    model, variables = _model_and_vars(levels=3, size=32)
    optimizer = optax.sgd(1e-2)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(5)
    image = jnp.asarray(rng.normal(size=(1, 32, 24, 24, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 32, 24, 24, 1)).astype(np.float32))

    ref_step = _unsharded_step(model, optimizer, metrics="ssim",
                               loss_cropping=loss_cropping)
    p_ref, _, _, loss_ref = ref_step(params, batch_stats, opt_state,
                                     image, target)

    mesh = make_spatial_mesh(n_dev)
    step = make_halo_train_step(model, optimizer, mesh, metrics="ssim",
                                loss_cropping=loss_cropping)
    p_sh, _, _, loss_sh = step(params, batch_stats, opt_state, image, target)
    # random images give near-zero SSIM, so the loss compare needs an atol
    # (f32 summation-order noise on a ~1e-5 value)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5,
                               atol=1e-8)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), p_sh, p_ref)


def test_halo_train_step_laplace_matches_unsharded():
    """Sharded laplace-NLL training (pointwise intensity/spread split,
    metrics_model.py:93-106) equals the unsharded step (VERDICT round-3 #6).
    Net has 2 output channels (nc=1: mean + spread); residual adds to the
    intensity half only."""
    import optax

    from synthsr_tpu.parallel.halo_train import make_halo_train_step

    model = UNet3D(nb_features=3, nb_levels=2, nb_conv_per_level=2,
                   nb_labels=2, compute_dtype=jnp.float32)
    x0 = jnp.zeros((1, 16, 16, 16, 1))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), x0))
    rng = np.random.default_rng(7)
    variables["params"] = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.1)
                              .astype(np.float32)), variables["params"])
    optimizer = optax.sgd(1e-2)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    image = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))

    ref_step = _unsharded_step(model, optimizer, metrics="laplace",
                               loss_cropping=8, residual_indices=[0])
    p_ref, _, _, loss_ref = ref_step(params, batch_stats, opt_state,
                                     image, target)
    mesh = make_spatial_mesh(4)
    step = make_halo_train_step(model, optimizer, mesh, metrics="laplace",
                                loss_cropping=8, residual_indices=[0])
    p_sh, _, _, loss_sh = step(params, batch_stats, opt_state, image, target)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), p_sh, p_ref)


def test_halo_train_step_residual_channel():
    """Residual-channel assembly works under spatial sharding."""
    import optax

    from synthsr_tpu.parallel.halo_train import make_halo_train_step

    model, variables = _model_and_vars(levels=2, size=16)
    optimizer = optax.sgd(1e-2)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)).astype(np.float32))

    ref_step = _unsharded_step(model, optimizer, residual_indices=[0])
    p_ref, _, _, loss_ref = ref_step(params, batch_stats, opt_state, image, target)
    mesh = make_spatial_mesh(4)
    step = make_halo_train_step(model, optimizer, mesh, residual_indices=[0])
    p_sh, _, _, loss_sh = step(params, batch_stats, opt_state, image, target)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), p_sh, p_ref)


def test_halo_train_grads_exact_f64():
    """In f64 the spatially-sharded gradients equal the unsharded ones to
    1e-8 — the halo/psum/BN backward wiring is exact (an n×-scaled psum bug
    would show at ~1e-3); residual 1e-9s come from the deliberately-f32
    likelihood layer. Any f32 test deltas are pure rounding."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from synthsr_tpu.parallel.halo_train import (_global_masked_loss,
                                                 local_unet_forward_train)
    from synthsr_tpu.train.metrics import regression_loss

    jax.config.update("jax_enable_x64", True)
    try:
        model, variables = _model_and_vars(levels=2, size=16)
        model = UNet3D(nb_features=3, nb_levels=2, nb_conv_per_level=2,
                       nb_labels=1, compute_dtype=jnp.float64)
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
        params = to64(variables["params"])
        batch_stats = to64(variables["batch_stats"])
        rng = np.random.default_rng(4)
        image = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)))
        target = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)))

        def ref_loss(p):
            out, _ = model.apply({"params": p, "batch_stats": batch_stats},
                                 image, train=True, mutable=["batch_stats"])
            return regression_loss(out, image, target, metrics="l1",
                                   loss_cropping=None)

        g_ref = jax.jit(jax.grad(ref_loss))(params)

        mesh = make_spatial_mesh(4)

        def local_loss(p, image, target):
            out, _ = local_unet_forward_train(p, batch_stats, image, model,
                                              "space")
            return _global_masked_loss(jnp.abs(out - target), None, "space",
                                       image.shape[1], image.shape[1] * 4)

        def local_grad(p, image, target):
            return jax.lax.psum(jax.grad(local_loss)(p, image, target), "space")

        g_sh = jax.jit(shard_map(local_grad, mesh=mesh,
                                 in_specs=(P(), P(None, "space"), P(None, "space")),
                                 out_specs=P(), check_vma=False))(
            params, image, target)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-8), g_sh, g_ref)
    finally:
        jax.config.update("jax_enable_x64", False)
