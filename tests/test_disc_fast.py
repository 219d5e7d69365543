"""Fast channels-first critic paths vs the flax Discriminator3D oracle.

The adversarial loop routes the critic's stride-1 3³ convs through the
Pallas family (models/discriminator_cf.py): a first-order fast apply for the
WGAN terms and a hand-unrolled input-gradient program for the gradient
penalty (whose parameter gradient is a second derivative of D — unreachable
through the custom_vjp by autodiff).  These tests pin both against autodiff
of the flax critic in f32/interpret mode: values, first-order parameter
gradients, input gradients, and the GP's (second-order) parameter gradients.

Shapes: 32³ so the first level's stride-1 conv actually qualifies for the
folded-plane Pallas kernel in interpret mode (H·W = 1024) while the deeper
16³ level exercises the channels-first XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthsr_tpu.models.discriminator import Discriminator3D
from synthsr_tpu.models.discriminator_cf import (can_fast_disc,
                                                 make_fast_disc_apply,
                                                 make_fast_disc_input_grad)


@pytest.fixture(scope="module")
def disc_setup():
    model = Discriminator3D(n_filters=4, n_levels=2,
                            compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)), jnp.float32)
    params = dict(model.init(jax.random.PRNGKey(0), x))["params"]
    return model, params, x


def test_can_fast_disc(disc_setup):
    model, _, _ = disc_setup
    assert can_fast_disc(model, (32, 32, 32))
    assert not can_fast_disc(model, (30, 32, 32))  # 30/2 = 15 odd at level 2
    assert not can_fast_disc(object(), (32, 32, 32))


def test_fast_disc_apply_matches_flax(disc_setup):
    model, params, x = disc_setup
    fast = make_fast_disc_apply(model, interpret=True)
    ref = model.apply({"params": params}, x)
    out = fast(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # hybrid trunk splits (Pallas leading levels + batched CL XLA deep
    # levels) must produce the same scores at every split point
    for pl in (0, 0.5, 1, 1.5):
        hyb = make_fast_disc_apply(model, interpret=True, pallas_levels=pl)
        np.testing.assert_allclose(np.asarray(hyb(params, x)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)
    # masked input parity
    mask = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, x.shape), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast(params, x, mask)),
        np.asarray(model.apply({"params": params}, x, mask)),
        rtol=1e-5, atol=1e-5)


def test_fast_disc_first_order_grads_match(disc_setup):
    """Parameter AND input gradients of the WGAN term through the fast
    apply == autodiff of the flax critic (the disc_step/gen_step uses)."""
    model, params, x = disc_setup
    fast = make_fast_disc_apply(model, interpret=True)

    def wgan(apply_fn):
        def loss(p, xx):
            d = apply_fn(p, xx)
            return jnp.mean(-d[:1]) + jnp.mean(d[1:])
        return loss

    ref_loss = wgan(lambda p, xx: model.apply({"params": p}, xx))
    fast_loss = wgan(fast)
    gp_ref, gx_ref = jax.grad(ref_loss, argnums=(0, 1))(params, x)
    gp_fast, gx_fast = jax.grad(fast_loss, argnums=(0, 1))(params, x)
    flat_ref, _ = jax.tree_util.tree_flatten(gp_ref)
    flat_fast, _ = jax.tree_util.tree_flatten(gp_fast)
    for a, b in zip(flat_fast, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx_fast), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-5)

    # the critic-update build (input_grad_needed=False, skips the dead
    # level-0 input-gradient conv): IDENTICAL parameter gradients
    fast_d = make_fast_disc_apply(model, interpret=True,
                                  input_grad_needed=False)
    gp_d = jax.grad(wgan(fast_d))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp_d),
                    jax.tree_util.tree_leaves(gp_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_disc_input_grad_matches_autodiff(disc_setup):
    model, params, x = disc_setup

    g_ref = jax.grad(
        lambda xx: jnp.sum(model.apply({"params": params}, xx)))(x)
    mask = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, x.shape), jnp.float32)
    g_ref_m = jax.grad(
        lambda xx: jnp.sum(model.apply({"params": params}, xx, mask)))(x)
    for pl in (None, 0.5):  # full-CF program and the CL-interior variant
        ig = make_fast_disc_input_grad(model, interpret=True,
                                       pallas_levels=pl)
        g_fast = ig(params, x)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ig(params, x, mask)),
                                   np.asarray(g_ref_m), rtol=2e-4, atol=2e-5)


def test_fast_gp_param_grads_match_double_autodiff(disc_setup):
    """The gradient penalty's PARAMETER gradient — a second derivative of D —
    through the unrolled first-order program == true double autodiff of the
    flax critic."""
    model, params, x = disc_setup
    x_hat = x[:1]

    def gp_ref(p):
        def d_sum(xx):
            return jnp.sum(model.apply({"params": p}, xx))
        g = jax.grad(d_sum)(x_hat)
        sq = jnp.sum(jnp.square(g), axis=(1, 2, 3))
        norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
        return 10.0 * jnp.mean(jnp.square(1.0 - norm))

    v_ref, g_ref = jax.value_and_grad(gp_ref)(params)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    for pl in (None, 0.5):  # full-CF program and the CL-interior variant
        ig = make_fast_disc_input_grad(model, interpret=True,
                                       pallas_levels=pl)

        def gp_fast(p):
            g = ig(p, x_hat)
            sq = jnp.sum(jnp.square(g), axis=(1, 2, 3))
            norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
            return 10.0 * jnp.mean(jnp.square(1.0 - norm))

        v_fast, g_fast = jax.value_and_grad(gp_fast)(params)
        np.testing.assert_allclose(float(v_fast), float(v_ref),
                                   rtol=1e-5, atol=1e-7)
        flat_fast, _ = jax.tree_util.tree_flatten(g_fast)
        for a, b in zip(flat_fast, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)
