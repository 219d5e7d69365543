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
