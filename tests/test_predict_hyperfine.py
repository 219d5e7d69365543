"""Hyperfine (T1+T2 residual) predict pipeline tests."""

import numpy as np
import pytest

from synthsr_tpu.io.volume import load_volume, save_volume


@pytest.fixture(scope="module")
def hyperfine_weights(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.models.h5_import import export_keras_unet_weights
    from synthsr_tpu.models.unet import synthsr_unet

    model = synthsr_unet()
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 32, 32, 32, 2))))
    rng = np.random.default_rng(1)
    variables["params"] = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.05).astype(np.float32)),
        variables["params"])
    p = str(tmp_path_factory.mktemp("w") / "hyper.h5")
    export_keras_unet_weights(p, jax.device_get(variables))
    return p


def test_hyperfine_residual_formula(hyperfine_weights):
    """pred = minimum + spread*(residual + t1_normalized), clipped at 0 —
    verify with a zero-weight network (residual == bias == 0) the output
    reproduces the T1 input exactly (up to resampling)."""
    import jax

    from synthsr_tpu.cli.predict_hyperfine import HyperfinePredictor

    pred = HyperfinePredictor(model_path=hyperfine_weights, compute_dtype="float32")
    # zero the network => residual = 0 => pred = t1 (after norm round-trip)
    pred.variables["params"] = jax.tree.map(
        lambda p: p * 0.0, pred.variables["params"])
    rng = np.random.default_rng(0)
    t1 = rng.uniform(50, 500, (32, 32, 32)).astype(np.float32)
    t2 = rng.uniform(0, 300, (32, 32, 32)).astype(np.float32)
    out, aff = pred.predict_pair(t1, np.eye(4), t2, np.eye(4))
    # the 1mm resample blurs with sigma 0.25 even at factor 1 (reference
    # resample_volume behavior), so the oracle is the blurred T1
    from scipy.ndimage import gaussian_filter

    oracle = gaussian_filter(t1, 0.25, mode="reflect")
    np.testing.assert_allclose(out, oracle, rtol=1e-3, atol=0.05)


def test_hyperfine_t2_reslicing(hyperfine_weights):
    """T2 on a different grid must be resliced into the T1 space."""
    from synthsr_tpu.cli.predict_hyperfine import HyperfinePredictor

    pred = HyperfinePredictor(model_path=hyperfine_weights, compute_dtype="float32")
    rng = np.random.default_rng(1)
    t1 = rng.uniform(0, 500, (32, 32, 32)).astype(np.float32)
    # T2 at 1.5x1.5x5mm on its own grid
    t2 = rng.uniform(0, 300, (24, 24, 8)).astype(np.float32)
    aff2 = np.diag([1.5, 1.5, 5.0, 1.0])
    out, aff = pred.predict_pair(t1, np.eye(4), t2, aff2)
    assert out.shape == (32, 32, 32)
    assert np.all(out >= 0)
    assert np.isfinite(out).all()


def test_hyperfine_cli_end_to_end(tmp_path, hyperfine_weights):
    from synthsr_tpu.cli.predict_hyperfine import main

    rng = np.random.default_rng(2)
    t1 = rng.uniform(0, 400, (32, 32, 32)).astype(np.float32)
    t2 = rng.uniform(0, 200, (32, 32, 32)).astype(np.float32)
    p1 = str(tmp_path / "t1.nii.gz")
    p2 = str(tmp_path / "t2.nii.gz")
    po = str(tmp_path / "out.nii.gz")
    save_volume(t1, np.eye(4), None, p1)
    save_volume(t2, np.eye(4), None, p2)
    main([p1, p2, po, "--model", hyperfine_weights, "--cpu"])
    out, aff, _ = load_volume(po, im_only=False)
    assert out.shape == (32, 32, 32)
    assert out.min() >= 0
