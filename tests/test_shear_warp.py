"""Gather-free affine warp (ops/shear_warp.py) against the exact trilinear
oracle (ops/interp.py, reference neuron/utils.py:25-124 semantics).

The shear factorization is EXACT at the coordinate level, so identity and
pure translations must match the oracle to f32 rounding; general small
rotations differ only by the documented separable-vs-trilinear stencil
deviation — O(second differences), small on smooth (blurred) data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synthsr_tpu.ops import interp as _interp
from synthsr_tpu.ops.shear_warp import (shear_warp_affine, static_max_disp)
from synthsr_tpu.synth.augment import sample_affine_matrix

S = 32


@pytest.fixture(scope="module")
def smooth_vol():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(S + 8, S + 8, S + 8)).astype(np.float32)
    for _ in range(8):
        v = (v + sum(np.roll(v, s, a) for a in range(3)
                     for s in (-1, 1))) / 7.0
    return jnp.asarray(v[4:4 + S, 4:4 + S, 4:4 + S])[..., None]


def _oracle(vol, aff):
    shift = _interp.affine_to_shift(aff, vol.shape[:3])
    return _interp.transform(vol, shift, method="linear")


def test_static_max_disp_bound():
    r = static_max_disp((S, S, S), rotation_bounds=5, translation_bounds=5)
    assert 6 <= r <= 20  # ~5 deg over a 16-voxel half-diagonal + 5 vox + margin


def test_identity_exact(smooth_vol):
    out = shear_warp_affine(smooth_vol, jnp.eye(4), 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(smooth_vol),
                               atol=1e-6)


def test_pure_translation_matches_trilinear(smooth_vol):
    """For translations the separable stencil IS the trilinear stencil."""
    aff = jnp.eye(4).at[:3, 3].set(jnp.array([1.3, -2.7, 0.55]))
    o = _oracle(smooth_vol, aff)
    s = shear_warp_affine(smooth_vol, aff, 8)
    np.testing.assert_allclose(np.asarray(s), np.asarray(o), atol=1e-5)


def test_small_rotation_close_to_trilinear(smooth_vol):
    """Interior agreement within the documented stencil deviation."""
    r = static_max_disp((S, S, S), rotation_bounds=5, translation_bounds=5)
    scale = float(jnp.std(smooth_vol))
    for i in range(3):
        aff = sample_affine_matrix(jax.random.PRNGKey(i), rotation_bounds=5,
                                   translation_bounds=5)
        o = np.asarray(_oracle(smooth_vol, aff))
        s = np.asarray(shear_warp_affine(smooth_vol, aff, r))
        d = np.abs(o - s)[6:-6, 6:-6, 6:-6]
        assert d.max() < 0.08 * scale, (i, d.max(), scale)
        assert d.mean() < 0.01 * scale, (i, d.mean(), scale)


def test_channels_batched(smooth_vol):
    """Multi-channel volumes warp channel-wise identically."""
    aff = sample_affine_matrix(jax.random.PRNGKey(5), rotation_bounds=5,
                               translation_bounds=5)
    two = jnp.concatenate([smooth_vol, 2.0 * smooth_vol], axis=-1)
    out2 = shear_warp_affine(two, aff, 10)
    out1 = shear_warp_affine(smooth_vol, aff, 10)
    np.testing.assert_allclose(np.asarray(out2[..., :1]), np.asarray(out1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[..., 1:]),
                               2.0 * np.asarray(out1), atol=1e-5)


def test_generator_sim_err_paths_agree():
    """exact_warp=True (reference trilinear) vs the default shear path on a
    full generate(): outputs stay close — the deviation is interpolation
    stencil only, bounded on the blurred acquisition channels."""
    from synthsr_tpu.synth.labels_to_image import (GenerationConfig,
                                                   build_generator)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, (24, 24, 24)).astype(np.int32) * 2
    means = jnp.asarray(rng.uniform(30, 200, (3, 2)).astype(np.float32))
    stds = jnp.asarray(rng.uniform(3, 10, (3, 2)).astype(np.float32))
    outs = {}
    for exact in (False, True):
        cfg = GenerationConfig(
            labels_shape=[24, 24, 24], input_channels=[True, True],
            output_channel=[0], generation_labels=np.array([0, 2, 4], np.int32),
            n_neutral_labels=3, atlas_res=[1.0, 1.0, 1.0], output_shape=24,
            flipping=False, aff=np.eye(4), randomise_res=False,
            data_res=np.array([[1.0, 1.0, 2.0], [1.0, 2.0, 1.0]]),
            downsample=True, build_reliability_maps=True,
            simulate_registration_error=True, exact_warp=exact)
        gen = build_generator(cfg)
        image, target = jax.jit(gen)(jax.random.PRNGKey(3),
                                     jnp.asarray(labels), means, stds)
        outs[exact] = np.asarray(image)
    d = np.abs(outs[True] - outs[False])
    # channel 0 has no registration error -> identical
    np.testing.assert_allclose(outs[True][..., :2], outs[False][..., :2],
                               atol=1e-6)
    # channel 1 (sim_err) differs only by the stencil deviation (the max is
    # edge-voxel-driven at this toy 24-cubed size: per-pass vs joint clipping)
    assert d[..., 2:].max() < 0.35, d[..., 2:].max()
    assert d[..., 2:].mean() < 0.01, d[..., 2:].mean()
