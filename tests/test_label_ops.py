"""Tests for utility label/tensor ops + priors estimation."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import binary_dilation, binary_erosion, sobel

from synthsr_tpu.synth import label_ops

KEY = jax.random.PRNGKey(0)


def test_reset_values_to_zero():
    x = jnp.asarray(np.array([[1, 0, 2], [3, 3, 4]], np.int32))
    out = np.asarray(label_ops.reset_values_to_zero(x, [1, 3]))
    np.testing.assert_array_equal(out, [[0, 0, 2], [0, 0, 4]])


def test_convert_labels():
    x = jnp.asarray(np.array([0, 7, 9, 7], np.int32))
    out = np.asarray(label_ops.convert_labels(x, [0, 7, 9]))
    np.testing.assert_array_equal(out, [0, 1, 2, 1])
    out2 = np.asarray(label_ops.convert_labels(x, [0, 7, 9], [10, 20, 30]))
    np.testing.assert_array_equal(out2, [10, 20, 30, 20])


def test_mask_edges_bands():
    x = jnp.ones((20, 20, 20, 1))
    out, mask = label_ops.mask_edges(KEY, x, axes=1,
                                     boundaries=np.array([[0.2, 0.45, 0.85, 0.9]]))
    m = np.asarray(mask)[0, :, 0, 0]
    # a contiguous band of ones, zeros at both edges
    assert m[0] == 0 and m[-1] == 0 and m.sum() > 0
    ones = np.where(m == 1)[0]
    assert np.all(np.diff(ones) == 1)


def test_image_gradients_1step(rng):
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 1)).astype(np.float32))
    gx, gy, gz = label_ops.image_gradients(x, "1-step_diff")
    np.testing.assert_allclose(np.asarray(gx)[:-1, :, :, 0],
                               np.diff(np.asarray(x)[..., 0], axis=0), atol=1e-6)
    assert np.all(np.asarray(gx)[-1] == 0)


def test_image_gradients_sobel(rng):
    x = rng.normal(size=(12, 12, 12)).astype(np.float32)
    grads = label_ops.image_gradients(jnp.asarray(x)[..., None], "sobel")
    # scipy sobel = same separable [1,2,1]x[1,0,-1] stencil (sign convention:
    # scipy correlates with [-1,0,1] -> ours is the negative)
    oracle = sobel(x, axis=0, mode="constant")
    np.testing.assert_allclose(np.asarray(grads[0])[2:-2, 2:-2, 2:-2, 0],
                               -oracle[2:-2, 2:-2, 2:-2], atol=1e-4)


def test_dilation_matches_scipy(rng):
    x = (rng.uniform(size=(16, 16, 16, 1)) > 0.9).astype(np.float32)
    out = label_ops.random_dilation_erosion(KEY, jnp.asarray(x), 2, 2,
                                            operation="dilation", return_mask=True)
    ball = label_ops.unit_kernel_np(2, 3).astype(bool)
    oracle = binary_dilation(x[..., 0] > 0, structure=ball)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], oracle)


def test_erosion_matches_scipy(rng):
    x = (rng.uniform(size=(16, 16, 16, 1)) > 0.4).astype(np.float32)
    out = label_ops.random_dilation_erosion(KEY, jnp.asarray(x), 1, 1,
                                            operation="erosion", return_mask=True)
    ball = label_ops.unit_kernel_np(1, 3).astype(bool)
    # the reference's conv-based erosion zero-pads the INVERTED mask, i.e.
    # outside the volume counts as foreground -> border_value=1 in scipy terms
    oracle = binary_erosion(x[..., 0] > 0, structure=ball, border_value=1)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], oracle)


def test_estimate_priors_roundtrip(tmp_path, rng):
    """Priors estimated from synthetic data recover the generating stats."""
    from synthsr_tpu.io.volume import save_volume
    from synthsr_tpu.synth.estimate_priors import build_intensity_stats

    img_dir = tmp_path / "img"
    lab_dir = tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(3):
        lab = rng.integers(0, 2, (24, 24, 24)).astype(np.int32) * 2
        img = np.where(lab == 2, 200.0, 50.0) + rng.normal(0, 5, lab.shape)
        save_volume(lab, np.eye(4), None, str(lab_dir / f"s{i}.nii.gz"))
        save_volume(img.astype(np.float32), np.eye(4), None,
                    str(img_dir / f"s{i}.nii.gz"))
    pm, ps = build_intensity_stats([str(img_dir)], [str(lab_dir)],
                                   str(tmp_path / "out"), np.array([0, 2]),
                                   rescale=False)
    assert pm.shape == (2, 2) and ps.shape == (2, 2)
    assert abs(pm[0, 0] - 50) < 5 and abs(pm[0, 1] - 200) < 5
    assert 2 < ps[0, 0] < 10  # MAD of N(.,5) ≈ 5
    import os

    assert os.path.isfile(str(tmp_path / "out" / "prior_means.npy"))
