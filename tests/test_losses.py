"""Loss-function tests (formulas + invariants)."""

import jax.numpy as jnp
import numpy as np

from synthsr_tpu.ops import losses


def test_dice_perfect_and_disjoint():
    gt = np.zeros((1, 8, 8, 8, 2), np.float32)
    gt[..., 0] = 1
    same = float(losses.dice_loss(jnp.asarray(gt), jnp.asarray(gt)))
    assert same < 1e-5
    pred = np.zeros_like(gt)
    pred[..., 1] = 1
    disj = float(losses.dice_loss(jnp.asarray(gt), jnp.asarray(pred)))
    assert disj > 0.99


def test_dice_class_weights():
    gt = np.zeros((1, 4, 4, 4, 2), np.float32)
    gt[..., 0] = 1
    pred = gt.copy()
    pred[0, 0, 0, 0, 0] = 0.5
    pred[0, 0, 0, 0, 1] = 0.5
    w = float(losses.dice_loss(jnp.asarray(gt), jnp.asarray(pred),
                               class_weights=[1.0, 0.0]))
    uw = float(losses.dice_loss(jnp.asarray(gt), jnp.asarray(pred)))
    assert w < uw  # ignoring the (empty, mismatched) class lowers the loss


def test_laplace_formula():
    p = jnp.ones((1, 4, 4, 4, 1)) * 2.0
    s = jnp.zeros((1, 4, 4, 4, 1))
    t = jnp.ones((1, 4, 4, 4, 1))
    b = 1e-5 + 0.02 * np.exp(0.0)
    expected = np.log(2 * b) + 1.0 / b
    got = float(losses.laplace_nll(p, s, t))
    assert abs(got - expected) < 1e-3


def test_ssim_identical_is_minus_one(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 16, 1)).astype(np.float32))
    v = float(losses.ssim3d_loss(x, x))
    assert abs(v + 1.0) < 1e-4
    y = x + jnp.asarray(rng.normal(0, 0.2, x.shape).astype(np.float32))
    assert float(losses.ssim3d_loss(x, y)) > v + 0.01


def test_ssim_matches_tf_reference_values(rng):
    """Cross-check our plane SSIM against torch-computed oracle using the same
    11-tap/σ1.5 gaussian, valid padding, biased covariances."""
    import torch
    import torch.nn.functional as F

    x = rng.uniform(0, 1, (2, 20, 20)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    ours = np.asarray(losses._ssim_plane(jnp.asarray(x), jnp.asarray(y)))

    off = np.arange(11) - 5
    w1 = np.exp(-(off ** 2) / (2 * 1.5 ** 2))
    w1 /= w1.sum()
    w2 = torch.tensor(np.outer(w1, w1).astype(np.float32))[None, None]

    def filt(v):
        return F.conv2d(torch.tensor(v)[:, None], w2)[:, 0]

    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mx * my + c1) * (2 * sxy + c2)) / \
        ((mx ** 2 + my ** 2 + c1) * (sxx + syy + c2))
    oracle = smap.mean(dim=(1, 2)).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_weighted_l2():
    gt = np.zeros((1, 4, 4, 4, 2), np.float32)
    gt[..., 1] = 1  # foreground everywhere -> weights = 1
    pred = np.full_like(gt, 5.0)
    pred[..., 0] = -5.0
    # pred matches target_value*(2gt-1) = (-5, 5) exactly -> loss 0
    v = float(losses.weighted_l2_loss(jnp.asarray(gt), jnp.asarray(pred)))
    assert v < 1e-6


def test_cross_entropy_perfect():
    gt = np.zeros((1, 4, 4, 4, 3), np.float32)
    gt[..., 2] = 1
    v = float(losses.cross_entropy_loss(jnp.asarray(gt), jnp.asarray(gt)))
    assert v < 1e-4


def test_moment_loss_shifted():
    gt = np.zeros((1, 9, 9, 9, 1), np.float32)
    pred = np.zeros_like(gt)
    gt[0, 2, 4, 4, 0] = 1
    pred[0, 6, 4, 4, 0] = 1
    v = float(losses.moment_loss(jnp.asarray(gt), jnp.asarray(pred),
                                 enable_checks=False))
    assert abs(v - 4.0) < 1e-4
