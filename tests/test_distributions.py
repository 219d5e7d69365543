"""Statistical distributional-equivalence tests for the randomized
acquisition / hyperparameter samplers (SURVEY §7's "subtlest correctness
risk": the static-shape reformulation must keep the reference's DRAW
DISTRIBUTIONS, not just match point values under a fixed key).

Method: N = 10⁴ seeded traced draws (vmap over split keys) against a straight
numpy transcription of the reference's sampling logic
(``lab2im/layers.py:504-652`` SampleResolution, ``utils.py:961-1049``
draw_value_from_distribution, ``SynthSR/model_inputs.py:103-125`` GMM prior
draws, ``lab2im/layers.py`` IntensityAugmentation's gamma) — two-sample
Kolmogorov–Smirnov on every continuous marginal plus tolerance checks on the
discrete branch probabilities (iso coin, min coin, anisotropic-axis choice).
Everything is seeded, so the p-values are deterministic: a failure means the
distribution DRIFTED, not bad luck.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

N = 10_000
P_MIN = 1e-4  # deterministic seeds: any failure is real drift


def _ks(a, b):
    return stats.ks_2samp(np.asarray(a), np.asarray(b)).pvalue


def _draws(fn, n=N, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return jax.device_get(jax.jit(jax.vmap(fn))(keys))


# ---------------------------------------------------------------------------
# SampleResolution (lab2im/layers.py:504-652)
# ---------------------------------------------------------------------------

MIN_RES = np.array([1.0, 1.0, 1.0], np.float32)
MAX_ISO = np.array([4.0, 4.0, 4.0], np.float32)
MAX_ANISO = np.array([8.0, 8.0, 8.0], np.float32)


def np_sample_resolution(rng, min_res, max_iso, max_aniso, prob_iso, prob_min):
    """Literal numpy transcription of the reference call logic (:599-645):
    per-axis-independent U(min, max) draws for both candidate resolutions, a
    uniformly-chosen anisotropic axis, then the iso and min coins."""
    dim = rng.integers(0, 3)
    mask = np.arange(3) == dim
    if max_iso is None and max_aniso is None:
        res = min_res.copy()
    elif max_iso is not None and max_aniso is None:
        iso = rng.uniform(min_res, max_iso)
        res = min_res.copy() if rng.uniform() < prob_min else iso
    elif max_iso is None:
        aniso = rng.uniform(min_res, max_aniso)
        res = min_res.copy() if rng.uniform() < prob_min \
            else np.where(mask, aniso, min_res)
    else:
        iso = rng.uniform(min_res, max_iso)
        aniso = rng.uniform(min_res, max_aniso)
        res = iso if rng.uniform() < prob_iso else np.where(mask, aniso, min_res)
        if rng.uniform() < prob_min:
            res = min_res.copy()
    thick = rng.uniform(min_res, res)
    return res, thick


def _np_res_draws(max_iso, max_aniso, prob_iso=0.1, prob_min=0.05, n=N):
    rng = np.random.default_rng(1)
    out = [np_sample_resolution(rng, MIN_RES, max_iso, max_aniso,
                                prob_iso, prob_min) for _ in range(n)]
    return (np.stack([r for r, _ in out]), np.stack([t for _, t in out]))


@pytest.mark.parametrize("case", ["both", "iso_only", "aniso_only"])
def test_sample_resolution_marginals(case):
    from synthsr_tpu.synth.augment import sample_resolution

    max_iso = None if case == "aniso_only" else MAX_ISO
    max_aniso = None if case == "iso_only" else MAX_ANISO
    fn = functools.partial(sample_resolution, min_resolution=MIN_RES,
                           max_res_iso=max_iso, max_res_aniso=max_aniso,
                           prob_iso=0.1, prob_min=0.05, return_thickness=True)
    res, thick = _draws(fn)
    res_np, thick_np = _np_res_draws(max_iso, max_aniso)
    for ax in range(3):
        assert _ks(res[:, ax], res_np[:, ax]) > P_MIN, \
            f"{case}: resolution axis {ax} marginal drifted"
        assert _ks(thick[:, ax], thick_np[:, ax]) > P_MIN, \
            f"{case}: thickness axis {ax} marginal drifted"
    # thickness must never exceed its resolution (U(min, res) coupling)
    assert np.all(thick <= res + 1e-5)
    assert np.all(thick >= MIN_RES - 1e-5)


def test_sample_resolution_branch_probabilities():
    """The discrete events: P(min-res coin), P(iso coin), and the uniform
    anisotropic-axis choice.  4σ tolerances at N = 10⁴."""
    from synthsr_tpu.synth.augment import sample_resolution

    fn = functools.partial(sample_resolution, min_resolution=MIN_RES,
                           max_res_iso=MAX_ISO, max_res_aniso=MAX_ANISO,
                           prob_iso=0.1, prob_min=0.05, return_thickness=False)
    res = _draws(fn)
    at_min = np.all(res == MIN_RES, axis=1)
    # exactly-min: the min coin (0.05), plus nothing else (iso/aniso draws
    # hit the min bound with probability 0)
    assert abs(at_min.mean() - 0.05) < 4 * np.sqrt(0.05 * 0.95 / N)
    # among non-min draws: iso <=> all three axes off min
    off_min = res[~at_min]
    n_off = np.sum(off_min > MIN_RES + 1e-7, axis=1)
    iso_frac = (n_off == 3).mean()
    assert abs(iso_frac - 0.1) < 4 * np.sqrt(0.1 * 0.9 / len(off_min))
    # aniso draws: exactly one axis off min, uniformly distributed
    aniso = off_min[n_off == 1]
    for ax in range(3):
        frac = (aniso[:, ax] > MIN_RES[ax] + 1e-7).mean()
        assert abs(frac - 1 / 3) < 4 * np.sqrt((1 / 3) * (2 / 3) / len(aniso))


# ---------------------------------------------------------------------------
# draw_value_from_distribution traced twin (utils.py:961-1049)
# ---------------------------------------------------------------------------

def np_draw_value(rng, hp, distribution, positive_only=False):
    """Literal numpy transcription of the reference's array case (:1014-1049):
    random 2-row modality block, then per-column independent draws."""
    n_mod = hp.shape[0] // 2
    idx = 2 * rng.integers(n_mod)
    block = hp[idx: idx + 2, :]
    if distribution == "uniform":
        v = rng.uniform(block[0], block[1])
    else:
        v = rng.normal(block[0], block[1])
    if positive_only:
        v = np.maximum(v, 0.0)
    return v


@pytest.mark.parametrize("distribution", ["uniform", "normal"])
def test_draw_traced_multiblock_marginals(distribution):
    from synthsr_tpu.synth.sampling import draw_traced

    # 3 modality blocks x 4 columns, deliberately asymmetric
    hp = np.array([[0.0, 1.0, -2.0, 5.0],
                   [1.0, 2.0, 1.0, 6.0],
                   [10.0, 10.0, 10.0, 10.0],
                   [12.0, 11.0, 13.0, 10.5],
                   [-5.0, 0.0, 0.0, 0.0],
                   [1.0, 1.0, 1.0, 1.0]], np.float32)
    vals = _draws(lambda k: draw_traced(k, hp, distribution=distribution))
    rng = np.random.default_rng(2)
    ref = np.stack([np_draw_value(rng, hp, distribution) for _ in range(N)])
    for col in range(hp.shape[1]):
        assert _ks(vals[:, col], ref[:, col]) > P_MIN, \
            f"{distribution} column {col} marginal drifted"


def test_draw_traced_scalar_specs():
    """Number spec -> U(centre−h, centre+h); None -> U(centre−range,
    centre+range); positive_only clips at 0 (reference :1002-1008, :1047)."""
    from synthsr_tpu.synth.sampling import draw_traced

    vals = _draws(lambda k: draw_traced(k, 20.0, size=1, centre=10.0))[:, 0]
    rng = np.random.default_rng(3)
    assert _ks(vals, rng.uniform(-10.0, 30.0, N)) > P_MIN
    vals = _draws(lambda k: draw_traced(
        k, [0.0, 5.0], size=2, distribution="normal", positive_only=True))
    ref = np.maximum(rng.normal(0.0, 5.0, (N, 2)), 0.0)
    for col in range(2):
        assert _ks(vals[:, col], ref[:, col]) > P_MIN
    assert np.all(vals >= 0)


# ---------------------------------------------------------------------------
# GMM prior draws (SynthSR/model_inputs.py:103-125)
# ---------------------------------------------------------------------------

def test_gmm_sampler_marginals():
    """Traced GMM prior draws and class->label expansion.

    Reference quirk preserved: with a None spec, draw_value_from_distribution
    builds rows (centre−range, centre+range) REGARDLESS of the distribution
    (utils.py:1004), and the normal branch then reads them as (mean, std) —
    so the default 'normal' hyperpriors are N(25, 225) for means and
    N(5, 25) for stds, positive-clipped, NOT N(125, 100)/N(15, 10)."""
    from synthsr_tpu.synth.sampling import make_gmm_sampler

    classes = np.array([0, 1, 1, 2], np.int32)
    sampler = make_gmm_sampler(n_labels=4, prior_means=None, prior_stds=None,
                               prior_distributions="normal",
                               generation_classes=classes)
    means, stds = _draws(sampler)
    means, stds = means[..., 0], stds[..., 0]
    rng = np.random.default_rng(4)
    ref_m = np.maximum(rng.normal(25.0, 225.0, N), 0.0)
    ref_s = np.maximum(rng.normal(5.0, 25.0, N), 0.0)
    for lab in range(4):
        assert _ks(means[:, lab], ref_m) > P_MIN
        assert _ks(stds[:, lab], ref_s) > P_MIN
    # class sharing: labels 1 and 2 share class 1's draw per sample
    np.testing.assert_array_equal(means[:, 1], means[:, 2])
    assert not np.array_equal(means[:, 0], means[:, 1])

    # normal prior arrays: per-class (2, n_classes) hyperpriors
    pm = np.array([[30.0, 100.0, 200.0], [5.0, 10.0, 1.0]], np.float32)
    sampler = make_gmm_sampler(n_labels=3, prior_means=pm, prior_stds=None,
                               prior_distributions="normal")
    means, _ = _draws(sampler)
    rng = np.random.default_rng(5)
    for cls in range(3):
        ref = np.maximum(rng.normal(pm[0, cls], pm[1, cls], N), 0.0)
        assert _ks(means[:, cls, 0], ref) > P_MIN


# ---------------------------------------------------------------------------
# gamma augmentation (IntensityAugmentation, lab2im/layers.py:1237-1274)
# ---------------------------------------------------------------------------

def test_gamma_augmentation_distribution():
    """Observable check through the traced intensity augmentation: with
    noise/clip off and a [0, ½, 1] volume (min-max normalise is the
    identity), the middle voxel is 0.5^exp(γ) with γ ~ N(0, gamma_std)."""
    from synthsr_tpu.synth.augment import intensity_augmentation

    x = jnp.asarray([0.0, 0.5, 1.0], jnp.float32).reshape(3, 1, 1, 1)
    vals = _draws(lambda k: intensity_augmentation(
        k, x, noise_std=0, clip=0, normalise=True, gamma_std=0.4)[1, 0, 0, 0])
    rng = np.random.default_rng(6)
    ref = 0.5 ** np.exp(rng.normal(0.0, 0.4, N))
    assert _ks(vals, ref) > P_MIN
