"""End-to-end predict CLI tests (mechanics + device-resample parity).

The shipped .h5 weights are git-LFS blobs absent from the reference checkout,
so these tests exercise the full pipeline with randomized weights and check
geometry/normalization/TTA/output-contract behavior, plus exact parity of the
device resample against the host scipy implementation.
"""

import os

import numpy as np
import pytest

from synthsr_tpu.io.volume import load_volume, resample_volume, save_volume
from synthsr_tpu.ops.host_matrices import (resample_volume_matrices,
                                           reslice_like_matrices,
                                           scipy_gaussian_matrix)


@pytest.fixture(scope="module")
def random_weights_h5(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.models.h5_import import export_keras_unet_weights
    from synthsr_tpu.models.unet import synthsr_unet

    model = synthsr_unet()
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = dict(model.init(jax.random.PRNGKey(0), x))
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.05).astype(np.float32)),
        variables["params"])
    variables["params"] = params
    p = str(tmp_path_factory.mktemp("weights") / "rand.h5")
    export_keras_unet_weights(p, variables)
    return p


def _make_input(tmp_path, shape=(40, 44, 36), zooms=(2.0, 1.5, 3.0)):
    rng = np.random.default_rng(7)
    vol = (rng.uniform(0, 800, size=shape)).astype(np.float32)
    aff = np.diag(list(zooms) + [1.0])
    aff[:3, 3] = [-20, 10, 5]
    p = str(tmp_path / "input.nii.gz")
    save_volume(vol, aff, None, p)
    return p, vol, aff


def test_device_resample_matches_scipy(tmp_path):
    from jax import numpy as jnp

    from synthsr_tpu.ops.linops import apply_axis_ops

    rng = np.random.default_rng(1)
    vol = rng.normal(size=(24, 30, 18)).astype(np.float32)
    aff = np.diag([2.0, 0.7, 1.3, 1.0])
    oracle, aff_o = resample_volume(vol, aff, [1.0, 1.0, 1.0])
    mats, new_shape, aff_d = resample_volume_matrices(vol.shape, aff, [1.0, 1.0, 1.0])
    dev = np.asarray(apply_axis_ops(jnp.asarray(vol), [jnp.asarray(m) for m in mats]))
    assert dev.shape == oracle.shape == new_shape
    np.testing.assert_allclose(aff_d, aff_o, atol=1e-10)
    np.testing.assert_allclose(dev, oracle, atol=2e-4)


def test_scipy_gaussian_matrix_matches_filter1d():
    from scipy.ndimage import gaussian_filter1d

    rng = np.random.default_rng(2)
    v = rng.normal(size=37).astype(np.float64)
    for sigma in (0.25, 0.8, 2.3):
        m = scipy_gaussian_matrix(37, sigma)
        np.testing.assert_allclose(m @ v, gaussian_filter1d(v, sigma, mode="reflect"),
                                   atol=1e-5)


def test_reslice_like_matrices_identity(rng):
    from jax import numpy as jnp

    from synthsr_tpu.ops.linops import apply_axis_ops

    vol = rng.normal(size=(12, 13, 14)).astype(np.float32)
    mats = reslice_like_matrices((12, 13, 14), np.eye(4), (12, 13, 14), np.eye(4))
    out = np.asarray(apply_axis_ops(jnp.asarray(vol), [jnp.asarray(m) for m in mats]))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_reslice_like_shifted_grid(rng):
    from jax import numpy as jnp

    from synthsr_tpu.io.volume import resample_volume_like
    from synthsr_tpu.ops.linops import apply_axis_ops

    flo = rng.normal(size=(16, 16, 16)).astype(np.float32)
    aff_flo = np.diag([1.5, 1.0, 2.0, 1.0])
    aff_flo[:3, 3] = [1.0, -2.0, 0.5]
    ref = np.zeros((10, 12, 9))
    aff_ref = np.eye(4)
    oracle = resample_volume_like(ref, aff_ref, flo, aff_flo)
    mats = reslice_like_matrices(ref.shape, aff_ref, flo.shape, aff_flo)
    dev = np.asarray(apply_axis_ops(jnp.asarray(flo), [jnp.asarray(m) for m in mats]))
    np.testing.assert_allclose(dev, oracle, atol=2e-4)


def test_predict_file_end_to_end(tmp_path, random_weights_h5):
    from synthsr_tpu.cli.predict import Predictor

    # (20, 22, 18) resamples to (40, 33, 54) -> pads to (64, 64, 64): the
    # smallest shape that still exercises resample + RAS + pad + unpad
    pin, vol, aff = _make_input(tmp_path, shape=(20, 22, 18))
    predictor = Predictor(model_path=random_weights_h5, compute_dtype="float32")
    pout = str(tmp_path / "out.nii.gz")
    predictor.predict_file(pin, pout)
    pred, aff_out, _ = load_volume(pout, im_only=False)
    # output grid is the 1mm RAS-aligned grid
    expected_shape = tuple(int(np.ceil(s * z)) for s, z in zip(vol.shape, (2.0, 1.5, 3.0)))
    assert pred.shape == expected_shape
    assert np.all(np.diag(aff_out)[:3] > 0)  # RAS
    np.testing.assert_allclose(np.diag(aff_out)[:3], 1.0, atol=1e-6)  # 1mm
    assert pred.min() >= 0.0 and pred.max() <= 128.0  # output contract


def test_run_batch_matches_serial(tmp_path):
    """Pipelined directory mode (loader/writer threads) produces byte-identical
    outputs, in order, to the serial per-file loop; loader exceptions surface.
    The device pipeline itself is covered by test_predict_file_end_to_end —
    here a stub predictor keeps the threading mechanics cheap to test."""
    from synthsr_tpu.cli.predict import run_batch

    class StubPredictor:
        def predict_volume(self, im, aff):
            return np.asarray(im, np.float32) * 2.0 + 1.0, aff

    rng = np.random.default_rng(11)
    d_in = tmp_path / "in"
    d_in.mkdir()
    images, vols = [], []
    for i in range(4):
        vol = rng.uniform(0, 500, size=(9, 10, 11)).astype(np.float32)
        p = str(d_in / f"v{i}.nii.gz")
        save_volume(vol, np.eye(4), None, p)
        images.append(p)
        vols.append(vol)

    outs = [str(tmp_path / f"o{i}.nii.gz") for i in range(4)]
    run_batch(StubPredictor(), images, outs)
    for pout, vol in zip(outs, vols):
        got = load_volume(pout)
        # save_volume round-trips through the NIfTI writer like the serial path
        np.testing.assert_allclose(got, vol * 2.0 + 1.0, rtol=1e-6)

    # a loader failure must raise in the caller, not hang the pipeline
    with pytest.raises(Exception):
        run_batch(StubPredictor(), [str(d_in / "missing.nii.gz")],
                  [str(tmp_path / "x.nii.gz")])

    # a writer failure fails the batch FAST: the predict loop must stop
    # instead of predicting the whole directory first, and the save error
    # must surface (cli/_pipeline.py error semantics)
    class CountingPredictor(StubPredictor):
        calls = 0

        def predict_volume(self, im, aff):
            CountingPredictor.calls += 1
            return super().predict_volume(im, aff)

    # parent "directory" is a regular file -> save_volume's makedirs raises
    (tmp_path / "not_a_dir").write_text("")
    bad_outs = [str(tmp_path / "not_a_dir" / f"o{i}.nii.gz")
                for i in range(4)]
    with pytest.raises(Exception):
        run_batch(CountingPredictor(), images, bad_outs)
    assert CountingPredictor.calls < 4  # stopped before the end of the batch


def test_predict_ct_clipping(tmp_path, random_weights_h5):
    from synthsr_tpu.cli.predict import Predictor

    rng = np.random.default_rng(3)
    vol = rng.uniform(-1000, 2000, size=(32, 32, 32)).astype(np.float32)
    aff = np.eye(4)
    predictor = Predictor(model_path=random_weights_h5, ct=True, compute_dtype="float32")
    pred, _ = predictor.predict_volume(vol, aff)
    predictor2 = Predictor(model_path=random_weights_h5, ct=True, compute_dtype="float32")
    pred2, _ = predictor2.predict_volume(np.clip(vol, 0, 80), aff)
    np.testing.assert_allclose(pred, pred2, atol=1e-5)


def test_predict_tta_flip_consistency(tmp_path, random_weights_h5):
    """With flipping enabled, a flip-symmetric input must give a symmetric
    prediction; with flipping disabled results generally differ from TTA."""
    from synthsr_tpu.cli.predict import Predictor

    rng = np.random.default_rng(4)
    half = rng.uniform(0, 1, size=(16, 32, 32)).astype(np.float32)
    vol = np.concatenate([half, half[::-1]], axis=0)
    aff = np.eye(4)
    p_tta = Predictor(model_path=random_weights_h5, compute_dtype="float32")
    pred, _ = p_tta.predict_volume(vol, aff)
    np.testing.assert_allclose(pred, pred[::-1], atol=1e-3)

    p_no = Predictor(model_path=random_weights_h5, disable_flipping=True,
                     compute_dtype="float32")
    asym = rng.uniform(0, 1, size=(32, 32, 32)).astype(np.float32)
    a, _ = p_tta.predict_volume(asym, aff)
    b, _ = p_no.predict_volume(asym, aff)
    assert np.abs(a - b).max() > 1e-6


def test_dir_batch_naming(tmp_path, random_weights_h5):
    from synthsr_tpu.cli.predict import _prepare_paths

    d_in = tmp_path / "in"
    d_in.mkdir()
    for n in ("a.nii.gz", "b.nii", "c.mgz"):
        save_volume(np.zeros((12, 12, 12), np.float32), np.eye(4), None,
                    str(d_in / n))
    images, outs = _prepare_paths(str(d_in), str(tmp_path / "out"))
    assert [os.path.basename(o) for o in outs] == \
        ["a_SynthSR.nii.gz", "b_SynthSR.nii", "c_SynthSR.mgz"]


def test_h5_roundtrip_predict_equivalence(tmp_path, random_weights_h5):
    """Synthetic-weights end-to-end equivalence: predictions through the .h5
    interchange equal predictions from the native flax variables (the 'both
    pipelines' check that stands in for the LFS-missing shipped weights)."""
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.cli.predict import Predictor
    from synthsr_tpu.models.h5_import import load_keras_unet_weights
    from synthsr_tpu.models.unet import synthsr_unet

    pin, _, _ = _make_input(tmp_path, shape=(32, 32, 32), zooms=(1, 1, 1))
    pred = Predictor(model_path=random_weights_h5, compute_dtype="float32")
    p_h5 = str(tmp_path / "via_h5.nii.gz")
    pred.predict_file(pin, p_h5)

    # native path: same variables, direct apply with identical pre/post math
    model = synthsr_unet(compute_dtype=jnp.float32)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 32, 32, 32, 1))))
    variables = load_keras_unet_weights(random_weights_h5, variables)
    pred2 = Predictor.__new__(Predictor)
    pred2.model = model
    pred2.variables = variables
    pred2.disable_flipping = False
    pred2.ct = False
    pred2.use_fast = False
    pred2._jitted = {}
    p_native = str(tmp_path / "native.nii.gz")
    pred2.predict_file(pin, p_native)

    a = load_volume(p_h5)
    b = load_volume(p_native)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_parity_harness_psnr_and_compare(tmp_path, random_weights_h5):
    """PSNR math + compare_dirs pairing + the CLI wiring of the parity
    harness (BASELINE.md 'PSNR >= 40 dB vs TF reference' check)."""
    from synthsr_tpu.cli import parity

    # psnr unit semantics
    a = np.zeros((8, 8, 8), np.float32)
    assert parity.psnr(a, a) == float("inf")
    b = a + 1.28  # MSE = 1.28^2 -> PSNR = 20 log10(128/1.28) = 40 dB
    assert abs(parity.psnr(a, b) - 40.0) < 1e-6

    # compare_dirs over two directories
    d1, d2 = tmp_path / "p", tmp_path / "r"
    d1.mkdir(); d2.mkdir()
    rng = np.random.default_rng(3)
    v = rng.uniform(0, 128, (12, 12, 12)).astype(np.float32)
    save_volume(v, np.eye(4), None, str(d1 / "s.nii.gz"))
    save_volume(v + 1.28, np.eye(4), None, str(d2 / "s.nii.gz"))
    res = parity.compare_dirs(str(d1), str(d2))
    assert len(res) == 1 and abs(res[0][1] - 40.0) < 1e-3

    # full CLI: self-comparison must pass the 40 dB bar with PSNR = inf
    pin, _, _ = _make_input(tmp_path, shape=(32, 32, 32), zooms=(1, 1, 1))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    os.rename(pin, str(in_dir / "input.nii.gz"))
    out1 = str(tmp_path / "ours")
    rc = parity.main(["--tf_h5", random_weights_h5, "--input_dir", str(in_dir),
                      "--output_dir", out1])
    assert rc == 0
    rc = parity.main(["--tf_h5", random_weights_h5, "--input_dir", str(in_dir),
                      "--output_dir", str(tmp_path / "ours2"),
                      "--reference_dir", out1])
    assert rc == 0
