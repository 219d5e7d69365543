"""Integration tests of the full generative pipeline (BrainGenerator facade),
including tutorial-equivalent configs on the real reference assets."""

import numpy as np
import pytest

from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.brain_generator import BrainGenerator

REF_LABELS_DIR = "/root/reference/data/labels"
REF_PRIORS = "/root/reference/data/labels_classes_priors"


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    """Two synthetic 32-cube label maps with sided labels (2/3 left, 41/42 right)
    + matching fake 'real' images."""
    root = tmp_path_factory.mktemp("data")
    lab_dir = root / "labels"
    img_dir = root / "images"
    lab_dir.mkdir()
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        lab = np.zeros((32, 32, 32), np.int32)
        lab[4:28, 4:28, 4:28] = rng.integers(0, 3, (24, 24, 24)) * 2  # 0/2/4->use 0,2
        lab[lab == 4] = 41  # some right-side labels
        lab[20:24, 20:24, 20:24] = 3
        lab[8:12, 8:12, 8:12] = 42
        save_volume(lab, np.eye(4), None, str(lab_dir / f"map{i}.nii.gz"))
        img = (lab > 0).astype(np.float32) * 100 + rng.normal(0, 5, lab.shape)
        save_volume(img, np.eye(4), None, str(img_dir / f"map{i}.nii.gz"))
    labels = np.array([0, 2, 3, 41, 42])
    return str(lab_dir), str(img_dir), labels


def test_synthetic_sr_config(small_dataset):
    """Tutorial-2-like: synthetic target channel, fixed LR acquisition,
    reliability maps."""
    lab_dir, _, labels = small_dataset
    gen = BrainGenerator(
        labels_dir=lab_dir, generation_labels=labels, n_neutral_labels=3,
        prior_means=None, prior_stds=None, input_channels=True, output_channel=0,
        target_res=None, output_shape=24, data_res=np.array([1.0, 1.0, 3.0]),
        thickness=np.array([1.0, 1.0, 3.0]), downsample=True,
        build_reliability_maps=True, seed=11)
    image, target = gen.generate_brain()
    assert image.shape == (24, 24, 24, 2)  # channel + reliability map
    assert target.shape == (24, 24, 24)
    rel = image[..., 1]
    assert rel.min() >= -1e-5 and rel.max() <= 1 + 1e-5
    assert np.isfinite(image).all() and np.isfinite(target).all()
    assert 0 <= target.min() and target.max() <= 1 + 1e-5  # normalised target


def test_real_image_target_config(small_dataset):
    """Tutorial-1-like: real image as regression target."""
    lab_dir, img_dir, labels = small_dataset
    gen = BrainGenerator(
        labels_dir=lab_dir, images_dir=img_dir, generation_labels=labels,
        n_neutral_labels=3, prior_means=None, prior_stds=None,
        input_channels=True, output_channel=None, output_shape=24,
        data_res=np.array([1.0, 1.0, 3.0]), thickness=np.array([1.0, 1.0, 3.0]),
        downsample=True, build_reliability_maps=True, seed=3)
    image, target = gen.generate_brain()
    assert image.shape == (24, 24, 24, 2)
    assert target.shape == (24, 24, 24)
    assert np.isfinite(image).all() and np.isfinite(target).all()


def test_randomise_res_config(small_dataset):
    """Tutorial-3-like: random acquisition resolution per step."""
    lab_dir, _, labels = small_dataset
    gen = BrainGenerator(
        labels_dir=lab_dir, generation_labels=labels, n_neutral_labels=3,
        prior_means=None, prior_stds=None, input_channels=True, output_channel=0,
        output_shape=24, randomise_res=True, build_reliability_maps=True, seed=5)
    ims = []
    for _ in range(3):
        image, target = gen.generate_brain()
        assert image.shape == (24, 24, 24, 2)
        assert np.isfinite(image).all()
        ims.append(image)
    # different random resolutions produce different blur levels
    diffs = [np.abs(ims[i][..., 0] - ims[j][..., 0]).mean()
             for i in range(3) for j in range(i + 1, 3)]
    assert max(diffs) > 1e-3


def test_generator_determinism(small_dataset):
    lab_dir, _, labels = small_dataset
    # config matches test_randomise_res_config exactly (the seed is a traced
    # PRNG value, not graph structure) so the persistent compile cache reuses
    # its executable — determinism is a property of the key stream, not of
    # which generation graph runs
    kwargs = dict(labels_dir=lab_dir, generation_labels=labels, n_neutral_labels=3,
                  prior_means=None, prior_stds=None, input_channels=True,
                  output_channel=0, output_shape=24, randomise_res=True,
                  build_reliability_maps=True, seed=42)
    g1 = BrainGenerator(**kwargs)
    g2 = BrainGenerator(**kwargs)
    im1, t1 = g1.generate_brain()
    im2, t2 = g2.generate_brain()
    np.testing.assert_allclose(im1, im2, atol=1e-6)
    np.testing.assert_allclose(t1, t2, atol=1e-6)
    im3, _ = g1.generate_brain()
    assert np.abs(im3 - im1).max() > 1e-4  # stream advances


def test_multichannel_with_registration_error(small_dataset):
    """Two synthetic channels (T1+T2-like), second with simulated registration
    error; both inputs, target = channel 0."""
    lab_dir, _, labels = small_dataset
    prior_means = np.array([[0, 20, 60, 100, 140]] * 4, np.float32)
    prior_means[1::2] += 10
    prior_stds = np.abs(np.array([[5.0] * 5] * 4, np.float32))
    gen = BrainGenerator(
        labels_dir=lab_dir, generation_labels=labels, n_neutral_labels=3,
        prior_means=prior_means, prior_stds=prior_stds,
        input_channels=[True, True], output_channel=0, output_shape=24,
        data_res=np.array([[1.0, 1.0, 3.0], [1.0, 3.0, 1.0]]),
        simulate_registration_error=True, seed=7)
    image, target = gen.generate_brain()
    assert image.shape == (24, 24, 24, 2)
    assert target.shape == (24, 24, 24)
    assert np.isfinite(image).all()


@pytest.mark.slow
def test_tutorial2_real_assets():
    """The real tutorial-2 config on the shipped label maps + priors
    (scripts/tutorials/2-SR_synthetic.py), reduced output for CI speed.

    Note: the reference tutorial omits the (required, no-default) argument
    prior_distributions; the shipped prior arrays are (mean, std) rows
    estimated by estimate_priors.py:206-221, i.e. hyperpriors of a normal
    distribution, so we pass 'normal' explicitly."""
    gen = BrainGenerator(
        labels_dir=REF_LABELS_DIR,
        generation_labels=f"{REF_PRIORS}/generation_labels.npy",
        generation_classes=f"{REF_PRIORS}/generation_classes.npy",
        prior_means=f"{REF_PRIORS}/prior_means_t1_lr.npy",
        prior_stds=f"{REF_PRIORS}/prior_stds_t1_lr.npy",
        prior_distributions="normal",
        input_channels=True, output_channel=0, target_res=1.5, output_shape=64,
        data_res=np.array([1.0, 1.0, 3.0]), thickness=np.array([1.0, 1.0, 3.0]),
        downsample=True, build_reliability_maps=True, seed=0)
    image, target = gen.generate_brain()
    assert image.shape[:-1] == target.shape
    assert image.shape[-1] == 2
    # intensity statistics: head voxels should be bright in T1 (priors ~110-226)
    assert 0.0 <= target.min() and target.max() <= 1.0 + 1e-5
    assert target.mean() > 0.01
