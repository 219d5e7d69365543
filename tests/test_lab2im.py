"""Tests of the lab2im variant (seg-oriented generator + ImageGenerator)."""

import numpy as np
import pytest

from synthsr_tpu.io.volume import save_volume
from synthsr_tpu.synth.lab2im import ImageGenerator


@pytest.fixture(scope="module")
def lab_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lab2im")
    d = root / "labels"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        lab = np.zeros((24, 24, 24), np.int32)
        lab[4:20, 4:20, 4:20] = rng.integers(0, 3, (16, 16, 16)) * 2
        save_volume(lab, np.eye(4), None, str(d / f"m{i}.nii.gz"))
    return str(d)


def test_image_generator_basic(lab_dir):
    gen = ImageGenerator(lab_dir, generation_labels=np.array([0, 2, 4]),
                         output_labels=np.array([0, 1, 1]), output_shape=16,
                         seed=0)
    image, labels = gen.generate_image()
    assert image.shape == (16, 16, 16)
    assert labels.shape == (16, 16, 16)
    assert set(np.unique(labels)) <= {0, 1}  # remapped to output labels
    assert 0 <= image.min() and image.max() <= 1 + 1e-5
    # labels and image are geometrically consistent: foreground intensity
    # distribution differs from background
    fg = image[labels == 1]
    bg = image[labels == 0]
    if len(fg) > 10 and len(bg) > 10:
        assert abs(fg.mean() - bg.mean()) > 1e-3


def test_image_generator_resampled_output(lab_dir):
    gen = ImageGenerator(lab_dir, generation_labels=np.array([0, 2, 4]),
                         target_res=2.0, seed=1)
    image, labels = gen.generate_image()
    assert image.shape == (12, 12, 12)  # 24 @ 1mm -> 2mm
    assert labels.shape == (12, 12, 12)


def test_image_generator_multichannel_specific_stats(lab_dir):
    pm = np.array([[0, 100, 200], [1, 2, 3],
                   [50, 150, 250], [1, 2, 3]], np.float32)
    ps = np.abs(np.ones((4, 3), np.float32))
    gen = ImageGenerator(lab_dir, generation_labels=np.array([0, 2, 4]),
                         n_channels=2, prior_means=pm, prior_stds=ps,
                         prior_distributions="normal",
                         use_specific_stats_for_channel=True, seed=2)
    image, labels = gen.generate_image()
    assert image.shape[-1] == 2


def test_image_generator_specific_stats_validation(lab_dir):
    pm = np.ones((6, 3), np.float32)  # 3 blocks but 2 channels
    with pytest.raises(ValueError):
        ImageGenerator(lab_dir, generation_labels=np.array([0, 2, 4]),
                       n_channels=2, prior_means=pm, prior_stds=np.ones((6, 3)),
                       use_specific_stats_for_channel=True)
