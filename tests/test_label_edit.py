"""Tests for host-side label-map editing ops."""

import numpy as np
from scipy.ndimage import binary_erosion

from synthsr_tpu.io.label_edit import (
    compute_distance_map,
    compute_hard_volumes,
    correct_label_map,
    crop_volume_around_region,
    erode_label_map,
    get_largest_connected_component,
    mask_label_map,
    smooth_label_map,
)


def _toy_labels():
    lab = np.zeros((20, 20, 20), np.int32)
    lab[4:16, 4:16, 4:16] = 2
    lab[8:12, 8:12, 8:12] = 3
    return lab


def test_crop_around_region_margin():
    lab = _toy_labels()
    cropped, idx = crop_volume_around_region(lab, masking_labels=3, margin=2)
    assert cropped.shape == (8, 8, 8)
    np.testing.assert_array_equal(idx, [6, 6, 6, 14, 14, 14])


def test_crop_around_region_padding_overflow():
    lab = np.zeros((12, 12, 12), np.int32)
    lab[0:2, 0:2, 0:2] = 1
    cropped, idx = crop_volume_around_region(lab, masking_labels=1,
                                             cropping_shape=8, overflow="padding")
    assert cropped.shape == (8, 8, 8)


def test_mask_label_map():
    lab = _toy_labels()
    masked, mask = mask_label_map(lab, [3], return_mask=True)
    assert set(np.unique(masked)) == {0, 3}
    assert mask.sum() == (lab == 3).sum()


def test_correct_label_map_scalar():
    lab = _toy_labels()
    out = correct_label_map(lab, [3], [7])
    assert 3 not in np.unique(out) and 7 in np.unique(out)


def test_correct_label_map_nearest():
    lab = _toy_labels()
    out = correct_label_map(lab, [3], use_nearest_label=True)
    # the island of 3s is surrounded by 2s -> all become 2
    assert 3 not in np.unique(out)
    np.testing.assert_array_equal(out == 2, (lab == 2) | (lab == 3))


def test_smooth_label_map_removes_specks():
    lab = _toy_labels()
    lab[10, 10, 10] = 5  # single-voxel speck
    out = smooth_label_map(lab, np.ones((3, 3, 3)))
    assert 5 not in np.unique(out)


def test_erode_label_map_erodes_all_requested_labels():
    """The reference's early return only erodes the FIRST label — our fixed
    version must erode both."""
    lab = np.zeros((24, 24, 24), np.int32)
    lab[2:12, 2:22, 2:22] = 2
    lab[12:22, 2:22, 2:22] = 4
    out = erode_label_map(lab, [2, 4], 1)
    assert (out == 2).sum() < (lab == 2).sum()
    assert (out == 4).sum() < (lab == 4).sum()  # fails with reference behavior
    # eroded voxels were reassigned to existing labels (incl. background)
    assert set(np.unique(out)) <= {0, 2, 4}


def test_get_largest_connected_component():
    mask = np.zeros((10, 10, 10), bool)
    mask[1:3, 1:3, 1:3] = True
    mask[5:9, 5:9, 5:9] = True
    out = get_largest_connected_component(mask)
    assert out.sum() == 4 ** 3
    assert not out[1, 1, 1] and out[6, 6, 6]


def test_compute_hard_volumes():
    lab = _toy_labels()
    vols = compute_hard_volumes(lab, voxel_volume=2.0, label_list=[0, 2, 3])
    np.testing.assert_allclose(vols, [2.0 * (lab == 2).sum(), 2.0 * (lab == 3).sum()])


def test_compute_distance_map_signs():
    lab = _toy_labels()
    dist = compute_distance_map(lab)
    assert dist[10, 10, 10] > 0  # deep inside
    assert dist[0, 0, 0] < 0  # far outside
    # boundary voxels are at ±0.5
    assert np.isclose(np.abs(dist[4, 10, 10]), 0.5)
