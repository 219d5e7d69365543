"""Tests for the self-contained NIfTI/MGZ I/O and numpy geometry layer."""

import numpy as np
import pytest

from synthsr_tpu.io import nifti
from synthsr_tpu.io.labels import get_list_labels
from synthsr_tpu.io.volume import (
    align_volume_to_ref,
    crop_volume,
    get_ras_axes,
    load_volume,
    pad_volume,
    resample_volume,
    resample_volume_like,
    rescale_volume,
    save_volume,
)

REF_LABELS = "/root/reference/data/labels/brain1_labels.nii.gz"


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.normal(size=(7, 9, 11)).astype(np.float32)
    aff = np.array([[0, -1.5, 0, 10], [2.0, 0, 0, -5], [0, 0, 3.0, 7], [0, 0, 0, 1]], float)
    p = str(tmp_path / "x.nii.gz")
    nifti.write_nifti(p, data, aff)
    out, aff2, hdr = nifti.read_nifti(p)
    np.testing.assert_allclose(out, data, rtol=1e-6)
    np.testing.assert_allclose(aff2, aff, atol=1e-4)
    np.testing.assert_allclose(sorted(hdr.zooms), [1.5, 2.0, 3.0], atol=1e-4)


def test_nifti_int_dtype_roundtrip(tmp_path, rng):
    data = rng.integers(0, 60, size=(5, 6, 4)).astype(np.int32)
    p = str(tmp_path / "labels.nii")
    nifti.write_nifti(p, data, np.eye(4), dtype="int32")
    out, _, hdr = nifti.read_nifti(p)
    assert hdr.dtype == np.int32
    np.testing.assert_array_equal(out, data)


def test_mgz_roundtrip(tmp_path, rng):
    data = rng.normal(size=(6, 5, 8)).astype(np.float32)
    aff = np.array([[-1, 0, 0, 3], [0, 0, 1, -2], [0, -1, 0, 4], [0, 0, 0, 1]], float)
    p = str(tmp_path / "x.mgz")
    nifti.write_mgh(p, data, aff)
    out, aff2, _ = nifti.read_mgh(p)
    np.testing.assert_allclose(out, data, rtol=1e-6)
    np.testing.assert_allclose(aff2, aff, atol=1e-4)


def test_read_reference_label_map():
    vol, aff, hdr = load_volume(REF_LABELS, im_only=False)
    assert vol.ndim == 3
    labels = np.unique(vol).astype(int)
    assert 0 in labels and len(labels) > 5
    assert np.all(np.isfinite(aff))
    # all labels must be valid FreeSurfer ids for FS sorting
    ll, n_neutral = get_list_labels(label_list=labels, FS_sort=True)
    assert len(ll) == len(labels)
    assert 0 < n_neutral <= len(labels)


def test_save_load_volume_roundtrip(tmp_path, rng):
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    aff = np.eye(4)
    p = str(tmp_path / "v.nii.gz")
    save_volume(vol, aff, None, p)
    vol2, aff2, _ = load_volume(p, im_only=False)
    np.testing.assert_allclose(vol2, vol, rtol=1e-6)
    np.testing.assert_allclose(aff2, aff, atol=1e-5)


def test_get_ras_axes_permutation():
    aff = np.eye(4)
    np.testing.assert_array_equal(get_ras_axes(aff), [0, 1, 2])
    perm = np.array([[0, 1, 0, 0], [0, 0, 1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], float)
    axes = get_ras_axes(perm)
    assert sorted(axes.tolist()) == [0, 1, 2]


def test_align_volume_to_ref_restores_ras(rng):
    vol = rng.normal(size=(4, 5, 6))
    # LIA-ish affine (FreeSurfer style)
    aff = np.array([[-1, 0, 0, 2], [0, 0, 1, -3], [0, -1, 0, 5], [0, 0, 0, 1]], float)
    out, aff2 = align_volume_to_ref(vol, aff, aff_ref=np.eye(4), return_aff=True, n_dims=3)
    # after alignment the affine linear part must have a positive diagonal
    assert np.all(np.diag(aff2[:3, :3]) > 0)
    assert sorted(out.shape) == sorted(vol.shape)
    # voxel (i,j,k) -> world must be preserved: compare one corner value
    assert np.isclose(np.abs(vol).sum(), np.abs(out).sum())


def test_align_round_trips_with_load(tmp_path, rng):
    vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
    aff = np.array([[0, 2.0, 0, 1], [0, 0, -1.0, 2], [-1.5, 0, 0, 3], [0, 0, 0, 1]])
    p = str(tmp_path / "v.nii.gz")
    save_volume(vol, aff, None, p)
    ras = load_volume(p, aff_ref=np.eye(4))
    assert np.isclose(np.abs(ras).sum(), np.abs(vol).sum(), rtol=1e-5)


def test_resample_volume_identity(rng):
    vol = rng.normal(size=(8, 8, 8))
    out, aff2 = resample_volume(vol, np.eye(4), [1, 1, 1], blur=False)
    np.testing.assert_allclose(out, vol, atol=1e-10)
    # with blur on, matches scipy gaussian_filter(sigma=0.25) — reference behavior
    from scipy.ndimage import gaussian_filter
    out_b, _ = resample_volume(vol, np.eye(4), [1, 1, 1], blur=True)
    np.testing.assert_allclose(out_b, gaussian_filter(vol, 0.25), atol=1e-10)
    np.testing.assert_allclose(aff2, np.eye(4), atol=1e-10)


def test_resample_volume_downsample_shape(rng):
    vol = rng.normal(size=(10, 10, 10))
    out, aff2 = resample_volume(vol, np.eye(4), [2, 2, 2])
    assert out.shape == (5, 5, 5)
    np.testing.assert_allclose(np.diag(aff2)[:3], [2, 2, 2])


def test_resample_volume_like_identity(rng):
    vol = rng.normal(size=(6, 6, 6))
    out = resample_volume_like(vol, np.eye(4), vol, np.eye(4))
    np.testing.assert_allclose(out, vol, atol=1e-12)


def test_rescale_volume(rng):
    vol = rng.uniform(0, 100, size=(10, 10, 10))
    out = rescale_volume(vol, 0, 255, min_percentile=0, max_percentile=100)
    assert out.min() == 0 and np.isclose(out.max(), 255)


def test_crop_pad_roundtrip(rng):
    vol = rng.normal(size=(20, 24, 28))
    cropped, aff2 = crop_volume(vol, cropping_shape=[12, 12, 12], aff=np.eye(4))
    assert cropped.shape == (12, 12, 12)
    padded, aff3 = pad_volume(cropped, [20, 24, 28], aff=aff2)
    assert padded.shape == (20, 24, 28)
    np.testing.assert_allclose(aff3, np.eye(4), atol=1e-9)


def test_fs_sort_orders_neutral_left_right():
    labels = [0, 2, 41, 16, 3, 42]
    ll, n_neutral = get_list_labels(label_list=labels, FS_sort=True)
    assert n_neutral == 2
    np.testing.assert_array_equal(ll, [0, 16, 2, 3, 41, 42])


def test_fs_sort_single_side_all_neutral():
    ll, n_neutral = get_list_labels(label_list=[0, 2, 3], FS_sort=True)
    assert n_neutral == len(ll)
