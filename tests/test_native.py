"""Native C++ NIfTI loader tests (skipped when the toolchain is unavailable)."""

import numpy as np
import pytest

from synthsr_tpu.io.volume import load_volume, save_volume
from synthsr_tpu.native import native_available, read_nifti_fast

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader unavailable")

REF = "/root/reference/data/labels/brain1_labels.nii.gz"


def test_native_matches_python_on_reference():
    a = load_volume(REF, dtype="int32", fast=False)
    b = load_volume(REF, dtype="int32", fast=True)
    np.testing.assert_array_equal(a, b)


def test_native_float_with_scaling(tmp_path):
    import struct

    rng = np.random.default_rng(0)
    data = rng.integers(0, 50, (12, 13, 14)).astype(np.int16)
    p = str(tmp_path / "scl.nii")
    save_volume(data, np.eye(4), None, p, dtype="int16")
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
    struct.pack_into("<f", raw, 116, 3.0)  # scl_inter
    open(p, "wb").write(raw)
    out = read_nifti_fast(p, "float32")
    assert out is not None
    vol, aff, hdr = out
    np.testing.assert_allclose(vol, data * 2.0 + 3.0, atol=1e-5)


def test_native_rounds_float_labels(tmp_path):
    vol = np.array([[[1.4, 1.6, 2.5001, -0.4]]], np.float32)
    p = str(tmp_path / "r.nii.gz")
    save_volume(vol, np.eye(4), None, p)
    out = read_nifti_fast(p, "int32")
    assert out is not None
    np.testing.assert_array_equal(out[0].ravel(), [1, 2, 3, 0])


def test_native_rejects_missing_file():
    assert read_nifti_fast("/nonexistent/x.nii.gz", "int32") is None


@pytest.mark.parametrize("slope,inter", [(float("nan"), 3.0), (0.0, 3.0),
                                         (float("nan"), float("nan"))])
def test_native_slope_edge_cases_match_python(tmp_path, slope, inter):
    """Non-finite/zero slope acts as 1.0, non-finite inter as 0.0 — identical
    in the C++ fast path and the python reader (advisor round-1 finding)."""
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = str(tmp_path / "edge.nii")
    save_volume(data, np.eye(4), None, p, dtype="int16")
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, slope)
    struct.pack_into("<f", raw, 116, inter)
    open(p, "wb").write(raw)
    py = load_volume(p, dtype="float32", fast=False)
    nat = read_nifti_fast(p, "float32")[0]
    assert np.isfinite(nat).all()
    np.testing.assert_allclose(nat, py, atol=1e-5)
