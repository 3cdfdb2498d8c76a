"""Real `.nii` ingestion, executed in CI (VERDICT r3 #5).

The reference's basic_ct format is NIfTI via nibabel with a
`labelsTr/label<stem>.nii` sibling convention
(`/root/reference/src/UCF_VIT/dataloaders/dataset.py:72-96`). nibabel is not
installed in this rig, so ingestion runs through the first-party NIfTI-1
reader (`ucf_vit_tpu/data/nifti.py`); these tests cover it three ways:
round-trip through our writer, against INDEPENDENTLY hand-packed header
bytes (so a shared writer/reader bug cannot self-certify), and end-to-end —
FileReader -> tiles -> Patchify3D -> collate on `.nii` files must equal the
`.npy` route bit for bit.
"""

import os
import struct

import numpy as np
import pytest

from ucf_vit_tpu.data import nifti
from ucf_vit_tpu.data.pipeline import (
    BatchIterator,
    FileReader,
    ProcessChannels,
    TileIterator3D,
    read_nifti_file,
    read_npy_file,
)


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64, np.int64]
)
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_dtypes(tmp_path, dtype, gz):
    rng = np.random.default_rng(0)
    arr = (rng.random((5, 4, 3)) * 50).astype(dtype)
    p = str(tmp_path / ("v.nii.gz" if gz else "v.nii"))
    nifti.save(p, arr)
    got = nifti.load(p)
    assert got.shape == arr.shape
    np.testing.assert_array_equal(got, arr)


def test_roundtrip_2d_and_4d(tmp_path):
    for shape in [(7, 5), (4, 3, 2, 6)]:
        arr = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        p = str(tmp_path / f"v{len(shape)}.nii")
        nifti.save(p, arr)
        np.testing.assert_array_equal(nifti.load(p), arr)


def _pack_nii(arr, bo="<", slope=1.0, inter=0.0, magic=b"n+1\x00"):
    """Hand-built NIfTI-1 bytes, independent of nifti.save."""
    codes = {np.dtype(np.float32): 16, np.dtype(np.int16): 4}
    hdr = bytearray(348)
    struct.pack_into(bo + "i", hdr, 0, 348)
    dim = [arr.ndim] + list(arr.shape) + [1] * (7 - arr.ndim)
    struct.pack_into(bo + "8h", hdr, 40, *dim)
    struct.pack_into(
        bo + "2h", hdr, 70, codes[arr.dtype], arr.dtype.itemsize * 8
    )
    struct.pack_into(bo + "f", hdr, 108, 352.0)
    struct.pack_into(bo + "f", hdr, 112, slope)
    struct.pack_into(bo + "f", hdr, 116, inter)
    hdr[344:348] = magic
    body = arr.astype(arr.dtype.newbyteorder(bo)).tobytes(order="F")
    return bytes(hdr) + b"\x00" * 4 + body


def test_load_independent_header_le(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4) * 0.5
    p = tmp_path / "le.nii"
    p.write_bytes(_pack_nii(arr))
    np.testing.assert_allclose(nifti.load(str(p)), arr)


def test_load_independent_header_be(tmp_path):
    arr = (np.arange(12, dtype=np.int16) - 4).reshape(3, 4)
    p = tmp_path / "be.nii"
    p.write_bytes(_pack_nii(arr, bo=">"))
    np.testing.assert_array_equal(nifti.load(str(p)), arr)


def test_load_applies_scl_scaling(tmp_path):
    arr = np.arange(6, dtype=np.int16).reshape(2, 3)
    p = tmp_path / "scl.nii"
    p.write_bytes(_pack_nii(arr, slope=2.0, inter=-1.0))
    np.testing.assert_allclose(nifti.load(str(p)), arr * 2.0 - 1.0)


def test_load_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.load(str(p))


def _make_tree(tmp_path, n=2, shape=(16, 16, 16), classes=4):
    """imagesTr/image<i>.{nii,npy} + labelsTr siblings with IDENTICAL data.
    .nii labels are 1-based (reference convention: read shifts by -1);
    .npy labels are stored 0-based (read_npy passes through)."""
    rng = np.random.default_rng(3)
    nii_img = tmp_path / "nii" / "imagesTr"
    nii_lab = tmp_path / "nii" / "labelsTr"
    npy_img = tmp_path / "npy" / "imagesTr"
    npy_lab = tmp_path / "npy" / "labelsTr"
    for d in (nii_img, nii_lab, npy_img, npy_lab):
        os.makedirs(d)
    for i in range(n):
        vol = (rng.random(shape) * 100).astype(np.float32)
        lab0 = rng.integers(0, classes, size=shape).astype(np.int64)
        nifti.save(str(nii_img / f"image{i}.nii"), vol)
        nifti.save(str(nii_lab / f"label{i}.nii"), (lab0 + 1).astype(np.int32))
        np.save(npy_img / f"image{i}.npy", vol)
        np.save(npy_lab / f"image{i}.npy", lab0)
    return tmp_path / "nii", tmp_path / "npy"


def test_read_nifti_file_matches_npy_route(tmp_path):
    nii_root, npy_root = _make_tree(tmp_path, n=1)
    d_nii, l_nii = read_nifti_file(
        str(nii_root / "imagesTr" / "image0.nii"), 1, return_label=True
    )
    d_npy, l_npy = read_npy_file(
        str(npy_root / "imagesTr" / "image0.npy"), 1, return_label=True
    )
    np.testing.assert_allclose(d_nii, d_npy, atol=1e-6)
    np.testing.assert_array_equal(l_nii, l_npy)


def _pipeline(root, ext):
    files = sorted(
        str(p) for p in (root / "imagesTr").iterdir() if p.name.endswith(ext)
    )
    fr = FileReader(
        files, 0.0, 1.0, variables=("ct",), return_label=True,
        dataset="basic_ct", read_threads=1,
    )
    tiles = TileIterator3D(fr, 16, 16, 16, twoD=False, return_label=True)
    pc = ProcessChannels(
        tiles, num_channels=1, single_channel=True, return_label=True,
        adaptive_patching=True, separate_channels=False, patch_size=4,
        fixed_length=8, twoD=False, dataset="basic_ct", num_classes=4,
        batch_size=2, rng=np.random.default_rng(11),
    )
    return list(BatchIterator(pc, 2, "basic_ct"))


def test_full_pipeline_nii_equals_npy(tmp_path):
    """FileReader -> TileIterator3D -> Patchify3D -> collate: byte-identical
    batches from .nii and .npy trees holding the same voxels."""
    nii_root, npy_root = _make_tree(tmp_path)
    b_nii = _pipeline(nii_root, ".nii")
    b_npy = _pipeline(npy_root, ".npy")
    assert len(b_nii) == len(b_npy) > 0
    for a, b in zip(b_nii, b_npy):
        assert sorted(a.keys()) == sorted(b.keys())
        for k in a:
            if k == "variables":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k
                )
