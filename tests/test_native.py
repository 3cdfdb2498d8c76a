"""Native C++ patchtree kernels vs the numpy reference implementation."""

import numpy as np
import pytest

import ucf_vit_tpu.native as native
from ucf_vit_tpu.data.octree import FixedOctTree, resize_3d
from ucf_vit_tpu.data.quadtree import FixedQuadTree


def _have_native():
    return native.get_lib() is not None


pytestmark = pytest.mark.skipif(
    not _have_native(), reason="native toolchain unavailable"
)


def _numpy_tree(cls, *args, monkeypatch=None, **kw):
    """Build with the numpy fallback by disabling the native lib."""
    orig = native.get_lib
    native.get_lib = lambda: None
    try:
        return cls(*args, **kw)
    finally:
        native.get_lib = orig


def test_quadtree_native_matches_numpy():
    rng = np.random.default_rng(0)
    for seed in range(3):
        edges = (
            np.random.default_rng(seed).random((64, 64)) > 0.7
        ).astype(np.uint8) * 255
        t_native = FixedQuadTree(domain=edges, fixed_length=49)
        t_numpy = _numpy_tree(FixedQuadTree, domain=edges, fixed_length=49)
        assert len(t_native.nodes) == len(t_numpy.nodes)
        for (ra, va), (rb, vb) in zip(t_native.nodes, t_numpy.nodes):
            assert ra.get_coord() == rb.get_coord()
            assert va == vb


def test_octree_native_matches_numpy():
    for seed in range(2):
        edges = (
            np.random.default_rng(seed).random((16, 16, 16)) > 0.6
        ).astype(np.uint8) * 255
        t_native = FixedOctTree(domain=edges, fixed_length=29, norm_factor=255)
        t_numpy = _numpy_tree(
            FixedOctTree, domain=edges, fixed_length=29, norm_factor=255
        )
        assert len(t_native.nodes) == len(t_numpy.nodes)
        for (ca, va), (cb, vb) in zip(t_native.nodes, t_numpy.nodes):
            assert ca.get_coord() == cb.get_coord()
            assert va == vb


def test_resize3d_native_matches_numpy():
    rng = np.random.default_rng(0)
    for n, m in ((8, 4), (4, 8), (2, 4), (16, 4)):
        vol = rng.random((n, n, n, 2)).astype(np.float32)
        ref = resize_3d(vol, (m, m, m), nearest=False)
        out = native.resize3d_native(vol, m, nearest=False)
        np.testing.assert_allclose(out, ref, atol=1e-5)
        ref_n = resize_3d(vol, (m, m, m), nearest=True)
        out_n = native.resize3d_native(vol, m, nearest=True)
        np.testing.assert_allclose(out_n, ref_n, atol=0)
