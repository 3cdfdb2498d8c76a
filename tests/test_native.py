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


def test_gaussian3d_native_bitexact_scipy():
    """gaussian3d must be BIT-exact with the scipy fallback it replaces
    (transform.py Patchify3D._edge_volume feeds its output into Canny
    thresholding, where any FP wobble flips edge pixels)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    vol = rng.random((12, 13, 14, 2)).astype(np.float32)
    for sigma in (1.0, 2.0, 5.0):
        out = native.gaussian3d_native(vol, sigma)
        assert out is not None
        ref = gaussian_filter(vol, sigma=(sigma, sigma, sigma, 0))
        np.testing.assert_array_equal(out, ref)


def test_octree_serialize_native_matches_per_leaf():
    """Batched octree serialization == the per-leaf fallback path, for both
    trilinear (images) and nearest (labels) resampling, incl. padding."""
    rng = np.random.default_rng(1)
    edges = (rng.random((8, 8, 8)) > 0.6).astype(np.uint8) * 255
    img = rng.random((8, 8, 8, 2)).astype(np.float32)
    # an 8^3 domain bottoms out at 64 side-2 leaves, so fixed_length=71
    # leaves 7 rows of padding to exercise
    tree = FixedOctTree(domain=edges, fixed_length=71, norm_factor=255)
    assert tree.count_patches() == 64  # padding exercised

    for nearest in (False, True):
        got = tree._serialize(img, (4, 4, 4, 2), nearest=nearest)
        assert isinstance(got[0], np.ndarray)  # native batched path taken

        orig = native.get_lib
        native.get_lib = lambda: None
        try:
            ref = tree._serialize(img, (4, 4, 4, 2), nearest=nearest)
        finally:
            native.get_lib = orig

        tol = 0 if nearest else 1e-5
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0], np.float32), atol=tol)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2], np.float64))


def test_patchify3d_native_matches_fallback_end_to_end():
    """Patchify3D through the real __call__ with native kernels enabled vs
    fully disabled: identical sequences, sizes, centers, and edge volumes."""
    from ucf_vit_tpu.data.transform import Patchify3D

    rng = np.random.default_rng(2)
    img = rng.random((32, 32, 32, 1)).astype(np.float32)

    def run():
        p = Patchify3D(
            fixed_length=36, patch_size=4, num_channels=1,
            dataset="basic_ct", rng=np.random.default_rng(7),
            return_edges=True,
        )
        return p(img.copy())

    seq_a, size_a, pos_a, _, edges_a = run()
    orig = native.get_lib
    native.get_lib = lambda: None
    try:
        seq_b, size_b, pos_b, _, edges_b = run()
    finally:
        native.get_lib = orig
    np.testing.assert_array_equal(edges_a, edges_b)
    np.testing.assert_array_equal(np.asarray(size_a), np.asarray(size_b))
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_allclose(seq_a, np.asarray(seq_b, np.float32), atol=1e-5)


def test_tree_build_overshoot_no_corruption():
    """fixed_length values where (L-1) isn't a multiple of the per-split leaf
    delta make the build loop overshoot (count ends in (L, L+6] for octrees,
    (L, L+2] for quadtrees) — same semantics as the numpy fallback. The
    native wrapper must size its buffers for that, not corrupt the heap."""
    rng = np.random.default_rng(3)
    edges3 = (rng.random((16, 16, 16)) > 0.5).astype(np.uint8) * 255
    t3 = FixedOctTree(domain=edges3, fixed_length=80, norm_factor=255)
    t3_np = _numpy_tree(FixedOctTree, domain=edges3, fixed_length=80, norm_factor=255)
    assert t3.count_patches() == t3_np.count_patches() == 85

    edges2 = (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
    t2 = FixedQuadTree(domain=edges2, fixed_length=48)
    t2_np = _numpy_tree(FixedQuadTree, domain=edges2, fixed_length=48)
    assert len(t2.nodes) == len(t2_np.nodes) == 49
