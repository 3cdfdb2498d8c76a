"""Data engine tests: trees, transforms, tiling, pipeline, load balancing."""

import numpy as np
import pytest

from ucf_vit_tpu.data.quadtree import FixedQuadTree, Rect, _sat
from ucf_vit_tpu.data.octree import FixedOctTree, resize_3d
from ucf_vit_tpu.data.transform import Patchify, Patchify3D
from ucf_vit_tpu.data.pipeline import (
    BatchIterator,
    ProcessChannels,
    ShuffleBuffer,
    TileIterator2D,
    TileIterator3D,
    collate,
    tile_starts,
)


def test_sat_matches_bruteforce():
    rng = np.random.default_rng(0)
    dom = rng.integers(0, 255, size=(16, 12)).astype(np.uint8)
    sat = _sat(dom)
    r = Rect(2, 9, 3, 14)
    brute = r.contains(dom)
    via_sat = int(
        (sat[r.y2, r.x2] - sat[r.y1, r.x2] - sat[r.y2, r.x1] + sat[r.y1, r.x1]) / 255
    )
    assert brute == via_sat


def test_quadtree_fixed_length_and_serialize():
    rng = np.random.default_rng(0)
    edges = (rng.random((64, 64)) > 0.7).astype(np.uint8) * 255
    qdt = FixedQuadTree(domain=edges, fixed_length=13)
    assert qdt.count_patches() == 13
    img = rng.random((64, 64, 3)).astype(np.float32)
    seq, size, pos = qdt.serialize(img, size=(8, 8, 3))
    assert len(seq) == 13 and len(size) == 13 and len(pos) == 13
    assert all(s.shape[:2] == (8, 8) for s in seq)
    # leaves tile the domain exactly: sizes^2 sum to area
    assert sum(s * s for s in size) == 64 * 64

    # deserialize round trip on a constant image reproduces it
    const = np.full((64, 64, 1), 7.0, np.float32)
    seq2, _, _ = qdt.serialize(const, size=(8, 8, 1))
    flat = np.stack([s.reshape(8, 8, 1) if s.ndim == 3 else s[..., None] for s in seq2])
    recon = qdt.deserialize(flat, 8, 1)
    np.testing.assert_allclose(recon[..., 0], 7.0, atol=1e-5)


def test_quadtree_splits_high_mass_regions():
    edges = np.zeros((32, 32), np.uint8)
    edges[:16, :16] = 255  # all mass in one quadrant
    qdt = FixedQuadTree(domain=edges, fixed_length=7)
    sizes = sorted(r.get_size()[0] for r, _ in qdt.nodes)
    # the busy quadrant should be split finer than the empty ones
    assert sizes[0] < sizes[-1]


def test_octree_fixed_length_and_volume():
    rng = np.random.default_rng(1)
    edges = (rng.random((16, 16, 16)) > 0.5).astype(np.uint8) * 255
    oct_ = FixedOctTree(domain=edges, fixed_length=15, norm_factor=255)
    assert oct_.count_patches() == 15
    assert sum(s * s * s for _, s in [(n, n_.get_size()[0]) for n_, n in oct_.nodes]) or True
    sizes = [c.get_size()[0] for c, _ in oct_.nodes]
    assert sum(s**3 for s in sizes) == 16**3
    vol = rng.random((16, 16, 16, 1)).astype(np.float32)
    seq, size, pos = oct_.serialize(vol, size=(4, 4, 4, 1))
    assert len(seq) == 15


def test_resize_3d_constant():
    v = np.full((4, 4, 4, 2), 3.0)
    out = resize_3d(v, (8, 8, 8))
    np.testing.assert_allclose(out, 3.0, atol=1e-6)


def test_patchify_2d_shapes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
    p = Patchify(fixed_length=13, patch_size=8, num_channels=3,
                 dataset="imagenet", rng=rng)
    seq, size, pos, qdt = p(img)
    assert seq.shape == (3, 13, 64)
    assert size.shape == (13,) and pos.shape == (13, 2)


def test_patchify_3d_shapes():
    rng = np.random.default_rng(0)
    vol = rng.random((16, 16, 16, 1)).astype(np.float32)
    p = Patchify3D(fixed_length=8, patch_size=4, num_channels=1,
                   dataset="basic_ct", rng=rng)
    seq, size, pos, octree = p(vol)
    assert seq.shape == (8, 64)
    assert size.shape == (8,) and pos.shape == (8, 3)


def test_tile_starts_no_overlap():
    assert tile_starts(256, 64, 0.0, False) == [0, 64, 128, 192]
    # uneven without use_all_data: drops the remainder
    assert tile_starts(250, 64, 0.0, False) == [0, 64, 128]
    # with use_all_data: last tile clamped to the end
    s = tile_starts(250, 64, 0.0, True)
    assert s[-1] == 250 - 64 and len(s) == 4


def test_tile_starts_overlap():
    s = tile_starts(128, 64, 0.5, False)
    assert s == [0, 32, 64]  # stride 32, (2-1)*2+1 = 3 blocks


def test_tile_iterator_2d():
    data = np.arange(3 * 128 * 128, dtype=np.float32).reshape(3, 128, 128)
    src = [(data, ("r", "g", "b"))]
    tiles = list(TileIterator2D(src, 64, 64))
    assert len(tiles) == 4
    assert tiles[0][0].shape == (3, 64, 64)


def test_tile_iterator_3d_twoD_slices():
    data = np.random.default_rng(0).random((1, 64, 64, 8)).astype(np.float32)
    label = np.zeros((64, 64, 8), np.int64)
    src = [(data, label, ("v",))]
    tiles = list(TileIterator3D(src, 64, 64, 4, twoD=True, return_label=True))
    assert len(tiles) == 8  # (64/64)^2 * 2 z-chunks * 4 slices each
    t, l, v = tiles[0]
    assert t.shape == (1, 64, 64) and l.shape == (64, 64)


def test_shuffle_buffer_preserves_items():
    items = [(np.full((1, 2, 2), i), ("v",)) for i in range(20)]
    out = list(ShuffleBuffer(items, 5, rng=np.random.default_rng(0)))
    assert len(out) == 20
    got = sorted(int(x[0][0, 0, 0]) for x in out)
    assert got == list(range(20))


def test_process_channels_single_channel_pure_batches():
    rng = np.random.default_rng(0)
    items = [
        (rng.random((3, 32, 32)).astype(np.float32), ("a", "b", "c"))
        for _ in range(4)
    ]
    pc = ProcessChannels(
        items, num_channels=3, single_channel=True, return_label=False,
        adaptive_patching=False, separate_channels=False, patch_size=8,
        fixed_length=0, twoD=True, dataset="basic_ct", batch_size=4, rng=rng,
    )
    batches = list(BatchIterator(pc, 4, "basic_ct"))
    assert len(batches) == 3  # 4 samples x 3 channels / bs 4
    for b in batches:
        assert b["x"].shape == (4, 1, 32, 32)
        assert len(b["variables"]) == 1  # channel-pure


def test_process_channels_adaptive_with_labels():
    rng = np.random.default_rng(0)
    items = [
        (
            rng.random((1, 32, 32)).astype(np.float32),
            rng.integers(0, 4, size=(32, 32)),
            ("ct",),
        )
        for _ in range(2)
    ]
    pc = ProcessChannels(
        items, num_channels=1, single_channel=True, return_label=True,
        adaptive_patching=True, separate_channels=False, patch_size=8,
        fixed_length=7, twoD=True, dataset="basic_ct", num_classes=4,
        batch_size=2, rng=rng,
    )
    batches = list(BatchIterator(pc, 2, "basic_ct"))
    assert len(batches) == 1
    b = batches[0]
    assert b["seq"].shape == (2, 1, 7, 64)
    assert b["seq_size"].shape == (2, 1, 7)
    assert b["seq_pos"].shape == (2, 1, 7, 2)
    assert b["seq_label"].shape == (2, 7, 8, 8)
    assert b["label"].shape == (2, 1, 32, 32)
    # labels stay integers under nearest-neighbor serialization
    assert set(np.unique(b["seq_label"])).issubset(set(range(4)))


def test_load_balancing_synthetic(tmp_path):
    # two datasets with 4:1 volume ratio over 8 ranks
    import os

    for name, n in (("big", 8), ("small", 2)):
        d = tmp_path / name / "imagesTr"
        os.makedirs(d)
        for i in range(n):
            np.save(d / f"image{i}.npy", np.zeros((32, 32, 8), np.float32))

    from ucf_vit_tpu.data.load_balance import calculate_load_balancing

    bpre, groups = calculate_load_balancing(
        dataset="basic_ct",
        dict_root_dirs={"big": str(tmp_path / "big"), "small": str(tmp_path / "small")},
        dict_start_idx={"big": 0, "small": 0},
        dict_end_idx={"big": 1, "small": 1},
        num_channels_used={"big": 1, "small": 1},
        tile_size=[32, 32, 4],
        twoD=False,
        single_channel=True,
        batch_size=2,
        tile_overlap=0.0,
        use_all_data=False,
        data_par_size=8,
    )
    ranks = [int(x) for x in groups.split(":")]
    assert sum(ranks) == 8 and len(ranks) == 2
    assert ranks[0] > ranks[1]  # big dataset gets more ranks
    assert all(v > 0 for v in bpre.values())


def test_catsdogs_dataset(tmp_path):
    from PIL import Image

    from ucf_vit_tpu.data.catsdogs import CatsDogsDataset, catsdogs_loader

    files = []
    rng = np.random.default_rng(0)
    for i, name in enumerate(["cat.0.jpg", "dog.1.jpg", "cat.2.jpg", "dog.3.jpg"]):
        p = tmp_path / name
        Image.fromarray(
            rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)
        ).save(p)
        files.append(str(p))

    ds = CatsDogsDataset(files, ("red", "green", "blue"), (32, 32))
    assert len(ds) == 4
    s = ds[1]
    assert s["x"].shape == (3, 32, 32) and int(s["label"]) == 1

    batches = list(catsdogs_loader(ds, batch_size=2))
    assert len(batches) == 2
    assert batches[0]["x"].shape == (2, 3, 32, 32)

    # adaptive variant
    ds2 = CatsDogsDataset(
        files, ("red", "green", "blue"), (32, 32), adaptive_patching=True,
        fixed_length=7, patch_size=8, num_channels=3,
        rng=np.random.default_rng(0),
    )
    s2 = ds2[0]
    assert s2["seq"].shape == (3, 7, 64)


def test_process_channels_multichannel_adaptive_shapes():
    """Multi-channel (imagenet-style) adaptive: one tree across channels;
    seq [B,C,L,p^2] but seq_size/seq_pos get a singleton channel dim
    (reference collate `datamodule.py:73-75`)."""
    rng = np.random.default_rng(0)
    items = [
        (
            rng.integers(0, 255, (3, 32, 32)).astype(np.uint8),
            np.int64(1),
            ("r", "g", "b"),
        )
        for _ in range(2)
    ]
    pc = ProcessChannels(
        items, num_channels=3, single_channel=False, return_label=True,
        adaptive_patching=True, separate_channels=False, patch_size=8,
        fixed_length=7, twoD=True, dataset="imagenet", batch_size=2,
        rng=rng,
    )
    b = next(iter(BatchIterator(pc, 2, "imagenet")))
    assert b["seq"].shape == (2, 3, 7, 64)
    assert b["seq_size"].shape == (2, 1, 7)
    assert b["seq_pos"].shape == (2, 1, 7, 2)
    assert b["label"].shape == (2,)


def test_process_channels_worker_pool_matches_shapes():
    """num_workers>0 routes patchify through a process pool; output shapes
    and sample count match the in-process path."""
    rng = np.random.default_rng(0)
    items = [
        (rng.random((1, 32, 32)).astype(np.float32), ("ct",)) for _ in range(4)
    ]
    kw = dict(
        num_channels=1, single_channel=True, return_label=False,
        adaptive_patching=True, separate_channels=False, patch_size=8,
        fixed_length=7, twoD=True, dataset="basic_ct", batch_size=2,
    )
    local = list(ProcessChannels(items, rng=np.random.default_rng(1), **kw))
    pooled = list(
        ProcessChannels(items, num_workers=2, rng=np.random.default_rng(1), **kw)
    )
    assert len(local) == len(pooled) == 4
    for a, b in zip(local, pooled):
        assert a["seq"].shape == b["seq"].shape
        np.testing.assert_array_equal(a["x"], b["x"])  # same order


def test_process_channels_return_qdt():
    rng = np.random.default_rng(0)
    items = [(rng.random((1, 32, 32)).astype(np.float32), ("ct",)) for _ in range(2)]
    pc = ProcessChannels(
        items, num_channels=1, single_channel=True, return_label=False,
        adaptive_patching=True, separate_channels=False, patch_size=8,
        fixed_length=7, twoD=True, dataset="basic_ct", batch_size=2,
        return_qdt=True, rng=rng,
    )
    b = next(iter(BatchIterator(pc, 2, "basic_ct")))
    assert len(b["qdt"]) == 2
    assert b["qdt"][0].count_patches() == 7
