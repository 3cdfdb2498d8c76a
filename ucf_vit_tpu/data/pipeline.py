"""Iterator data pipeline: file reading -> tiling -> shuffle -> channel
processing -> batching.

Capability parity with reference `src/UCF_VIT/dataloaders/dataset.py`
(FileReader :16, ImageBlockDataIter_2D :153, ImageBlockDataIter_3D :298,
ShuffleIterableDataset :552, ProcessChannels :573) and the collate_fn in
`datamodule.py:21-185` — rebuilt as plain-numpy composable iterators (no
torch DataLoader; JAX wants host numpy batches, and the reference pinned
num_workers==1 anyway, `datamodule.py:245-248`).

Batches are dicts of numpy arrays with the reference's shapes:
  plain:    {x [B,C,...], (label), variables}
  adaptive: {x [B,C,...], seq [B,C,L,p^d], seq_size [B,C,L],
             seq_pos [B,C,L,2|3], (label, seq_label), variables}
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ucf_vit_tpu.data.transform import Patchify, Patchify3D

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None


# ---------------------------------------------------------------------------
# File reading
# ---------------------------------------------------------------------------


def read_imagenet_file(path: str, resize=(256, 256), return_label=False):
    """JPEG -> [3, H, W] uint8 (+ class index from the parent dir name).
    Parity: `dataset.py:53-71`."""
    from PIL import Image

    data = np.array(Image.open(path).convert("RGB"))
    data = cv.resize(data, dsize=(resize[0], resize[1]))
    data = np.moveaxis(data, -1, 0)
    if not return_label:
        return data
    p = Path(path)
    classes = sorted(os.listdir(p.parent.parent))
    label = {c: i for i, c in enumerate(classes)}[p.parent.stem]
    return data, label


def _load_nifti(path: str) -> np.ndarray:
    """One NIfTI volume as a numpy array: nibabel when importable, else the
    first-party NIfTI-1 reader (data/nifti.py) — same array either way."""
    try:
        import nibabel as nib
    except ImportError:
        nib = None
    if nib is None or not hasattr(nib, "load"):
        # no nibabel, or a test shim registered an empty stand-in module
        from ucf_vit_tpu.data import nifti

        return nifti.load(path)
    return np.array(nib.load(path).dataobj)


def read_nifti_file(path: str, num_channels: int = 1, return_label=False):
    """NIfTI volume, min-max normalized -> [C, ...] f32 (+ label volume from
    the sibling labelsTr dir, shifted to 0-based). Parity: `dataset.py:72-96`."""
    data = _load_nifti(path).astype(np.float32)
    data = (data - data.min()) / (data.max() - data.min())
    if num_channels == 1:
        data = np.expand_dims(data, axis=0)
    if not return_label:
        return data
    p = Path(path)
    stem = p.stem.split("image")[-1]
    label_path = os.path.join(p.parent.parent, "labelsTr", "label" + stem + ".nii")
    label = _load_nifti(label_path).astype(np.int64) - 1
    return data, label


def read_npy_file(path: str, num_channels: int = 1, return_label=False):
    """Plain .npy volume reader (capability-plus: cluster-free testing path).
    Expects image at <root>/imagesTr/x.npy and label at <root>/labelsTr/x.npy."""
    data = np.load(path).astype(np.float32)
    mx, mn = data.max(), data.min()
    if mx > mn:
        data = (data - mn) / (mx - mn)
    if data.ndim in (2, 3) and num_channels == 1:
        data = np.expand_dims(data, axis=0)
    if not return_label:
        return data
    label_path = str(Path(path).parent.parent / "labelsTr" / Path(path).name)
    label = np.load(label_path).astype(np.int64)
    return data, label


class FileReader:
    """Rank-sharded file iterator.

    Parity: `dataset.py:16-151`. The torch worker/dist introspection is
    replaced by explicit (shard_rank, gx / num_shards) arguments — under
    SPMD the trainer passes its data-parallel rank.
    """

    def __init__(
        self,
        file_list: Sequence[str],
        start_idx: float,
        end_idx: float,
        variables: Sequence[str],
        shard_rank: int = 0,
        data_par_size: int = 1,
        gx: Optional[str] = None,
        multi_dataset_training: bool = False,
        return_label: bool = False,
        keys_to_add: int = 1,
        dataset: str = "imagenet",
        imagenet_resize=(256, 256),
        read_threads: int = 4,
    ) -> None:
        s = int(start_idx * len(file_list))
        e = int(end_idx * len(file_list))
        self.file_list = list(file_list[s:e])
        self.read_threads = read_threads
        self.variables = list(variables)
        self.num_channels_available = len(variables)
        self.shard_rank = shard_rank
        self.data_par_size = data_par_size
        self.gx = gx
        self.multi_dataset_training = multi_dataset_training
        self.return_label = return_label
        self.keys_to_add = keys_to_add
        self.dataset = dataset
        self.imagenet_resize = imagenet_resize

    def read_process_file(self, path: str):
        if self.dataset in ("imagenet", "catsdogs"):
            return read_imagenet_file(path, self.imagenet_resize, self.return_label)
        if path.endswith(".npy"):
            return read_npy_file(path, self.num_channels_available, self.return_label)
        return read_nifti_file(path, self.num_channels_available, self.return_label)

    def _shard_bounds(self) -> Tuple[int, int]:
        """Map this rank to its file range. Parity: `dataset.py:99-139`."""
        if self.multi_dataset_training and self.gx:
            group_list = [int(x) for x in self.gx.split(":")]
            cum = np.cumsum(group_list)
            group_id = int(np.where(cum > self.shard_rank)[0][0])
            group_size = group_list[group_id]
            group_rank = self.shard_rank - ([0] + cum.tolist())[group_id]
            num_shards, rank = group_size, group_rank
        else:
            num_shards, rank = self.data_par_size, self.shard_rank
        per_worker = int(
            math.floor(len(self.file_list) / float(self.keys_to_add) / num_shards)
        )
        if per_worker == 0:
            self.file_list = (
                self.file_list * math.ceil(num_shards / len(self.file_list))
            )[:num_shards]
            per_worker = 1
        start = rank * per_worker
        return start, start + per_worker

    def _indices(self):
        iter_start, iter_end = self._shard_bounds()
        per_key = int(len(self.file_list) / self.keys_to_add)
        for m in range(self.keys_to_add):
            yield from range(iter_start + m * per_key, iter_end + m * per_key)

    def __iter__(self) -> Iterator:
        """Reads run through a thread read-ahead window: decode (PIL/cv2,
        GIL-releasing) overlaps across files — a >1-worker capability the
        reference's DataLoader pin forbids (`datamodule.py:245-248`)."""
        if self.read_threads <= 1:
            for idx in self._indices():
                yield self._emit(self.read_process_file(self.file_list[idx]))
            return

        import collections
        from concurrent.futures import ThreadPoolExecutor

        window = 2 * self.read_threads
        with ThreadPoolExecutor(max_workers=self.read_threads) as pool:
            pending = collections.deque()
            for idx in self._indices():
                pending.append(
                    pool.submit(self.read_process_file, self.file_list[idx])
                )
                while len(pending) >= window:
                    yield self._emit(pending.popleft().result())
            while pending:
                yield self._emit(pending.popleft().result())

    def _emit(self, out):
        if self.return_label:
            data, label = out
            return data, label, self.variables
        return out, self.variables


# ---------------------------------------------------------------------------
# Tiling
# ---------------------------------------------------------------------------


def tile_starts(length: int, tile: int, overlap: float, use_all_data: bool) -> List[int]:
    """Start offsets of tiles along one axis, replicating the reference's
    block counting (`dataset.py:169-296`): evenly spaced tiles with overlap
    step, plus (use_all_data) clamped end tiles covering the remainder."""
    ov = int(tile * overlap)
    if ov == 0:
        otp2 = 1
        step = tile
    else:
        otp2 = int(tile / ov)
        step = tile - ov
    tte = length // tile
    num_blocks = (tte - 1) * otp2 + 1
    if use_all_data:
        tt = length / tile
        ltop = math.floor((tt - tte) * otp2)
        if ov == 0:
            if length % tile != 0:
                ltop += 1
        else:
            if length % ov != 0:
                ltop += 1
        num_blocks = int(num_blocks + ltop)
    starts = []
    for i in range(num_blocks):
        s = i * step
        if s + tile > length - 1 and use_all_data:
            s = length - tile  # clamp to the end (back-off logic)
        if not use_all_data or s + tile <= length:
            starts.append(min(s, length - tile))
    return starts


class TileIterator2D:
    """Slice [C, X, Y] images into [C, tx, ty] tiles.
    Parity: ImageBlockDataIter_2D (`dataset.py:153-296`)."""

    def __init__(self, source, tile_size_x, tile_size_y, return_label=False,
                 tile_overlap=0.0, use_all_data=False, classification=False):
        self.source = source
        self.tx, self.ty = tile_size_x, tile_size_y
        self.return_label = return_label
        self.tile_overlap = tile_overlap
        self.use_all_data = use_all_data
        self.classification = classification

    def __iter__(self):
        for item in self.source:
            if self.return_label:
                data, label, variables = item
            else:
                data, variables = item
                label = None
            xs = tile_starts(data.shape[1], self.tx, self.tile_overlap, self.use_all_data)
            ys = tile_starts(data.shape[2], self.ty, self.tile_overlap, self.use_all_data)
            for sx in xs:
                for sy in ys:
                    tile = data[:, sx : sx + self.tx, sy : sy + self.ty]
                    if label is None:
                        yield tile, variables
                    elif self.classification:
                        yield tile, label, variables
                    else:
                        yield tile, label[sx : sx + self.tx, sy : sy + self.ty], variables


class TileIterator3D:
    """Slice [C, X, Y, Z] volumes into tiles; twoD=True yields 2D slices from
    each z-chunk. Parity: ImageBlockDataIter_3D (`dataset.py:298-550`)."""

    def __init__(self, source, tile_size_x, tile_size_y, tile_size_z, twoD=True,
                 return_label=False, tile_overlap=0.0, use_all_data=False):
        self.source = source
        self.tx, self.ty, self.tz = tile_size_x, tile_size_y, tile_size_z
        self.twoD = twoD
        self.return_label = return_label
        self.tile_overlap = tile_overlap
        self.use_all_data = use_all_data

    def __iter__(self):
        for item in self.source:
            if self.return_label:
                data, label, variables = item
            else:
                data, variables = item
                label = None
            xs = tile_starts(data.shape[1], self.tx, self.tile_overlap, self.use_all_data)
            ys = tile_starts(data.shape[2], self.ty, self.tile_overlap, self.use_all_data)
            if self.twoD:
                zlen = data.shape[3]
                zs = range(zlen) if self.use_all_data else range(
                    (zlen // self.tz) * self.tz
                )
                for sx in xs:
                    for sy in ys:
                        for z in zs:
                            tile = data[:, sx : sx + self.tx, sy : sy + self.ty, z]
                            if label is None:
                                yield tile, variables
                            else:
                                yield tile, label[
                                    sx : sx + self.tx, sy : sy + self.ty, z
                                ], variables
            else:
                zs = tile_starts(data.shape[3], self.tz, self.tile_overlap, self.use_all_data)
                for sx in xs:
                    for sy in ys:
                        for sz in zs:
                            sl = (
                                slice(sx, sx + self.tx),
                                slice(sy, sy + self.ty),
                                slice(sz, sz + self.tz),
                            )
                            tile = data[(slice(None),) + sl]
                            if label is None:
                                yield tile, variables
                            else:
                                yield tile, label[sl], variables


# ---------------------------------------------------------------------------
# Shuffle + channel processing + batching
# ---------------------------------------------------------------------------


class ShuffleBuffer:
    """Reservoir-style shuffle. Parity: ShuffleIterableDataset
    (`dataset.py:552-571`) with an explicit seedable Generator."""

    def __init__(self, source, buffer_size: int, rng: Optional[np.random.Generator] = None):
        assert buffer_size > 0
        self.source = source
        self.buffer_size = buffer_size
        self.rng = rng or np.random.default_rng()

    def __iter__(self):
        buf = []
        for x in self.source:
            if len(buf) == self.buffer_size:
                idx = int(self.rng.integers(0, self.buffer_size))
                yield buf[idx]
                buf[idx] = x
            else:
                buf.append(x)
        order = self.rng.permutation(len(buf))
        for i in order:
            yield buf[i]


class ProcessChannels:
    """Split channels into per-variable streams (single_channel mode), run
    adaptive patchify, serialize labels. Parity: `dataset.py:573-787`.

    Yields per-sample tuples; see `collate` for batch assembly.
    """

    def __init__(self, source, num_channels: int, single_channel: bool,
                 return_label: bool, adaptive_patching: bool,
                 separate_channels: bool, patch_size: int, fixed_length: int,
                 twoD: bool, dataset: str, num_classes: Optional[int] = None,
                 batch_size: int = 1,
                 num_workers: int = 0,
                 return_qdt: bool = False,
                 rng: Optional[np.random.Generator] = None,
                 aug_seed: Optional[int] = None):
        self.source = source
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.return_qdt = return_qdt
        # aug_seed: per-SAMPLE augmentation RNG — sample i's patchify draws
        # come from SeedSequence([aug_seed, i]) regardless of worker count or
        # skipping. Decouples augmentation from the chain rng (which the
        # ShuffleBuffer owns exclusively) and makes num_workers>1 runs
        # reproducible (pool workers previously seeded from os.getpid()).
        # None keeps the legacy shared-rng behavior.
        self.aug_seed = aug_seed
        # samples to fast-forward past (mid-epoch resume): the upstream
        # chain (read -> tile -> shuffle) runs normally so its state stays
        # bit-identical, but the expensive per-sample transform (adaptive
        # patchify + label serialization) is bypassed and a None placeholder
        # is emitted for BatchIterator to collapse into None batches.
        self.skip_samples = 0
        self._next_idx = 0
        self.num_channels = num_channels
        self.single_channel = single_channel
        self.return_label = return_label
        self.adaptive_patching = adaptive_patching
        self.separate_channels = separate_channels
        self.patch_size = patch_size
        self.fixed_length = fixed_length
        self.twoD = twoD
        self.dataset = dataset
        self.num_classes = num_classes
        if adaptive_patching:
            nc = 1 if (single_channel or separate_channels) else num_channels
            cls = Patchify if twoD else Patchify3D
            self.patchify = cls(
                fixed_length=fixed_length, patch_size=patch_size,
                num_channels=nc, dataset=dataset, rng=rng,
            )

    def _serialize_label(self, qdt, np_label):
        p = self.patch_size
        if self.twoD:
            size = (p, p, 1)
        else:
            size = (p, p, p, 1)
        if self.dataset == "basic_ct":
            seq_label, _, _ = qdt.serialize_labels(
                np.expand_dims(np_label, axis=-1), size=size
            )
            out = np.asarray(seq_label)
            # strip the singleton channel if present ([L, *p^nd, 1]); 2D
            # cv.resize already drops it, the 3D path keeps it
            if out.ndim == (2 if self.twoD else 3) + 2:
                out = out[..., 0]
            return out  # [L, p, p(, p)]
        seq_label, _, _ = qdt.serialize(np.expand_dims(np_label, axis=-1), size=size)
        return np.asarray(seq_label, dtype=np.float32).reshape(self.fixed_length, -1)

    def _patchify_sample(self, np_image):
        """np_image: [C, *spatial] -> (seq [C?, L, p^d], size, pos, qdt)."""
        if self.single_channel or self.separate_channels:
            chans = [
                self.patchify(np.expand_dims(np_image[j], axis=-1))
                for j in range(np_image.shape[0])
            ]
            if len(chans) == 1:
                return chans[0]
            seq = np.stack([c[0] for c in chans])
            size = np.stack([c[1] for c in chans])
            pos = np.stack([c[2] for c in chans])
            return seq, size, pos, [c[3] for c in chans]
        return self.patchify(np.moveaxis(np_image, 0, -1))

    def _make_sample(self, np_image, vars_out, label, idx=None):
        if self.adaptive_patching and self.aug_seed is not None and idx is not None:
            # per-sample augmentation stream: identical whether the sample is
            # transformed in-process, in any pool worker, or after a skip
            self.patchify.rng = np.random.default_rng(
                np.random.SeedSequence([self.aug_seed, int(idx)])
            )
        sample = {"x": np.asarray(np_image, dtype=np.float32),
                  "variables": vars_out}
        if self.adaptive_patching:
            seq, size, pos, qdt = self._patchify_sample(np_image)
            if seq.ndim == 2:  # single-channel patchify: [L, p^d]
                seq = seq[None]
            size = np.asarray(size, dtype=np.float32)
            pos = np.asarray(pos, dtype=np.float32)
            if size.ndim == 1:
                # one tree across all channels: add the channel dim the
                # reference collate adds via expand_dims (`datamodule.py:73-75`)
                size, pos = size[None], pos[None]
            sample["seq"] = seq.astype(np.float32)
            sample["seq_size"] = size
            sample["seq_pos"] = pos
            if self.return_qdt:
                # tree objects for visualization/deserialization (parity:
                # the reference's return_qdt collate outputs,
                # `datamodule.py:110-122`); host-side only, never jitted
                sample["qdt"] = qdt
            if label is not None and self.dataset != "imagenet":
                qdt_ = qdt[0] if isinstance(qdt, list) else qdt
                sample["seq_label"] = self._serialize_label(qdt_, label)
        if label is not None:
            sample["label"] = (
                np.asarray(label)
                if np.ndim(label) > 0
                else np.asarray(label, dtype=np.int64)
            )
        return sample

    # ----------------------------------------------------- parallel workers

    def _spec(self) -> dict:
        return dict(
            num_channels=self.num_channels,
            single_channel=self.single_channel,
            return_label=self.return_label,
            adaptive_patching=self.adaptive_patching,
            separate_channels=self.separate_channels,
            patch_size=self.patch_size,
            fixed_length=self.fixed_length,
            twoD=self.twoD,
            dataset=self.dataset,
            num_classes=self.num_classes,
            batch_size=self.batch_size,
            return_qdt=self.return_qdt,
            aug_seed=self.aug_seed,
        )

    def _indexed_raw(self):
        """Raw samples tagged with their global consumption index; samples
        covered by skip_samples come out as None (their upstream work —
        read, tile, shuffle — has already run, keeping chain state exact)."""
        for item in self._raw_samples():
            idx = self._next_idx
            self._next_idx += 1
            if self.skip_samples > 0:
                self.skip_samples -= 1
                yield None
            else:
                yield (*item, idx)

    def __iter__(self):
        """Stream samples; with num_workers > 0 the patchify/serialize work
        runs in a process pool (the reference hard-caps num_workers at 1,
        `datamodule.py:245-248`; host-side patchify is the input bottleneck
        for feeding TPUs, SURVEY.md §3.3 hot-loops)."""
        if self.num_workers <= 0 or not self.adaptive_patching:
            yield from self._iter_local()
            return

        import collections
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        window = 2 * self.num_workers
        with ProcessPoolExecutor(
            max_workers=self.num_workers,
            # spawn: never fork a process holding a live TPU/JAX client
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_pool_init,
            initargs=(self._spec(),),
        ) as pool:
            pending = collections.deque()
            for args in self._indexed_raw():
                if args is None:
                    # skipped sample: flush in-flight work first so emission
                    # order matches consumption order, then emit the marker
                    while pending:
                        yield pending.popleft().result()
                    yield None
                    continue
                pending.append(pool.submit(_pool_make_sample, args))
                while len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()

    def _iter_local(self):
        for item in self._indexed_raw():
            yield None if item is None else self._make_sample(*item)

    def _raw_samples(self):
        # single_channel mode buffers each variable's stream and flushes a
        # full batch of ONE variable at a time, so every downstream batch is
        # channel-pure (parity: `dataset.py:611-640` buffer-per-channel flush).
        num_buffers = self.num_channels if self.single_channel else 1
        buffers = [[] for _ in range(num_buffers)]

        for item in self.source:
            if self.return_label:
                data, label, variables = item
            else:
                data, variables = item
                label = None

            for i in range(num_buffers):
                if self.single_channel:
                    buffers[i].append((data[i : i + 1], (variables[i],), label))
                else:
                    buffers[i].append((data, tuple(variables), label))
                if len(buffers[i]) == self.batch_size:
                    while buffers[i]:
                        yield buffers[i].pop()


_POOL_PC: Optional[ProcessChannels] = None


def _pool_init(spec: dict) -> None:
    """Worker-process initializer: build a source-less ProcessChannels. With
    aug_seed set (the DataModule path) every sample's augmentation draws are
    a pure function of its index — identical across worker counts; the
    per-process RNG is only the fallback for aug_seed=None callers."""
    global _POOL_PC
    _POOL_PC = ProcessChannels(
        source=None, rng=np.random.default_rng(os.getpid()), **spec
    )


def _pool_make_sample(args):
    img, vars_out, lbl, idx = args
    return _POOL_PC._make_sample(img, vars_out, lbl, idx)


def collate(samples: List[dict], dataset: str) -> dict:
    """Stack sample dicts into a numpy batch. Shape parity with the
    reference collate_fn (`datamodule.py:21-185`): x [B,C,...];
    seq/seq_size/seq_pos keep the channel dim; labels stack; basic_ct
    labels get a leading channel dim."""
    batch = {"variables": samples[0]["variables"]}
    batch["x"] = np.stack([s["x"] for s in samples])
    for key in ("seq", "seq_size", "seq_pos"):
        if key in samples[0]:
            batch[key] = np.stack([s[key] for s in samples])
    if "label" in samples[0]:
        labels = [s["label"] for s in samples]
        if dataset == "basic_ct" and labels[0].ndim > 0:
            labels = [np.expand_dims(l, axis=0) for l in labels]
        batch["label"] = np.stack(labels)
    if "seq_label" in samples[0]:
        batch["seq_label"] = np.stack([s["seq_label"] for s in samples])
    if "qdt" in samples[0]:
        batch["qdt"] = [s["qdt"] for s in samples]
    return batch


class BatchIterator:
    """Group sample dicts into batches of batch_size (drop_last=True,
    parity: `datamodule.py:515-522`)."""

    def __init__(self, source, batch_size: int, dataset: str):
        self.source = source
        self.batch_size = batch_size
        self.dataset = dataset

    def __iter__(self):
        buf, skipped = [], 0
        for s in self.source:
            if s is None:  # skipped sample (mid-epoch fast-forward)
                assert not buf, (
                    "skip boundary not aligned to a batch boundary — "
                    "skip_samples must be a multiple of batch_size"
                )
                skipped += 1
                if skipped == self.batch_size:
                    yield None
                    skipped = 0
                continue
            assert skipped == 0, (
                "real sample arrived inside a skipped batch — skip_samples "
                "must be a multiple of batch_size"
            )
            buf.append(s)
            if len(buf) == self.batch_size:
                yield collate(buf, self.dataset)
                buf = []
