"""Cats-vs-dogs map-style smoke-test dataset (CPU-runnable end-to-end path).

Capability parity with reference `src/UCF_VIT/datasets/catsdogs.py`:
filename-prefix labels (dog=1, cat=0), resize to tile_size, optional
adaptive patchify; plus the shard/shuffle/batch logic the reference got from
torch DistributedSampler + DataLoader.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ucf_vit_tpu.data.pipeline import collate
from ucf_vit_tpu.data.transform import Patchify

try:
    import cv2 as cv
except ImportError:  # pragma: no cover
    cv = None


def list_file_split(root: str, start_frac: float, end_frac: float) -> list:
    """List the *.jpg files under ``root`` and return the
    [start_frac, end_frac) slice of a DETERMINISTIC fixed-seed permutation.

    The permutation matters: sorted() puts every cat.N.jpg before every
    dog.N.jpg, so a contiguous fraction of the sorted list is single-class
    — a 0.75/0.25 train/val split would hold out only dogs and val_accuracy
    would measure nothing. A fixed-seed shuffle (independent of
    trainer.seed, so split MEMBERSHIP never changes across runs or resumes)
    stratifies every fraction. The reference never splits this directory
    (`train_class_simple_torchDataloader.py:229` globs all files for
    training); the split is this framework's val_every support.
    """
    import glob
    import os

    files = sorted(glob.glob(os.path.join(root, "*.jpg")))
    perm = np.random.RandomState(0).permutation(len(files))
    files = [files[i] for i in perm]
    return files[int(start_frac * len(files)) : int(end_frac * len(files))]


class CatsDogsDataset:
    def __init__(
        self,
        file_list: Sequence[str],
        variables: Sequence[str],
        tile_size,
        twoD: bool = True,
        adaptive_patching: bool = False,
        fixed_length: int = 196,
        patch_size: int = 16,
        num_channels: int = 3,
        dataset: str = "catsdogs",
        rng: Optional[np.random.Generator] = None,
    ):
        self.file_list = list(file_list)
        self.variables = tuple(variables)
        self.tile_size = tile_size
        self.adaptive_patching = adaptive_patching
        self.fixed_length = fixed_length
        self.patch_size = patch_size
        self.num_channels = num_channels
        if adaptive_patching:
            assert twoD, "catsdogs is 2D"
            self.patchify = Patchify(
                fixed_length=fixed_length,
                patch_size=patch_size,
                num_channels=num_channels,
                dataset=dataset,
                rng=rng,
            )

    def __len__(self) -> int:
        return len(self.file_list)

    def __getitem__(self, idx: int) -> dict:
        from PIL import Image

        path = self.file_list[idx]
        img = np.array(Image.open(path).convert("RGB"))
        img = cv.resize(img, dsize=(self.tile_size[0], self.tile_size[1]))
        name = path.split("/")[-1].split(".")[0]
        label = 1 if name == "dog" else 0

        sample = {
            "x": np.moveaxis(img, -1, 0).astype(np.float32),
            "label": np.asarray(label, dtype=np.int64),
            "variables": self.variables,
        }
        if self.adaptive_patching:
            seq_img, seq_size, seq_pos, _ = self.patchify(img)
            sample["seq"] = np.asarray(seq_img, np.float32)
            sample["seq_size"] = np.asarray(seq_size, np.float32)[None]
            sample["seq_pos"] = np.asarray(seq_pos, np.float32)[None]
        return sample


def catsdogs_loader(
    ds: CatsDogsDataset,
    batch_size: int,
    shard_rank: int = 0,
    num_shards: int = 1,
    seed: int = 0,
    shuffle: bool = True,
    skip_batches: int = 0,
) -> Iterator[dict]:
    """Sharded, shuffled, drop-last batch iterator — the role torch's
    DistributedSampler + DataLoader play in the reference
    (`train_class_simple_torchDataloader.py:237-240`).

    skip_batches (mid-epoch resume): the permutation is a pure function of
    `seed`, so starting at batch N reproduces the uninterrupted stream's
    batches[N:] without decoding the skipped files."""
    idx = np.arange(len(ds))
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    idx = idx[shard_rank::num_shards]
    n_batches = len(idx) // batch_size
    for b in range(int(skip_batches), n_batches):
        samples = [ds[int(i)] for i in idx[b * batch_size : (b + 1) * batch_size]]
        yield collate(samples, "catsdogs")
