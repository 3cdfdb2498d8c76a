"""DataModule: multi-source datasets, dataset step-scheduling,
epoch reshuffles, batch iterator.

Capability parity with reference NativePytorchDataModule
(`src/UCF_VIT/dataloaders/datamodule.py:187-523`): multi-dataset training
weighted by the load-balanced group list (gx), keys_to_add file re-listing
so small datasets refill while large ones finish an epoch
(`datamodule.py:436-489`), per-epoch reset, drop-last batching.

TPU-native redesign of the multi-dataset mapping: the reference assigns
disjoint RANK groups to datasets (one torch process per GPU; each rank
loops over its own dataset, `dataset.py:122-139`). Under SPMD one JAX
process hosts many devices and every step is one global program, so
datasets are scheduled across STEPS instead: each step the WHOLE mesh
trains one dataset, chosen by a deterministic weighted round-robin with the
same group-list weights. Per epoch, dataset k contributes
iterations * group_k / data_par_size steps of the full global batch =
iterations * batch * group_k samples — exactly the reference's per-dataset
totals. File sharding is per-PROCESS (every process reads 1/num_procs of
each dataset), which also fixes the rank-vs-process mismatch that starved
multi-device single-process runs down to 1/data_par of the data.

Torch DataLoader is replaced by composable numpy iterators plus an optional
background-thread prefetcher (the reference pinned num_workers==1 anyway,
`datamodule.py:245-248`; host-side prefetch is the TPU-idiomatic way to
overlap input with device steps).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from ucf_vit_tpu.data.load_balance import process_root_dirs
from ucf_vit_tpu.data.pipeline import (
    BatchIterator,
    FileReader,
    ProcessChannels,
    ShuffleBuffer,
    TileIterator2D,
    TileIterator3D,
)


class Prefetcher:
    """Background-thread batch prefetch (depth-bounded)."""

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: list = []  # worker exception, re-raised on the consumer side

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — must not turn a
                err.append(e)  # reader crash into a silent short epoch
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                break
            yield item


class DataModule:
    def __init__(
        self,
        dict_root_dirs: Dict,
        dict_start_idx: Dict,
        dict_end_idx: Dict,
        dict_buffer_sizes: Dict,
        dict_in_variables: Dict,
        num_channels_used: Dict,
        batch_size: int = 64,
        patch_size: int = 16,
        tile_size_x: int = 64,
        tile_size_y: int = 64,
        tile_size_z: Optional[int] = None,
        twoD: bool = True,
        single_channel: bool = False,
        dataset_group_list: str = "",
        batches_per_rank_epoch: Optional[Dict] = None,
        tile_overlap: float = 0.0,
        use_all_data: bool = False,
        adaptive_patching: bool = False,
        fixed_length: int = 4096,
        separate_channels: bool = False,
        data_par_size: int = 1,
        dataset: str = "imagenet",
        return_label: bool = False,
        num_classes: Optional[int] = None,
        imagenet_resize: Optional[Dict] = None,
        proc_rank: int = 0,
        num_procs: int = 1,
        seed: int = 0,
        prefetch: int = 2,
        num_workers: int = 0,
        return_qdt: bool = False,
    ):
        assert len(dict_root_dirs) <= data_par_size, (
            "need at least one data-parallel rank per dataset"
        )
        if dataset_group_list == "":
            per = data_par_size // len(dict_root_dirs)
            self.gx = ":".join([str(per)] * len(dict_root_dirs))
        else:
            self.gx = dataset_group_list

        self.dict_root_dirs = dict_root_dirs
        self.dict_start_idx = dict_start_idx
        self.dict_end_idx = dict_end_idx
        self.dict_buffer_sizes = dict_buffer_sizes
        self.dict_in_variables = {
            k: list(v) for k, v in dict_in_variables.items() if v is not None
        }
        self.num_channels_used = num_channels_used
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.tile_size = (tile_size_x, tile_size_y, tile_size_z)
        self.twoD = twoD
        self.single_channel = single_channel
        self.batches_per_rank_epoch = batches_per_rank_epoch or {}
        self.tile_overlap = tile_overlap
        self.use_all_data = use_all_data
        self.adaptive_patching = adaptive_patching
        self.fixed_length = fixed_length
        self.separate_channels = separate_channels
        self.data_par_size = data_par_size
        self.dataset = dataset
        self.return_label = return_label
        self.num_classes = num_classes
        self.imagenet_resize = imagenet_resize or {"imagenet": (256, 256)}
        self.proc_rank = proc_rank
        self.num_procs = num_procs
        # batches carry the host-side tree objects for deserialization /
        # visualization (reference return_qdt collate, `datamodule.py:110-122`)
        self.return_qdt = return_qdt
        assert 0 <= proc_rank < num_procs
        self.prefetch = prefetch
        # reference semantics: num_workers==1 is the pinned single-worker
        # DataLoader (in-process here); >1 enables the patchify process pool
        self.num_workers = max(int(num_workers) - 1, 0)
        self._epoch = 0
        self._seed = seed

        if dataset == "basic_ct" and return_label:
            assert num_classes is not None, "segmentation needs num_classes"

        # imagenet: classes are pre-grouped into num_procs shards and each
        # process consumes its own shard chain (key == proc_rank); other
        # datasets get one file list per dataset key, sharded per-process
        # inside FileReader.
        self.dict_lister_trains = process_root_dirs(
            dataset, dict_root_dirs, num_procs
        )
        if dataset == "imagenet":
            self.dict_lister_trains = {
                proc_rank: self.dict_lister_trains[proc_rank]
            }
        self.dict_data_train: Optional[Dict] = None

    # ------------------------------------------------------------------ setup

    @property
    def max_balance(self) -> int:
        if self.dataset == "imagenet":
            return self.batches_per_rank_epoch.get("imagenet", 0)
        return max(self.batches_per_rank_epoch.values(), default=0)

    def _keys_to_add(self, k) -> int:
        if self.dataset == "imagenet" or not self.batches_per_rank_epoch:
            return 1
        return int(np.ceil(self.max_balance / self.batches_per_rank_epoch[k]))

    def _build_chain(self, k, file_list, keys_to_add, rng):
        key = "imagenet" if self.dataset == "imagenet" else k
        variables = self.dict_in_variables[key]
        # imagenet chains are already per-process class shards; everything
        # else splits its file list across processes here
        shards = 1 if self.dataset == "imagenet" else self.num_procs
        rank = 0 if self.dataset == "imagenet" else self.proc_rank
        reader = FileReader(
            file_list,
            start_idx=self.dict_start_idx[key],
            end_idx=self.dict_end_idx[key],
            variables=variables,
            shard_rank=rank,
            data_par_size=shards,
            return_label=self.return_label,
            keys_to_add=keys_to_add,
            dataset=self.dataset,
            imagenet_resize=self.imagenet_resize.get("imagenet", (256, 256)),
        )
        tx, ty, tz = self.tile_size
        if self.dataset in ("imagenet", "catsdogs"):
            tiles = TileIterator2D(
                reader, tx, ty, return_label=self.return_label,
                tile_overlap=self.tile_overlap, use_all_data=self.use_all_data,
                classification=True,
            )
        else:
            tiles = TileIterator3D(
                reader, tx, ty, tz, twoD=self.twoD,
                return_label=self.return_label,
                tile_overlap=self.tile_overlap, use_all_data=self.use_all_data,
            )
        shuffled = ShuffleBuffer(tiles, self.dict_buffer_sizes[key], rng=rng)
        # per-sample augmentation seed (derived from this chain's seed
        # sequence): each sample's patchify draws are a pure function of its
        # index in this chain. Makes the stream identical across num_workers
        # settings and lets mid-epoch resume skip samples without desyncing
        # any RNG.
        aug_seed = int(rng.integers(0, 2**63))
        processed = ProcessChannels(
            shuffled,
            num_channels=self.num_channels_used[key],
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
            num_workers=self.num_workers,
            return_qdt=self.return_qdt,
            rng=rng,
            aug_seed=aug_seed,
        )
        return BatchIterator(processed, self.batch_size, self.dataset)

    def _assemble(self):
        import zlib

        data = {}
        for k, lister in self.dict_lister_trains.items():
            # One Generator PER CHAIN, keyed by (seed, epoch, dataset key):
            # each chain's shuffle/augmentation stream is a pure function of
            # its own pull count, independent of how the step scheduler
            # interleaves chains. A shared Generator would entangle chains
            # through pull order — breaking mid-epoch fast-forward, which
            # drains each chain's skipped prefix when it is first picked
            # rather than in the original interleaving.
            rng = np.random.default_rng(
                np.random.SeedSequence(
                    [self._seed, self._epoch, zlib.crc32(str(k).encode())]
                )
            )
            keys_to_add = self._keys_to_add(k)
            files = list(rng.permutation(np.asarray(lister, dtype=object)))
            for _ in range(keys_to_add - 1):
                files.extend(rng.permutation(np.asarray(lister, dtype=object)))
            data[k] = self._build_chain(k, [str(f) for f in files], keys_to_add, rng)
        self.dict_data_train = data

    def setup(self):
        if not self.dict_data_train:
            self._assemble()

    def reset(self):
        """Per-epoch file-list reshuffle (parity: `datamodule.py:468-489`)."""
        self._epoch += 1
        self._assemble()

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch: chains are (re)built for `epoch`'s
        deterministic file permutation. Used by the trainer so a RESUMED run
        sees the same epoch-E stream as an uninterrupted one (reset() alone
        restarts the reshuffle schedule at 0 after a restart). No-op if the
        chains are already assembled for this epoch."""
        if self.dict_data_train is None or self._epoch != int(epoch):
            self._epoch = int(epoch)
            self._assemble()

    # ------------------------------------------------------------------- iter

    def _schedule_weights(self) -> Dict:
        """Dataset key -> step share, from the load-balanced group list.
        The gx weights are the reference's per-dataset rank counts
        (`dataset_group_list`); here they weight a step-level round-robin
        instead of a rank split (see module docstring)."""
        keys = list(self.dict_data_train.keys())
        if len(keys) == 1:
            return {keys[0]: 1}
        group_list = [int(x) for x in self.gx.split(":")]
        assert len(group_list) == len(keys), (
            f"dataset_group_list has {len(group_list)} entries for "
            f"{len(keys)} datasets"
        )
        assert self.data_par_size == sum(group_list), (
            f"group list {self.gx} must sum to data_par_size "
            f"{self.data_par_size}"
        )
        return dict(zip(keys, group_list))

    def train_dataloader(
        self, loop: bool = False, skip_batches: int = 0
    ) -> Iterator[dict]:
        """Scheduled batches across this process's dataset chains: each step
        one dataset, chosen by deterministic weighted round-robin (all
        processes compute the same schedule, so the global SPMD batch is
        dataset-pure). Each batch dict carries its dataset key (the
        reference appends dict_key to every collate output).

        loop=True (the trainer's mode): the per-step dataset choice is a pure
        function of the step index — chain exhaustion, whose timing is
        process-LOCAL (file shards differ in tile counts), never alters the
        schedule; the local shard wraps around instead (reference keys_to_add
        refill semantics) and epoch length is governed by
        iterations_per_epoch. Reacting to exhaustion would desynchronize the
        dataset choice across processes and feed mixed datasets into one
        SPMD batch. loop=False ends when all chains are exhausted (eval /
        data-audit mode; single-process only).

        skip_batches=N (mid-epoch resume): fast-forward past the first N
        batches of this epoch's deterministic stream. The schedule is
        pre-advanced by N picks and each chain is told to skip its share of
        samples — the upstream read/tile/shuffle state advances exactly as in
        an uninterrupted run, but the expensive patchify/serialize transform
        is bypassed for skipped samples, so the fast-forward runs at raw
        loader speed. The first yielded batch is bit-identical to batch N of
        the uninterrupted epoch. The reference can only re-run an epoch from
        its start (`train_masked_fsdp.py` resumes at epoch granularity)."""
        assert self.dict_data_train is not None, "call setup() first"
        weights = self._schedule_weights()

        # pre-advance the (pure-function) schedule by skip_batches picks and
        # hand each chain its sample-skip budget BEFORE any iteration starts
        # — the prefetch thread / worker pool must never race a live mutation
        pre_emitted = {k: 0 for k in weights}
        for _ in range(int(skip_batches)):
            k = min(weights, key=lambda k: (pre_emitted[k] + 1) / weights[k])
            pre_emitted[k] += 1
        for k, n in pre_emitted.items():
            if n:
                self.dict_data_train[k].source.skip_samples += (
                    n * self.batch_size
                )

        def scheduled():
            iters = {k: iter(self.dict_data_train[k]) for k in weights}
            emitted = dict(pre_emitted)
            while iters:
                # proportional scheduler: the dataset currently furthest
                # below its target share goes next (deterministic in dict
                # order, identical on every process)
                k = min(iters, key=lambda k: (emitted[k] + 1) / weights[k])
                exhausted = False
                while True:  # drain this chain's skipped (None) batches
                    try:
                        batch = next(iters[k])
                    except StopIteration:
                        if not loop:
                            del iters[k]
                            exhausted = True
                            break
                        iters[k] = iter(self.dict_data_train[k])
                        try:
                            batch = next(iters[k])
                        except StopIteration:
                            raise RuntimeError(
                                f"dataset {k!r} yields no batches on this "
                                f"process's file shard — shard too small for "
                                f"the batch size"
                            ) from None
                    if batch is not None:
                        break
                if exhausted:
                    continue
                emitted[k] += 1
                batch["dict_key"] = k
                yield batch

        if self.prefetch > 0:
            return iter(Prefetcher(scheduled(), depth=self.prefetch))
        return scheduled()
