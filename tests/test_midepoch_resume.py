"""Mid-epoch resume: skip_batches fast-forward is bit-exact and cheap.

The reference can only resume at epoch granularity (the interrupted epoch
re-runs from its start, `train_masked_fsdp.py:405-411`). This framework
checkpoints the mid-epoch position (data_it/total_steps/rng_key) and the
DataModule fast-forwards its deterministic stream past the consumed batches
— bypassing the expensive patchify/serialize transform for skipped samples
while the upstream read/tile/shuffle state advances exactly as in an
uninterrupted run.
"""

import itertools

import numpy as np

from tests.test_datamodule import _dm, _make_ct_dataset  # noqa: F401
from ucf_vit_tpu.data.datamodule import DataModule


def _batches_equal(a, b):
    assert a.keys() == b.keys(), (a.keys(), b.keys())
    for k in a:
        if k in ("variables", "dict_key"):
            assert a[k] == b[k], k
        elif k == "qdt":
            continue
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_skip_batches_bit_exact(tmp_path):
    """skip_batches=k yields exactly the uninterrupted stream's batches[k:]."""
    dm_a = _dm(tmp_path, [("only", 8)], data_par_size=8)
    dm_a.setup()
    full = list(dm_a.train_dataloader())

    dm_b = _dm(tmp_path, [("only", 8)], data_par_size=8,
               roots=dm_a.dict_root_dirs)
    dm_b.setup()
    rest = list(dm_b.train_dataloader(skip_batches=2))
    assert len(rest) == len(full) - 2
    for a, b in zip(full[2:], rest):
        _batches_equal(a, b)


def _adaptive_dm(tmp_path, roots=None, num_workers=0):
    names_sizes = [("adapt", 6)]
    if roots is None:
        roots = {}
        for name, n in names_sizes:
            root = str(tmp_path / name)
            _make_ct_dataset(root, n, shape=(32, 32, 4), seed=3)
            roots[name] = root
    return DataModule(
        dict_root_dirs=roots,
        dict_start_idx={"adapt": 0.0},
        dict_end_idx={"adapt": 1.0},
        dict_buffer_sizes={"adapt": 4},
        dict_in_variables={"adapt": ["ct"]},
        num_channels_used={"adapt": 1},
        batch_size=2,
        patch_size=4,
        tile_size_x=32, tile_size_y=32, tile_size_z=4,
        twoD=True,
        single_channel=True,
        data_par_size=1,
        dataset="basic_ct",
        return_label=False,
        adaptive_patching=True,
        fixed_length=16,
        prefetch=0,
        num_workers=num_workers,
        seed=11,
    )


def test_skip_adaptive_bit_exact_and_cheap(tmp_path, monkeypatch):
    """Adaptive path: the skipped prefix never runs patchify (the per-sample
    augmentation RNG is a pure function of the sample index, so skipping
    cannot desync later draws), and the continuation is bit-exact including
    seq/seq_size/seq_pos."""
    from ucf_vit_tpu.data import pipeline as pl

    calls = {"n": 0}
    orig = pl.ProcessChannels._make_sample

    def counting(self, img, vars_out, label, idx=None):
        calls["n"] += 1
        return orig(self, img, vars_out, label, idx)

    monkeypatch.setattr(pl.ProcessChannels, "_make_sample", counting)

    dm_a = _adaptive_dm(tmp_path)
    dm_a.setup()
    full = list(dm_a.train_dataloader())
    full_calls = calls["n"]
    assert full_calls == len(full) * 2  # batch_size 2

    calls["n"] = 0
    dm_b = _adaptive_dm(tmp_path, roots=dm_a.dict_root_dirs)
    dm_b.setup()
    rest = list(dm_b.train_dataloader(skip_batches=2))
    assert calls["n"] == full_calls - 2 * 2, "skip must bypass the transform"
    assert len(rest) == len(full) - 2
    for a, b in zip(full[2:], rest):
        _batches_equal(a, b)


def test_aug_stream_invariant_to_worker_count(tmp_path):
    """The per-sample augmentation RNG makes num_workers>0 output identical
    to in-process output (pool workers previously drew from os.getpid())."""
    dm_a = _adaptive_dm(tmp_path)
    dm_a.setup()
    local = list(dm_a.train_dataloader())

    dm_b = _adaptive_dm(tmp_path, roots=dm_a.dict_root_dirs, num_workers=2)
    dm_b.setup()
    pooled = list(dm_b.train_dataloader())
    assert len(local) == len(pooled) > 0
    for a, b in zip(local, pooled):
        _batches_equal(a, b)


def test_skip_multi_dataset_schedule(tmp_path):
    """skip distributes across datasets per the deterministic schedule: the
    continuation matches the uninterrupted loop-mode stream, dict_key and
    all."""
    dm_a = _dm(tmp_path, [("big", 6), ("small", 2)], data_par_size=4,
               group_list="3:1", bpre={"big": 6, "small": 2})
    dm_a.setup()
    full = list(itertools.islice(dm_a.train_dataloader(loop=True), 12))

    dm_b = _dm(tmp_path, [("big", 6), ("small", 2)], data_par_size=4,
               group_list="3:1", bpre={"big": 6, "small": 2},
               roots=dm_a.dict_root_dirs)
    dm_b.setup()
    rest = list(itertools.islice(
        dm_b.train_dataloader(loop=True, skip_batches=5), 7
    ))
    for a, b in zip(full[5:], rest):
        _batches_equal(a, b)


def _mae_file_cfg(data_root, ckpt_dir, metrics_path, max_epochs=2):
    from ucf_vit_tpu.config import Config

    raw = {
        "trainer": {
            "task": "mae",
            "max_epochs": max_epochs,
            "checkpoint_path": ckpt_dir,
            "checkpoint_filename": "last",
            "checkpoint_filename_for_loading": "last_latest",
            "resume_from_checkpoint": False,
            "metrics_path": metrics_path,
            "seed": 7,
        },
        "parallelism": {"fsdp_size": 1, "simple_ddp_size": 1,
                        "tensor_par_size": 1, "seq_par_size": 1},
        "model": {
            "lr": 1e-3, "warmup_steps": 2, "max_steps": 100,
            "net": {"init_args": {
                "default_vars": ["ct"],
                "tile_size": [32, 32, 4],
                "patch_size": 4,
                "embed_dim": 18,
                "depth": 1,
                "num_heads": 2,
                "mlp_ratio": 2,
                "twoD": False,
                "adaptive_patching": False,
                "decoder_embed_dim": 12,
                "decoder_depth": 1,
                "decoder_num_heads": 2,
                "mlp_ratio_decoder": 2,
                "mask_ratio": 0.75,
            }},
        },
        "data": {
            "dataset": "basic_ct",
            "dict_root_dirs": {"d": data_root},
            "dict_start_idx": {"d": 0.0},
            "dict_end_idx": {"d": 1.0},
            "dict_buffer_sizes": {"d": 4},
            "num_channels_used": {"d": 1},
            "dict_in_variables": {"d": ["ct"]},
            "batch_size": 2,
            "single_channel": True,
            "tile_overlap": 0.0,
            "use_all_data": False,
        },
        "load_balancing": {
            "auto_load_balancing": False,
            "batches_per_rank_epoch": {"d": 3},
        },
    }
    return Config(raw=raw, task="mae")


def _read_metrics(path):
    import json

    with open(path) as f:
        return [json.loads(line) for line in f if "loss" in line]


def test_trainer_midepoch_resume_bit_exact(tmp_path):
    """Preempt after step 2 of 6 (epoch 0 it 2) -> resume -> the combined
    per-step loss trajectory equals the uninterrupted run's exactly: same
    data (fast-forwarded, not re-run or skipped), same RNG stream (restored
    key), same step counter. The reference would re-run epoch 0 from its
    start."""
    from ucf_vit_tpu.train import train

    data_root = str(tmp_path / "data")
    _make_ct_dataset(data_root, 6, shape=(32, 32, 4), seed=5)

    # A: uninterrupted, 2 epochs x 3 its
    m_a = str(tmp_path / "a.jsonl")
    train(_mae_file_cfg(data_root, str(tmp_path / "ck_a"), m_a))
    rec_a = _read_metrics(m_a)
    assert [(r["epoch"], r["it"]) for r in rec_a] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)
    ]

    # B1: same run, preemption drill after step 2
    m_b = str(tmp_path / "b.jsonl")
    ck_b = str(tmp_path / "ck_b")
    cfg = _mae_file_cfg(data_root, ck_b, m_b)
    cfg.raw["trainer"]["preempt_after_steps"] = 2
    train(cfg)
    rec_b1 = _read_metrics(m_b)
    assert [(r["epoch"], r["it"]) for r in rec_b1] == [(0, 1), (0, 2)]

    # B2: resume — must re-enter epoch 0 at it 3, then run epoch 1
    cfg2 = _mae_file_cfg(data_root, ck_b, m_b)
    cfg2.raw["trainer"]["resume_from_checkpoint"] = True
    train(cfg2)
    rec_b = _read_metrics(m_b)
    assert [(r["epoch"], r["it"]) for r in rec_b] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)
    ]

    loss_a = np.asarray([r["loss"] for r in rec_a])
    loss_b = np.asarray([r["loss"] for r in rec_b])
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-6)
    # the continuation (post-resume) must match exactly, not just closely
    np.testing.assert_allclose(loss_b[2:], loss_a[2:], rtol=1e-7)


def test_preempt_on_epoch_boundary_records_completed_epoch(tmp_path):
    """Preemption landing on the epoch's FINAL iteration: the epoch is
    complete — the checkpoint must say data_it=0 (resume starts the next
    epoch) and the epoch's loss must be in the history, not a spurious
    0.0 after skipping a full epoch's stream."""
    from ucf_vit_tpu.train import train

    data_root = str(tmp_path / "data")
    _make_ct_dataset(data_root, 6, shape=(32, 32, 4), seed=5)

    m_a = str(tmp_path / "a.jsonl")
    train(_mae_file_cfg(data_root, str(tmp_path / "ck_a"), m_a))
    rec_a = _read_metrics(m_a)

    m_b = str(tmp_path / "b.jsonl")
    ck_b = str(tmp_path / "ck_b")
    cfg = _mae_file_cfg(data_root, ck_b, m_b)
    cfg.raw["trainer"]["preempt_after_steps"] = 3  # = last it of epoch 0
    out1 = train(cfg)
    assert len(out1["loss_list"]) == 1, "epoch 0 completed -> loss recorded"

    cfg2 = _mae_file_cfg(data_root, ck_b, m_b)
    cfg2.raw["trainer"]["resume_from_checkpoint"] = True
    out2 = train(cfg2)
    assert len(out2["loss_list"]) == 2

    rec_b = _read_metrics(m_b)
    assert [(r["epoch"], r["it"]) for r in rec_b] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)
    ]
    np.testing.assert_allclose(
        [r["loss"] for r in rec_b], [r["loss"] for r in rec_a], rtol=1e-6
    )


def test_set_epoch_pins_shuffle(tmp_path):
    """set_epoch(E) reproduces the stream an uninterrupted run sees at epoch
    E (reset() from a fresh process restarts the reshuffle at 0)."""
    dm_a = _dm(tmp_path, [("only", 8)], data_par_size=8)
    dm_a.setup()
    dm_a.reset()  # epoch 1
    epoch1 = list(dm_a.train_dataloader())

    dm_b = _dm(tmp_path, [("only", 8)], data_par_size=8,
               roots=dm_a.dict_root_dirs)
    dm_b.set_epoch(1)
    epoch1_b = list(dm_b.train_dataloader())
    assert len(epoch1) == len(epoch1_b)
    for a, b in zip(epoch1, epoch1_b):
        _batches_equal(a, b)
