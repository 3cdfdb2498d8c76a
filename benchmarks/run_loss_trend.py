"""Learning demonstration on real hardware through the full product path:
generate a synthetic-but-learnable imagenet-style JPEG tree, run the REAL
trainer CLI on the shipped ViT-B classification config shape, then verify a
monotone decreasing loss trend in the metrics JSONL (VERDICT r2 item 1c).

Class signal: each class is a distinct stripe orientation/frequency texture
(survives JPEG compression; not memorizable noise). The loss trend — not
throughput — is the claim; the 1-core host underfeeds the chip here.

Usage: python benchmarks/run_loss_trend.py [--steps 300] [--classes 8]
           [--per-class 64] [--out /tmp/loss_trend]
Prints one JSON line with the fitted loss slope and first/last window means.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()


import numpy as np
import yaml


def make_imagenet_tree(root: str, n_classes: int, per_class: int,
                       size: int = 256, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    for c in range(n_classes):
        d = os.path.join(root, f"class{c:03d}")
        os.makedirs(d, exist_ok=True)
        angle = np.pi * c / n_classes
        base_freq = 2 * np.pi * (3 + c % 5) / size
        axis = np.cos(angle) * xx + np.sin(angle) * yy
        for i in range(per_class):
            phase = rng.uniform(0, 2 * np.pi)
            img = 0.5 + 0.4 * np.sin(axis * base_freq + phase)
            img = img[..., None] + rng.normal(0, 0.08, (size, size, 3))
            arr = np.clip(img * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(d, f"img{i:04d}.JPEG"), quality=85
            )


def build_config(data_root: str, out_dir: str, n_classes: int) -> str:
    cfg = {
        "trainer": {
            "task": "classification",
            "max_epochs": 1000,
            "data_type": "bfloat16",
            "metrics_path": os.path.join(out_dir, "metrics.jsonl"),
            "seed": 0,
        },
        "parallelism": {"fsdp_size": 1, "simple_ddp_size": 1,
                        "tensor_par_size": 1, "seq_par_size": 1},
        "model": {
            "lr": 3.0e-4, "beta_1": 0.9, "beta_2": 0.95,
            "weight_decay": 1.0e-5, "warmup_steps": 50, "max_steps": 20000,
            "net": {"init_args": {
                # the shipped ViT-B/16 imagenet classification geometry
                # (configs/imagenet/classification/base_config.yaml)
                "default_vars": ["red", "green", "blue"],
                "tile_size": [256, 256],
                "patch_size": 16,
                "embed_dim": 768,
                "depth": 12,
                "num_heads": 12,
                "mlp_ratio": 4,
                "twoD": True,
                "adaptive_patching": False,
            }},
        },
        "data": {
            "dataset": "imagenet",
            "dict_root_dirs": {"imagenet": data_root},
            "dict_start_idx": {"imagenet": 0},
            "dict_end_idx": {"imagenet": 1},
            "dict_buffer_sizes": {"imagenet": 200},
            "num_channels_used": {"imagenet": 3},
            "dict_in_variables": {"imagenet": ["red", "green", "blue"]},
            "batch_size": 32,
            "single_channel": False,
            "num_classes": n_classes,
        },
        "dataset_options": {"imagenet_resize": {"imagenet": [256, 256]}},
        "load_balancing": {"auto_load_balancing": False},
    }
    path = os.path.join(out_dir, "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def analyze(metrics_path: str) -> dict:
    losses = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            losses.append(rec["loss"])
    n = len(losses)
    w = max(n // 5, 1)
    first_w = float(np.mean(losses[:w]))
    last_w = float(np.mean(losses[-w:]))
    slope = float(np.polyfit(np.arange(n), losses, 1)[0])
    # monotone trend over quintile means (noise-robust monotonicity)
    quint = [float(np.mean(losses[i * n // 5:(i + 1) * n // 5]))
             for i in range(5)]
    monotone = all(b <= a + 1e-6 for a, b in zip(quint, quint[1:]))
    return {
        "metric": "vitb_imagenet_loss_trend",
        "steps": n,
        "first_window_loss": round(first_w, 4),
        "last_window_loss": round(last_w, 4),
        "slope_per_step": round(slope, 6),
        "quintile_means": [round(q, 4) for q in quint],
        "monotone_quintiles": monotone,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--per-class", type=int, default=64)
    ap.add_argument("--out", default="/tmp/loss_trend")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    data_root = os.path.join(args.out, "data")
    if not os.path.isdir(data_root):
        make_imagenet_tree(data_root, args.classes, args.per_class)
    cfg_path = build_config(data_root, args.out, args.classes)
    metrics = os.path.join(args.out, "metrics.jsonl")
    if os.path.exists(metrics):
        os.remove(metrics)

    from ucf_vit_tpu import train as train_cli

    train_cli.main([cfg_path, "--max-steps", str(args.steps),
                    "--log-every", "5"])
    print(json.dumps(analyze(metrics)), flush=True)


if __name__ == "__main__":
    main()
