"""Segmentation inference / evaluation CLI.

Capability parity with reference `training_scripts/inference_unetr_simple.py`
(SURVEY.md §3.5): build UNETR from the config, optionally initialize the
encoder from an MAE checkpoint (decoder keys stripped, pos-embeds length-
interpolated — `inference_unetr_simple.py:274-327`), run per-sample forward,
report mean Dice (include_background=False, MONAI semantics), optionally dump
pred-vs-label PNGs (`:426-457`).

Usage: python -m ucf_vit_tpu.inference <config.yaml> [--checkpoint DIR]
           [--mae-checkpoint DIR] [--synthetic] [--num-samples N]
           [--png-dir DIR]
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu import checkpoint as ckpt
from ucf_vit_tpu.config import load_config
from ucf_vit_tpu.parallel.train_step import unbox
from ucf_vit_tpu.tasks import build_task, _seq_ps
from ucf_vit_tpu.train import synthetic_batches, _init_variables, example_batch
from ucf_vit_tpu.utils.metrics import dice_metric


def evaluate_classification(cfg, checkpoint_dir: Optional[str] = None,
                            synthetic: bool = False,
                            num_samples: int = 64) -> float:
    """Top-1 accuracy eval (capability-plus: the reference leaves
    validation/testing to users, `README.md:969`)."""
    from ucf_vit_tpu.utils.metrics import accuracy

    model, _ = build_task(cfg)
    batch_size = cfg.batch_size
    ex = example_batch(cfg, batch_size)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2)}
    params = unbox(_init_variables(model, rngs, cfg, ex, var_ids)["params"])
    if checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            checkpoint_dir, cfg.trainer.get("checkpoint_filename_for_loading", "")
        )
        params = payload["state"]["params"]
        print(f"loaded checkpoint from epoch {int(payload['epoch'])}", flush=True)

    @jax.jit
    def forward(params, batch):
        x = jnp.asarray(batch["seq"] if cfg.adaptive_patching else batch["x"])
        return model.apply({"params": params}, x, var_ids, _seq_ps(batch))

    if synthetic:
        it = synthetic_batches(cfg, batch_size)
    else:
        from ucf_vit_tpu.train import build_dataloader

        dm, _, _ = build_dataloader(cfg, batch_size, synthetic=False)
        it = dm.train_dataloader()

    correct, seen = 0.0, 0
    for i, batch in enumerate(it):
        if seen >= num_samples:
            break
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        logits = forward(params, arrays)
        acc = float(accuracy(logits, jnp.asarray(arrays["label"])))
        correct += acc * logits.shape[0]
        seen += logits.shape[0]
    top1 = correct / max(seen, 1)
    print(f"top-1 accuracy over {seen} samples: {top1:.4f}", flush=True)
    return top1


def evaluate(cfg, checkpoint_dir: Optional[str] = None,
             mae_checkpoint_dir: Optional[str] = None,
             synthetic: bool = False, num_samples: int = 8,
             png_dir: Optional[str] = None) -> float:
    if cfg.task == "classification":
        return evaluate_classification(cfg, checkpoint_dir, synthetic, num_samples)
    assert cfg.task in ("unetr", "sap"), "inference CLI covers segmentation tasks"
    model, _ = build_task(cfg)

    batch_size = 1  # reference forces bs=1 at inference (`:160`)
    ex = example_batch(cfg, batch_size)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2)}
    params = unbox(_init_variables(model, rngs, cfg, ex, var_ids)["params"])

    if checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            checkpoint_dir, cfg.trainer.get("checkpoint_filename_for_loading", "")
        )
        params = payload["state"]["params"]
        print(f"loaded checkpoint from epoch {int(payload['epoch'])}", flush=True)
    if mae_checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            mae_checkpoint_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
        )
        params = ckpt.transfer_mae_encoder(
            payload["state"]["params"], params,
            new_pos_embed_len=model.num_patches,
        )
        print("initialized encoder from MAE checkpoint", flush=True)

    num_classes = int(cfg.init_args.get("num_classes", cfg.data.get("num_classes")))
    sqrt_len, p = cfg.sqrt_len, cfg.patch_size
    nd = 2 if cfg.twoD else 3

    @jax.jit
    def forward(params, batch):
        x = jnp.asarray(batch["x"])
        seq_ps = _seq_ps(batch)
        if cfg.task == "unetr":
            if cfg.adaptive_patching:
                seq = jnp.asarray(batch["seq"])
                b, c = seq.shape[0], seq.shape[1]
                side = sqrt_len * p
                if cfg.twoD:
                    seq = seq.reshape(b, c, sqrt_len, sqrt_len, p, p)
                    seq = seq.transpose(0, 1, 2, 4, 3, 5).reshape(b, c, side, side)
                else:
                    seq = seq.reshape(b, c, *([sqrt_len] * 3), *([p] * 3))
                    seq = seq.transpose(0, 1, 2, 5, 3, 6, 4, 7).reshape(
                        b, c, side, side, side
                    )
                return model.apply({"params": params}, x, var_ids, seq_ps, seq)
            return model.apply({"params": params}, x, var_ids, None, None)
        # sap
        seq = jnp.asarray(batch["seq"])
        b, c = seq.shape[0], seq.shape[1]
        side = sqrt_len * p
        seq_img = seq.reshape(b, c, sqrt_len, sqrt_len, p, p)
        seq_img = seq_img.transpose(0, 1, 2, 4, 3, 5).reshape(b, c, side, side) \
            if cfg.twoD else seq.reshape((b, c) + (side,) * 3)
        return model.apply({"params": params}, seq_img, var_ids, seq_ps)

    if synthetic:
        it = synthetic_batches(cfg, batch_size)
    else:
        from ucf_vit_tpu.train import build_dataloader

        dm, _, _ = build_dataloader(cfg, batch_size, synthetic=False)
        it = dm.train_dataloader()

    dices = []
    for i, batch in enumerate(it):
        if i >= num_samples:
            break
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        logits = forward(params, arrays)  # [1, C, *spatial]
        pred = jnp.argmax(logits, axis=1)  # [1, *spatial]
        label = jnp.asarray(batch["label"])
        if label.ndim == pred.ndim + 1:
            label = label[:, 0]
        d = float(dice_metric(pred, label, num_classes))
        dices.append(d)
        print(f"sample {i}: dice {d:.4f}", flush=True)
        if png_dir:
            _dump_png(png_dir, i, np.asarray(pred[0]), np.asarray(label[0]))
    mean_dice = float(np.mean(dices)) if dices else float("nan")
    print(f"mean dice over {len(dices)} samples: {mean_dice:.4f}", flush=True)
    return mean_dice


def _dump_png(png_dir: str, idx: int, pred: np.ndarray, label: np.ndarray):
    """Pred-vs-label visualization (middle slice for 3D). Parity:
    `inference_unetr_simple.py:426-457`."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(png_dir, exist_ok=True)
    if pred.ndim == 3:
        z = pred.shape[-1] // 2
        pred, label = pred[..., z], label[..., z]
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(pred, interpolation="nearest")
    axes[0].set_title("prediction")
    axes[1].imshow(label, interpolation="nearest")
    axes[1].set_title("label")
    for ax in axes:
        ax.axis("off")
    fig.savefig(os.path.join(png_dir, f"sample_{idx}.png"), dpi=80)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser(description="ucf_vit_tpu inference/eval")
    parser.add_argument("config")
    parser.add_argument("launcher", nargs="?", default=None)
    parser.add_argument("--task", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--mae-checkpoint", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num-samples", type=int, default=8)
    parser.add_argument("--png-dir", default=None)
    args = parser.parse_args(argv)
    cfg = load_config(args.config, task=args.task)
    evaluate(cfg, args.checkpoint, args.mae_checkpoint, args.synthetic,
             args.num_samples, args.png_dir)


if __name__ == "__main__":
    main()
