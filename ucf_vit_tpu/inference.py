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
           [--volume vol.npy [--volume-out pred.npy] [--sw-overlap F]
            [--sw-batch N]]  # sliding-window stitched segmentation
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
from ucf_vit_tpu.tasks import build_task, _seq_ps, reassemble_sqrt_len
from ucf_vit_tpu.train import synthetic_batches, _init_variables, example_batch
from ucf_vit_tpu.utils.metrics import dice_metric



def _params_from_payload(payload, use_ema: bool):
    """Pick raw or EMA params from a restored checkpoint payload.

    use_ema requires the checkpoint to have been trained with
    trainer.ema_decay set (the state then carries an 'ema_params' subtree)."""
    state = payload["state"]
    if not use_ema:
        return state["params"]
    assert "ema_params" in state and state["ema_params"] is not None, (
        "--ema requested but this checkpoint has no EMA state; train with "
        "trainer.ema_decay set"
    )
    return state["ema_params"]

def _eval_mesh(cfg):
    """Mesh from `parallelism:` when it spans more than one device, else
    None. Evaluation then runs the same GSPMD surface as training: weights
    sharded per LOGICAL_RULES (tp/fsdp — required for models bigger than
    one chip), batches split over the data axes (data-parallel eval). The
    reference's eval is strictly one-GPU-per-process
    (`inference_unetr_simple.py:160`)."""
    par = dict(cfg.raw.get("parallelism", {}) or {})
    size = 1
    for k in ("simple_ddp_size", "fsdp_size", "seq_par_size",
              "tensor_par_size", "pipe_par_size", "expert_par_size"):
        size *= int(par.get(k, 1))
    if size <= 1:
        return None
    if jax.device_count() < size:
        # evaluating a multi-chip training config on a smaller host is
        # routine (e.g. one chip): fall back to single-device eval rather
        # than demanding the training topology
        print(
            f"eval: parallelism wants {size} devices, "
            f"{jax.device_count()} available -> single-device eval",
            flush=True,
        )
        return None
    from ucf_vit_tpu.parallel.mesh import mesh_from_config

    return mesh_from_config(par)


def _init_eval_params(model, cfg, ex, var_ids, mesh):
    """(params, params_sharding): single-device when mesh is None, else
    initialized directly sharded on the mesh."""
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "mask": jax.random.key(2)}
    if mesh is None:
        params = unbox(_init_variables(model, rngs, cfg, ex, var_ids)["params"])
        return params, None
    from ucf_vit_tpu.parallel.train_step import create_sharded_params

    return create_sharded_params(
        lambda: _init_variables(model, rngs, cfg, ex, var_ids), mesh
    )


def _place_eval_params(params_host, params_sharding):
    """Land restored (host) checkpoint params on the eval sharding."""
    if params_sharding is None:
        return params_host
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s),
        params_host, params_sharding,
    )


def _mesh_ctx(mesh):
    import contextlib

    from ucf_vit_tpu.parallel.mesh import mesh_context

    return mesh_context(mesh) if mesh is not None else contextlib.nullcontext()


def evaluate_classification(cfg, checkpoint_dir: Optional[str] = None,
                            synthetic: bool = False,
                            num_samples: int = 64,
                            use_ema: bool = False) -> float:
    """Top-1 accuracy eval (capability-plus: the reference leaves
    validation/testing to users, `README.md:969`). Runs sharded when
    `parallelism:` spans more than one device (see _eval_mesh)."""
    from ucf_vit_tpu.utils.metrics import accuracy

    model, _ = build_task(cfg)
    batch_size = cfg.batch_size
    ex = example_batch(cfg, batch_size)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    mesh = _eval_mesh(cfg)
    params, psharding = _init_eval_params(model, cfg, ex, var_ids, mesh)
    if checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            checkpoint_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
            expect_head_meta=ckpt.head_meta_from_config(cfg),
        )
        params = _place_eval_params(
            _params_from_payload(payload, use_ema), psharding
        )
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
    with _mesh_ctx(mesh):
        from ucf_vit_tpu.parallel.mesh import shard_batch

        for i, batch in enumerate(it):
            if seen >= num_samples:
                break
            arrays = {
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            }
            if mesh is not None:
                arrays = shard_batch(mesh, arrays)
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
             png_dir: Optional[str] = None, batch_size: int = 1,
             use_ema: bool = False) -> float:
    if cfg.task == "classification":
        return evaluate_classification(cfg, checkpoint_dir, synthetic,
                                       num_samples, use_ema)
    if cfg.task == "diffusion":
        return generate_diffusion(cfg, checkpoint_dir, num_samples, png_dir,
                                  use_ema=use_ema)
    assert cfg.task in ("unetr", "sap"), "inference CLI covers segmentation tasks"
    model, _ = build_task(cfg)

    # default 1 mirrors the reference, which hard-codes bs=1 at inference
    # (`inference_unetr_simple.py:160`); --batch-size N batches the jitted
    # forward (capability-plus: reference cannot batch its eval loop).
    # num_samples then counts batches; Dice is averaged per batch.
    ex = example_batch(cfg, batch_size)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    mesh = _eval_mesh(cfg)
    params, psharding = _init_eval_params(model, cfg, ex, var_ids, mesh)

    if checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            checkpoint_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
            expect_head_meta=ckpt.head_meta_from_config(cfg),
        )
        params = _place_eval_params(
            _params_from_payload(payload, use_ema), psharding
        )
        print(f"loaded checkpoint from epoch {int(payload['epoch'])}", flush=True)
    if mae_checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            mae_checkpoint_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
            # encoder heads must agree; the MAE decoder is stripped
            expect_head_meta=(ckpt.head_meta_from_config(cfg)[0], None),
        )
        params = _place_eval_params(
            ckpt.transfer_mae_encoder(
                payload["state"]["params"], jax.tree.map(np.asarray, params),
                new_pos_embed_len=model.num_patches,
            ),
            psharding,
        )
        print("initialized encoder from MAE checkpoint", flush=True)

    num_classes = int(cfg.init_args.get("num_classes", cfg.data.get("num_classes")))
    sqrt_len, p = cfg.sqrt_len, cfg.patch_size
    nd = 2 if cfg.twoD else 3

    @jax.jit
    def forward(params, batch):
        # token reassembly is shared with the training step
        # (tasks.reassemble_sqrt_len) so train and eval see the identical
        # input layout in 2D and 3D
        x = jnp.asarray(batch["x"])
        seq_ps = _seq_ps(batch)
        if cfg.task == "unetr":
            if cfg.adaptive_patching:
                seq = reassemble_sqrt_len(
                    jnp.asarray(batch["seq"]), sqrt_len, p, cfg.twoD
                )
                return model.apply({"params": params}, x, var_ids, seq_ps, seq)
            return model.apply({"params": params}, x, var_ids, None, None)
        # sap
        seq_img = reassemble_sqrt_len(
            jnp.asarray(batch["seq"]), sqrt_len, p, cfg.twoD
        )
        return model.apply({"params": params}, seq_img, var_ids, seq_ps)

    if synthetic:
        it = synthetic_batches(cfg, batch_size)
    else:
        from ucf_vit_tpu.train import build_dataloader

        # carry the host-side trees when we will deserialize predictions
        # back to image space for the PNG overlays
        want_qdt = bool(png_dir) and cfg.adaptive_patching
        dm, _, _ = build_dataloader(
            cfg, batch_size, synthetic=False, return_qdt=want_qdt
        )
        it = dm.train_dataloader()

    dices = []
    from ucf_vit_tpu.parallel.mesh import shard_batch

    def eval_batch(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if mesh is not None:
            arrays = shard_batch(mesh, arrays)
        return forward(params, arrays)

    with _mesh_ctx(mesh):
        for i, batch in enumerate(it):
            if i >= num_samples:
                break
            logits = eval_batch(batch)  # [1, C, *spatial]
            pred = jnp.argmax(logits, axis=1)  # [1, *spatial]
            if cfg.task == "sap":
                # SAP predicts in the sqrt-len pseudo-image space; score
                # against the serialized labels reassembled the same way
                # (the layout the SAP training loss uses,
                # `train_sap_simple.py:28-46`)
                seq_label = jnp.asarray(batch["seq_label"]).astype(jnp.int32)
                flat = seq_label.reshape(
                    seq_label.shape[0], seq_label.shape[1], -1
                )
                label = reassemble_sqrt_len(flat, sqrt_len, p, cfg.twoD)
            else:
                label = jnp.asarray(batch["label"])
                if label.ndim == pred.ndim + 1:
                    label = label[:, 0]
            d = float(dice_metric(pred, label, num_classes))
            dices.append(d)
            print(f"sample {i}: dice {d:.4f}", flush=True)
            if png_dir:
                png_pred = np.asarray(pred[0])
                png_label = np.asarray(label[0])
                if cfg.task == "sap" and "qdt" in batch:
                    # deserialize the pseudo-image prediction back to TRUE
                    # image space via the sample's tree (reference
                    # `inference_unetr_simple.py:426-457` intent) and
                    # overlay against the original image-space label
                    png_pred = _deserialize_pred(
                        pred[0], batch["qdt"][0], sqrt_len, p, cfg.twoD
                    )
                    png_label = np.asarray(batch["label"][0])
                    if png_label.ndim == png_pred.ndim + 1:
                        png_label = png_label[0]
                _dump_png(png_dir, i, png_pred, png_label)
    mean_dice = float(np.mean(dices)) if dices else float("nan")
    print(f"mean dice over {len(dices)} samples: {mean_dice:.4f}", flush=True)
    return mean_dice


def generate_diffusion(cfg, checkpoint_dir: Optional[str] = None,
                       num_samples: int = 8,
                       png_dir: Optional[str] = None,
                       use_ema: bool = False,
                       return_images: bool = False):
    """Generate images from a trained DiffusionVIT via ancestral DDPM
    sampling (capability-plus: the reference trains the denoiser but ships
    no sampler, `ddpm/ddpm.py`). Returns samples/s. The full reverse chain
    runs under one jitted lax.fori_loop."""
    import time

    from ucf_vit_tpu.models.ddpm import ddpm_sample, ddpm_schedule
    from ucf_vit_tpu.ops.patchify import unpatchify

    model, _ = build_task(cfg)
    batch = max(int(num_samples), 1)
    ex = example_batch(cfg, batch)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    mesh = _eval_mesh(cfg)
    params, psharding = _init_eval_params(model, cfg, ex, var_ids, mesh)
    if checkpoint_dir:
        payload = ckpt.restore_checkpoint(
            checkpoint_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
            expect_head_meta=ckpt.head_meta_from_config(cfg),
        )
        params = _place_eval_params(
            _params_from_payload(payload, use_ema), psharding
        )
        print(f"loaded checkpoint from epoch {int(payload['epoch'])}", flush=True)

    shape = tuple(np.asarray(ex["x"]).shape)
    time_steps = int(cfg.init_args.get("num_time_steps",
                                       cfg.init_args.get("time_steps", 1000)))
    schedule = ddpm_schedule(time_steps)

    if mesh is not None:
        # batch-shard the whole reverse chain: constraining x_t once per
        # denoise call makes GSPMD carry the data-parallel sharding through
        # every DDPM step (noise draws are sharding-invariant, so sharded
        # sampling equals single-device sampling for the same key)
        from ucf_vit_tpu.parallel.mesh import batch_sharding

        bshard = batch_sharding(mesh, len(shape))

    def denoise(x_t, t):
        if mesh is not None:
            x_t = jax.lax.with_sharding_constraint(x_t, bshard)
        pred = model.apply({"params": params}, x_t, t, var_ids, None)
        return unpatchify(pred, shape, cfg.patch_size, cfg.twoD)

    sample = jax.jit(
        lambda key: ddpm_sample(schedule, denoise, key, shape)
    )
    t0 = time.perf_counter()
    with _mesh_ctx(mesh):
        imgs = np.asarray(sample(jax.random.key(0)))
    dt = time.perf_counter() - t0
    sps = batch / dt
    print(
        f"generated {batch} samples in {dt:.1f}s ({sps:.2f} samples/s, "
        f"{time_steps} DDPM steps)", flush=True,
    )
    if png_dir:
        for i in range(batch):
            img = imgs[i, 0] if imgs.ndim >= 4 else imgs[i]  # drop channel
            if img.ndim == 3:  # 3D volume: middle slice
                img = img[..., img.shape[-1] // 2]
            _dump_generated_png(png_dir, i, img)
    return (sps, imgs) if return_images else sps


def _dump_generated_png(png_dir: str, idx: int, img: np.ndarray):
    _save_panels(png_dir, f"generated_{idx}.png", [(None, img)], cmap="gray")


def _deserialize_pred(pred, qdt, sqrt_len: int, p: int, twoD: bool) -> np.ndarray:
    """Pseudo-image class prediction -> true image space via the sample's
    quadtree/octree (`quadtree.deserialize`, reference quadtree.py:209-221)."""
    from ucf_vit_tpu.tasks import disassemble_sqrt_len

    tokens = np.asarray(
        disassemble_sqrt_len(pred.astype(jnp.float32), sqrt_len, p, twoD)
    )  # [L, p^d]
    if isinstance(qdt, list):  # single_channel / separate_channels trees
        qdt = qdt[0]
    out = qdt.deserialize(tokens, p, 1)  # [..., 1]
    return np.rint(out[..., 0]).astype(np.int64)


def _dump_png(png_dir: str, idx: int, pred: np.ndarray, label: np.ndarray):
    """Pred-vs-label visualization (middle slice for 3D). Parity:
    `inference_unetr_simple.py:426-457`."""
    if pred.ndim == 3:
        z = pred.shape[-1] // 2
        pred, label = pred[..., z], label[..., z]
    _save_panels(
        png_dir, f"sample_{idx}.png", [("prediction", pred), ("label", label)]
    )


def _save_panels(png_dir: str, name: str, panels, cmap=None):
    """Write a row of image panels [(title, 2D array), ...] to a PNG."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(png_dir, exist_ok=True)
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(img, cmap=cmap, interpolation="nearest")
        if title:
            ax.set_title(title)
        ax.axis("off")
    fig.savefig(os.path.join(png_dir, name), dpi=80)
    plt.close(fig)


# ---------------------------------------------------------------------------
# sliding-window stitched volume inference (capability-plus: the reference
# evaluates per-tile only — production segmentation must stitch volumes
# larger than the training tile; this is the MONAI sliding_window_inference
# role its scripts import MONAI for but never use)
# ---------------------------------------------------------------------------


def _gaussian_importance(tile, sigma_scale: float = 0.125) -> np.ndarray:
    """Per-voxel blend weight for one window: separable Gaussian centered on
    the tile (MONAI convention, sigma = sigma_scale * dim), max 1, floored
    so edge voxels covered by a single window still get full weight."""
    w = np.ones(tile, np.float32)
    for d, n in enumerate(tile):
        x = np.arange(n, dtype=np.float32) - (n - 1) / 2.0
        g = np.exp(-0.5 * (x / (sigma_scale * n)) ** 2)
        w *= g.reshape((1,) * d + (-1,) + (1,) * (len(tile) - d - 1))
    return np.maximum(w / w.max(), 1e-3)


def _window_starts(dim: int, tile: int, stride: int):
    starts = list(range(0, max(dim - tile, 0) + 1, stride))
    if starts[-1] != dim - tile:
        starts.append(dim - tile)  # final window flush with the far edge
    return starts


class VolumePredictor:
    """Reusable sliding-window segmenter: holds the model, params, and ONE
    jitted fixed-shape tile forward across volumes.

    A deployment segments many volumes with the same weights; rebuilding the
    model / re-initializing params / re-tracing the jit closure per volume
    (what a bare function would do) costs seconds per call. Construct once,
    call per volume. `predict_volume` below wraps this for one-shot use.
    """

    def __init__(self, cfg, checkpoint_dir: Optional[str] = None,
                 params=None, sw_batch: int = 4, use_ema: bool = False,
                 blend: str = "gaussian"):
        assert cfg.task == "unetr", (
            "sliding-window stitching needs image-space tile logits; SAP "
            "predicts in the sqrt-len pseudo-image space (use evaluate())"
        )
        from ucf_vit_tpu.serve import make_preprocessor

        self.cfg = cfg
        self.sw_batch = int(sw_batch)
        model, _ = build_task(cfg)
        self.model = model
        nd = 2 if cfg.twoD else 3
        self.nd = nd
        self.tile = tuple(int(t) for t in cfg.tile_size[:nd])

        ex = example_batch(cfg, self.sw_batch)
        self.var_ids = (
            model.get_var_ids(ex["variables"])
            if cfg.init_args.get("use_varemb", False)
            else None
        )
        if params is None:
            rngs = {"params": jax.random.key(0),
                    "dropout": jax.random.key(1), "mask": jax.random.key(2)}
            params = unbox(
                _init_variables(model, rngs, cfg, ex, self.var_ids)["params"]
            )
            if checkpoint_dir:
                payload = ckpt.restore_checkpoint(
                    checkpoint_dir,
                    cfg.trainer.get("checkpoint_filename_for_loading", ""),
                    expect_head_meta=ckpt.head_meta_from_config(cfg),
                )
                params = _params_from_payload(payload, use_ema)
        self.params = jax.device_put(params)

        sqrt_len, p = cfg.sqrt_len, cfg.patch_size
        var_ids = self.var_ids

        @jax.jit
        def tile_probs(params, batch):
            x = jnp.asarray(batch["x"])
            if cfg.adaptive_patching:
                seq = reassemble_sqrt_len(
                    jnp.asarray(batch["seq"]), sqrt_len, p, cfg.twoD
                )
                logits = model.apply(
                    {"params": params}, x, var_ids, _seq_ps(batch), seq
                )
            else:
                logits = model.apply(
                    {"params": params}, x, var_ids, None, None
                )
            return jax.nn.softmax(logits, axis=1)

        self._tile_probs = tile_probs
        self._pre = make_preprocessor(cfg)
        self._w_map = (_gaussian_importance(self.tile)
                       if blend == "gaussian"
                       else np.ones(self.tile, np.float32))
        self.num_classes = int(
            cfg.init_args.get("num_classes", cfg.data.get("num_classes"))
        )

    def __call__(self, volume: np.ndarray,
                 overlap: float = 0.5) -> np.ndarray:
        """Segment one `[C, *spatial]` float32 volume; returns an int32
        `[*spatial]` class map. Spatial dims smaller than the tile are
        reflect-padded and cropped back."""
        assert 0.0 <= overlap < 1.0, (
            f"overlap must be in [0, 1), got {overlap}"
        )
        nd, tile, sw_batch = self.nd, self.tile, self.sw_batch
        volume = np.asarray(volume, np.float32)
        assert volume.ndim == nd + 1, (
            f"volume must be [C, *{nd}d spatial], got shape {volume.shape}"
        )

        # reflect-pad any spatial dim smaller than the tile
        pad = [(0, 0)] + [(0, max(t - s, 0))
                          for t, s in zip(tile, volume.shape[1:])]
        vol = np.pad(volume, pad, mode="reflect") if any(
            p1 for _, p1 in pad
        ) else volume
        spatial = vol.shape[1:]

        strides = [max(1, int(round(t * (1.0 - overlap)))) for t in tile]
        starts = [_window_starts(s, t, st)
                  for s, t, st in zip(spatial, tile, strides)]
        corners = [c for c in _product(*starts)]

        w_map = self._w_map
        probs_acc = np.zeros((self.num_classes,) + spatial, np.float32)
        w_acc = np.zeros(spatial, np.float32)

        # overlap host work with device compute: preprocess + dispatch chunk
        # i+1 while chunk i's probs are still in flight, fetch one behind
        def make_batch(i):
            chunk = corners[i:i + sw_batch]
            samples = []
            for c0 in chunk:
                sl = tuple(slice(a, a + t) for a, t in zip(c0, tile))
                samples.append(self._pre(vol[(slice(None),) + sl]))
            while len(samples) < sw_batch:  # fixed-shape pad; extras dropped
                samples.append(samples[-1])
            return chunk, {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }

        def accumulate(chunk, probs):
            probs = np.asarray(probs, np.float32)
            for j, c0 in enumerate(chunk):
                sl = tuple(slice(a, a + t) for a, t in zip(c0, tile))
                probs_acc[(slice(None),) + sl] += probs[j] * w_map
                w_acc[sl] += w_map

        in_flight = None
        for i in range(0, len(corners), sw_batch):
            chunk, batch = make_batch(i)
            probs = self._tile_probs(self.params, batch)  # async dispatch
            if in_flight is not None:
                accumulate(*in_flight)
            in_flight = (chunk, probs)
        if in_flight is not None:
            accumulate(*in_flight)
        pred = np.argmax(probs_acc / w_acc, axis=0).astype(np.int32)
        crop = tuple(slice(0, s) for s in volume.shape[1:])
        return pred[crop]


def predict_volume(cfg, volume: np.ndarray,
                   checkpoint_dir: Optional[str] = None,
                   params=None, overlap: float = 0.5, sw_batch: int = 4,
                   use_ema: bool = False,
                   blend: str = "gaussian") -> np.ndarray:
    """One-shot wrapper over `VolumePredictor` (see its docstring). For
    segmenting many volumes with the same weights, construct a
    `VolumePredictor` once and call it per volume instead."""
    predictor = VolumePredictor(cfg, checkpoint_dir=checkpoint_dir,
                                params=params, sw_batch=sw_batch,
                                use_ema=use_ema, blend=blend)
    return predictor(volume, overlap=overlap)


def _product(*iterables):
    import itertools

    return itertools.product(*iterables)


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
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--ema", action="store_true",
                        help="evaluate the EMA weights (trainer.ema_decay)")
    parser.add_argument("--volume", default=None,
                        help="path to a [C, *spatial] .npy volume: run "
                             "sliding-window stitched segmentation instead "
                             "of per-tile eval (unetr only)")
    parser.add_argument("--volume-out", default=None,
                        help="where to save the int32 class map .npy "
                             "(default: <volume>.pred.npy)")
    parser.add_argument("--sw-overlap", type=float, default=0.5)
    parser.add_argument("--sw-batch", type=int, default=4)
    args = parser.parse_args(argv)
    cfg = load_config(args.config, task=args.task)
    if args.volume:
        vol = np.load(args.volume)
        pred = predict_volume(
            cfg, vol, args.checkpoint, overlap=args.sw_overlap,
            sw_batch=args.sw_batch, use_ema=args.ema,
        )
        out = args.volume_out or (args.volume + ".pred.npy")
        np.save(out, pred)
        vals, counts = np.unique(pred, return_counts=True)
        print(f"stitched {vol.shape[1:]} -> {out}; class voxels "
              f"{dict(zip(vals.tolist(), counts.tolist()))}", flush=True)
        return
    evaluate(cfg, args.checkpoint, args.mae_checkpoint, args.synthetic,
             args.num_samples, args.png_dir, args.batch_size,
             use_ema=args.ema)


if __name__ == "__main__":
    main()
