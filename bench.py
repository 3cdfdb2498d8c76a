"""Benchmark: ViT-B/16 training throughput on one TPU chip.

Runs the headline workload (ViT-B/16, 256^2 tiles, p=16 — the reference's
imagenet classification config, `configs/imagenet/classification/base_config.yaml`)
as a full jitted train step (fwd + bwd + AdamW) in bf16 compute with the
Pallas flash-attention kernel, on whatever single accelerator is attached.

Prints ONE JSON line:
  {"metric": "vit_b16_train_images_per_sec_per_chip", "value": <imgs/s>,
   "unit": "images/s/chip", "vs_baseline": <MFU / 0.50>}

vs_baseline: the reference publishes no quantitative numbers
(SURVEY.md §6, BASELINE.json "published": {}); the recorded north star is
>=50% MFU, so vs_baseline is measured-MFU / 0.50 (1.0 == north star met).
"""

from __future__ import annotations

import json
import os
import time

# A stale explicit tunnel spelling in JAX_PLATFORMS aborts jax when the
# plugin is registered under the other name; drop it and let jax
# auto-detect the registered plugin (see bench_env.py). An explicit 'cpu'
# is honored so test runs can import peak_flops on the host backend.
import bench_env

bench_env.normalize_jax_platforms()

import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH = 384  # global per-chip batch; run as ACCUM microbatches of 24 —
ACCUM = 16   # the measured v5e sweet spot (XLA chunks batches >=56 poorly)
IMG = 256
PATCH = 16
DEPTH = 12
DIM = 768
HEADS = 12
STEPS = 15
WARMUP = 3

# bf16 peak FLOP/s per chip by TPU generation (public specs).
PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_BF16.items():
        if key in kind:
            return val
    return 197e12  # default to v5e


def train_flops_per_image(num_tokens: int) -> float:
    """Dense matmul FLOPs: fwd = L * depth * (24 D^2 + 4 L D); train = 3x fwd
    (activation-recompute excluded; standard MFU convention)."""
    per_tok_layer = 24 * DIM * DIM + 4 * num_tokens * DIM
    fwd = num_tokens * DEPTH * per_tok_layer
    return 3.0 * fwd


def main():
    from ucf_vit_tpu.models import VIT
    from ucf_vit_tpu.ops.attention import AttnImpl
    from ucf_vit_tpu.utils.metrics import cross_entropy
    from ucf_vit_tpu.utils.optim import configure_optimizer
    from ucf_vit_tpu.parallel.train_step import TrainState, make_train_step, unbox

    model = VIT(
        img_size=(IMG, IMG),
        patch_size=PATCH,
        in_chans=3,
        num_classes=1000,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        class_token=True,
        default_vars=("r", "g", "b"),
        attn_impl=AttnImpl.AUTO,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, 3, IMG, IMG)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 1000, size=(BATCH,)))

    params = unbox(model.init(jax.random.key(0), x)["params"])
    tx = configure_optimizer(params, lr=1e-4, warmup_steps=100, max_steps=10000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )

    def loss_fn(params, batch, rng):
        logits = model.apply({"params": params}, batch["x"])
        return cross_entropy(logits, batch["y"])

    step = make_train_step(loss_fn, tx, donate=False, accum_steps=ACCUM)
    batch = {"x": x, "y": y}

    for i in range(WARMUP):
        state, loss, _ = step(state, batch, jax.random.key(i))
    float(loss)  # device->host transfer: hard sync (block_until_ready is not
    # reliable through the axon relay)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, batch, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * STEPS / dt
    num_tokens = (IMG // PATCH) ** 2 + 1
    flops = train_flops_per_image(num_tokens) * imgs_per_sec
    mfu = flops / peak_flops(jax.devices()[0])

    print(
        json.dumps(
            {
                "metric": "vit_b16_train_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/s/chip",
                "vs_baseline": round(mfu / 0.50, 4),
            }
        )
    )


if __name__ == "__main__":
    # refuse to publish host-CPU throughput under an images/s/chip metric
    # (auto-detect falls back to CPU when no TPU plugin is registered);
    # an explicit JAX_PLATFORMS=cpu still allows a deliberate host run
    bench_env.require_accelerator()
    main()
