"""MoE ViT-B/16 training throughput on one chip (capability-plus workload).

The reference has no MoE (SURVEY.md §2.5); this measures the V-MoE-style
sparse classifier shipped in `configs/imagenet/classification_moe`:
ViT-B/16 with an 8-expert top-2 mixture MLP in every 2nd block
(models/moe.py), on 256^2 tiles — ~3.3x the dense parameter count.

Self-MFU counts the MoE model's OWN executed matmul FLOPs: dense layers at
24 D^2 + 4 N D per token, MoE layers at 8 D^2 attention + the expert slots
actually computed (top_k * capacity_factor * 16 D^2 per token, capacity
padding included) + the dispatch/combine einsums (2 * 2 N E C D per
sample) + router. Train = 3x fwd.

Usage: python benchmarks/bench_moe.py [num_experts] [top_k] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()

import jax
import jax.numpy as jnp
import numpy as np

from bench import peak_flops  # noqa: E402

BATCH = 256
ACCUM = 16
IMG = 256
PATCH = 16
DIM, DEPTH, HEADS = 768, 12, 12
MOE_EVERY = 2
CAP = 1.25
STEPS = 15
WARMUP = 3


def moe_train_flops_per_image(n: int, e: int, k: int) -> float:
    from ucf_vit_tpu.models.moe import expert_capacity

    c = expert_capacity(n, e, k, CAP)
    attn = 8 * DIM * DIM + 4 * n * DIM  # qkv+proj + scores/values, per token
    dense_mlp = 16 * DIM * DIM
    moe_mlp = (e * c / n) * 16 * DIM * DIM  # all E*C slots computed
    moe_mlp += 2 * DIM * e  # router
    moe_mlp += 2 * 2 * e * c * DIM  # dispatch + combine einsums, per token
    n_moe = DEPTH // MOE_EVERY
    fwd = n * ((DEPTH - n_moe) * (attn + dense_mlp) + n_moe * (attn + moe_mlp))
    return 3.0 * fwd


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else BATCH

    from ucf_vit_tpu.models import VIT
    from ucf_vit_tpu.models.moe import collect_moe_aux
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
        moe_num_experts=e,
        moe_top_k=k,
        moe_every=MOE_EVERY,
        moe_capacity_factor=CAP,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 3, IMG, IMG)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 1000, size=(batch,)))

    params = unbox(model.init(jax.random.key(0), x)["params"])
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    tx = configure_optimizer(params, lr=1e-4, warmup_steps=100, max_steps=10000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )

    def loss_fn(params, batch_d, rng_):
        logits, mut = model.apply({"params": params}, batch_d["x"], mutable="moe")
        return cross_entropy(logits, batch_d["y"]) + 0.01 * collect_moe_aux(mut)

    step = make_train_step(loss_fn, tx, donate=False, accum_steps=ACCUM)
    batch_d = {"x": x, "y": y}

    for i in range(WARMUP):
        state, loss, _ = step(state, batch_d, jax.random.key(i))
    float(loss)  # hard sync (block_until_ready unreliable through the relay)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, batch_d, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * STEPS / dt
    n_tokens = (IMG // PATCH) ** 2 + 1
    flops = moe_train_flops_per_image(n_tokens, e, k) * imgs_per_sec
    mfu = flops / peak_flops(jax.devices()[0])

    print(
        json.dumps(
            {
                "metric": "moe_vit_b16_train_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/s/chip",
                "num_experts": e,
                "top_k": k,
                "params_m": round(n_params / 1e6, 1),
                "self_mfu": round(mfu, 4),
                "vs_baseline": round(mfu / 0.50, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
