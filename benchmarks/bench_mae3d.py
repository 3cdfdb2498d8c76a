"""3D MAE pretrain benchmark: the long-sequence workload on one chip.

64^3 CT tiles at patch 4 -> 4096 patches; mask 0.75 keeps 1024 encoder
tokens; the 576x8 decoder runs the full 4096-token sequence — above the
einsum/flash crossover, so this is the end-to-end exercise of the Pallas
flash-attention kernel (fused single-kernel backward) inside a real
training step. Encoder dims match the reference's basic_ct MAE config
(`configs/basic_ct/mae/base_config.yaml`); this variant runs the volume
natively in 3D instead of the shipped 2D-adaptive slicing.

Usage: python benchmarks/bench_mae3d.py [batch] [accum] [decoder_heads]

decoder_heads defaults to 16 (dh=36, the reference layout); 6 gives dh=96
(75% MXU lane fill in the N=4096 attention contractions).
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

TILE = 64
PATCH = 4
DIM, DEPTH, HEADS = 768, 12, 12
DDIM, DDEPTH, DHEADS = 576, 8, 6  # dh=96: shipped config layout (BASELINE r3)
MASK_RATIO = 0.75
STEPS = 10
WARMUP = 2


def train_flops_per_volume() -> float:
    n = (TILE // PATCH) ** 3  # 4096
    n_keep = int(n * (1 - MASK_RATIO))  # 1024
    per_tok = lambda d, nn, mlp=4: (8 + 4 * mlp) * d * d + 4 * nn * d
    fwd = n_keep * DEPTH * per_tok(DIM, n_keep)
    fwd += n * DDEPTH * per_tok(DDIM, n)
    fwd += n * 2 * (PATCH ** 3) * DIM  # patch embed
    fwd += n_keep * 2 * DIM * DDIM
    fwd += n * 2 * DDIM * (PATCH ** 3)
    return 3.0 * fwd


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dheads = int(sys.argv[3]) if len(sys.argv) > 3 else DHEADS
    from ucf_vit_tpu.models import MAE
    from ucf_vit_tpu.ops.attention import AttnImpl
    from ucf_vit_tpu.ops.patchify import patchify
    from ucf_vit_tpu.utils.metrics import masked_mse
    from ucf_vit_tpu.utils.optim import configure_optimizer
    from ucf_vit_tpu.parallel.train_step import TrainState, make_train_step, unbox

    model = MAE(
        img_size=(TILE, TILE, TILE),
        patch_size=PATCH,
        in_chans=1,
        num_classes=None,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        class_token=False,
        twoD=False,
        default_vars=("ct",),
        attn_impl=AttnImpl.AUTO,
        dtype=jnp.bfloat16,
        mask_ratio=MASK_RATIO,
        decoder_embed_dim=DDIM,
        decoder_depth=DDEPTH,
        decoder_num_heads=dheads,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, TILE, TILE, TILE)), jnp.float32)
    params = unbox(
        model.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)[
            "params"
        ]
    )
    tx = configure_optimizer(params, lr=1e-4, warmup_steps=100, max_steps=10000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )

    def loss_fn(params, b, rng):
        pred, mask = model.apply({"params": params}, b["x"], rngs={"mask": rng})
        target = patchify(b["x"], PATCH, twoD=False)
        return masked_mse(pred, target, mask)

    step = make_train_step(loss_fn, tx, donate=False, accum_steps=accum)
    b = {"x": x}
    for i in range(WARMUP):
        state, loss, _ = step(state, b, jax.random.key(i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, b, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0
    vps = batch * STEPS / dt
    mfu = train_flops_per_volume() * vps / peak_flops(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": "mae3d_vit_b4_train_volumes_per_sec_per_chip",
                "value": round(vps, 2),
                "unit": "volumes/s/chip",
                "batch": batch,
                "accum": accum,
                "decoder_heads": dheads,
                "self_mfu": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
