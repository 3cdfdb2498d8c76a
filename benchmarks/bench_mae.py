"""MAE flagship benchmark: masked pretrain throughput + self-MFU on one chip.

The reference's flagship path is train_masked_fsdp (`SURVEY.md` §3.2). Workload:
ViT-B/16 encoder on 256^2 images, mask_ratio 0.75 (64 of 256 tokens kept),
512x8 transformer decoder — the imagenet MAE config's dims
(`configs/imagenet/mae/base_config.yaml`).

Self-MFU counts the masked model's OWN matmul FLOPs (encoder at N=64 +
decoder at N=256 + embed/pred projections), train = 3x fwd.

Usage: python benchmarks/bench_mae.py [seq_pack] [decoder_heads]

decoder_heads defaults to 4 (dh=128, the shipped config layout — fills the
128-deep MXU contraction exactly). Pass 16 to reproduce the MAE-paper
512/16 layout (dh=32, 25% lane fill): 1184 vs 1499 img/s/chip on v5e,
identical params/FLOPs — the lever that also won 1.77x on mae_long.
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

from bench import PEAK_BF16, peak_flops  # noqa: E402

BATCH = 384
ACCUM = 16
IMG = 256
PATCH = 16
DIM, DEPTH, HEADS = 768, 12, 12
DDIM, DDEPTH, DHEADS = 512, 8, 4  # dh=128: shipped config layout (BASELINE r3)
MASK_RATIO = 0.75
STEPS = 15
WARMUP = 3


def mae_train_flops_per_image() -> float:
    n = (IMG // PATCH) ** 2  # 256
    n_keep = int(n * (1 - MASK_RATIO))  # 64
    per_tok = lambda d, nn, mlp=4: (8 + 4 * mlp) * d * d + 4 * nn * d
    fwd = n_keep * DEPTH * per_tok(DIM, n_keep)
    fwd += n * DDEPTH * per_tok(DDIM, n)
    # patch embed (n_keep? embed runs pre-mask on all n), decoder_embed, pred
    fwd += n * 2 * (PATCH * PATCH * 3) * DIM          # patch embed, all n
    fwd += n_keep * 2 * DIM * DDIM                    # decoder_embed
    fwd += n * 2 * DDIM * (PATCH * PATCH * 3)         # decoder_pred
    return 3.0 * fwd


def main():
    seq_pack = int(sys.argv[1]) if len(sys.argv) > 1 else 2  # measured v5e sweet spot at dh=128
    dheads = int(sys.argv[2]) if len(sys.argv) > 2 else DHEADS
    from ucf_vit_tpu.models import MAE
    from ucf_vit_tpu.ops.attention import AttnImpl
    from ucf_vit_tpu.utils.metrics import masked_mse
    from ucf_vit_tpu.ops.patchify import patchify
    from ucf_vit_tpu.utils.optim import configure_optimizer
    from ucf_vit_tpu.parallel.train_step import TrainState, make_train_step, unbox

    kwargs = dict(
        img_size=(IMG, IMG),
        patch_size=PATCH,
        in_chans=3,
        num_classes=None,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        class_token=False,
        default_vars=("r", "g", "b"),
        attn_impl=AttnImpl.AUTO,
        dtype=jnp.bfloat16,
        mask_ratio=MASK_RATIO,
        decoder_embed_dim=DDIM,
        decoder_depth=DDEPTH,
        decoder_num_heads=dheads,
    )
    if seq_pack != 1:
        kwargs["seq_pack"] = seq_pack
    model = MAE(**kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, 3, IMG, IMG)), jnp.float32)

    params = unbox(
        model.init({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)[
            "params"
        ]
    )
    tx = configure_optimizer(params, lr=1e-4, warmup_steps=100, max_steps=10000)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )

    def loss_fn(params, batch, rng):
        pred, mask = model.apply(
            {"params": params}, batch["x"], rngs={"mask": rng}
        )
        target = patchify(batch["x"], PATCH, twoD=True)
        return masked_mse(pred, target, mask)

    step = make_train_step(loss_fn, tx, donate=False, accum_steps=ACCUM)
    batch = {"x": x}

    for i in range(WARMUP):
        state, loss, _ = step(state, batch, jax.random.key(i))
    float(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, loss, _ = step(state, batch, jax.random.key(i))
    float(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * STEPS / dt
    flops = mae_train_flops_per_image() * imgs_per_sec
    mfu = flops / peak_flops(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": "mae_vit_b16_train_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/s/chip",
                "seq_pack": seq_pack,
                "decoder_heads": dheads,
                "self_mfu": round(mfu, 4),
                "vs_baseline": round(mfu / 0.50, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
