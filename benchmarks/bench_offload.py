"""Optimizer-state host offload study — measured and REJECTED.

Measures the ViT-L/16 train step (304M params) with the streaming offload
formulation (make_train_step(offload_opt=True): AdamW moments in pinned
host, in-jit device_put roundtrip during the update) against the on-device
baseline. Result on TPU v5e (recorded in BASELINE.md round 3):

  offload=False: 189.5 ms/step, peak HBM 6.46 GiB
  offload=True:  469.8 ms/step, peak HBM 7.37 GiB   <- WORSE on both axes

Peak goes UP because XLA's buffer assignment keeps both the transferred-in
old moments and the new moments live on device across the roundtrip (no
transfer/compute aliasing); the step pays the full ~4.5 GiB PCIe cost. The
memory-correct alternative — running tx.update on the host via
jax.experimental.compute_on('device_host'), moments never entering HBM —
SIGABRTs this rig's remote TPU compile helper and hangs the CPU backend.
Hence no trainer config knob ships; the mechanism + this script remain so
the rejection is reproducible when XLA/jax versions move.

Usage: python benchmarks/bench_offload.py [batch] [accum] [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()


import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ACCUM = int(sys.argv[2]) if len(sys.argv) > 2 else 4
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
IMG, PATCH, DIM, DEPTH, HEADS = 256, 16, 1024, 24, 16


def main():
    from ucf_vit_tpu.models import VIT
    from ucf_vit_tpu.ops.attention import AttnImpl
    from ucf_vit_tpu.parallel import make_mesh
    from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
    from ucf_vit_tpu.parallel.train_step import (
        create_sharded_train_state,
        make_train_step,
    )
    from ucf_vit_tpu.utils.metrics import cross_entropy
    from ucf_vit_tpu.utils.optim import configure_optimizer

    model = VIT(
        img_size=(IMG, IMG), patch_size=PATCH, in_chans=3, num_classes=1000,
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, class_token=True,
        default_vars=("r", "g", "b"), attn_impl=AttnImpl.AUTO,
        dtype=jnp.bfloat16, remat=True, scan_layers=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, 3, IMG, IMG)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 1000, size=(BATCH,)))
    mesh = make_mesh(1, 1, 1, 1)

    def init_fn():
        return model.init({"params": jax.random.key(0)}, x)

    def loss_fn(params, batch, rng_):
        logits = model.apply({"params": params}, batch["x"])
        return cross_entropy(logits, batch["y"])

    results = {}
    for offload in (False, True):
        with mesh_context(mesh):
            params_shapes = jax.eval_shape(init_fn)["params"]
            tx = configure_optimizer(
                params_shapes, lr=1e-4, warmup_steps=100, max_steps=10000
            )
            state, _ = create_sharded_train_state(
                init_fn, tx, mesh, offload_opt=offload
            )
            step = make_train_step(
                loss_fn, tx, accum_steps=ACCUM, offload_opt=offload
            )
            batch = shard_batch(mesh, {"x": x, "y": y})

            # AOT peak from the same compiled step
            lowered = step.lower(state, batch, jax.random.key(0))
            ma = lowered.compile().memory_analysis()
            peak = int(ma.peak_memory_in_bytes)

            for i in range(3):
                state, loss, _ = step(state, batch, jax.random.key(i))
            float(loss)
            t0 = time.perf_counter()
            for i in range(STEPS):
                state, loss, _ = step(state, batch, jax.random.key(i))
            float(loss)
            dt = (time.perf_counter() - t0) / STEPS
            results[offload] = (dt, peak)
            kinds = {
                a.sharding.memory_kind
                for a in jax.tree.leaves(state.opt_state)
                if hasattr(a, "sharding")
            }
            print(
                f"offload={offload}: {dt * 1e3:.1f} ms/step "
                f"({BATCH / dt:.1f} img/s), peak HBM "
                f"{peak / (1 << 30):.2f} GiB, opt memory kinds {kinds}",
                flush=True,
            )

    (dt0, p0), (dt1, p1) = results[False], results[True]
    print(
        f"HBM freed {(p0 - p1) / (1 << 30):.2f} GiB; "
        f"step overhead {100 * (dt1 / dt0 - 1):.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
