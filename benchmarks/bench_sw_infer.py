"""Sliding-window stitched volume segmentation throughput on one chip.

Drives `inference.predict_volume` (capability-plus: the reference evaluates
per-tile only) on the shipped basic_ct UNETR model: a 128^3 synthetic CT
volume segmented through 64^3 adaptive windows at the given overlap. The
measurement includes everything a deployment pays: host-side window
extraction + adaptive patchify (quadtree serializer), the batched
fixed-shape jitted tile forward, and the Gaussian-blended accumulation.

Usage: python benchmarks/bench_sw_infer.py [overlap] [sw_batch] [vol_side]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()


REPS = 3


def main():
    overlap = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    sw_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    side = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.inference import VolumePredictor

    cfg = load_config("configs/basic_ct/unetr/base_config.yaml")
    rng = np.random.default_rng(0)
    vol = rng.random((1, side, side, side), dtype=np.float32)

    # build once (params + ONE jitted tile forward held across volumes —
    # the deployment steady state); first call pays the XLA compile
    predictor = VolumePredictor(cfg, sw_batch=sw_batch)
    t_first = time.perf_counter()
    pred = predictor(vol, overlap=overlap)
    compile_s = time.perf_counter() - t_first
    assert pred.shape == vol.shape[1:]

    t0 = time.perf_counter()
    for _ in range(REPS):
        predictor(vol, overlap=overlap)
    dt = (time.perf_counter() - t0) / REPS

    tile = int(cfg.tile_size[0])
    stride = max(1, int(round(tile * (1.0 - overlap))))
    n_starts = len(range(0, side - tile + 1, stride))
    if (n_starts - 1) * stride != side - tile:
        n_starts += 1
    n_windows = n_starts ** 3

    print(
        json.dumps(
            {
                "metric": "unetr_sw_volume_seconds",
                "value": round(dt, 3),
                "unit": f"s per {side}^3 volume",
                "overlap": overlap,
                "sw_batch": sw_batch,
                "windows": n_windows,
                "windows_per_sec": round(n_windows / dt, 2),
                "first_call_s": round(compile_s, 1),
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
