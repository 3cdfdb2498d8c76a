"""Mid-epoch fast-forward speed: skip_batches vs full reprocessing.

Measures, through the real DataModule on a synthetic file tree shaped like
the config's dataset:
    full — produce the first K batches normally (what resuming costs if the
           interrupted epoch re-runs, the reference's only mode — and note
           the reference ALSO re-trains those batches, which this number
           doesn't even include)
    skip — train_dataloader(skip_batches=K) then pull batch K (what this
           framework's mid-epoch resume costs)

The skipped prefix still runs decode -> tile -> shuffle (state must advance
bit-exactly) but bypasses adaptive patchify + label serialization — the
dominant host cost for the 3D configs (BASELINE.md: 17-31 ms/sample).

Usage: python benchmarks/bench_fastforward.py <config.yaml> [K] [--files M]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()


from bench_pipeline import synth_ct_tree  # noqa: E402

from ucf_vit_tpu.config import load_config  # noqa: E402
from ucf_vit_tpu.train import build_dataloader  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg_path = argv[0]
    k = int(argv[1]) if len(argv) > 1 else 50
    n_files = int(argv[argv.index("--files") + 1]) if "--files" in argv else 8

    cfg = load_config(cfg_path)
    root = tempfile.mkdtemp(prefix="ff_")
    synth_ct_tree(root, cfg, n_files)
    key = list(cfg.data["dict_root_dirs"])[0]
    cfg.raw["data"]["dict_root_dirs"] = {key: root}
    # single host, synthetic tree: the shipped per-rank epoch accounting
    # doesn't apply (same normalization bench_pipeline.py does)
    cfg.raw["parallelism"] = {"fsdp_size": 1, "simple_ddp_size": 1,
                              "tensor_par_size": 1, "seq_par_size": 1}
    cfg.raw["load_balancing"] = {"auto_load_balancing": False}
    bs = int(cfg.batch_size)

    def fresh_dm():
        dm, _, _ = build_dataloader(cfg, bs, False)
        return dm

    # full: first K batches processed normally
    dm = fresh_dm()
    it = iter(dm.train_dataloader(loop=True))
    t0 = time.perf_counter()
    for _ in range(k):
        next(it)
    t_full = time.perf_counter() - t0

    # skip: fast-forward K batches, then pull batch K (included in the time
    # so both paths end having produced the same next-trainable batch)
    dm = fresh_dm()
    t0 = time.perf_counter()
    it = iter(dm.train_dataloader(loop=True, skip_batches=k))
    next(it)
    t_skip = time.perf_counter() - t0

    print(json.dumps({
        "metric": "midepoch_fastforward_speedup",
        "value": round(t_full / t_skip, 2),
        "unit": "x",
        "config": cfg.task,
        "skip_batches": k,
        "batch_size": bs,
        "full_s": round(t_full, 2),
        "skip_s": round(t_skip, 2),
    }))


if __name__ == "__main__":
    main()
