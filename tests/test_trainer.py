"""End-to-end trainer smoke tests (tiny models, synthetic data, CPU mesh)."""

import yaml

from ucf_vit_tpu.config import Config
from ucf_vit_tpu.train import train


def _cfg(task, extra_init=None, parallelism=None, extra_data=None):
    init = {
        "default_vars": ["v"],
        "tile_size": [16, 16],
        "patch_size": 8,
        "embed_dim": 16,
        "depth": 2,
        "num_heads": 2,
        "mlp_ratio": 4,
        "twoD": True,
        "adaptive_patching": False,
    }
    init.update(extra_init or {})
    data = {
        "dataset": "basic_ct",
        "dict_root_dirs": {}, "dict_start_idx": {}, "dict_end_idx": {},
        "dict_buffer_sizes": {}, "num_channels_used": {"d": 1},
        "dict_in_variables": {}, "batch_size": 2, "single_channel": True,
        "tile_overlap": 0.0, "use_all_data": False,
    }
    data.update(extra_data or {})
    raw = {
        "trainer": {"task": task, "max_epochs": 1},
        "parallelism": parallelism or {
            "fsdp_size": 1, "simple_ddp_size": 1,
            "tensor_par_size": 1, "seq_par_size": 1,
        },
        "model": {"lr": 1e-3, "warmup_steps": 2, "max_steps": 10,
                  "net": {"init_args": init}},
        "data": data,
        "load_balancing": {"auto_load_balancing": False},
    }
    return Config(raw=raw, task=task)


def test_train_classification_synthetic():
    cfg = _cfg("classification", extra_data={"num_classes": 3})
    out = train(cfg, max_steps=2, synthetic=True)
    assert len(out["loss_list"]) == 1


def test_train_mae_on_mesh():
    cfg = _cfg(
        "mae",
        extra_init={"decoder_embed_dim": 8, "decoder_depth": 1,
                    "decoder_num_heads": 2, "mask_ratio": 0.75,
                    "mlp_ratio_decoder": 4},
        parallelism={"fsdp_size": 2, "simple_ddp_size": 2,
                     "tensor_par_size": 2, "seq_par_size": 1},
    )
    out = train(cfg, max_steps=2, synthetic=True)
    assert len(out["loss_list"]) == 1
