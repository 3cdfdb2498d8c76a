"""All shipped configs load, validate, and build their task models."""

import glob
import os

import pytest

from ucf_vit_tpu.config import load_config
from ucf_vit_tpu.tasks import build_task

CONFIGS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "**", "*.yaml"),
              recursive=True)
)


def test_found_all_configs():
    # the reference's 8 workloads + the ViT-L scale-out variant + the
    # long-context sequence-parallel MAE + the pipeline-parallel ViT-L +
    # the expert-parallel MoE classifier (capability-plus)
    assert len(CONFIGS) == 12


@pytest.mark.parametrize("path", CONFIGS)
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    assert cfg.task in ("classification", "mae", "unetr", "sap", "diffusion")
    model, loss_fn = build_task(cfg)
    assert model is not None and callable(loss_fn)
    assert cfg.world_size >= 1


def test_moe_config_data_par_size_counts_ep_axis():
    """The mesh shards the batch over (ddp, ep, fsdp) — mesh.DATA_AXES — so
    data_par_size must count expert_par_size: the shipped MoE config's
    8-entry dataset_group_list (ddp 2 x ep 4) relies on it, and omitting ep
    fed every device batch_size/ep samples (round-3 review finding)."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "imagenet",
        "classification_moe", "base_config.yaml",
    )
    cfg = load_config(path)
    assert cfg.data_par_size == 8
    assert cfg.world_size == 8
