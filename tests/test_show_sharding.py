"""show_sharding tool: eval_shape-derived parameter sharding map (no devices)."""

import numpy as np
import yaml

from tests.test_trainer import _cfg


def _write_cfg(tmp_path, parallelism):
    cfg = _cfg("classification", extra_data={"num_classes": 3},
               parallelism=parallelism)
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg.raw, f)
    return str(path)


def test_collect_shard_factors_match_parallelism(tmp_path):
    """With tp=2 fsdp=2 the attention qkv kernel must report shard_factor 4
    (both axes hit it) and the total per-device bytes must shrink vs the
    all-ones mesh."""
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.tools.show_sharding import collect

    par = {"fsdp_size": 2, "simple_ddp_size": 1,
           "tensor_par_size": 2, "seq_par_size": 1}
    cfg = load_config(_write_cfg(tmp_path, par), task="classification")
    rows = collect(cfg)
    assert rows, "no parameters collected"

    by_name = {name: (shape, dtype, spec, f) for name, shape, dtype, spec, f
               in rows}
    qkv = [v for k, v in by_name.items() if "qkv/kernel" in k]
    assert qkv, f"qkv kernel missing from {sorted(by_name)[:5]}..."
    shape, _, spec, factor = qkv[0]
    assert factor == 4, (spec, factor)

    # factor must always divide the sharded dims' product (well-formed spec)
    for name, shape, dtype, spec, f in rows:
        assert int(np.prod(shape)) % f == 0, (name, shape, f)


def test_collect_all_ones_mesh_is_replicated(tmp_path):
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.tools.show_sharding import collect

    par = {"fsdp_size": 1, "simple_ddp_size": 1,
           "tensor_par_size": 1, "seq_par_size": 1}
    cfg = load_config(_write_cfg(tmp_path, par), task="classification")
    rows = collect(cfg)
    assert all(f == 1 for *_, f in rows)


def test_main_cli_prints_totals(tmp_path, capsys):
    from ucf_vit_tpu.tools.show_sharding import main

    par = {"fsdp_size": 2, "simple_ddp_size": 1,
           "tensor_par_size": 2, "seq_par_size": 1}
    main([_write_cfg(tmp_path, par), "--task", "classification"])
    out = capsys.readouterr().out
    assert "total:" in out and "per-device" in out
    main([_write_cfg(tmp_path, par), "--task", "classification", "--all"])
    out_all = capsys.readouterr().out
    assert "shard_factor=" in out_all
