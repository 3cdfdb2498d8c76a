"""Autotune tool: AOT fit search + device measurement (tiny model, CPU)."""

import yaml

from tests.test_trainer import _cfg


def _write_cfg(tmp_path):
    cfg = _cfg("classification", extra_data={"num_classes": 3})
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg.raw, f)
    return str(path)


def test_autotune_hits_cap_with_generous_budget(tmp_path):
    from ucf_vit_tpu.tools.autotune import autotune

    path = _write_cfg(tmp_path)
    out = autotune(path, task="classification", hbm_gb=4.0, max_batch=4,
                   verbose=False)
    entry = out["variants"]["base"]
    assert entry["max_batch"] == 4
    assert out["recommendation"]["data.batch_size"] == 4


def test_autotune_impossible_budget(tmp_path):
    from ucf_vit_tpu.tools.autotune import autotune

    path = _write_cfg(tmp_path)
    out = autotune(path, task="classification", hbm_gb=1e-6, max_batch=4,
                   verbose=False)
    assert out["variants"]["base"]["max_batch"] == 0


def test_autotune_bounded_budget_returns_fitting_batch(tmp_path):
    """With a budget set just above batch-2's peak, the search must return a
    batch >= 2 whose own report fits the budget."""
    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.tools.autotune import FIT_FRACTION, find_max_batch
    from ucf_vit_tpu.tools.memory_report import analyze

    path = _write_cfg(tmp_path)
    rep2 = analyze(load_config(path, task="classification"), batch=2)
    budget = int(rep2["peak_hbm_bytes"] / FIT_FRACTION) + 1024
    best, rep, reports = find_max_batch(
        load_config(path, task="classification"), budget, max_batch=64
    )
    assert best >= 2
    assert rep["peak_hbm_bytes"] <= FIT_FRACTION * budget
    # the probe after the winner (if any) must NOT have fit
    probed_above = [b for b in reports if b > best]
    for b in probed_above[:1]:
        assert reports[b]["peak_hbm_bytes"] > FIT_FRACTION * budget


def test_autotune_measure_path(tmp_path):
    """--measure times the real train step at the fitting batches and picks
    the throughput winner from among them."""
    from ucf_vit_tpu.tools.autotune import autotune

    path = _write_cfg(tmp_path)
    out = autotune(path, task="classification", hbm_gb=4.0, max_batch=2,
                   measure=True, steps=1, verbose=False)
    entry = out["variants"]["base"]
    assert entry["max_batch"] == 2
    assert set(entry["samples_per_s"]) == {1, 2}
    assert all(v > 0 for v in entry["samples_per_s"].values())
    assert entry["best_batch"] in (1, 2)
    assert out["recommendation"]["data.batch_size"] == entry["best_batch"]
