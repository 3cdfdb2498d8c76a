"""EMA weight tracking (`trainer.ema_decay`) — capability-plus over the
reference (which has no EMA anywhere): the update rides the jitted train
step, EMA state is checkpointed, resume reconciles on/off transitions, and
the inference CLI selects EMA weights with --ema."""

import numpy as np
import pytest

import jax

from tests.test_trainer import _cfg

from ucf_vit_tpu import checkpoint as ckpt
from ucf_vit_tpu.train import train


def _run(tmp_path, name, **trainer_extra):
    cfg = _cfg("classification", extra_data={"num_classes": 3})
    cfg.raw["load_balancing"]["batches_per_rank_epoch"] = {"synthetic": 3}
    cfg.raw["trainer"].update({
        "checkpoint_path": str(tmp_path / name),
        "checkpoint_filename": "m",
        "checkpoint_filename_for_loading": "m_latest",
        "seed": 0,
        **trainer_extra,
    })
    return cfg


@pytest.mark.parametrize("fsdp", [1, 2])
def test_ema_tracks_and_checkpoints(tmp_path, fsdp):
    cfg = _run(tmp_path, "a", ema_decay=0.9)
    cfg.raw["parallelism"]["fsdp_size"] = fsdp
    out = train(cfg, synthetic=True)
    assert np.isfinite(out["loss_list"]).all()

    payload = ckpt.restore_checkpoint(str(tmp_path / "a"), "m_latest")
    state = payload["state"]
    assert "ema_params" in state and state["ema_params"] is not None
    # EMA lags params (decay 0.9 over 3 steps cannot have converged)
    leaves_p = jax.tree.leaves(state["params"])
    leaves_e = jax.tree.leaves(state["ema_params"])
    assert any(
        not np.allclose(np.asarray(p), np.asarray(e))
        for p, e in zip(leaves_p, leaves_e)
    )
    # same tree structure — EMA is a full params shadow
    assert (
        jax.tree.structure(state["params"])
        == jax.tree.structure(state["ema_params"])
    )


def test_ema_resume_reconciliation(tmp_path):
    # checkpoint WITHOUT ema, resume WITH ema: seeds EMA from params
    cfg = _run(tmp_path, "b")
    train(cfg, synthetic=True)
    cfg2 = _run(tmp_path, "b", ema_decay=0.9, resume_from_checkpoint=True)
    cfg2.raw["trainer"]["max_epochs"] = 2
    out = train(cfg2, synthetic=True)
    assert np.isfinite(out["loss_list"]).all()
    payload = ckpt.restore_checkpoint(str(tmp_path / "b"), "m_latest")
    assert "ema_params" in payload["state"]

    # checkpoint WITH ema, resume WITHOUT: EMA dropped cleanly
    cfg3 = _run(tmp_path, "b", resume_from_checkpoint=True)
    cfg3.raw["trainer"]["max_epochs"] = 3
    out = train(cfg3, synthetic=True)
    assert np.isfinite(out["loss_list"]).all()
    payload = ckpt.restore_checkpoint(str(tmp_path / "b"), "m_latest")
    assert payload["state"].get("ema_params") is None


def test_inference_ema_flag(tmp_path):
    from ucf_vit_tpu.inference import evaluate

    cfg = _run(tmp_path, "c", ema_decay=0.5)
    train(cfg, synthetic=True)
    top1 = evaluate(cfg, str(tmp_path / "c"), synthetic=True, num_samples=4,
                    use_ema=True)
    assert np.isfinite(top1)

    # --ema against a non-EMA checkpoint must fail loudly, not silently
    # evaluate the raw weights
    cfg2 = _run(tmp_path, "d")
    train(cfg2, synthetic=True)
    with pytest.raises(AssertionError, match="ema"):
        evaluate(cfg2, str(tmp_path / "d"), synthetic=True, num_samples=4,
                 use_ema=True)


def test_ema_decay_validated():
    cfg = _run_path_free = _cfg("classification", extra_data={"num_classes": 3})
    cfg.raw["trainer"]["ema_decay"] = 1.5
    with pytest.raises(AssertionError, match="ema_decay"):
        train(cfg, max_steps=1, synthetic=True)
