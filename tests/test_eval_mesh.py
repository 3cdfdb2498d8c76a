"""Mesh-aware evaluation: when `parallelism:` spans more than one device the
inference CLI runs the same GSPMD surface as training (weights sharded per
LOGICAL_RULES, batches data-parallel). Sharded eval must reproduce
single-device eval exactly — same deterministic init, same synthetic
samples (capability-plus: the reference evaluates one GPU per process,
`inference_unetr_simple.py:160`)."""

import numpy as np

from ucf_vit_tpu.inference import evaluate, evaluate_classification


def test_classification_eval_sharded_matches_single():
    from tests.test_trainer import _cfg

    def make(par):
        cfg = _cfg("classification", extra_data={"num_classes": 3})
        cfg.raw["data"]["batch_size"] = 4
        if par:
            cfg.raw["parallelism"] = par
        return cfg

    t_single = evaluate_classification(make(None), synthetic=True,
                                       num_samples=8)
    t_mesh = evaluate_classification(
        make({"simple_ddp_size": 2, "fsdp_size": 2, "tensor_par_size": 2,
              "seq_par_size": 1}),
        synthetic=True, num_samples=8,
    )
    assert np.isfinite(t_single) and np.isfinite(t_mesh)
    assert np.isclose(t_single, t_mesh, atol=1e-6), (t_single, t_mesh)


def test_sap_eval_sharded_matches_single():
    from tests.test_inference import _sap_cfg

    def run(par):
        cfg = _sap_cfg("/nonexistent", twoD=True)  # synthetic: root unused
        if par:
            cfg.raw["parallelism"] = par
        return evaluate(cfg, synthetic=True, num_samples=2, batch_size=2)

    d_single = run(None)
    d_mesh = run({"simple_ddp_size": 2, "fsdp_size": 1,
                  "tensor_par_size": 1, "seq_par_size": 1})
    assert np.isfinite(d_single) and np.isfinite(d_mesh)
    assert np.isclose(d_single, d_mesh, atol=1e-5), (d_single, d_mesh)


def test_diffusion_sampling_sharded_matches_single(tmp_path):
    """DDPM sampling with the batch sharded over a ddp mesh must produce
    the same images as single-device sampling for the same key (noise draws
    are sharding-invariant)."""
    from tests.test_trainer import _cfg
    from ucf_vit_tpu.inference import generate_diffusion

    def run(par):
        cfg = _cfg(
            "diffusion",
            extra_init={"decoder_embed_dim": 8, "decoder_depth": 1,
                        "decoder_num_heads": 2, "mlp_ratio_decoder": 4,
                        "num_time_steps": 4},
        )
        if par:
            cfg.raw["parallelism"] = par
        sps, imgs = generate_diffusion(cfg, num_samples=4,
                                       return_images=True)
        assert np.isfinite(sps) and sps > 0
        return imgs

    i1 = run(None)
    i2 = run({"simple_ddp_size": 4, "fsdp_size": 1, "tensor_par_size": 1,
              "seq_par_size": 1})
    assert i1.shape == i2.shape and i1.shape[0] == 4
    np.testing.assert_allclose(i1, i2, atol=1e-5)


def test_serve_generator_sharded_matches_single():
    """serve.build_generator with a ddp mesh == single-device generation
    for the same seed (the serving twin of the sampling test above)."""
    from tests.test_trainer import _cfg
    from ucf_vit_tpu.inference import _eval_mesh, _init_eval_params
    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import example_batch
    from ucf_vit_tpu.serve import build_generator

    def run(par):
        cfg = _cfg(
            "diffusion",
            extra_init={"decoder_embed_dim": 8, "decoder_depth": 1,
                        "decoder_num_heads": 2, "mlp_ratio_decoder": 4,
                        "num_time_steps": 3},
        )
        if par:
            cfg.raw["parallelism"] = par
        model, _ = build_task(cfg)
        ex = example_batch(cfg, 4)
        mesh = _eval_mesh(cfg)
        params, _ = _init_eval_params(model, cfg, ex, None, mesh)
        gen = build_generator(cfg, params, model, 4, mesh=mesh)
        return gen(seed=3)

    single = run(None)
    sharded = run({"simple_ddp_size": 2, "fsdp_size": 2,
                   "tensor_par_size": 1, "seq_par_size": 1})
    np.testing.assert_allclose(single, sharded, atol=1e-5)


def test_serving_sharded_matches_single():
    """build_predictor on a ddp2 x tp2 mesh must produce the same logits as
    single-device serving (same deterministic init), through the real
    run_batch path (filtered keys + sharded device_put)."""
    from tests.test_serve import _cfg as serve_cfg
    from ucf_vit_tpu.serve import build_predictor
    from ucf_vit_tpu.train import example_batch

    def run(par):
        cfg = serve_cfg("classification", extra_data={"num_classes": 3})
        if par:
            cfg.raw["parallelism"] = par
        run_batch, _, mb, _ = build_predictor(cfg, max_batch=4)
        batch = {
            k: v for k, v in example_batch(cfg, 4).items()
            if isinstance(v, np.ndarray)
        }
        return np.asarray(run_batch(batch))

    single = run(None)
    sharded = run({"simple_ddp_size": 2, "fsdp_size": 1,
                   "tensor_par_size": 2, "seq_par_size": 1})
    assert single.shape == sharded.shape
    np.testing.assert_allclose(single, sharded, atol=2e-5)


def test_eval_mesh_falls_back_when_too_few_devices():
    """A training config asking for more devices than the eval host has must
    fall back to single-device eval, not crash (routine: eval a pod config
    on one chip)."""
    from tests.test_trainer import _cfg
    from ucf_vit_tpu.inference import _eval_mesh

    cfg = _cfg("classification", extra_data={"num_classes": 3})
    cfg.raw["parallelism"] = {"simple_ddp_size": 64, "fsdp_size": 1,
                              "tensor_par_size": 1, "seq_par_size": 1}
    assert _eval_mesh(cfg) is None
