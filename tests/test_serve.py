"""Serving tests: micro-batcher coalescing/padding semantics, HTTP
round-trip equivalence with the direct jitted forward, adaptive
preprocessing, and the diffusion generate endpoint.

The server exists because the reference ships offline eval scripts only
(`inference_unetr_simple.py` hard-codes bs=1); these tests pin the
capability-plus contract: every response must equal the direct forward of
the same sample — batching and padding are invisible to the client."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.config import Config
from ucf_vit_tpu.serve import (
    MicroBatcher,
    build_predictor,
    make_preprocessor,
    make_server,
)


def _cfg(task, extra_init=None, extra_data=None):
    init = {
        "default_vars": ["v"],
        "tile_size": [16, 16],
        "patch_size": 8,
        "embed_dim": 16,
        "depth": 1,
        "num_heads": 2,
        "mlp_ratio": 2,
        "twoD": True,
        "adaptive_patching": False,
    }
    init.update(extra_init or {})
    data = {
        "dataset": "basic_ct",
        "dict_root_dirs": {}, "dict_start_idx": {}, "dict_end_idx": {},
        "dict_buffer_sizes": {}, "num_channels_used": {"d": 1},
        "dict_in_variables": {}, "batch_size": 4, "single_channel": True,
        "tile_overlap": 0.0, "use_all_data": False,
    }
    data.update(extra_data or {})
    raw = {
        "trainer": {"task": task, "max_epochs": 1},
        "parallelism": {"fsdp_size": 1, "simple_ddp_size": 1,
                        "tensor_par_size": 1, "seq_par_size": 1},
        "model": {"lr": 1e-3, "warmup_steps": 2, "max_steps": 10,
                  "net": {"init_args": init}},
        "data": data,
        "load_balancing": {"auto_load_balancing": False},
    }
    return Config(raw=raw, task=task)


# ---------------------------------------------------------------------------
# micro-batcher unit semantics
# ---------------------------------------------------------------------------


def test_microbatcher_coalesces_and_pads():
    calls = []

    def run_batch(batch):
        x = batch["x"]
        assert x.shape[0] == 4, "batch must be padded to the fixed shape"
        calls.append(x.shape[0])
        return x * 2.0

    mb = MicroBatcher(run_batch, max_batch=4, max_wait_ms=200.0)
    try:
        samples = [np.full((3,), float(i)) for i in range(3)]
        outs = [None] * 3

        def worker(i):
            outs[i] = mb.submit({"x": samples[i]})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            np.testing.assert_allclose(outs[i], samples[i] * 2.0)
        # 3 concurrent requests within a 200 ms window -> one padded batch
        assert mb.stats["batches"] == 1
        assert mb.stats["batch_fill_sum"] == 3
        assert mb.stats["requests"] == 3

        # a lone request departs after the window, padded to 4
        np.testing.assert_allclose(
            mb.submit({"x": np.ones((3,))}), 2.0 * np.ones((3,))
        )
        assert mb.stats["batches"] == 2
    finally:
        mb.close()


def test_microbatcher_propagates_errors():
    def run_batch(batch):
        raise ValueError("boom")

    mb = MicroBatcher(run_batch, max_batch=2, max_wait_ms=1.0)
    try:
        try:
            mb.submit({"x": np.ones((2,))})
            raise AssertionError("expected the forward's error to propagate")
        except ValueError as e:
            assert "boom" in str(e)
        assert mb.stats["errors"] == 1
    finally:
        mb.close()


def test_microbatcher_pipeline_depth_1():
    """With pipeline_depth=1 the dispatched batch is materialized one batch
    late (or as soon as the queue idles), and every waiter still gets its
    own row — including through a burst of sequential lone requests, where
    the idle-queue drain must prevent a request from waiting forever."""

    def run_batch(batch):
        return batch["x"] * 2.0

    mb = MicroBatcher(run_batch, max_batch=4, max_wait_ms=20.0,
                      pipeline_depth=1)
    try:
        # sequential lone requests: each must return without a successor
        for i in range(3):
            np.testing.assert_allclose(
                mb.submit({"x": np.full((3,), float(i))}),
                2.0 * np.full((3,), float(i)),
            )
        # concurrent burst
        outs = [None] * 6

        def worker(i):
            outs[i] = mb.submit({"x": np.full((3,), float(i))})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            np.testing.assert_allclose(outs[i], 2.0 * np.full((3,), float(i)))
        assert mb.stats["requests"] == 9
        # device-side errors surface at materialization, scoped per group
        mb.run_batch = lambda batch: (_ for _ in ()).throw(ValueError("late"))
        try:
            mb.submit({"x": np.ones((3,))})
            raise AssertionError("expected the deferred error to propagate")
        except ValueError as e:
            assert "late" in str(e)
    finally:
        mb.close()


# ---------------------------------------------------------------------------
# HTTP round trip == direct forward
# ---------------------------------------------------------------------------


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.read()


def _get_json(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def test_serve_classification_http_roundtrip():
    cfg = _cfg("classification", extra_data={"num_classes": 3})
    server = make_server(cfg, host="127.0.0.1", port=0, max_batch=4,
                         max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        assert _get_json(f"http://127.0.0.1:{port}/healthz")["status"] == "ok"

        # the same weights, outside the server, are the oracle
        run_batch, preprocess, mb, _ = build_predictor(cfg, max_batch=4)
        rng = np.random.default_rng(7)
        for i in range(3):
            x = rng.normal(size=(1, 16, 16)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, x)
            out = np.load(io.BytesIO(_post(
                f"http://127.0.0.1:{port}/v1/predict", buf.getvalue(),
                "application/x-npy",
            )))
            direct = run_batch(
                {k: np.stack([v] * 4) for k, v in preprocess(x).items()}
            )[0]
            np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)
            assert out.shape == (3,)

        stats = _get_json(f"http://127.0.0.1:{port}/v1/stats")
        assert stats["requests"] == 3 and stats["errors"] == 0
        assert stats["max_batch"] == 4

        # malformed body -> 400, not a crash
        try:
            _post(f"http://127.0.0.1:{port}/v1/predict", b"not npy",
                  "application/x-npy")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_serve_unetr_adaptive_predict():
    # 2D adaptive UNETR: preprocessing runs the real quadtree patchify, the
    # response is an argmax class map over the sqrt-len pseudo-image space
    cfg = _cfg(
        "unetr",
        extra_init={"adaptive_patching": True, "fixed_length": 16,
                    "patch_size": 4, "num_classes": 2, "depth": 4,
                    "use_adaptive_pos_emb": True, "feature_size": 4,
                    "skip_connection": True},
        extra_data={"num_classes": 2},
    )
    run_batch, preprocess, mb, _ = build_predictor(cfg, max_batch=2)
    x = np.random.default_rng(0).random((1, 16, 16)).astype(np.float32)
    sample = preprocess(x)
    assert set(sample) >= {"x", "seq", "seq_size", "seq_pos"}
    assert sample["seq"].shape == (1, 16, 16)  # [C, L, p^2]
    out = run_batch({k: np.stack([v] * 2) for k, v in sample.items()})
    assert out.shape[0] == 2 and out.dtype == np.int32
    assert set(np.unique(out)) <= {0, 1}

    # deterministic serving: identical request -> identical tree -> output
    sample2 = preprocess(x)
    np.testing.assert_array_equal(sample["seq_pos"], sample2["seq_pos"])


def test_serve_mae_reconstruction_shape():
    cfg = _cfg(
        "mae",
        extra_init={"decoder_embed_dim": 8, "decoder_depth": 1,
                    "decoder_num_heads": 2, "mask_ratio": 0.75,
                    "mlp_ratio_decoder": 2},
    )
    run_batch, preprocess, mb, _ = build_predictor(cfg, max_batch=2)
    x = np.random.default_rng(1).normal(size=(1, 16, 16)).astype(np.float32)
    out = run_batch({k: np.stack([v] * 2) for k, v in preprocess(x).items()})
    # non-adaptive MAE serves the unpatchified reconstruction
    assert out.shape == (2, 1, 16, 16)
    # fixed mask key: the reconstruction is reproducible
    out2 = run_batch({k: np.stack([v] * 2) for k, v in preprocess(x).items()})
    np.testing.assert_allclose(out, out2)


def test_serve_diffusion_generate():
    cfg = _cfg(
        "diffusion",
        extra_init={"decoder_embed_dim": 8, "decoder_depth": 1,
                    "decoder_num_heads": 2, "mlp_ratio_decoder": 2,
                    "num_time_steps": 4},
    )
    server = make_server(cfg, host="127.0.0.1", port=0, num_generate=2)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"num": 2, "seed": 3}).encode()
        out = np.load(io.BytesIO(_post(
            f"http://127.0.0.1:{port}/v1/generate", body, "application/json"
        )))
        assert out.shape == (2, 1, 16, 16)
        assert np.isfinite(out).all()
        # /v1/predict is not served for diffusion
        try:
            _post(f"http://127.0.0.1:{port}/v1/predict", b"x",
                  "application/x-npy")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_serve_hot_reload(tmp_path):
    """POST /v1/reload swaps weights without restarting or recompiling:
    predictions change to match the new checkpoint's params, /v1/stats
    reports the new epoch, and a bad checkpoint path returns 400."""
    import jax

    from ucf_vit_tpu import checkpoint as ckpt
    from ucf_vit_tpu.parallel.train_step import TrainState

    cfg = _cfg("classification", extra_data={"num_classes": 3})
    # '_latest' resolves the newest even/odd slot — the natural production
    # reload flow ("pick up whatever training last committed")
    cfg.raw["trainer"]["checkpoint_filename_for_loading"] = "srv_latest"
    server = make_server(cfg, host="127.0.0.1", port=0, max_batch=2,
                         max_wait_ms=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        x = np.random.default_rng(3).normal(size=(1, 16, 16)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        body = buf.getvalue()
        url = f"http://127.0.0.1:{port}"
        before = np.load(io.BytesIO(_post(
            f"{url}/v1/predict", body, "application/x-npy")))

        # write a checkpoint with DIFFERENT weights (fresh init, other seed)
        _, _, _, (_, holder, _) = build_predictor(cfg, max_batch=2, seed=0)
        other = jax.tree.map(
            lambda a: np.asarray(a) + 0.05, holder["params"]
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=other, opt_state={}
        )
        ckpt.save_checkpoint(
            str(tmp_path), "srv", epoch=7, state=state,
            head_meta=ckpt.head_meta_from_config(cfg),
        )

        resp = json.loads(_post(
            f"{url}/v1/reload",
            json.dumps({"checkpoint": str(tmp_path)}).encode(),
            "application/json",
        ))
        assert resp == {"status": "reloaded", "epoch": 7}
        after = np.load(io.BytesIO(_post(
            f"{url}/v1/predict", body, "application/x-npy")))
        assert not np.allclose(before, after), "reload did not change weights"
        stats = _get_json(f"{url}/v1/stats")
        assert stats["checkpoint_epoch"] == 7

        # bad path -> 400, serving keeps the last-good weights
        try:
            _post(f"{url}/v1/reload",
                  json.dumps({"checkpoint": str(tmp_path / "nope")}).encode(),
                  "application/json")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        again = np.load(io.BytesIO(_post(
            f"{url}/v1/predict", body, "application/x-npy")))
        np.testing.assert_allclose(again, after, atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()


def test_preprocess_pool_matches_inprocess():
    """--preprocess-workers: pooled adaptive preprocessing is byte-identical
    to the in-process path (fixed-index augmentation RNG makes workers
    interchangeable), and repeated identical requests produce identical
    trees — per request, not merely per process lifetime."""
    cfg = _cfg(
        "unetr",
        extra_init={"adaptive_patching": True, "fixed_length": 16,
                    "patch_size": 4, "num_classes": 2,
                    "use_adaptive_pos_emb": True, "feature_size": 4,
                    "skip_connection": True},
        extra_data={"num_classes": 2},
    )
    local = make_preprocessor(cfg)
    pooled = make_preprocessor(cfg, workers=2)
    rng = np.random.default_rng(3)
    for _ in range(3):
        x = rng.random((1, 16, 16)).astype(np.float32)
        a, b = local(x), pooled(x)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # per-request determinism: same input again -> identical output
        a2 = local(x)
        for k in a:
            np.testing.assert_array_equal(a[k], a2[k], err_msg=k)
