"""Batched online inference serving (`ucf-vit-serve`).

TPU-first serving design:

- **One executable per deployment.** The forward is jitted at a FIXED
  ``[max_batch, ...]`` shape; the micro-batcher pads every departing batch
  to that shape, so XLA compiles exactly once and every request rides the
  same cached executable (static shapes keep the MXU tiling stable; no
  retrace, no recompile jitter at p99).
- **Dynamic micro-batching.** Concurrent requests arriving within
  ``max_wait_ms`` of each other are coalesced into one forward pass — the
  throughput lever on an accelerator is batch occupancy, not thread count.
  A lone request still departs after the wait bound, so worst-case added
  latency is ``max_wait_ms`` + one forward.
- **stdlib front end.** ``ThreadingHTTPServer`` + raw ``.npy`` bodies: no
  third-party server or RPC dependency. Endpoints: ``POST /v1/predict``
  (one ``np.save``-encoded sample in, one ``.npy`` prediction out),
  ``POST /v1/generate`` (diffusion sampling), ``GET /healthz`` and
  ``GET /v1/stats`` for deployment probes.

Capability-plus over the reference, which ships offline eval scripts only
(`inference_scripts/inference_unetr_simple.py:160` hard-codes bs=1 and a
dataset on disk) and leaves deployment to users (`README.md:969`); this
module fills the production-serving slot. Preprocessing (including 2D/3D
adaptive patchify) reuses the training pipeline's ``ProcessChannels``
sample maker, so served inputs see the exact layout the model trained on.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu import checkpoint as ckpt
from ucf_vit_tpu.config import Config
from ucf_vit_tpu.tasks import (
    _seq_ps,
    build_task,
    reassemble_sqrt_len,
)
from ucf_vit_tpu.train import _init_variables, example_batch


# ---------------------------------------------------------------------------
# preprocessing: one raw sample -> the model's batch-dict layout
# ---------------------------------------------------------------------------


def make_preprocessor(
    cfg: Config, workers: int = 0
) -> Callable[[np.ndarray], Dict[str, np.ndarray]]:
    """Returns ``pre(sample) -> {key: array}`` (no batch dim).

    Non-adaptive configs take the tensor the model consumes directly:
    ``[C, *tile]`` float32. Adaptive configs take the same raw ``[C, *tile]``
    tile and run the training pipeline's patchify (quadtree/octree serialize
    via ``ProcessChannels._make_sample``), so serving-time token layouts are
    bit-identical to training's.

    Augmentation draws use the per-sample-index RNG at a FIXED index, so
    identical requests produce identical trees — per request, not merely per
    process lifetime (an instance rng would advance between requests).

    ``workers > 0`` runs the patchify in a spawn process pool: HTTP handler
    threads submit and block, so concurrent requests preprocess on separate
    cores instead of serializing on the GIL-bound tree build (the serving
    bench's measured host ceiling, BASELINE.md r3). Output is byte-identical
    to the in-process path (the fixed-index RNG makes workers
    interchangeable)."""
    nd = 2 if cfg.twoD else 3
    tile = tuple(cfg.tile_size[:nd])
    c = cfg.max_channels
    expect = (c,) + tile

    if not cfg.adaptive_patching:
        def pre(arr: np.ndarray) -> Dict[str, np.ndarray]:
            arr = np.asarray(arr, dtype=np.float32)
            if arr.shape != expect:
                raise ValueError(
                    f"expected input shape {expect} [C, *tile], got {arr.shape}"
                )
            return {"x": arr}

        return pre

    from ucf_vit_tpu.data.pipeline import ProcessChannels

    pc = ProcessChannels(
        source=None,
        num_channels=c,
        single_channel=cfg.single_channel,
        return_label=False,
        adaptive_patching=True,
        separate_channels=bool(cfg.data.get("separate_channels", False)),
        patch_size=cfg.patch_size,
        fixed_length=cfg.fixed_length,
        twoD=cfg.twoD,
        dataset=cfg.dataset,
        num_classes=cfg.data.get("num_classes"),
        rng=np.random.default_rng(int(cfg.data.get("seed", 0))),
        # deterministic serving: every request's patchify draws come from
        # SeedSequence([seed, 0]) — identical requests -> identical trees,
        # in-process or in any pool worker (training keeps draws per-sample)
        aug_seed=int(cfg.data.get("seed", 0)),
    )
    variables = tuple(cfg.default_vars[:c] or ("v",))

    def check(arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(arr, dtype=np.float32)
        if arr.shape != expect:
            raise ValueError(
                f"expected input shape {expect} [C, *tile], got {arr.shape}"
            )
        return arr

    if workers <= 0:
        def pre(arr: np.ndarray) -> Dict[str, np.ndarray]:
            sample = pc._make_sample(check(arr), variables, None, 0)
            return {k: v for k, v in sample.items()
                    if isinstance(v, np.ndarray)}

        return pre

    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    from ucf_vit_tpu.data.pipeline import _pool_init, _pool_make_sample

    pool = ProcessPoolExecutor(
        max_workers=int(workers),
        # spawn: never fork a process holding the live TPU client
        mp_context=multiprocessing.get_context("spawn"),
        initializer=_pool_init,
        initargs=(pc._spec(),),
    )

    def pre_pooled(arr: np.ndarray) -> Dict[str, np.ndarray]:
        sample = pool.submit(
            _pool_make_sample, (check(arr), variables, None, 0)
        ).result()
        return {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}

    return pre_pooled


# ---------------------------------------------------------------------------
# the jitted fixed-shape forward
# ---------------------------------------------------------------------------


def build_predictor(
    cfg: Config,
    checkpoint_dir: Optional[str] = None,
    use_ema: bool = False,
    max_batch: Optional[int] = None,
    seed: int = 0,
    preprocess_workers: int = 0,
):
    """Build ``(run_batch, preprocess, max_batch)`` for serving.

    ``run_batch({key: [max_batch, ...]}) -> np.ndarray [max_batch, ...]``:
      - classification: logits ``[B, num_classes]``
      - unetr / sap: argmax class map ``int32 [B, *spatial]`` (sap predicts
        in the sqrt-len pseudo-image space, like its training loss —
        reference `train_sap_simple.py:28-46`)
      - mae: masked-autoencoder reconstruction; non-adaptive returns the
        unpatchified image ``[B, C, *tile]``, adaptive returns the predicted
        token sequence ``[B, L, p^d*C]`` (token space is the adaptive MAE's
        native output, `train_masked_fsdp.py:39-46`)
    """
    model, _ = build_task(cfg)
    max_batch = int(max_batch or cfg.batch_size)
    ex = example_batch(cfg, max_batch)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    # mesh-aware serving: a parallelism block spanning >1 available device
    # serves the model sharded exactly like training/eval (tp/fsdp weights
    # per LOGICAL_RULES — required for models bigger than one chip; batches
    # data-parallel over the data axes)
    from ucf_vit_tpu.inference import (
        _eval_mesh,
        _init_eval_params,
        _mesh_ctx,
        _place_eval_params,
    )

    mesh = _eval_mesh(cfg)
    if mesh is not None:
        from ucf_vit_tpu.parallel.mesh import DATA_AXES

        data_extent = int(np.prod([mesh.shape[a] for a in DATA_AXES]))
        assert max_batch % data_extent == 0, (
            f"--max-batch {max_batch} must be divisible by the mesh's "
            f"data-parallel extent {data_extent} (ddp x ep x fsdp) for "
            f"sharded serving"
        )
    params, psharding = _init_eval_params(model, cfg, ex, var_ids, mesh)
    # mutable holder so checkpoints can be hot-swapped while serving
    # (run_batch reads it at dispatch; the micro-batcher is the only
    # dispatching thread, so a swap lands atomically between batches)
    holder = {"params": params, "epoch": None}

    def load_weights(ckpt_dir: str, ema: bool = False) -> int:
        from ucf_vit_tpu.inference import _params_from_payload

        payload = ckpt.restore_checkpoint(
            ckpt_dir,
            cfg.trainer.get("checkpoint_filename_for_loading", ""),
            expect_head_meta=ckpt.head_meta_from_config(cfg),
        )
        new = _params_from_payload(payload, ema)
        old = holder["params"]
        assert jax.tree.structure(new) == jax.tree.structure(old), (
            "checkpoint param tree does not match the serving model"
        )
        for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(old)):
            assert np.shape(a) == np.shape(b), (
                f"checkpoint shape {np.shape(a)} != model {np.shape(b)}"
            )
        # same fixed shapes + same shardings -> the compiled executable is
        # reused as-is
        holder["params"] = (
            _place_eval_params(new, psharding)
            if psharding is not None
            else jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), new)
        )
        holder["epoch"] = int(payload["epoch"])
        return holder["epoch"]

    if checkpoint_dir:
        epoch = load_weights(checkpoint_dir, use_ema)
        print(f"serving checkpoint from epoch {epoch}", flush=True)

    sqrt_len, p, task = cfg.sqrt_len, cfg.patch_size, cfg.task

    if task == "classification":
        def fwd(params, batch):
            x = jnp.asarray(
                batch["seq"] if cfg.adaptive_patching else batch["x"]
            )
            return model.apply({"params": params}, x, var_ids, _seq_ps(batch))
    elif task == "unetr":
        def fwd(params, batch):
            x = jnp.asarray(batch["x"])
            if cfg.adaptive_patching:
                seq = reassemble_sqrt_len(
                    jnp.asarray(batch["seq"]), sqrt_len, p, cfg.twoD
                )
                logits = model.apply(
                    {"params": params}, x, var_ids, _seq_ps(batch), seq
                )
            else:
                logits = model.apply({"params": params}, x, var_ids, None, None)
            return jnp.argmax(logits, axis=1).astype(jnp.int32)
    elif task == "sap":
        def fwd(params, batch):
            seq_img = reassemble_sqrt_len(
                jnp.asarray(batch["seq"]), sqrt_len, p, cfg.twoD
            )
            logits = model.apply(
                {"params": params}, seq_img, var_ids, _seq_ps(batch)
            )
            return jnp.argmax(logits, axis=1).astype(jnp.int32)
    elif task == "mae":
        from ucf_vit_tpu.ops.patchify import unpatchify

        img_shape = tuple(np.asarray(ex["x"]).shape)

        def fwd(params, batch):
            # fixed mask key: serving is deterministic (same request ->
            # same visible-token subset -> same reconstruction)
            rngs = {"mask": jax.random.key(seed)}
            if cfg.adaptive_patching:
                pred, _ = model.apply(
                    {"params": params}, jnp.asarray(batch["seq"]), var_ids,
                    _seq_ps(batch), deterministic=True, rngs=rngs,
                )
                return pred
            pred, _ = model.apply(
                {"params": params}, jnp.asarray(batch["x"]), var_ids, None,
                deterministic=True, rngs=rngs,
            )
            return unpatchify(pred, img_shape, p, cfg.twoD)
    else:
        raise ValueError(
            f"serving supports classification/unetr/sap/mae predict and "
            f"diffusion generate; got task={task!r}"
        )

    jfwd = jax.jit(fwd)

    # Only ship the keys this task's forward actually reads: the adaptive
    # sample dict also carries the raw tile (`x`), which for e.g. adaptive
    # classification is 25 MB/batch of dead transfer weight.
    consumed = {"x"}
    if cfg.adaptive_patching:
        consumed = {"seq", "seq_size", "seq_pos"}
        if task == "unetr":
            consumed.add("x")
    elif task == "sap":
        consumed = {"seq", "seq_size", "seq_pos"}

    if mesh is not None:
        from ucf_vit_tpu.parallel.mesh import batch_sharding

    def run_batch(batch: Dict[str, np.ndarray]) -> jax.Array:
        # Explicit async device_put before dispatch: jit's implicit arg
        # upload staged these host arrays one-by-one (measured 671 ms/batch
        # vs 38 ms compute at ViT-B bs=32); one device_put of the filtered
        # dict moves the same bytes in ~0.1 s and overlaps with the previous
        # batch's compute. The batcher materializes the result one batch
        # late, so transfer, compute, and readback all pipeline.
        want = {k: v for k, v in batch.items() if k in consumed}
        if mesh is None:
            dev = jax.device_put(want)
            return jfwd(holder["params"], dev)
        dev = jax.device_put(
            want, {k: batch_sharding(mesh, np.ndim(v)) for k, v in want.items()}
        )
        with _mesh_ctx(mesh):
            return jfwd(holder["params"], dev)

    return run_batch, make_preprocessor(cfg, preprocess_workers), max_batch, (
        model, holder, load_weights,
    )


def build_generator(cfg: Config, params, model, num_samples: int,
                    mesh=None):
    """Jitted DDPM ancestral sampler at a fixed batch (diffusion serving).
    With a mesh, the reverse chain runs batch-sharded (same recipe as
    inference.generate_diffusion)."""
    from ucf_vit_tpu.models.ddpm import ddpm_sample, ddpm_schedule
    from ucf_vit_tpu.ops.patchify import unpatchify

    ex = example_batch(cfg, num_samples)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )
    shape = tuple(np.asarray(ex["x"]).shape)
    time_steps = int(cfg.init_args.get("num_time_steps",
                                       cfg.init_args.get("time_steps", 1000)))
    schedule = ddpm_schedule(time_steps)

    if mesh is not None:
        from ucf_vit_tpu.parallel.mesh import batch_sharding

        bshard = batch_sharding(mesh, len(shape))

    def denoise(x_t, t):
        if mesh is not None:
            x_t = jax.lax.with_sharding_constraint(x_t, bshard)
        pred = model.apply({"params": params}, x_t, t, var_ids, None)
        return unpatchify(pred, shape, cfg.patch_size, cfg.twoD)

    sampler = jax.jit(lambda key: ddpm_sample(schedule, denoise, key, shape))

    def generate(seed: int) -> np.ndarray:
        from ucf_vit_tpu.inference import _mesh_ctx

        with _mesh_ctx(mesh):
            return np.asarray(sampler(jax.random.key(seed)))

    return generate


# ---------------------------------------------------------------------------
# micro-batcher
# ---------------------------------------------------------------------------

_STOP = object()


class MicroBatcher:
    """Coalesce concurrent single-sample requests into fixed-shape batches.

    One worker thread drains a queue: the first request opens a batch window
    of ``max_wait_ms``; anything arriving before the window closes (up to
    ``max_batch``) shares the forward. The batch is padded to exactly
    ``max_batch`` rows by repeating the last sample — padded rows are
    computed and discarded, which on an accelerator costs (almost) nothing:
    the executable is fixed-shape either way.

    ``pipeline_depth=1`` keeps one dispatched batch in flight: the result is
    materialized one batch later (or immediately once the queue is idle, so
    a lone request pays no extra latency), letting batch N+1's host->device
    transfer overlap batch N's compute. Default 0 (serialize): measured on a
    tunneled-TPU rig, overlap was slower (1.29 vs 0.97 s/batch) and unstable
    under concurrent HTTP threads — enable 1 only on directly-attached
    accelerators after measuring."""

    def __init__(self, run_batch, max_batch: int, max_wait_ms: float = 5.0,
                 pipeline_depth: int = 0):
        self.run_batch = run_batch
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self.pipeline_depth = int(pipeline_depth)
        self.queue: Queue = Queue()
        self.stats = {
            "requests": 0, "batches": 0, "errors": 0,
            "batch_fill_sum": 0, "latency_sum_s": 0.0, "latency_max_s": 0.0,
        }
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, sample: Dict[str, np.ndarray],
               timeout: Optional[float] = 120.0) -> np.ndarray:
        t0 = time.perf_counter()
        ev = threading.Event()
        slot: dict = {}
        self.queue.put((sample, ev, slot))
        if not ev.wait(timeout=timeout):
            raise TimeoutError("inference request timed out")
        if "err" in slot:
            raise slot["err"]
        dt = time.perf_counter() - t0
        with self._lock:
            self.stats["requests"] += 1
            self.stats["latency_sum_s"] += dt
            self.stats["latency_max_s"] = max(self.stats["latency_max_s"], dt)
        return slot["out"]

    def close(self):
        self.queue.put(_STOP)
        self._thread.join(timeout=5.0)

    def _flush(self, pending):
        """Materialize a dispatched batch and wake its waiters. Device-side
        failures surface here (dispatch is async), scoped to this group."""
        out_async, group = pending
        try:
            out = np.asarray(out_async)
            for i, (_, ev, slot) in enumerate(group):
                slot["out"] = out[i]
                ev.set()
            with self._lock:
                self.stats["batches"] += 1
                self.stats["batch_fill_sum"] += len(group)
        except Exception as e:  # surface to every waiter in the group
            with self._lock:
                self.stats["errors"] += 1
            for _, ev, slot in group:
                slot["err"] = e
                ev.set()

    def _loop(self):
        pending = None  # the one in-flight (dispatched, unmaterialized) batch
        while True:
            if pending is not None and self.queue.empty():
                # idle queue: drain the pipeline now so a lone request does
                # not wait for a successor that may never come
                self._flush(pending)
                pending = None
            item = self.queue.get()
            if item is _STOP:
                if pending is not None:
                    self._flush(pending)
                return
            group = [item]
            deadline = time.perf_counter() + self.max_wait
            while len(group) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self.queue.get(timeout=remaining)
                except Empty:
                    break
                if nxt is _STOP:
                    self.queue.put(_STOP)  # re-post for the outer loop
                    break
                group.append(nxt)
            try:
                keys = group[0][0].keys()
                batch = {}
                for k in keys:
                    rows = [g[0][k] for g in group]
                    # pad to the executable's fixed batch shape
                    rows += [rows[-1]] * (self.max_batch - len(rows))
                    batch[k] = np.stack(rows)
                out_async = self.run_batch(batch)  # non-blocking dispatch
            except Exception as e:  # host-side (stack/shape) failure
                with self._lock:
                    self.stats["errors"] += 1
                for _, ev, slot in group:
                    slot["err"] = e
                    ev.set()
                continue
            if pending is not None:
                self._flush(pending)  # overlaps with the batch just dispatched
            if self.pipeline_depth > 0:
                pending = (out_async, group)
            else:
                self._flush((out_async, group))


# ---------------------------------------------------------------------------
# HTTP front end
# ---------------------------------------------------------------------------


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    # set by make_server():
    batcher: Optional[MicroBatcher] = None
    preprocess = None
    generate = None
    reload_weights = None  # load_weights(ckpt_dir, ema) -> epoch
    weights_holder: Optional[dict] = None
    serve_ema = False  # server's --ema startup setting (reload default)
    task = ""

    def log_message(self, fmt, *args):  # quiet access log
        pass

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj: dict):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path == "/healthz":
            self._send_json(200, {"status": "ok", "task": self.task})
        elif self.path == "/v1/stats":
            b = self.batcher
            if b is None:
                self._send_json(200, {"task": self.task, "requests": 0})
                return
            with b._lock:
                s = dict(b.stats)
            s["task"] = self.task
            s["max_batch"] = b.max_batch
            if self.weights_holder is not None:
                s["checkpoint_epoch"] = self.weights_holder.get("epoch")
            if s["batches"]:
                s["mean_batch_fill"] = s["batch_fill_sum"] / s["batches"]
            if s["requests"]:
                s["latency_mean_s"] = s["latency_sum_s"] / s["requests"]
            self._send_json(200, s)
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        try:
            if self.path == "/v1/predict":
                if self.batcher is None:
                    raise ValueError(
                        "this deployment serves /v1/generate (diffusion)"
                    )
                arr = np.load(io.BytesIO(body), allow_pickle=False)
                out = self.batcher.submit(self.preprocess(arr))
                self._send(200, _npy_bytes(out), "application/x-npy")
            elif self.path == "/v1/generate":
                if self.generate is None:
                    raise ValueError("generate is only served for diffusion")
                req = json.loads(body or b"{}")
                imgs = self.generate(int(req.get("seed", 0)))
                num = int(req.get("num", imgs.shape[0]))
                self._send(200, _npy_bytes(imgs[:num]), "application/x-npy")
            elif self.path == "/v1/reload":
                # zero-downtime weight swap: same model/shape contract, so
                # the compiled executable is reused; in-flight batches finish
                # on the old weights, the next batch dispatches on the new
                if self.reload_weights is None:
                    raise ValueError("reload is not available for this task")
                req = json.loads(body or b"{}")
                if "checkpoint" not in req:
                    raise KeyError("body must be {'checkpoint': <dir>, ...}")
                # default to the server's --ema startup setting: an EMA
                # deployment hot-reloading without an explicit "ema" key
                # must keep serving EMA weights (round-3 review finding)
                epoch = self.reload_weights(
                    str(req["checkpoint"]),
                    bool(req.get("ema", self.serve_ema)),
                )
                self._send_json(200, {"status": "reloaded", "epoch": epoch})
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})
        except (
            ValueError,
            KeyError,
            json.JSONDecodeError,
            AssertionError,
            FileNotFoundError,
        ) as e:
            self._send_json(400, {"error": str(e)})
        except TimeoutError as e:
            self._send_json(503, {"error": str(e)})


def make_server(
    cfg: Config,
    checkpoint_dir: Optional[str] = None,
    host: str = "0.0.0.0",
    port: int = 8000,
    max_batch: Optional[int] = None,
    max_wait_ms: float = 5.0,
    use_ema: bool = False,
    num_generate: int = 8,
    pipeline_depth: int = 0,
    preprocess_workers: int = 0,
) -> ThreadingHTTPServer:
    """Build the HTTP server (not yet serving — call ``serve_forever()``).

    The forward is compiled and warmed here, so the first real request pays
    no compile: readiness (``/healthz`` reachable) means ready-to-serve."""

    class Handler(_Handler):
        task = cfg.task

    if cfg.task == "diffusion":
        model, _ = build_task(cfg)
        ex = example_batch(cfg, num_generate)
        var_ids = (
            model.get_var_ids(ex["variables"])
            if cfg.init_args.get("use_varemb", False)
            else None
        )
        from ucf_vit_tpu.inference import (
            _eval_mesh,
            _init_eval_params,
            _place_eval_params,
        )

        gen_mesh = _eval_mesh(cfg)
        params, psharding = _init_eval_params(model, cfg, ex, var_ids, gen_mesh)
        if checkpoint_dir:
            from ucf_vit_tpu.inference import _params_from_payload

            payload = ckpt.restore_checkpoint(
                checkpoint_dir,
                cfg.trainer.get("checkpoint_filename_for_loading", ""),
                expect_head_meta=ckpt.head_meta_from_config(cfg),
            )
            params = _place_eval_params(
                _params_from_payload(payload, use_ema), psharding
            )
        Handler.generate = staticmethod(
            build_generator(cfg, params, model, num_generate, mesh=gen_mesh)
        )
    else:
        run_batch, preprocess, mb, (_, holder, load_weights) = build_predictor(
            cfg, checkpoint_dir, use_ema=use_ema, max_batch=max_batch,
            preprocess_workers=preprocess_workers,
        )
        Handler.reload_weights = staticmethod(load_weights)
        Handler.weights_holder = holder
        Handler.serve_ema = use_ema
        # warm the executable before accepting traffic — with exactly the
        # key-set/shape a preprocessed request produces, so the compile
        # cache hit is guaranteed (extra keys would change the traced
        # signature and force a second compile on the first real request)
        nd = 2 if cfg.twoD else 3
        warm_in = np.random.default_rng(0).random(
            (cfg.max_channels,) + tuple(cfg.tile_size[:nd])
        ).astype(np.float32)
        sample = preprocess(warm_in)
        np.asarray(run_batch({k: np.stack([v] * mb) for k, v in sample.items()}))
        Handler.batcher = MicroBatcher(run_batch, mb, max_wait_ms,
                                       pipeline_depth=pipeline_depth)
        Handler.preprocess = staticmethod(preprocess)

    class Server(ThreadingHTTPServer):
        # default backlog (5) drops connections under concurrent no-keepalive
        # clients (measured: 24/417 resets at 64 clients); deep listen queue
        # costs nothing and the micro-batcher is the real admission control
        request_queue_size = 128
        daemon_threads = True

    return Server((host, port), Handler)


def main(argv=None):
    parser = argparse.ArgumentParser(description="ucf_vit_tpu model server")
    parser.add_argument("config")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--task", default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=None,
                        help="serving batch (default: config batch_size)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="micro-batch window; bounds added p99 latency")
    parser.add_argument("--ema", action="store_true",
                        help="serve EMA weights when the checkpoint has them")
    parser.add_argument("--num-generate", type=int, default=8,
                        help="diffusion: samples per /v1/generate call")
    parser.add_argument("--pipeline-depth", type=int, default=0,
                        help="in-flight batches: 1 overlaps batch N+1's "
                             "transfer with batch N's compute (measure "
                             "first; see MicroBatcher docs); 0 serializes")
    parser.add_argument("--preprocess-workers", type=int, default=0,
                        help="adaptive configs: patchify process pool size "
                             "— concurrent requests preprocess on separate "
                             "cores instead of serializing on the GIL "
                             "(output byte-identical to in-process)")
    parser.add_argument("--compile-cache", default=None,
                        help="persistent XLA compile-cache dir: restarts "
                             "reload the serving executable in seconds "
                             "instead of recompiling")
    args = parser.parse_args(argv)

    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.train import enable_compile_cache

    enable_compile_cache(args.compile_cache)
    cfg = load_config(args.config, task=args.task)
    server = make_server(
        cfg, args.checkpoint, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        use_ema=args.ema, num_generate=args.num_generate,
        pipeline_depth=args.pipeline_depth,
        preprocess_workers=args.preprocess_workers,
    )
    print(
        f"serving task={cfg.task} on {args.host}:{server.server_address[1]} "
        f"(max_batch={args.max_batch or cfg.batch_size}, "
        f"window={args.max_wait_ms}ms)", flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
