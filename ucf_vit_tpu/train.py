"""Unified trainer CLI: `python -m ucf_vit_tpu.train <config.yaml> [options]`.

Replaces the reference's nine copy-pasted training scripts
(`training_scripts/*.py`, SURVEY.md §1-L6) with one config-driven loop:
  1. config parse + validation        (config.py)
  2. mesh + model + optimizer + resume (parallel/, tasks.py, checkpoint.py)
  3. data module                       (data/)
  4. epoch loop: jitted sharded train step, per-step timing, even/odd
     checkpoints, loss/throughput prints.

Launcher parity: the reference CLI is `<script> <config> {MPI|SLURM}`
(`train_masked_fsdp.py:651-702`); here rendezvous is
`jax.distributed.initialize()` (automatic under TPU runtimes / SLURM), and a
second positional arg is accepted and ignored for drop-in compatibility.

Observability (reference has none, SURVEY.md §5): per-step wall time,
samples/sec, optional `trainer.profile_dir` to dump a jax.profiler trace of
steps 10-15.
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ucf_vit_tpu.config import Config, load_config
from ucf_vit_tpu.parallel.mesh import mesh_context, mesh_from_config, shard_batch
from ucf_vit_tpu.parallel.train_step import (
    create_sharded_train_state,
    make_train_step,
)
from ucf_vit_tpu.tasks import build_task
from ucf_vit_tpu.utils.optim import configure_optimizer
from ucf_vit_tpu import checkpoint as ckpt


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


def synthetic_batches(cfg: Config, global_batch: int, seed: int = 0) -> Iterator[dict]:
    """Shape-correct random batches for benchmarking / smoke runs without a
    dataset on disk (capability-plus; the reference always needs real data).

    Samples are drawn one at a time and stacked, so the sample *stream* is
    independent of batch size: bs=1 over 2N batches sees exactly the samples
    bs=2 sees over N — which is what makes batched-vs-bs1 eval equivalence
    testable (tests/test_inference.py)."""
    rng = np.random.default_rng(seed)
    nd = 2 if cfg.twoD else 3
    tile = tuple(cfg.tile_size[:nd])
    c = cfg.max_channels
    num_classes = int(
        cfg.init_args.get("num_classes", cfg.data.get("num_classes", 1000) or 1000)
    )
    p = cfg.patch_size

    def one_sample() -> dict:
        s = {"x": rng.normal(size=(c,) + tile).astype(np.float32)}
        if cfg.adaptive_patching:
            L = cfg.fixed_length
            s["seq"] = rng.normal(size=(c, L, p**nd)).astype(np.float32)
            s["seq_size"] = np.full((c, L), 2.0, np.float32)
            s["seq_pos"] = rng.uniform(0, tile[0], size=(c, L, nd)).astype(
                np.float32
            )
            if cfg.task in ("unetr", "sap"):
                s["seq_label"] = rng.integers(
                    0, num_classes, size=(L,) + (p,) * nd
                ).astype(np.int64)
        if cfg.task == "classification":
            s["label"] = rng.integers(0, num_classes, size=())
        elif cfg.task == "unetr":
            s["label"] = rng.integers(0, num_classes, size=(1,) + tile).astype(
                np.int64
            )
        return s

    variables = tuple(cfg.default_vars[:c] or ("v",))
    while True:
        samples = [one_sample() for _ in range(global_batch)]
        batch = {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
        batch["variables"] = variables
        yield batch


def build_dataloader(
    cfg: Config, global_batch: int, synthetic: bool, return_qdt: bool = False,
    val_split: bool = False,
):
    """Returns (datamodule, synthetic_iter, batches_per_rank_epoch).

    return_qdt: batches additionally carry the host-side quadtree/octree
    objects (for deserializing adaptive predictions back to image space —
    inference/visualization only, never jitted).

    val_split: build the held-out validation loader instead — the file
    range comes from `data.val_dict_start_idx`/`val_dict_end_idx` (e.g.
    train 0.0-0.9, val 0.9-1.0), mirroring how the reference's users split
    via the same fraction keys. Synthetic mode draws from a disjoint seed."""
    if synthetic:
        return None, synthetic_batches(cfg, global_batch,
                                       seed=12345 if val_split else 0), None

    if val_split:
        assert ("val_dict_start_idx" in cfg.data
                and "val_dict_end_idx" in cfg.data), (
            "trainer.val_every needs data.val_dict_start_idx / "
            "val_dict_end_idx (held-out file-range fractions)"
        )
        cfg = Config(raw={**cfg.raw, "data": {
            **cfg.data,
            "dict_start_idx": cfg.data["val_dict_start_idx"],
            "dict_end_idx": cfg.data["val_dict_end_idx"],
        }}, task=cfg.task)

    if cfg.dataset == "catsdogs":
        # map-style smoke path with a flat dir of cat.N.jpg / dog.N.jpg
        # (parity: `train_class_simple_torchDataloader.py:227-240`)
        from ucf_vit_tpu.data.catsdogs import (
            CatsDogsDataset,
            catsdogs_loader,
            list_file_split,
        )

        key = list(cfg.data["dict_root_dirs"])[0]
        # honor the same fraction keys as the iterable pipeline (the
        # val_split branch above already rewrote them to the val range), so
        # trainer.val_every works on the catsdogs smoke path too; the split
        # is over a fixed-seed permutation, NOT sorted order (which is
        # class-ordered — see list_file_split)
        s = float(cfg.data.get("dict_start_idx", {}).get(key, 0.0))
        e = float(cfg.data.get("dict_end_idx", {}).get(key, 1.0))
        files = list_file_split(cfg.data["dict_root_dirs"][key], s, e)
        assert files, (
            f"catsdogs file range [{s}, {e}) of "
            f"{cfg.data['dict_root_dirs'][key]} is empty"
        )
        nd = 2 if cfg.twoD else 3
        ds = CatsDogsDataset(
            files,
            cfg.data["dict_in_variables"][key],
            tuple(cfg.tile_size[:nd]),
            adaptive_patching=cfg.adaptive_patching,
            fixed_length=cfg.fixed_length or 196,
            patch_size=cfg.patch_size,
            num_channels=len(cfg.data["dict_in_variables"][key]),
        )

        class _CatsDogsModule:
            def __init__(self):
                self._epoch = 0

            def train_dataloader(self, loop: bool = False,
                                 skip_batches: int = 0):
                # map-style loader: an epoch ends when the (sharded, shuffled)
                # index list is exhausted — finite is the correct training
                # semantics (torch DistributedSampler behaves the same).
                # loop=True (the persistent validation iterator) chains
                # epochs forever so successive passes keep walking the split.
                # skip_batches (mid-epoch resume): the shuffled index list is
                # a pure function of self._epoch, so slicing it fast-forwards
                # exactly (decode cost for skipped files is never paid)
                def one_epoch(seed, skip):
                    return catsdogs_loader(
                        ds,
                        global_batch,
                        shard_rank=jax.process_index(),
                        num_shards=jax.process_count(),
                        seed=seed,
                        skip_batches=skip,
                    )

                if not loop:
                    return one_epoch(self._epoch, skip_batches)

                def chain():
                    seed, skip = self._epoch, skip_batches
                    while True:
                        yield from one_epoch(seed, skip)
                        seed, skip = seed + 1, 0

                return chain()

            def reset(self):
                self._epoch += 1

            def set_epoch(self, epoch: int):
                self._epoch = int(epoch)

        n_batches = len(ds) // (global_batch * jax.process_count())
        return _CatsDogsModule(), None, {"catsdogs": n_batches}

    from ucf_vit_tpu.data.datamodule import DataModule

    lb = cfg.load_balancing
    bpre = lb.get("batches_per_rank_epoch")
    group_list = lb.get("dataset_group_list", "")
    if lb.get("auto_load_balancing", False):
        from ucf_vit_tpu.data.load_balance import calculate_load_balancing_from_config

        bpre, group_list = calculate_load_balancing_from_config(
            cfg.raw, cfg.data_par_size
        )

    ts = cfg.tile_size + [None] * (3 - len(cfg.tile_size))
    dm = DataModule(
        dict_root_dirs=cfg.data["dict_root_dirs"],
        dict_start_idx=cfg.data["dict_start_idx"],
        dict_end_idx=cfg.data["dict_end_idx"],
        dict_buffer_sizes=cfg.data["dict_buffer_sizes"],
        dict_in_variables=cfg.data["dict_in_variables"],
        num_channels_used=cfg.data["num_channels_used"],
        batch_size=global_batch,
        patch_size=cfg.patch_size,
        tile_size_x=ts[0],
        tile_size_y=ts[1],
        tile_size_z=ts[2],
        twoD=cfg.twoD,
        single_channel=cfg.single_channel,
        dataset_group_list=group_list,
        batches_per_rank_epoch=bpre,
        tile_overlap=float(cfg.data.get("tile_overlap", 0.0)),
        use_all_data=bool(cfg.data.get("use_all_data", False)),
        adaptive_patching=cfg.adaptive_patching,
        fixed_length=cfg.fixed_length or 4096,
        separate_channels=bool(cfg.init_args.get("separate_channels", False)),
        data_par_size=cfg.data_par_size,
        dataset=cfg.dataset,
        return_label=cfg.task in ("classification", "unetr", "sap"),
        num_classes=cfg.init_args.get("num_classes", cfg.data.get("num_classes")),
        imagenet_resize=cfg.dataset_options.get("imagenet_resize"),
        proc_rank=jax.process_index(),
        num_procs=jax.process_count(),
        num_workers=int(cfg.data.get("num_workers", 1)),
        return_qdt=return_qdt,
    )
    dm.setup()
    return dm, None, bpre


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


_DIST_INITIALIZED = False


def enable_compile_cache(cache_dir, min_compile_secs: float = 0.5) -> None:
    """Persistent XLA compilation cache (trainer.compile_cache_dir).

    First compile of a big model is minutes on TPU; with a persistent cache
    a restart — in particular the preemption -> checkpoint -> resume cycle
    this trainer is built around — reloads the executable in seconds. Off by
    default (jax's own default); shareable across hosts via a common
    filesystem or gcs:// path. min_compile_secs
    (trainer.compile_cache_min_secs) is the write threshold — 0 caches every
    compile, however fast."""
    if not cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    # jax materializes its cache singleton on first compile; if anything
    # compiled before this call (e.g. a JAX_COMPILATION_CACHE_DIR env var
    # was in effect), the dir update above is silently ignored until reset
    try:
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    except Exception:  # cache was never initialized — nothing to reset
        pass
    # cache even quick compiles: resume pays dispatch, not recompilation
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def init_distributed() -> None:
    """jax.distributed rendezvous when launched multi-process under SLURM.

    MUST run before any other jax API call: jax.distributed.initialize()
    refuses to run once a backend exists, and even jax.process_count()
    initializes one. So the decision to initialize is made purely from the
    environment (SLURM_NTASKS), mirroring the reference's launcher env
    sniffing (`train_masked_fsdp.py:682-693`). TPU pod runtimes discover
    coordinates automatically inside initialize()."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return
    _DIST_INITIALIZED = True
    import os

    if (
        int(os.environ.get("SLURM_NTASKS", "1")) > 1
        and "SLURM_PROCID" in os.environ  # inside srun, not just salloc
    ):
        jax.distributed.initialize()


def example_batch(cfg: Config, global_batch: int) -> dict:
    return next(synthetic_batches(cfg, global_batch))


def train(
    cfg: Config,
    max_steps: Optional[int] = None,
    synthetic: bool = False,
    log_every: int = 1,
) -> Dict:
    init_distributed()
    enable_compile_cache(
        cfg.trainer.get("compile_cache_dir"),
        min_compile_secs=cfg.trainer.get("compile_cache_min_secs", 0.5),
    )
    mesh = mesh_from_config(cfg.parallelism)
    model, loss_fn = build_task(cfg)

    trainer, mcfg = cfg.trainer, cfg.model
    # per-rank batch (reference semantics) x data-parallel ranks = global;
    # each host loads only its local share (shard_batch assembles the global
    # array across processes)
    global_batch = cfg.batch_size * cfg.data_par_size
    host_batch = global_batch // jax.process_count()
    ex = example_batch(cfg, host_batch)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    def init_fn():
        rngs = {
            "params": jax.random.key(0),
            "mask": jax.random.key(1),
            "dropout": jax.random.key(2),
        }
        return _init_variables(model, rngs, cfg, ex, var_ids)

    dummy_params = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(
        dummy_params,
        lr=float(mcfg.get("lr", 1e-4)),
        beta_1=float(mcfg.get("beta_1", 0.9)),
        beta_2=float(mcfg.get("beta_2", 0.95)),
        weight_decay=float(mcfg.get("weight_decay", 1e-5)),
        warmup_steps=int(mcfg.get("warmup_steps", 1000)),
        max_steps=int(mcfg.get("max_steps", 20000)),
        warmup_start_lr=float(mcfg.get("warmup_start_lr", 1e-8)),
        eta_min=float(mcfg.get("eta_min", 1e-8)),
        max_grad_norm=(
            float(mcfg["max_grad_norm"])
            if mcfg.get("max_grad_norm") is not None else None
        ),
    )

    # Preemption-safe shutdown (capability-plus: the reference's only
    # resilience is the even/odd checkpoint rotation + a huge NCCL timeout,
    # SURVEY.md §5). SLURM and TPU maintenance events deliver SIGTERM before
    # eviction: finish the in-flight step, checkpoint as epoch-1 (so resume
    # re-runs the interrupted epoch — the data iterator holds no resumable
    # state), exit cleanly. Installed before the first compile so a signal
    # during the (minutes-long) initial compilation is also caught.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print(
            "SIGTERM: will checkpoint at the next step boundary and exit",
            flush=True,
        )

    prev_handler = None
    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (in-process tests): feature disabled

    # Cross-process consensus cadence: the allgather is a host-blocking
    # collective, and running it every step would serialize exactly the
    # host/device overlap the 1-step-lagged loop buys. Every host sees the
    # same step counter, so polling on a fixed stride keeps the collective
    # schedule identical across processes (a host acting on its local flag
    # alone would deadlock the others mid-SPMD-step). A few extra steps
    # before checkpointing is harmless — SLURM/TPU grace windows are minutes.
    preempt_sync_every = max(1, int(trainer.get("preempt_sync_every", 25)))
    # preemption drill (testing/chaos): raise the same flag SIGTERM raises
    # once total_steps reaches this value — a deterministic way to exercise
    # the preempt -> checkpoint -> mid-epoch-resume cycle
    preempt_drill = int(trainer.get("preempt_after_steps", 0))

    def _preempt_now(step_idx: int) -> bool:
        """All processes must agree on preemption at the same step boundary:
        SIGTERM lands at different moments per host, and a host that breaks
        out while the others dispatch the next SPMD step deadlocks the job
        (and the collective checkpoint save never runs)."""
        if jax.process_count() == 1:
            return preempted["flag"]
        if step_idx % preempt_sync_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([preempted["flag"]], dtype=np.bool_)
        )
        return bool(np.asarray(flags).any())

    # Replica-consistency detector (parallel/sync_check.py): every N steps,
    # fingerprint each device's local param shards on-device and assert that
    # devices holding the same logical blocks (ddp/sp replicas) are
    # bit-equal — catches silent HBM corruption and rank-skew divergence the
    # reference never checks for. 0 = off.
    sync_check_every = int(trainer.get("sync_check_every", 0))

    ema_decay = trainer.get("ema_decay")
    ema_decay = None if ema_decay is None else float(ema_decay)
    assert ema_decay is None or 0.0 < ema_decay < 1.0, (
        f"trainer.ema_decay must be in (0, 1), got {ema_decay}"
    )

    with mesh_context(mesh):
        state, state_sharding = create_sharded_train_state(
            init_fn, tx, mesh,
            use_grad_scaler=bool(mcfg.get("use_grad_scaler", False)),
            ema=ema_decay is not None,
        )

        epoch_start = 0
        loss_list = []
        head_meta = ckpt.head_meta_from_config(cfg)
        if trainer.get("pretrained_mae_checkpoint"):
            # UNETR/SAP encoder init from MAE pretraining (reference pattern:
            # `inference_unetr_simple.py:274-327`, `train_sap_simple.py:308-330`)
            payload = ckpt.restore_checkpoint(
                trainer["pretrained_mae_checkpoint"],
                # slot name: dedicated key, then the reference's spelling,
                # then "" = the newest checkpoint dir under the path. NOT
                # checkpoint_filename_for_loading: that names a slot of THIS
                # task's own run, while the MAE checkpoint lives in a
                # different run's directory (the pitfall config.py's alias
                # comment calls out).
                trainer.get(
                    "pretrained_mae_filename",
                    trainer.get("mae_checkpoint_filename", ""),
                ),
                # encoder heads must agree; the MAE decoder is stripped
                expect_head_meta=(head_meta[0], None),
            )
            new_params = ckpt.transfer_mae_encoder(
                payload["state"]["params"], jax.device_get(state.params),
                new_pos_embed_len=model.num_patches,
            )
            state = state.replace(
                params=jax.tree.map(
                    lambda old, new: jax.device_put(
                        jnp.asarray(new), old.sharding
                    ),
                    state.params,
                    new_params,
                )
            )
            print("initialized encoder from MAE checkpoint", flush=True)
        if trainer.get("init_params_from"):
            # full-params warm start (fresh optimizer/schedule) — the landing
            # path for reference checkpoints imported by
            # `tools/convert_checkpoint.py to-jax`. Unlike
            # pretrained_mae_checkpoint this copies EVERY entry (decoder
            # included) and requires exact tree/shape agreement.
            payload = ckpt.restore_checkpoint(
                trainer["init_params_from"],
                trainer.get("init_params_filename", "converted_latest"),
                expect_head_meta=head_meta,
            )
            src = payload["state"]["params"]
            # adapt per-layer <-> scan-stacked block layouts (a non-pp
            # checkpoint warm-starting a pipe_par_size > 1 model, or back)
            src = ckpt.relayout_stacked(src, state.params)

            def _put(old, new):
                assert old.shape == np.shape(new), (
                    f"init_params_from shape mismatch: checkpoint "
                    f"{np.shape(new)} vs model {old.shape}"
                )
                return jax.device_put(
                    jnp.asarray(new, old.dtype), old.sharding
                )

            state = state.replace(
                params=jax.tree.map(_put, state.params, src)
            )
            print(
                f"initialized params from {trainer['init_params_from']}",
                flush=True,
            )
        resume_it = 0  # mid-epoch fast-forward (batches already consumed)
        resume_total_steps = 0
        resume_rng_data = None
        if trainer.get("resume_from_checkpoint", False):
            restore_state = state
            disk_has_ema = ckpt.state_has_key(
                trainer["checkpoint_path"],
                trainer["checkpoint_filename_for_loading"],
                "ema_params",
            )
            if ema_decay is not None and not disk_has_ema:
                # older checkpoint predates EMA: restore without, seed below
                restore_state = state.replace(ema_params=None)
            elif ema_decay is None and disk_has_ema:
                # EMA was on when this was written; restore it (Orbax is
                # strict about tree match) and drop it after
                restore_state = state.replace(
                    ema_params=jax.tree.map(lambda x: x, state.params)
                )
            restore_sharding = state_sharding.replace(
                ema_params=(
                    None if restore_state.ema_params is None
                    else state_sharding.params
                )
            )
            abstract = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
                jax.eval_shape(lambda: restore_state),
                restore_sharding,
            )
            payload = ckpt.restore_checkpoint(
                trainer["checkpoint_path"],
                trainer["checkpoint_filename_for_loading"],
                {"epoch": np.asarray(0), "state": abstract,
                 "loss_list_v2": np.zeros((0,))},
                expect_head_meta=head_meta,
            )
            state = payload["state"]
            if ema_decay is not None and state.ema_params is None:
                # jnp.copy: distinct buffers — params and EMA sharing one
                # buffer breaks the train step's donate_argnums (same buffer
                # donated twice)
                state = state.replace(
                    ema_params=jax.tree.map(jnp.copy, state.params)
                )
                print("seeded EMA from restored params (checkpoint predates "
                      "ema_decay)", flush=True)
            elif ema_decay is None and state.ema_params is not None:
                state = state.replace(ema_params=None)
                print("dropped checkpoint EMA state (ema_decay not set)",
                      flush=True)
            epoch_start = int(payload["epoch"]) + 1
            loss_list = ckpt.loss_list_from_payload(payload)
            # Mid-epoch progress (present in preemption checkpoints): re-enter
            # the interrupted epoch and fast-forward the data stream past the
            # batches already trained on, continue the step counter, and
            # continue the RNG stream exactly — instead of re-running the
            # whole epoch (the reference's only option,
            # `train_masked_fsdp.py:405-411` resumes at epoch granularity).
            resume_it = int(np.asarray(payload.get("data_it", 0)))
            resume_total_steps = int(np.asarray(payload.get("total_steps", 0)))
            if "rng_key" in payload:
                resume_rng_data = np.asarray(payload["rng_key"])
            saved_procs = int(np.asarray(payload.get("num_procs", 0)))
            if resume_it > 0 and saved_procs and (
                saved_procs != jax.process_count()
            ):
                # per-process file shards changed: the recorded mid-epoch
                # position doesn't map onto the new shard streams. Fall back
                # to re-running the interrupted epoch (the reference's only
                # mode) rather than skipping the wrong samples.
                if jax.process_index() == 0:
                    print(
                        f"mid-epoch checkpoint was written by {saved_procs} "
                        f"processes but this run has {jax.process_count()}; "
                        f"re-running epoch {int(payload['epoch'])} from its "
                        f"start (exact fast-forward requires the same "
                        f"process count)",
                        flush=True,
                    )
                resume_it = 0
                epoch_start = int(payload["epoch"])
            elif resume_it > 0:
                epoch_start = int(payload["epoch"])
                print(
                    f"resumed mid-epoch: epoch {epoch_start}, "
                    f"fast-forwarding {resume_it} batches "
                    f"(step {resume_total_steps})",
                    flush=True,
                )
            else:
                print(f"resumed from epoch {epoch_start - 1}", flush=True)

        # one jitted step per variables-set: single_channel / multi-dataset
        # batches carry different variable names (static ids -> retrace per
        # set, exactly like the reference's per-variables code paths)
        use_varemb = bool(cfg.init_args.get("use_varemb", False))
        _steps = {}

        def get_step(variables):
            vids = model.get_var_ids(variables) if use_varemb else None
            if vids not in _steps:
                _steps[vids] = make_train_step(
                    lambda p, b, r, v=vids: loss_fn(p, b, r, var_ids=v), tx,
                    accum_steps=int(trainer.get("accum_steps", 1)),
                    ema_decay=ema_decay,
                )
            return _steps[vids]

        step = get_step(ex["variables"])

        # Mid-training validation (capability-plus: the reference leaves all
        # validation to users, `README.md:969`): every val_every epochs, run
        # the task loss on a held-out range with no gradient, logged next to
        # the train metrics.
        val_every = int(trainer.get("val_every", 0))
        val_batches = int(trainer.get("val_batches", 8))
        val_dm = val_synth = None
        _eval_steps = {}
        if val_every > 0:
            val_dm, val_synth, _ = build_dataloader(
                cfg, host_batch, synthetic, val_split=True
            )

        def get_eval_step(variables):
            vids = model.get_var_ids(variables) if use_varemb else None
            if vids not in _eval_steps:
                # deterministic=True: dropout/DropPath off for validation
                # (mask / DDPM-noising rngs stay — they are the objective)
                _eval_steps[vids] = jax.jit(
                    lambda p, b, r, v=vids: loss_fn(
                        p, b, r, var_ids=v, deterministic=True
                    )
                )
            return _eval_steps[vids]

        # one persistent looping iterator: successive validation passes walk
        # through the whole held-out split (not the same first val_batches
        # prefix), and the adaptive pipeline's worker pool is spawned once,
        # not re-spawned and GC-abandoned per pass (round-3 review finding)
        _val_iter = []

        def run_validation(state, rng):
            if not _val_iter:
                _val_iter.append(
                    val_synth if val_synth is not None
                    else iter(val_dm.train_dataloader(loop=True))
                )
            it = _val_iter[0]
            total, aux_tot, n = 0.0, {}, 0
            for batch in it:
                if n >= val_batches:
                    break
                arrays = {
                    k: v for k, v in batch.items() if isinstance(v, np.ndarray)
                }
                sbatch = shard_batch(mesh, arrays)
                ev = get_eval_step(
                    tuple(batch.get("variables", ex["variables"]))
                )
                rng, r = jax.random.split(rng)
                out = ev(state.params, sbatch, r)
                loss, aux = out if isinstance(out, tuple) else (out, None)
                total += float(loss)
                if aux:
                    for k, v in aux.items():
                        aux_tot[k] = aux_tot.get(k, 0.0) + float(v)
                n += 1
            return (
                total / max(n, 1),
                {k: v / max(n, 1) for k, v in aux_tot.items()},
                n,
            )

        dm, synth, bpre = build_dataloader(cfg, host_batch, synthetic)
        max_epochs = int(trainer.get("max_epochs", 1))
        if bpre is None:
            bpre = cfg.load_balancing.get("batches_per_rank_epoch") or {}
        # all ranks step in lockstep for the longest dataset group; smaller
        # groups refill via keys_to_add (reference `train_masked_fsdp.py:461-464`)
        if bpre:
            iterations_per_epoch = max(bpre.values())
        elif max_steps is not None:
            iterations_per_epoch = max_steps
        else:
            iterations_per_epoch = 100
            if jax.process_index() == 0:
                print(
                    "WARNING: no batches_per_rank_epoch (load_balancing) and "
                    "no --max-steps; capping each epoch at 100 iterations. "
                    "Set load_balancing.batches_per_rank_epoch or "
                    "auto_load_balancing for true epoch accounting.",
                    flush=True,
                )

        profile_dir = trainer.get("profile_dir")
        metrics_file = None
        if trainer.get("metrics_path") and jax.process_index() == 0:
            import os

            os.makedirs(os.path.dirname(trainer["metrics_path"]) or ".", exist_ok=True)
            metrics_file = open(trainer["metrics_path"], "a")
            # run-start marker: one per process launch. The summarizer
            # (tools/metrics_summary.py) turns these + per-step timestamps
            # into restart counts, downtime, and goodput — the accounting a
            # preemptible fleet runs on.
            import json as _json

            metrics_file.write(_json.dumps({
                "run_start": True, "ts": time.time(),
                "resume_epoch": epoch_start, "resume_step": resume_total_steps,
                "resume_it": resume_it, "num_procs": jax.process_count(),
            }) + "\n")
            metrics_file.flush()
        tb_writer = None
        if trainer.get("tensorboard_dir") and jax.process_index() == 0:
            # TensorBoard scalars next to the JSONL (trainer.metrics_path):
            # the standard dashboard surface. tensorboardX first (a few-MB
            # dependency appropriate for a JAX framework), torch's writer as
            # the fallback where only torch is around. Optional — JSONL stays
            # the source of truth for tools/metrics_summary.py.
            tb_writer = None
            tb_errors = []
            for mod in ("tensorboardX", "torch.utils.tensorboard"):
                try:
                    import importlib

                    tb_writer = importlib.import_module(mod).SummaryWriter(
                        trainer["tensorboard_dir"]
                    )
                    break
                except Exception as e:  # keep the REAL error: an unwritable
                    # dir must not be reported as a missing package
                    tb_errors.append(f"{mod}: {type(e).__name__}: {e}")
            if tb_writer is None:
                print(
                    "tensorboard_dir ignored ("
                    + "; ".join(tb_errors)
                    + ") — `pip install tensorboardX` enables scalar "
                    "logging if the module is what's missing (per-step "
                    "JSONL metrics are still written)",
                    flush=True,
                )
        total_steps = resume_total_steps
        rng = jax.random.key(int(trainer.get("seed", 0)))
        if resume_rng_data is not None:
            # continue the dropout/mask/noise RNG stream where the previous
            # run left off (a fresh key(seed) would replay the run's draws)
            rng = jax.random.wrap_key_data(
                jnp.asarray(resume_rng_data, jnp.uint32)
            )

        # One-step-lagged loss materialization: `float(loss)` blocks until
        # the step finishes on device, so resolving step n's loss AFTER
        # submitting step n+1 lets host-side work (batch shard/H2D transfer,
        # dispatch through the runtime) overlap device compute instead of
        # serializing with it. The reference's torch loop has the same
        # hard sync via `loss.item()` every iteration.
        epoch_state = {"loss": 0.0, "t_last": 0.0, "nonfinite": 0}
        # halt after N consecutive non-finite losses (0 = off). With the
        # dynamic loss scaler a single overflow step is normal (the scaler
        # backs off); a run of them means the model diverged and every
        # further step is wasted chip time. The reference trains on.
        nan_guard = int(trainer.get("nan_guard", 0))

        def _resolve(pending):
            p_epoch, p_it, p_step, loss, aux = pending
            loss_f = float(loss)  # blocks until that step completed
            if nan_guard:
                if not np.isfinite(loss_f):
                    epoch_state["nonfinite"] += 1
                    if epoch_state["nonfinite"] >= nan_guard:
                        raise RuntimeError(
                            f"loss non-finite for {nan_guard} consecutive "
                            f"steps (last: {loss_f} at epoch {p_epoch} it "
                            f"{p_it}) — training diverged"
                        )
                else:
                    epoch_state["nonfinite"] = 0
            now = time.perf_counter()
            dt = now - epoch_state["t_last"]
            epoch_state["t_last"] = now
            epoch_state["loss"] += loss_f
            if jax.process_index() == 0 and p_it % log_every == 0:
                sps = global_batch / dt
                msg = (
                    f"epoch {p_epoch} it {p_it} loss {loss_f:.5f} "
                    f"{dt*1e3:.1f} ms/it {sps:.1f} samples/s"
                )
                if aux:
                    msg += "".join(
                        f" {k} {float(v):.4f}" for k, v in aux.items()
                    )
                print(msg, flush=True)
                if metrics_file is not None:
                    import json

                    rec = {
                        "epoch": p_epoch, "it": p_it, "step": p_step,
                        "loss": loss_f, "ms_per_it": dt * 1e3,
                        "samples_per_s": sps, "ts": time.time(),
                    }
                    if aux:
                        rec.update({k: float(v) for k, v in aux.items()})
                    metrics_file.write(json.dumps(rec) + "\n")
                    metrics_file.flush()
                if tb_writer is not None:
                    tb_writer.add_scalar("train/loss", loss_f, p_step)
                    tb_writer.add_scalar("train/ms_per_it", dt * 1e3, p_step)
                    tb_writer.add_scalar("train/samples_per_s", sps, p_step)
                    for k, v in (aux or {}).items():
                        tb_writer.add_scalar(f"train/{k}", float(v), p_step)

        for epoch in range(epoch_start, max_epochs):
            # pin the shuffle epoch so resumed and uninterrupted runs see the
            # same epoch-E file permutation (no-op mid-run)
            if dm is not None:
                dm.set_epoch(epoch)
            epoch_skip, resume_it = resume_it, 0  # only the re-entered epoch
            # loop=True: the dataset schedule stays a pure function of the
            # step index across processes (see DataModule.train_dataloader)
            it = (
                synth if synth is not None
                else dm.train_dataloader(loop=True, skip_batches=epoch_skip)
            )
            count, t_epoch = epoch_skip, time.perf_counter()
            epoch_state["loss"] = 0.0
            epoch_state["t_last"] = t_epoch
            pending = None
            for batch in it:
                # bound checks FIRST: they are a pure function of the step
                # index, identical on every process — whereas _preempt_now
                # does a cross-process allgather on its stride, so it must be
                # reached the same number of times on every rank even if one
                # rank's iterator holds an extra batch (uneven shards)
                if count >= iterations_per_epoch:
                    break
                if max_steps is not None and total_steps >= max_steps:
                    break
                if _preempt_now(total_steps):
                    preempted["flag"] = True  # adopt a remote host's signal
                    break
                arrays = {
                    k: v for k, v in batch.items() if isinstance(v, np.ndarray)
                }
                sbatch = shard_batch(mesh, arrays)
                step = get_step(tuple(batch.get("variables", ex["variables"])))
                rng, step_rng = jax.random.split(rng)
                if profile_dir and total_steps == 10:
                    jax.profiler.start_trace(profile_dir)
                state, loss, aux = step(state, sbatch, step_rng)
                count += 1
                total_steps += 1
                if preempt_drill and total_steps == preempt_drill:
                    preempted["flag"] = True
                if pending is not None:
                    _resolve(pending)  # overlaps with the step just submitted
                pending = (epoch, count, total_steps, loss, aux)
                if sync_check_every and total_steps % sync_check_every == 0:
                    # raises ReplicaDesyncError with the divergent device
                    # ids; stride-gated on the shared step counter so every
                    # process runs the SPMD fingerprint program together
                    from ucf_vit_tpu.parallel.sync_check import (
                        check_replica_consistency,
                    )

                    report = check_replica_consistency(state.params, mesh)
                    if jax.process_index() == 0 and metrics_file is not None:
                        metrics_file.write(_json.dumps({
                            "sync_check": report.describe(),
                            "step": total_steps,
                        }) + "\n")
                        metrics_file.flush()
                if profile_dir and total_steps == 15:
                    jax.profiler.stop_trace()
            if pending is not None:
                _resolve(pending)
            epoch_loss = epoch_state["loss"]
            if preempted["flag"]:
                # boundary case: the signal landed on the epoch's final
                # iteration — the epoch IS complete, so record it as such
                # (a mid-epoch save with data_it == iterations_per_epoch
                # would make resume skip a whole epoch's stream only to run
                # zero its and log a meaningless 0.0 epoch loss)
                epoch_done = count >= iterations_per_epoch
                if epoch_done:
                    loss_list.append(epoch_loss / max(count - epoch_skip, 1))
                if trainer.get("checkpoint_path"):
                    path = ckpt.save_checkpoint(
                        trainer["checkpoint_path"],
                        trainer.get("checkpoint_filename", "last"),
                        # record the interrupted epoch + position: resume
                        # re-enters it and fast-forwards `data_it` batches
                        # (step-granularity fault tolerance; the reference
                        # re-runs the epoch from the start)
                        epoch,
                        state,
                        loss_list,
                        # write the OLDEST parity slot, not the newest: a
                        # SIGKILL mid-write must not take the last committed
                        # checkpoint with it
                        slot_epoch=epoch,
                        head_meta=head_meta,
                        extra={
                            "data_it": 0 if epoch_done else count,
                            "total_steps": total_steps,
                            "rng_key": np.asarray(jax.random.key_data(rng)),
                            "num_procs": jax.process_count(),
                        },
                    )
                    if jax.process_index() == 0:
                        print(
                            f"preempted in epoch {epoch} after {count} its: "
                            f"saved {path}", flush=True,
                        )
                break
            loss_list.append(epoch_loss / max(count - epoch_skip, 1))
            if jax.process_index() == 0:
                print(
                    f"epoch {epoch} done: mean loss {loss_list[-1]:.5f} "
                    f"({count - epoch_skip} its"
                    + (f" after {epoch_skip} skipped" if epoch_skip else "")
                    + f", {time.perf_counter() - t_epoch:.1f}s)",
                    flush=True,
                )
            # split the validation key BEFORE the checkpoint save so the
            # saved rng is the post-validation stream — a resumed run then
            # continues draw-for-draw where an uninterrupted one would be
            vrng = None
            if val_every > 0 and (epoch + 1) % val_every == 0:
                rng, vrng = jax.random.split(rng)
            if trainer.get("checkpoint_path"):
                # async: the write overlaps the next epoch's compute.
                # data_it=0: the epoch completed — resume starts at epoch+1;
                # rng/step continuity keys ride along so that resume also
                # continues the draw stream instead of replaying it.
                ckpt.save_checkpoint(
                    trainer["checkpoint_path"],
                    trainer.get("checkpoint_filename", "last"),
                    epoch,
                    state,
                    loss_list,
                    block=False,
                    head_meta=head_meta,
                    extra={
                        "data_it": 0,
                        "total_steps": total_steps,
                        "rng_key": np.asarray(jax.random.key_data(rng)),
                    },
                )
            if vrng is not None:
                vloss, vaux, vn = run_validation(state, vrng)
                if jax.process_index() == 0:
                    msg = f"epoch {epoch} val loss {vloss:.5f} ({vn} batches)"
                    msg += "".join(
                        f" val_{k} {v:.4f}" for k, v in vaux.items()
                    )
                    print(msg, flush=True)
                    if metrics_file is not None:
                        import json

                        rec = {"epoch": epoch, "val_loss": vloss,
                               "val_batches": vn}
                        rec.update({f"val_{k}": v for k, v in vaux.items()})
                        metrics_file.write(json.dumps(rec) + "\n")
                        metrics_file.flush()
                    if tb_writer is not None:
                        tb_writer.add_scalar("val/loss", vloss, total_steps)
                        for k, v in vaux.items():
                            tb_writer.add_scalar(
                                f"val/{k}", float(v), total_steps
                            )
            if dm is not None:
                dm.reset()
            if max_steps is not None and total_steps >= max_steps:
                break

        ckpt.wait_until_finished()
        if tb_writer is not None:
            tb_writer.close()
        if metrics_file is not None:
            metrics_file.close()
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)

    return {"state": state, "loss_list": loss_list}


def _init_variables(model, rngs, cfg: Config, ex: dict, var_ids):
    """Model init with task-correct example args."""
    x = jnp.asarray(ex["x"])
    if cfg.task == "diffusion":
        t = jnp.zeros((x.shape[0],), jnp.int32)
        return model.init(rngs, x, t, var_ids, None)
    if cfg.task == "mae":
        if cfg.adaptive_patching:
            seq = jnp.asarray(ex["seq"])
            seq_ps = jnp.concatenate(
                [ex["seq_size"][:, 0, :, None], ex["seq_pos"][:, 0]], axis=-1
            )
            return model.init(rngs, seq, var_ids, jnp.asarray(seq_ps))
        return model.init(rngs, x, var_ids, None)
    if cfg.task == "unetr":
        if cfg.adaptive_patching:
            nd = 2 if cfg.twoD else 3
            side = cfg.sqrt_len * cfg.patch_size
            seq_img = jnp.zeros((x.shape[0], x.shape[1]) + (side,) * nd, x.dtype)
            seq_ps = jnp.concatenate(
                [ex["seq_size"][:, 0, :, None], ex["seq_pos"][:, 0]], axis=-1
            )
            return model.init(rngs, x, var_ids, jnp.asarray(seq_ps), seq_img)
        return model.init(rngs, x, var_ids, None, None)
    if cfg.task == "sap":
        nd = 2 if cfg.twoD else 3
        side = cfg.sqrt_len * cfg.patch_size
        seq_img = jnp.zeros((x.shape[0], x.shape[1]) + (side,) * nd, x.dtype)
        seq_ps = jnp.concatenate(
            [ex["seq_size"][:, 0, :, None], ex["seq_pos"][:, 0]], axis=-1
        )
        return model.init(rngs, seq_img, var_ids, jnp.asarray(seq_ps))
    # classification
    if cfg.adaptive_patching:
        seq = jnp.asarray(ex["seq"])
        seq_ps = jnp.concatenate(
            [ex["seq_size"][:, 0, :, None], ex["seq_pos"][:, 0]], axis=-1
        )
        return model.init(rngs, seq, var_ids, jnp.asarray(seq_ps))
    return model.init(rngs, x, var_ids, None)


def main(argv=None):
    parser = argparse.ArgumentParser(description="ucf_vit_tpu trainer")
    parser.add_argument("config")
    parser.add_argument(
        "launcher", nargs="?", default=None,
        help="ignored (reference CLI compatibility: MPI|SLURM)",
    )
    parser.add_argument("--task", default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true",
                        help="random data (no dataset on disk needed)")
    parser.add_argument("--log-every", type=int, default=1)
    parser.add_argument("--single-device", action="store_true",
                        help="override parallelism to 1:1:1:1 (smoke runs)")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, task=args.task)
    if args.single_device:
        cfg.raw["parallelism"] = {
            "fsdp_size": 1, "simple_ddp_size": 1,
            "tensor_par_size": 1, "seq_par_size": 1,
        }
    train(cfg, max_steps=args.max_steps, synthetic=args.synthetic,
          log_every=args.log_every)


if __name__ == "__main__":
    main()
