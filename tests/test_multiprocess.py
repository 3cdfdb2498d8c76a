"""TRUE multi-process integration test: two JAX processes (CPU backend, one
device each) form one 2-device mesh via jax.distributed and train a tiny MAE
for 3 steps. This exercises the code paths single-process mesh simulation
cannot: distributed rendezvous, cross-process global-batch assembly
(`shard_batch` -> make_array_from_process_local_data with *different* local
shards per process), and the sharded train step over a multi-process mesh.
Both ranks must report identical global losses.

The reference's analog is its mpirun/srun "test" scripts that need a real
cluster (`README.md:148-329`); here two subprocesses on localhost suffice.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["UCF_REPO"])
import jax
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["UCF_PORT"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
import numpy as np
from ucf_vit_tpu.models import MAE
from ucf_vit_tpu.ops.attention import AttnImpl
from ucf_vit_tpu.ops.patchify import patchify
from ucf_vit_tpu.utils.metrics import masked_mse
from ucf_vit_tpu.utils.optim import configure_optimizer
from ucf_vit_tpu.parallel import make_mesh
from ucf_vit_tpu.parallel.mesh import mesh_context, shard_batch
from ucf_vit_tpu.parallel.train_step import create_sharded_train_state, make_train_step

assert jax.process_count() == 2
model = MAE(img_size=(32,32), patch_size=8, in_chans=3, embed_dim=16, depth=1,
            num_heads=2, class_token=False, default_vars=("r","g","b"),
            mask_ratio=0.75, decoder_embed_dim=8, decoder_depth=1,
            decoder_num_heads=2, attn_impl=AttnImpl.EINSUM)
rng = np.random.default_rng(jax.process_index())  # different data per process
local = {"x": np.asarray(rng.normal(size=(2,3,32,32)), np.float32)}

def init_fn():
    return model.init({"params": jax.random.key(0), "mask": jax.random.key(1)},
                      jnp.zeros((4,3,32,32)))

def loss_fn(params, b, rng):
    pred, mask = model.apply({"params": params}, b["x"], rngs={"mask": rng})
    return masked_mse(pred, patchify(b["x"], 8, True), mask)

import os as _os
mesh_shape = tuple(int(v) for v in _os.environ["UCF_MESH"].split(","))
mesh = make_mesh(*mesh_shape)
with mesh_context(mesh):
    shapes = jax.eval_shape(init_fn)["params"]
    tx = configure_optimizer(shapes, lr=1e-3, warmup_steps=2, max_steps=10)
    state, _ = create_sharded_train_state(init_fn, tx, mesh)
    step = make_train_step(loss_fn, tx, donate=False)
    gbatch = shard_batch(mesh, local)
    losses = []
    for i in range(3):
        state, loss, _ = step(state, gbatch, jax.random.key(i))
        losses.append(float(loss))
print("LOSSES", losses, flush=True)
assert all(np.isfinite(l) for l in losses)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


import pytest


@pytest.mark.parametrize("mesh_shape", ["2,1,1,1", "1,2,1,1"])
def test_two_process_mesh_training(mesh_shape):
    """ddp=2: batch split across processes; fsdp=2: parameters sharded
    across the process boundary (ZeRO-3 over 'DCN')."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",  # drop any sitecustomize that overrides the backend
        UCF_REPO=repo,
        UCF_PORT=str(_free_port()),
        UCF_MESH=mesh_shape,
    )
    env.pop("XLA_FLAGS", None)  # one device per process, no virtual mesh
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    losses = [l for _, o in outs for l in o.splitlines() if l.startswith("LOSSES")]
    assert len(losses) == 2
    assert losses[0] == losses[1], f"ranks disagree: {losses}"
    vals = eval(losses[0][len("LOSSES "):])
    assert all(np.isfinite(v) for v in vals) and len(vals) == 3


_PREEMPT_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["UCF_REPO"])
import jax
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["UCF_PORT"],
    num_processes=2, process_id=int(sys.argv[1]),
)
sys.path.insert(0, os.environ["UCF_REPO"] + "/tests")
from test_trainer import _cfg
from ucf_vit_tpu.train import train
cfg = _cfg("classification", extra_data={"num_classes": 3},
           parallelism={"fsdp_size": 1, "simple_ddp_size": 2,
                        "tensor_par_size": 1, "seq_par_size": 1})
cfg.raw["trainer"]["checkpoint_path"] = os.environ["UCF_CK"]
cfg.raw["trainer"]["max_epochs"] = 500
train(cfg, synthetic=True)
print(f"RANK{jax.process_index()} EXITED_CLEANLY", flush=True)
"""


def test_two_process_preemption_sync(tmp_path):
    """SIGTERM delivered to rank 0 ONLY: the per-step flag allgather must
    make BOTH ranks break at the same SPMD boundary, run the collective
    checkpoint save, and exit cleanly — a rank acting alone on its local
    signal would deadlock the other (round-2 review finding)."""
    import signal
    import threading
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = str(tmp_path / "ck")
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
        UCF_REPO=repo, UCF_PORT=str(_free_port()), UCF_CK=ck,
    )
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _PREEMPT_WORKER, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    buf = {0: [], 1: []}

    def reader(i):
        for line in procs[i].stdout:
            buf[i].append(line)

    threads = [threading.Thread(target=reader, args=(i,), daemon=True)
               for i in range(2)]
    for t in threads:
        t.start()
    deadline = time.time() + 400
    while time.time() < deadline:
        if any("epoch 0 it" in l for l in buf[0]):
            break
        if procs[0].poll() is not None:
            break
        time.sleep(1)
    time.sleep(3)
    procs[0].send_signal(signal.SIGTERM)  # rank 0 ONLY
    rcs = [p.wait(timeout=240) for p in procs]
    for t in threads:
        t.join(timeout=5)
    out0, out1 = "".join(buf[0]), "".join(buf[1])
    assert rcs == [0, 0], (out0[-1500:], out1[-1500:])
    assert "EXITED_CLEANLY" in out0 and "preempted in epoch" in out0, out0[-1500:]
    assert "EXITED_CLEANLY" in out1, out1[-1500:]
    assert os.path.isdir(ck) and os.listdir(ck), "no checkpoint written"


_MIDEPOCH_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["UCF_REPO"])
import jax
jax.distributed.initialize(
    coordinator_address="localhost:" + os.environ["UCF_PORT"],
    num_processes=2, process_id=int(sys.argv[1]),
)
sys.path.insert(0, os.environ["UCF_REPO"] + "/tests")
from test_midepoch_resume import _mae_file_cfg
from ucf_vit_tpu.train import train
cfg = _mae_file_cfg(os.environ["UCF_DATA"], os.environ["UCF_CK"],
                    os.environ["UCF_METRICS"])
cfg.raw["parallelism"]["simple_ddp_size"] = 2
cfg.raw["trainer"]["preempt_sync_every"] = 1
cfg.raw["trainer"]["preempt_after_steps"] = int(os.environ["UCF_DRILL"])
cfg.raw["trainer"]["resume_from_checkpoint"] = os.environ["UCF_RESUME"] == "1"
train(cfg)
print(f"RANK{jax.process_index()} EXITED_CLEANLY", flush=True)
"""


def _run_midepoch_pair(env_extra, tmp_env):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
        UCF_REPO=repo, UCF_PORT=str(_free_port()), **tmp_env, **env_extra,
    )
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _MIDEPOCH_WORKER, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    return outs


def test_two_process_midepoch_resume_bit_exact(tmp_path):
    """The deterministic preemption drill fires on BOTH ranks at the same
    step (preempt_sync_every=1 consensus); resume re-enters the epoch on
    both ranks, each fast-forwarding its own per-process file shard — and
    rank 0's per-step losses equal the uninterrupted 2-process run's
    exactly. This is the multi-host version of
    test_midepoch_resume.test_trainer_midepoch_resume_bit_exact."""
    import json

    from test_midepoch_resume import _make_ct_dataset

    data = str(tmp_path / "data")
    _make_ct_dataset(data, 8, shape=(32, 32, 4), seed=5)

    def metrics(path):
        with open(path) as f:
            return [json.loads(l) for l in f if "loss" in l]

    # A: uninterrupted 2-process run
    m_a = str(tmp_path / "a.jsonl")
    _run_midepoch_pair(
        {"UCF_DRILL": "0", "UCF_RESUME": "0"},
        {"UCF_DATA": data, "UCF_CK": str(tmp_path / "ck_a"),
         "UCF_METRICS": m_a},
    )
    rec_a = metrics(m_a)
    assert [(r["epoch"], r["it"]) for r in rec_a] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)
    ]

    # B1: drill preempts both ranks after step 2; B2: resume mid-epoch
    m_b = str(tmp_path / "b.jsonl")
    ck_b = str(tmp_path / "ck_b")
    out0, _ = _run_midepoch_pair(
        {"UCF_DRILL": "2", "UCF_RESUME": "0"},
        {"UCF_DATA": data, "UCF_CK": ck_b, "UCF_METRICS": m_b},
    )
    assert "preempted in epoch 0 after 2 its" in out0, out0[-1500:]
    out0, _ = _run_midepoch_pair(
        {"UCF_DRILL": "0", "UCF_RESUME": "1"},
        {"UCF_DATA": data, "UCF_CK": ck_b, "UCF_METRICS": m_b},
    )
    assert "resumed mid-epoch: epoch 0, fast-forwarding 2 batches" in out0

    rec_b = metrics(m_b)
    assert [(r["epoch"], r["it"]) for r in rec_b] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)
    ]
    np.testing.assert_allclose(
        [r["loss"] for r in rec_b], [r["loss"] for r in rec_a], rtol=1e-6
    )
