"""Replica-consistency detector: healthy meshes pass, an injected
single-device corruption is caught and attributed.

The reference keeps TP/DDP replicas consistent by construction and never
re-verifies (`src/UCF_VIT/utils/misc.py:129-238`); this subsystem actively
detects silent divergence (HBM bit flips, rank-skew bugs). The corruption
test builds a *logically replicated* global array whose per-device buffers
secretly differ — exactly what a hardware fault produces — via
`jax.make_array_from_single_device_arrays`, which trusts the caller."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ucf_vit_tpu.parallel.mesh import make_mesh
from ucf_vit_tpu.parallel.sync_check import (
    ReplicaDesyncError,
    check_replica_consistency,
    device_fingerprints,
)


def _params(mesh):
    """A small pytree with the trainer's real sharding mix: fsdp-sharded,
    tp-sharded, and fully replicated leaves."""
    k = jax.random.PRNGKey(0)
    ka, kb, kc = jax.random.split(k, 3)
    return {
        "embed": jax.device_put(
            jax.random.normal(ka, (8, 16)),
            NamedSharding(mesh, P("fsdp", None)),
        ),
        "qkv": jax.device_put(
            jax.random.normal(kb, (16, 8)),
            NamedSharding(mesh, P(None, "tp")),
        ),
        "bias": jax.device_put(
            jax.random.normal(kc, (16,)), NamedSharding(mesh, P())
        ),
    }


def test_healthy_replicas_pass():
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, tensor_par_size=2)
    report = check_replica_consistency(_params(mesh), mesh)
    assert report.ok
    # ddp is the axis no param uses -> that's where the redundancy lives
    assert report.redundancy_axes == ("ddp",)
    # groups = one per (fsdp, tp) coordinate
    assert report.n_groups == 4
    assert "OK" in report.describe()


def test_injected_corruption_is_caught_and_attributed():
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, tensor_par_size=2)
    params = _params(mesh)

    # corrupt ONE device's copy of the replicated bias: build the global
    # array from per-device buffers, flipping a value on a single device
    sharding = NamedSharding(mesh, P())
    base = np.asarray(jax.device_get(params["bias"]))
    bufs = []
    bad_dev = None
    for i, d in enumerate(sharding.addressable_devices):
        buf = base.copy()
        if i == 1:  # any single device: its ddp-group must flag
            buf[3] += 1e-3
            bad_dev = d
        bufs.append(jax.device_put(jnp.asarray(buf), d))
    params["bias"] = jax.make_array_from_single_device_arrays(
        base.shape, sharding, bufs
    )

    with pytest.raises(ReplicaDesyncError) as e:
        check_replica_consistency(params, mesh)
    assert f"device {bad_dev.id}" in str(e.value)

    report = check_replica_consistency(
        params, mesh, raise_on_mismatch=False
    )
    assert not report.ok
    assert len(report.mismatches) == 1
    ids = [d for d, _ in report.mismatches[0][1]]
    assert bad_dev.id in ids


def test_fully_sharded_params_have_no_redundancy():
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, tensor_par_size=2)
    params = {
        "w": jax.device_put(
            jnp.arange(64.0).reshape(8, 8),
            NamedSharding(mesh, P(("ddp", "fsdp"), "tp")),
        )
    }
    report = check_replica_consistency(params, mesh)
    assert report.ok
    assert report.redundancy_axes == ()
    assert report.n_groups == 8  # every device its own singleton group


def test_rejects_host_arrays():
    mesh = make_mesh(fsdp_size=2)
    with pytest.raises(TypeError):
        device_fingerprints({"w": np.ones((4, 4))}, mesh)


def test_trainer_runs_with_sync_check_enabled():
    """trainer.sync_check_every wires the detector into the train loop: a
    healthy hybrid-mesh run passes the per-step check and completes."""
    from ucf_vit_tpu.config import Config
    from ucf_vit_tpu.train import train

    init = {
        "default_vars": ["v"], "tile_size": [16, 16], "patch_size": 8,
        "embed_dim": 16, "depth": 2, "num_heads": 2, "mlp_ratio": 4,
        "twoD": True, "adaptive_patching": False,
    }
    raw = {
        "trainer": {"task": "classification", "max_epochs": 1,
                    "sync_check_every": 1},
        "parallelism": {"fsdp_size": 2, "simple_ddp_size": 2,
                        "tensor_par_size": 2, "seq_par_size": 1},
        "model": {"lr": 1e-3, "warmup_steps": 2, "max_steps": 10,
                  "net": {"init_args": init}},
        "data": {
            "dataset": "basic_ct", "dict_root_dirs": {},
            "dict_start_idx": {}, "dict_end_idx": {},
            "dict_buffer_sizes": {}, "num_channels_used": {"d": 1},
            "dict_in_variables": {}, "batch_size": 4,
            "single_channel": True, "tile_overlap": 0.0,
            "use_all_data": False, "num_classes": 3,
        },
        "load_balancing": {"auto_load_balancing": False},
    }
    out = train(Config(raw=raw, task="classification"), max_steps=2,
                synthetic=True)
    assert len(out["loss_list"]) == 1


def test_fingerprints_are_deterministic():
    mesh = make_mesh(simple_ddp_size=2, fsdp_size=2, tensor_par_size=2)
    params = _params(mesh)
    a, _ = device_fingerprints(params, mesh)
    b, _ = device_fingerprints(params, mesh)
    np.testing.assert_array_equal(a, b)
