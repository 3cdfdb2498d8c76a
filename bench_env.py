"""Benchmark process-environment normalization. MUST import before jax.

The rig's TPU tunnel has registered its PJRT plugin under both 'axon' and
'tpu' across rig updates, and the login shell presets JAX_PLATFORMS=axon;
when the plugin is registered under the other name, an explicit stale
spelling aborts jax at init ("No jellyfish device found" / unknown
platform). Hardcoding a replacement list has the dual failure mode — a
'tpu,cpu' remap silently falls back to CPU when the plugin is 'axon'
again, publishing host throughput as chip numbers. The robust move is to
DROP a stale tunnel spelling entirely and let jax auto-detect whichever
plugin is actually registered (verified on this rig: unset finds the
tunnel chip and reports platform 'tpu').

An explicit 'cpu' (or anything else the user set deliberately, e.g.
'cpu,tpu' for a forced-host run) is honored untouched.
"""

from __future__ import annotations

import os

_TUNNEL_SPELLINGS = {"axon", "tpu", "axon,cpu", "tpu,cpu"}


def normalize_jax_platforms() -> None:
    if os.environ.get("JAX_PLATFORMS", "") in _TUNNEL_SPELLINGS:
        del os.environ["JAX_PLATFORMS"]


def require_accelerator() -> None:
    """Fail loudly if the selected backend is host CPU without the user
    having asked for it — a benchmark that quietly publishes CPU numbers
    under a 'per chip' metric name is worse than one that aborts."""
    import jax

    if (
        jax.devices()[0].platform == "cpu"
        and os.environ.get("JAX_PLATFORMS", "") != "cpu"
    ):
        raise SystemExit(
            "benchmark refusing to run: jax selected the host CPU backend "
            "but JAX_PLATFORMS=cpu was not explicitly set — set it to "
            "benchmark the host on purpose, or fix the TPU plugin"
        )
