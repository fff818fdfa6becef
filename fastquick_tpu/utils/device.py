"""Accelerator health probe for automatic engine selection.

The reference driver always runs its one CPU engine
(bin/FASTQuick_template.sh:465-496 just invokes `FASTQuick align`); the
TPU rebuild picks per host: a healthy TPU engages the device path
(`--device_qc` semantics), CPU hosts keep the native engine.  The probe
MUST run out-of-process: a wedged TPU relay hangs even
`jax.devices()`, so an in-process check could never time out (observed
on this session's axon relay; see CLAUDE.md).
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "assert jax.default_backend() != 'cpu', 'cpu backend';"
    "print(int(jax.jit(lambda v: (v * 2).sum())(jnp.arange(8))))"
)

_cached: bool | None = None


def healthy_tpu(timeout: float = 240.0, use_cache: bool = True) -> bool:
    """True when a non-CPU jax backend exists AND answers a trivial jit
    dispatch within `timeout` seconds (relay compile roundtrips here can take
    ~2 min when the tunnel is backlogged).  FQ_NO_TPU=1 forces False (kill
    switch for flaky relays).  Result is cached per process."""
    global _cached
    if os.environ.get("FQ_NO_TPU", "0") == "1":
        return False
    if use_cache and _cached is not None:
        return _cached
    env = dict(os.environ)
    # NB: do NOT drop PALLAS_AXON_POOL_IPS from a fresh process's env --
    # sitecustomize needs it to REGISTER the backend; in-process pops
    # after registration (bench._device_env_fix) are a different thing
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE], env=env,
                           timeout=timeout, capture_output=True)
        ok = r.returncode == 0
    except Exception:
        ok = False
    _cached = ok
    return ok
