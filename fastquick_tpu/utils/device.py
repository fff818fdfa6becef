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
    "import time, jax, jax.numpy as jnp, numpy as np;"
    "assert jax.default_backend() != 'cpu', 'cpu backend';"
    "print(int(jax.jit(lambda v: (v * 2).sum())(jnp.arange(8))));"
    # link-speed probe: 8 MB H2D.  A PCIe/ICI-attached chip moves this
    # in ~1 ms; a network relay (this session: ~45 MB/s) takes ~0.2 s.
    # The align driver only AUTO-engages the device path on a fast
    # link -- a relay-bound chip makes the device path slower than the
    # native engine (measured 809 vs 12,700 reads/s at production
    # scale), while --device_qc stays an explicit override.
    "x = np.zeros(2_000_000, np.int32);"
    "t0 = time.time(); d = jnp.asarray(x); jax.block_until_ready(d);"
    "mbps = 8.0 / max(time.time() - t0, 1e-9);"
    "print(f'H2D_MBPS={mbps:.0f}')"
)

_cached: dict | None = None


def healthy_tpu(timeout: float = 240.0, use_cache: bool = True,
                min_h2d_mbps: float | None = None) -> bool:
    """True when a non-CPU jax backend exists AND answers a trivial jit
    dispatch within `timeout` seconds (relay compile roundtrips here can take
    ~2 min when the tunnel is backlogged).  FQ_NO_TPU=1 forces False (kill
    switch for flaky relays).

    min_h2d_mbps: when set (the align driver's AUTO engine selection
    passes FQ_MIN_H2D_MBPS, default 500), the chip must also move an
    8 MB H2D probe at that bandwidth -- a network-relay-attached chip
    (~45 MB/s here) makes the device path slower than the native
    engine, so auto keeps native there; --device_qc still forces the
    device path.  Result is cached per process."""
    global _cached
    if os.environ.get("FQ_NO_TPU", "0") == "1":
        return False
    key = (min_h2d_mbps is not None)
    if use_cache and _cached is not None and _cached.get(key) is not None:
        return _cached[key]
    env = dict(os.environ)
    # NB: do NOT drop PALLAS_AXON_POOL_IPS from a fresh process's env --
    # sitecustomize needs it to REGISTER the backend; in-process pops
    # after registration (bench._device_env_fix) are a different thing
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE], env=env,
                           timeout=timeout, capture_output=True)
        ok = r.returncode == 0
        if ok and min_h2d_mbps is not None:
            mbps = 0.0
            for line in r.stdout.decode(errors="replace").splitlines():
                if line.startswith("H2D_MBPS="):
                    mbps = float(line.split("=", 1)[1])
            ok = mbps >= min_h2d_mbps
    except Exception:
        ok = False
    if _cached is None:
        _cached = {}
    _cached[key] = ok
    return ok
