"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated on this fake mesh (the driver separately
dry-runs the real multi-chip path via __graft_entry__.dryrun_multichip).

The session image pre-registers a TPU PJRT plugin from sitecustomize
(which imports jax before any conftest runs), so plain env vars are too
late -- we override through jax.config before any backend initializes.
"""

import os

# FQ_TEST_PLATFORM=axon runs the single-device ops tests on the real TPU
# (skip the 8-device mesh tests there: one chip behind the relay).
_plat = os.environ.get("FQ_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
if _plat == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # the session image routes even CPU compiles through the axon
    # remote-compile helper when this is set; a 3 GiB-operand program
    # (the k-mer filter bitmaps) then takes minutes -- or hangs forever
    # when the relay is wedged.  CPU tests must compile locally.
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
else:
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", _plat)
