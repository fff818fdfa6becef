"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_qc_step_matches_single_device():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from fastquick_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_qc_step,
        qc_step_local,
    )

    text, dev = ge._tiny_index()
    B = 64
    seqs, rseqs, lens, quals = ge._make_reads(text, B, 76)
    fm_arrays = {"words": dev.words, "occ": dev.occ, "sa": dev.sa,
                 "L2": dev.L2, "primary": dev.primary}

    # single-device reference
    ref = qc_step_local(dev.words, dev.occ, dev.sa, dev.L2, dev.primary,
                        dev.n, None, 0, jnp.asarray(seqs), jnp.asarray(rseqs),
                        jnp.asarray(lens), jnp.asarray(quals))

    mesh = make_mesh(8)
    step = make_sharded_qc_step(mesh, fm_arrays, dev.n)
    sh1 = NamedSharding(mesh, P("dp"))
    sh2 = NamedSharding(mesh, P("dp", None))
    out = step(jax.device_put(jnp.asarray(seqs), sh2),
               jax.device_put(jnp.asarray(rseqs), sh2),
               jax.device_put(jnp.asarray(lens), sh1),
               jax.device_put(jnp.asarray(quals), sh2))

    for key in ("depth", "q20", "q30", "qual_hist"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    assert int(out["n_mapped"]) == int(ref["n_mapped"])
    assert int(out["n_reads"]) == B


def test_host_chip_2d_mesh_matches_single_device():
    """Multi-host layout: 2 hosts x 4 chips; batch sharded over both
    axes, stats psum'd chip-axis (ICI) then host-axis (DCN)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from fastquick_tpu.parallel.mesh import (
        make_mesh_2d,
        make_sharded_qc_step,
        qc_step_local,
    )

    text, dev = ge._tiny_index()
    B = 64
    seqs, rseqs, lens, quals = ge._make_reads(text, B, 76)
    fm_arrays = {"words": dev.words, "occ": dev.occ, "sa": dev.sa,
                 "L2": dev.L2, "primary": dev.primary}
    ref = qc_step_local(dev.words, dev.occ, dev.sa, dev.L2, dev.primary,
                        dev.n, None, 0, jnp.asarray(seqs), jnp.asarray(rseqs),
                        jnp.asarray(lens), jnp.asarray(quals))

    mesh = make_mesh_2d(2, 4)
    step = make_sharded_qc_step(mesh, fm_arrays, dev.n,
                                axis=("host", "chip"))
    sh1 = NamedSharding(mesh, P(("host", "chip")))
    sh2 = NamedSharding(mesh, P(("host", "chip"), None))
    out = step(jax.device_put(jnp.asarray(seqs), sh2),
               jax.device_put(jnp.asarray(rseqs), sh2),
               jax.device_put(jnp.asarray(lens), sh1),
               jax.device_put(jnp.asarray(quals), sh2))
    for key in ("depth", "q20", "q30", "qual_hist"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(ref[key]), err_msg=key)
    assert int(out["n_mapped"]) == int(ref["n_mapped"])
    assert int(out["n_reads"]) == B


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(np.asarray(out["n_reads"])) == 64
    assert int(np.asarray(out["n_mapped"])) > 0
