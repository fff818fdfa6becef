"""Device drand48 reservoir selection vs the host oracle.

The on-device scan (ops/drand48_device) must reproduce the EXACT
selection bwa_aln2seq_core makes under one global srand48(11) stream
(reference libbwa/bwase.c:19-44) -- including the C-double rounding of
the accept comparison and the SA-offset truncation -- because the
one-program device QC path feeds positions from it."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fastquick_tpu.align.core import Aln, bwa_aln2seq_core  # noqa: E402
from fastquick_tpu.align.rand import Rand48  # noqa: E402
from fastquick_tpu.ops.drand48_device import (  # noqa: E402
    aln2seq_draw_scan,
    seed_state,
)

A_MAX = 48


class _Seq:
    pass


def _random_batch(rng, n_reads):
    """Hit lists shaped like the kernel's output: nondecreasing score,
    mixed widths (incl. wide repeat intervals), some empty reads."""
    n_aln = np.zeros(n_reads, np.int32)
    alns = np.zeros((n_reads, A_MAX, 3), np.int32)
    py = []
    for r in range(n_reads):
        kind = r % 5
        if kind == 4:
            py.append([])
            continue
        k = int(rng.integers(1, 3 if kind == 3 else 2))  # score classes
        rows = []
        score = int(rng.integers(0, 4)) * 3
        for c in range(k):
            for _ in range(int(rng.integers(1, 4))):
                width = int(rng.integers(1, [2, 40, 100000, 6][kind]))
                kk = int(rng.integers(0, 1 << 20))
                mm = score // 3
                rows.append((mm, 0, 0, int(rng.integers(0, 2)), kk,
                             kk + width - 1, score))
            score += 3
        rows = rows[:A_MAX]
        n_aln[r] = len(rows)
        for i, t in enumerate(rows):
            alns[r, i, 0] = (t[0] | (t[1] << 6) | (t[2] << 12)
                             | (t[3] << 18) | (t[6] << 19))
            alns[r, i, 1] = t[4]
            alns[r, i, 2] = t[5]
        py.append([Aln(*t) for t in rows])
    return n_aln, alns, py


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    n_reads = 400
    n_aln, alns, py = _random_batch(rng, n_reads)

    # host oracle: one Rand48 stream across the batch in row order
    host = Rand48(11)
    exp_f0 = np.zeros(n_reads, np.int64)
    exp_row = np.zeros(n_reads, np.int64)
    for r in range(n_reads):
        s = _Seq()
        s.n_mm = s.n_gapo = s.n_gape = s.strand = s.score = 0
        s.sa = 0
        bwa_aln2seq_core(py[r], s, True, 0, host)
        if py[r]:
            exp_f0[r] = (s.n_mm | (s.n_gapo << 6) | (s.n_gape << 12)
                         | (s.strand << 18) | (s.score << 19))
            exp_row[r] = s.sa

    f0, row, state = aln2seq_draw_scan(
        jnp.asarray(n_aln), jnp.asarray(alns),
        jnp.asarray(seed_state(11)), A_MAX=A_MAX)
    f0 = np.asarray(f0)
    row = np.asarray(row)
    for r in range(n_reads):
        assert f0[r] == exp_f0[r], f"read {r}: f0 {f0[r]} vs {exp_f0[r]}"
        assert row[r] == exp_row[r], f"read {r}: row {row[r]} vs {exp_row[r]}"
    # state continuation: a second batch continues the same stream
    n2, a2, py2 = _random_batch(rng, 64)
    for r in range(64):
        s = _Seq()
        s.n_mm = s.n_gapo = s.n_gape = s.strand = s.score = 0
        s.sa = 0
        bwa_aln2seq_core(py2[r], s, True, 0, host)
        f2, row2, _ = aln2seq_draw_scan(
            jnp.asarray(n2[r:r + 1]), jnp.asarray(a2[r:r + 1]), state,
            A_MAX=A_MAX) if r == 0 else (None, None, None)
        if r == 0 and py2[r]:
            assert int(np.asarray(row2)[0]) == s.sa
        break
