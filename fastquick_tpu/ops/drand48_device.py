"""Device drand48 multi-hit selection: bwa_aln2seq_core's reservoir
draw (reference libbwa/bwase.c:19-44) as an exact on-device scan.

The reference seeds srand48(11) once per mapper and consumes one global
sequential stream across every read's hit list (BwtMapper.cpp:1427 +
bwase.c:19-44): per best-class entry one draw decides the reservoir
acceptance (``drand48() * (width + cnt) > cnt``), and each acceptance
consumes a second draw for the SA-row offset (``k + (bwtint_t)(width *
drand48())``).  Removing the one-program device path's deviation (a)
therefore needs BIT-EXACT 48-bit LCG arithmetic and IEEE-double
rounding semantics on device, where jax has no int64/float64:

- the LCG state and all products ride 12-bit limbs in int32 (partial
  sums stay < 2**26);
- C computes the comparisons in double.  x/2**48 is exact, so the only
  rounding is the single multiply:  fl53(x*W) > cnt<<48  reduces to the
  EXACT integer test  P > R + H  with H = 2**(bitlen(cnt)-6) for
  cnt >= 32 else 0 (R = cnt<<48 is representable; round-nearest-even
  cannot cross a representable bound by more than half the gap above
  it, and the tie lands on R's even mantissa).  The SA offset
  ``(bwtint_t)(w * drand48())`` is  (P2>>48) + [rounding crosses the
  next multiple of 2**48]  with the crossing test
  (2**48 - (P2 & MASK48)) <= 2**(bitlen(P2)-54).  Both identities are
  fuzz-verified against Python floats (== C doubles) over 4M cases
  including engineered half-ulp boundaries
  (tests/test_drand48_device.py).

The scan is sequential by construction (read r+1's draws depend on how
many reads r consumed); on a mesh the caller all-gathers the compact
per-read hit data and runs the identical scan replicated on every
shard, then uses its local slice -- bitwise mesh == single.

Exactness domain: the stream matches the host oracle for every read
the device kernel finished (fallback reads consume their draws on the
host instead, so a batch is stream-exact up to its first fallback
read; differential worlds pin the zero-fallback case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

A48 = 0x5DEECE66D
C48 = 0xB
NL = 4  # state limbs (48 bits, 12-bit limbs)


def seed_state(seed: int = 11) -> np.ndarray:
    """srand48: x = (seed << 16) | 0x330E, as 12-bit limbs."""
    x = ((seed & 0xFFFFFFFF) << 16) | 0x330E
    return np.array([(x >> (12 * i)) & 0xFFF for i in range(NL)], np.int32)


_A_LIMBS = tuple((A48 >> (12 * i)) & 0xFFF for i in range(3))


def _lcg_step(x):
    """x' = (A*x + C) mod 2**48 on (4,) limbs."""
    z = [jnp.int32(0)] * NL
    for i in range(NL):
        for j in range(3):
            if i + j < NL:
                z[i + j] = z[i + j] + x[i] * _A_LIMBS[j]
    z[0] = z[0] + C48
    out = []
    carry = jnp.int32(0)
    for i in range(NL):
        v = z[i] + carry
        out.append(v & 0xFFF)
        carry = v >> 12
    return jnp.stack(out)


def _limbs3(v):
    """int32 scalar (< 2**31) -> 3 limbs."""
    return jnp.stack([v & 0xFFF, (v >> 12) & 0xFFF, (v >> 24) & 0xFFF])


def _mul_4x3(x, w3):
    """(4,) limbs x (3,) limbs -> (7,) limbs, carry-propagated."""
    z = [jnp.int32(0)] * 7
    for i in range(NL):
        for j in range(3):
            z[i + j] = z[i + j] + x[i] * w3[j]
    out = []
    carry = jnp.int32(0)
    for i in range(7):
        v = z[i] + carry
        out.append(v & 0xFFF)
        carry = v >> 12
    return jnp.stack(out)


def _bl12(v):
    """bit length of a 12-bit value (0 -> 0)."""
    r = jnp.int32(0)
    for b in range(12):
        r = jnp.where(v >= (1 << b), b + 1, r)
    return r


def _bitlen(limbs):
    """bit length across little-endian 12-bit limbs."""
    n = limbs.shape[0]
    r = jnp.int32(0)
    for i in range(n):
        r = jnp.where(limbs[i] > 0, 12 * i + _bl12(limbs[i]), r)
    return r


def _gt(a, b):
    """a > b over equal-length limb vectors (base-3 significance trick)."""
    n = a.shape[0]
    v = jnp.int32(0)
    for i in range(n):
        v = v + jnp.where(a[i] > b[i], 1, jnp.where(a[i] < b[i], -1, 0)) \
            * (3 ** i)
    return v > 0


def _pow2_limbs(p, n):
    """2**p as (n,) limbs (p a traced scalar, 0 <= p < 12*n)."""
    out = []
    for i in range(n):
        out.append(jnp.where(p // 12 == i,
                             jnp.int32(1) << jnp.clip(p % 12, 0, 11), 0))
    return jnp.stack(out)


def _accept(x, W, cnt):
    """fl53(x*W) > cnt<<48 with C-double rounding, exactly."""
    P = _mul_4x3(x, _limbs3(W))
    blc = _bitlen(_limbs3(cnt))
    hp = jnp.clip(blc - 6, 0, 30)
    # R + H: cnt at limbs 4..6, H (= 2**hp when cnt >= 32) at limbs 0..2
    hl = jnp.where(cnt > 0, _pow2_limbs(hp, 3) * (blc >= 6), 0)
    rh = jnp.concatenate([hl, jnp.zeros(1, jnp.int32), _limbs3(cnt)])
    return _gt(P, rh)


def _sa_off(x, w):
    """(bwtint_t)(w * drand48()-value x) with C-double rounding."""
    P = _mul_4x3(x, _limbs3(w))
    q = P[4] + P[5] * 4096 + P[6] * 4096 * 4096
    d_nonzero = (P[0] | P[1] | P[2] | P[3]) > 0
    e = _bitlen(P)
    # crossing: (2**48 - D) <= 2**(e-54)  <=>  D >= 2**48 - 2**(e-54)
    tp = jnp.clip(e - 54, 0, 30)
    thr = []  # limbs of 2**48 - 2**tp
    for i in range(NL):
        li = jnp.where(tp // 12 > i, 0,
                       jnp.where(tp // 12 == i,
                                 4096 - (jnp.int32(1)
                                         << jnp.clip(tp % 12, 0, 11)),
                                 0xFFF))
        thr.append(li)
    thr = jnp.stack(thr)
    ge_thr = ~_gt(thr, P[:NL])  # D >= thr
    cross = (e >= 54) & d_nonzero & ge_thr
    return q + cross.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("A_MAX",))
def aln2seq_draw_scan(n_aln, alns, state0, *, A_MAX: int):
    """The global reservoir-draw scan over a batch in row order.

    n_aln: (N,) hits per read (0 = filtered/empty: consumes no draws,
    bwase.c:21).  alns: (N, A_MAX, 3) packed rows
    [mm|go<<6|ge<<12|a<<18|score<<19, k, l] in nondecreasing score
    order.  state0: (4,) limb LCG state.  Returns (sel_f0, sel_row,
    state_out): the selected entry's field word and SA row per read
    (zeros when no acceptance happened -- C's calloc'd bwa_seq_t), and
    the evolved stream state for the next batch."""
    score = (alns[:, :, 0] >> 19) & 127
    best = jnp.where(n_aln > 0, score[:, 0], -1)
    in_best = (jnp.arange(A_MAX)[None, :] < n_aln[:, None]) \
        & (score == best[:, None])
    n_best = in_best.sum(axis=1)

    def body(x, inp):
        nb, rows = inp  # (), (A_MAX, 3)

        def entry(carry):
            i, x, cnt, f0, row = carry
            w = rows[i, 2] - rows[i, 1] + 1
            x1 = _lcg_step(x)
            acc = _accept(x1, w + cnt, cnt)
            x2 = _lcg_step(x1)
            off = _sa_off(x2, w)
            f0 = jnp.where(acc, rows[i, 0], f0)
            row = jnp.where(acc, rows[i, 1] + off, row)
            return (i + 1, jnp.where(acc, x2, x1), cnt + w, f0, row)

        def cond(carry):
            return carry[0] < nb

        _, x, _, f0, row = jax.lax.while_loop(
            cond, entry, (jnp.int32(0), x, jnp.int32(0), jnp.int32(0),
                          jnp.int32(0)))
        return x, (f0, row)

    state, (f0s, rows_out) = jax.lax.scan(body, state0, (n_best, alns))
    return f0s, rows_out, state


class HostDraw:
    """Numpy mirror of the scan (oracle for tests; exact ints)."""

    def __init__(self, seed: int = 11):
        self.x = ((seed & 0xFFFFFFFF) << 16) | 0x330E

    def step(self) -> int:
        self.x = (A48 * self.x + C48) & ((1 << 48) - 1)
        return self.x

    def accept(self, W: int, cnt: int) -> bool:
        return (self.step() / float(1 << 48)) * W > cnt

    def sa_off(self, w: int) -> int:
        return int(w * (self.step() / float(1 << 48)))
