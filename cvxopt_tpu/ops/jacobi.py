"""Batched small-matrix symmetric eigensolver — parallel-ordered
cyclic Jacobi — and the accurate-eigh wrappers the 's'-cone paths use
on the axon TPU backend.

XLA's batched `eigh` lowers to a sequential tridiagonalization + QR
pipeline per matrix; in emulated f64 on the axon TPU tunnel ONE eigh
instance costs ~165 s of REMOTE COMPILE (measured r04, run time ~0).
This module therefore keeps every Jacobi loop COMPILE-SMALL: the
(m-1) rotation rounds of a sweep are a `lax.scan` over a precomputed
pairs table (program size O(1) in m, not O(m)), and the accurate-eigh
wrappers seed from an f32 eigh — numerically free, because the
platform's emulated-f64 eigh is only f32-GRADE anyway (measured
reconstruction error ~4e-7*||A||, relative errors up to 1e+2 on small
eigenvalues), while its f64 matmul/elementwise ops ARE f64-accurate
(~1e-15; ops/matvec.py measurement series).

Jacobi is also more accurate than QR-based eigh for small eigenvalues
(relative accuracy for positive definite matrices — Demmel/Veselic),
which is what the NT scaling consumes (the reference computes this
scaling through gesvd for the same reason, misc.py:393-414).

Odd m is handled by padding to m+1 with a decoupled unit diagonal:
pairs touching the pad index see a zero coupling, their rotations
reduce to the identity, and the pad row/column is sliced off before
sorting.

Two accurate flavors:
  eigh_accurate      — f32-eigh seed + two-sided polish of T = V'AV
                       (near-diagonal, so 2 sweeps reach
                       ~||A||*eps_f64 absolute);
  gram_eigh_accurate — for A = M'M given M: one-sided Jacobi on
                       B = M V0, which (Demmel-Veselic) delivers
                       RELATIVE accuracy for the small eigenvalues.
Both are identity-cost on CPU (plain f64 eigh) where XLA's eigh is
already f64-exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=32)
def _round_robin(m: int):
    """Round-robin tournament pairings: (m-1) rounds of m/2 disjoint
    pairs covering all m(m-1)/2 pairs (m padded to even)."""
    me = m + (m % 2)
    players = list(range(me))
    rounds = []
    for _ in range(me - 1):
        pairs = [(players[i], players[me - 1 - i])
                 for i in range(me // 2)]
        pairs = [(min(p, q), max(p, q)) for p, q in pairs
                 if p < m and q < m]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return tuple(tuple(r) for r in rounds)


@functools.lru_cache(maxsize=32)
def _round_robin_table(m: int):
    """Padded-to-even pairings as arrays for `lax.scan`: me = m+(m%2),
    returns (p, q) int32 arrays of shape (me-1, me//2) covering all
    pairs of range(me) — pairs involving index m (the pad, odd m
    only) rotate by identity because the pad is decoupled."""
    me = m + (m % 2)
    players = list(range(me))
    ps, qs = [], []
    for _ in range(me - 1):
        pr = [min(players[i], players[me - 1 - i])
              for i in range(me // 2)]
        qr = [max(players[i], players[me - 1 - i])
              for i in range(me // 2)]
        ps.append(pr)
        qs.append(qr)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return (np.asarray(ps, np.int32), np.asarray(qs, np.int32), me)


@functools.lru_cache(maxsize=32)
def _partner_tables(m: int):
    """Scatter-free rotation-round tables: every index of range(me) is
    in EXACTLY ONE pair per round, so a round's column update is a
    full REBUILD  newA[:, j] = c[j]*A[:, j] + sgn[j]*s[j]*A[:, partner[j]]
    — one gather + two muls + one add, no scatters (r05; scatters
    copy the whole array on this backend).  Returns (p, q, partner,
    sign, pair_idx, me): partner/sign/pair_idx shaped (me-1, me)."""
    ps, qs, me = _round_robin_table(m)
    nr = ps.shape[0]
    partner = np.zeros((nr, me), np.int32)
    sign = np.zeros((nr, me), np.float32)
    pidx = np.zeros((nr, me), np.int32)
    for r in range(nr):
        for k in range(me // 2):
            p, q = ps[r, k], qs[r, k]
            partner[r, p], partner[r, q] = q, p
            sign[r, p], sign[r, q] = -1.0, 1.0
            pidx[r, p] = pidx[r, q] = k
    return ps, qs, partner, sign, pidx, me


def _pad_even(A, me):
    """Pad (..., m, m) to (..., me, me) with a decoupled unit
    diagonal."""
    m = A.shape[-1]
    if me == m:
        return A
    pad = [(0, 0)] * (A.ndim - 2) + [(0, me - m), (0, me - m)]
    A = jnp.pad(A, pad)
    return A.at[..., m:, m:].set(jnp.eye(me - m, dtype=A.dtype))


def _rotation(app, aqq, apq, dtype):
    """Stable Jacobi rotation (Golub & Van Loan 8.4): returns (c, s)
    zeroing the (p, q) coupling; identity where apq == 0.

    Range-safe form: the textbook tau = (aqq-app)/(2 apq) overflows
    for tiny couplings — harmless in true f64, but the TPU's EMULATED
    f64 inherits the f32 exponent range, so tau^2 -> inf -> NaN on
    the near-diagonal matrices the polish path sees (measured: all-NaN
    eigh on a T with 1e-6 off-diagonal mass).  The algebraically
    equivalent t = 2 apq sign(theta) / (|theta| + sqrt(theta^2 +
    4 apq^2)) keeps every intermediate at the scale of the matrix
    entries."""
    theta = aqq - app
    denom = jnp.abs(theta) + jnp.sqrt(theta * theta
                                      + 4.0 * apq * apq)
    sgn = jnp.where(theta >= 0.0, 1.0, -1.0).astype(dtype)
    t = 2.0 * apq * sgn / jnp.where(denom == 0.0, 1.0, denom)
    t = jnp.where(apq == 0.0, jnp.zeros((), dtype), t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def eigh_jacobi(A, sweeps: int = 12):
    """Batched eigh: returns (w, V) with A = V diag(w) V', w ascending
    — same contract as jnp.linalg.eigh.  A: (..., m, m) symmetric.
    Pure batched matmul/elementwise work; compile-small (the rotation
    rounds are a scan over a pairs table)."""
    m = A.shape[-1]
    batch = A.shape[:-2]
    dtype = A.dtype
    prs, qrs, partner, sign, pidx, me = _partner_tables(m)
    A = _pad_even(A, me)
    eye = jnp.eye(me, dtype=dtype)

    def one_round(AV, tables):
        # The round's me/2 rotations are DISJOINT and cover every
        # index once, so J'AJ is a full scatter-free REBUILD:
        #   cols:  A <- cs*A + ss*A[:, partner]
        #   rows:  A <- cs'*A + ss'*A[partner, :]
        # (r05: the original full-J matmul form cost 379 ms per
        # (2,200,200) eigh_accurate on the emulated-f64 TPU backend;
        # the first elementwise rewrite still paid 6 whole-array
        # scatters per round)
        A, V = AV
        p, q, prt, sgn, pix = tables
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        c, s = _rotation(app, aqq, apq, dtype)
        cs = c[..., pix]                       # per-column c
        ss = s[..., pix] * sgn.astype(dtype)   # per-column signed s
        ccol, scol = cs[..., None, :], ss[..., None, :]
        A = ccol * A + scol * A[..., :, prt]
        crow, srow = cs[..., :, None], ss[..., :, None]
        A = crow * A + srow * A[..., prt, :]
        V = ccol * V + scol * V[..., :, prt]
        return (A, V), 0

    xs = (jnp.asarray(prs), jnp.asarray(qrs), jnp.asarray(partner),
          jnp.asarray(sign), jnp.asarray(pidx))

    def sweep(_, AV):
        (A, V), _ = lax.scan(one_round, AV, xs)
        # re-symmetrize against drift once per sweep
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return (A, V)

    V0 = jnp.broadcast_to(eye, batch + (me, me))
    A, V = lax.fori_loop(0, sweeps, sweep, (A, V0))
    w = jnp.diagonal(A, axis1=-2, axis2=-1)[..., :m]
    V = V[..., :m, :m]
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def eigvalsh_jacobi(A, sweeps: int = 12):
    return eigh_jacobi(A, sweeps=sweeps)[0]


def _needs_polish(dtype):
    return dtype == jnp.float64 and jax.default_backend() != "cpu"


def _seed_eigh(A):
    """Seed eigendecomposition for the polish: f32 XLA eigh on
    accelerator backends (the emulated-f64 eigh is f32-grade AND its
    remote compile is ~165 s/instance; the f32 program is native and
    far smaller), re-orthonormalized in f64 by two Newton-Schulz
    steps (V <- V(3I - V'V)/2, quadratic: 1e-7 seed error -> machine)
    — without this the seed's f32-grade non-orthogonality puts a
    ~1e-7 floor under the polished eigenvalues (measured)."""
    w0, V0 = jnp.linalg.eigh(A.astype(jnp.float32))
    V = V0.astype(A.dtype)
    eye3 = 3.0 * jnp.eye(A.shape[-1], dtype=A.dtype)
    for _ in range(2):
        V = 0.5 * V @ (eye3 - jnp.swapaxes(V, -1, -2) @ V)
    return w0.astype(A.dtype), V


def eigh_accurate(A, sweeps: int = 5, force: bool = False):
    """jnp.linalg.eigh with an f32 seed + Jacobi polish on accelerator
    backends (see module docstring).  Same (w ascending, V) contract."""
    if not (force or _needs_polish(A.dtype)):
        return jnp.linalg.eigh(A)
    _, V0 = _seed_eigh(A)
    T = jnp.swapaxes(V0, -1, -2) @ A @ V0
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    w, U = eigh_jacobi(T, sweeps=sweeps)
    return w, V0 @ U


def gram_eigh_accurate(M, sweeps: int = 6, force: bool = False):
    """Eigendecomposition of A = M'M WITHOUT forming it, with relative
    accuracy on small eigenvalues: one-sided Jacobi on B = M V0 (V0
    from the f32 seed eigh of M'M), orthogonalizing COLUMN pairs.
    Returns (w ascending, V) with M'M = V diag(w) V' and
    w_i = ||B v_i||^2 computed from accurate column norms.  On CPU
    (or non-f64) falls back to plain eigh of M'M."""
    mc = M.shape[-1]
    if not (force or _needs_polish(M.dtype)):
        G0 = jnp.swapaxes(M, -1, -2) @ M
        G0 = 0.5 * (G0 + jnp.swapaxes(G0, -1, -2))
        return jnp.linalg.eigh(G0)
    G0 = jnp.swapaxes(M, -1, -2) @ M
    G0 = 0.5 * (G0 + jnp.swapaxes(G0, -1, -2))
    _, V0 = _seed_eigh(G0)
    batch = jnp.broadcast_shapes(M.shape[:-2], V0.shape[:-2])
    prs, qrs, partner, sign, pidx, me = _partner_tables(mc)
    # pad B with zero columns / V with decoupled unit diagonal
    if me != mc:
        B = jnp.pad(M @ V0, [(0, 0)] * (M.ndim - 1) + [(0, me - mc)])
    else:
        B = M @ V0
    Vp = _pad_even(jnp.broadcast_to(V0, batch + (mc, mc)), me)

    def one_round(BV, tables):
        # disjoint rotations covering every column once -> full
        # scatter-free rebuild (see eigh_jacobi.one_round)
        B, V = BV
        p, q, prt, sgn, pix = tables
        Bp = B[..., :, p]
        Bq = B[..., :, q]
        app = jnp.sum(Bp * Bp, axis=-2)
        aqq = jnp.sum(Bq * Bq, axis=-2)
        apq = jnp.sum(Bp * Bq, axis=-2)
        c, s = _rotation(app, aqq, apq, M.dtype)
        cs = c[..., pix]
        ss = s[..., pix] * sgn.astype(M.dtype)
        ccol, scol = cs[..., None, :], ss[..., None, :]
        B = ccol * B + scol * B[..., :, prt]
        V = ccol * V + scol * V[..., :, prt]
        return (B, V), 0

    xs = (jnp.asarray(prs), jnp.asarray(qrs), jnp.asarray(partner),
          jnp.asarray(sign), jnp.asarray(pidx))

    def sweep(_, BV):
        BV, _ = lax.scan(one_round, BV, xs)
        return BV

    B, V = lax.fori_loop(0, sweeps, sweep, (B, Vp))
    w = jnp.sum(B * B, axis=-2)[..., :mc]
    V = V[..., :mc, :mc]
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V
