"""Batched small-matrix symmetric eigensolver — parallel-ordered
cyclic Jacobi.

XLA's batched `eigh` lowers to a sequential tridiagonalization + QR
pipeline per matrix; for LARGE BATCHES of SMALL matrices (the 's'-cone
scaling updates: compute/update_scaling and max_step_eig run eigh over
(count, m, m) stacks every IPM iteration, SURVEY §3.1) the dispatch
and latency dominate.  This implementation is pure batched
matmul/elementwise work: each round applies m/2 DISJOINT Givens
rotations (round-robin tournament ordering) as one (m, m) rotation
matrix conjugation, so a sweep is m-1 rounds of 3 batched matmuls and
the whole solve is `sweeps` fori_loop iterations of a fixed program.

Accuracy: cyclic Jacobi converges quadratically; `sweeps=12` reaches
~1e-13 relative off-diagonal mass for m <= 64 in f64 (measured in
tests).  Jacobi is also more accurate than QR-based eigh for small
eigenvalues (relative accuracy for positive definite matrices —
Demmel/Veselic), which is what the NT scaling consumes.

Opt-in: `cones.max_step_eig` / `scaling` keep XLA's eigh by default;
benchmark-driven call sites select this for stacked small blocks.
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


def eigh_jacobi(A, sweeps: int = 12):
    """Batched eigh: returns (w, V) with A = V diag(w) V', w ascending
    — same contract as jnp.linalg.eigh.  A: (..., m, m) symmetric."""
    m = A.shape[-1]
    batch = A.shape[:-2]
    dtype = A.dtype
    rounds = _round_robin(m)
    eye = jnp.eye(m, dtype=dtype)

    def one_round(A, V, pairs):
        p = jnp.asarray([pq[0] for pq in pairs])
        q = jnp.asarray([pq[1] for pq in pairs])
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # stable rotation angle (Golub & Van Loan 8.4)
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0.0, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau)
                             + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0.0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        J = jnp.broadcast_to(eye, batch + (m, m))
        J = J.at[..., p, p].set(c)
        J = J.at[..., q, q].set(c)
        J = J.at[..., p, q].set(s)
        J = J.at[..., q, p].set(-s)
        JT = jnp.swapaxes(J, -1, -2)
        A = JT @ A @ J
        V = V @ J
        # re-symmetrize against drift
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
        return A, V

    def sweep(_, AV):
        A, V = AV
        for pairs in rounds:
            A, V = one_round(A, V, pairs)
        return A, V

    V0 = jnp.broadcast_to(eye, batch + (m, m))
    A, V = lax.fori_loop(0, sweeps, sweep, (A, V0))
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def eigvalsh_jacobi(A, sweeps: int = 12):
    return eigh_jacobi(A, sweeps=sweeps)[0]


# ---------------------------------------------------------------------
# Accurate-eigh wrappers for the axon TPU backend.
#
# The platform's emulated-f64 `eigh` is only f32-GRADE: measured
# reconstruction error ~4e-7 * ||A|| and relative errors up to 1e+2 on
# small eigenvalues (scripts/ — vs ~1e-15 for a true f64 eigh), while
# its f64 matmul/elementwise ops ARE f64-accurate (~1e-15, the same
# measurement series as ops/matvec.py).  The 's'-cone NT scaling is
# built FROM the small eigenvalues (lambda^2 ~ mu near convergence), so
# the raw eigh poisons the scaling and the conelp 's' path stalls with
# growing residuals (mcsdp m=200: dres diverged 4x/iteration on TPU
# while the identical program converges on CPU).
#
# Fix: polish the XLA eigh output with Jacobi rotations executed in the
# ACCURATE op set (matmuls + elementwise).  Two flavors:
#   eigh_accurate      — two-sided polish of T = V'AV (near-diagonal,
#                        so 2 sweeps reach ~||A||*eps_f64 absolute);
#   gram_eigh_accurate — for A = M'M given M: one-sided Jacobi on
#                        B = M V0, which (Demmel-Veselic) delivers
#                        RELATIVE accuracy for the small eigenvalues —
#                        the same reason the reference computes this
#                        scaling through gesvd (misc.py:393-414).
# Both are identity-cost on CPU (plain eigh) where XLA's eigh is
# already f64-exact.
# ---------------------------------------------------------------------


def _needs_polish(dtype):
    return dtype == jnp.float64 and jax.default_backend() != "cpu"


def eigh_accurate(A, sweeps: int = 2, force: bool = False):
    """jnp.linalg.eigh with a 2-sweep Jacobi polish on accelerator
    backends (see block comment).  Same (w ascending, V) contract."""
    w0, V0 = jnp.linalg.eigh(A)
    if not (force or _needs_polish(A.dtype)):
        return w0, V0
    T = jnp.swapaxes(V0, -1, -2) @ A @ V0
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    w, U = eigh_jacobi(T, sweeps=sweeps)
    return w, V0 @ U


def gram_eigh_accurate(M, sweeps: int = 3, force: bool = False):
    """Eigendecomposition of A = M'M WITHOUT forming it, with relative
    accuracy on small eigenvalues: one-sided Jacobi on B = M V0 (V0
    from the fast eigh of M'M), orthogonalizing COLUMN pairs.  Returns
    (w ascending, V) with M'M = V diag(w) V' and w_i = ||B v_i||^2
    computed from accurate column norms.  On CPU (or non-f64) falls
    back to plain eigh of M'M."""
    mc = M.shape[-1]
    G0 = jnp.swapaxes(M, -1, -2) @ M
    G0 = 0.5 * (G0 + jnp.swapaxes(G0, -1, -2))
    w0, V0 = jnp.linalg.eigh(G0)
    if not (force or _needs_polish(M.dtype)):
        return w0, V0
    batch = jnp.broadcast_shapes(M.shape[:-2], V0.shape[:-2])
    B = M @ V0
    rounds = _round_robin(mc)
    eye = jnp.eye(mc, dtype=M.dtype)

    def one_round(B, V, pairs):
        p = jnp.asarray([pq[0] for pq in pairs])
        q = jnp.asarray([pq[1] for pq in pairs])
        Bp = B[..., :, p]
        Bq = B[..., :, q]
        app = jnp.sum(Bp * Bp, axis=-2)
        aqq = jnp.sum(Bq * Bq, axis=-2)
        apq = jnp.sum(Bp * Bq, axis=-2)
        tau = (aqq - app) / (2.0 * jnp.where(apq == 0.0, 1.0, apq))
        t = jnp.sign(tau) / (jnp.abs(tau)
                             + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(apq == 0.0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        J = jnp.broadcast_to(eye, batch + (mc, mc))
        J = J.at[..., p, p].set(c)
        J = J.at[..., q, q].set(c)
        J = J.at[..., p, q].set(s)
        J = J.at[..., q, p].set(-s)
        return B @ J, V @ J

    def sweep(_, BV):
        B, V = BV
        for pairs in rounds:
            B, V = one_round(B, V, pairs)
        return B, V

    V0b = jnp.broadcast_to(V0, batch + (mc, mc))
    B, V = lax.fori_loop(0, sweeps, sweep, (B, V0b))
    w = jnp.sum(B * B, axis=-2)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V
