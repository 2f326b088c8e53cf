"""Fused Pallas kernels for the KKT hot path.

The IPM's per-iteration cost on TPU is dominated by kernel-launch and
sequential-small-op overhead (XLA's Cholesky/solve lower to ~100
dependent device ops per iteration), not FLOPs.  These kernels fuse the
entire condensed-KKT factorization

    S = P + G' diag(dinv2) G ;   S = L L'

into ONE on-chip kernel (everything resident in VMEM), and fuse the
forward+backward substitution pair into another.  The factor kernel
also emits the inverses of the diagonal panel blocks, turning every
subsequent triangular solve into a short chain of MXU matmuls instead
of scalar recurrences.

Layout per instance (n <= ~512 fits comfortably in 16 MB VMEM):
  P (n,n) + G (m,n) + S scratch + L out + panel inverses.

Blocked right-looking Cholesky with static panel width BP: the panel
factorization is an in-kernel fori_loop of rank-1 updates (VPU); the
panel inverse is a fori_loop of forward substitutions; trailing updates
are MXU dots.  The panel loop over n/BP panels is a Python loop at
trace time (static shapes per panel).

These kernels replace BLAS/LAPACK potrf/potrs in the reference's hot
loop (SURVEY.md §3.1 hot spots #1-2; misc.py kkt_chol2:1352).  Use
`jax.vmap` to batch (pallas_call has a batching rule that prepends a
grid dimension).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 64          # panel width (multiple of 8 for f32 sublanes)


def _unblocked_chol(A):
    """Cholesky of a (BP, BP) block via fori_loop of masked rank-1
    updates — no dynamic indexing (Pallas TPU has no dynamic_slice on
    values; everything is full-width ops selected with iota masks)."""
    p = A.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)

    def body(k, A):
        akk = jnp.sum(jnp.where((rows == k) & (cols == k), A, 0.0))
        piv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
        colk = jnp.sum(jnp.where(cols == k, A, 0.0), axis=1,
                       keepdims=True) * piv                # (p, 1)
        colm = jnp.where(rows[:, :1] > k, colk, 0.0)
        A = A - colm @ colm.T
        A = jnp.where(cols == k, jnp.where(rows >= k, colk, 0.0), A)
        return A

    L = jax.lax.fori_loop(0, p, body, A)
    return jnp.where(rows >= cols, L, 0.0)


def _tri_inv_lower(L):
    """Inverse of a (BP, BP) lower-triangular block via fori_loop of
    masked forward substitutions (one ROW of the inverse per step)."""
    p = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    eye = (rows == cols).astype(L.dtype)

    def body(i, X):
        Lrow = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0,
                       keepdims=True)                      # (1, p)
        lii = jnp.sum(jnp.where(cols[:1, :] == i, Lrow, 0.0))
        Lrow_strict = jnp.where(cols[:1, :] < i, Lrow, 0.0)
        contrib = Lrow_strict @ X                          # (1, p)
        ei = (cols[:1, :] == i).astype(L.dtype)
        newrow = (ei - contrib) / lii
        return jnp.where(rows == i, newrow, X)

    return jax.lax.fori_loop(0, p, body, jnp.zeros_like(L))


def _fused_chol_kernel(npanels):
    def kernel(P_ref, Gt_ref, dinv2_ref, L_ref, Dinv_ref, S_ref):
        # S = P + (G' * dinv2) G  — one MXU contraction
        Gt = Gt_ref[:]                          # (n, m)
        Gd = Gt * dinv2_ref[:]                  # (1, m) row broadcasts
        S_ref[:] = P_ref[:] + jax.lax.dot_general(
            Gd, Gt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # blocked right-looking Cholesky over static panels
        for j in range(npanels):
            o = j * BP
            A11 = S_ref[o:o + BP, o:o + BP]
            L11 = _unblocked_chol(A11)
            Linv11 = _tri_inv_lower(L11)
            L_ref[o:o + BP, o:o + BP] = L11
            Dinv_ref[j] = Linv11
            if j + 1 < npanels:
                r = (npanels - j - 1) * BP
                A21 = S_ref[o + BP:, o:o + BP]          # (r, BP)
                L21 = jnp.dot(A21, Linv11.T,
                              preferred_element_type=jnp.float32)
                L_ref[o + BP:, o:o + BP] = L21
                S_ref[o + BP:, o + BP:] = (
                    S_ref[o + BP:, o + BP:]
                    - jnp.dot(L21, L21.T,
                              preferred_element_type=jnp.float32))
        # zero the strictly-upper part of L
        n = npanels * BP
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        L_ref[:] = jnp.where(rows >= cols, L_ref[:], 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=())
def _noop(x):
    return x


def fused_schur_cholesky(P, Gt, dinv2):
    """L, Dinv = chol(P + G' diag(dinv2) G) with panel inverses.

    P: (n, n); Gt: (n, m) (= G transposed); dinv2: (m,) or (1, m)
    (kept 2-D inside the kernel for TPU lane layout).
    n must be a multiple of BP (=64).  Returns L (n, n) lower and
    Dinv (n/BP, BP, BP) inverses of the diagonal panels of L.
    vmap to batch.
    """
    if dinv2.ndim == 1:
        dinv2 = dinv2.reshape(1, -1)
    n = P.shape[-1]
    if n % BP:
        raise ValueError(f"n ({n}) must be a multiple of {BP}")
    npan = n // BP
    kernel = _fused_chol_kernel(npan)
    L, Dinv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), P.dtype),
            jax.ShapeDtypeStruct((npan, BP, BP), P.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), P.dtype)],
    )(P, Gt, dinv2)
    return L, Dinv


def _fused_solve_kernel(npanels):
    def kernel(L_ref, Dinv_ref, b_ref, x_ref, y_ref):
        # forward: y = L^{-1} b, one panel at a time (MXU dots)
        for j in range(npanels):
            o = j * BP
            rhs = b_ref[:, o:o + BP]                   # (r, BP) rows?
            # b is (nrhs, n) laid out as rows for lane efficiency
            acc = rhs
            if j > 0:
                acc = acc - jnp.dot(
                    y_ref[:, :o], L_ref[o:o + BP, :o].T,
                    preferred_element_type=jnp.float32)
            y_ref[:, o:o + BP] = jnp.dot(
                acc, Dinv_ref[j].T, preferred_element_type=jnp.float32)
        # backward: x = L^{-T} y
        for jj in range(npanels):
            j = npanels - 1 - jj
            o = j * BP
            acc = y_ref[:, o:o + BP]
            if jj > 0:
                acc = acc - jnp.dot(
                    x_ref[:, o + BP:], L_ref[o + BP:, o:o + BP],
                    preferred_element_type=jnp.float32)
            x_ref[:, o:o + BP] = jnp.dot(
                acc, Dinv_ref[j], preferred_element_type=jnp.float32)

    return kernel


def fused_cholesky_solve(L, Dinv, B_rows):
    """x = (L L')^{-1} b for multiple right-hand sides.

    L: (n, n) lower; Dinv: (n/BP, BP, BP) panel inverses (from
    `fused_schur_cholesky`); B_rows: (nrhs, n) — right-hand sides as
    ROWS.  Returns (nrhs, n).  vmap to batch.
    """
    n = L.shape[-1]
    npan = n // BP
    kernel = _fused_solve_kernel(npan)
    x = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(B_rows.shape, B_rows.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(B_rows.shape, B_rows.dtype)],
    )(L, Dinv, B_rows)
    return x


# ---- batch-tiled variants (EXPERIMENTAL) -----------------------------
#
# For BATCHED small problems, a grid of single-instance kernels leaves
# the VPU idle during the sequential panel recurrences.  These variants
# process TB instances per kernel invocation: the sequential fori steps
# operate on (TB, p, p) tiles (masks broadcast over the batch), so the
# latency-bound part is amortized TB-fold; per-instance matmuls are a
# static TB loop of MXU dots.
#
# STATUS (round 2): correct under interpret mode, but the current
# Mosaic TPU compiler rejects the 3-D in-kernel tiles (layout.h check
# failure on (TB,1,1)-shaped reductions).
#
# RESOLUTION: the production batched factor moved to the
# block-recursive SPD inverse (ops/blockinv.spd_inverse — all batched
# XLA matmuls plus a small base-case cholesky), measured 1.75x XLA's
# chol + n-RHS triangular inverse at B=1024/n=256 (38.5 ms vs
# 67.4 ms) and wired into kkt chol2_inv/chol_inv.  The 2-D stacked
# Pallas re-layout was analyzed in detail and NOT pursued: expressing
# the per-block matmuls of the triangular-inverse recurrence on a
# (TB*p, p) stacked layout requires block-diagonal "spread" matmuls of
# shape (TB*p, TB*p) — a TB-fold FLOP inflation that makes the kernel
# strictly slower than the XLA recursion at every tile width tried on
# paper (TB=8: ~64 ms/leaf-equivalent vs XLA's ~26 ms; TB=64: ~27 ms
# — the waste scales as TB^2 per step times n/TB steps, a wash).  The
# remaining in-kernel win would be the base-case chol's 2*b sequential
# fori steps (~26 ms of the 38.5 at b=32), but fusing ONLY those while
# leaving the spread matmuls to XLA still pays the same HBM
# round-trips.  A genuinely faster path needs either Mosaic 3-D tile
# support (re-enabling the batch-tiled kernels below verbatim) or a
# one-kernel whole-factor design with implicit block spreads — left
# as the documented round-3 candidate (ROADMAP).
#
# MEASURED (round 3, on device, scripts/tpu_pallas_measure.py at
# B=1024/n=256 fused Schur assembly+factor, 'highest' precision):
#   blockinv spd_inverse        79.4 ms   <- production path
#   XLA chol + n-RHS inverse   106.1 ms
#   pallas vmapped whole-factor 179.6 ms  (2.3x SLOWER than blockinv)
#   pallas batch-tiled          Mosaic compile SIGABRT (3-D tiles)
# The whole-factor kernel's sequential panel recurrence leaves the MXU
# idle exactly as the round-2 paper analysis predicted; the measured
# REJECTION stands and blockinv remains the production factor.


def _unblocked_chol_b(A):
    """Batched Cholesky of (TB, p, p) blocks, masked fori_loop."""
    tb, p, _ = A.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, p, p), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tb, p, p), 2)

    def body(k, A):
        akk = jnp.sum(jnp.where((rows == k) & (cols == k), A, 0.0),
                      axis=(1, 2), keepdims=True)
        piv = jax.lax.rsqrt(jnp.maximum(akk, 1e-30))
        colk = jnp.sum(jnp.where(cols == k, A, 0.0), axis=2,
                       keepdims=True) * piv              # (tb, p, 1)
        colm = jnp.where(rows[:, :, :1] > k, colk, 0.0)
        A = A - colm * jnp.swapaxes(colm, 1, 2)
        A = jnp.where(cols == k, jnp.where(rows >= k, colk, 0.0), A)
        return A

    L = jax.lax.fori_loop(0, p, body, A)
    return jnp.where(rows >= cols, L, 0.0)


def _tri_inv_lower_b(L):
    """Batched lower-triangular inverse of (TB, p, p) blocks."""
    tb, p, _ = L.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (tb, p, p), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tb, p, p), 2)

    def body(i, X):
        Lrow = jnp.sum(jnp.where(rows == i, L, 0.0), axis=1,
                       keepdims=True)                    # (tb, 1, p)
        lii = jnp.sum(jnp.where(cols[:, :1, :] == i, Lrow, 0.0),
                      axis=2, keepdims=True)             # (tb, 1, 1)
        Lrow_strict = jnp.where(cols[:, :1, :] < i, Lrow, 0.0)
        contrib = jnp.sum(jnp.swapaxes(Lrow_strict, 1, 2) * X, axis=1,
                          keepdims=True)                 # (tb, 1, p)
        ei = (cols[:, :1, :] == i).astype(L.dtype)
        newrow = (ei - contrib) / lii
        return jnp.where(rows == i, newrow, X)

    return jax.lax.fori_loop(0, p, body, jnp.zeros_like(L))


def _fused_chol_kernel_b(npanels, tb):
    def kernel(P_ref, Gt_ref, dinv2_ref, L_ref, Dinv_ref, S_ref):
        Gt = Gt_ref[:]                                   # (n, m)
        for t in range(tb):
            Gd = Gt * dinv2_ref[t]                       # (n, m)
            S_ref[t] = P_ref[t] + jax.lax.dot_general(
                Gd, Gt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        for j in range(npanels):
            o = j * BP
            A11 = S_ref[:, o:o + BP, o:o + BP]
            L11 = _unblocked_chol_b(A11)
            Linv11 = _tri_inv_lower_b(L11)
            L_ref[:, o:o + BP, o:o + BP] = L11
            Dinv_ref[:, j] = Linv11
            if j + 1 < npanels:
                for t in range(tb):
                    A21 = S_ref[t, o + BP:, o:o + BP]
                    L21 = jnp.dot(A21, Linv11[t].T,
                                  preferred_element_type=jnp.float32)
                    L_ref[t, o + BP:, o:o + BP] = L21
                    S_ref[t, o + BP:, o + BP:] = (
                        S_ref[t, o + BP:, o + BP:]
                        - jnp.dot(L21, L21.T,
                                  preferred_element_type=jnp.float32))
        n = npanels * BP
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb, n, n), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tb, n, n), 2)
        L_ref[:] = jnp.where(rows >= cols, L_ref[:], 0.0)

    return kernel


def fused_schur_cholesky_batched(P, Gt, dinv2, tb: int = 8):
    """Batched L, Dinv over a leading batch axis, TB instances per
    kernel invocation.  P: (B, n, n); Gt: (n, m) shared; dinv2: (B, m).
    B must be a multiple of tb, n a multiple of BP."""
    Bsz, n, _ = P.shape
    m = Gt.shape[1]
    if Bsz % tb or n % BP:
        raise ValueError("B must be divisible by tb and n by BP")
    npan = n // BP
    kernel = _fused_chol_kernel_b(npan, tb)
    L, Dinv = pl.pallas_call(
        kernel,
        grid=(Bsz // tb,),
        out_shape=(
            jax.ShapeDtypeStruct((Bsz, n, n), P.dtype),
            jax.ShapeDtypeStruct((Bsz, npan, BP, BP), P.dtype),
        ),
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, npan, BP, BP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((tb, n, n), P.dtype)],
    )(P, Gt, dinv2)
    return L, Dinv


def _fused_solve_kernel_b(npanels, tb):
    def kernel(L_ref, Dinv_ref, b_ref, x_ref, y_ref):
        for j in range(npanels):
            o = j * BP
            for t in range(tb):
                acc = b_ref[t, :, o:o + BP]
                if j > 0:
                    acc = acc - jnp.dot(
                        y_ref[t, :, :o], L_ref[t, o:o + BP, :o].T,
                        preferred_element_type=jnp.float32)
                y_ref[t, :, o:o + BP] = jnp.dot(
                    acc, Dinv_ref[t, j].T,
                    preferred_element_type=jnp.float32)
        for jj in range(npanels):
            j = npanels - 1 - jj
            o = j * BP
            for t in range(tb):
                acc = y_ref[t, :, o:o + BP]
                if jj > 0:
                    acc = acc - jnp.dot(
                        x_ref[t, :, o + BP:],
                        L_ref[t, o + BP:, o:o + BP],
                        preferred_element_type=jnp.float32)
                x_ref[t, :, o:o + BP] = jnp.dot(
                    acc, Dinv_ref[t, j],
                    preferred_element_type=jnp.float32)

    return kernel


def fused_cholesky_solve_batched(L, Dinv, B_rows, tb: int = 8):
    """Batched multi-RHS solve: L (B, n, n), Dinv (B, npan, BP, BP),
    B_rows (B, nrhs, n)."""
    Bsz, n, _ = L.shape
    npan = n // BP
    nrhs = B_rows.shape[1]
    kernel = _fused_solve_kernel_b(npan, tb)
    x = pl.pallas_call(
        kernel,
        grid=(Bsz // tb,),
        out_shape=jax.ShapeDtypeStruct(B_rows.shape, B_rows.dtype),
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, npan, BP, BP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nrhs, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, nrhs, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tb, nrhs, n), B_rows.dtype)],
    )(L, Dinv, B_rows)
    return x


# ---- pure-jnp reference implementations (semantics oracle) -----------

def fused_schur_cholesky_ref(P, Gt, dinv2):
    S = P + (Gt * dinv2) @ Gt.T
    L = jnp.linalg.cholesky(S)
    n = P.shape[-1]
    npan = n // BP
    Dinv = jnp.stack([
        jnp.linalg.inv(L[j * BP:(j + 1) * BP, j * BP:(j + 1) * BP])
        for j in range(npan)])
    return L, Dinv


def fused_cholesky_solve_ref(L, Dinv, B_rows):
    import jax.scipy.linalg as jsl
    y = jsl.solve_triangular(L, B_rows.T, lower=True)
    return jsl.solve_triangular(L.T, y, lower=False).T
