"""Cone algebra over R^l_+ x SOC(q_0..) x PSD(s_0..) — TPU-native.

Functional equivalents of the reference's cone kernel layer
(/root/reference/src/python/misc.py:28-1052 and its C twin
misc_solvers.c), re-designed for JAX:

  - A cone vector is a flat jnp array of length ``dims.cdim`` laid out as
    ``[nonlinear (mnl) | 'l' block | 'q' blocks | 's' blocks (m*m full
    symmetric, row-major)]``.  's' blocks are ALWAYS kept fully symmetric
    (the reference uses 'L'-triangular storage plus trisc/triusc
    fix-ups, misc.py:768-798 — unnecessary once storage is symmetric,
    and plain dot products become exact cone inner products).
  - Equal-size cone blocks are grouped into "runs" and processed as
    stacked (count, m) / (count, m, m) batches, so e.g. 100 identical
    SOC blocks are one vectorized op instead of 100 scalar loops.
  - Everything is a pure function of (array, static ConeDims); all
    functions are jit/vmap/grad-compatible with `dims` static.

No code is copied from the reference; formulas follow the published
Nesterov–Todd scaling algebra (Vandenberghe, "The CVXOPT linear and
quadratic cone program solvers", 2010).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import cached_property
from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from cvxopt_tpu.ops.jacobi import eigh_accurate


Array = jnp.ndarray


@dataclass(frozen=True)
class ConeDims:
    """Static description of a symmetric cone product.

    Equivalent of the reference's ``dims = {'l': ..., 'q': [...],
    's': [...]}`` dict (coneprog.py:493-514) plus the nonlinear block
    count ``mnl`` used by the cp/cpl solvers (cvxprog.py:68).  Hashable
    and static so it can parameterize jit-compiled solvers.
    """

    l: int = 0
    q: Tuple[int, ...] = ()
    s: Tuple[int, ...] = ()
    mnl: int = 0

    def __post_init__(self):
        object.__setattr__(self, "q", tuple(int(m) for m in self.q))
        object.__setattr__(self, "s", tuple(int(m) for m in self.s))
        if self.l < 0 or self.mnl < 0:
            raise ValueError("dims.l and dims.mnl must be nonnegative")
        if any(m < 1 for m in self.q):
            raise ValueError("dims.q entries must be positive")
        if any(m < 0 for m in self.s):
            raise ValueError("dims.s entries must be nonnegative")

    # ---- sizes -----------------------------------------------------------

    @cached_property
    def lnl(self) -> int:
        """Length of the elementwise (nonlinear + 'l') region."""
        return self.mnl + self.l

    @cached_property
    def qdim(self) -> int:
        return sum(self.q)

    @cached_property
    def sdim_full(self) -> int:
        return sum(m * m for m in self.s)

    @cached_property
    def sdim_packed(self) -> int:
        return sum(m * (m + 1) // 2 for m in self.s)

    @cached_property
    def sdim_diag(self) -> int:
        return sum(self.s)

    @cached_property
    def cdim(self) -> int:
        """Unpacked flat length (misc.py 'N')."""
        return self.lnl + self.qdim + self.sdim_full

    @cached_property
    def cdim_packed(self) -> int:
        return self.lnl + self.qdim + self.sdim_packed

    @cached_property
    def cdim_diag(self) -> int:
        """Length of a 'diagonal storage' vector (e.g. lambda)."""
        return self.lnl + self.qdim + self.sdim_diag

    @cached_property
    def offq(self) -> int:
        return self.lnl

    @cached_property
    def offs(self) -> int:
        return self.lnl + self.qdim

    # ---- runs of equal-size blocks --------------------------------------

    @cached_property
    def q_runs(self) -> Tuple[Tuple[int, int, int], ...]:
        """Runs of consecutive equal-size 'q' blocks: (offset, count, m)."""
        runs = []
        off = self.offq
        for m, grp in itertools.groupby(self.q):
            cnt = len(list(grp))
            runs.append((off, cnt, m))
            off += cnt * m
        return tuple(runs)

    @cached_property
    def s_runs(self) -> Tuple[Tuple[int, int, int, int], ...]:
        """Runs of equal-size 's' blocks: (mat_offset, diag_offset, count, m).

        mat_offset indexes the full (m*m) storage inside a cdim vector;
        diag_offset indexes the corresponding entries of a
        diagonal-storage (cdim_diag) vector such as lambda.
        """
        runs = []
        moff = self.offs
        doff = self.lnl + self.qdim
        for m, grp in itertools.groupby(self.s):
            cnt = len(list(grp))
            runs.append((moff, doff, cnt, m))
            moff += cnt * m * m
            doff += cnt * m
        return tuple(runs)

    @cached_property
    def s_pack_runs(self) -> Tuple[int, ...]:
        """Packed-storage offset for each s run (same order as s_runs)."""
        offs = []
        p = self.lnl + self.qdim
        for (_, _, cnt, m) in self.s_runs:
            offs.append(p)
            p += cnt * m * (m + 1) // 2
        return tuple(offs)

    def as_dict(self):
        """Reference-style dims dict (coneprog.py:493)."""
        return {"l": self.l, "q": list(self.q), "s": list(self.s)}

    @staticmethod
    def from_dict(d, mnl: int = 0) -> "ConeDims":
        return ConeDims(l=int(d.get("l", 0)), q=tuple(d.get("q", ())),
                        s=tuple(d.get("s", ())), mnl=mnl)


# ---------------------------------------------------------------------------
# views


def qview(x: Array, run) -> Array:
    off, cnt, m = run
    return x[..., off:off + cnt * m].reshape(x.shape[:-1] + (cnt, m))


def sview(x: Array, run) -> Array:
    off, _, cnt, m = run
    return x[..., off:off + cnt * m * m].reshape(x.shape[:-1] + (cnt, m, m))


def sdiagview(lmbda: Array, run) -> Array:
    _, doff, cnt, m = run
    return lmbda[..., doff:doff + cnt * m].reshape(
        lmbda.shape[:-1] + (cnt, m))


def _set(x: Array, sl, value: Array) -> Array:
    return x.at[..., sl].set(value.reshape(x[..., sl].shape))


# ---------------------------------------------------------------------------
# inner products and norms


def sdot(x: Array, y: Array, dims: ConeDims) -> Array:
    """Cone-space inner product (misc.py:714-728).

    With 's' blocks stored fully symmetric, this is a plain dot product:
    the reference's "diag once + 2x strict lower" accumulation equals the
    full Frobenius inner product of symmetric matrices.
    """
    return jnp.sum(x * y, axis=-1)


def snrm2(x: Array, dims: ConeDims) -> Array:
    """Cone-space norm (misc.py:757-762)."""
    return jnp.sqrt(jnp.maximum(sdot(x, x, dims), 0.0))


def jdot(x: Array, y: Array) -> Array:
    """Hyperbolic inner product x' J y, J = diag(1, -I) (misc.py:835).

    Operates on the last axis; broadcasts over leading (run) axes.
    """
    return x[..., 0] * y[..., 0] - jnp.sum(x[..., 1:] * y[..., 1:], axis=-1)


def jnrm2(x: Array) -> Array:
    """sqrt(x' J x) for x in the interior of a second-order cone
    (misc.py:848-856), computed as sqrt(x0-|x1|)*sqrt(x0+|x1|) for
    accuracy near the boundary."""
    a = jnp.linalg.norm(x[..., 1:], axis=-1)
    return jnp.sqrt(jnp.maximum(x[..., 0] - a, 0.0)) * \
        jnp.sqrt(jnp.maximum(x[..., 0] + a, 0.0))


# ---------------------------------------------------------------------------
# Jordan products


def sprod(x: Array, y: Array, dims: ConeDims) -> Array:
    """Jordan product x := y o x (misc.py:878-942, diag='N').

    'l': elementwise; 'q': arrow-matrix product; 's': 0.5*(YX + XY) with
    X, Y full symmetric.
    """
    out = x
    nl = dims.lnl
    if nl:
        out = _set(out, slice(0, nl), x[..., :nl] * y[..., :nl])
    for run in dims.q_runs:
        off, cnt, m = run
        xk, yk = qview(x, run), qview(y, run)
        d0 = jnp.sum(xk * yk, axis=-1, keepdims=True)
        rest = yk[..., :1] * xk[..., 1:] + xk[..., :1] * yk[..., 1:]
        out = _set(out, slice(off, off + cnt * m),
                   jnp.concatenate([d0, rest], axis=-1))
    for run in dims.s_runs:
        off, _, cnt, m = run
        X, Y = sview(x, run), sview(y, run)
        P = 0.5 * (jnp.matmul(Y, X) + jnp.matmul(X, Y))
        out = _set(out, slice(off, off + cnt * m * m), P)
    return out


def sprod_diag(x: Array, lmbda: Array, dims: ConeDims) -> Array:
    """Jordan product x := lmbda o x where lmbda is in diagonal storage
    (length cdim_diag) — misc.py:878 with diag='D'.

    For 's' blocks: (lmbda o x)_ij = 0.5*(lmbda_i + lmbda_j) * x_ij.
    """
    out = x
    nl = dims.lnl
    if nl:
        out = _set(out, slice(0, nl), x[..., :nl] * lmbda[..., :nl])
    for run in dims.q_runs:
        off, cnt, m = run
        xk = qview(x, run)
        lk = lmbda[..., off:off + cnt * m].reshape(
            lmbda.shape[:-1] + (cnt, m))
        d0 = jnp.sum(xk * lk, axis=-1, keepdims=True)
        rest = lk[..., :1] * xk[..., 1:] + xk[..., :1] * lk[..., 1:]
        out = _set(out, slice(off, off + cnt * m),
                   jnp.concatenate([d0, rest], axis=-1))
    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        lk = sdiagview(lmbda, run)                       # (cnt, m)
        gam = 0.5 * (lk[..., :, None] + lk[..., None, :])  # (cnt, m, m)
        out = _set(out, slice(off, off + cnt * m * m), X * gam)
    return out


def sinv(x: Array, lmbda: Array, dims: ConeDims) -> Array:
    """Inverse Jordan product x := lmbda o\\ x for diagonal-'s' lmbda
    (misc.py:965-1012).  lmbda is in diagonal storage (cdim_diag)."""
    out = x
    nl = dims.lnl
    if nl:
        out = _set(out, slice(0, nl), x[..., :nl] / lmbda[..., :nl])
    for run in dims.q_runs:
        off, cnt, m = run
        xk = qview(x, run)
        lk = lmbda[..., off:off + cnt * m].reshape(
            lmbda.shape[:-1] + (cnt, m))
        aa = jdot(lk, lk)[..., None]                    # l0^2 - |l1|^2
        l0 = lk[..., :1]
        cc = xk[..., :1]
        dd = jnp.sum(lk[..., 1:] * xk[..., 1:], axis=-1, keepdims=True)
        new0 = cc * l0 - dd
        new1 = (aa / l0) * xk[..., 1:] + (dd / l0 - cc) * lk[..., 1:]
        out = _set(out, slice(off, off + cnt * m),
                   jnp.concatenate([new0, new1], axis=-1) / aa)
    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        lk = sdiagview(lmbda, run)
        gam = 0.5 * (lk[..., :, None] + lk[..., None, :])
        out = _set(out, slice(off, off + cnt * m * m), X / gam)
    return out


def ssqr(lmbda: Array, dims: ConeDims) -> Array:
    """lmbda o lmbda in diagonal storage → diagonal storage
    (misc.py:945-959).  'q' blocks: first entry |lmbda_k|^2, rest
    2*lmbda_0*lmbda_1; 'l'/'s' entries squared elementwise."""
    out = lmbda * lmbda
    for run in dims.q_runs:
        off, cnt, m = run
        lk = lmbda[..., off:off + cnt * m].reshape(
            lmbda.shape[:-1] + (cnt, m))
        d0 = jnp.sum(lk * lk, axis=-1, keepdims=True)
        rest = 2.0 * lk[..., :1] * lk[..., 1:]
        out = _set(out, slice(off, off + cnt * m),
                   jnp.concatenate([d0, rest], axis=-1))
    return out


# ---------------------------------------------------------------------------
# identity / diag embeddings


def cone_identity(dims: ConeDims, dtype=jnp.float64) -> Array:
    """The identity element e of the cone in full (cdim) storage:
    ones on 'l', (1,0,..) per 'q' block, identity matrices for 's'."""
    e = np.zeros(dims.cdim)
    e[:dims.lnl] = 1.0
    for off, cnt, m in dims.q_runs:
        e[off:off + cnt * m:m] = 1.0
    for off, _, cnt, m in dims.s_runs:
        blk = np.zeros((cnt, m, m))
        idx = np.arange(m)
        blk[:, idx, idx] = 1.0
        e[off:off + cnt * m * m] = blk.reshape(-1)
    return jnp.asarray(e, dtype=dtype)


def diag_embed(lmbda: Array, dims: ConeDims) -> Array:
    """Expand a diagonal-storage vector (cdim_diag) to full storage
    (cdim): 'l'/'q' copied, 's' blocks become diag matrices.  Used to
    rebuild s, z from lambda (coneprog.py:1413-1433)."""
    nq = dims.lnl + dims.qdim
    parts = [lmbda[..., :nq]]
    for run in dims.s_runs:
        _, doff, cnt, m = run
        lk = sdiagview(lmbda, run)
        blk = jnp.zeros(lk.shape[:-1] + (m, m), dtype=lmbda.dtype)
        idx = jnp.arange(m)
        blk = blk.at[..., idx, idx].set(lk)
        parts.append(blk.reshape(lk.shape[:-2] + (cnt * m * m,)))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def diag_part(x: Array, dims: ConeDims) -> Array:
    """Extract diagonal storage (cdim_diag) from full storage (cdim)."""
    nq = dims.lnl + dims.qdim
    parts = [x[..., :nq]]
    for run in dims.s_runs:
        X = sview(x, run)
        idx = jnp.arange(run[3])
        d = X[..., idx, idx]
        parts.append(d.reshape(d.shape[:-2] + (-1,)))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def symmetrize(x: Array, dims: ConeDims) -> Array:
    """Symmetrize the 's' blocks of a cone vector: X := (X + X')/2.

    Replaces the reference's misc.symm 'L'-storage fill-in
    (misc.py:862-872); applied to user inputs so that all internal 's'
    storage is fully symmetric.
    """
    out = x
    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        out = _set(out, slice(off, off + cnt * m * m),
                   0.5 * (X + jnp.swapaxes(X, -1, -2)))
    return out


def symmetrize_lower(x: Array, dims: ConeDims) -> Array:
    """Symmetrize the 's' blocks from the reference's 'L' storage
    (exact equivalent of misc.symm, misc.py:862-872, composed with the
    trisc read semantics, misc.py:768): only the COLUMN-major lower
    triangle of each block is meaningful.  Our storage is row-major, so
    the column-major lower triangle is the row-major UPPER triangle —
    this matters for inputs whose 's' rows are not symmetric (e.g. the
    user-guide SDP example's third coefficient matrix)."""
    out = x
    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        U = jnp.triu(X)
        S = U + jnp.swapaxes(jnp.triu(X, 1), -1, -2)
        out = _set(out, slice(off, off + cnt * m * m), S)
    return out


# ---------------------------------------------------------------------------
# packed storage (for symmetric KKT assembly)


def _tril_indices(m):
    return np.tril_indices(m)


def pack(x: Array, dims: ConeDims) -> Array:
    """Full (cdim) → packed (cdim_packed) storage with off-diagonal 's'
    entries scaled by sqrt(2) (misc.py:640-660).  pack is an isometry:
    <pack(x), pack(y)> = sdot(x, y)."""
    nq = dims.lnl + dims.qdim
    parts = [x[..., :nq]]
    for run in dims.s_runs:
        _, _, cnt, m = run
        X = sview(x, run)
        rows, cols = _tril_indices(m)
        v = X[..., rows, cols]                           # (cnt, m(m+1)/2)
        w = np.where(rows == cols, 1.0, np.sqrt(2.0))
        v = v * jnp.asarray(w, dtype=x.dtype)
        parts.append(v.reshape(v.shape[:-2] + (-1,)))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def unpack(y: Array, dims: ConeDims) -> Array:
    """Packed (cdim_packed) → full symmetric (cdim) storage, dividing
    off-diagonal entries by sqrt(2) (misc.py:690-708)."""
    nq = dims.lnl + dims.qdim
    parts = [y[..., :nq]]
    p = nq
    for run in dims.s_runs:
        _, _, cnt, m = run
        npk = m * (m + 1) // 2
        v = y[..., p:p + cnt * npk].reshape(y.shape[:-1] + (cnt, npk))
        p += cnt * npk
        rows, cols = _tril_indices(m)
        w = np.where(rows == cols, 1.0, 1.0 / np.sqrt(2.0))
        v = v * jnp.asarray(w, dtype=y.dtype)
        X = jnp.zeros(v.shape[:-1] + (m, m), dtype=y.dtype)
        X = X.at[..., rows, cols].set(v)
        X = X + jnp.swapaxes(jnp.tril(X, -1), -1, -2)
        parts.append(X.reshape(X.shape[:-3] + (cnt * m * m,)))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def pack_matrix_cols(M: Array, dims: ConeDims) -> Array:
    """Apply `pack` to every column of a (cdim, n) matrix
    (misc.py pack2:666-684): returns (cdim_packed, n)."""
    return jnp.swapaxes(pack(jnp.swapaxes(M, -1, -2), dims), -1, -2)


# ---------------------------------------------------------------------------
# max_step


def max_step(x: Array, dims: ConeDims) -> Array:
    """min { t | x + t*e >= 0 } (misc.py:1018-1052).

    'l': -min(x); 'q': |x1| - x0; 's': -lambda_min (batched eigh).
    Returns -inf-free scalar; 0.0 when the cone is empty.
    """
    ts = []
    nl = dims.lnl
    if nl:
        ts.append(-jnp.min(x[..., :nl], axis=-1))
    for run in dims.q_runs:
        xk = qview(x, run)
        t = jnp.linalg.norm(xk[..., 1:], axis=-1) - xk[..., 0]
        ts.append(jnp.max(t, axis=-1))
    for run in dims.s_runs:
        X = sview(x, run)
        # eigh_accurate: the emulated-f64 eigh on the TPU backend is
        # f32-grade (ops/jacobi.py block comment); lambda_min feeds
        # step lengths and interiority checks.  VALUES-ONLY here:
        # eigenvalues converge quadratically from the 1e-7-off-diag
        # f32 seed (1 sweep -> ~1e-14), so 3 sweeps carry a wide
        # margin at 2/5 the polish cost of the eigenvector-grade
        # default (r05; the eigh is ~17% of the SDP iteration)
        w = eigh_accurate(X, sweeps=3)[0]                # ascending
        ts.append(jnp.max(-w[..., 0], axis=-1))
    if not ts:
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)
    return jnp.max(jnp.stack(ts, axis=-1), axis=-1)


def max_step_eig(x: Array, dims: ConeDims):
    """max_step that also returns the eigendecomposition of the 's'
    blocks (misc.py:1018 with sigma): returns (t, sig, Qx) where sig is
    diagonal storage of the s eigenvalues (length sdim_diag) and Qx
    replaces each 's' block of x by its eigenvector matrix (columns),
    mirroring lapack.syevd's overwrite.  For dims without 's', sig/Q are
    empty arrays.
    """
    ts = []
    nl = dims.lnl
    if nl:
        ts.append(-jnp.min(x[..., :nl], axis=-1))
    for run in dims.q_runs:
        xk = qview(x, run)
        t = jnp.linalg.norm(xk[..., 1:], axis=-1) - xk[..., 0]
        ts.append(jnp.max(t, axis=-1))
    sig_parts, out = [], x
    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        w, V = eigh_accurate(X)      # see max_step note
        ts.append(jnp.max(-w[..., 0], axis=-1))
        sig_parts.append(w.reshape(w.shape[:-2] + (-1,)))
        out = _set(out, slice(off, off + cnt * m * m), V)
    sig = (jnp.concatenate(sig_parts, axis=-1) if sig_parts
           else jnp.zeros(x.shape[:-1] + (0,), dtype=x.dtype))
    if not ts:
        t = jnp.zeros(x.shape[:-1], dtype=x.dtype)
    else:
        t = jnp.max(jnp.stack(ts, axis=-1), axis=-1)
    return t, sig, out
