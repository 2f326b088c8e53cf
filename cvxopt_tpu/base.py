"""Matrix substrate helpers — cvxopt.base equivalents.

The reference's dense `matrix` / sparse `spmatrix` C types
(src/C/dense.c, sparse.c) are replaced by jnp arrays (the array-first
design, SURVEY.md §7); this module provides the constructors and the
typed elementwise functions the reference exports at package top level
(src/python/__init__.py:283-291, src/C/base.c:1945-1970):

  matrix(data, size)   cvxopt-compatible constructor: nested lists are
                       COLUMNS, flat data fills column-major
  spmatrix(V, I, J)    triplet sparse constructor -> BCOO
  sparse(blocks)       block assembly / sparsification
  spdiag(values)       (block-)diagonal matrix
  exp log sqrt sin cos elementwise math
  mul div emin emax    elementwise products/quotients/extrema
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
from jax.experimental import sparse as jxs


def matrix(data, size=None, tc=None):
    """cvxopt.matrix-compatible constructor (dense.c:514-603): nested
    sequences are COLUMNS; flat data fills column-major; scalars with a
    size broadcast.  Typecodes 'i'/'d'/'z' map to int32/float64/
    complex128; complex input data is PRESERVED (dense.c complex
    constructors, dense.c:514-603) rather than coerced to float."""
    dtype = {None: None, "d": jnp.float64, "i": jnp.int32,
             "z": jnp.complex128}[tc]
    if isinstance(data, (list, tuple)) and data and \
            isinstance(data[0], (list, tuple, np.ndarray, jnp.ndarray)):
        # nested sequences: each entry is a column (1-D) or a column
        # block (2-D), concatenated horizontally — cvxopt semantics
        blocks = []
        for c in data:
            a = np.asarray(c)
            if not np.iscomplexobj(a):
                a = a.astype(float)
            blocks.append(a.reshape(-1, 1) if a.ndim < 2 else a)
        X = np.concatenate(blocks, axis=1)
    elif np.isscalar(data):
        if size is None:
            size = (1, 1)
        X = np.full(size, data,
                    dtype=(complex if isinstance(data, complex)
                           else float))
    else:
        a = np.asarray(data)
        if size is not None:
            X = a.reshape(size, order="F")
        else:
            X = a.reshape(-1, 1) if a.ndim == 1 else a
    out = jnp.asarray(X)
    return out.astype(dtype) if dtype is not None else out


def spmatrix(V, I, J, size=None, tc=None):
    """Triplet sparse constructor (sparse.c:2640) -> BCOO.  Complex
    values are preserved; tc='z' forces complex128."""
    I = np.asarray(I, dtype=np.int32).reshape(-1)
    J = np.asarray(J, dtype=np.int32).reshape(-1)
    Va = np.asarray(V)
    if tc == "z":
        Va = Va.astype(np.complex128)
    elif not np.iscomplexobj(Va):
        Va = Va.astype(float)
    V = np.broadcast_to(Va.reshape(-1), I.shape)
    if size is None:
        size = (int(I.max()) + 1 if I.size else 0,
                int(J.max()) + 1 if J.size else 0)
    idx = np.stack([I, J], axis=1)
    return jxs.BCOO((jnp.asarray(V), jnp.asarray(idx)), shape=size)


def _block_coo(B):
    """Block -> (rows, cols, vals, shape) triplets WITHOUT densifying
    sparse blocks."""
    if isinstance(B, jxs.BCOO):
        idx = np.asarray(B.indices)
        return (idx[:, 0], idx[:, 1], np.asarray(B.data), B.shape)
    if hasattr(B, "tocoo"):                  # scipy.sparse
        coo = B.tocoo()
        return (np.asarray(coo.row), np.asarray(coo.col),
                np.asarray(coo.data), coo.shape)
    D = np.asarray(B if not hasattr(B, "todense") else B.todense())
    if D.ndim == 1:
        D = D.reshape(-1, 1)
    r, c = np.nonzero(D)
    return r, c, D[r, c], D.shape


def sparse(blocks, tc=None):
    """Sparsify a dense matrix, or assemble a block matrix from nested
    lists of blocks (base.c:979): sparse([[B11, B21], [B12, B22]])
    where inner lists are block COLUMNS.  Sparse blocks (BCOO or
    scipy.sparse) are assembled in triplet form — never densified —
    so large structured block matrices stay sparse end to end."""
    if not isinstance(blocks, (list, tuple)):
        return jxs.BCOO.fromdense(_dense2(blocks))
    rows, cols, vals = [], [], []
    col_off = 0
    nrows_total = 0
    for colblocks in blocks:
        if not isinstance(colblocks, (list, tuple)):
            colblocks = [colblocks]
        row_off = 0
        width = None
        for B in colblocks:
            r, c, v, shp = _block_coo(B)
            if width is None:
                width = shp[1]
            elif shp[1] != width:
                raise ValueError("block column width mismatch")
            rows.append(r + row_off)
            cols.append(c + col_off)
            vals.append(v)
            row_off += shp[0]
        nrows_total = max(nrows_total, row_off)
        col_off += width if width is not None else 0
    if not rows:
        return jxs.BCOO.fromdense(jnp.zeros((0, 0)))
    R = np.concatenate(rows)
    C = np.concatenate(cols)
    dt = complex if any(np.iscomplexobj(v) for v in vals) else float
    V = np.concatenate([np.asarray(v, dtype=dt) for v in vals])
    if tc == "z":
        V = V.astype(np.complex128)
    idx = np.stack([R, C], axis=1).astype(np.int32)
    return jxs.BCOO((jnp.asarray(V), jnp.asarray(idx)),
                    shape=(nrows_total, col_off))


def spdiag(values):
    """(Block-)diagonal sparse matrix (base.c:1071): a vector gives a
    diagonal matrix; a list of matrices gives a block-diagonal one."""
    if isinstance(values, (list, tuple)) and values and \
            np.asarray(values[0]).ndim == 2:
        mats = [np.asarray(v) for v in values]
        n = sum(m.shape[0] for m in mats)
        dt = complex if any(np.iscomplexobj(m) for m in mats) else float
        D = np.zeros((n, n), dtype=dt)
        off = 0
        for m in mats:
            k = m.shape[0]
            D[off:off + k, off:off + k] = m
            off += k
        return jxs.BCOO.fromdense(jnp.asarray(D))
    v = jnp.asarray(values).reshape(-1)
    return jxs.BCOO.fromdense(jnp.diag(v))


def matrix_tofile(M, f):
    """Write a dense matrix's raw element bytes to an open binary file
    (reference matrix.tofile, dense.c:1106): column-major element
    stream, matching numpy's tofile of the Fortran-ordered buffer."""
    f.write(np.ascontiguousarray(np.asarray(M).T).tobytes())


def matrix_fromfile(f, size, tc="d"):
    """Read a dense matrix written by `matrix_tofile` (dense.c
    fromfile): `size` = (nrows, ncols), tc 'd'|'z'|'i'."""
    dt = {"d": np.float64, "z": np.complex128, "i": np.int64}[tc]
    m, n = size
    a = np.frombuffer(f.read(m * n * np.dtype(dt).itemsize),
                      dtype=dt)
    return jnp.asarray(a.reshape(n, m).T)


def spmatrix_tofile(S, f):
    """Write a sparse matrix's triplets (I, J, V arrays back to back)
    to an open binary file (sparse.c tofile semantics)."""
    idx = np.asarray(S.indices)
    f.write(np.ascontiguousarray(idx[:, 0], np.int64).tobytes())
    f.write(np.ascontiguousarray(idx[:, 1], np.int64).tobytes())
    f.write(np.ascontiguousarray(np.asarray(S.data)).tobytes())


def spmatrix_fromfile(f, nnz, size, tc="d"):
    """Read triplets written by `spmatrix_tofile`."""
    dt = {"d": np.float64, "z": np.complex128}[tc]
    I = np.frombuffer(f.read(nnz * 8), dtype=np.int64)
    J = np.frombuffer(f.read(nnz * 8), dtype=np.int64)
    V = np.frombuffer(f.read(nnz * np.dtype(dt).itemsize), dtype=dt)
    return spmatrix(V, I, J, size=size)


def _dense2(B):
    if hasattr(B, "todense"):
        B = B.todense()
    B = jnp.asarray(B)
    if not jnp.iscomplexobj(B):
        B = B.astype(float)
    return B.reshape(-1, 1) if B.ndim == 1 else B


# ---- mixed sparse/dense linear algebra (base.c axpy/gemv/gemm/syrk,
#      sparse.c sp_dgemv/sp_dgemm/sp_dsyrk) -----------------------------
#
# The reference's cvxopt.base exposes BLAS-like entry points accepting
# any mix of dense and sparse operands (base.c:398-489 incl. the
# `partial=True` fixed-pattern update — whose TPU analogue is the
# static scatter plan in ops/sparse_kkt.BandPlan).  Here sparse BCOO
# operands flow through jax.experimental.sparse's IR-level kernels.

def _maybe_bcoo(x):
    return x if isinstance(x, jxs.BCOO) else jnp.asarray(x)


def axpy(x, y, alpha=1.0):
    """y + alpha*x for any dense/sparse mix (base.c axpy)."""
    xd = x.todense() if isinstance(x, jxs.BCOO) else jnp.asarray(x)
    yd = y.todense() if isinstance(y, jxs.BCOO) else jnp.asarray(y)
    return yd + alpha * xd


def gemv(A, x, trans="N", alpha=1.0, beta=0.0, y=None):
    """alpha*A*x (+ beta*y); A dense or BCOO (base.c gemv /
    sparse.c:1073 sp_dgemv)."""
    A = _maybe_bcoo(A)
    x = jnp.asarray(x)
    if trans == "T":
        out = alpha * (A.T @ x)
    else:
        out = alpha * (A @ x)
    if y is not None and beta != 0.0:
        out = out + beta * jnp.asarray(y)
    return out


def gemm(A, B, transA="N", transB="N", alpha=1.0):
    """alpha*op(A)*op(B); either operand may be BCOO (base.c gemm /
    sparse.c:1255 sp_dgemm)."""
    A = _maybe_bcoo(A)
    B = _maybe_bcoo(B)
    Ao = A.T if transA == "T" else A
    Bo = B.T if transB == "T" else B
    return alpha * (Ao @ Bo)


def syrk(A, trans="N", alpha=1.0):
    """alpha*A*A' (or A'*A with trans='T'); A dense or BCOO
    (base.c syrk / sparse.c:2173 sp_dsyrk).  For the fixed-pattern
    `partial=True` re-assembly analogue see
    ops/sparse_kkt.make_band_plan/assemble_band."""
    A = _maybe_bcoo(A)
    if trans == "T":
        out = A.T @ A
    else:
        out = A @ A.T
    if isinstance(out, jxs.BCOO):
        out = out.todense()
    return alpha * out


def symv(A, x, alpha=1.0):
    """alpha * sym(A) * x with only the lower triangle of A referenced
    (base.c symv)."""
    Ad = A.todense() if isinstance(A, jxs.BCOO) else jnp.asarray(A)
    S = jnp.tril(Ad) + jnp.swapaxes(jnp.tril(Ad, -1), -1, -2)
    return alpha * (S @ jnp.asarray(x))


# ---- spmatrix accessors (sparse.c .I/.J/.V/.CCS attributes) ----------
#
# BCOO carries (data, indices); these helpers expose the reference's
# triplet / compressed-column views (sparse.c:3079-3087).

def sp_I(X):
    """Row indices of the nonzeros (spmatrix.I)."""
    return X.indices[:, 0]


def sp_J(X):
    """Column indices of the nonzeros (spmatrix.J)."""
    return X.indices[:, 1]


def sp_V(X):
    """Nonzero values (spmatrix.V)."""
    return X.data


def sp_CCS(X):
    """Compressed-column-storage triple (colptr, rowind, values) —
    the spmatrix.CCS attribute (cvxopt.h:58-69).  Host-side."""
    import numpy as _np
    idx = _np.asarray(X.indices)
    vals = _np.asarray(X.data)
    ncols = X.shape[1]
    order = _np.lexsort((idx[:, 0], idx[:, 1]))
    rows = idx[order, 0]
    cols = idx[order, 1]
    colptr = _np.zeros(ncols + 1, dtype=_np.int64)
    _np.add.at(colptr, cols + 1, 1)
    colptr = _np.cumsum(colptr)
    return colptr, rows, vals[order]


def trans(x):
    """Matrix transpose (dense.c:1039-1093 .trans()/.T)."""
    x = _as(x)
    return jnp.swapaxes(x, -1, -2)


def ctrans(x):
    """Conjugate (Hermitian) transpose (dense.c:1404-1419
    .ctrans()/.H)."""
    x = _as(x)
    return jnp.conjugate(jnp.swapaxes(x, -1, -2))


def real(x):
    return jnp.real(_as(x))


def imag(x):
    return jnp.imag(_as(x))


# ---- elementwise math (base.c: exp/log/sqrt/sin/cos, emul/ediv,
#      emin/emax) ------------------------------------------------------

def exp(x):
    return jnp.exp(_as(x))


def log(x):
    return jnp.log(_as(x))


def sqrt(x):
    return jnp.sqrt(_as(x))


def sin(x):
    return jnp.sin(_as(x))


def cos(x):
    return jnp.cos(_as(x))


def mul(*args):
    out = _as(args[0])
    for a in args[1:]:
        out = out * _as(a)
    return out


def div(x, y):
    return _as(x) / _as(y)


def emin(*args):
    out = _as(args[0])
    for a in args[1:]:
        out = jnp.minimum(out, _as(a))
    return out


def emax(*args):
    out = _as(args[0])
    for a in args[1:]:
        out = jnp.maximum(out, _as(a))
    return out


def _as(x):
    if hasattr(x, "todense"):
        x = x.todense()
    return jnp.asarray(x)
