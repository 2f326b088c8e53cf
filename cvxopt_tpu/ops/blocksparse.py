"""Block-sparse (tile-map) Cholesky — general sparsity beyond bands.

The banded path (ops/sparse_kkt, ops/banded) covers patterns RCM can
band; patterns it cannot (arrow heads, nested-dissection fill,
power-law graphs) previously fell back to dense O(n^3).  This module
is the TPU-native analogue of CHOLMOD's supernodal factorization
(/root/reference/src/C/cholmod.c:273-969): the fill-reducing-ordered
matrix is tiled into (t, t) blocks, the BLOCK fill pattern is computed
once on the host (symbolic phase), and the numeric factorization runs
as a `lax.scan` over block-columns whose per-step work — the
left-looking update sum, the diagonal Cholesky, the off-diagonal
triangular solves — is a fixed-size batch of dense (t, t) MXU matmuls
driven by static padded task tables.  Sequential depth is n/t (like
the supernodal elimination tree height bound), not n.

Storage: L as a slot table (nnzb + 1, t, t) over the block fill
pattern; slot nnzb is an all-zero dummy that padded task entries
gather from / scatter to (scatter-adds of zeros are no-ops).

All numeric work is jit-compatible; the symbolic phase (ordering +
block fill + task tables) is host-side preprocessing, exactly as in
the reference where AMD/CHOLMOD-analyze run on the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax


@dataclass
class BlockSymbolic:
    """Host-side symbolic analysis of a tiled SPD pattern."""
    n: int                    # original dimension
    t: int                    # tile size
    nt: int                   # number of block rows/cols (padded)
    perm: np.ndarray          # fill-reducing ordering (new -> old)
    nnzb: int                 # blocks in the L pattern (incl. fill)
    # per-block-column tables, padded to fixed widths:
    col_slots: np.ndarray     # (nt, rmax) slot of block (i, k); pad=nnzb
    col_rows: np.ndarray      # (nt, rmax) block-row index i; pad=nt
    upd_dst: np.ndarray       # (nt, umax) destination position in col
    upd_src1: np.ndarray      # (nt, umax) slot of L[i, j]
    upd_src2: np.ndarray      # (nt, umax) slot of L[k, j]
    row_slots: np.ndarray     # (nt, wmax) slot of L[k, j], j < k
    row_js: np.ndarray        # (nt, wmax) block-col j; pad=nt
    # scatter plan for numeric assembly of A blocks:
    a_slot: jnp.ndarray       # (nnz,) slot*t*t + local offset (or OOB)
    fill_frac: float = 0.0    # diagnostic: block fill / block nnz


def analyze(S, t: int = 32, perm: Optional[np.ndarray] = None
            ) -> BlockSymbolic:
    """Symbolic phase: ordering + block fill + static task tables.

    S: scipy sparse SPD pattern/matrix (values ignored).  `perm`
    overrides the ordering (default: AMD-style minimum degree from
    spsolve.amd_order — the reference's ordering for CHOLMOD)."""
    S = sp.csr_matrix(S)
    n = S.shape[0]
    if perm is None:
        from cvxopt_tpu.ops.spsolve import amd_order
        perm = np.asarray(amd_order((S + S.T) != 0))
    pos = np.argsort(perm)
    nt = -(-n // t)

    coo = sp.coo_matrix(S)
    bi = pos[coo.row] // t
    bj = pos[coo.col] // t
    # block pattern of the permuted matrix (lower part, incl. diagonal)
    blocks = set(zip(np.minimum(bi, bj).tolist(),
                     np.maximum(bi, bj).tolist()))
    adj = [set() for _ in range(nt)]
    for a, b in blocks:
        if a != b:
            adj[a].add(b)
    for k in range(nt):
        adj[k].add(k)        # padded diagonals must exist

    # symbolic block Cholesky: neighbors > k of k become a clique.
    # The native bitset elimination (native/blockfill.c — the
    # reference's in-C CHOLMOD-analyze role) runs when a toolchain is
    # available; the Python set loop is the fallback (house pattern,
    # misc.py:25-28).
    Lcols = None
    from cvxopt_tpu import native as _native
    rows_csr = [[] for _ in range(nt)]
    for a in range(nt):
        for b in adj[a]:
            rows_csr[a].append(b)
    indptr = np.zeros(nt + 1, np.int64)
    for a in range(nt):
        indptr[a + 1] = indptr[a] + len(rows_csr[a])
    indices = np.concatenate(
        [np.asarray(sorted(r), np.int64) for r in rows_csr]) \
        if nt else np.zeros(0, np.int64)
    out = _native.block_fill(indptr, indices, nt)
    if out is not None:
        colptr, colsv = out
        Lcols = [colsv[colptr[k]:colptr[k + 1]].tolist()
                 for k in range(nt)]
    if Lcols is None:
        Lcols = []
        for k in range(nt):
            nb = sorted(i for i in adj[k] if i > k)
            Lcols.append([k] + nb)
            for ix, i in enumerate(nb):
                adj[i].update(j for j in nb[ix + 1:])

    # slot numbering (column-major over the block pattern)
    slot = {}
    for k in range(nt):
        for i in Lcols[k]:
            slot[(i, k)] = len(slot)
    nnzb = len(slot)

    rmax = max(len(c) for c in Lcols)
    col_slots = np.full((nt, rmax), nnzb, np.int32)
    col_rows = np.full((nt, rmax), nt, np.int32)
    for k in range(nt):
        for ix, i in enumerate(Lcols[k]):
            col_slots[k, ix] = slot[(i, k)]
            col_rows[k, ix] = i

    # row structure: L[k, j] for j < k (needed for updates + fwd solve)
    rowpat = [[] for _ in range(nt)]
    for k in range(nt):
        for i in Lcols[k][1:]:
            rowpat[i].append(k)
    wmax = max((len(r) for r in rowpat), default=0) or 1
    row_slots = np.full((nt, wmax), nnzb, np.int32)
    row_js = np.full((nt, wmax), nt, np.int32)
    for k in range(nt):
        for ix, j in enumerate(rowpat[k]):
            row_slots[k, ix] = slot[(k, j)]
            row_js[k, ix] = j

    # update tasks for column k: for j in rowpat[k], for i in
    # Lcols[j] with i >= k: dest (i, k) -= L[i, j] @ L[k, j]'
    pos_in_col = {}
    for k in range(nt):
        for ix, i in enumerate(Lcols[k]):
            pos_in_col[(i, k)] = ix
    tasks = [[] for _ in range(nt)]
    for j in range(nt):
        cj = Lcols[j]
        for a in range(1, len(cj)):
            k = cj[a]
            for b in range(a, len(cj)):
                i = cj[b]
                tasks[k].append((pos_in_col[(i, k)],
                                 slot[(i, j)], slot[(k, j)]))
    umax = max((len(ta) for ta in tasks), default=0) or 1
    upd_dst = np.full((nt, umax), rmax, np.int32)      # pad row slot
    upd_src1 = np.full((nt, umax), nnzb, np.int32)
    upd_src2 = np.full((nt, umax), nnzb, np.int32)
    for k in range(nt):
        for ix, (d, s1, s2) in enumerate(tasks[k]):
            upd_dst[k, ix] = d
            upd_src1[k, ix] = s1
            upd_src2[k, ix] = s2

    # numeric-assembly scatter plan: PERMUTED-lower entries (r >= c)
    # land in slot[(r//t, c//t)] at local (r%t, c%t); permuted-upper
    # entries are dropped (S must store both triangles — the lower
    # half in the permuted order draws from both original triangles)
    pr, pc = pos[coo.row], pos[coo.col]
    lowmask = pr >= pc
    r2, c2 = pr[lowmask], pc[lowmask]
    sl = np.array([slot[(a, b)] for a, b in zip(r2 // t, c2 // t)],
                  np.int64)
    a_slot = np.full((coo.nnz,), (nnzb + 1) * t * t, np.int64)
    a_slot[lowmask] = sl * t * t + (r2 % t) * t + (c2 % t)
    nb_orig = len(blocks)
    return BlockSymbolic(
        n=n, t=t, nt=nt, perm=perm, nnzb=nnzb,
        col_slots=col_slots, col_rows=col_rows,
        upd_dst=upd_dst, upd_src1=upd_src1, upd_src2=upd_src2,
        row_slots=row_slots, row_js=row_js,
        a_slot=jnp.asarray(a_slot),
        fill_frac=nnzb / max(nb_orig, 1))


def assemble(symb: BlockSymbolic, S) -> jnp.ndarray:
    """Numeric assembly: scatter the (permuted, lower) values of S into
    the slot table (nnzb + 1, t, t).  Fixed pattern — under jit this is
    one scatter-add (the `partial=True` analogue).  Off-block-diagonal
    entries appearing in both triangles scatter once (lower only);
    diagonal blocks receive their strictly-upper entries mirrored."""
    S = sp.csr_matrix(S)
    coo = sp.coo_matrix(S)
    t, nnzb = symb.t, symb.nnzb
    vals = jnp.asarray(coo.data)
    A = jnp.zeros(((nnzb + 1) * t * t,), vals.dtype)
    # permuted-upper entries carry an out-of-bounds index (mode=drop)
    A = A.at[symb.a_slot].add(vals, mode="drop")
    A = A.reshape(nnzb + 1, t, t)
    # unit diagonal on padding (rows beyond n)
    npad = symb.nt * t - symb.n
    if npad:
        k_last = symb.nt - 1
        dslot = int(symb.col_slots[k_last, 0])
        idx = np.arange(symb.n - k_last * t, t)
        A = A.at[dslot, idx, idx].set(1.0)
    return A


def _slot_lookup(symb: BlockSymbolic) -> dict:
    d = {}
    for k in range(symb.nt):
        for ix in range(symb.col_slots.shape[1]):
            i = int(symb.col_rows[k, ix])
            if i < symb.nt:
                d[(i, k)] = int(symb.col_slots[k, ix])
    return d


def assemble_scipy(symb: BlockSymbolic, Sfull) -> jnp.ndarray:
    """Assembly from a FULL-symmetric scipy matrix whose pattern is
    covered by the analyzed one (host-side plan per call — the robust
    entry point for cholmod-style usage; `assemble` is the
    fixed-pattern jit path)."""
    coo = sp.coo_matrix(sp.csr_matrix(Sfull))
    t, nnzb = symb.t, symb.nnzb
    pos = np.argsort(symb.perm)
    pr, pc = pos[coo.row], pos[coo.col]
    mask = pr >= pc
    r2, c2 = pr[mask], pc[mask]
    lk = _slot_lookup(symb)
    sl = np.array([lk.get((a, b), nnzb)
                   for a, b in zip(r2 // t, c2 // t)], np.int64)
    if (sl == nnzb).any() and coo.data[mask][sl == nnzb].any():
        raise ValueError("matrix entries outside the analyzed pattern")
    idx = sl * t * t + (r2 % t) * t + (c2 % t)
    vals = jnp.asarray(coo.data[mask])
    A = jnp.zeros(((nnzb + 1) * t * t,), vals.dtype)
    A = A.at[idx].add(vals)
    A = A.reshape(nnzb + 1, t, t).at[nnzb].set(0.0)
    npad = symb.nt * t - symb.n
    if npad:
        k_last = symb.nt - 1
        dslot = int(symb.col_slots[k_last, 0])
        di = np.arange(symb.n - k_last * t, t)
        A = A.at[dslot, di, di].set(1.0)
    return A


def factor(symb: BlockSymbolic, A: jnp.ndarray):
    """Numeric block Cholesky: scan over block-columns.  A: the slot
    table from `assemble` (or any same-pattern assembly).  Returns the
    L slot table (same layout).  NaN blocks signal non-PD pivots."""
    t, nnzb, rmax = symb.t, symb.nnzb, symb.col_slots.shape[1]

    xs = (jnp.asarray(symb.col_slots), jnp.asarray(symb.upd_dst),
          jnp.asarray(symb.upd_src1), jnp.asarray(symb.upd_src2))

    def step(L, x):
        cslots, dst, s1, s2 = x
        # gather this column's A blocks (rmax, t, t)
        col = L[cslots]
        # update sum: col[dst] -= L[s1] @ L[s2]'
        U1 = L[s1]                              # (umax, t, t)
        U2 = L[s2]
        prod = jnp.einsum("uij,ukj->uik", U1, U2)
        col = jnp.concatenate(
            [col, jnp.zeros((1, t, t), col.dtype)], axis=0)
        col = col.at[dst].add(-prod)
        col = col[:rmax]
        # diagonal factor + off-diagonal solves (the assembly stores
        # only the lower half of diagonal tiles; mirror it)
        D = jnp.tril(col[0])
        D = D + jnp.tril(D, -1).T
        Lkk = jnp.linalg.cholesky(D)
        Lb = jnp.broadcast_to(Lkk, (rmax - 1, t, t))
        rest = jsl.solve_triangular(
            Lb, col[1:].swapaxes(-1, -2),
            lower=True).swapaxes(-1, -2)
        newcol = jnp.concatenate([Lkk[None], rest], axis=0)
        # scatter back (dummy-slot writes land on slot nnzb)
        L = L.at[cslots].set(newcol)
        # keep the dummy slot zero
        L = L.at[nnzb].set(0.0)
        return L, 0

    L0 = A
    L, _ = lax.scan(step, L0, xs)
    return L


def solve(symb: BlockSymbolic, L: jnp.ndarray, B):
    """Solve L L' x = b in the ORIGINAL (unpermuted) indexing.
    B: (n,) or (n, nrhs)."""
    t, nt, nnzb = symb.t, symb.nt, symb.nnzb
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    n, nrhs = Bm.shape
    perm = symb.perm
    inv = np.argsort(perm)
    Bp = Bm[perm] if n == symb.n else Bm
    npad = nt * t - symb.n
    Bp = jnp.pad(Bp, ((0, npad), (0, 0))).reshape(nt, t, nrhs)

    diag_slots = jnp.asarray(symb.col_slots[:, 0])
    rs = jnp.asarray(symb.row_slots)
    rj = jnp.asarray(symb.row_js)

    # forward: y_k = Lkk^{-1} (b_k - sum_j L[k,j] y_j)
    def fwd(y, x):
        k, slots, js = x
        acc = Bp[k] - jnp.einsum(
            "wij,wjr->ir", L[slots],
            jnp.concatenate([y, jnp.zeros((1, t, nrhs), y.dtype)],
                            axis=0)[js])
        Lkk = L[diag_slots[k]]
        yk = jsl.solve_triangular(Lkk, acc, lower=True)
        return y.at[k].set(yk), 0

    y0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
    y, _ = lax.scan(fwd, y0, (jnp.arange(nt), rs, rj))

    # backward: x_k = Lkk^{-T} (y_k - sum_{i>k} L[i,k]' x_i)
    cs = jnp.asarray(symb.col_slots)
    cr = jnp.asarray(symb.col_rows)

    def bwd(xcur, xk):
        k, slots, rows = xk
        xi = jnp.concatenate(
            [xcur, jnp.zeros((1, t, nrhs), xcur.dtype)], axis=0)[rows]
        # exclude the diagonal (first) entry
        acc = y[k] - jnp.einsum("wji,wjr->ir", L[slots][1:], xi[1:])
        Lkk = L[diag_slots[k]]
        xk_ = jsl.solve_triangular(Lkk.T, acc, lower=False)
        return xcur.at[k].set(xk_), 0

    x0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
    x, _ = lax.scan(bwd, x0,
                    (jnp.arange(nt)[::-1], cs[::-1], cr[::-1]))
    X = x.reshape(nt * t, nrhs)[:symb.n][inv]
    return X[:, 0] if vec else X


def linsolve(S, B, t: int = 32, perm=None):
    """One-shot general-sparsity solve: analyze + assemble + factor +
    solve.  S: scipy sparse SPD."""
    symb = analyze(S, t=t, perm=perm)
    A = assemble(symb, S)
    L = factor(symb, A)
    return solve(symb, L, jnp.asarray(B))


# ---------------------------------------------------------------------
# Fixed-pattern KKT assembly + the general-sparsity kktsolver
# (the blocksparse analogue of sparse_kkt.kkt_chol2_banded)
# ---------------------------------------------------------------------

@dataclass
class KKTPlan:
    symb: BlockSymbolic
    scatter_idx: jnp.ndarray    # (m*r*r,) slot*t*t + local (or OOB)
    G: object                   # SparseELL (original indexing)
    Ablocks: Optional[jnp.ndarray]   # static P contribution


def make_kkt_plan(G_sp, P_sp=None, t: int = 32,
                  dtype=jnp.float64) -> KKTPlan:
    """Host-side symbolic setup for S = P + G' diag(w) G over a
    general (AMD-ordered, tile-mapped) pattern: the scatter indices of
    every Gram pair G[k,i]*G[k,j] into the block-slot storage are
    computed once (the `partial=True` analogue); per-iteration
    assembly is one fused multiply + scatter-add."""
    from cvxopt_tpu.ops.sparse_kkt import SparseELL
    G_sp = sp.csr_matrix(G_sp)
    m, n = G_sp.shape
    Gpat = sp.csr_matrix(
        (np.ones_like(G_sp.data), G_sp.indices, G_sp.indptr),
        shape=G_sp.shape)
    Spat = (Gpat.T @ Gpat)
    if P_sp is not None:
        Spat = Spat + sp.csr_matrix(P_sp)
    symb = analyze((Spat != 0), t=t)
    tt = symb.t
    pos = np.argsort(symb.perm)
    lk = _slot_lookup(symb)

    ell = SparseELL.from_scipy(G_sp)
    r = ell.vals.shape[1]
    cols = np.asarray(ell.cols)
    valid = np.asarray(ell.vals) != 0
    p_i = pos[cols]                          # (m, r) permuted positions
    pi = p_i[:, :, None] * np.ones((1, 1, r), int)
    pj = p_i[:, None, :] * np.ones((1, r, 1), int)
    vi = valid[:, :, None] & valid[:, None, :]
    lower = pi >= pj
    bi, bj = pi // tt, pj // tt
    li, lj = pi % tt, pj % tt
    # vectorized slot lookup via a dense (nt, nt) map
    smap = np.full((symb.nt, symb.nt), symb.nnzb, np.int64)
    for (a, b), s in lk.items():
        smap[a, b] = s
    slots = smap[bi, bj]
    flat = slots * tt * tt + li * tt + lj
    oob = (symb.nnzb + 1) * tt * tt
    flat = np.where(vi & lower & (slots < symb.nnzb), flat, oob)

    Ablocks = None
    if P_sp is not None:
        Pd = sp.csr_matrix(P_sp)
        Psym = sp.tril(Pd) + sp.tril(Pd, -1).T
        Ablocks = assemble_scipy(symb, Psym)
        # remove the unit padding (added again at assembly)
        npad = symb.nt * t - symb.n
        if npad:
            k_last = symb.nt - 1
            dslot = int(symb.col_slots[k_last, 0])
            di = np.arange(symb.n - k_last * t, t)
            Ablocks = Ablocks.at[dslot, di, di].set(0.0)
    ellc = SparseELL(ell.vals.astype(dtype), ell.cols, ell.shape)
    return KKTPlan(symb=symb,
                   scatter_idx=jnp.asarray(flat.reshape(-1)),
                   G=ellc, Ablocks=Ablocks)


def assemble_kkt(plan: KKTPlan, wrow):
    """Device-side numeric assembly of S = P + G' diag(wrow) G into
    block-slot storage (fixed pattern, one scatter-add)."""
    symb = plan.symb
    t, nnzb = symb.t, symb.nnzb
    v = plan.G.vals                          # (m, r)
    contrib = wrow[:, None, None] * v[:, :, None] * v[:, None, :]
    A = jnp.zeros(((nnzb + 1) * t * t,), contrib.dtype).at[
        plan.scatter_idx].add(contrib.reshape(-1), mode="drop")
    A = A.reshape(nnzb + 1, t, t).at[nnzb].set(0.0)
    if plan.Ablocks is not None:
        A = A + plan.Ablocks.astype(A.dtype)
    npad = symb.nt * t - symb.n
    if npad:
        k_last = symb.nt - 1
        dslot = int(symb.col_slots[k_last, 0])
        di = jnp.arange(symb.n - k_last * t, t)
        A = A.at[dslot, di, di].set(1.0)
    return A


def kkt_chol2_blocksparse(G_sp, dims, A=None, P_sp=None, t: int = 32,
                          dtype=jnp.float64):
    """General-sparsity custom kktsolver for 'l'-cone problems: the
    tile-map Cholesky behind the reference kkt_chol2 contract
    (misc.py:1352 + CHOLMOD supernodal, cholmod.c:273-969) — for
    patterns the banded path cannot band (arrow heads, grid fill).

    Same contract as sparse_kkt.kkt_chol2_banded."""
    if getattr(dims, "q", ()) or getattr(dims, "s", ()):
        raise ValueError("kkt_chol2_blocksparse supports 'l' cones "
                         "only")
    plan = make_kkt_plan(G_sp, P_sp=P_sp, t=t, dtype=dtype)
    symb = plan.symb
    G = plan.G
    if A is not None and getattr(A, "shape", (0,))[0]:
        A = jnp.asarray(A, dtype) if not hasattr(A, "todense") \
            else jnp.asarray(np.asarray(A.todense()), dtype)
        p = A.shape[0]
    else:
        p = 0

    def kktsolver(W):
        di = W["di"]
        Ab = assemble_kkt(plan, (di * di).astype(dtype))
        L = factor(symb, Ab)

        def Sinv(v):
            return solve(symb, L, v)

        if p:
            SiAT = Sinv(A.T)
            K = A @ SiAT
            Lk = jnp.linalg.cholesky(K)

        def kkt_solve(bx, by, bz):
            zs = di * (di * bz)
            r = bx + G.rmatvec(zs)
            tv = Sinv(r)
            if p:
                rhs = A @ tv - by
                w2 = jsl.solve_triangular(Lk, rhs, lower=True)
                uy = jsl.solve_triangular(Lk.T, w2, lower=False)
                ux = tv - SiAT @ uy
            else:
                uy = by
                ux = tv
            Wuz = di * (G.matvec(ux) - bz)
            return ux, uy, Wuz

        return kkt_solve

    kktsolver.plan = plan
    return kktsolver


# ---------------------------------------------------------------------
# Unsymmetric block LU (tile-map LDU) — general-sparsity umfpack path
# ---------------------------------------------------------------------
#
# The reference's UMFPACK handles any sparsity via multifrontal LU
# with partial pivoting (/root/reference/src/C/umfpack.c:121-461).
# The TPU-native analogue factors over the SYMMETRIZED pattern's block
# fill (UMFPACK's own "symmetric strategy"): the block pattern and the
# static task tables of the Cholesky analysis drive BOTH triangles,
# because with U stored transposed (Ut[(i,k)] := U[k,i]') the two
# left-looking updates are formally identical:
#
#     Lcol[(i,k)] -= L[(i,j)] @ U[j,k]      = L[(i,j)]  @ Ut[(k,j)]'
#     Ut[(i,k)]   -= (L[(k,j)] @ U[j,i])'   = Ut[(i,j)] @ L[(k,j)]'
#
# Diagonal blocks factor by QR (Householder — unconditionally stable
# for any nonsingular block, and TPU-lowerable where f64 LU is not);
# cross-block pivoting is not performed (static pivoting over the
# AMD-ordered pattern), the standard trade for structured systems —
# `lu_solve`'s iterative-refinement step recovers residuals to f64
# roundoff for the patterns this path accepts.
#
# Factor convention (block Doolittle): A = L' U' with L' unit-block-
# lower, L'[i,j] = Ã[i,j] D_j^{-1} for i > j, U'[j,j] = D_j = Q_j R_j,
# U'[j,i] = Ã[j,i].  Storage: Ltab's diagonal slot holds R_j, Utab's
# diagonal slot holds Q_j, off-diagonal slots hold L'[i,j] and
# U'[j,i]' respectively.


def assemble_lu(symb: BlockSymbolic, S):
    """Numeric assembly of an UNSYMMETRIC matrix into the two slot
    tables (Alow, Aupt) over the symmetrized-pattern analysis `symb`:
    block-lower entries (and FULL diagonal blocks) go to Alow;
    strictly-block-upper entries go to Aupt transposed, at the mirror
    (lower) slot."""
    coo = sp.coo_matrix(sp.csr_matrix(S))
    t, nnzb = symb.t, symb.nnzb
    pos = np.argsort(symb.perm)
    lk = _slot_lookup(symb)
    pr, pc = pos[coo.row], pos[coo.col]
    bi, bj = pr // t, pc // t
    low = bi >= bj                 # incl. diagonal blocks (full)
    sl = np.full(coo.nnz, nnzb, np.int64)
    loc_r = np.where(low, pr % t, pc % t)
    loc_c = np.where(low, pc % t, pr % t)
    for idx in range(coo.nnz):
        key = (int(bi[idx]), int(bj[idx])) if low[idx] \
            else (int(bj[idx]), int(bi[idx]))
        s = lk.get(key)
        if s is None:
            raise ValueError("entry outside the analyzed pattern")
        sl[idx] = s
    flat = sl * t * t + loc_r * t + loc_c
    vals = jnp.asarray(coo.data)
    size = (nnzb + 1) * t * t
    Alow = jnp.zeros((size,), vals.dtype).at[
        jnp.asarray(np.where(low, flat, size))].add(
        jnp.where(jnp.asarray(low), vals, 0.0), mode="drop")
    Aupt = jnp.zeros((size,), vals.dtype).at[
        jnp.asarray(np.where(~low, flat, size))].add(
        jnp.where(jnp.asarray(~low), vals, 0.0), mode="drop")
    Alow = Alow.reshape(nnzb + 1, t, t)
    Aupt = Aupt.reshape(nnzb + 1, t, t)
    npad = symb.nt * t - symb.n
    if npad:
        k_last = symb.nt - 1
        dslot = int(symb.col_slots[k_last, 0])
        di = np.arange(symb.n - k_last * t, t)
        Alow = Alow.at[dslot, di, di].set(1.0)
    return Alow, Aupt


def factor_lu(symb: BlockSymbolic, Alow: jnp.ndarray,
              Aupt: jnp.ndarray):
    """Numeric block LU over the symmetrized block pattern: one
    `lax.scan` over block columns updating BOTH triangles with the
    same static task tables.  Returns (Ltab, Utab); NaN blocks signal
    a singular diagonal pivot (QR of a rank-deficient block)."""
    t, nnzb, rmax = symb.t, symb.nnzb, symb.col_slots.shape[1]

    xs = (jnp.asarray(symb.col_slots), jnp.asarray(symb.upd_dst),
          jnp.asarray(symb.upd_src1), jnp.asarray(symb.upd_src2))

    def step(carry, x):
        Ltab, Utab = carry
        cslots, dst, s1, s2 = x
        Lcol = Ltab[cslots]                     # (rmax, t, t)
        Ucol = Utab[cslots]
        pad = jnp.zeros((1, t, t), Lcol.dtype)
        Lcol = jnp.concatenate([Lcol, pad], axis=0)
        Ucol = jnp.concatenate([Ucol, pad], axis=0)
        Ls1, Us1 = Ltab[s1], Utab[s1]
        Ls2, Us2 = Ltab[s2], Utab[s2]
        Lcol = Lcol.at[dst].add(
            -jnp.einsum("uij,ukj->uik", Ls1, Us2))
        Ucol = Ucol.at[dst].add(
            -jnp.einsum("uij,ukj->uik", Us1, Ls2))
        Lcol, Ucol = Lcol[:rmax], Ucol[:rmax]

        D = Lcol[0]                             # full diagonal block
        Q, R = jnp.linalg.qr(D)
        # L[i,k] = Lcol[i] D^{-1} = (Q @ (R^{-T} Lcol[i]^T))^T
        Rb = jnp.broadcast_to(R, (rmax - 1, t, t))
        tmp = jsl.solve_triangular(
            jnp.swapaxes(Rb, -1, -2), jnp.swapaxes(Lcol[1:], -1, -2),
            lower=True)
        Lrest = jnp.swapaxes(jnp.einsum("ij,ujk->uik", Q, tmp), -1, -2)
        newL = jnp.concatenate([R[None], Lrest], axis=0)
        newU = jnp.concatenate([Q[None], Ucol[1:]], axis=0)
        Ltab = Ltab.at[cslots].set(newL).at[nnzb].set(0.0)
        Utab = Utab.at[cslots].set(newU).at[nnzb].set(0.0)
        return (Ltab, Utab), 0

    (Ltab, Utab), _ = lax.scan(step, (Alow, Aupt), xs)
    return Ltab, Utab


def solve_lu(symb: BlockSymbolic, Ltab: jnp.ndarray,
             Utab: jnp.ndarray, B, trans: str = "N"):
    """Solve A x = b (trans='N') or A' x = b (trans='T') from the
    block-LU tables, in the ORIGINAL (unpermuted) indexing.  The
    symmetric-pattern analysis makes the transpose solve free: the
    same tables serve both directions."""
    t, nt, nnzb = symb.t, symb.nt, symb.nnzb
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    n, nrhs = Bm.shape
    perm = symb.perm
    inv = np.argsort(perm)
    Bp = Bm[perm] if n == symb.n else Bm
    npad = nt * t - symb.n
    Bp = jnp.pad(Bp, ((0, npad), (0, 0))).reshape(nt, t, nrhs)

    diag_slots = jnp.asarray(symb.col_slots[:, 0])
    rs = jnp.asarray(symb.row_slots)
    rj = jnp.asarray(symb.row_js)
    cs = jnp.asarray(symb.col_slots)
    cr = jnp.asarray(symb.col_rows)

    def gather(tab, slots):
        return tab[slots]

    if trans == "N":
        # forward, unit-lower L': y_k = b_k - sum_{j<k} L[k,j] y_j
        def fwd(y, x):
            k, slots, js = x
            yj = jnp.concatenate(
                [y, jnp.zeros((1, t, nrhs), y.dtype)], axis=0)[js]
            acc = Bp[k] - jnp.einsum("wij,wjr->ir", Ltab[slots], yj)
            return y.at[k].set(acc), 0

        y0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
        y, _ = lax.scan(fwd, y0, (jnp.arange(nt), rs, rj))

        # backward, U': x_k = D_k^{-1}(y_k - sum_{i>k} U[k,i] x_i)
        #   U[k,i] = Utab[(i,k)]';  D_k^{-1} = R^{-1} Q'
        def bwd(xc, xk):
            k, slots, rows = xk
            xi = jnp.concatenate(
                [xc, jnp.zeros((1, t, nrhs), xc.dtype)],
                axis=0)[rows]
            acc = y[k] - jnp.einsum("wji,wjr->ir",
                                    Utab[slots][1:], xi[1:])
            Qk = Utab[diag_slots[k]]
            Rk = Ltab[diag_slots[k]]
            xk_ = jsl.solve_triangular(Rk, Qk.T @ acc, lower=False)
            return xc.at[k].set(xk_), 0

        x0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
        x, _ = lax.scan(bwd, x0,
                        (jnp.arange(nt)[::-1], cs[::-1], cr[::-1]))
    else:
        # A' = U'^T L'^T.
        # forward, block-lower U'^T with diagonal D_k':
        #   z_k = D_k'^{-1}(b_k - sum_{j<k} U'[j,k]' z_j)
        #   U'[j,k]' = Utab[(k,j)];  D_k'^{-1} = Q R^{-T}
        def fwdT(z, x):
            k, slots, js = x
            zj = jnp.concatenate(
                [z, jnp.zeros((1, t, nrhs), z.dtype)], axis=0)[js]
            acc = Bp[k] - jnp.einsum("wij,wjr->ir", Utab[slots], zj)
            Qk = Utab[diag_slots[k]]
            Rk = Ltab[diag_slots[k]]
            zk = Qk @ jsl.solve_triangular(Rk.T, acc, lower=True)
            return z.at[k].set(zk), 0

        z0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
        z, _ = lax.scan(fwdT, z0, (jnp.arange(nt), rs, rj))

        # backward, unit-upper L'^T: x_k = z_k - sum_{i>k} L[i,k]' x_i
        def bwdT(xc, xk):
            k, slots, rows = xk
            xi = jnp.concatenate(
                [xc, jnp.zeros((1, t, nrhs), xc.dtype)],
                axis=0)[rows]
            acc = z[k] - jnp.einsum("wji,wjr->ir",
                                    Ltab[slots][1:], xi[1:])
            return xc.at[k].set(acc), 0

        x0 = jnp.zeros((nt, t, nrhs), Bm.dtype)
        x, _ = lax.scan(bwdT, x0,
                        (jnp.arange(nt)[::-1], cs[::-1], cr[::-1]))

    X = x.reshape(nt * t, nrhs)[:symb.n][inv]
    return X[:, 0] if vec else X


def lu_linsolve_blocksparse(S, B, t: int = 32, perm=None,
                            refine: int = 1):
    """One-shot general-sparsity unsymmetric solve: analyze the
    symmetrized pattern, block-LU factor, solve (+ `refine` rounds of
    iterative refinement against the original matrix)."""
    Ssp = sp.csr_matrix(S)
    symb = analyze(((Ssp + Ssp.T) != 0), t=t, perm=perm)
    Alow, Aupt = assemble_lu(symb, Ssp)
    Ltab, Utab = factor_lu(symb, Alow, Aupt)
    b = jnp.asarray(B)
    x = solve_lu(symb, Ltab, Utab, b)
    for _ in range(refine):
        r = b - jnp.asarray(Ssp @ np.asarray(x))
        x = x + solve_lu(symb, Ltab, Utab, r)
    return x
