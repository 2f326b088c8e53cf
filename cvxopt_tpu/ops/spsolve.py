"""Sparse direct-solver API — cvxopt.cholmod / umfpack / amd
equivalents (reference: src/C/cholmod.c:273-1028, umfpack.c:121-461,
amd.c:226).

TPU-native stance (SURVEY.md §7 "sparse story"): TPUs have no gather-
heavy supernodal path, so these entry points provide the reference's
API shape — symbolic/numeric factorization handles, solve/spsolve,
one-shot linsolve, fill-reducing ordering — backed by dense batched
factorizations on device.  Matrices may be given dense, as
`jax.experimental.sparse.BCOO`, or as scipy.sparse; they are densified
for factorization.  Block-sparse Pallas factorizations are the planned
upgrade path for large structured problems.

`amd.order` runs on the host (orderings are preprocessing, exactly as
in the reference where AMD is a host-side C routine).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

options = {"supernodal": 2, "print": 0, "nmethods": 0, "postorder": True,
           "dbound": 0.0}


def _dense(A):
    if hasattr(A, "todense"):          # BCOO / scipy.sparse
        return jnp.asarray(np.asarray(A.todense()))
    if hasattr(A, "toarray"):
        return jnp.asarray(A.toarray())
    return jnp.asarray(A)


# ---- cholmod-like ----------------------------------------------------

@dataclass
class CholSymbolic:
    n: int
    perm: Optional[np.ndarray]
    banded: bool = False
    kd: int = 0
    bsp: Optional[object] = None     # BlockSymbolic (tile-map path)


@dataclass
class CholFactor:
    L: jnp.ndarray              # dense factor OR band storage (kd+1, n)
    perm: Optional[np.ndarray]
    banded: bool = False
    bsp: Optional[object] = None     # BlockSymbolic when tile-map


def _is_sparse_input(A):
    try:
        import scipy.sparse as sp
        if sp.issparse(A):
            return True
    except ImportError:                       # pragma: no cover
        pass
    return hasattr(A, "todense") and not hasattr(A, "toarray") \
        or type(A).__name__ == "BCOO"


def _to_scipy(A):
    import scipy.sparse as sp
    if sp.issparse(A):
        return sp.csr_matrix(A)
    # BCOO
    idx = np.asarray(A.indices)
    return sp.coo_matrix((np.asarray(A.data), (idx[:, 0], idx[:, 1])),
                         shape=A.shape).tocsr()


def symbolic(A, p=None, uplo="L") -> CholSymbolic:
    """Symbolic analysis (cholmod.symbolic, cholmod.c:273).

    Sparse inputs get a REAL sparse analysis: a bandwidth-reducing
    RCM ordering (or the caller's `p`); when the resulting bandwidth
    is small the numeric factorization runs the O(n kd^2) scan-based
    banded Cholesky (ops/banded.py) instead of a dense O(n^3) factor —
    the TPU-native replacement for CHOLMOD's supernodal path
    (cholmod.c:273-969).  Dense inputs record the ordering only."""
    if _is_sparse_input(A):
        from cvxopt_tpu.ops.sparse_kkt import rcm_order, band_width_of
        S = _to_scipy(A)
        Ssym = ((S + S.T) != 0)
        n = S.shape[0]
        if p is not None:
            perm = np.asarray(p)
            kd = band_width_of(Ssym, perm)
        else:
            # cholmod.options['nmethods'] semantics (cholmod.c:84-140):
            # 0/1 -> the default ordering (RCM here); >=2 -> also try
            # the minimum-degree ordering and keep whichever gives the
            # smaller bandwidth
            perm = rcm_order(Ssym)
            kd = band_width_of(Ssym, perm)
            if int(options.get("nmethods", 0)) >= 2:
                p2 = np.asarray(amd_order(Ssym))
                kd2 = band_width_of(Ssym, p2)
                if kd2 < kd:
                    perm, kd = p2, kd2
        # options['supernodal'] (cholmod.c): 0 = always the structured
        # (simplicial-analogue banded) path; >=1 = automatic choice
        if int(options.get("supernodal", 2)) == 0:
            banded = True
        else:
            banded = (kd + 1) * 4 < n
        bsp_symb = None
        if not banded and p is None:
            # band-hostile pattern (arrow heads, grid fill, ...): try
            # the block-sparse tile-map factorization (the CHOLMOD-
            # supernodal analogue, ops/blocksparse) before giving up
            # and densifying; adopted when the block fill stays well
            # under dense
            from cvxopt_tpu.ops import blocksparse as bsp
            t = 32 if n >= 64 else max(8, n // 4)
            cand = bsp.analyze(Ssym, t=t)
            if cand.nnzb * t * t < 0.35 * n * n:
                bsp_symb = cand
                perm = cand.perm
        if options.get("print", 0):
            path = ("banded" if banded else
                    "blocksparse" if bsp_symb is not None else "dense")
            print(f"cvxopt_tpu.spsolve: n={n} bandwidth={kd} "
                  f"path={path}")
        return CholSymbolic(n=n, perm=perm, banded=banded, kd=kd,
                            bsp=bsp_symb)
    A = _dense(A)
    return CholSymbolic(n=A.shape[-1], perm=None if p is None
                        else np.asarray(p))


def numeric(A, symb: CholSymbolic, uplo="L") -> CholFactor:
    """Numeric Cholesky (cholmod.numeric, cholmod.c:364)."""
    if symb.bsp is not None:
        from cvxopt_tpu.ops import blocksparse as bsp
        import scipy.sparse as sp
        S = _to_scipy(A)
        if uplo == "L":
            Ssym = sp.tril(S) + sp.tril(S, -1).T
        else:
            Ssym = sp.triu(S) + sp.triu(S, 1).T
        Ab = bsp.assemble_scipy(symb.bsp, Ssym)
        L = bsp.factor(symb.bsp, Ab)
        return CholFactor(L=L, perm=symb.bsp.perm, bsp=symb.bsp)
    if symb.banded:
        from cvxopt_tpu.ops import banded as bnd
        import scipy.sparse as sp
        S = _to_scipy(A)
        if uplo == "L":
            Ssym = sp.tril(S) + sp.tril(S, -1).T
        else:
            Ssym = sp.triu(S) + sp.triu(S, 1).T
        Spp = sp.csr_matrix(Ssym)[symb.perm][:, symb.perm]
        coo = sp.coo_matrix(Spp)
        AB = np.zeros((symb.kd + 1, symb.n))
        mask = coo.row >= coo.col
        AB[coo.row[mask] - coo.col[mask], coo.col[mask]] = \
            coo.data[mask]
        # cholmod.options['dbound']: clamp factorization pivots
        # (cholmod.c:84-140)
        LB = bnd.pbtrf(jnp.asarray(AB),
                       dbound=float(options.get("dbound", 0.0)))
        return CholFactor(L=LB, perm=symb.perm, banded=True)
    A = _dense(A)
    A = jnp.tril(A) + jnp.swapaxes(jnp.tril(A, -1), -1, -2) \
        if uplo == "L" else \
        jnp.triu(A) + jnp.swapaxes(jnp.triu(A, 1), -1, -2)
    if symb.perm is not None:
        p = symb.perm
        A = A[..., p, :][..., :, p]
    return CholFactor(L=jnp.linalg.cholesky(A), perm=symb.perm)


def _apply_perm(B, idx):
    """X[i] = B[idx[i]] along the leading axis."""
    return B[..., idx, :] if B.ndim > 1 else B[..., idx]


def solve(F: CholFactor, B, sys: int = 0):
    """Solve using the factor (cholmod.solve, cholmod.c:460-479).

    Full CHOLMOD sys table, for the factorization P A P' = L L'
    (the factor here is always LL', so D = I — exactly the reference
    docstring's "If A was factored as P*A*P' = L*L', then D = I"):

        0  A X = B          5  L' X = B
        1  L D L' X = B     6  D X = B      (identity for LL')
        2  L D X = B        7  P' X = B  ->  X = P B
        3  D L' X = B       8  P X = B   ->  X = P' B
        4  L X = B

    sys 1-3/6 act in the PERMUTED coordinates (no P application),
    matching CHOLMOD; only sys 0 round-trips through P."""
    B = _dense(B)
    if not 0 <= sys <= 8:
        raise ValueError(f"sys must be in 0..8, got {sys}")
    perm = F.perm if F.perm is not None else (
        F.bsp.perm if F.bsp is not None else None)
    if sys in (7, 8):
        if perm is None:
            return B
        idx = np.asarray(perm) if sys == 7 else np.argsort(perm)
        return _apply_perm(B, idx)
    if sys == 6:                 # D = I for an LL' factor
        return B
    if F.bsp is not None:
        from cvxopt_tpu.ops import blocksparse as bsp
        if sys == 0:
            return bsp.solve(F.bsp, F.L, B)
        if sys == 1:
            # A = P' L L' P, so (LL')^{-1} B = P A^{-1} P' B
            p = np.asarray(F.bsp.perm)
            X = bsp.solve(F.bsp, F.L, _apply_perm(B, np.argsort(p)))
            return _apply_perm(X, p)
        raise ValueError("blocksparse factor supports sys in "
                         "{0,1,6,7,8} only")
    if F.banded:
        from cvxopt_tpu.ops import banded as bnd
        if sys == 0:
            perm_, inv = F.perm, np.argsort(F.perm)
            Bp = _apply_perm(B, perm_)
            X = bnd.pbtrs(F.L, Bp)
            return _apply_perm(X, inv)
        if sys == 1:
            return bnd.pbtrs(F.L, B)
        if sys in (2, 4):        # L D X = B -> L X = B (D = I)
            return bnd.tbtrs(F.L, B)
        if sys in (3, 5):        # D L' X = B -> L' X = B
            return bnd.tbtrs(F.L, B, trans="T")
    if F.perm is not None and sys == 0:
        B = _apply_perm(B, F.perm)
    if sys in (2, 4):
        X = jsl.solve_triangular(F.L, B, lower=True)
    elif sys in (3, 5):
        X = jsl.solve_triangular(jnp.swapaxes(F.L, -1, -2), B,
                                 lower=False)
    else:                        # 0 or 1: full L L' solve
        X = jsl.solve_triangular(F.L, B, lower=True)
        X = jsl.solve_triangular(jnp.swapaxes(F.L, -1, -2), X,
                                 lower=False)
    if F.perm is not None and sys == 0:
        X = _apply_perm(X, np.argsort(F.perm))
    return X


def linsolve(A, B, p=None, uplo="L"):
    """One-shot solve (cholmod.linsolve, cholmod.c:685)."""
    return solve(numeric(A, symbolic(A, p), uplo), B)


def splinsolve(A, B, p=None, uplo="L"):
    return linsolve(A, B, p, uplo)


def diag(F: CholFactor):
    """Diagonal of the factor (cholmod.diag, cholmod.c:969)."""
    return jnp.diagonal(F.L, axis1=-2, axis2=-1)


def getfactor(F: CholFactor):
    return F.L


# ---- umfpack-like ----------------------------------------------------

@dataclass
class LUSymbolic:
    n: int
    perm: Optional[np.ndarray] = None    # banded path: RCM ordering
    kl: int = 0
    ku: int = 0
    banded: bool = False
    bsp: Optional[object] = None    # BlockSymbolic (tile-map LU path)


@dataclass
class LUFactor:
    lu: object                  # (lu, piv) dense OR gbtrf_scan factor
    piv: object
    symb: Optional[LUSymbolic] = None
    ABT: Optional[jnp.ndarray] = None   # banded: A' band for trans='T'
    facT: Optional[object] = None
    Utab: Optional[jnp.ndarray] = None  # blocksparse: U slot table


def _band_widths(S, perm):
    import scipy.sparse as sp
    pos = np.argsort(perm)
    coo = sp.coo_matrix(S)
    if not coo.nnz:
        return 0, 0
    d = pos[coo.row] - pos[coo.col]
    return int(max(d.max(), 0)), int(max((-d).max(), 0))


def lu_symbolic(A) -> LUSymbolic:
    """umfpack.symbolic (umfpack.c:270).

    Sparse inputs get a REAL sparse analysis: an RCM ordering of the
    symmetrized pattern; when the permuted matrix is banded the
    numeric phase runs the O(n (kl+ku)^2) scan-based pivoted banded
    LU (ops/banded.gbtrf_scan) instead of densifying — UMFPACK's
    multifrontal role for structured patterns
    (umfpack.c:121-461)."""
    if _is_sparse_input(A):
        from cvxopt_tpu.ops.sparse_kkt import rcm_order
        S = _to_scipy(A)
        n = S.shape[0]
        perm = rcm_order((S + S.T) != 0)
        kl, ku = _band_widths(S != 0, perm)
        # the banded path wins when the band volume beats dense
        banded = (kl + ku + 2) * 4 < n
        bsp_symb = None
        if not banded:
            # band-hostile pattern: try the tile-map block LU over the
            # symmetrized pattern's block fill (blocksparse.factor_lu,
            # UMFPACK's multifrontal role, umfpack.c:121-461) before
            # densifying
            from cvxopt_tpu.ops import blocksparse as bsp
            t = 32 if n >= 64 else max(8, n // 4)
            cand = bsp.analyze(((S + S.T) != 0), t=t)
            if cand.nnzb * t * t < 0.35 * n * n:
                bsp_symb = cand
        if options.get("print", 0):
            path = ("banded" if banded else
                    "blocksparse" if bsp_symb is not None else "dense")
            print(f"cvxopt_tpu.spsolve(lu): n={n} kl={kl} ku={ku} "
                  f"path={path}")
        return LUSymbolic(n=n, perm=perm, kl=kl, ku=ku, banded=banded,
                          bsp=bsp_symb)
    return LUSymbolic(n=_dense(A).shape[-1])


def _to_gb_storage(S, perm, kl, ku):
    import scipy.sparse as sp
    n = S.shape[0]
    Spp = sp.coo_matrix(sp.csr_matrix(S)[perm][:, perm])
    AB = np.zeros((kl + ku + 1, n))
    AB[ku + Spp.row - Spp.col, Spp.col] = Spp.data
    return jnp.asarray(AB)


def lu_numeric(A, symb: LUSymbolic) -> LUFactor:
    """umfpack.numeric (umfpack.c:344)."""
    from cvxopt_tpu.ops import banded as bnd
    if symb.banded:
        S = _to_scipy(A)
        AB = _to_gb_storage(S, symb.perm, symb.kl, symb.ku)
        fac = bnd.gbtrf_scan(AB, symb.kl, symb.ku)
        # A' under the same permutation is (ku, kl)-banded
        ABT = _to_gb_storage(S.T, symb.perm, symb.ku, symb.kl)
        facT = bnd.gbtrf_scan(ABT, symb.ku, symb.kl)
        return LUFactor(lu=fac, piv=None, symb=symb, facT=facT)
    if symb.bsp is not None:
        from cvxopt_tpu.ops import blocksparse as bsp
        S = _to_scipy(A)
        Alow, Aupt = bsp.assemble_lu(symb.bsp, S)
        Ltab, Utab = bsp.factor_lu(symb.bsp, Alow, Aupt)
        return LUFactor(lu=Ltab, piv=None, symb=symb, Utab=Utab)
    lu, piv = jsl.lu_factor(_dense(A))
    return LUFactor(lu=lu, piv=piv)


def lu_solve(F: LUFactor, B, trans="N"):
    """umfpack.solve (umfpack.c:461)."""
    if F.symb is not None and F.symb.bsp is not None:
        from cvxopt_tpu.ops import blocksparse as bsp
        return bsp.solve_lu(F.symb.bsp, F.lu, F.Utab, _dense(B),
                            trans="N" if trans == "N" else "T")
    if F.symb is not None and F.symb.banded:
        from cvxopt_tpu.ops import banded as bnd
        symb = F.symb
        perm, inv = symb.perm, np.argsort(symb.perm)
        B = _dense(B)
        Bp = B[perm] if B.ndim == 1 else B[perm, :]
        if trans == "N":
            X = bnd.gbtrs_scan(F.lu, Bp, symb.kl, symb.ku)
        else:
            X = bnd.gbtrs_scan(F.facT, Bp, symb.ku, symb.kl)
        return X[inv] if X.ndim == 1 else X[inv, :]
    t = {"N": 0, "T": 1, "C": 2}[trans]
    return jsl.lu_solve((F.lu, F.piv), _dense(B), trans=t)


def lu_linsolve(A, B):
    """umfpack.linsolve (umfpack.c:121)."""
    return lu_solve(lu_numeric(A, lu_symbolic(A)), B)


# ---- amd-like --------------------------------------------------------

def amd_order(A):
    """Approximate-minimum-degree-style fill-reducing ordering
    (amd.order, amd.c:226).  Host-side minimum-degree on the
    symmetrized sparsity pattern — runs the native C implementation
    (cvxopt_tpu/native/mindeg.c) when a toolchain is available, with
    this pure-Python fallback otherwise (the reference's C-with-
    Python-fallback house pattern, misc.py:25-28)."""
    import scipy.sparse as sp
    if hasattr(A, "todense") or sp.issparse(A):
        S = sp.csr_matrix(A if sp.issparse(A)
                          else np.asarray(A.todense()))
    else:
        S = sp.csr_matrix(np.asarray(A) != 0)
    Ssym = ((S + S.T) != 0)
    n = Ssym.shape[0]
    from cvxopt_tpu import native
    csr = Ssym.tocsr()
    perm = native.mindeg_order(csr.indptr, csr.indices, n)
    if perm is not None:
        return perm.astype(np.int64)
    S = Ssym.tolil()
    deg = np.array([len(r) for r in S.rows])
    alive = np.ones(n, bool)
    order = []
    adj = [set(r) - {i} for i, r in enumerate(S.rows)]
    for _ in range(n):
        cand = np.where(alive)[0]
        v = cand[np.argmin(deg[cand])]
        order.append(v)
        alive[v] = False
        nb = [u for u in adj[v] if alive[u]]
        for u in nb:
            adj[u].discard(v)
            for w in nb:
                if w != u and w not in adj[u]:
                    adj[u].add(w)
            deg[u] = sum(1 for t in adj[u] if alive[t])
    return np.array(order)
