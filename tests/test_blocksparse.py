"""Block-sparse (tile-map) Cholesky — the general-sparsity path
between banded and dense (CHOLMOD supernodal analogue,
/root/reference/src/C/cholmod.c:273-969)."""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from cvxopt_tpu.ops import blocksparse as bsp


def _arrow(n, rng, scale=None):
    d = 3.0 + rng.uniform(0, 1, n)
    A = sp.lil_matrix((n, n))
    A.setdiag(d)
    v = (scale if scale is not None
         else 0.5 / np.sqrt(n)) * rng.standard_normal(n - 1)
    A[n - 1, :n - 1] = v
    A[:n - 1, n - 1] = np.asarray(v)[:, None]
    return sp.csr_matrix(A)


def test_blocksparse_patterns():
    rng = np.random.default_rng(0)
    cases = []
    cases.append(("arrow", _arrow(300, rng), 16))
    B = sp.random(400, 400, density=0.02, random_state=1)
    cases.append(("random spd",
                  (B @ B.T + sp.diags(3.0 + rng.uniform(0, 1, 400)))
                  .tocsr(), 16))
    k = 20
    I = sp.eye(k)
    T = sp.diags([-1., 4., -1.], [-1, 0, 1], shape=(k, k))
    L2 = (sp.kron(I, T)
          + sp.kron(sp.diags([-1., -1.], [-1, 1], shape=(k, k)), I))
    cases.append(("2d laplacian", sp.csr_matrix(L2), 16))
    for name, S, t in cases:
        n = S.shape[0]
        b = rng.standard_normal(n)
        x = bsp.linsolve(S, b, t=t)
        xref = np.linalg.solve(S.toarray(), b)
        np.testing.assert_allclose(np.asarray(x), xref, atol=1e-8,
                                   err_msg=name)


def test_blocksparse_structure_scaling():
    """Cost scales with structure: the arrow pattern's block count is
    O(nt), not O(nt^2) (the VERDICT 'done' criterion — an arrow
    pattern solves with cost scaling with structure)."""
    rng = np.random.default_rng(1)
    S = _arrow(2000, rng)
    symb = bsp.analyze(S, t=32)
    # arrow blocks: diagonal (nt) + last row (nt-1) ~ 2*nt
    assert symb.nnzb <= 3 * symb.nt, (symb.nnzb, symb.nt)
    b = rng.standard_normal(2000)
    x = bsp.linsolve(S, b, t=32)
    assert np.abs(S @ np.asarray(x) - b).max() < 1e-9


def test_blocksparse_multi_rhs_and_assembly_paths():
    rng = np.random.default_rng(2)
    S = _arrow(200, rng)
    symb = bsp.analyze(S, t=16)
    A1 = bsp.assemble(symb, S)
    A2 = bsp.assemble_scipy(symb, S)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2))
    L = bsp.factor(symb, A1)
    B = rng.standard_normal((200, 3))
    X = bsp.solve(symb, L, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(X),
                               np.linalg.solve(S.toarray(), B),
                               atol=1e-8)


def test_cholmod_api_routes_blocksparse():
    """The cholmod-equivalent API uses the tile-map path for
    band-hostile patterns instead of silently densifying."""
    from cvxopt_tpu.ops import spsolve
    rng = np.random.default_rng(3)
    S = _arrow(1500, rng)
    symb = spsolve.symbolic(S)
    assert symb.bsp is not None
    F = spsolve.numeric(S, symb)
    b = rng.standard_normal(1500)
    x = spsolve.solve(F, b)
    assert np.abs(S @ np.asarray(x) - b).max() < 1e-9


def test_blocksparse_kktsolver_end_to_end():
    """The general-sparsity kktsolver (fixed-pattern device assembly +
    tile-map factor) through solvers.conelp on an arrow-patterned LP,
    vs the dense path."""
    import jax.numpy as jnp
    from cvxopt_tpu.ops.blocksparse import kkt_chol2_blocksparse
    from cvxopt_tpu.ops.sparse_kkt import _as_ops
    from cvxopt_tpu.cones import ConeDims
    from cvxopt_tpu import solvers
    n = 200
    rng = np.random.default_rng(0)
    c = rng.standard_normal(n) * 0.1
    rows, cols, vals, h = [], [], [], []
    r = 0
    for i in range(n):
        rows += [r, r + 1]
        cols += [i, i]
        vals += [-1.0, 1.0]
        h += [0.0, 1.0]
        r += 2
    for i in range(n - 1):            # hub coupling: arrow pattern
        rows += [r, r]
        cols += [i, n - 1]
        vals += [0.3, 0.2]
        h += [1.0]
        r += 1
    G = sp.coo_matrix((vals, (rows, cols)), shape=(r, n)).tocsr()
    dims = ConeDims(l=r)
    kkt = kkt_chol2_blocksparse(G, dims, t=16)
    assert kkt.plan.symb.nnzb < 0.3 * kkt.plan.symb.nt ** 2
    Gop = _as_ops(G, jnp.float64)
    sol = solvers.conelp(jnp.asarray(c), Gop,
                         jnp.asarray(np.asarray(h)), dims=dims,
                         kktsolver=kkt, options={"maxiters": 30})
    assert sol["status"] == "optimal"
    ref = solvers.conelp(jnp.asarray(c), jnp.asarray(G.toarray()),
                         jnp.asarray(np.asarray(h)), dims=dims,
                         options={"maxiters": 30})
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-7)


# ---- unsymmetric tile-map block LU (umfpack general-sparsity path) ----

def _unsym_arrow(n, head=10, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    A = sp.lil_matrix((n, n))
    A.setdiag(rng.uniform(5.0, 9.0, n))
    A[:head, head:] = 0.4 * rng.standard_normal((head, n - head))
    A[head:, :head] = 0.2 * rng.standard_normal((n - head, head))
    for d in (1, 2):
        A.setdiag(0.3 * rng.standard_normal(n - d), d)
        A.setdiag(0.2 * rng.standard_normal(n - d), -d)
    return sp.csr_matrix(A)


def test_blocksparse_lu_small_vs_scipy():
    import scipy.sparse.linalg as spl
    from cvxopt_tpu.ops import blocksparse as bsp
    A = _unsym_arrow(300, head=7)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(300)
    x = np.asarray(bsp.lu_linsolve_blocksparse(A, b, t=16))
    xref = spl.spsolve(A, b)
    np.testing.assert_allclose(x, xref, atol=1e-12)


def test_blocksparse_lu_transpose_and_multirhs():
    from cvxopt_tpu.ops import blocksparse as bsp
    A = _unsym_arrow(200, head=5, seed=3)
    symb = bsp.analyze(((A + A.T) != 0), t=16)
    Alow, Aupt = bsp.assemble_lu(symb, A)
    Lt, Ut = bsp.factor_lu(symb, Alow, Aupt)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(200)
    xt = np.asarray(bsp.solve_lu(symb, Lt, Ut, jnp.asarray(b),
                                 trans="T"))
    assert np.linalg.norm(A.T @ xt - b) < 1e-11 * np.linalg.norm(b)
    Bm = rng.standard_normal((200, 4))
    Xm = np.asarray(bsp.solve_lu(symb, Lt, Ut, jnp.asarray(Bm)))
    assert np.linalg.norm(A @ Xm - Bm) < 1e-11 * np.linalg.norm(Bm)


def test_umfpack_arrow_n3000_never_densifies():
    """VERDICT r3 item 6 done-criterion: an arrow-pattern unsymmetric
    n>=3000 system factors through the umfpack API without densifying,
    with residual <= 1e-12."""
    from cvxopt_tpu import umfpack
    n = 3000
    A = _unsym_arrow(n, head=12, seed=7)
    symb = umfpack.symbolic(A)
    assert not symb.banded and symb.bsp is not None, \
        "arrow pattern must take the tile-map LU path"
    # storage bound: block fill stays far under dense
    t = symb.bsp.t
    assert symb.bsp.nnzb * t * t < 0.35 * n * n
    F = umfpack.numeric(A, symb)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(n)
    x = np.asarray(umfpack.solve(F, b))
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) <= 1e-12
    xt = np.asarray(umfpack.solve(F, b, trans="T"))
    assert np.linalg.norm(A.T @ xt - b) / np.linalg.norm(b) <= 1e-12
