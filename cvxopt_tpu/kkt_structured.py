"""Pre-packaged structure-exploiting KKT solvers.

The reference ships its structure-exploiting KKT tricks only as doc
examples (`/root/reference/examples/doc/chap8/l1.py`, `l1regls.py`,
`qcl1.py`) that users copy and adapt; its custom-kktsolver contract
(coneprog.py:286-402) is the extension point.  This module packages
the same tricks as library functions:

  woodbury_solver(d, U, c)  generic (diag(d) + c*U U')^{-1} apply via
                            the k x k Sherman-Morrison-Woodbury system
                            — the building block for diagonal+low-rank
                            condensed KKT systems.
  kkt_l1(P)                 kktsolver for the l1-approximation LP
                            min ||P u - q||_1 with G = [P,-I;-P,-I]
                            (l1.py:47-97): reduces the 2m x (n+m) KKT
                            system to an n x n Cholesky of 4 P'DP.
  l1(P, q)                  full solver: operator-form G, kkt_l1, and
                            least-squares warm starts (l1.py:100-116).
  kkt_l1regls(A)            kktsolver for l1-regularized least squares
                            min ||A u - y||_2^2 + ||u||_1
                            (l1regls.py:41-76): eliminates the second
                            variable block and solves (2A'A + D)x = r
                            by Woodbury through an m x m system — the
                            fast path when m << n.
  l1regls(A, y)             full solver (operator P/G + kkt_l1regls).

All factories return pure-JAX closures compatible with jit/vmap; they
plug into `solvers.conelp/coneqp(..., kktsolver=...)` exactly like
user-written ones.  On TPU the inner factorizations are small dense
Cholesky factorizations — MXU-friendly and batchable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.linops import LinearOperator

__all__ = ["woodbury_solver", "kkt_l1", "l1", "kkt_l1regls", "l1regls"]


def woodbury_solver(d, U, c=1.0):
    """Return ``solve(r) = (diag(d) + c * U @ U.T)^{-1} r``.

    Sherman-Morrison-Woodbury: with k = U.shape[1] right factors, the
    apply costs one k x k Cholesky at build time plus two (n,k)
    matmuls per solve — the TPU-friendly form of the diagonal+low-rank
    structure that the reference's l1regls example exploits by hand.
    `r` may be a vector (n,) or a matrix of columns (n, nrhs).
    """
    d = jnp.asarray(d)
    U = jnp.asarray(U)
    k = U.shape[1]
    Ud = U / d[:, None]                       # D^{-1} U
    S = jnp.eye(k, dtype=U.dtype) + c * (U.T @ Ud)
    L = jnp.linalg.cholesky(S)

    def solve(r):
        rd = r / (d[:, None] if r.ndim == 2 else d)
        t = Ud.T @ r if r.ndim == 2 else Ud.T @ r
        w = jsl.solve_triangular(L, t, lower=True)
        v = jsl.solve_triangular(L.T, w, lower=False)
        return rd - c * (Ud @ v)

    return solve


# ---------------------------------------------------------------------------
# l1 approximation:  minimize ||P u - q||_1
# ---------------------------------------------------------------------------

def l1_operator(P):
    """The LP data for min ||P u - q||_1 in operator form: variable
    x = [u; v] in R^{n+m}, G = [P, -I; -P, -I] (l1.py:21-42)."""
    m, n = P.shape

    def mv(x):
        t = P @ x[:n]
        return jnp.concatenate([t - x[n:], -t - x[n:]])

    def rmv(z):
        return jnp.concatenate(
            [P.T @ (z[:m] - z[m:]), -(z[:m] + z[m:])])

    return LinearOperator(mv=mv, rmv=rmv, shape=(2 * m, n + m))


def kkt_l1(P):
    """kktsolver factory for the l1-approximation LP (l1.py:47-97).

    Solves [0 G'; G -W'W][x; z] = [bx; bz] with G = [P,-I;-P,-I] via
    an n x n Cholesky of 4 P' D P, where D is the harmonic mean of the
    two diagonal scaling blocks.  Returns (ux, uy, W uz).
    """
    m, n = P.shape

    def Fkkt(W):
        di = W["di"]
        d1 = di[:m] ** 2
        d2 = di[m:] ** 2
        D = d1 * d2 / (d1 + d2)
        S = 4.0 * (P.T * D) @ P
        L = jnp.linalg.cholesky(S)

        def solve(bx, by, bz):
            r = bx[:n] + P.T @ ((d1 - d2) / (d1 + d2) * bx[n:]
                                + 2.0 * D * (bz[:m] - bz[m:]))
            w = jsl.solve_triangular(L, r, lower=True)
            xu = jsl.solve_triangular(L.T, w, lower=False)
            u = P @ xu
            xv = (bx[n:] - d1 * bz[:m] - d2 * bz[m:]
                  + (d1 - d2) * u) / (d1 + d2)
            z1 = di[:m] * (u - xv - bz[:m])
            z2 = di[m:] * (-u - xv - bz[m:])
            return (jnp.concatenate([xu, xv]), by,
                    jnp.concatenate([z1, z2]))

        return solve

    return Fkkt


def l1(P, q, **kwargs):
    """Solve ``minimize ||P u - q||_1`` (the library form of
    examples/doc/chap8/l1.py) and return the conelp solution dict;
    ``sol['u']`` holds the minimizer.

    Uses the operator-form G, the structure-exploiting kkt_l1 solver,
    and least-squares warm starts (l1.py:100-116).
    """
    from cvxopt_tpu import solvers

    P = jnp.asarray(P)
    q = jnp.asarray(q)
    m, n = P.shape
    c = jnp.concatenate([jnp.zeros(n, dtype=P.dtype),
                         jnp.ones(m, dtype=P.dtype)])
    h = jnp.concatenate([q, -q])
    G = l1_operator(P)

    uls, *_ = jnp.linalg.lstsq(P, q)
    rls = P @ uls - q
    x0 = jnp.concatenate([uls, 1.1 * jnp.abs(rls)])
    s0 = h - G.mv(x0)
    rmax = jnp.max(jnp.abs(rls))
    w = jnp.where(rmax > 1e-10, 0.9 / jnp.maximum(rmax, 1e-300) * rls,
                  0.0)
    z0 = jnp.concatenate([0.5 * (1 + w), 0.5 * (1 - w)])

    sol = solvers.conelp(
        c, G, h, dims={"l": 2 * m, "q": [], "s": []},
        kktsolver=kkt_l1(P),
        primalstart={"x": x0, "s": s0}, dualstart={"z": z0}, **kwargs)
    sol["u"] = jnp.asarray(sol["x"])[:n]
    return sol


# ---------------------------------------------------------------------------
# l1-regularized least squares:  minimize ||A u - y||_2^2 + ||u||_1
# ---------------------------------------------------------------------------

def kkt_l1regls(A):
    """kktsolver factory for the l1-regularized least-squares QP
    (l1regls.py:41-76): variable x = [u; v] in R^{2n},
    P = [2A'A, 0; 0, 0], G = [I,-I;-I,-I].  Eliminates zl and v, then
    solves (2A'A + D) u = r by Woodbury through an m x m system
    (I + 2 A D^{-1} A') — the fast path when m << n.
    """
    m, n = A.shape

    def Fkkt(W):
        d1 = W["di"][:n] ** 2
        d2 = W["di"][n:] ** 2
        D = 4.0 * d1 * d2 / (d1 + d2)
        ds = (d2 - d1) / (d1 + d2)
        Asc = A / jnp.sqrt(D)[None, :]
        S = jnp.eye(m, dtype=A.dtype) + 2.0 * (Asc @ Asc.T)
        L = jnp.linalg.cholesky(S)

        def solve(bx, by, bz):
            xn = bx[:n] - ds * bx[n:] \
                + d1 * (1.0 + ds) * bz[:n] - d2 * (1.0 - ds) * bz[n:]
            rhs = xn / D
            v = jsl.solve_triangular(
                L.T, jsl.solve_triangular(L, A @ rhs, lower=True),
                lower=False)
            x1 = rhs - (A.T @ v) * (2.0 / D)
            x2 = (bx[n:] - d1 * bz[:n] - d2 * bz[n:]) / (d1 + d2) \
                - ds * x1
            z1 = W["di"][:n] * (x1 - x2 - bz[:n])
            z2 = W["di"][n:] * (-x1 - x2 - bz[n:])
            return (jnp.concatenate([x1, x2]), by,
                    jnp.concatenate([z1, z2]))

        return solve

    return Fkkt


def l1regls(A, y, **kwargs):
    """Solve ``minimize ||A u - y||_2^2 + ||u||_1`` (the library form
    of examples/doc/chap8/l1regls.py) and return the coneqp solution
    dict; ``sol['u']`` holds the minimizer."""
    from cvxopt_tpu import solvers

    A = jnp.asarray(A)
    y = jnp.asarray(y)
    m, n = A.shape
    q = jnp.concatenate([-2.0 * A.T @ y, jnp.ones(n, dtype=A.dtype)])

    def Pmv(u):
        return jnp.concatenate([2.0 * A.T @ (A @ u[:n]),
                                jnp.zeros(n, dtype=A.dtype)])

    def Gmv(u):
        return jnp.concatenate([u[:n] - u[n:], -u[:n] - u[n:]])

    def Grmv(z):
        return jnp.concatenate([z[:n] - z[n:], -(z[:n] + z[n:])])

    P = LinearOperator(mv=Pmv, rmv=Pmv, shape=(2 * n, 2 * n))
    G = LinearOperator(mv=Gmv, rmv=Grmv, shape=(2 * n, 2 * n))
    h = jnp.zeros(2 * n, dtype=A.dtype)

    sol = solvers.coneqp(P, q, G, h, dims={"l": 2 * n},
                         kktsolver=kkt_l1regls(A), **kwargs)
    sol["u"] = jnp.asarray(sol["x"])[:n]
    return sol
