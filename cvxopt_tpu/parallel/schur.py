"""Distributed block-arrow KKT solver — model parallelism for one
large problem (SURVEY.md §7.7; no reference counterpart, §2.9).

Target structure: scenario-coupled QPs

    minimize   sum_k [ 1/2 x_k' P_k x_k + q_k' x_k
                       + x_k' Pc_k x_0 ]  +  1/2 x_0' P0 x_0 + q0' x_0
    subject to G_k x_k + E_k x_0 + s_k = h_k,   s_k >= 0   (k = 1..K)

with K local blocks x_k (dimension nk) coupled through shared
variables x_0 (dimension n0).  The condensed KKT matrix
S = P + G' W^{-2} G is block-arrow:

    [ D_1          U_1 ]      D_k = P_k + G_k' Wk^{-2} G_k
    [      ...     ... ]      U_k = Pc_k + G_k' Wk^{-2} E_k
    [          D_K U_K ]      S00 = P0 + sum_k E_k' Wk^{-2} E_k
    [ U_1' ... U_K' S00]

Factor-solve runs under `shard_map` with scenarios sharded over the
mesh: local Cholesky factors L_k = chol(D_k) are embarrassingly
parallel; the dense Schur complement S0 = S00 - sum_k F_k' F_k
(F_k = L_k^{-1} U_k) is assembled with a `psum` over ICI; the
back-substitution broadcasts x_0 (replicated small state) and solves
locally.  This is the TP analogue for conic IPMs: the 10k-variable KKT
factors as K parallel nk^3 Cholesky + one n0^3 Cholesky instead of one
(K*nk + n0)^3 factorization.

Exposed as a conelp/coneqp-compatible custom `kktsolver` (the
reference's advanced API, coneprog.py:286-402) so the whole IPM —
including NT scaling and convergence logic — runs unchanged on the
sharded representation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map


@dataclass(frozen=True)
class ArrowQP:
    """Data for a scenario-coupled QP (stacked over the scenario
    axis K; shard axis 0 over the mesh)."""
    Pk: jnp.ndarray     # (K, nk, nk)
    Pc: jnp.ndarray     # (K, nk, n0)  coupling blocks of P
    P0: jnp.ndarray     # (n0, n0)
    qk: jnp.ndarray     # (K, nk)
    q0: jnp.ndarray     # (n0,)
    Gk: jnp.ndarray     # (K, mk, nk)
    Ek: jnp.ndarray     # (K, mk, n0)
    hk: jnp.ndarray     # (K, mk)

    @property
    def K(self):
        return self.Pk.shape[0]

    @property
    def nk(self):
        return self.Pk.shape[1]

    @property
    def n0(self):
        return self.P0.shape[0]

    @property
    def mk(self):
        return self.Gk.shape[1]

    # ---- flattening to the dense conelp/coneqp form (for testing
    # and for the custom-kktsolver interface, which sees flat
    # vectors) ------------------------------------------------------

    def flat_P(self):
        K, nk, n0 = self.K, self.nk, self.n0
        n = K * nk + n0
        Pm = np.zeros((n, n))
        for k in range(K):
            Pm[k * nk:(k + 1) * nk, k * nk:(k + 1) * nk] = self.Pk[k]
            Pm[k * nk:(k + 1) * nk, K * nk:] = self.Pc[k]
            Pm[K * nk:, k * nk:(k + 1) * nk] = np.asarray(self.Pc[k]).T
        Pm[K * nk:, K * nk:] = self.P0
        return jnp.asarray(Pm)

    def flat_q(self):
        return jnp.concatenate(
            [self.qk.reshape(-1), self.q0])

    def flat_G(self):
        K, nk, n0, mk = self.K, self.nk, self.n0, self.mk
        n = K * nk + n0
        Gm = np.zeros((K * mk, n))
        for k in range(K):
            Gm[k * mk:(k + 1) * mk, k * nk:(k + 1) * nk] = self.Gk[k]
            Gm[k * mk:(k + 1) * mk, K * nk:] = self.Ek[k]
        return jnp.asarray(Gm)

    def flat_h(self):
        return self.hk.reshape(-1)


def make_arrow_kktsolver(qp: ArrowQP, mesh: Optional[Mesh] = None,
                         axis: str = "batch"):
    """Build a coneqp-compatible custom kktsolver for an ArrowQP.

    Returns `kktsolver(W) -> solve(bx, by, bz) -> (ux, uy, W uz)` for
    the nonnegative-orthant cone (dims = {'l': K*mk}).  When `mesh` is
    given, the factor/solve runs under shard_map with the scenario axis
    sharded and the Schur complement assembled via psum over ICI.
    """
    K, nk, n0, mk = qp.K, qp.nk, qp.n0, qp.mk

    def local_factor(Pk, Pc, Gk, Ek, dk):
        # dk: (k_shard, mk) scaling slice (W['d'] rows), Dk = Wk^{-2}
        Dk = 1.0 / (dk * dk)
        GD = Gk * Dk[..., :, None]                   # (mk, nk) scaled
        Dmat = Pk + jnp.einsum("...mi,...mj->...ij", GD, Gk)
        Uk = Pc + jnp.einsum("...mi,...mj->...ij", GD, Ek)
        Lk = jnp.linalg.cholesky(Dmat)
        Fk = jsl.solve_triangular(Lk, Uk, lower=True)
        # local Schur contributions
        S_loc = jnp.einsum("...mi,...mj->...ij", Fk, Fk)
        E_loc = jnp.einsum("...mi,...mj->...ij", Ek * Dk[..., :, None],
                           Ek)
        return Lk, Fk, S_loc, E_loc

    def kktsolver(W):
        d = W["d"].reshape(K, mk)

        if mesh is None:
            Lk, Fk, S_loc, E_loc = jax.vmap(local_factor)(
                qp.Pk, qp.Pc, qp.Gk, qp.Ek, d)
            S0 = qp.P0 + jnp.sum(E_loc, axis=0) - jnp.sum(S_loc, axis=0)
            L0 = jnp.linalg.cholesky(S0)
        else:
            spec_k = P(axis)
            spec_r = P()

            def shard_factor(Pk, Pc, Gk, Ek, dk):
                Lk, Fk, S_loc, E_loc = jax.vmap(local_factor)(
                    Pk, Pc, Gk, Ek, dk)
                # Schur assembly: psum over the scenario shards (ICI)
                S_sum = jax.lax.psum(
                    jnp.sum(E_loc - S_loc, axis=0), axis_name=axis)
                return Lk, Fk, S_sum

            Lk, Fk, S_sum = shard_map(
                shard_factor, mesh=mesh,
                in_specs=(spec_k, spec_k, spec_k, spec_k, spec_k),
                out_specs=(spec_k, spec_k, spec_r))(
                    qp.Pk, qp.Pc, qp.Gk, qp.Ek, d)
            S0 = qp.P0 + S_sum
            L0 = jnp.linalg.cholesky(S0)

        def local_rhs(Gk, dk, bzk, bxk):
            Dk = 1.0 / (dk * dk)
            return bxk + jnp.einsum("...mi,...m->...i", Gk, Dk * bzk)

        def solve(bx, by, bz):
            bxk = bx[:K * nk].reshape(K, nk)
            bx0 = bx[K * nk:]
            bzk = bz.reshape(K, mk)

            if mesh is None:
                rk = jax.vmap(local_rhs)(qp.Gk, d, bzk, bxk)
                r0 = bx0 + jnp.einsum(
                    "kmi,km->i", qp.Ek, (1.0 / (d * d)) * bzk)
                tk = jax.vmap(
                    lambda L, r: jsl.solve_triangular(L, r, lower=True)
                )(Lk, rk)
                r0 = r0 - jnp.einsum("kmi,km->i", Fk, tk)
                x0 = jsl.solve_triangular(
                    L0.T, jsl.solve_triangular(L0, r0, lower=True),
                    lower=False)
                xk = jax.vmap(
                    lambda L, F, t: jsl.solve_triangular(
                        L.T, t - F @ x0, lower=False))(Lk, Fk, tk)
            else:
                spec_k = P(axis)
                spec_r = P()

                def shard_solve(Gk, Ek, dk, bzk, bxk, Lk, Fk, bx0_):
                    rk = jax.vmap(local_rhs)(Gk, dk, bzk, bxk)
                    Dk = 1.0 / (dk * dk)
                    r0_loc = jnp.einsum("kmi,km->i", Ek, Dk * bzk)
                    tk = jax.vmap(lambda L, r: jsl.solve_triangular(
                        L, r, lower=True))(Lk, rk)
                    r0_loc = r0_loc - jnp.einsum("kmi,km->i", Fk, tk)
                    r0 = bx0_ + jax.lax.psum(r0_loc, axis_name=axis)
                    x0 = jsl.solve_triangular(
                        L0.T, jsl.solve_triangular(L0, r0, lower=True),
                        lower=False)
                    xk = jax.vmap(lambda L, F, t: jsl.solve_triangular(
                        L.T, t - F @ x0, lower=False))(Lk, Fk, tk)
                    return xk, x0

                xk, x0 = shard_map(
                    shard_solve, mesh=mesh,
                    in_specs=(spec_k, spec_k, spec_k, spec_k, spec_k,
                              spec_k, spec_k, spec_r),
                    out_specs=(spec_k, spec_r))(
                        qp.Gk, qp.Ek, d, bzk, bxk, Lk, Fk, bx0)
                x0 = x0.reshape(-1)[:n0] if x0.ndim > 1 else x0

            ux = jnp.concatenate([xk.reshape(-1), x0])
            # W uz = W^{-T}(G ux - bz)
            Gx = (jnp.einsum("kmi,ki->km", qp.Gk, xk)
                  + jnp.einsum("kmi,i->km", qp.Ek, x0))
            Wuz = ((Gx - bzk) / d).reshape(-1)
            return ux, by, Wuz

        return solve

    return kktsolver


def random_arrow_qp(K, nk, n0, mk, seed=0, dtype=jnp.float64):
    """A random well-conditioned ArrowQP instance."""
    rng = np.random.default_rng(seed)
    Fk = rng.standard_normal((K, nk, nk)) / np.sqrt(nk)
    Pk = Fk @ Fk.transpose(0, 2, 1) + np.eye(nk)[None]
    Pc = 0.1 * rng.standard_normal((K, nk, n0))
    F0 = rng.standard_normal((n0, n0)) / np.sqrt(n0)
    # make the full P comfortably PD despite coupling
    P0 = F0 @ F0.T + (1.0 + 0.5 * K) * np.eye(n0)
    qk = rng.standard_normal((K, nk))
    q0 = rng.standard_normal(n0)
    Gk = np.broadcast_to(-np.eye(mk, nk), (K, mk, nk)).copy()
    Ek = 0.1 * rng.standard_normal((K, mk, n0))
    hk = rng.uniform(0.5, 1.5, (K, mk))
    c = lambda a: jnp.asarray(a, dtype=dtype)
    return ArrowQP(Pk=c(Pk), Pc=c(Pc), P0=c(P0), qk=c(qk), q0=c(q0),
                   Gk=c(Gk), Ek=c(Ek), hk=c(hk))
