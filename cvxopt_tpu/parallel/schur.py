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


# =====================================================================
# Generalized block-partitioned KKT: local equality constraints and
# arbitrary local cone blocks ('l'/'q'/'s'), with optional shared
# equalities on the coupling variables.  This is the general
# "block-partitioned KKT for one large problem" capability (SURVEY.md
# §7.7); the arrow solver above is the orthant-only special case kept
# for its lighter footprint.
#
# Reference contract being distributed: the 3x3 KKT system
# /root/reference/src/python/misc.py:1069-1071; the condensed form
# matches kkt_chol2 (misc.py:1352) with the equality block handled by
# a per-scenario saddle-point elimination instead of a global Schur
# complement.
# =====================================================================

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import cones as _cones
from cvxopt_tpu import scaling as _nt


def global_dims(dims_local: ConeDims, K: int) -> ConeDims:
    """ConeDims for K stacked scenarios, RUN-MAJOR: all 'l' rows first,
    then for each local q-run its K*cnt blocks contiguously, then the
    s-runs likewise.  This ordering keeps every global run uniform so
    per-scenario slices are reshapes (see `split_w`)."""
    q = []
    for (_, cnt, m) in dims_local.q_runs:
        q.extend([m] * (K * cnt))
    s = []
    for (_, _, cnt, m) in dims_local.s_runs:
        s.extend([m] * (K * cnt))
    return ConeDims(l=K * dims_local.l, q=tuple(q), s=tuple(s))


def split_cone_vec(v, dims_local: ConeDims, K: int):
    """(cdim_global,) run-major global cone vector -> (K, cdim_local)
    scenario-major local layout."""
    parts = []
    off = 0
    ln = dims_local.l
    parts.append(v[..., :K * ln].reshape(*v.shape[:-1], K, ln))
    off = K * ln
    for (_, cnt, m) in dims_local.q_runs:
        w = K * cnt * m
        parts.append(v[..., off:off + w].reshape(
            *v.shape[:-1], K, cnt * m))
        off += w
    for (_, _, cnt, m) in dims_local.s_runs:
        w = K * cnt * m * m
        parts.append(v[..., off:off + w].reshape(
            *v.shape[:-1], K, cnt * m * m))
        off += w
    return jnp.concatenate(parts, axis=-1)


def merge_cone_vec(vk, dims_local: ConeDims, K: int):
    """(K, cdim_local) -> run-major (cdim_global,) (inverse of
    split_cone_vec)."""
    parts = []
    off = 0
    ln = dims_local.l
    parts.append(vk[..., :, :ln].reshape(*vk.shape[:-2], K * ln))
    off = ln
    for (_, cnt, m) in dims_local.q_runs:
        w = cnt * m
        parts.append(vk[..., :, off:off + w].reshape(
            *vk.shape[:-2], K * w))
        off += w
    for (_, _, cnt, m) in dims_local.s_runs:
        w = cnt * m * m
        parts.append(vk[..., :, off:off + w].reshape(
            *vk.shape[:-2], K * w))
        off += w
    return jnp.concatenate(parts, axis=-1)


def split_w(W, dims_local: ConeDims, K: int):
    """Global run-major scaling dict -> per-scenario batched dict with
    a leading K axis on every leaf (vmap-able)."""
    Wk = {}
    Wk["d"] = W["d"].reshape(K, dims_local.l)
    Wk["di"] = W["di"].reshape(K, dims_local.l)
    Wk["beta"], Wk["v"] = [], []
    for i, (_, cnt, m) in enumerate(dims_local.q_runs):
        Wk["beta"].append(W["beta"][i].reshape(K, cnt))
        Wk["v"].append(W["v"][i].reshape(K, cnt, m))
    Wk["r"], Wk["rti"] = [], []
    for i, (_, _, cnt, m) in enumerate(dims_local.s_runs):
        Wk["r"].append(W["r"][i].reshape(K, cnt, m, m))
        Wk["rti"].append(W["rti"][i].reshape(K, cnt, m, m))
    return Wk


@dataclass(frozen=True)
class BlockQP:
    """Scenario-coupled QP with local cone AND equality constraints:

        minimize    sum_k [ 1/2 x_k'P_k x_k + q_k'x_k + x_k'Pc_k x_0 ]
                    + 1/2 x_0'P0 x_0 + q0'x_0
        subject to  G_k x_k + E_k x_0 + s_k = h_k,  s_k in local cone
                    A_k x_k + C_k x_0 = b_k                  (k = 1..K)
                    A0 x_0 = b0

    Local cone rows are in LOCAL l/q/s order (dims_local); the
    flattened problem uses the run-major global ordering of
    `global_dims`."""
    Pk: jnp.ndarray     # (K, nk, nk)
    Pc: jnp.ndarray     # (K, nk, n0)
    P0: jnp.ndarray     # (n0, n0)
    qk: jnp.ndarray     # (K, nk)
    q0: jnp.ndarray     # (n0,)
    Gk: jnp.ndarray     # (K, mk, nk)   local cone rows
    Ek: jnp.ndarray     # (K, mk, n0)
    hk: jnp.ndarray     # (K, mk)
    Ak: jnp.ndarray     # (K, pk, nk)   local equalities (pk may be 0)
    Ck: jnp.ndarray     # (K, pk, n0)
    bk: jnp.ndarray     # (K, pk)
    A0: jnp.ndarray     # (p0, n0)      shared equalities (p0 may be 0)
    b0: jnp.ndarray     # (p0,)
    dims_local: ConeDims = ConeDims(l=0)

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

    @property
    def pk(self):
        return self.Ak.shape[1]

    @property
    def p0(self):
        return self.A0.shape[0]

    # ---- dense flattening (cross-check oracle) ----------------------

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
        return jnp.concatenate([self.qk.reshape(-1), self.q0])

    def _flat_cone_rows(self, Mk):
        """(K, mk, ncols) scenario-major local rows -> run-major global
        rows (matches global_dims ordering)."""
        K = self.K
        d = self.dims_local
        out = []
        out.append(np.asarray(Mk[:, :d.l]).reshape(K * d.l, -1))
        off = d.l
        for (_, cnt, m) in d.q_runs:
            w = cnt * m
            out.append(np.asarray(Mk[:, off:off + w]).reshape(
                K * w, -1))
            off += w
        for (_, _, cnt, m) in d.s_runs:
            w = cnt * m * m
            out.append(np.asarray(Mk[:, off:off + w]).reshape(
                K * w, -1))
            off += w
        return np.concatenate(out, axis=0)

    def flat_G(self):
        K, nk, n0, mk = self.K, self.nk, self.n0, self.mk
        n = K * nk + n0
        Gm = np.zeros((K, mk, n))
        for k in range(K):
            Gm[k, :, k * nk:(k + 1) * nk] = self.Gk[k]
            Gm[k, :, K * nk:] = self.Ek[k]
        return jnp.asarray(self._flat_cone_rows(Gm))

    def flat_h(self):
        return jnp.asarray(
            self._flat_cone_rows(np.asarray(self.hk)[..., None])
            .reshape(-1))

    def flat_A(self):
        K, nk, n0, pk, p0 = self.K, self.nk, self.n0, self.pk, self.p0
        n = K * nk + n0
        Am = np.zeros((K * pk + p0, n))
        for k in range(K):
            Am[k * pk:(k + 1) * pk, k * nk:(k + 1) * nk] = self.Ak[k]
            Am[k * pk:(k + 1) * pk, K * nk:] = self.Ck[k]
        Am[K * pk:, K * nk:] = self.A0
        return jnp.asarray(Am)

    def flat_b(self):
        return jnp.concatenate([self.bk.reshape(-1), self.b0])

    @property
    def dims(self) -> ConeDims:
        return global_dims(self.dims_local, self.K)


def make_block_kktsolver(qp: BlockQP, mesh: Optional[Mesh] = None,
                         axis: str = "batch"):
    """conelp/coneqp-compatible custom kktsolver for a BlockQP.

    Per scenario k the condensed blocks are

        D_k = P_k + Gs_k'Gs_k          Gs_k = W_k^{-T} G_k
        U_k = Pc_k + Gs_k'Es_k         Es_k = W_k^{-T} E_k

    and the local saddle [[D_k, A_k'], [A_k, 0]] is eliminated with a
    Cholesky of D_k plus a Cholesky of M_k = A_k D_k^{-1} A_k'.  The
    reduced (n0+p0) system on the coupling variables is assembled with
    a `psum` over the scenario shards (ICI) and solved replicated.
    With `mesh`, the scenario axis (leading axis of every (K, ...)
    array) must be shardable over the mesh axis `axis`."""
    K, nk, n0 = qp.K, qp.nk, qp.n0
    pk, p0 = qp.pk, qp.p0
    dl = qp.dims_local

    def local_factor(Pk, Pc, Gk, Ek, Ak, Ck, Wk):
        Gs = _nt.scale_rows(Gk, Wk, dl, trans="T", inverse="I")
        Es = _nt.scale_rows(Ek, Wk, dl, trans="T", inverse="I")
        D = Pk + Gs.T @ Gs
        U = Pc + Gs.T @ Es
        L = jnp.linalg.cholesky(D)

        def Dinv(M):
            t = jsl.solve_triangular(L, M, lower=True)
            return jsl.solve_triangular(L.T, t, lower=False)

        if pk:
            DiAT = Dinv(Ak.T)                          # (nk, pk)
            Mk = Ak @ DiAT
            Lm = jnp.linalg.cholesky(Mk)

            def saddle(u, v):
                """[[D, A'],[A, 0]] [x; y] = [u; v]"""
                t = Dinv(u)
                rhs = Ak @ t - v
                w = jsl.solve_triangular(Lm, rhs, lower=True)
                y = jsl.solve_triangular(Lm.T, w, lower=False)
                x = t - DiAT @ y
                return x, y

            XU, YU = saddle(U, Ck)                     # affine-in-x0
            S_loc = U.T @ XU + Ck.T @ YU               # V' K^{-1} V
        else:
            XU = Dinv(U)
            YU = jnp.zeros((0, n0), U.dtype)
            S_loc = U.T @ XU
        E_loc = Es.T @ Es                              # (n0, n0)
        return dict(Gs=Gs, Es=Es, L=L, U=U, XU=XU, YU=YU,
                    S_loc=S_loc, E_loc=E_loc,
                    DiAT=(DiAT if pk else jnp.zeros((nk, 0), U.dtype)),
                    Lm=(Lm if pk else jnp.zeros((0, 0), U.dtype)))

    def local_saddle_apply(F, Ak, u, v):
        """Apply the factored local saddle inverse."""
        L = F["L"]
        t = jsl.solve_triangular(L, u, lower=True)
        t = jsl.solve_triangular(L.T, t, lower=False)
        if pk:
            rhs = Ak @ t - v
            w = jsl.solve_triangular(F["Lm"], rhs, lower=True)
            y = jsl.solve_triangular(F["Lm"].T, w, lower=False)
            x = t - F["DiAT"] @ y
        else:
            x, y = t, jnp.zeros((0,), u.dtype)
        return x, y

    def reduced_factor(P0, S_sum, E_sum):
        S0 = P0 + E_sum - S_sum                        # (n0, n0)
        if p0:
            # saddle [[S0, A0'], [A0, 0]]: S0 chol + Schur on A0
            L0 = jnp.linalg.cholesky(S0)

            def S0inv(M):
                t = jsl.solve_triangular(L0, M, lower=True)
                return jsl.solve_triangular(L0.T, t, lower=False)

            SiA0T = S0inv(qp.A0.T)
            M0 = qp.A0 @ SiA0T
            Lm0 = jnp.linalg.cholesky(M0)
            return (L0, SiA0T, Lm0)
        return (jnp.linalg.cholesky(S0), None, None)

    def reduced_solve(fac, r0, v0):
        L0, SiA0T, Lm0 = fac

        def S0inv(M):
            t = jsl.solve_triangular(L0, M, lower=True)
            return jsl.solve_triangular(L0.T, t, lower=False)

        if p0:
            t = S0inv(r0)
            rhs = qp.A0 @ t - v0
            w = jsl.solve_triangular(Lm0, rhs, lower=True)
            y0 = jsl.solve_triangular(Lm0.T, w, lower=False)
            x0 = t - SiA0T @ y0
        else:
            x0 = S0inv(r0)
            y0 = jnp.zeros((0,), r0.dtype)
        return x0, y0

    def kktsolver(W):
        Wk = split_w(W, dl, K)

        if mesh is None:
            F = jax.vmap(local_factor)(qp.Pk, qp.Pc, qp.Gk, qp.Ek,
                                       qp.Ak, qp.Ck, Wk)
            S_sum = jnp.sum(F["S_loc"], axis=0)
            E_sum = jnp.sum(F["E_loc"], axis=0)
            fac0 = reduced_factor(qp.P0, S_sum, E_sum)
        else:
            spec_k, spec_r = P(axis), P()

            def shard_factor(Pk, Pc, Gk, Ek, Ak, Ck, Wk):
                F = jax.vmap(local_factor)(Pk, Pc, Gk, Ek, Ak, Ck, Wk)
                S_sum = jax.lax.psum(jnp.sum(F["S_loc"], axis=0),
                                     axis_name=axis)
                E_sum = jax.lax.psum(jnp.sum(F["E_loc"], axis=0),
                                     axis_name=axis)
                return F, S_sum, E_sum

            F, S_sum, E_sum = shard_map(
                shard_factor, mesh=mesh,
                in_specs=(spec_k,) * 6 + (spec_k,),
                out_specs=(spec_k, spec_r, spec_r))(
                    qp.Pk, qp.Pc, qp.Gk, qp.Ek, qp.Ak, qp.Ck, Wk)
            fac0 = reduced_factor(qp.P0, S_sum, E_sum)

        def local_rhs(Gs_Es, Wk, bzk, bxk):
            Gs, Es = Gs_Es
            zs = _nt.scale(bzk, Wk, dl, trans="T", inverse="I")
            rk = bxk + Gs.T @ zs
            r0c = Es.T @ zs
            return rk, r0c, zs

        def solve(bx, by, bz):
            bxk = bx[:K * nk].reshape(K, nk)
            bx0 = bx[K * nk:]
            byk = by[:K * pk].reshape(K, pk)
            by0 = by[K * pk:]
            bzk = split_cone_vec(bz, dl, K)

            if mesh is None:
                rk, r0c, zs = jax.vmap(local_rhs)(
                    (F["Gs"], F["Es"]), Wk, bzk, bxk)
                xh, yh = jax.vmap(
                    lambda Fk, Ak_, u, v: local_saddle_apply(
                        Fk, Ak_, u, v))(F, qp.Ak, rk, byk)
                r0 = bx0 + jnp.sum(r0c, axis=0) - jnp.einsum(
                    "kij,ki->j", F["U"], xh)
                if pk:
                    r0 = r0 - jnp.einsum("kpj,kp->j", qp.Ck, yh)
                x0, y0 = reduced_solve(fac0, r0, by0)
                xk = xh - jnp.einsum("kij,j->ki", F["XU"], x0)
                yk = yh - jnp.einsum("kpj,j->kp", F["YU"], x0)
                Wuz_k = jax.vmap(
                    lambda Gk_, Ek_, Wk_, xk_, bz_: _nt.scale(
                        Gk_ @ xk_ + Ek_ @ x0 - bz_, Wk_, dl,
                        trans="T", inverse="I"))(
                    qp.Gk, qp.Ek, Wk, xk, bzk)
            else:
                spec_k, spec_r = P(axis), P()

                def shard_solve(F, Ak, Ck, Gk, Ek, Wk, bxk, byk, bzk,
                                bx0_, by0_):
                    rk, r0c, zs = jax.vmap(local_rhs)(
                        (F["Gs"], F["Es"]), Wk, bzk, bxk)
                    xh, yh = jax.vmap(
                        lambda Fk, Ak_, u, v: local_saddle_apply(
                            Fk, Ak_, u, v))(F, Ak, rk, byk)
                    r0_loc = jnp.sum(r0c, axis=0) - jnp.einsum(
                        "kij,ki->j", F["U"], xh)
                    if pk:
                        r0_loc = r0_loc - jnp.einsum(
                            "kpj,kp->j", Ck, yh)
                    r0 = bx0_ + jax.lax.psum(r0_loc, axis_name=axis)
                    x0, y0 = reduced_solve(fac0, r0, by0_)
                    xk = xh - jnp.einsum("kij,j->ki", F["XU"], x0)
                    yk = yh - jnp.einsum("kpj,j->kp", F["YU"], x0)
                    Wuz_k = jax.vmap(
                        lambda Gk_, Ek_, Wk_, xk_, bz_: _nt.scale(
                            Gk_ @ xk_ + Ek_ @ x0 - bz_, Wk_, dl,
                            trans="T", inverse="I"))(
                        Gk, Ek, Wk, xk, bzk)
                    return xk, yk, Wuz_k, x0, y0

                xk, yk, Wuz_k, x0, y0 = shard_map(
                    shard_solve, mesh=mesh,
                    in_specs=(spec_k,) * 9 + (spec_r, spec_r),
                    out_specs=(spec_k, spec_k, spec_k, spec_r,
                               spec_r))(
                        F, qp.Ak, qp.Ck, qp.Gk, qp.Ek, Wk,
                        bxk, byk, bzk, bx0, by0)

            ux = jnp.concatenate([xk.reshape(-1), x0])
            uy = jnp.concatenate([yk.reshape(-1), y0])
            Wuz = merge_cone_vec(Wuz_k, dl, K)
            return ux, uy, Wuz

        return solve

    return kktsolver


def random_block_qp(K, nk, n0, l=None, q=(), pk=2, p0=0, seed=0,
                    dtype=jnp.float64):
    """A random feasible BlockQP with local l+q cones and local
    equalities (well-conditioned; for tests and benchmarks)."""
    rng = np.random.default_rng(seed)
    l = nk if l is None else l
    dl = ConeDims(l=l, q=tuple(q))
    mk = dl.cdim
    Fk = rng.standard_normal((K, nk, nk)) / np.sqrt(nk)
    Pk = Fk @ Fk.transpose(0, 2, 1) + np.eye(nk)[None]
    Pc = 0.1 * rng.standard_normal((K, nk, n0))
    F0 = rng.standard_normal((n0, n0)) / np.sqrt(n0)
    P0 = F0 @ F0.T + (1.0 + 0.5 * K) * np.eye(n0)
    qk = 0.1 * rng.standard_normal((K, nk))
    q0 = 0.1 * rng.standard_normal(n0)
    # cone rows: l rows random, q rows random with feasible h
    Gk = 0.3 * rng.standard_normal((K, mk, nk))
    Ek = 0.1 * rng.standard_normal((K, mk, n0))
    # h = G*0 + E*0 + s0 with s0 strictly interior
    s0 = np.zeros((K, mk))
    s0[:, :l] = rng.uniform(0.5, 1.5, (K, l))
    off = l
    for m in dl.q:
        s0[:, off] = 2.0
        s0[:, off + 1:off + m] = 0.2 * rng.standard_normal(
            (K, m - 1))
        off += m
    hk = s0
    Ak = rng.standard_normal((K, pk, nk)) if pk else np.zeros(
        (K, 0, nk))
    Ck = 0.1 * rng.standard_normal((K, pk, n0)) if pk else np.zeros(
        (K, 0, n0))
    bk = (np.einsum("kpi,ki->kp", Ak, np.zeros((K, nk)))
          if pk else np.zeros((K, 0)))     # x = 0 feasible
    A0 = rng.standard_normal((p0, n0)) if p0 else np.zeros((0, n0))
    b0 = np.zeros(p0)
    c = lambda a: jnp.asarray(a, dtype=dtype)
    return BlockQP(Pk=c(Pk), Pc=c(Pc), P0=c(P0), qk=c(qk), q0=c(q0),
                   Gk=c(Gk), Ek=c(Ek), hk=c(hk), Ak=c(Ak), Ck=c(Ck),
                   bk=c(bk), A0=c(A0), b0=c(b0), dims_local=dl)
