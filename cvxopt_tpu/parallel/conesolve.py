"""Distributed cone-sharded coneqp: ONE large cone QP whose cone
blocks are sharded across the device mesh, solved by a Mehrotra
predictor-corrector loop that calls the cone-aware collectives
(parallel.collectives) at every global reduction.

Layout (the natural one — SURVEY.md §5.8): x, P, q are replicated;
G's rows, h, s, z are sharded so each device holds whole cone blocks
(`local_dims` describes one shard; all shards are congruent).  Under
this layout the NT scaling, Jordan algebra, and per-block eigen work
are embarrassingly local; the IPM outer loop needs exactly
  * psdot   — duality gap, ds'dz, dual objective correction,
  * psnrm2  — primal residual norm,
  * pmax    — global step length from per-shard max_step,
  * psum    — KKT normal-equations assembly  S = P + Σ_k Gs_k' Gs_k
              and the rhs reduction Σ_k G_k' zs_k,
one or two scalars / one (n, n) psum per iteration, all riding ICI.

The per-iteration math mirrors coneqp (coneprog.py:1440-2547) —
see cvxopt_tpu.coneqp._coneqp_solve for the single-device twin; this
module is the `shard_map` port of its iteration with reductions made
explicit.  Supports 'l'/'q'/'s' blocks per shard (everything blockwise
is local) and, with ``p > 0``, equality constraints A x = b (A, b
replicated — equalities couple x globally, so after the S psum the
saddle elimination uy = (A S^{-1} A')^{-1} (A S^{-1} r - by) is pure
replicated-local work; the same elimination as coneqp's kkt_chol,
coneprog.py:1980-2041).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P_
from jax.experimental.shard_map import shard_map

from cvxopt_tpu import cones
from cvxopt_tpu import scaling as nt
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.ops.matvec import mv, mvt
from cvxopt_tpu.parallel import collectives as coll
from cvxopt_tpu.conelp import (
    STATUS_RUNNING, STATUS_OPTIMAL, STATUS_UNKNOWN_MAXITERS,
    STEP, EXPON,
)


def make_coneqp_sharded(local_dims: ConeDims, mesh, axis: str = "cone",
                        maxiters: int = 50, abstol: float = 1e-7,
                        reltol: float = 1e-6, feastol: float = 1e-7,
                        refinement: int = 1):
    """Build the sharded solver: f(P, q, G, h[, A, b]) -> result dict.
    G (m, n) and h (m,) are sharded on the cone axis (m = n_shards *
    local_dims.cdim); P (n, n), q (n,) — and the optional equality
    pair A (p, n), b (p,) — replicated."""
    ldims = local_dims

    def local_step(P, q, G_loc, h_loc, A, b):
        n = q.shape[0]
        p = A.shape[0]
        dtype = q.dtype
        e = cones.cone_identity(ldims, dtype=dtype)

        resx0 = jnp.maximum(1.0, jnp.linalg.norm(q))
        resy0 = jnp.maximum(1.0, jnp.linalg.norm(b))
        resz0 = jnp.maximum(
            1.0, jnp.sqrt(jnp.maximum(coll.psum(
                cones.sdot(h_loc, h_loc, ldims), axis), 0.0)))

        def kkt_factor(W):
            Gsl = nt.scale_rows(G_loc, W, ldims, trans="T",
                                inverse="I")
            S = P + coll.psum(Gsl.T @ Gsl, axis)
            L = jnp.linalg.cholesky(S)
            if p:
                # replicated saddle elimination for A x = b: S^{-1}A'
                # and the (p, p) Schur complement A S^{-1} A'
                w1 = jsl.solve_triangular(L, A.T, lower=True)
                SinvAt = jsl.solve_triangular(L.T, w1, lower=False)
                Lp = jnp.linalg.cholesky(A @ SinvAt)
            else:
                SinvAt = Lp = None

            def solve(bx, by, bz_loc):
                zs = nt.scale_w2inv(bz_loc, W, ldims)
                r = bx + coll.psum(mvt(G_loc, zs), axis)
                w = jsl.solve_triangular(L, r, lower=True)
                ux = jsl.solve_triangular(L.T, w, lower=False)
                if p:
                    rhs = mv(A, ux) - by
                    t1 = jsl.solve_triangular(Lp, rhs, lower=True)
                    uy = jsl.solve_triangular(Lp.T, t1, lower=False)
                    ux = ux - SinvAt @ uy
                else:
                    uy = by
                Wuz = nt.scale(mv(G_loc, ux) - bz_loc, W, ldims,
                               trans="T", inverse="I")
                return ux, uy, Wuz

            return solve

        # ---- cold start (coneprog.py:2044-2149) ----------------------
        f0 = kkt_factor(nt.identity_scaling(ldims, dtype=dtype))
        xc, yc, zc = f0(-q, b, h_loc)
        sc = -zc
        nrms = jnp.sqrt(jnp.maximum(coll.psum(
            cones.sdot(sc, sc, ldims), axis), 0.0))
        ts0 = coll.pmax(cones.max_step(sc, ldims), axis)
        sc = jnp.where(ts0 >= -1e-8 * jnp.maximum(nrms, 1.0),
                       sc + (1.0 + ts0) * e, sc)
        nrmz = jnp.sqrt(jnp.maximum(coll.psum(
            cones.sdot(zc, zc, ldims), axis), 0.0))
        tz0 = coll.pmax(cones.max_step(zc, ldims), axis)
        zc = jnp.where(tz0 >= -1e-8 * jnp.maximum(nrmz, 1.0),
                       zc + (1.0 + tz0) * e, zc)
        x, y, s, z = xc, yc, sc, zc
        W, lmbda = nt.compute_scaling(s, z, ldims)
        gap = coll.psdot(s, z, ldims, axis)

        cdim_diag_g = ldims.cdim_diag * mesh.shape[axis]
        e_lq = e[:ldims.lnl + ldims.qdim]

        def iteration(x, y, s, z, W, lmbda, gap, rx, ry, rz):
            lmbdasq = cones.ssqr(lmbda, ldims)
            f3 = kkt_factor(W)

            def f4_no_ir(bx, by, bz, bs):
                us = cones.sinv(bs, lmbda, ldims)
                uz = bz - nt.scale(us, W, ldims, trans="T")
                ux, uy, uz2 = f3(bx, by, uz)
                us2 = us - uz2
                return ux, uy, uz2, us2

            def resid4(ux, uy, uz, us, vx, vy, vz, vs):
                wz3 = nt.scale(uz, W, ldims, inverse="I")
                vx = vx - mv(P, ux) - mvt(A, uy) \
                    - coll.psum(mvt(G_loc, wz3), axis)
                vy = vy - mv(A, ux)
                vz = vz - mv(G_loc, ux) - nt.scale(us, W, ldims,
                                                   trans="T")
                vs = vs - cones.sprod_diag(us + uz, lmbda, ldims)
                return vx, vy, vz, vs

            def f4(bx, by, bz, bs):
                u = f4_no_ir(bx, by, bz, bs)
                for _ in range(refinement):
                    v = resid4(*u, bx, by, bz, bs)
                    du = f4_no_ir(*v)
                    u = tuple(a + d for a, d in zip(u, du))
                return u

            mu = gap / cdim_diag_g
            lmbdasq_full = cones.diag_embed(lmbdasq, ldims)

            # predictor
            dx, dy, dz, ds = f4(-rx, -ry, -rz, -lmbdasq_full)
            dsdz = coll.psdot(ds, dz, ldims, axis)
            ws3 = cones.sprod(ds, dz, ldims)
            ds_sc = nt.scale2(lmbda, ds, ldims)
            dz_sc = nt.scale2(lmbda, dz, ldims)
            t = jnp.maximum(jnp.maximum(
                coll.pmax_step(ds_sc, ldims, axis),
                coll.pmax_step(dz_sc, ldims, axis)), 0.0)
            step = jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, 1.0 / t))
            sigma = jnp.minimum(1.0, jnp.maximum(
                0.0, 1.0 - step + dsdz / gap * step ** 2)) ** EXPON

            # corrector
            ds_in = -lmbdasq_full + sigma * mu * e - ws3
            dx, dy, dz, ds = f4(-rx, -ry, -rz, ds_in)
            ds_sc = nt.scale2(lmbda, ds, ldims)
            dz_sc = nt.scale2(lmbda, dz, ldims)
            ts, sigs, ds_q = cones.max_step_eig(ds_sc, ldims)
            tz, sigz, dz_q = cones.max_step_eig(dz_sc, ldims)
            t = jnp.maximum(jnp.maximum(coll.pmax(ts, axis),
                                        coll.pmax(tz, axis)), 0.0)
            step = jnp.where(t == 0.0, 1.0,
                             jnp.minimum(1.0, STEP / t))

            x = x + step * dx
            y = y + step * dy
            nlq = ldims.lnl + ldims.qdim
            ds2 = ds_q.at[:nlq].set(e_lq + step * ds_q[:nlq])
            dz2 = dz_q.at[:nlq].set(e_lq + step * dz_q[:nlq])
            ds2 = nt.scale2(lmbda, ds2, ldims, inverse="I")
            dz2 = nt.scale2(lmbda, dz2, ldims, inverse="I")
            if ldims.s:
                lam_s = lmbda[nlq:]
                sig_s = (1.0 + step * sigs) / lam_s
                sig_z = (1.0 + step * sigz) / lam_s
                for run in ldims.s_runs:
                    off, doff, cnt, m = run
                    i0 = doff - nlq
                    cs = jnp.sqrt(
                        sig_s[i0:i0 + cnt * m]).reshape(cnt, m)
                    cz = jnp.sqrt(
                        sig_z[i0:i0 + cnt * m]).reshape(cnt, m)
                    Vs = cones.sview(ds2, run) * cs[..., None, :]
                    Vz = cones.sview(dz2, run) * cz[..., None, :]
                    ds2 = ds2.at[off:off + cnt * m * m].set(
                        Vs.reshape(-1))
                    dz2 = dz2.at[off:off + cnt * m * m].set(
                        Vz.reshape(-1))
            W2, lmbda2 = nt.update_scaling(W, lmbda, ds2, dz2, ldims)
            lam_full = cones.diag_embed(lmbda2, ldims)
            s2 = nt.scale(lam_full, W2, ldims, trans="T")
            z2 = nt.scale(lam_full, W2, ldims, inverse="I")
            gap2 = coll.psum(jnp.sum(lmbda2 * lmbda2), axis)
            return x, y, s2, z2, W2, lmbda2, gap2

        def body(st):
            x, y, s, z, W, lmbda, gap, it, status, out = st
            # residuals (coneprog.py:2167-2234)
            rx = mv(P, x) + q + mvt(A, y) \
                + coll.psum(mvt(G_loc, z), axis)
            ry = mv(A, x) - b
            rz = s + mv(G_loc, x) - h_loc
            pcost = 0.5 * jnp.dot(x, mv(P, x)) + jnp.dot(q, x)
            dcost = pcost + jnp.dot(y, ry) \
                + coll.psdot(z, rz, ldims, axis) - gap
            relgap = jnp.where(
                pcost < 0.0, gap / -pcost,
                jnp.where(dcost > 0.0, gap / dcost, jnp.inf))
            pres = jnp.maximum(coll.psnrm2(rz, ldims, axis) / resz0,
                               jnp.linalg.norm(ry) / resy0)
            dres = jnp.linalg.norm(rx) / resx0
            done = (pres <= feastol) & (dres <= feastol) & \
                   ((gap <= abstol) | (relgap <= reltol))
            status = jnp.where(
                done, STATUS_OPTIMAL,
                jnp.where(it >= maxiters, STATUS_UNKNOWN_MAXITERS,
                          STATUS_RUNNING)).astype(jnp.int32)
            out = dict(pcost=pcost, dcost=dcost, relgap=relgap,
                       pres=pres, dres=dres)
            running = status == STATUS_RUNNING
            x2, y2, s2, z2, W2, lmbda2, gap2 = iteration(
                x, y, s, z, W, lmbda, gap, rx, ry, rz)
            sel = lambda a, b_: jnp.where(running, b_, a)
            x = sel(x, x2)
            y = sel(y, y2)
            s = sel(s, s2)
            z = sel(z, z2)
            W = jax.tree_util.tree_map(sel, W, W2)
            lmbda = sel(lmbda, lmbda2)
            gap = sel(gap, gap2)
            it = it + jnp.where(running, 1, 0).astype(jnp.int32)
            return x, y, s, z, W, lmbda, gap, it, status, out

        def cond(st):
            return st[8] == STATUS_RUNNING

        out0 = dict(pcost=jnp.nan, dcost=jnp.nan, relgap=jnp.nan,
                    pres=jnp.nan, dres=jnp.nan)
        out0 = {k: jnp.asarray(v, dtype) for k, v in out0.items()}
        st = (x, y, s, z, W, lmbda, gap, jnp.asarray(0, jnp.int32),
              jnp.asarray(STATUS_RUNNING, jnp.int32), out0)
        st = lax.while_loop(cond, body, st)
        x, y, s, z, _, _, gap, it, status, out = st
        return dict(x=x, y=y, s=s, z=z, gap=gap, iterations=it,
                    status=status, **out)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P_(None, None), P_(None), P_(axis, None), P_(axis),
                  P_(None, None), P_(None)),
        out_specs=dict(x=P_(None), y=P_(None), s=P_(axis), z=P_(axis),
                       gap=P_(), iterations=P_(), status=P_(),
                       pcost=P_(), dcost=P_(), relgap=P_(),
                       pres=P_(), dres=P_()))
    jfn = jax.jit(fn)

    def solve(P, q, G, h, A=None, b=None):
        if A is None:
            n = q.shape[0]
            A = jnp.zeros((0, n), q.dtype)
            b = jnp.zeros((0,), q.dtype)
        return jfn(P, q, G, h, A, b)

    return solve
