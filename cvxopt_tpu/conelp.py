"""conelp — cone LP solver via homogeneous self-dual embedding.

TPU-native re-design of the reference solver
/root/reference/src/python/coneprog.py:31-1437 (`cvxopt.solvers.conelp`):
a Mehrotra predictor-corrector primal-dual interior-point method on the
homogeneous self-dual embedding with (tau, kappa), Nesterov-Todd
scaling, optional iterative refinement of the 6-variable Newton system,
and self-dual certificates of primal/dual infeasibility.

Solves
    minimize    c'x
    subject to  G x + s = h,  A x = b,  s >= 0 (wrt the cone)

Architecture differences from the reference (deliberate, TPU-first):
  - the whole solve is ONE jit-compiled XLA computation: the iteration
    is a `lax.while_loop` whose carry holds (x, y, s, z, tau, kappa, W,
    lambda, ...), so it can be `vmap`-batched over thousands of problem
    instances and sharded over a device mesh;
  - exceptions (singular KKT, coneprog.py:1078-1109) become NaN
    detection + a status code in the carry;
  - per-cone-block loops become run-stacked batched ops (cones.py);
  - LAPACK factorizations become XLA/Pallas batched factorizations
    (kkt.py).

Advanced API (coneprog.py:286-402 customization levels):
  - `G`/`A` may be `linops.LinearOperator`s instead of matrices
    (requires a custom kktsolver, as in the reference);
  - `kktsolver` may be a callable ``kktsolver(W) -> solve`` with
    ``solve(bx, by, bz) -> (ux, uy, W uz)`` — the same 3x3 contract as
    misc.py:1069-1071, as pure JAX functions.  W is the run-stacked
    scaling dict (see scaling.py);
  - `primalstart` / `dualstart` warm starts (coneprog.py:107-118).

Status codes: 0 optimal, 1 primal infeasible, 2 dual infeasible,
3 unknown (maxiters), 4 unknown (singular KKT).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from cvxopt_tpu import cones
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import scaling as nt
from cvxopt_tpu import kkt as kktmod
import numpy as np

from cvxopt_tpu.linops import LinearOperator
from cvxopt_tpu.ops.matvec import mv, mvt

STATUS_RUNNING = -1
STATUS_OPTIMAL = 0
STATUS_PRIMAL_INFEASIBLE = 1
STATUS_DUAL_INFEASIBLE = 2
STATUS_UNKNOWN_MAXITERS = 3
STATUS_UNKNOWN_SINGULAR = 4
# internal only: instance handed from the mixed-precision phase to the
# full-precision rescue phase (never escapes the solver)
STATUS_NEEDS_F64 = 5
# internal only: the stall detector fired with `stall_exit` set — the
# host refresh loop (make_conelp_refresh) restarts from this iterate
# with a freshly computed scaling
STATUS_STALLED = 6

# mixed-precision rescue triggers (per instance, all outcome-based so
# clean instances never false-positive):
#  - RESCUE_STALL_ITERS consecutive non-improving iterations (backstop);
#  - the convergence measure regressing by >100x from its best (a
#    corrupted step escaped the refinement);
#  - gap collapsed below abstol while residuals are >10x feastol (the
#    instance is at the boundary and cannot recover);
#  - a refinement round EXPANDING the residual (relres > RESCUE_RELRES
#    = 1: refinement diverges — the step is discarded outright).
# Flagged instances restart from the initial point in the f64 phase.
RESCUE_STALL_ITERS = 4
RESCUE_RELRES = 1.0

STATUS_STRINGS = {
    STATUS_OPTIMAL: "optimal",
    STATUS_PRIMAL_INFEASIBLE: "primal infeasible",
    STATUS_DUAL_INFEASIBLE: "dual infeasible",
    STATUS_UNKNOWN_MAXITERS: "unknown",
    STATUS_UNKNOWN_SINGULAR: "unknown",
    STATUS_STALLED: "unknown",
}

# STEP and EXPON constants (coneprog.py:423-424)
STEP = 0.99
EXPON = 3


# ---- pytree vector-space helpers -------------------------------------
#
# The reference's level-3 customization lets users supply alternative
# vector spaces for x and y via xnewcopy/xdot/xaxpy/xscal callbacks
# (coneprog.py:286-402).  The TPU-native equivalent: x and y may be
# ARBITRARY PYTREES — all solver arithmetic on them goes through these
# tree helpers, which reduce to plain array ops for array-valued x/y.

def _tdot(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    out = 0.0
    for u, v in zip(la, lb):
        out = out + jnp.sum(u * v)
    return out


def _tnorm(a):
    return jnp.sqrt(jnp.maximum(_tdot(a, a), 0.0))


def _tzeros(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def _tneg(a):
    return jax.tree_util.tree_map(jnp.negative, a)


def _tscale(alpha, a):
    return jax.tree_util.tree_map(lambda u: alpha * u, a)


def _taxpy(alpha, a, b):
    """b + alpha * a (tree)."""
    return jax.tree_util.tree_map(lambda u, v: v + alpha * u, a, b)


def _tsub(a, b):
    return jax.tree_util.tree_map(lambda u, v: u - v, a, b)


def _tnorm_parts(parts):
    """sqrt(sum of squared 2-norms) over a tuple of pytrees."""
    t = 0.0
    for pt in parts:
        t = t + _tdot(pt, pt)
    return jnp.sqrt(jnp.maximum(t, 0.0))


def _tadd(a, b):
    return jax.tree_util.tree_map(lambda u, v: u + v, a, b)


def _conelp_solve(dims: ConeDims, *, factor, Gf, GTf, Af, ATf, c, h, b,
                  n, p, dtype, maxiters, abstol, reltol, feastol,
                  refinement, show_progress, primalstart=None,
                  dualstart=None, factor64=None, relres_trigger=True,
                  detect_rescue=False, stall_exit=None, debug=False):
    """The conelp algorithm with all linear maps abstracted as closures
    (coneprog.py:31-1437).  Pure; call inside jit."""
    e = cones.cone_identity(dims, dtype=dtype)
    e_lq = e[:dims.lnl + dims.qdim]

    resx0 = jnp.maximum(1.0, _tnorm(c))
    resy0 = jnp.maximum(1.0, _tnorm(b))
    resz0 = jnp.maximum(1.0, cones.snrm2(h, dims))

    # ---- initial points (coneprog.py:662-845) ------------------------
    # the cold point is also computed when a restart phase exists
    # (factor64): restarts must be COLD — restarting from warm starts
    # re-enters the warm-start pathology (see coneqp._coneqp_solve)
    cold = None
    warm = primalstart is not None and dualstart is not None
    if not warm or factor64 is not None or detect_rescue:
        Wid = nt.identity_scaling(dims, dtype=dtype)
        f0 = factor(Wid)
        # solve [0 A' G'; A 0 0; G 0 -I][x;dy;-s] = [0;b;h]
        xc, _, ms = f0(_tzeros(c), b, h)
        sc = -ms
        nrms = cones.snrm2(sc, dims)
        ts = cones.max_step(sc, dims)
        sc = jnp.where(ts >= -1e-8 * jnp.maximum(nrms, 1.0),
                       sc + (1.0 + ts) * e, sc)
        # solve [...][dx;y;z] = [-c;0;0]
        _, yc, zc = f0(_tneg(c), _tzeros(b),
                       jnp.zeros(dims.cdim, dtype))
        nrmz = cones.snrm2(zc, dims)
        tz = cones.max_step(zc, dims)
        zc = jnp.where(tz >= -1e-8 * jnp.maximum(nrmz, 1.0),
                       zc + (1.0 + tz) * e, zc)
        cold = (xc, yc, sc, zc)

    if primalstart is None:
        x, s = cold[0], cold[2]
    else:
        x = primalstart["x"]
        s = jnp.asarray(primalstart["s"], dtype=dtype)

    if dualstart is None:
        y, z = cold[1], cold[3]
    else:
        y = dualstart.get("y", _tzeros(b))
        z = jnp.asarray(dualstart["z"], dtype=dtype)

    if warm and cold is not None:
        # per-instance warm-start validation (vmap-safe select): a
        # non-finite or non-interior handoff would NaN compute_scaling
        tsz_w = cones.max_step(jnp.stack([s, z]), dims)
        valid = (jnp.isfinite(_tdot(x, x)) & jnp.isfinite(jnp.sum(y))
                 & (tsz_w[0] < 0) & (tsz_w[1] < 0))
        x = jax.tree_util.tree_map(
            lambda w, cl: jnp.where(valid, w, cl), x, cold[0])
        y = jax.tree_util.tree_map(
            lambda w, cl: jnp.where(valid, w, cl), y, cold[1])
        s = jnp.where(valid, s, cold[2])
        z = jnp.where(valid, z, cold[3])

    tau = jnp.asarray(1.0, dtype)
    kappa = jnp.asarray(1.0, dtype)
    W, lmbda = nt.compute_scaling(s, z, dims)
    dg = jnp.asarray(1.0, dtype)     # sqrt(kappa/tau)
    lg = jnp.asarray(1.0, dtype)     # lambda_g = sqrt(tau*kappa)
    gap = cones.sdot(s, z, dims)

    nan = jnp.asarray(jnp.nan, dtype)

    def _mkstate(x_, y_, s_, z_):
        W_, lmbda_ = nt.compute_scaling(s_, z_, dims)
        return dict(
            x=x_, y=y_, s=s_, z=z_, tau=jnp.asarray(1.0, dtype),
            kappa=jnp.asarray(1.0, dtype), W=W_, lmbda=lmbda_,
            dg=jnp.asarray(1.0, dtype), lg=jnp.asarray(1.0, dtype),
            gap=cones.sdot(s_, z_, dims),
            iters=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(STATUS_RUNNING, jnp.int32),
            pcost=nan, dcost=nan, relgap=nan, pres=nan, dres=nan,
            pinfres=nan, dinfres=nan, cx=nan, by=nan, hz=nan,
            best_m=jnp.asarray(jnp.inf, dtype),
            stall=jnp.asarray(0, jnp.int32),
            max_it=jnp.asarray(maxiters, jnp.int32),
        )

    state = dict(
        x=x, y=y, s=s, z=z, tau=tau, kappa=kappa, W=W, lmbda=lmbda,
        dg=dg, lg=lg, gap=gap,
        iters=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(STATUS_RUNNING, jnp.int32),
        pcost=nan, dcost=nan, relgap=nan, pres=nan, dres=nan,
        pinfres=nan, dinfres=nan, cx=nan, by=nan, hz=nan,
        best_m=jnp.asarray(jnp.inf, dtype),
        stall=jnp.asarray(0, jnp.int32),
        max_it=jnp.asarray(maxiters, jnp.int32),
    )
    # restart phases must restore the COLD point, not the warm one
    state0 = _mkstate(*cold) if (warm and cold is not None) else state

    def _iteration(fW, x, y, s, z, tau, kappa, W, lmbda, dg, lg,
                   rx, ry, rz, rt):
        dgi = 1.0 / dg
        lmbdasq = cones.ssqr(lmbda, dims)
        lgsq = lg * lg

        f3 = fW(W)

        # (x1, y1, z1) = dgi * K^{-1} (-c, b, h)  (coneprog.py:1071)
        x1, y1, z1 = f3(_tneg(c), b, h)
        x1, y1, z1 = _tscale(dgi, x1), _tscale(dgi, y1), dgi * z1
        th = nt.scale(h, W, dims, trans="T", inverse="I")
        z1z1 = cones.sdot(z1, z1, dims)

        def f6_no_ir(bx, by_, bz, btau, bs, bkappa):
            # (coneprog.py:1130-1196)
            uy = _tneg(by_)
            us = -cones.sinv(bs, lmbda, dims)
            uz = -(bz + nt.scale(us, W, dims, trans="T"))
            ux, uy, uz = f3(bx, uy, uz)
            ukappa = -bkappa / lg
            utau = btau + ukappa / dgi
            utau = dgi * (utau + _tdot(c, ux) + _tdot(b, uy)
                          + cones.sdot(th, uz, dims)) / (1.0 + z1z1)
            ux = _taxpy(utau, x1, ux)
            uy = _taxpy(utau, y1, uy)
            uz = uz + utau * z1
            us = us - uz
            ukappa = ukappa - utau
            return ux, uy, uz, utau, us, ukappa

        def resid6(ux, uy, uz, utau, us, ukappa,
                   vx, vy, vz, vtau, vs, vkappa):
            # residual of the 6-var system (coneprog.py:599-631)
            wz3 = nt.scale(uz, W, dims, inverse="I")
            vx = _taxpy(-(utau / dg), c,
                        _tsub(_tsub(vx, ATf(uy)), GTf(wz3)))
            vy = _taxpy(-(utau / dg), b, _tadd(vy, Af(ux)))
            ws3_ = nt.scale(us, W, dims, trans="T")
            vz = vz + Gf(ux) - h * (utau / dg) + ws3_
            vtau = vtau + dg * ukappa + _tdot(c, ux) \
                + _tdot(b, uy) + cones.sdot(h, wz3, dims)
            vs = vs + cones.sprod_diag(us + uz, lmbda, dims)
            vkappa = vkappa + lg * (utau + ukappa)
            return vx, vy, vz, vtau, vs, vkappa

        def f6(bx, by_, bz, btau, bs, bkappa):
            u = f6_no_ir(bx, by_, bz, btau, bs, bkappa)
            relres = jnp.asarray(0.0, dtype)

            def round_(carry):
                u, _ = carry
                v = resid6(*u, bx, by_, bz, btau, bs, bkappa)
                # contraction of one solve round: the mixed-precision
                # failure detector (RESCUE_RELRES)
                rr = _tnorm_parts(v) / jnp.maximum(
                    _tnorm_parts((bx, by_, bz, btau, bs, bkappa)),
                    1e-30)
                du = f6_no_ir(*v)
                return tuple(jax.tree_util.tree_map(
                    lambda a_, d_: a_ + d_, a, d)
                    for a, d in zip(u, du)), rr

            if refinement <= 1:
                for _ in range(refinement):
                    u, relres = round_((u, relres))
            else:
                # fori_loop keeps the refinement body (a full KKT
                # solve) in the program ONCE instead of nref times
                u, relres = lax.fori_loop(
                    0, refinement, lambda i, c: round_(c),
                    (u, relres))
            return u, relres

        mu = jnp.sum(lmbda * lmbda) + lgsq
        mu = mu / (1 + dims.cdim_diag)

        lmbdasq_full = cones.diag_embed(lmbdasq, dims)

        # ---- predictor (i=0, coneprog.py:1250-1333) ------------------
        ds_in = lmbdasq_full
        dk_in = lgsq
        (dx, dy, dz, dtau, ds, dkappa), rr1 = f6(rx, ry, rz, rt,
                                                 ds_in, dk_in)
        ws3 = cones.sprod(ds, dz, dims)
        wkappa3 = dtau * dkappa
        ds_sc = nt.scale2(lmbda, ds, dims)
        dz_sc = nt.scale2(lmbda, dz, dims)
        # one stacked call: a single eigh instance covers both cone
        # vectors (compile + runtime: the 's' eigh is the hot op)
        tsz = cones.max_step(jnp.stack([ds_sc, dz_sc]), dims)
        ts, tz = tsz[0], tsz[1]
        tt = -dtau / lg
        tk = -dkappa / lg
        t = jnp.maximum(
            jnp.maximum(jnp.maximum(ts, tz), jnp.maximum(tt, tk)), 0.0)
        step = jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, 1.0 / t))
        sigma = (1.0 - step) ** EXPON

        # ---- corrector (i=1) -----------------------------------------
        ds_in = lmbdasq_full + ws3 - sigma * mu * e
        dk_in = lgsq + wkappa3 - sigma * mu
        (dx, dy, dz, dtau, ds, dkappa), rr2 = f6(
            _tscale(1.0 - sigma, rx), _tscale(1.0 - sigma, ry),
            (1.0 - sigma) * rz, (1.0 - sigma) * rt, ds_in, dk_in)
        ds_sc = nt.scale2(lmbda, ds, dims)
        dz_sc = nt.scale2(lmbda, dz, dims)
        tsz, sig2, dq2 = cones.max_step_eig(
            jnp.stack([ds_sc, dz_sc]), dims)
        ts, tz = tsz[0], tsz[1]
        sigs, sigz = sig2[0], sig2[1]
        ds_q, dz_q = dq2[0], dq2[1]
        tt = -dtau / lg
        tk = -dkappa / lg
        t = jnp.maximum(
            jnp.maximum(jnp.maximum(ts, tz), jnp.maximum(tt, tk)), 0.0)
        step = jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, STEP / t))

        # ---- update (coneprog.py:1336-1436) --------------------------
        x = _taxpy(step, dx, x)
        y = _taxpy(step, dy, y)

        nlq = dims.lnl + dims.qdim
        ds2 = ds_q.at[:nlq].set(e_lq + step * ds_q[:nlq])
        dz2 = dz_q.at[:nlq].set(e_lq + step * dz_q[:nlq])
        ds2 = nt.scale2(lmbda, ds2, dims, inverse="I")
        dz2 = nt.scale2(lmbda, dz2, dims, inverse="I")

        if dims.s:
            lam_s = lmbda[nlq:]
            sig_s = (1.0 + step * sigs) / lam_s
            sig_z = (1.0 + step * sigz) / lam_s
            for run in dims.s_runs:
                off, doff, cnt, m = run
                i0 = doff - nlq
                cs = jnp.sqrt(sig_s[i0:i0 + cnt * m]).reshape(cnt, m)
                cz = jnp.sqrt(sig_z[i0:i0 + cnt * m]).reshape(cnt, m)
                Vs = cones.sview(ds2, run) * cs[..., None, :]
                Vz = cones.sview(dz2, run) * cz[..., None, :]
                ds2 = ds2.at[off:off + cnt * m * m].set(Vs.reshape(-1))
                dz2 = dz2.at[off:off + cnt * m * m].set(Vz.reshape(-1))

        W2, lmbda2 = nt.update_scaling(W, lmbda, ds2, dz2, dims)

        dg2 = dg * jnp.sqrt(1.0 - step * tk) / jnp.sqrt(1.0 - step * tt)
        dgi2 = 1.0 / dg2
        lg2 = lg * jnp.sqrt(1.0 - step * tt) * jnp.sqrt(1.0 - step * tk)

        # unscale s, z from lambda (coneprog.py:1413-1433)
        lam_full = cones.diag_embed(lmbda2, dims)
        s2 = nt.scale(lam_full, W2, dims, trans="T")
        z2 = nt.scale(lam_full, W2, dims, inverse="I")

        kappa2 = lg2 / dgi2
        tau2 = lg2 * dgi2
        gap2 = (jnp.linalg.norm(lmbda2) / tau2) ** 2
        return (x, y, s2, z2, tau2, kappa2, W2, lmbda2, dg2, lg2, gap2,
                jnp.maximum(rr1, rr2))

    def cond(st):
        return st["status"] == STATUS_RUNNING

    def make_body(fW, rescue):
        def body(st):
            return _body(st, fW, rescue)
        return body

    def _body(st, fW, rescue):
        x, y, s, z = st["x"], st["y"], st["s"], st["z"]
        tau, kappa = st["tau"], st["kappa"]
        W, lmbda = st["W"], st["lmbda"]
        dg, lg, gap = st["dg"], st["lg"], st["gap"]
        iters = st["iters"]

        # ---- residuals (coneprog.py:861-915) -------------------------
        hrx = _tneg(_tadd(ATf(y), GTf(z)))
        hresx = _tnorm(hrx)
        rx = _taxpy(-tau, c, hrx)
        resx = _tnorm(rx) / tau
        hry = Af(x)
        hresy = _tnorm(hry)
        ry = _taxpy(-tau, b, hry)
        resy = _tnorm(ry) / tau
        hrz = Gf(x) + s
        hresz = cones.snrm2(hrz, dims)
        rz = hrz - h * tau
        resz = cones.snrm2(rz, dims) / tau
        cx = _tdot(c, x)
        by = _tdot(b, y)
        hz = cones.sdot(h, z, dims)
        rt = kappa + cx + by + hz

        pcost = cx / tau
        dcost = -(by + hz) / tau
        inf = jnp.asarray(jnp.inf, dtype)
        relgap = jnp.where(
            pcost < 0.0, gap / -pcost,
            jnp.where(dcost > 0.0, gap / dcost, inf))
        pres = jnp.maximum(resy / resy0, resz / resz0)
        dres = resx / resx0
        pinfres = jnp.where(hz + by < 0.0,
                            hresx / resx0 / (-hz - by), inf)
        dinfres = jnp.where(
            cx < 0.0,
            jnp.maximum(hresy / resy0, hresz / resz0) / (-cx), inf)

        if show_progress:
            jax.debug.print(
                "{i:2d}: {pc: 8.4e} {dc: 8.4e} {g: 4.0e} {pr:7.0e} "
                "{dr:7.0e} {kt:7.0e}",
                i=iters, pc=pcost, dc=dcost, g=gap, pr=pres, dr=dres,
                kt=kappa / tau)

        # ---- exit tests (coneprog.py:925-1023) -----------------------
        optimal = ((pres <= feastol) & (dres <= feastol)
                   & ((gap <= abstol) | (relgap <= reltol)))
        maxed = iters >= st["max_it"]
        pinf = pinfres <= feastol
        dinf = dinfres <= feastol

        # per-instance failure detectors (mixed-precision phase only);
        # see coneqp._body — certificates count as progress too
        m = jnp.maximum(jnp.maximum(pres, dres) / feastol,
                        jnp.minimum(gap / abstol, relgap / reltol))
        m = jnp.minimum(m, jnp.minimum(pinfres, dinfres) / feastol)
        improved = m < 0.995 * st["best_m"]
        stall2 = jnp.where(improved, 0, st["stall"] + 1).astype(jnp.int32)
        best2 = jnp.minimum(st["best_m"], m)
        if rescue:
            collapse = (gap <= abstol) & (m > 10.0)
            regressed = m > 100.0 * st["best_m"]
            stalled = ((stall2 >= RESCUE_STALL_ITERS) | collapse
                       | regressed)
            stall_status = STATUS_NEEDS_F64
        elif stall_exit is not None:
            # trigger-driven refresh (make_conelp_refresh): hand the
            # current iterate back to the host loop when the measured
            # convergence stalls, instead of an open-loop segment
            collapse = (gap <= abstol) & (m > 10.0)
            stalled = (stall2 >= stall_exit) | collapse
            stall_status = STATUS_STALLED
        else:
            stalled = False
            stall_status = STATUS_NEEDS_F64

        new_status = jnp.where(
            optimal, STATUS_OPTIMAL,
            jnp.where(maxed, STATUS_UNKNOWN_MAXITERS,
                      jnp.where(pinf, STATUS_PRIMAL_INFEASIBLE,
                                jnp.where(dinf, STATUS_DUAL_INFEASIBLE,
                                          jnp.where(stalled,
                                                    stall_status,
                                                    STATUS_RUNNING)))))
        new_status = new_status.astype(jnp.int32)
        exiting = new_status != STATUS_RUNNING

        stats = dict(pcost=pcost, dcost=dcost, relgap=relgap,
                     pres=pres, dres=dres, pinfres=pinfres,
                     dinfres=dinfres, cx=cx, by=by, hz=hz)

        # one IPM step (runs unconditionally; discarded when exiting —
        # under vmap this is the coasting path)
        upd = _iteration(fW, x, y, s, z, tau, kappa, W, lmbda, dg, lg,
                         rx, ry, rz, rt)
        (x2, y2, s2, z2, tau2, kappa2, W2, lmbda2, dg2, lg2, gap2,
         relres) = upd

        if debug:
            # reference options['debug'] analogue (coneprog.py:1236)
            jax.debug.print("debug: KKT relres after refinement = "
                            "{r:9.2e}", r=relres)
        ok = (jnp.isfinite(gap2) & jnp.isfinite(tau2)
              & jnp.isfinite(jnp.sum(lmbda2)))
        if rescue:
            # diverging refinement far from convergence, or a singular
            # f32 factor: discard the step, hand to the f64 restart
            # phase (see coneqp._body for the m > 100 gate rationale).
            # relres_trigger is off for condition-halved factors
            # ('qr'/'cholqr' on q/s cones) where normwise residual
            # expansion is expected and benign (see coneqp._body).
            fail = ~ok
            if relres_trigger:
                fail = fail | ((relres > RESCUE_RELRES) & (m > 100.0))
            fail_status = STATUS_NEEDS_F64
        else:
            fail = ~ok
            fail_status = STATUS_UNKNOWN_SINGULAR
        new_status = jnp.where(exiting, new_status,
                               jnp.where(~fail, STATUS_RUNNING,
                                         fail_status))
        keep = exiting | fail

        def sel(a, bnew):
            return jax.tree_util.tree_map(
                lambda u, v: jnp.where(keep, u, v), a, bnew)

        out = dict(st)
        out.update(stats)
        out.update(best_m=best2, stall=stall2)
        out["status"] = new_status
        out["iters"] = iters + jnp.where(keep, 0, 1).astype(jnp.int32)
        out["x"] = sel(x, x2)
        out["y"] = sel(y, y2)
        out["s"] = sel(s, s2)
        out["z"] = sel(z, z2)
        out["tau"] = sel(tau, tau2)
        out["kappa"] = sel(kappa, kappa2)
        out["W"] = sel(W, W2)
        out["lmbda"] = sel(lmbda, lmbda2)
        out["dg"] = sel(dg, dg2)
        out["lg"] = sel(lg, lg2)
        out["gap"] = sel(gap, gap2)
        return out

    if factor64 is None and detect_rescue:
        # detection-only: flagged instances EXIT with STATUS_NEEDS_F64
        # for host-side compaction (see coneqp._coneqp_solve — an
        # in-jit vmapped rescue bills the whole batch per iteration)
        final = lax.while_loop(cond, make_body(factor, True), state)
    elif factor64 is None:
        final = lax.while_loop(cond, make_body(factor, False), state)
    else:
        # two-phase mixed-precision rescue; see coneqp._coneqp_solve.
        # Instances phase 1 could not finish RESTART from the initial
        # point with a fresh iteration budget, so their result is
        # exactly the full-f64 solver's.  A clean batch never executes
        # the f64 body (a vmapped while_loop whose condition is false
        # everywhere runs zero iterations) — the vmap-safe alternative
        # to lax.cond.
        st1 = lax.while_loop(cond, make_body(factor, True), state)
        it1 = st1["iters"]
        was64 = st1["status"] == STATUS_NEEDS_F64
        st2 = dict(st1)
        for k in ("x", "y", "s", "z", "tau", "kappa", "W", "lmbda",
                  "dg", "lg", "gap"):
            st2[k] = jax.tree_util.tree_map(
                lambda u0, u1: jnp.where(was64, u0, u1),
                state0[k], st1[k])
        st2["status"] = jnp.where(
            was64, jnp.asarray(STATUS_RUNNING, jnp.int32),
            st1["status"])
        st2["stall"] = jnp.zeros_like(st1["stall"])
        st2["best_m"] = jnp.full_like(st1["best_m"], jnp.inf)
        st2["max_it"] = jnp.where(was64, it1 + maxiters,
                                  st1["max_it"]).astype(jnp.int32)
        final = lax.while_loop(cond, make_body(factor64, False), st2)

    # ---- finalization (coneprog.py:925-1023 per-branch scalings) -----
    status = final["status"]
    tau, cx, by, hz = final["tau"], final["cx"], final["by"], final["hz"]
    xs = jnp.where(status == STATUS_DUAL_INFEASIBLE, -1.0 / cx,
                   1.0 / tau)
    ys = jnp.where(status == STATUS_PRIMAL_INFEASIBLE,
                   1.0 / (-hz - by), 1.0 / tau)
    x_out = _tscale(xs, final["x"])
    s_out = final["s"] * xs
    y_out = _tscale(ys, final["y"])
    z_out = final["z"] * ys
    ts = cones.max_step(s_out, dims)
    tz = cones.max_step(z_out, dims)
    out = dict(
        x=x_out, y=y_out, s=s_out, z=z_out,
        status=status, iterations=final["iters"],
        gap=final["gap"], relgap=final["relgap"],
        pcost=final["pcost"], dcost=final["dcost"],
        pres=final["pres"], dres=final["dres"],
        pinfres=final["pinfres"], dinfres=final["dinfres"],
        primal_slack=-ts, dual_slack=-tz,
    )
    import os
    if os.environ.get("CVXOPT_TPU_DEBUG_STATE") == "1":
        # raw carried loop state for platform-numerics autopsies (the
        # axon backend supports neither debug.print nor callbacks)
        out["_state"] = {k: final[k] for k in
                         ("x", "y", "s", "z", "tau", "kappa", "W",
                          "lmbda", "dg", "lg", "gap")}
    return out


def _resolve_opts(dims, kktsolver, refinement):
    if refinement is None:
        refinement = 1 if (dims.q or dims.s) else 0
    if kktsolver == "default" or kktsolver is None:
        # reference conelp default: 'qr' if q/s else 'chol2'
        # (coneprog.py:458-462)
        kktsolver = "qr" if (dims.q or dims.s) else "chol2"
    return kktsolver, refinement


def _relres_trigger(dims, kktsolver) -> bool:
    """Whether the mixed-precision rescue may use the refinement
    normwise-residual trigger: condition-halved strategies ('qr',
    'cholqr') on q/s cones have benignly large normwise residuals
    (eps*kappa(S) > 1 with the error confined to IPM-tolerated
    directions), so only the outcome triggers (stall/collapse/NaN)
    apply there."""
    return not ((dims.q or dims.s) and isinstance(kktsolver, str)
                and kktsolver.startswith(("qr", "cholqr")))


@functools.lru_cache(maxsize=128)
def make_conelp(dims: ConeDims, kktsolver: str = "default",
                maxiters: int = 100, abstol: float = 1e-7,
                reltol: float = 1e-6, feastol: float = 1e-7,
                refinement: Optional[int] = None,
                kktreg: Optional[float] = None,
                factor_dtype: Optional[str] = None,
                show_progress: bool = False,
                stall_exit: Optional[int] = None,
                debug: bool = False):
    """Build the jitted conelp core for a fixed cone structure.

    Returns f(c, G, h, A, b) -> dict of result arrays.  Cached per
    `dims`+options and jit-compiled per argument shapes — the
    vmap/pjit entry point for batched solving.

    ``stall_exit``: exit with the internal STATUS_STALLED after that
    many consecutive non-improving iterations (the refresh trigger,
    make_conelp_refresh)."""
    kktsolver, refinement = _resolve_opts(dims, kktsolver, refinement)

    def core(c, G, h, A, b):
        fd = factor_dtype
        factor64 = None
        if fd == "rescue":
            factor64 = kktmod.get_kktsolver(
                kktmod.robust_name(kktsolver), G, dims, A,
                kktreg=kktreg, factor_dtype=None)
            fd = "float32"
        factor = kktmod.get_kktsolver(kktsolver, G, dims, A,
                                      kktreg=kktreg,
                                      factor_dtype=fd)
        return _conelp_solve(
            dims, factor=factor, factor64=factor64,
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            c=c, h=h, b=b, n=c.shape[0], p=A.shape[0], dtype=c.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            show_progress=show_progress, stall_exit=stall_exit,
            debug=debug,
            relres_trigger=_relres_trigger(dims, kktsolver))

    return jax.jit(core)


@functools.lru_cache(maxsize=128)
def make_conelp_cascade(dims: ConeDims, kktsolver: str = "default",
                        maxiters: int = 100, abstol: float = 1e-7,
                        reltol: float = 1e-6, feastol: float = 1e-7,
                        refinement: Optional[int] = None,
                        kktreg: Optional[float] = None,
                        phase1_tol: float = 1e-4,
                        shared_GhAb: bool = True):
    """Progressive-precision conelp for TPU batches (the LP/conic-LP
    analogue of coneqp.make_coneqp_cascade): solve(c, G, h, A, b) with
    a leading batch axis on c (and on G/h/A/b unless ``shared_GhAb``).

    Phase A solves in pure f32 to `phase1_tol`; phase B re-enters the
    HSD solver in f64 with mixed-precision factors via the
    Mehrotra-shifted warm start of `make_conelp_ws` (tau/kappa restart
    at 1, which the HSD embedding absorbs in one re-centering step)
    plus the per-instance f64 rescue ('rescue' factor mode).
    Instances phase A flags as primal/dual infeasible at 1e-4 are
    still re-verified by phase B at the target tolerance (its cold
    restart handles certificate-side failures).  Total `iterations`
    counts both phases."""
    kktsolver, refinement = _resolve_opts(dims, kktsolver, refinement)
    f32 = jnp.float32

    def phase_a(c, G, h, A, b):
        c1, G1, h1, A1, b1 = (u.astype(f32) for u in (c, G, h, A, b))
        factor_a = kktmod.get_kktsolver(kktsolver, G1, dims, A1,
                                        kktreg=kktreg)
        raw = _conelp_solve(
            dims, factor=factor_a,
            Gf=lambda x: mv(G1, x), GTf=lambda z: mvt(G1, z),
            Af=lambda x: mv(A1, x), ATf=lambda y: mvt(A1, y),
            c=c1, h=h1, b=b1, n=c.shape[0], p=A.shape[0], dtype=f32,
            maxiters=maxiters, abstol=max(phase1_tol, abstol),
            reltol=max(phase1_tol, reltol),
            feastol=max(phase1_tol, feastol), refinement=0,
            show_progress=False)
        return {k: raw[k] for k in ("x", "y", "z", "iterations",
                                    "status")}

    # 's' cones: f32 factors collapse the HSD gap while feasibility
    # drifts (even with the condition-halved 'qr'; measured on mcsdp),
    # so phase B factors straight f64 there — still only the few
    # warm-started iterations below phase1_tol.  'l'/'q' phase B is
    # mixed-precision.  Either way phase B is DETECTION-ONLY; flagged
    # stragglers are compacted on the host into a small padded batch
    # for the cold f64 phase C (see coneqp.make_coneqp_cascade).
    fd_b = "f64_restart" if dims.s else "rescue"
    ws = make_conelp_ws_detect(
        dims, kktsolver=kktsolver, maxiters=maxiters,
        abstol=abstol, reltol=reltol, feastol=feastol,
        refinement=max(1, refinement), kktreg=kktreg,
        factor_dtype=fd_b)
    kktsolver_r, _ = _resolve_opts(dims, kktsolver, refinement)
    cold_core = make_conelp(
        dims, kktsolver=kktmod.robust_name(kktsolver_r),
        maxiters=maxiters, abstol=abstol, reltol=reltol,
        feastol=feastol, refinement=max(1, refinement), kktreg=kktreg)

    data_axes = (0, None, None, None, None) if shared_GhAb \
        else (0, 0, 0, 0, 0)
    va = jax.jit(jax.vmap(phase_a, in_axes=data_axes))
    vb = jax.jit(jax.vmap(
        lambda c, G, h, A, b, x0, y0, z0: ws(c, G, h, A, b,
                                             x0, y0, z0),
        in_axes=data_axes + (0, 0, 0)))
    vc = jax.jit(jax.vmap(cold_core, in_axes=data_axes))

    out_keys = ("x", "y", "s", "z", "status", "gap", "relgap",
                "pcost", "dcost", "pres", "dres", "pinfres",
                "dinfres", "primal_slack", "dual_slack")

    def solve(c, G, h, A, b):
        raw_a = va(c, G, h, A, b)
        dt = jnp.asarray(c).dtype
        # instances phase A could not actually finish (maxiters /
        # singular) hand over garbage iterates — often interior after
        # the ws Mehrotra shift yet catastrophically off-center.
        # Poison them with NaN so the warm-start validity check in
        # _conelp_solve sends them straight to the cold start.
        # (Phase-A infeasibility certificates at 1e-4 also restart
        # cold, re-verifying the certificate at target tolerance.)
        ok_a = raw_a["status"] == STATUS_OPTIMAL
        nanv = jnp.asarray(jnp.nan, dt)
        x0 = jnp.where(ok_a[:, None], raw_a["x"].astype(dt), nanv)
        y0 = jnp.where(ok_a[:, None] if raw_a["y"].ndim > 1
                       else ok_a, raw_a["y"].astype(dt), nanv)
        z0 = jnp.where(ok_a[:, None], raw_a["z"].astype(dt), nanv)
        raw = dict(vb(c, G, h, A, b, x0, y0, z0))
        raw["iterations"] = raw["iterations"] + raw_a["iterations"]
        raw["phase1_iterations"] = raw_a["iterations"]

        # ---- phase C: host-compacted cold f64 solve ------------------
        status = np.asarray(raw["status"])
        (flagged,) = np.nonzero(status == STATUS_NEEDS_F64)
        raw["rescue_iterations"] = jnp.zeros_like(raw["iterations"])
        if flagged.size:
            nb = status.shape[0]
            R = 1 << max(int(np.ceil(np.log2(flagged.size))), 0)
            R = min(R, nb)
            batches = []
            rem = flagged
            while rem.size:
                k = min(rem.size, R)
                idx = np.full((R,), rem[0], dtype=np.int64)
                idx[:k] = rem[:k]
                batches.append(idx)
                rem = rem[k:]
            resc = np.zeros((nb,), np.int32)
            for idx in batches:
                ii = jnp.asarray(idx)
                if shared_GhAb:
                    sub = vc(c[ii], G, h, A, b)
                else:
                    sub = vc(c[ii], G[ii], h[ii], A[ii], b[ii])
                take = np.unique(idx, return_index=True)
                src = jnp.asarray(take[1])
                dst = jnp.asarray(take[0])
                for k2 in out_keys:
                    raw[k2] = raw[k2].at[dst].set(sub[k2][src])
                resc[take[0]] = np.asarray(
                    sub["iterations"])[take[1]]
            raw["rescue_iterations"] = jnp.asarray(resc)
            raw["iterations"] = raw["iterations"] + \
                raw["rescue_iterations"]
        return raw

    return solve


@functools.lru_cache(maxsize=128)
def make_conelp_ws_detect(dims: ConeDims, kktsolver: str = "default",
                          maxiters: int = 100, abstol: float = 1e-7,
                          reltol: float = 1e-6, feastol: float = 1e-7,
                          refinement: Optional[int] = None,
                          kktreg: Optional[float] = None,
                          factor_dtype: Optional[str] = None):
    """`make_conelp_ws` in DETECTION-ONLY mode: the factor runs at the
    requested precision ('rescue' -> f32, 'f64_restart'/None -> f64)
    with the per-instance failure detectors active, and flagged
    instances EXIT with the NEEDS_F64 status code for host-side
    compaction (the cascade's phase C) instead of entering an in-jit
    restart phase that bills the whole batch."""
    kktsolver, refinement = _resolve_opts(dims, kktsolver, refinement)

    def core(c, G, h, A, b, x0, y0, z0):
        fd = {"rescue": "float32", "f64_restart": None,
              None: None}[factor_dtype]
        factor = kktmod.get_kktsolver(
            (kktmod.robust_name(kktsolver) if fd is None
             else kktsolver), G, dims, A, kktreg=kktreg,
            factor_dtype=fd)
        e = cones.cone_identity(dims, dtype=c.dtype)
        s0 = h - G @ x0
        ts = cones.max_step(s0, dims)
        tz = cones.max_step(z0, dims)
        ds = jnp.maximum(1.5 * ts, 0.0)
        dz = jnp.maximum(1.5 * tz, 0.0)
        s1 = s0 + ds * e
        z1 = z0 + dz * e
        mu = cones.sdot(s1, z1, dims)
        ds = ds + 0.5 * mu / jnp.maximum(
            cones.sdot(z1, e, dims), 1e-12)
        dz = dz + 0.5 * mu / jnp.maximum(
            cones.sdot(s1, e, dims), 1e-12)
        s0 = s0 + ds * e
        z0 = z0 + dz * e
        return _conelp_solve(
            dims, factor=factor, detect_rescue=True,
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            c=c, h=h, b=b, n=c.shape[0], p=A.shape[0], dtype=c.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            show_progress=False,
            primalstart={"x": x0, "s": s0},
            dualstart={"y": y0, "z": z0},
            relres_trigger=_relres_trigger(dims, kktsolver))

    return jax.jit(core)


@functools.lru_cache(maxsize=128)
def make_conelp_ws(dims: ConeDims, kktsolver: str = "default",
                   maxiters: int = 100, abstol: float = 1e-7,
                   reltol: float = 1e-6, feastol: float = 1e-7,
                   refinement: Optional[int] = None,
                   kktreg: Optional[float] = None,
                   factor_dtype: Optional[str] = None,
                   stall_exit: Optional[int] = None):
    """Warm-started jitted conelp core:
    f(c, G, h, A, b, x0, y0, z0) -> result dict.

    The starts are the reference's primalstart/dualstart semantics
    (coneprog.py:107-118) with the interior shift of the cold-start
    path applied automatically: s0 = h - G x0 and z0 are pushed into
    the cone by (1+t)e when needed (coneprog.py:806-844), so a parent
    node's iterates can seed a child relaxation directly (the
    branch-and-bound warm-start pattern, ilp.py)."""
    kktsolver, refinement = _resolve_opts(dims, kktsolver, refinement)

    def core(c, G, h, A, b, x0, y0, z0):
        fd = factor_dtype
        factor64 = None
        if fd == "rescue":
            factor64 = kktmod.get_kktsolver(
                kktmod.robust_name(kktsolver), G, dims, A,
                kktreg=kktreg, factor_dtype=None)
            fd = "float32"
        elif fd == "f64_restart":
            # full-precision factors throughout, but with the
            # per-instance failure detectors + cold-restart second
            # phase: a warm start handed in from a failed reduced-
            # precision phase can be catastrophically off-center, and
            # the restart recovers exactly the cold f64 solve
            factor64 = kktmod.get_kktsolver(
                kktmod.robust_name(kktsolver), G, dims, A,
                kktreg=kktreg, factor_dtype=None)
            fd = None
        factor = (factor64 if factor_dtype == "f64_restart"
                  else kktmod.get_kktsolver(kktsolver, G, dims, A,
                                            kktreg=kktreg,
                                            factor_dtype=fd))
        e = cones.cone_identity(dims, dtype=c.dtype)
        # Mehrotra-style starting-point shift: repair cone violations
        # with 1.5x margin, then back both points off the boundary by
        # half the average complementarity — warm points straight off
        # a parent's optimal face are catastrophically off-center for
        # the HSD solver (measured: -21% iterations vs the plain
        # feasibility shift on branch-and-bound children)
        s0 = h - G @ x0
        ts = cones.max_step(s0, dims)          # = max cone violation
        tz = cones.max_step(z0, dims)
        ds = jnp.maximum(1.5 * ts, 0.0)
        dz = jnp.maximum(1.5 * tz, 0.0)
        s1 = s0 + ds * e
        z1 = z0 + dz * e
        mu = cones.sdot(s1, z1, dims)
        ds = ds + 0.5 * mu / jnp.maximum(
            cones.sdot(z1, e, dims), 1e-12)
        dz = dz + 0.5 * mu / jnp.maximum(
            cones.sdot(s1, e, dims), 1e-12)
        s0 = s0 + ds * e
        z0 = z0 + dz * e
        return _conelp_solve(
            dims, factor=factor, factor64=factor64,
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            c=c, h=h, b=b, n=c.shape[0], p=A.shape[0], dtype=c.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            show_progress=False, stall_exit=stall_exit,
            primalstart={"x": x0, "s": s0},
            dualstart={"y": y0, "z": z0},
            relres_trigger=_relres_trigger(dims, kktsolver))

    return jax.jit(core)


def _prep_inputs(c, G, h, dims, A, b, dtype=None, allow_ops=False):
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    c_is_tree = isinstance(c, dict) or (
        not hasattr(c, "shape") and not isinstance(c, (list, tuple)))
    if c_is_tree:
        if not allow_ops:
            raise ValueError("pytree-valued c requires operator-form "
                             "G/A and a custom kktsolver")
        c = jax.tree_util.tree_map(
            lambda u: jnp.asarray(u, dtype=dtype), c)
        n = sum(int(np.prod(u.shape))
                for u in jax.tree_util.tree_leaves(c))
    else:
        c = jnp.asarray(c).astype(dtype).reshape(-1)
        n = c.shape[0]
    G_is_op = isinstance(G, LinearOperator) or callable(G)
    A_is_op = isinstance(A, LinearOperator) or (A is not None
                                                and callable(A))
    if (G_is_op or A_is_op) and not allow_ops:
        raise ValueError("use of operator-form G/A requires a "
                         "user-provided kktsolver")
    h = jnp.asarray(h, dtype=dtype).reshape(-1)
    if dims is None:
        dims = ConeDims(l=h.shape[0])
    elif isinstance(dims, dict):
        dims = ConeDims.from_dict(dims)
    if h.shape[0] != dims.cdim:
        raise TypeError(f"'h' must have length {dims.cdim}")
    if not G_is_op:
        G = jnp.asarray(G, dtype=dtype).reshape(-1, n)
        if G.shape[0] != dims.cdim:
            raise TypeError(f"'G' must have {dims.cdim} rows")
        # 's' rows: only (column-major) lower triangles are meaningful
        G = jnp.swapaxes(
            cones.symmetrize_lower(jnp.swapaxes(G, 0, 1), dims), 0, 1)
    if A is None:
        A = jnp.zeros((0, n), dtype=dtype)
        A_is_op = False
    elif not A_is_op:
        A = jnp.asarray(A, dtype=dtype).reshape(-1, n)
    if b is None:
        p = 0 if A_is_op else A.shape[0]
        b = jnp.zeros((p,), dtype=dtype)
    else:
        b = jnp.asarray(b, dtype=dtype).reshape(-1)
    h = cones.symmetrize_lower(h, dims)
    return c, G, h, dims, A, b


def conelp(c, G, h, dims=None, A=None, b=None, primalstart=None,
           dualstart=None, kktsolver=None, options=None, **kwargs):
    """Solve a cone LP; returns the reference-format result dict
    (coneprog.py:125-283)."""
    from cvxopt_tpu.solvers import options as global_options
    opts = dict(global_options)
    if options:
        opts.update(options)
    custom_kkt = callable(kktsolver)
    c, G, h, dims, A, b = _prep_inputs(c, G, h, dims, A, b,
                                       allow_ops=custom_kkt)
    maxiters = int(opts.get("maxiters", 100))
    abstol = float(opts.get("abstol", 1e-7))
    reltol = float(opts.get("reltol", 1e-6))
    feastol = float(opts.get("feastol", 1e-7))
    show_progress = bool(opts.get("show_progress", False))
    refinement = opts.get("refinement", None)
    # default 'auto': on TPU with x64, mixed-precision f32 factors with
    # the two-phase f64 rescue — degenerate instances whose equilibrated
    # f32 factor stalls refinement are finished by a second while_loop
    # phase with full-f64 factors, preserving the reference's 1e-7
    # contract (kkt.resolve_factor_dtype); None on CPU / without x64
    factor_dtype = kktmod.resolve_factor_dtype(
        opts.get("factor_dtype", "auto"))
    if factor_dtype is not None and refinement is None:
        refinement = 1   # mixed precision needs one f64 IR round

    if not custom_kkt and primalstart is None and dualstart is None:
        fn = make_conelp(
            dims, kktsolver=kktsolver or "default", maxiters=maxiters,
            abstol=abstol, reltol=reltol, feastol=feastol,
            refinement=refinement, kktreg=opts.get("kktreg", None),
            factor_dtype=factor_dtype,
            show_progress=show_progress,
            debug=bool(opts.get("debug", False)))
        raw = fn(c, G, h, A, b)
        return finalize_result(raw, dims)

    # ---- advanced path: custom kktsolver / operators / warm starts ---
    dtype = jax.tree_util.tree_leaves(c)[0].dtype
    c_is_tree = not hasattr(c, "shape")
    matrixG = not (isinstance(G, LinearOperator) or callable(G))
    A_is_op = isinstance(A, LinearOperator) or callable(A)
    if c_is_tree and not A_is_op and A.shape[0]:
        # pytree x: a matrix A is only meaningful when empty — the
        # equality map must otherwise be operator-form (as in the
        # reference, coneprog.py:477-479)
        raise ValueError("pytree-valued c requires operator-form A")
    if A_is_op:
        p = A.shape[0] if isinstance(A, LinearOperator) else b.shape[0]
    else:
        p = A.shape[0]

    if custom_kkt:
        fkey = kktsolver
    else:
        fkey, _ = _resolve_opts(dims, kktsolver, refinement)
    _, refinement = _resolve_opts(dims, "default", refinement)

    if primalstart is not None:
        ps = {"x": jnp.asarray(primalstart["x"], dtype=dtype
                               ).reshape(-1),
              "s": cones.symmetrize_lower(
                  jnp.asarray(primalstart["s"], dtype=dtype
                              ).reshape(-1), dims)}
        if float(cones.max_step(ps["s"], dims)) >= 0:
            raise ValueError("initial s is not positive")
    else:
        ps = None
    if dualstart is not None:
        ds = {"z": cones.symmetrize_lower(
            jnp.asarray(dualstart["z"], dtype=dtype).reshape(-1), dims)}
        if "y" in dualstart:
            ds["y"] = jnp.asarray(dualstart["y"], dtype=dtype
                                  ).reshape(-1)
        if float(cones.max_step(ds["z"], dims)) >= 0:
            raise ValueError("initial z is not positive")
    else:
        ds = None

    n_var = c.shape[0] if hasattr(c, "shape") else None

    # cached advanced runner: the jit is keyed on the problem
    # STRUCTURE (dims, shapes, options) plus the IDENTITY of any user
    # callables (custom kktsolver / operator-form G, A) — matrices are
    # dynamic arguments, so a second solve with the same structure
    # pays no recompile.  Operator/kktsolver users should hold on to
    # their objects across calls to hit the cache.
    runner = _adv_runner(
        dims, n_var, p, fkey, factor_dtype,
        opts.get("kktreg", None),
        None if matrixG else G, A if A_is_op else None,
        maxiters, abstol, reltol, feastol, refinement, show_progress)
    raw = runner(c, h, b, G if matrixG else None,
                 None if A_is_op else A, ps, ds)
    return finalize_result(raw, dims)


@functools.lru_cache(maxsize=64)
def _adv_runner(dims, n_var, p, fkey, factor_dtype, kktreg,
                Gop, Aop, maxiters, abstol, reltol, feastol,
                refinement, show_progress):
    """jit-cached advanced-path conelp core (custom kktsolver /
    operator form / warm starts).  `fkey` is a kktsolver NAME (str,
    built-in path; the factor is then built inside the trace from the
    dynamic G/A matrices) or the user's kktsolver callable.  `Gop` /
    `Aop` are user operators (cache-keyed by identity) or None when
    the corresponding argument is a dynamic matrix."""
    custom_kkt = callable(fkey)

    def run(c, h, b, Gm, Am, ps, ds):
        dtype = jax.tree_util.tree_leaves(h)[0].dtype
        if Gop is None:
            Gf, GTf = (lambda x: mv(Gm, x)), (lambda z: mvt(Gm, z))
        elif isinstance(Gop, LinearOperator):
            Gf, GTf = Gop.mv, Gop.rmv
        else:
            Gf = lambda x: Gop(x, "N")
            GTf = lambda z: Gop(z, "T")
        if Aop is None:
            if hasattr(c, "shape"):
                Af = lambda x: mv(Am, x)
                ATf = lambda y: mvt(Am, y)
            else:
                Af = lambda x: jnp.zeros((0,), dtype)
                ATf = lambda y: jax.tree_util.tree_map(
                    jnp.zeros_like, c)
        elif isinstance(Aop, LinearOperator):
            Af, ATf = Aop.mv, Aop.rmv
        else:
            Af = lambda x: Aop(x, "N")
            ATf = lambda y: Aop(y, "T")

        factor64 = None
        if custom_kkt:
            factor = fkey
        else:
            fd = factor_dtype
            if fd == "rescue":
                factor64 = kktmod.get_kktsolver(
                    kktmod.robust_name(fkey), Gm, dims, Am,
                    kktreg=kktreg, factor_dtype=None)
                fd = "float32"
            factor = kktmod.get_kktsolver(
                fkey, Gm, dims, Am, kktreg=kktreg, factor_dtype=fd)
        return _conelp_solve(
            dims, factor=factor, factor64=factor64,
            Gf=Gf, GTf=GTf, Af=Af, ATf=ATf,
            c=c, h=h, b=b, n=n_var, p=p, dtype=dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            show_progress=show_progress, primalstart=ps, dualstart=ds,
            relres_trigger=(True if custom_kkt
                            else _relres_trigger(dims, fkey)))

    return jax.jit(run)


def finalize_result(raw, dims: ConeDims):
    """Convert the raw jit output into the reference result-dict format
    (coneprog.py:125-283): same keys, None where the reference returns
    None, numpy-convertible values."""
    status = int(raw["status"])
    sstr = STATUS_STRINGS.get(status, "unknown")

    def opt(v, none_statuses):
        return None if status in none_statuses else v

    def fin(v):
        v = float(v)
        return None if (v != v or v in (float("inf"), float("-inf"))) \
            else v

    pinf, dinf = STATUS_PRIMAL_INFEASIBLE, STATUS_DUAL_INFEASIBLE
    res = {
        "status": sstr,
        "x": opt(raw["x"], (pinf,)),
        "s": opt(raw["s"], (pinf,)),
        "y": opt(raw["y"], (dinf,)),
        "z": opt(raw["z"], (dinf,)),
        "gap": opt(fin(raw["gap"]), (pinf, dinf)),
        "relative gap": opt(fin(raw["relgap"]), (pinf, dinf)),
        "primal objective": (-1.0 if status == dinf else
                             opt(fin(raw["pcost"]), (pinf,))),
        "dual objective": (1.0 if status == pinf else
                           opt(fin(raw["dcost"]), (dinf,))),
        "primal infeasibility": opt(fin(raw["pres"]), (pinf, dinf)),
        "dual infeasibility": opt(fin(raw["dres"]), (pinf, dinf)),
        "primal slack": opt(fin(raw["primal_slack"]), (pinf,)),
        "dual slack": opt(fin(raw["dual_slack"]), (dinf,)),
        "residual as primal infeasibility certificate":
            fin(raw["pinfres"]) if status == pinf else None,
        "residual as dual infeasibility certificate":
            fin(raw["dinfres"]) if status == dinf else None,
        "iterations": int(raw["iterations"]),
    }
    return res


def make_conelp_refresh(dims: ConeDims, kktsolver: str = "default",
                        maxiters: int = 100, abstol: float = 1e-7,
                        reltol: float = 1e-6, feastol: float = 1e-7,
                        refinement: Optional[int] = None,
                        kktreg: Optional[float] = None,
                        factor_dtype: Optional[str] = None,
                        stall_exit: int = 4,
                        segment: Optional[int] = None,
                        rounds: int = 3):
    """conelp with PERIODIC SCALING REFRESH — the TPU 's'-cone
    production path for single large cone programs.

    Rationale (measured, r04): near convergence (mu ~ 1e-9) the HSD
    system's conditioning amplifies platform-level rounding
    differences; on the emulated-f64 TPU backend the carried
    NT-scaling trajectory can stall at dres ~ 2e-7 (the same program
    converges on CPU), even though every component solve is accurate
    to ~1e-13 (autopsy series, /tmp-level probes r04).  Restarting
    from the current iterate RECOMPUTES the scaling fresh and
    re-centers via the Mehrotra shift, after which the iteration
    reaches the 1e-7 contract in a few steps (measured: dres 2.5e-8
    in 3 post-refresh iterations on the mcsdp m=200 state where the
    single-trajectory solve stalls).

    Host-driven, TRIGGERED by the measured stall detector (r05; the
    r04 open-loop `segment` mode remains available by passing
    ``segment``): the core runs until it converges, certifies
    infeasibility, or the per-iteration convergence measure stops
    improving for `stall_exit` consecutive iterations (the same
    detector that gates the batched rescue phase) — only then does the
    host restart the warm core from the current iterate with a freshly
    computed scaling.  A healthy solve (e.g. any CPU run) never
    restarts and pays zero extra iterations.  Each phase is one jitted
    program; intermediate iterates stay on device.  Returns the
    reference-format result dict of arrays plus cumulative
    `iterations` and `refresh_rounds`."""
    se = None if segment is not None else stall_exit
    seg_iters = segment if segment is not None else maxiters
    cold = make_conelp(dims, kktsolver=kktsolver, maxiters=seg_iters,
                       abstol=abstol, reltol=reltol, feastol=feastol,
                       refinement=refinement, kktreg=kktreg,
                       factor_dtype=factor_dtype, stall_exit=se)
    ws = make_conelp_ws(dims, kktsolver=kktsolver, maxiters=seg_iters,
                        abstol=abstol, reltol=reltol, feastol=feastol,
                        refinement=refinement, kktreg=kktreg,
                        factor_dtype=factor_dtype, stall_exit=se)

    def solve(c, G, h, A, b):
        out = cold(c, G, h, A, b)
        total = int(out["iterations"])
        r = 0
        # only refresh on inconclusive exits: OPTIMAL and the two
        # infeasibility certificates are terminal — re-entering the
        # warm core would burn iterations and overwrite the
        # certificate-bearing result (ADVICE r04).  In trigger mode
        # (segment=None) a STALLED exit refreshes, and so does a
        # SINGULAR one: on the emulated-f64 TPU 's' path the carried
        # scaling can break the factorization near convergence (the
        # measured mcsdp m=200 singular-at-iteration-11 pathology,
        # kkt.py adaptive notes) and a fresh-scaling restart repairs
        # exactly that.  MAXITERS stays terminal.  In the legacy
        # open-loop mode any inconclusive exit refreshes.
        conclusive = (STATUS_OPTIMAL, STATUS_PRIMAL_INFEASIBLE,
                      STATUS_DUAL_INFEASIBLE)

        def wants_refresh(status):
            if segment is None:
                return status in (STATUS_STALLED,
                                  STATUS_UNKNOWN_SINGULAR)
            return status not in conclusive

        while (wants_refresh(int(out["status"])) and r < rounds
               and total < maxiters):
            nxt = ws(c, G, h, A, b, out["x"], out["y"], out["z"])
            total += int(nxt["iterations"])
            r += 1
            out = nxt
        out = dict(out)
        if int(out["status"]) == STATUS_STALLED:
            # exhausted rounds while stalled: report the reference's
            # inconclusive status, keeping the best iterate
            out["status"] = jnp.asarray(STATUS_UNKNOWN_MAXITERS,
                                        jnp.int32)
        out["iterations"] = total
        out["refresh_rounds"] = r
        return out

    return solve
