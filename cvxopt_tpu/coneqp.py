"""coneqp — cone quadratic program solver.

TPU-native re-design of the reference solver
/root/reference/src/python/coneprog.py:1440-2547
(`cvxopt.solvers.coneqp`): an infeasible-start Mehrotra
predictor-corrector primal-dual IPM (no homogeneous embedding, no
infeasibility certificates), with Nesterov-Todd scaling and the
`use_correction` toggle (coneprog.py:1781, 2377).

Solves
    minimize    (1/2) x'Px + q'x
    subject to  G x + s = h,  A x = b,  s >= 0 (wrt the cone)

Same TPU-first architecture as conelp.py: the whole solve is one
jit-compiled `lax.while_loop`, vmap-batchable; singular KKT becomes a
status code via NaN detection.

Advanced API (mirrors conelp): P, G, A may be `linops.LinearOperator`s,
`kktsolver` may be a callable ``kktsolver(W) -> solve`` (the solve must
incorporate P, as in the reference where the default wraps
``factor(W, P)``, coneprog.py:1980-1981), and `initvals` warm starts
(coneprog.py:1521-1530) are supported.

Status codes: 0 optimal, 3 unknown (maxiters), 4 unknown (singular).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cvxopt_tpu import cones
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import scaling as nt
from cvxopt_tpu import kkt as kktmod
from cvxopt_tpu.linops import LinearOperator
from cvxopt_tpu.ops.matvec import mv, mvt, vdot
from cvxopt_tpu.conelp import (
    STATUS_RUNNING, STATUS_OPTIMAL, STATUS_UNKNOWN_MAXITERS,
    STATUS_UNKNOWN_SINGULAR, STATUS_NEEDS_F64, STATUS_STRINGS,
    STEP, EXPON, RESCUE_STALL_ITERS, RESCUE_RELRES, _prep_inputs,
    _tnorm_parts,
)


def _coneqp_solve(dims: ConeDims, *, factor_W, Pf, Gf, GTf, Af, ATf,
                  q, h, b, n, p, dtype, maxiters, abstol, reltol,
                  feastol, refinement, correction, show_progress,
                  initvals=None, factor_W64=None, refine_pred=True,
                  relres_trigger=True, detect_rescue=False,
                  debug=False):
    """The coneqp algorithm with all linear maps abstracted as closures
    (coneprog.py:1440-2547).  Pure; call inside jit."""
    e = cones.cone_identity(dims, dtype=dtype)
    e_lq = e[:dims.lnl + dims.qdim]

    resx0 = jnp.maximum(1.0, jnp.linalg.norm(q))
    resy0 = jnp.maximum(1.0, jnp.linalg.norm(b))
    resz0 = jnp.maximum(1.0, cones.snrm2(h, dims))

    # ---- initial point (coneprog.py:2044-2149) -----------------------
    # the cold init is also computed when a rescue phase exists, so
    # flagged instances restart from a TRUE cold start (restarting
    # from warm initvals would re-enter the same warm-start pathology)
    cold = None
    if initvals is None or factor_W64 is not None or detect_rescue:
        f0 = factor_W(nt.identity_scaling(dims, dtype=dtype))
        xc, yc, zc = f0(-q, b, h)
        sc = -zc
        nrms = cones.snrm2(sc, dims)
        ts = cones.max_step(sc, dims)
        sc = jnp.where(ts >= -1e-8 * jnp.maximum(nrms, 1.0),
                       sc + (1.0 + ts) * e, sc)
        nrmz = cones.snrm2(zc, dims)
        tz = cones.max_step(zc, dims)
        zc = jnp.where(tz >= -1e-8 * jnp.maximum(nrmz, 1.0),
                       zc + (1.0 + tz) * e, zc)
        cold = (xc, yc, sc, zc)
    if initvals is None:
        x, y, s, z = cold
    else:
        x = jnp.asarray(initvals.get("x", jnp.zeros(n, dtype)), dtype)
        y = jnp.asarray(initvals.get("y", jnp.zeros(p, dtype)), dtype)
        s = jnp.asarray(initvals.get("s", e), dtype)
        z = jnp.asarray(initvals.get("z", e), dtype)
        if cold is not None:
            # per-instance warm-start validation: a warm start whose
            # slacks are non-finite or not strictly interior (e.g. the
            # handoff from a failed reduced-precision phase) would NaN
            # compute_scaling on the spot; those instances restart from
            # the cold initial point instead (vmap-safe elementwise
            # select — the cascade's phase B relies on this)
            tsz_w = cones.max_step(jnp.stack([s, z]), dims)
            valid = (jnp.isfinite(jnp.sum(x)) & jnp.isfinite(jnp.sum(y))
                     & (tsz_w[0] < 0) & (tsz_w[1] < 0))
            if "_valid" in initvals:
                # caller-supplied validity (the cascade: phase A must
                # have actually converged — a failed phase's iterates
                # can be interior yet catastrophically off-center,
                # e.g. z within 1e-11 of the boundary at mu ~ 1e-4)
                valid = valid & initvals["_valid"]
            x = jnp.where(valid, x, cold[0])
            y = jnp.where(valid, y, cold[1])
            s = jnp.where(valid, s, cold[2])
            z = jnp.where(valid, z, cold[3])

    def _mkstate(x_, y_, s_, z_):
        W_, lmbda_ = nt.compute_scaling(s_, z_, dims)
        nan = jnp.asarray(jnp.nan, dtype)
        return dict(
            x=x_, y=y_, s=s_, z=z_, W=W_, lmbda=lmbda_,
            gap=cones.sdot(s_, z_, dims),
            iters=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(STATUS_RUNNING, jnp.int32),
            pcost=nan, dcost=nan, relgap=nan, pres=nan, dres=nan,
            best_m=jnp.asarray(jnp.inf, dtype),
            stall=jnp.asarray(0, jnp.int32),
            max_it=jnp.asarray(maxiters, jnp.int32),
        )

    state = _mkstate(x, y, s, z)
    state0 = state if cold is None or initvals is None \
        else _mkstate(*cold)

    def _iteration(fW, x, y, s, z, W, lmbda, gap, rx, ry, rz):
        lmbdasq = cones.ssqr(lmbda, dims)
        f3 = fW(W)

        def f4_no_ir(bx, by_, bz, bs):
            # (coneprog.py:2288-2316)
            us = cones.sinv(bs, lmbda, dims)
            uz = bz - nt.scale(us, W, dims, trans="T")
            ux, uy, uz = f3(bx, by_, uz)
            us = us - uz
            return ux, uy, uz, us

        def resid4(ux, uy, uz, us, vx, vy, vz, vs):
            # (coneprog.py:1930-1960)
            wz3 = nt.scale(uz, W, dims, inverse="I")
            vx = vx - Pf(ux) - ATf(uy) - GTf(wz3)
            vy = vy - Af(ux)
            vz = vz - Gf(ux) - nt.scale(us, W, dims, trans="T")
            vs = vs - cones.sprod_diag(us + uz, lmbda, dims)
            return vx, vy, vz, vs

        def f4(bx, by_, bz, bs, nref=refinement):
            u = f4_no_ir(bx, by_, bz, bs)
            relres = jnp.asarray(0.0, gap.dtype)

            def round_(carry):
                u, _ = carry
                v = resid4(*u, bx, by_, bz, bs)
                # contraction of one solve round: the mixed-precision
                # failure detector (conelp.RESCUE_RELRES)
                rr = _tnorm_parts(v) / jnp.maximum(
                    _tnorm_parts((bx, by_, bz, bs)), 1e-30)
                du = f4_no_ir(*v)
                return tuple(a + d for a, d in zip(u, du)), rr

            if nref <= 1:
                for _ in range(nref):
                    u, relres = round_((u, relres))
            else:
                # fori_loop keeps the refinement body (a full KKT
                # solve) in the program ONCE instead of nref times —
                # the cascade's compile-time diet
                u, relres = lax.fori_loop(
                    0, nref, lambda i, c: round_(c), (u, relres))
            return u, relres

        mu = gap / dims.cdim_diag
        lmbdasq_full = cones.diag_embed(lmbdasq, dims)

        # ---- predictor (i=0, coneprog.py:2360-2455) ------------------
        # the predictor direction only sets sigma and the affine step
        # estimate; with refine_pred=False it skips the refinement
        # rounds (the corrector stays fully refined) — the cascade's
        # f64 phase uses this to drop ~25% of its KKT solves
        ds_in = -lmbdasq_full
        (dx, dy, dz, ds), rr1 = f4(-rx, -ry, -rz, ds_in,
                                   nref=refinement if refine_pred
                                   else 0)
        dsdz = cones.sdot(ds, dz, dims)
        ws3 = cones.sprod(ds, dz, dims)
        ds_sc = nt.scale2(lmbda, ds, dims)
        dz_sc = nt.scale2(lmbda, dz, dims)
        # stacked: one eigh instance for both directions
        tsz = cones.max_step(jnp.stack([ds_sc, dz_sc]), dims)
        t = jnp.maximum(jnp.maximum(tsz[0], tsz[1]), 0.0)
        step = jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, 1.0 / t))
        sigma = jnp.minimum(
            1.0, jnp.maximum(0.0, 1.0 - step + dsdz / gap * step ** 2)
        ) ** EXPON

        # ---- corrector (i=1) -----------------------------------------
        ds_in = -lmbdasq_full + sigma * mu * e
        if correction:
            ds_in = ds_in - ws3
        (dx, dy, dz, ds), rr2 = f4(-rx, -ry, -rz, ds_in)
        ds_sc = nt.scale2(lmbda, ds, dims)
        dz_sc = nt.scale2(lmbda, dz, dims)
        tsz, sig2, dq2 = cones.max_step_eig(
            jnp.stack([ds_sc, dz_sc]), dims)
        sigs, sigz = sig2[0], sig2[1]
        ds_q, dz_q = dq2[0], dq2[1]
        t = jnp.maximum(jnp.maximum(tsz[0], tsz[1]), 0.0)
        step = jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, STEP / t))

        # ---- update (coneprog.py:2459-2547) --------------------------
        x = x + step * dx
        y = y + step * dy

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

        lam_full = cones.diag_embed(lmbda2, dims)
        s2 = nt.scale(lam_full, W2, dims, trans="T")
        z2 = nt.scale(lam_full, W2, dims, inverse="I")
        gap2 = vdot(lmbda2, lmbda2)
        return x, y, s2, z2, W2, lmbda2, gap2, jnp.maximum(rr1, rr2)

    def cond(st):
        return st["status"] == STATUS_RUNNING

    def make_body(fW, rescue):
        def body(st):
            return _body(st, fW, rescue)
        return body

    def _body(st, fW, rescue):
        x, y, s, z = st["x"], st["y"], st["s"], st["z"]
        W, lmbda, gap = st["W"], st["lmbda"], st["gap"]
        iters = st["iters"]

        # ---- residuals (coneprog.py:2169-2204) -----------------------
        Px = Pf(x)
        rx = Px + q + ATf(y) + GTf(z)
        # f0 = 1/2 x'Px + q'x  (reference: 0.5*(x'rx + x'q) with
        # rx = Px + q, coneprog.py:2174)
        f0_ = 0.5 * vdot(x, Px) + vdot(x, q)
        resx = jnp.linalg.norm(rx)
        ry = Af(x) - b
        resy = jnp.linalg.norm(ry)
        rz = s + Gf(x) - h
        resz = cones.snrm2(rz, dims)

        pcost = f0_
        dcost = f0_ + vdot(y, ry) + cones.sdot(z, rz, dims) - gap
        inf = jnp.asarray(jnp.inf, q.dtype)
        relgap = jnp.where(
            pcost < 0.0, gap / -pcost,
            jnp.where(dcost > 0.0, gap / dcost, inf))
        pres = jnp.maximum(resy / resy0, resz / resz0)
        dres = resx / resx0

        if show_progress:
            jax.debug.print(
                "{i:2d}: {pc: 8.4e} {dc: 8.4e} {g: 4.0e} {pr:7.0e} "
                "{dr:7.0e}",
                i=iters, pc=pcost, dc=dcost, g=gap, pr=pres, dr=dres)

        optimal = ((pres <= feastol) & (dres <= feastol)
                   & ((gap <= abstol) | (relgap <= reltol)))
        maxed = iters >= st["max_it"]

        # per-instance failure detectors (rescue phase only; see
        # conelp.RESCUE_* constants): the scalar convergence measure
        # m <= 1 iff optimal.  `stalled` hands the instance to the f64
        # restart phase.
        m = jnp.maximum(jnp.maximum(pres, dres) / feastol,
                        jnp.minimum(gap / abstol, relgap / reltol))
        improved = m < 0.995 * st["best_m"]
        stall2 = jnp.where(improved, 0, st["stall"] + 1).astype(jnp.int32)
        best2 = jnp.minimum(st["best_m"], m)
        if rescue:
            collapse = (gap <= abstol) & (m > 10.0)
            regressed = m > 100.0 * st["best_m"]
            stalled = ((stall2 >= RESCUE_STALL_ITERS) | collapse
                       | regressed)
        else:
            stalled = False

        new_status = jnp.where(
            optimal, STATUS_OPTIMAL,
            jnp.where(maxed, STATUS_UNKNOWN_MAXITERS,
                      jnp.where(stalled, STATUS_NEEDS_F64,
                                STATUS_RUNNING))).astype(jnp.int32)
        exiting = new_status != STATUS_RUNNING

        upd = _iteration(fW, x, y, s, z, W, lmbda, gap, rx, ry, rz)
        x2, y2, s2, z2, W2, lmbda2, gap2, relres = upd

        if debug:
            # reference options['debug'] analogue: the KKT solve's
            # post-refinement relative residual (coneprog.py:1236)
            jax.debug.print("debug: KKT relres after refinement = "
                            "{r:9.2e}", r=relres)
        ok = jnp.isfinite(gap2) & jnp.isfinite(jnp.sum(lmbda2))
        if rescue:
            # diverging refinement far from convergence, or a singular
            # f32 factor (NaN step): discard the step, hand to the f64
            # restart phase (the reference's singularity handling
            # retries too — misc.py:1433-1447, same spirit).  The
            # m > 100 gate stops transient near-convergence residual
            # expansion (harmless — the outcome triggers would catch
            # any real failure) from flagging clean instances.
            # the relres trigger assumes refinement is normwise
            # convergent for a healthy factor — true for equilibrated
            # Cholesky ('l' cones), FALSE for kkt_cholqr on q/s cones,
            # where eps_f32*kappa(S) > 1 makes the normwise residual
            # expand even though the step error lies in directions the
            # IPM tolerates (Wright's benign ill-conditioning); there
            # the stall/collapse/NaN triggers below carry the rescue
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
        out.update(pcost=pcost, dcost=dcost, relgap=relgap,
                   pres=pres, dres=dres, best_m=best2, stall=stall2)
        out["status"] = new_status
        out["iters"] = iters + jnp.where(keep, 0, 1).astype(jnp.int32)
        out["x"] = sel(x, x2)
        out["y"] = sel(y, y2)
        out["s"] = sel(s, s2)
        out["z"] = sel(z, z2)
        out["W"] = sel(W, W2)
        out["lmbda"] = sel(lmbda, lmbda2)
        out["gap"] = sel(gap, gap2)
        return out

    if factor_W64 is None and detect_rescue:
        # detection-only mode: instances the mixed factor cannot finish
        # EXIT with STATUS_NEEDS_F64 instead of entering an in-jit f64
        # phase.  The cascade compacts them on the host into a small
        # padded batch for the f64 solver — a vmapped in-jit rescue
        # bills its emulated-f64 factor to the ENTIRE batch for every
        # rescue iteration (measured: 1 straggler in a 1024-wide SOC
        # batch cost ~10 s), while host compaction pays per straggler.
        final = lax.while_loop(cond, make_body(factor_W, True), state)
        rescue_iters = jnp.asarray(0, jnp.int32)
    elif factor_W64 is None:
        final = lax.while_loop(cond, make_body(factor_W, False), state)
        rescue_iters = jnp.asarray(0, jnp.int32)
    else:
        # phase 1: mixed-precision factor with per-instance failure
        # detection; phase 2: full-precision factor, entered ONLY by
        # instances phase 1 could not finish — those RESTART from the
        # initial point with a fresh iteration budget, so their result
        # is exactly the full-f64 solver's.  Under vmap a
        # lax.while_loop body never executes once every instance's
        # condition is false, so a clean batch pays nothing for the
        # f64 fallback — the vmap-safe alternative to `lax.cond`
        # (whose branches both execute under vmap).
        st1 = lax.while_loop(cond, make_body(factor_W, True), state)
        it1 = st1["iters"]
        was64 = st1["status"] == STATUS_NEEDS_F64
        st2 = dict(st1)
        for k in ("x", "y", "s", "z", "W", "lmbda", "gap"):
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
        final = lax.while_loop(cond, make_body(factor_W64, False), st2)
        rescue_iters = final["iters"] - it1
    ts = cones.max_step(final["s"], dims)
    tz = cones.max_step(final["z"], dims)
    return dict(
        x=final["x"], y=final["y"], s=final["s"], z=final["z"],
        status=final["status"], iterations=final["iters"],
        gap=final["gap"], relgap=final["relgap"],
        pcost=final["pcost"], dcost=final["dcost"],
        pres=final["pres"], dres=final["dres"],
        primal_slack=-ts, dual_slack=-tz,
        rescue_iterations=rescue_iters,
    )


def _resolve_qp_opts(dims, kktsolver, refinement):
    if refinement is None:
        refinement = 1 if (dims.q or dims.s) else 0
    if kktsolver == "default" or kktsolver is None:
        # reference: 'chol' if q/s else 'chol2' (coneprog.py:1805-1809)
        kktsolver = "chol" if (dims.q or dims.s) else "chol2"
    return kktsolver, refinement


@functools.lru_cache(maxsize=128)
def make_coneqp(dims: ConeDims, kktsolver: str = "default",
                maxiters: int = 100, abstol: float = 1e-7,
                reltol: float = 1e-6, feastol: float = 1e-7,
                refinement: Optional[int] = None,
                kktreg: Optional[float] = None,
                correction: bool = True,
                factor_dtype: Optional[str] = None,
                show_progress: bool = False,
                debug: bool = False):
    """Build the jitted coneqp core: f(P, q, G, h, A, b) -> result dict
    of arrays.  Cached per dims+options; the vmap entry point for the
    batched-scenario configurations."""
    kktsolver, refinement = _resolve_qp_opts(dims, kktsolver,
                                             refinement)

    def core(P, q, G, h, A, b):
        fd = factor_dtype
        factor_W64 = None
        fname = kktsolver
        if fd == "rescue":
            rname = kktmod.robust_name(kktsolver)
            f64 = kktmod.get_kktsolver(rname, G, dims, A,
                                       kktreg=kktreg, factor_dtype=None)
            P64 = kktmod.wrap_P(rname, P)
            factor_W64 = lambda W: f64(W, P64)
            fd = "float32"
            if (dims.q or dims.s) and kktsolver in (
                    "chol", "chol2", "chol_inv", "chol2_inv"):
                # q/s cones: an f32 Cholesky of the formed normal
                # equations cannot reach 1e-7 (kappa(S) ~ 1/mu^2);
                # the condition-halving QR factor can, so the mixed
                # phase uses it and the f64 rescue becomes rare
                fname = "cholqr_inv" if kktsolver.endswith("_inv") \
                    else "cholqr"
        factor = kktmod.get_kktsolver(fname, G, dims, A,
                                      kktreg=kktreg,
                                      factor_dtype=fd)
        Pw = kktmod.wrap_P(fname, P,
                           factor_dtype=(fd if fd == "float32"
                                         else None))
        return _coneqp_solve(
            dims, factor_W=lambda W: factor(W, Pw),
            factor_W64=factor_W64,
            Pf=lambda x: mv(P, x),
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            q=q, h=h, b=b, n=q.shape[0], p=A.shape[0], dtype=q.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            correction=correction, show_progress=show_progress,
            debug=debug,
            relres_trigger=not ((dims.q or dims.s)
                                and "cholqr" in fname))

    return jax.jit(core)


@functools.lru_cache(maxsize=128)
def make_coneqp_cascade(dims: ConeDims, kktsolver: str = "default",
                        maxiters: int = 100, abstol: float = 1e-7,
                        reltol: float = 1e-6, feastol: float = 1e-7,
                        refinement: Optional[int] = None,
                        kktreg: Optional[float] = None,
                        correction: bool = True,
                        phase1_tol: float = 1e-4,
                        shared_GhAb: bool = True,
                        instrument: bool = False):
    """Progressive-precision coneqp for TPU batches:
    solve(P, q, G, h, A, b) with a leading batch axis on P and q (and
    on G/h/A/b too unless ``shared_GhAb``), solving to the full
    1e-7-class tolerances at close to f32 speed.

    Three phases:

      A. pure-f32 vmapped solve to `phase1_tol` — every op at
         TPU-native f32 rates (the bulk of the iterations);
      B. warm-started f64-residual / f32-factor solve (iterative
         refinement recovers f64-class KKT accuracy) from phase A's
         iterates down to the target tolerances — typically 3-5
         iterations;
      C. per-instance f64-factor rescue for anything phase B could not
         finish (restart semantics; zero cost when unused — see
         `_coneqp_solve`).

    Phase A's endpoint is an interior, approximately-centered iterate,
    so phase B is a textbook IPM warm start (initvals semantics,
    coneprog.py:1521-1530).  Total `iterations` counts all phases.
    Phases A and B+C are SEPARATE jitted programs (one jit holding
    both OOMs HBM at B=1024/n=256: each phase's temporaries are ~9 GB);
    the intermediate iterates stay on device.  Requires x64; inputs in
    f64.

    Cone-awareness: with 'q'/'s' blocks the ill-conditioning of the
    scaled Gram matrix near convergence is NOT diagonal (the SOC
    scaling's anisotropy grows like 1/mu within a block), so Jacobi
    equilibration cannot keep an f32 factor inside refinement's
    convergence region (measured: f32-factor coneqp diverges on SOC
    QPs at 1e-7).  Phase B then factors in full f64 directly — still
    only the last few warm-started iterations — and no separate
    rescue phase is needed.
    """
    kktsolver, refinement = _resolve_qp_opts(dims, kktsolver,
                                             refinement)
    mixed_ok = not (dims.q or dims.s)
    # q/s phase B factors in f32 through kkt_cholqr; its per-solve
    # error ~eps_f32*sqrt(kappa(S)) needs two refinement rounds near
    # 1e-7 (measured: one round leaves dres ~1e-9..1e-1 depending on
    # instance, two rounds are uniformly clean)
    refinement_b = max(1, refinement) if mixed_ok \
        else max(2, refinement)
    f32 = jnp.float32

    def phase_a(P, q, G, h, A, b):
        P1, q1, G1, h1, A1, b1 = (u.astype(f32)
                                  for u in (P, q, G, h, A, b))
        factor_a = kktmod.get_kktsolver(kktsolver, G1, dims, A1,
                                        kktreg=kktreg)
        raw = _coneqp_solve(
            dims, factor_W=lambda W: factor_a(W, P1),
            Pf=lambda x: mv(P1, x),
            Gf=lambda x: mv(G1, x), GTf=lambda z: mvt(G1, z),
            Af=lambda x: mv(A1, x), ATf=lambda y: mvt(A1, y),
            q=q1, h=h1, b=b1, n=q.shape[0], p=A.shape[0], dtype=f32,
            maxiters=maxiters, abstol=max(phase1_tol, abstol),
            reltol=max(phase1_tol, reltol),
            feastol=max(phase1_tol, feastol), refinement=0,
            correction=correction, show_progress=False)
        out = {k: raw[k] for k in ("x", "y", "s", "z", "iterations")}
        out["status"] = raw["status"]
        return out

    def phase_b(P, q, G, h, A, b, iv):
        if mixed_ok:
            bname = kktsolver
        else:
            # 'q'/'s' cones: the condition-halving QR strategy
            # (kkt.kkt_cholqr) keeps f32 factors inside refinement's
            # convergence region where an f32 Cholesky of the formed
            # normal equations cannot (kappa(R) = sqrt(kappa(S)));
            # anything it still cannot finish is compacted into the
            # host-level phase C
            bname = "cholqr_inv"
        factor_b = kktmod.get_kktsolver(bname, G, dims, A,
                                        kktreg=kktreg,
                                        factor_dtype="float32")
        Pb = kktmod.wrap_P(bname, P, factor_dtype="float32")
        return _coneqp_solve(
            dims, factor_W=lambda W: factor_b(W, Pb),
            detect_rescue=True,
            Pf=lambda x: mv(P, x),
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            q=q, h=h, b=b, n=q.shape[0], p=A.shape[0], dtype=q.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement_b,
            correction=correction, show_progress=False, initvals=iv,
            refine_pred=False, relres_trigger=mixed_ok)

    def phase_c(P, q, G, h, A, b):
        # full-f64 robust cold solve for the compacted stragglers
        rname = kktmod.robust_name(kktsolver)
        f64fac = kktmod.get_kktsolver(rname, G, dims, A,
                                      kktreg=kktreg, factor_dtype=None)
        P64 = kktmod.wrap_P(rname, P)
        return _coneqp_solve(
            dims, factor_W=lambda W: f64fac(W, P64),
            Pf=lambda x: mv(P, x),
            Gf=lambda x: mv(G, x), GTf=lambda z: mvt(G, z),
            Af=lambda x: mv(A, x), ATf=lambda y: mvt(A, y),
            q=q, h=h, b=b, n=q.shape[0], p=A.shape[0], dtype=q.dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=max(1, refinement),
            correction=correction, show_progress=False)

    data_axes = (0, 0, None, None, None, None) if shared_GhAb \
        else (0, 0, 0, 0, 0, 0)
    va = jax.jit(jax.vmap(phase_a, in_axes=data_axes))
    vb = jax.jit(jax.vmap(phase_b, in_axes=data_axes + (0,)))
    vc = jax.jit(jax.vmap(phase_c, in_axes=data_axes))

    out_keys = ("x", "y", "s", "z", "status", "gap", "relgap",
                "pcost", "dcost", "pres", "dres", "primal_slack",
                "dual_slack")

    def solve(P, q, G, h, A, b):
        # instrument=True adds host-visible per-phase wall times and
        # iteration counts under raw["profile"].  The value fetch
        # after each phase forces a real sync (block_until_ready does
        # not sync the remote backend) — opt-in because it serializes
        # the phase pipeline.
        import time as _time
        prof = {}
        t0 = _time.time()
        raw_a = va(P, q, G, h, A, b)
        if instrument:
            prof["a_iters"] = int(np.asarray(raw_a["iterations"]).sum())
            prof["a_s"] = round(_time.time() - t0, 3)
        iv = {k: raw_a[k].astype(jnp.asarray(P).dtype)
              for k in ("x", "y", "s", "z")}
        iv["_valid"] = raw_a["status"] == STATUS_OPTIMAL
        t0 = _time.time()
        raw = dict(vb(P, q, G, h, A, b, iv))
        if instrument:
            prof["b_iters"] = int(np.asarray(raw["iterations"]).sum())
            prof["b_s"] = round(_time.time() - t0, 3)
        raw["iterations"] = raw["iterations"] + raw_a["iterations"]
        raw["phase1_iterations"] = raw_a["iterations"]

        # ---- phase C: host-compacted f64 rescue ----------------------
        # Gather the (rare) flagged instances into a small padded
        # batch: an in-jit vmapped rescue loop would bill its
        # emulated-f64 factor to the whole batch for every rescue
        # iteration, while compaction pays per straggler.
        status = np.asarray(raw["status"])
        (flagged,) = np.nonzero(status == STATUS_NEEDS_F64)
        raw["rescue_iterations"] = jnp.zeros_like(raw["iterations"])
        t0 = _time.time()
        if flagged.size:
            nb = status.shape[0]
            # pad to the next power of two (bounded compile variants),
            # repeating the first straggler in the padding lanes
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
                    sub = vc(P[ii], q[ii], G, h, A, b)
                else:
                    sub = vc(P[ii], q[ii], G[ii], h[ii], A[ii], b[ii])
                take = np.unique(idx, return_index=True)
                src = jnp.asarray(take[1])
                dst = jnp.asarray(take[0])
                for k in out_keys:
                    raw[k] = raw[k].at[dst].set(sub[k][src])
                resc[take[0]] = np.asarray(sub["iterations"])[take[1]]
            raw["rescue_iterations"] = jnp.asarray(resc)
            raw["iterations"] = raw["iterations"] + \
                raw["rescue_iterations"]
        if instrument:
            prof["c_iters"] = int(np.asarray(
                raw["rescue_iterations"]).sum())
            prof["c_s"] = round(_time.time() - t0, 3)
            prof["c_instances"] = int(flagged.size)
            raw["profile"] = prof
        return raw

    return solve


def coneqp(P, q, G=None, h=None, dims=None, A=None, b=None,
           initvals=None, kktsolver=None, options=None, **kwargs):
    """Solve a cone QP; returns the reference-format result dict
    (coneprog.py:125-283, no certificate entries)."""
    from cvxopt_tpu.solvers import options as global_options
    opts = dict(global_options)
    if options:
        opts.update(options)
    q = jnp.asarray(q)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    q = q.astype(dtype).reshape(-1)
    n = q.shape[0]
    custom_kkt = callable(kktsolver)
    P_is_op = isinstance(P, LinearOperator) or (callable(P)
                                                and custom_kkt)
    if not P_is_op:
        P = jnp.asarray(P, dtype=dtype).reshape(n, n)
        P = 0.5 * (P + P.T)
    if G is None and h is None:
        G = jnp.zeros((0, n), dtype=dtype)
        h = jnp.zeros((0,), dtype=dtype)
        if dims is None:
            dims = ConeDims(l=0)
    _, G, h, dims, A, b = _prep_inputs(q, G, h, dims, A, b, dtype=dtype,
                                       allow_ops=custom_kkt)
    maxiters = int(opts.get("maxiters", 100))
    abstol = float(opts.get("abstol", 1e-7))
    reltol = float(opts.get("reltol", 1e-6))
    feastol = float(opts.get("feastol", 1e-7))
    show_progress = bool(opts.get("show_progress", False))
    correction = bool(opts.get("use_correction", True))
    refinement = opts.get("refinement", None)
    # default 'auto': on TPU with x64, mixed-precision factors with the
    # two-phase f64 rescue (kkt.resolve_factor_dtype); None elsewhere
    factor_dtype = kktmod.resolve_factor_dtype(
        opts.get("factor_dtype", "auto"))
    if factor_dtype is not None and refinement is None:
        refinement = 1   # mixed precision needs one f64 IR round

    if not custom_kkt and initvals is None and not P_is_op:
        fn = make_coneqp(
            dims, kktsolver=kktsolver or "default", maxiters=maxiters,
            abstol=abstol, reltol=reltol, feastol=feastol,
            refinement=refinement, kktreg=opts.get("kktreg", None),
            correction=correction,
            factor_dtype=factor_dtype,
            show_progress=show_progress,
            debug=bool(opts.get("debug", False)))
        raw = fn(P, q, G, h, A, b)
        return finalize_qp_result(raw)

    # ---- advanced path: custom kkt / operators / warm starts ---------
    G_is_op = isinstance(G, LinearOperator) or callable(G)
    A_is_op = isinstance(A, LinearOperator) or callable(A)
    if A_is_op:
        pdim = A.shape[0] if isinstance(A, LinearOperator) \
            else b.shape[0]
    else:
        pdim = A.shape[0]
    if custom_kkt:
        fkey = kktsolver
    else:
        fkey, _ = _resolve_qp_opts(dims, kktsolver, refinement)
    _, refinement = _resolve_qp_opts(dims, "default", refinement)

    iv = None
    if initvals is not None:
        iv = {}
        for k in ("x", "y", "s", "z"):
            if k in initvals:
                v = jnp.asarray(initvals[k], dtype=dtype).reshape(-1)
                if k in ("s", "z"):
                    v = cones.symmetrize_lower(v, dims)
                    if float(cones.max_step(v, dims)) >= 0:
                        raise ValueError(f"initial {k} is not positive")
                iv[k] = v

    # cached advanced runner (see conelp._adv_runner): structure +
    # user-callable identities key the jit; matrices stay dynamic
    runner = _adv_qp_runner(
        dims, n, pdim, fkey, factor_dtype, opts.get("kktreg", None),
        P if P_is_op else None,
        G if G_is_op else None,
        A if A_is_op else None,
        maxiters, abstol, reltol, feastol, refinement, correction,
        show_progress, tuple(sorted(iv.keys())) if iv else None)
    raw = runner(None if P_is_op else P, q,
                 None if G_is_op else G, h,
                 None if A_is_op else A, b, iv)
    return finalize_qp_result(raw)


@functools.lru_cache(maxsize=64)
def _adv_qp_runner(dims, n, pdim, fkey, factor_dtype, kktreg,
                   Pop, Gop, Aop, maxiters, abstol, reltol, feastol,
                   refinement, correction, show_progress, iv_keys):
    """jit-cached advanced-path coneqp core (cf. conelp._adv_runner)."""
    custom_kkt = callable(fkey)

    def run(Pm, q, Gm, h, Am, b, iv):
        dtype = q.dtype
        if Pop is None:
            Pf = lambda x: mv(Pm, x)
        elif isinstance(Pop, LinearOperator):
            Pf = Pop.mv
        else:
            Pf = lambda x: Pop(x, "N")
        if Gop is None:
            Gf, GTf = (lambda x: mv(Gm, x)), (lambda z: mvt(Gm, z))
        elif isinstance(Gop, LinearOperator):
            Gf, GTf = Gop.mv, Gop.rmv
        else:
            Gf = lambda x: Gop(x, "N")
            GTf = lambda z: Gop(z, "T")
        if Aop is None:
            Af, ATf = (lambda x: mv(Am, x)), (lambda y_: mvt(Am, y_))
        elif isinstance(Aop, LinearOperator):
            Af, ATf = Aop.mv, Aop.rmv
        else:
            Af = lambda x: Aop(x, "N")
            ATf = lambda y_: Aop(y_, "T")

        factor_W64 = None
        if custom_kkt:
            factor_W = fkey
        else:
            fd = factor_dtype
            if fd == "rescue":
                rname = kktmod.robust_name(fkey)
                f64 = kktmod.get_kktsolver(
                    rname, Gm, dims, Am,
                    kktreg=kktreg, factor_dtype=None)
                P64 = kktmod.wrap_P(rname, Pm)
                factor_W64 = lambda W: f64(W, P64)
                fd = "float32"
            factor = kktmod.get_kktsolver(
                fkey, Gm, dims, Am, kktreg=kktreg, factor_dtype=fd)
            Pw = kktmod.wrap_P(fkey, Pm,
                               factor_dtype=(fd if fd == "float32"
                                             else None))
            factor_W = lambda W: factor(W, Pw)
        return _coneqp_solve(
            dims, factor_W=factor_W, factor_W64=factor_W64,
            Pf=Pf, Gf=Gf, GTf=GTf, Af=Af,
            ATf=ATf, q=q, h=h, b=b, n=n, p=pdim, dtype=dtype,
            maxiters=maxiters, abstol=abstol, reltol=reltol,
            feastol=feastol, refinement=refinement,
            correction=correction, show_progress=show_progress,
            initvals=iv)

    return jax.jit(run)


def finalize_qp_result(raw):
    """Reference result-dict format for coneqp (coneprog.py:2229-2234)."""
    status = int(raw["status"])

    def fin(v):
        v = float(v)
        return None if (v != v or abs(v) == float("inf")) else v

    return {
        "status": STATUS_STRINGS.get(status, "unknown"),
        "x": raw["x"], "y": raw["y"], "s": raw["s"], "z": raw["z"],
        "gap": fin(raw["gap"]),
        "relative gap": fin(raw["relgap"]),
        "primal objective": fin(raw["pcost"]),
        "dual objective": fin(raw["dcost"]),
        "primal infeasibility": fin(raw["pres"]),
        "dual infeasibility": fin(raw["dres"]),
        "primal slack": fin(raw["primal_slack"]),
        "dual slack": fin(raw["dual_slack"]),
        "iterations": int(raw["iterations"]),
    }
