"""Nonlinear convex solvers: cpl, cp, gp.

TPU-native re-design of /root/reference/src/python/cvxprog.py
(`cvxopt.solvers.cpl/cp/gp`):

  cpl: minimize c'x  s.t.  f(x) <= 0, G x <= h (cone), A x = b
       with f: R^n -> R^mnl convex and twice differentiable;
  cp:  minimize f0(x) s.t. fk(x) <= 0, ... — epigraph reduction to cpl
       (cvxprog.py:1359-1964);
  gp:  geometric program in convex (log) form via stabilized
       log-sum-exp (cvxprog.py:1967-2153).

TPU-first differences from the reference:
  - the user supplies f as a PURE JAX FUNCTION (plus the starting
    point x0); the gradient Df and Hessian H(x, z) = sum_k z_k
    nabla^2 f_k(x) come from jax.jacfwd / jax.hessian automatically —
    the reference makes users return (f, Df, H) matrices by hand
    (cvxprog.py:68-96);
  - domain handling: f returns NaN outside its domain (e.g. log of a
    negative number) and the line search backtracks on NaN — the
    jit-compatible analogue of "F(x) returns None" (cvxprog.py:1052);
  - the merit-function line search (phi = theta1*gap + theta2*||rx|| +
    theta3*||rznl||, cvxprog.py:1065-1161) runs as lax.while_loops,
    including the MAX_RELAXED_ITERS relaxed-line-search state machine
    (cvxprog.py:1081-1261): relaxed single-step series with state
    save/restore, resumed standard backtracking when a series fails,
    and singular-KKT recovery to the saved state — all as selects over
    a carried `saved` context (pass max_relaxed=0 for plain
    backtracking);
  - the whole solve is one jit-compiled lax.while_loop, vmap-batchable.

Status codes: 0 optimal, 3 unknown (maxiters), 4 unknown (singular).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cvxopt_tpu import cones
from cvxopt_tpu.ops.matvec import mv, mvt, vdot
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import scaling as nt
from cvxopt_tpu import kkt as kktmod
from cvxopt_tpu.conelp import (
    STATUS_RUNNING, STATUS_OPTIMAL, STATUS_UNKNOWN_MAXITERS,
    STATUS_UNKNOWN_SINGULAR, STATUS_STRINGS,
)

# constants (cvxprog.py:384-388)
STEP = 0.99
BETA = 0.5
ALPHA = 0.01
EXPON = 3
MAX_RELAXED_ITERS = 8
MAX_LS_ITERS = 40


def make_cpl(dims: ConeDims, f: Callable, kktsolver: str = "default",
             maxiters: int = 100, abstol: float = 1e-7,
             reltol: float = 1e-6, feastol: float = 1e-7,
             refinement: int = 1, kktreg: Optional[float] = None,
             max_relaxed: int = MAX_RELAXED_ITERS,
             show_progress: bool = False, matrix_free: bool = False,
             factor_dtype: Optional[str] = None):
    """Build the jitted cpl core: g(c, x0, G, h, A, b) -> result arrays.

    `dims.mnl` must equal the output length of `f`; `f` must be a pure
    JAX function R^n -> R^mnl, NaN outside its domain.

    `matrix_free=True` is the operator-form Df/H mode (the analogue of
    the reference's "Df and H may be Python functions" contract,
    cvxprog.py:286-402 level-2 customization): the dense mnl-by-n
    Jacobian and n-by-n weighted Hessian are never materialized —
    every Df@u / Df'@v / H@u in the algorithm becomes a jvp / vjp /
    Hessian-vector product of `f`.  Intended for large n where the
    dense forms don't fit or dominate; requires a custom `kktsolver`
    callable (x, znl, W) -> solve, exactly as the reference requires
    a custom kktsolver for operator-form problems.
    """
    assert dims.mnl > 0, "cpl requires a nonlinear block (dims.mnl > 0)"
    custom_kkt = callable(kktsolver)
    if matrix_free and not custom_kkt:
        raise ValueError(
            "matrix_free=True (operator-form Df/H) requires a custom "
            "kktsolver callable, as in the reference")
    if kktsolver == "default":
        kktsolver = "chol"   # cvxprog.py:426-430 ('chol' when q/s; the
        #                      dense condensed path covers 'l' too)

    if matrix_free:
        Df_fn = None

        def Df_mv(x, u):
            return jax.jvp(f, (x,), (u,))[1]

        def Df_rmv(x, v):
            return jax.vjp(f, x)[1](v)[0]

        def H_mv(x, znl, u):
            g = jax.grad(lambda w: jnp.dot(znl, f(w)))
            return jax.jvp(g, (x,), (u,))[1]
    else:
        Df_fn = jax.jacfwd(f)

    def H_fn(x, znl):
        return jax.hessian(lambda u: jnp.dot(znl, f(u)))(x)

    def core(c, x0, G, h, A, b):
        n = c.shape[0]
        p = A.shape[0]
        dtype = c.dtype
        mnl = dims.mnl
        e = cones.cone_identity(dims, dtype=dtype)
        e_lq = e[:dims.lnl + dims.qdim]

        if custom_kkt:
            # reference contract: kktsolver(x, z[:mnl], W) -> solve
            # (cvxprog.py:518-537); the user evaluates f/Df/H itself
            factor3 = kktsolver
        else:
            # mixed precision is OPT-IN here ('float32'): the cpl
            # KKT matrix changes every iteration (H depends on x), so
            # the two-phase rescue machinery of conelp/coneqp does not
            # apply; f64 refinement still recovers accuracy on
            # well-conditioned problems
            factor = kktmod.get_kktsolver(kktsolver, G, dims, A,
                                          mnl=mnl, kktreg=kktreg,
                                          factor_dtype=factor_dtype)
            factor3 = None

        # initial points (cvxprog.py:556-570): s = z = e
        x = x0
        y = jnp.zeros(p, dtype)
        s = e
        z = e
        W = nt.identity_scaling(dims, dtype=dtype)
        lmbda = cones.diag_part(e, dims)

        # scale factors fixed at iteration 0 (cvxprog.py:711-719)
        fx0 = f(x0)
        if matrix_free:
            dftz0 = Df_rmv(x0, z[:mnl])
        else:
            dftz0 = mvt(Df_fn(x0), z[:mnl])
        rx_init = c + mvt(A, y) + dftz0 + mvt(G, z[mnl:])
        resx_init = jnp.linalg.norm(rx_init)
        rznl_init = s[:mnl] + fx0
        resznl_init = jnp.linalg.norm(rznl_init)
        ry_init = mv(A, x) - b
        rzl_init = s[mnl:] + mv(G, x) - h
        pres_init = jnp.sqrt(jnp.linalg.norm(ry_init) ** 2
                             + resznl_init ** 2
                             + cones.sdot(rzl_init, rzl_init, dims) )
        gap0 = cones.sdot(s, z, dims)
        resx0 = jnp.maximum(1.0, resx_init)
        resznl0 = jnp.maximum(1.0, resznl_init)
        pres0 = jnp.maximum(1.0, pres_init)
        dres0 = jnp.maximum(1.0, resx_init)
        theta1 = 1.0 / gap0
        theta2 = 1.0 / resx0
        theta3 = 1.0 / resznl0

        nan = jnp.asarray(jnp.nan, dtype)
        zero = jnp.asarray(0.0, dtype)
        # placeholder saved line-search state (never read before the
        # first save; see the relaxed machinery in _iteration)
        saved0 = dict(
            phi=zero, dphi=zero, gap=zero, sigma=zero, dsdz=zero,
            step=jnp.asarray(1.0, dtype),
            x=x, y=y, s=s, z=z, W=W, lmbda=lmbda,
            dx=jnp.zeros(n, dtype), dy=jnp.zeros(p, dtype),
            ds2u=jnp.zeros(dims.cdim, dtype),
            dz2u=jnp.zeros(dims.cdim, dtype),
            dsq=jnp.zeros(dims.cdim, dtype),
            dzq=jnp.zeros(dims.cdim, dtype),
            sigs=jnp.zeros(dims.sdim_diag, dtype),
            sigz=jnp.zeros(dims.sdim_diag, dtype))
        state = dict(
            x=x, y=y, s=s, z=z, W=W, lmbda=lmbda,
            iters=jnp.asarray(0, jnp.int32),
            status=jnp.asarray(STATUS_RUNNING, jnp.int32),
            gap=gap0, pcost=nan, dcost=nan, relgap=nan, pres=nan,
            dres=nan,
            relaxed=jnp.asarray(0, jnp.int32), saved=saved0,
        )

        def cond(st):
            return st["status"] == STATUS_RUNNING

        def body(st):
            x, y, s, z = st["x"], st["y"], st["s"], st["z"]
            W, lmbda = st["W"], st["lmbda"]
            iters = st["iters"]
            relaxed_in, saved_in = st["relaxed"], st["saved"]

            fx = f(x)
            if matrix_free:
                Df, H = None, None
                dftz = Df_rmv(x, z[:mnl])
            else:
                Df = Df_fn(x)
                H = H_fn(x, z[:mnl])
                dftz = mvt(Df, z[:mnl])

            gap = cones.sdot(s, z, dims)

            # residuals (cvxprog.py:670-691)
            rx = c + mvt(A, y) + dftz + mvt(G, z[mnl:])
            resx = jnp.linalg.norm(rx)
            ry = mv(A, x) - b
            resy = jnp.linalg.norm(ry)
            rznl = s[:mnl] + fx
            resznl = jnp.linalg.norm(rznl)
            rzl = s[mnl:] + mv(G, x) - h
            reszl = jnp.sqrt(cones.sdot(rzl, rzl, dims))

            pcost = vdot(c, x)
            dcost = pcost + vdot(y, ry) + vdot(z[:mnl], rznl) \
                + cones.sdot(z[mnl:], rzl, dims) - gap
            inf = jnp.asarray(jnp.inf, dtype)
            relgap = jnp.where(
                pcost < 0.0, gap / -pcost,
                jnp.where(dcost > 0.0, gap / dcost, inf))
            pres = jnp.sqrt(resy ** 2 + resznl ** 2 + reszl ** 2) / pres0
            dres = resx / dres0
            phi = theta1 * gap + theta2 * resx + theta3 * resznl

            if show_progress:
                jax.debug.print(
                    "{i:2d}: {pc: 8.4e} {dc: 8.4e} {g: 4.0e} {pr:7.0e} "
                    "{dr:7.0e}",
                    i=iters, pc=pcost, dc=dcost, g=gap, pr=pres, dr=dres)

            optimal = ((pres <= feastol) & (dres <= feastol)
                       & ((gap <= abstol) | (relgap <= reltol)))
            maxed = iters >= maxiters
            new_status = jnp.where(
                optimal, STATUS_OPTIMAL,
                jnp.where(maxed, STATUS_UNKNOWN_MAXITERS,
                          STATUS_RUNNING)).astype(jnp.int32)
            exiting = new_status != STATUS_RUNNING

            upd = _iteration(x, y, s, z, W, lmbda, gap, phi, rx, ry,
                             rznl, rzl, resx, resznl, Df, H,
                             relaxed_in, saved_in)
            x2, y2, s2, z2, W2, lmbda2, r_new, saved_new = upd

            gap2 = cones.sdot(s2, z2, dims)
            ok = (jnp.isfinite(gap2) & jnp.isfinite(jnp.sum(lmbda2))
                  & jnp.isfinite(jnp.sum(x2)))
            # singular-KKT recovery during a relaxed series: restore
            # the saved state and retry with a standard line search
            # (cvxprog.py:785-820)
            if max_relaxed > 0:
                can_restore = ((~ok) & (relaxed_in > 0)
                               & (relaxed_in < max_relaxed) & ~exiting)
            else:
                can_restore = jnp.asarray(False)
            new_status = jnp.where(
                exiting, new_status,
                jnp.where(ok | can_restore, STATUS_RUNNING,
                          STATUS_UNKNOWN_SINGULAR))
            keep = exiting | (~ok)

            def sel(a, bnew):
                return jax.tree_util.tree_map(
                    lambda u, v: jnp.where(keep, u, v), a, bnew)

            def rsel(field, a, bnew):
                merged = sel(a, bnew)
                return jax.tree_util.tree_map(
                    lambda m, sv: jnp.where(can_restore, sv, m),
                    merged, saved_in[field])

            out = dict(st)
            out.update(gap=gap, pcost=pcost, dcost=dcost, relgap=relgap,
                       pres=pres, dres=dres)
            out["status"] = new_status
            out["iters"] = iters + jnp.where(
                keep | can_restore, 0, 1).astype(jnp.int32)
            out["x"] = rsel("x", x, x2)
            out["y"] = rsel("y", y, y2)
            out["s"] = rsel("s", s, s2)
            out["z"] = rsel("z", z, z2)
            out["W"] = rsel("W", W, W2)
            out["lmbda"] = rsel("lmbda", lmbda, lmbda2)
            out["relaxed"] = jnp.where(
                exiting, relaxed_in,
                jnp.where(can_restore, -1,
                          jnp.where(ok, r_new, relaxed_in))
            ).astype(jnp.int32)
            out["saved"] = jax.tree_util.tree_map(
                lambda sv, nw: jnp.where(keep | can_restore, sv, nw),
                saved_in, saved_new)
            return out

        def _iteration(x, y, s, z, W, lmbda, gap, phi, rx, ry, rznl,
                       rzl, resx, resznl, Df, H, relaxed, saved):
            lmbdasq = cones.ssqr(lmbda, dims)
            if matrix_free:
                def Hmul(u):
                    return H_mv(x, z[:mnl], u)

                def DfT(v):
                    return Df_rmv(x, v)

                def Dfm(u):
                    return Df_mv(x, u)
            else:
                def Hmul(u):
                    return H @ u

                def DfT(v):
                    return mvt(Df, v)

                def Dfm(u):
                    return Df @ u
            if custom_kkt:
                f3 = factor3(x, z[:mnl], W)
            else:
                f3 = factor(W, H, Df)

            def f4_no_ir(bx, by_, bz, bs):
                # (cvxprog.py:858-883)
                us = cones.sinv(bs, lmbda, dims)
                uz = bz - nt.scale(us, W, dims, trans="T")
                ux, uy, uz = f3(bx, by_, uz)
                us = us - uz
                return ux, uy, uz, us

            def resid4(ux, uy, uz, us, vx, vy, vz, vs):
                # (cvxprog.py:889-923)
                wz3 = nt.scale(uz, W, dims, inverse="I")
                vx = vx - Hmul(ux) - mvt(A, uy) - DfT(wz3[:mnl]) \
                    - mvt(G, wz3[mnl:])
                vy = vy - mv(A, ux)
                GGux = jnp.concatenate([Dfm(ux), mv(G, ux)])
                vz = vz - GGux - nt.scale(us, W, dims, trans="T")
                vs = vs - cones.sprod_diag(us + uz, lmbda, dims)
                return vx, vy, vz, vs

            def f4(bx, by_, bz, bs):
                u = f4_no_ir(bx, by_, bz, bs)
                for _ in range(refinement):
                    v = resid4(*u, bx, by_, bz, bs)
                    du = f4_no_ir(*v)
                    u = tuple(a + d for a, d in zip(u, du))
                return u

            mu = gap / dims.cdim_diag
            lmbdasq_full = cones.diag_embed(lmbdasq, dims)
            rz_full = jnp.concatenate([rznl, rzl])
            relaxed_ok = (relaxed >= 0) & (relaxed < max_relaxed) \
                if max_relaxed > 0 else jnp.asarray(False)

            def compute_direction(sigma):
                ds_in = -lmbdasq_full + sigma * mu * e
                dx, dy, dz, ds = f4(-rx, -ry, -rz_full, ds_in)
                dsdz = cones.sdot(ds, dz, dims)
                # unscaled steps for the line search (cvxprog.py:1031)
                dz2u = nt.scale(dz, W, dims, inverse="I")
                ds2u = nt.scale(ds, W, dims, trans="T")
                ds_sc = nt.scale2(lmbda, ds, dims)
                dz_sc = nt.scale2(lmbda, dz, dims)
                ts, sigs, dsq = cones.max_step_eig(ds_sc, dims)
                tz, sigz, dzq = cones.max_step_eig(dz_sc, dims)
                t = jnp.maximum(jnp.maximum(ts, tz), 0.0)
                step0 = jnp.where(t == 0.0, 1.0,
                                  jnp.minimum(1.0, STEP / t))
                return dict(dx=dx, dy=dy, ds2u=ds2u, dz2u=dz2u,
                            dsq=dsq, dzq=dzq, sigs=sigs, sigz=sigz,
                            dsdz=dsdz, step0=step0)

            def eval_phi(ctx, step):
                newx = ctx["x"] + step * ctx["dx"]
                newy = ctx["y"] + step * ctx["dy"]
                newz = ctx["z"] + step * ctx["dz2u"]
                news = ctx["s"] + step * ctx["ds2u"]
                newf = f(newx)
                if matrix_free:
                    ndftz = Df_rmv(newx, newz[:mnl])
                else:
                    ndftz = mvt(Df_fn(newx), newz[:mnl])
                newrx = c + mvt(A, newy) + ndftz + mvt(G, newz[mnl:])
                newresx = jnp.linalg.norm(newrx)
                newresznl = jnp.linalg.norm(news[:mnl] + newf)
                newgap = (1.0 - (1.0 - ctx["sigma"]) * step) \
                    * ctx["gap"] + step ** 2 * ctx["dsdz"]
                newphi = theta1 * newgap + theta2 * newresx \
                    + theta3 * newresznl
                return newgap, newphi

            # ---- predictor (i=0, cvxprog.py:966-1181) ----------------
            zero = jnp.asarray(0.0, dtype)
            D0 = compute_direction(zero)
            ctx0 = dict(x=x, y=y, s=s, z=z, sigma=zero, gap=gap,
                        dsdz=D0["dsdz"], dx=D0["dx"], dy=D0["dy"],
                        ds2u=D0["ds2u"], dz2u=D0["dz2u"])

            def p_cond(carry):
                step, k, done = carry
                return (~done) & (k < MAX_LS_ITERS)

            def p_body(carry):
                step, k, _ = carry
                newgap, newphi = eval_phi(ctx0, step)
                gap_cond = newgap <= (1.0 - ALPHA * step) * gap
                suff = newphi <= phi + ALPHA * step * (-phi)
                accept = gap_cond & (relaxed_ok | suff) \
                    & jnp.isfinite(newphi)
                return (jnp.where(accept, step, step * BETA),
                        k + 1, accept)

            step_p, _, _ = lax.while_loop(
                p_cond, p_body,
                (D0["step0"], jnp.asarray(0, jnp.int32),
                 jnp.asarray(False)))
            newgap_p, _ = eval_phi(ctx0, step_p)
            sigma = jnp.minimum(newgap_p / gap,
                                (newgap_p / gap) ** EXPON)

            # ---- corrector (i=1) with the relaxed line-search state
            # machine (cvxprog.py:1081-1261) ---------------------------
            D1 = compute_direction(sigma)
            dphi_c = -theta1 * (1.0 - sigma) * gap - theta2 * resx \
                - theta3 * resznl
            cur = dict(
                phi=phi, dphi=dphi_c, gap=gap, sigma=sigma,
                dsdz=D1["dsdz"], step=D1["step0"],
                x=x, y=y, s=s, z=z, W=W, lmbda=lmbda,
                dx=D1["dx"], dy=D1["dy"], ds2u=D1["ds2u"],
                dz2u=D1["dz2u"], dsq=D1["dsq"], dzq=D1["dzq"],
                sigs=D1["sigs"], sigz=D1["sigz"])

            # domain backtracking (cvxprog.py:1052-1062): shrink until
            # f is defined at the trial point
            def dom_cond(carry):
                step, k, done = carry
                return (~done) & (k < MAX_LS_ITERS)

            def dom_body(carry):
                step, k, _ = carry
                ok_ = jnp.all(jnp.isfinite(f(x + step * D1["dx"])))
                return (jnp.where(ok_, step, step * BETA), k + 1, ok_)

            step_dom, _, _ = lax.while_loop(
                dom_cond, dom_body,
                (D1["step0"], jnp.asarray(0, jnp.int32),
                 jnp.asarray(False)))
            cur["step"] = step_dom

            if max_relaxed > 0:
                _, newphi_d = eval_phi(cur, step_dom)
                suff_cur = (newphi_d <= phi + ALPHA * step_dom * dphi_c) \
                    & jnp.isfinite(newphi_d)
                suff_saved = (newphi_d <= saved["phi"] + ALPHA
                              * saved["step"] * saved["dphi"]) \
                    & jnp.isfinite(newphi_d)

                r = relaxed
                save_now = (r == 0) & ~suff_cur
                use_saved = (r == max_relaxed) & ~suff_saved
                need_bt = use_saved | (r == -1)
                r_new = jnp.where(
                    r == 0, jnp.where(suff_cur, 0, 1),
                    jnp.where((r > 0) & (r < max_relaxed),
                              jnp.where(suff_saved, 0, r + 1),
                              jnp.where(r == max_relaxed,
                                        jnp.where(suff_saved, 0, -1),
                                        0))).astype(jnp.int32)

                def tsel(pred, a_tree, b_tree):
                    return jax.tree_util.tree_map(
                        lambda a_, b_: jnp.where(pred, a_, b_),
                        a_tree, b_tree)

                saved_new = tsel(save_now, cur, saved)
                ctx_f = tsel(use_saved, saved, cur)

                # standard backtracking (r == -1, or resumed after a
                # failed relaxed series) on the selected context
                def bt_cond(carry):
                    step, k, done = carry
                    return (~done) & need_bt & (k < MAX_LS_ITERS)

                def bt_body(carry):
                    step, k, _ = carry
                    _, newphi = eval_phi(ctx_f, step)
                    accept = (newphi <= ctx_f["phi"] + ALPHA * step
                              * ctx_f["dphi"]) & jnp.isfinite(newphi)
                    return (jnp.where(accept, step, step * BETA),
                            k + 1, accept)

                bt_start = jnp.where(use_saved, saved["step"], step_dom)
                step_bt, _, _ = lax.while_loop(
                    bt_cond, bt_body,
                    (bt_start, jnp.asarray(0, jnp.int32),
                     jnp.asarray(False)))
                step = jnp.where(need_bt, step_bt, step_dom)
            else:
                # MAX_RELAXED_ITERS == 0: always standard backtracking
                def bt_cond0(carry):
                    step, k, done = carry
                    return (~done) & (k < MAX_LS_ITERS)

                def bt_body0(carry):
                    step, k, _ = carry
                    _, newphi = eval_phi(cur, step)
                    accept = (newphi <= phi + ALPHA * step * dphi_c) \
                        & jnp.isfinite(newphi)
                    return (jnp.where(accept, step, step * BETA),
                            k + 1, accept)

                step, _, _ = lax.while_loop(
                    bt_cond0, bt_body0,
                    (step_dom, jnp.asarray(0, jnp.int32),
                     jnp.asarray(False)))
                ctx_f = cur
                r_new = relaxed
                saved_new = saved

            # ---- update (cvxprog.py:1264-1355) on the (possibly
            # restored) context -----------------------------------------
            lmbda_f = ctx_f["lmbda"]
            W_f = ctx_f["W"]
            x2 = ctx_f["x"] + step * ctx_f["dx"]
            y2 = ctx_f["y"] + step * ctx_f["dy"]

            nlq = dims.lnl + dims.qdim
            ds2 = ctx_f["dsq"].at[:nlq].set(
                e_lq + step * ctx_f["dsq"][:nlq])
            dz2 = ctx_f["dzq"].at[:nlq].set(
                e_lq + step * ctx_f["dzq"][:nlq])
            ds2 = nt.scale2(lmbda_f, ds2, dims, inverse="I")
            dz2 = nt.scale2(lmbda_f, dz2, dims, inverse="I")

            if dims.s:
                lam_s = lmbda_f[nlq:]
                sig_s = (1.0 + step * ctx_f["sigs"]) / lam_s
                sig_z = (1.0 + step * ctx_f["sigz"]) / lam_s
                for run in dims.s_runs:
                    off, doff, cnt, m = run
                    i0 = doff - nlq
                    cs = jnp.sqrt(sig_s[i0:i0 + cnt * m]).reshape(cnt, m)
                    cz = jnp.sqrt(sig_z[i0:i0 + cnt * m]).reshape(cnt, m)
                    Vs = cones.sview(ds2, run) * cs[..., None, :]
                    Vz = cones.sview(dz2, run) * cz[..., None, :]
                    ds2 = ds2.at[off:off + cnt * m * m].set(
                        Vs.reshape(-1))
                    dz2 = dz2.at[off:off + cnt * m * m].set(
                        Vz.reshape(-1))

            W2, lmbda2 = nt.update_scaling(W_f, lmbda_f, ds2, dz2, dims)
            lam_full = cones.diag_embed(lmbda2, dims)
            s2 = nt.scale(lam_full, W2, dims, trans="T")
            z2 = nt.scale(lam_full, W2, dims, inverse="I")
            return x2, y2, s2, z2, W2, lmbda2, r_new, saved_new

        final = lax.while_loop(cond, body, state)
        ts = cones.max_step(final["s"], dims)
        tz = cones.max_step(final["z"], dims)
        return dict(
            x=final["x"], y=final["y"], s=final["s"], z=final["z"],
            status=final["status"], iterations=final["iters"],
            gap=final["gap"], relgap=final["relgap"],
            pcost=final["pcost"], dcost=final["dcost"],
            pres=final["pres"], dres=final["dres"],
            primal_slack=-ts, dual_slack=-tz,
        )

    return jax.jit(core)


def _prep_nl(G, h, dims, A, b, n, mnl, dtype):
    if G is None:
        G = jnp.zeros((0, n), dtype=dtype)
        h = jnp.zeros((0,), dtype=dtype)
    G = jnp.asarray(G, dtype=dtype).reshape(-1, n)
    h = jnp.asarray(h, dtype=dtype).reshape(-1)
    if dims is None:
        dims = ConeDims(l=h.shape[0], mnl=mnl)
    elif isinstance(dims, dict):
        dims = ConeDims.from_dict(dims, mnl=mnl)
    elif dims.mnl != mnl:
        dims = ConeDims(l=dims.l, q=dims.q, s=dims.s, mnl=mnl)
    if A is None:
        A = jnp.zeros((0, n), dtype=dtype)
    A = jnp.asarray(A, dtype=dtype).reshape(-1, n)
    if b is None:
        b = jnp.zeros((A.shape[0],), dtype=dtype)
    b = jnp.asarray(b, dtype=dtype).reshape(-1)
    # symmetrize 's' rows (reference 'L'-storage read semantics)
    h_full = jnp.concatenate([jnp.zeros((mnl,), dtype), h])
    h_full = cones.symmetrize_lower(h_full, dims)
    h = h_full[mnl:]
    Gt = jnp.concatenate([jnp.zeros((mnl, G.shape[1]), dtype), G])
    Gt = jnp.swapaxes(
        cones.symmetrize_lower(jnp.swapaxes(Gt, 0, 1), dims), 0, 1)
    G = Gt[mnl:]
    return G, h, dims, A, b


def _nl_result(raw, mnl):
    """cpl/cp result dict (cvxprog.py:750-755): snl/sl/znl/zl split."""
    status = int(raw["status"])

    def fin(v):
        v = float(v)
        return None if (v != v or abs(v) == float("inf")) else v

    s = np.asarray(raw["s"])
    z = np.asarray(raw["z"])
    return {
        "status": STATUS_STRINGS.get(status, "unknown"),
        "x": raw["x"], "y": raw["y"],
        "snl": s[:mnl], "sl": s[mnl:],
        "znl": z[:mnl], "zl": z[mnl:],
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


def _opts(options):
    from cvxopt_tpu.solvers import options as global_options
    opts = dict(global_options)
    if options:
        opts.update(options)
    return opts


def cpl(c, F, x0, G=None, h=None, dims=None, A=None, b=None,
        kktsolver=None, options=None, matrix_free=False):
    """Solve min c'x s.t. F(x) <= 0 (componentwise, convex), Gx+s=h,
    Ax=b (cvxprog.py:35).  `F` is a pure JAX function R^n -> R^mnl
    (NaN outside its domain); `x0` must be strictly in the domain.

    `matrix_free=True` never materializes Df/H (jvp/vjp/hvp operator
    form); requires a custom `kktsolver` callable."""
    opts = _opts(options)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    c = jnp.asarray(c, dtype=dtype).reshape(-1)
    x0 = jnp.asarray(x0, dtype=dtype).reshape(-1)
    n = c.shape[0]
    mnl = int(jax.eval_shape(F, x0).shape[0])
    if not bool(jnp.all(jnp.isfinite(F(x0)))):
        # reference: F() must return a point in the domain of f
        # (cvxprog.py:68-75)
        raise ValueError("x0 must be in the domain of F")
    G, h, dims, A, b = _prep_nl(G, h, dims, A, b, n, mnl, dtype)
    core = make_cpl(
        dims, F,
        kktsolver=kktsolver or "default",
        maxiters=int(opts.get("maxiters", 100)),
        abstol=float(opts.get("abstol", 1e-7)),
        reltol=float(opts.get("reltol", 1e-6)),
        feastol=float(opts.get("feastol", 1e-7)),
        refinement=int(opts.get("refinement", 1)),
        kktreg=opts.get("kktreg", None),
        show_progress=bool(opts.get("show_progress", False)),
        matrix_free=matrix_free,
        factor_dtype=opts.get("factor_dtype", None),
    )
    raw = core(c, x0, G, h, A, b)
    return _nl_result(raw, mnl)


def cp(F, x0, G=None, h=None, dims=None, A=None, b=None,
       kktsolver=None, options=None, matrix_free=False):
    """Solve min f0(x) s.t. fk(x) <= 0, Gx+s=h, Ax=b (cvxprog.py:1359).

    `F` is a pure JAX function R^n -> R^(1+mnl); F(x)[0] is the
    objective.  Epigraph reduction (cvxprog.py:1746-1964): minimize t
    s.t. f0(x) - t <= 0, fk(x) <= 0 over the variable [x; t]."""
    opts = _opts(options)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x0 = jnp.asarray(x0, dtype=dtype).reshape(-1)
    n = x0.shape[0]
    m_all = int(jax.eval_shape(F, x0).shape[0])
    mnl = m_all  # f0 becomes the epigraph constraint f0(x) - t <= 0

    def Fe(xt):
        v = F(xt[:n])
        return v.at[0].add(-xt[n])

    ce = jnp.zeros(n + 1, dtype).at[n].set(1.0)
    x0e = jnp.concatenate([x0, F(x0)[:1] + 1.0])

    if G is None and h is None:
        Ge = None
        he = None
    else:
        G_ = jnp.asarray(G, dtype=dtype).reshape(-1, n)
        Ge = jnp.concatenate(
            [G_, jnp.zeros((G_.shape[0], 1), dtype)], axis=1)
        he = h
    if A is not None:
        A_ = jnp.asarray(A, dtype=dtype).reshape(-1, n)
        Ae = jnp.concatenate(
            [A_, jnp.zeros((A_.shape[0], 1), dtype)], axis=1)
    else:
        Ae = None

    sol = cpl(ce, Fe, x0e, Ge, he, dims, Ae, b, kktsolver=kktsolver,
              options=options, matrix_free=matrix_free)
    if sol["x"] is not None:
        x_full = np.asarray(sol["x"])
        sol["x"] = x_full[:n]
        sol["primal objective"] = float(
            np.asarray(F(jnp.asarray(x_full[:n])))[0]
        ) if sol["status"] == "optimal" else sol["primal objective"]
    return sol


def gp(K, F, g, G=None, h=None, A=None, b=None, options=None):
    """Geometric program in convex form (cvxprog.py:1967):

        minimize    lse(F[0] x + g[0])
        subject to  lse(F[k] x + g[k]) <= 0,  k = 1..mnl
                    G x <= h,  A x = b

    where lse(u) = log sum exp(u) and the rows of F/entries of g are
    partitioned by K (K[i] terms for posynomial i).  Uses the
    stabilized softmax form (cvxprog.py:2102-2153) via
    jax.nn.logsumexp."""
    import jax.nn

    K = [int(k) for k in K]
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Fm = jnp.asarray(F, dtype=dtype)
    gv = jnp.asarray(g, dtype=dtype).reshape(-1)
    n = Fm.shape[1]
    starts = np.cumsum([0] + K)

    def Fe(x):
        u = Fm @ x + gv
        return jnp.stack([
            jax.nn.logsumexp(u[int(starts[i]):int(starts[i + 1])])
            for i in range(len(K))
        ])

    x0 = jnp.zeros(n, dtype)
    return cp(Fe, x0, G, h, None, A, b, options=options)
