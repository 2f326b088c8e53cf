"""Single-core numpy reference QP solver (nonnegative-orthant cone).

Serves two roles (mirrors the reference's dual Python/C kernel pattern,
misc.py:25-28, where the pure-Python fallbacks define semantics):

  1. golden cross-check for the JAX solvers in tests (same algorithm,
     independent implementation and arithmetic);
  2. the single-core CPU baseline in bench.py — CVXOPT's hot path is
     LAPACK potrf/potrs driven from interpreted Python, which is
     exactly what this is (scipy.linalg wraps the same LAPACK).

Algorithm: the reference coneqp specialized to dims = {'l': m}
(/root/reference/src/python/coneprog.py:1440-2547): infeasible-start
Mehrotra predictor-corrector, NT scaling W = sqrt(s/z), kkt_chol2-style
normal-equations factorization with a Schur complement for equalities
(misc.py:1352).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla


def coneqp_np(P, q, G, h, A=None, b=None, maxiters=100, abstol=1e-7,
              reltol=1e-6, feastol=1e-7):
    """Solve min 1/2 x'Px + q'x  s.t. Gx + s = h, s >= 0, Ax = b.

    Returns dict(x, y, s, z, status, iterations, gap)."""
    n = q.shape[0]
    m = G.shape[0]
    if A is None:
        A = np.zeros((0, n))
        b = np.zeros(0)
    p = A.shape[0]

    resx0 = max(1.0, np.linalg.norm(q))
    resy0 = max(1.0, np.linalg.norm(b))
    resz0 = max(1.0, np.linalg.norm(h))

    def factor(d):
        # W = diag(d); S = P + G' W^{-2} G;  K = A S^{-1} A'
        D = 1.0 / (d * d)
        S = P + (G.T * D) @ G
        cS = sla.cho_factor(S, lower=True)
        if p:
            SiAT = sla.cho_solve(cS, A.T)
            cK = sla.cho_factor(A @ SiAT, lower=True)
        else:
            cK = None

        def solve(bx, by, bz):
            # solves [P A' G'; A 0 0; G 0 -W'W][ux,uy,uz] = [bx,by,bz],
            # returning (ux, uy, W uz)
            r = bx + G.T @ (D * bz)
            if p:
                uy = sla.cho_solve(cK, A @ sla.cho_solve(cS, r) - by)
                ux = sla.cho_solve(cS, r - A.T @ uy)
            else:
                uy = by
                ux = sla.cho_solve(cS, r)
            uz = (G @ ux - bz) / d
            return ux, uy, uz

        return solve

    # initial point (coneprog.py:2044-2106)
    f = factor(np.ones(m))
    x, y, z = f(-q, b, h)
    s = -z
    ts = -s.min() if m else 0.0
    if ts >= -1e-8 * max(1.0, np.linalg.norm(s)):
        s += 1.0 + ts
    tz = -z.min() if m else 0.0
    if tz >= -1e-8 * max(1.0, np.linalg.norm(z)):
        z += 1.0 + tz

    lmbda = np.sqrt(s * z)
    W = np.sqrt(s / z)
    gap = s @ z

    for iters in range(maxiters + 1):
        Px = P @ x
        rx = Px + q + A.T @ y + G.T @ z
        ry = A @ x - b
        rz = s + G @ x - h
        pcost = 0.5 * x @ Px + q @ x
        dcost = pcost + y @ ry + z @ rz - gap
        relgap = gap / -pcost if pcost < 0 else (
            gap / dcost if dcost > 0 else np.inf)
        pres = max(np.linalg.norm(ry) / resy0,
                   np.linalg.norm(rz) / resz0)
        dres = np.linalg.norm(rx) / resx0
        if (pres <= feastol and dres <= feastol
                and (gap <= abstol or relgap <= reltol)):
            return dict(x=x, y=y, s=s, z=z, status="optimal",
                        iterations=iters, gap=gap)
        if iters == maxiters:
            return dict(x=x, y=y, s=s, z=z, status="unknown",
                        iterations=iters, gap=gap)

        f3 = factor(W)
        lsq = lmbda * lmbda
        mu = gap / m

        def f4(bx, by, bz, bs):
            us = bs / lmbda
            uz = bz - W * us
            ux, uy, uz = f3(bx, by, uz)
            return ux, uy, uz, us - uz

        # predictor
        dx, dy, dz, ds = f4(-rx, -ry, -rz, -lsq)
        dsdz = ds @ dz
        ws3 = ds * dz
        ds_l = ds / lmbda
        dz_l = dz / lmbda
        t = max(0.0, -ds_l.min() if m else 0.0,
                -dz_l.min() if m else 0.0)
        step = 1.0 if t == 0 else min(1.0, 1.0 / t)
        sigma = min(1.0, max(0.0,
                             1.0 - step + dsdz / gap * step ** 2)) ** 3

        # corrector
        dx, dy, dz, ds = f4(-rx, -ry, -rz, -lsq - ws3 + sigma * mu)
        ds_l = ds / lmbda
        dz_l = dz / lmbda
        t = max(0.0, -ds_l.min() if m else 0.0,
                -dz_l.min() if m else 0.0)
        step = 1.0 if t == 0 else min(1.0, 0.99 / t)

        x += step * dx
        y += step * dy
        dsw = lmbda * (1.0 + step * ds_l)   # updated scaled s
        dzw = lmbda * (1.0 + step * dz_l)
        lmbda = np.sqrt(dsw * dzw)
        W *= np.sqrt(dsw / dzw)
        s = W * lmbda
        z = lmbda / W
        gap = lmbda @ lmbda

    return dict(x=x, y=y, s=s, z=z, status="unknown",
                iterations=maxiters, gap=gap)


# ---------------------------------------------------------------------------
# General-cone reference (dims with 'l', 'q', 's') — the single-core
# baseline for the SOCP/SDP benchmark configs and the golden twin for
# the JAX q/s-cone solvers.  Same role as `coneqp_np` above: the
# reference coneqp algorithm (coneprog.py:1440-2547) with NT scaling
# over the full symmetric cone (misc.py:250-634), driven from
# interpreted Python over numpy/LAPACK — cost-profile-equivalent to
# CVXOPT's own Python + BLAS/LAPACK hot path.  's' blocks are stored
# fully symmetric (m*m), as in cvxopt_tpu.cones.


class _NpDims:
    def __init__(self, l=0, q=(), s=()):
        self.l = int(l)
        self.q = [int(m) for m in q]
        self.s = [int(m) for m in s]
        self.qdim = sum(self.q)
        self.sdim = sum(m * m for m in self.s)
        self.cdim = self.l + self.qdim + self.sdim
        self.cdim_diag = self.l + self.qdim + sum(self.s)
        self.qoff = []
        off = self.l
        for m in self.q:
            self.qoff.append(off)
            off += m
        self.soff, self.sdoff = [], []
        doff = self.l + self.qdim
        for m in self.s:
            self.soff.append(off)
            off += m * m
            self.sdoff.append(doff)
            doff += m


def _qv(x, dims, k):
    """View of q-block k; broadcasts over leading axes."""
    off, m = dims.qoff[k], dims.q[k]
    return x[..., off:off + m]


def _sv(x, dims, k):
    off, m = dims.soff[k], dims.s[k]
    return x[..., off:off + m * m].reshape(x.shape[:-1] + (m, m))


def _jdot(u, v):
    return u[..., 0] * v[..., 0] - np.sum(u[..., 1:] * v[..., 1:], -1)


def _jnrm2(u):
    a = np.linalg.norm(u[..., 1:], axis=-1)
    return np.sqrt(np.maximum(u[..., 0] - a, 0.0)) * \
        np.sqrt(np.maximum(u[..., 0] + a, 0.0))


def _np_identity(dims):
    e = np.zeros(dims.cdim)
    e[:dims.l] = 1.0
    for k in range(len(dims.q)):
        e[dims.qoff[k]] = 1.0
    for k, m in enumerate(dims.s):
        e[dims.soff[k]:dims.soff[k] + m * m] = np.eye(m).reshape(-1)
    return e


def _np_max_step(x, dims):
    ts = [0.0]
    if dims.l:
        ts.append(-x[..., :dims.l].min())
    for k in range(len(dims.q)):
        xk = _qv(x, dims, k)
        ts.append(np.linalg.norm(xk[1:]) - xk[0])
    for k in range(len(dims.s)):
        ts.append(-np.linalg.eigvalsh(_sv(x, dims, k))[0])
    return max(ts) if (dims.l or dims.q or dims.s) else 0.0


def _np_scale(x, W, dims, trans="N", inverse="N"):
    out = x.copy()
    if dims.l:
        d = W["d"] if inverse == "N" else 1.0 / W["d"]
        out[..., :dims.l] = x[..., :dims.l] * d
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        v, beta = W["v"][k], W["beta"][k]
        xk = x[..., off:off + m]
        if inverse == "N":
            w = np.sum(v * xk, -1, keepdims=True)
            Jx = np.concatenate([xk[..., :1], -xk[..., 1:]], -1)
            new = beta * (2.0 * v * w - Jx)
        else:
            t = _jdot(v, xk)[..., None]
            y = 2.0 * v * t - xk
            Jy = np.concatenate([y[..., :1], -y[..., 1:]], -1)
            new = Jy / beta
        out[..., off:off + m] = new
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        X = _sv(x, dims, k)
        if inverse == "N":
            r = W["r"][k]
            new = r.T @ X @ r if trans == "N" else r @ X @ r.T
        else:
            rti = W["rti"][k]
            new = rti @ X @ rti.T if trans == "N" else rti.T @ X @ rti
        out[..., off:off + m * m] = new.reshape(x.shape[:-1] + (m * m,))
    return out


def _np_scale2(lmbda, x, dims, inverse="N"):
    out = x.copy()
    if dims.l:
        if inverse == "N":
            out[:dims.l] = x[:dims.l] / lmbda[:dims.l]
        else:
            out[:dims.l] = x[:dims.l] * lmbda[:dims.l]
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        xk, lk = x[off:off + m], lmbda[off:off + m]
        a = _jnrm2(lk)
        lbar = lk / a
        if inverse == "N":
            lx = float(_jdot(lbar, xk))
            c = (lx + xk[0]) / (lbar[0] + 1.0)
            out[off] = lx / a
            out[off + 1:off + m] = (xk[1:] - c * lbar[1:]) / a
        else:
            lx = float(np.dot(lbar, xk))
            c = (lx + xk[0]) / (lbar[0] + 1.0)
            out[off] = lx * a
            out[off + 1:off + m] = (xk[1:] + c * lbar[1:]) * a
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        lk = lmbda[dims.sdoff[k]:dims.sdoff[k] + m]
        f = np.sqrt(lk[:, None] * lk[None, :])
        X = _sv(x, dims, k)
        out[off:off + m * m] = (X / f if inverse == "N"
                                else X * f).reshape(-1)
    return out


def _np_compute_scaling(s, z, dims):
    W = {"d": np.sqrt(s[:dims.l] / z[:dims.l]),
         "beta": [], "v": [], "r": [], "rti": []}
    lmbda = np.zeros(dims.cdim_diag)
    lmbda[:dims.l] = np.sqrt(s[:dims.l] * z[:dims.l])
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        sk, zk = s[off:off + m], z[off:off + m]
        aa, bb = _jnrm2(sk), _jnrm2(zk)
        W["beta"].append(np.sqrt(aa / bb))
        cc = np.sqrt((np.dot(sk, zk) / (aa * bb) + 1.0) / 2.0)
        sbar, zbar = sk / aa, zk / bb
        Jz = np.concatenate([zbar[:1], -zbar[1:]])
        v = (sbar + Jz) / (2.0 * cc)
        v[0] += 1.0
        v /= np.sqrt(2.0 * v[0])
        W["v"].append(v)
        dd = 2.0 * cc + sbar[0] + zbar[0]
        lk = np.concatenate(
            [[cc], ((cc + zbar[0]) / dd) * sbar[1:]
             + ((cc + sbar[0]) / dd) * zbar[1:]]) * np.sqrt(aa * bb)
        lmbda[off:off + m] = lk
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        Sk = s[off:off + m * m].reshape(m, m)
        Zk = z[off:off + m * m].reshape(m, m)
        Ls = np.linalg.cholesky(Sk)
        Lz = np.linalg.cholesky(Zk)
        U_, lam, Vt = np.linalg.svd(Lz.T @ Ls)
        V = Vt.T
        r = (Ls @ V) / np.sqrt(lam)[None, :]
        rti = sla.solve_triangular(Ls.T, V, lower=False) * \
            np.sqrt(lam)[None, :]
        W["r"].append(r)
        W["rti"].append(rti)
        lmbda[dims.sdoff[k]:dims.sdoff[k] + m] = lam
    return W, lmbda


def _np_update_scaling(W, lmbda, s, z, dims):
    """NT update (misc.py:422-634 semantics): 'l'/'q' parts of s, z are
    new iterates in the current scaling; 's' parts are square factors
    (see cvxopt_tpu.scaling.update_scaling)."""
    lnew = lmbda.copy()
    if dims.l:
        rs = np.sqrt(s[:dims.l])
        rz = np.sqrt(z[:dims.l])
        W["d"] = W["d"] * rs / rz
        lnew[:dims.l] = rs * rz
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        v, beta = W["v"][k], W["beta"][k]
        sk, zk = s[off:off + m], z[off:off + m]
        aa, bb = _jnrm2(sk), _jnrm2(zk)
        sbar, zbar = sk / aa, zk / bb
        cc = np.sqrt((1.0 + np.dot(sbar, zbar)) / 2.0)
        vs = float(np.dot(v, sbar))
        vz = float(_jdot(v, zbar))
        vq = (vs + vz) / (2.0 * cc)
        vu = vs - vz
        w0 = 2.0 * v[0] * vq - (sbar[0] + zbar[0]) / (2.0 * cc)
        dd = (v[0] * vu - sbar[0] / 2.0 + zbar[0] / 2.0) / (w0 + 1.0)
        l1 = v[1:] * (2.0 * (-dd * vq + 0.5 * vu)) + \
            0.5 * (1.0 - dd / cc) * sbar[1:] + \
            0.5 * (1.0 + dd / cc) * zbar[1:]
        lnew[off:off + m] = np.concatenate([[cc], l1]) * np.sqrt(aa * bb)
        Jsbar = np.concatenate([sbar[:1], -sbar[1:]])
        vn = 2.0 * vq * v - (Jsbar + zbar) / (2.0 * cc)
        vn[0] += 1.0
        vn /= np.sqrt(2.0 * vn[0])
        W["v"][k] = vn
        W["beta"][k] = beta * np.sqrt(aa / bb)
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        Ls = _sv(s, dims, k)
        Lz = _sv(z, dims, k)
        U_, lam, Vt = np.linalg.svd(Lz.T @ Ls)
        V = Vt.T
        isq = 1.0 / np.sqrt(lam)
        W["r"][k] = (W["r"][k] @ (Ls @ V)) * isq[None, :]
        W["rti"][k] = (W["rti"][k] @ (Lz @ U_)) * isq[None, :]
        lnew[dims.sdoff[k]:dims.sdoff[k] + m] = lam
    return W, lnew


def _np_sinv(bs, lmbda, dims):
    out = bs.copy()
    if dims.l:
        out[:dims.l] = bs[:dims.l] / lmbda[:dims.l]
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        xk, lk = bs[off:off + m], lmbda[off:off + m]
        aa = float(_jdot(lk, lk))
        cc, dd = xk[0], float(np.dot(lk[1:], xk[1:]))
        out[off] = (cc * lk[0] - dd) / aa
        out[off + 1:off + m] = ((aa / lk[0]) * xk[1:] +
                                (dd / lk[0] - cc) * lk[1:]) / aa
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        lk = lmbda[dims.sdoff[k]:dims.sdoff[k] + m]
        gam = 0.5 * (lk[:, None] + lk[None, :])
        out[off:off + m * m] = (_sv(bs, dims, k) / gam).reshape(-1)
    return out


def _np_sprod(x, y, dims):
    out = x * y
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        xk, yk = x[off:off + m], y[off:off + m]
        out[off] = np.dot(xk, yk)
        out[off + 1:off + m] = yk[0] * xk[1:] + xk[0] * yk[1:]
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        X, Y = _sv(x, dims, k), _sv(y, dims, k)
        out[off:off + m * m] = (0.5 * (X @ Y + Y @ X)).reshape(-1)
    return out


def _np_ssqr_full(lmbda, dims):
    """lmbda o lmbda expanded to FULL (cdim) storage."""
    out = np.zeros(dims.cdim)
    out[:dims.l] = lmbda[:dims.l] ** 2
    for k in range(len(dims.q)):
        off, m = dims.qoff[k], dims.q[k]
        lk = lmbda[off:off + m]
        out[off] = np.dot(lk, lk)
        out[off + 1:off + m] = 2.0 * lk[0] * lk[1:]
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        lk = lmbda[dims.sdoff[k]:dims.sdoff[k] + m]
        out[off:off + m * m] = np.diag(lk ** 2).reshape(-1)
    return out


def _np_diag_embed(lmbda, dims):
    out = np.zeros(dims.cdim)
    nq = dims.l + dims.qdim
    out[:nq] = lmbda[:nq]
    for k in range(len(dims.s)):
        off, m = dims.soff[k], dims.s[k]
        lk = lmbda[dims.sdoff[k]:dims.sdoff[k] + m]
        out[off:off + m * m] = np.diag(lk).reshape(-1)
    return out


def coneqp_np_cones(P, q, G, h, dims, A=None, b=None, maxiters=100,
                    abstol=1e-7, reltol=1e-6, feastol=1e-7,
                    refinement=1):
    """General-cone coneqp: min 1/2 x'Px + q'x s.t. Gx + s = h,
    s in K = R^l_+ x SOC(q) x PSD(s), Ax = b.  dims is a
    {'l','q','s'} dict.  Returns dict(x, y, s, z, status, iterations,
    gap, pres, dres)."""
    dims = _NpDims(dims.get("l", 0), dims.get("q", ()),
                   dims.get("s", ()))
    n = q.shape[0]
    if A is None:
        A = np.zeros((0, n))
        b = np.zeros(0)
    p = A.shape[0]
    e = _np_identity(dims)

    resx0 = max(1.0, np.linalg.norm(q))
    resy0 = max(1.0, np.linalg.norm(b))
    resz0 = max(1.0, np.linalg.norm(h))

    def factor(W):
        Gs = _np_scale(G.T, W, dims, trans="T", inverse="I").T
        S = P + Gs.T @ Gs
        cS = sla.cho_factor(S, lower=True)
        if p:
            SiAT = sla.cho_solve(cS, A.T)
            cK = sla.cho_factor(A @ SiAT, lower=True)

        def solve(bx, by, bz):
            zs = _np_scale(_np_scale(bz, W, dims, trans="T",
                                     inverse="I"), W, dims,
                           inverse="I")
            r = bx + G.T @ zs
            t = sla.cho_solve(cS, r)
            if p:
                uy = sla.cho_solve(cK, A @ t - by)
                ux = t - SiAT @ uy
            else:
                uy = by
                ux = t
            Wuz = _np_scale(G @ ux - bz, W, dims, trans="T",
                            inverse="I")
            return ux, uy, Wuz

        return solve

    # initial point
    Wid = {"d": np.ones(dims.l), "beta": [np.ones(()) for _ in dims.q],
           "v": [], "r": [], "rti": []}
    for k, m in enumerate(dims.q):
        v = np.zeros(m)
        v[0] = 1.0
        Wid["v"].append(v)
    for m in dims.s:
        Wid["r"].append(np.eye(m))
        Wid["rti"].append(np.eye(m))
    f0 = factor(Wid)
    x, y, z = f0(-q, b, h)
    s = -z
    ts = _np_max_step(s, dims)
    if ts >= -1e-8 * max(1.0, np.linalg.norm(s)):
        s = s + (1.0 + ts) * e
    tz = _np_max_step(z, dims)
    if tz >= -1e-8 * max(1.0, np.linalg.norm(z)):
        z = z + (1.0 + tz) * e

    W, lmbda = _np_compute_scaling(s, z, dims)
    gap = float(np.dot(s, z))
    nlq = dims.l + dims.qdim

    for iters in range(maxiters + 1):
        Px = P @ x
        rx = Px + q + A.T @ y + G.T @ z
        ry = A @ x - b
        rz = s + G @ x - h
        pcost = 0.5 * float(x @ Px) + float(q @ x)
        dcost = pcost + float(y @ ry) + float(z @ rz) - gap
        relgap = gap / -pcost if pcost < 0 else (
            gap / dcost if dcost > 0 else np.inf)
        pres = max(np.linalg.norm(ry) / resy0,
                   np.linalg.norm(rz) / resz0)
        dres = np.linalg.norm(rx) / resx0
        if (pres <= feastol and dres <= feastol
                and (gap <= abstol or relgap <= reltol)):
            return dict(x=x, y=y, s=s, z=z, status="optimal",
                        iterations=iters, gap=gap, pres=pres,
                        dres=dres)
        if iters == maxiters:
            return dict(x=x, y=y, s=s, z=z, status="unknown",
                        iterations=iters, gap=gap, pres=pres,
                        dres=dres)

        f3 = factor(W)
        lsq_full = _np_ssqr_full(lmbda, dims)
        mu = gap / dims.cdim_diag

        def f4_no_ir(bx, by_, bz, bs):
            us = _np_sinv(bs, lmbda, dims)
            uz = bz - _np_scale(us, W, dims, trans="T")
            ux, uy, uz = f3(bx, by_, uz)
            return ux, uy, uz, us - uz

        def f4(bx, by_, bz, bs):
            u = f4_no_ir(bx, by_, bz, bs)
            for _ in range(refinement):
                ux, uy, uz, us = u
                wz3 = _np_scale(uz, W, dims, inverse="I")
                vx = bx - P @ ux - A.T @ uy - G.T @ wz3
                vy = by_ - A @ ux
                vz = bz - G @ ux - _np_scale(us, W, dims, trans="T")
                lam_us_uz = _np_sprod(
                    _np_diag_embed(lmbda, dims), us + uz, dims)
                vs = bs - lam_us_uz
                du = f4_no_ir(vx, vy, vz, vs)
                u = tuple(a + d for a, d in zip(u, du))
            return u

        # predictor
        dx, dy, dz, ds = f4(-rx, -ry, -rz, -lsq_full)
        dsdz = float(np.dot(ds, dz))
        ws3 = _np_sprod(ds, dz, dims)
        ds_sc = _np_scale2(lmbda, ds, dims)
        dz_sc = _np_scale2(lmbda, dz, dims)
        t = max(_np_max_step(ds_sc, dims), _np_max_step(dz_sc, dims),
                0.0)
        step = 1.0 if t == 0 else min(1.0, 1.0 / t)
        sigma = min(1.0, max(0.0,
                             1.0 - step + dsdz / gap * step ** 2)) ** 3

        # corrector
        dx, dy, dz, ds = f4(-rx, -ry, -rz,
                            -lsq_full + sigma * mu * e - ws3)
        ds_sc = _np_scale2(lmbda, ds, dims)
        dz_sc = _np_scale2(lmbda, dz, dims)
        # eigendecompose the 's' blocks for the scaling update
        sigs, sigz = [], []
        for k in range(len(dims.s)):
            off, m = dims.soff[k], dims.s[k]
            w_, V_ = np.linalg.eigh(_sv(ds_sc, dims, k))
            sigs.append(w_)
            ds_sc[off:off + m * m] = V_.reshape(-1)
            w_, V_ = np.linalg.eigh(_sv(dz_sc, dims, k))
            sigz.append(w_)
            dz_sc[off:off + m * m] = V_.reshape(-1)
        tcands = [0.0]
        # max_step over l/q parts of the scaled directions
        if dims.l:
            tcands.append(-ds_sc[:dims.l].min())
            tcands.append(-dz_sc[:dims.l].min())
        for k in range(len(dims.q)):
            xk = _qv(ds_sc, dims, k)
            tcands.append(np.linalg.norm(xk[1:]) - xk[0])
            xk = _qv(dz_sc, dims, k)
            tcands.append(np.linalg.norm(xk[1:]) - xk[0])
        for k in range(len(dims.s)):
            tcands.append(-sigs[k][0])
            tcands.append(-sigz[k][0])
        t = max(tcands)
        step = 1.0 if t == 0 else min(1.0, 0.99 / t)

        x = x + step * dx
        y = y + step * dy

        ds2, dz2 = ds_sc.copy(), dz_sc.copy()
        ds2[:nlq] = e[:nlq] + step * ds_sc[:nlq]
        dz2[:nlq] = e[:nlq] + step * dz_sc[:nlq]
        ds2 = _np_scale2(lmbda, ds2, dims, inverse="I")
        dz2 = _np_scale2(lmbda, dz2, dims, inverse="I")
        for k in range(len(dims.s)):
            off, m = dims.soff[k], dims.s[k]
            lk = lmbda[dims.sdoff[k]:dims.sdoff[k] + m]
            cs = np.sqrt((1.0 + step * sigs[k]) / lk)
            cz = np.sqrt((1.0 + step * sigz[k]) / lk)
            ds2[off:off + m * m] = (_sv(ds2, dims, k)
                                    * cs[None, :]).reshape(-1)
            dz2[off:off + m * m] = (_sv(dz2, dims, k)
                                    * cz[None, :]).reshape(-1)
        W, lmbda = _np_update_scaling(W, lmbda, ds2, dz2, dims)
        lam_full = _np_diag_embed(lmbda, dims)
        s = _np_scale(lam_full, W, dims, trans="T")
        z = _np_scale(lam_full, W, dims, inverse="I")
        gap = float(np.dot(lmbda, lmbda))

    return dict(x=x, y=y, s=s, z=z, status="unknown",
                iterations=maxiters, gap=gap, pres=pres, dres=dres)
