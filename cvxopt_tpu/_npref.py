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
