"""Floor planning (reference examples/doc/chap9/floorplan.py,
solvers.rst §9.2): cpl with a 5-component nonlinear constraint block
plus 26 linear inequalities — exercises mnl > 1 with the autodiff
Hessian path."""

import numpy as np
import jax.numpy as jnp
import pytest

from cvxopt_tpu.cvxprog import cpl


RHO, GAMMA = 1.0, 5.0


def build_linear():
    """The 26 linear constraints from the published problem statement
    (variables [W, H, x(5), y(5), w(5), h(5)])."""
    G = np.zeros((26, 22))
    h = np.zeros(26)
    W, H = 0, 1
    x = lambda k: 2 + k
    y = lambda k: 7 + k
    w = lambda k: 12 + k
    hh = lambda k: 17 + k
    r = 0

    def le(coeffs, rhs):     # sum coeffs_i v_i <= rhs
        nonlocal r
        for idx, cf in coeffs:
            G[r, idx] += cf
        h[r] = rhs
        r += 1

    for k in (0, 1, 3):                       # x1, x2, x4 >= 0
        le([(x(k), -1.0)], 0.0)
    le([(x(0), 1.0), (w(0), 1.0), (x(2), -1.0)], -RHO)
    le([(x(1), 1.0), (w(1), 1.0), (x(2), -1.0)], -RHO)
    le([(x(2), 1.0), (w(2), 1.0), (x(4), -1.0)], -RHO)
    le([(x(3), 1.0), (w(3), 1.0), (x(4), -1.0)], -RHO)
    le([(x(4), 1.0), (w(4), 1.0), (W, -1.0)], 0.0)
    for k in (1, 2, 4):                       # y2, y3, y5 >= 0
        le([(y(k), -1.0)], 0.0)
    le([(y(1), 1.0), (hh(1), 1.0), (y(0), -1.0)], -RHO)
    le([(y(0), 1.0), (hh(0), 1.0), (y(3), -1.0)], -RHO)
    le([(y(2), 1.0), (hh(2), 1.0), (y(3), -1.0)], -RHO)
    le([(y(3), 1.0), (hh(3), 1.0), (H, -1.0)], 0.0)
    le([(y(4), 1.0), (hh(4), 1.0), (H, -1.0)], 0.0)
    for k in range(5):                        # h/gamma <= w <= gamma*h
        le([(hh(k), 1.0 / GAMMA), (w(k), -1.0)], 0.0)
        le([(w(k), 1.0), (hh(k), -GAMMA)], 0.0)
    assert r == 26
    return G, h


def test_floorplan():
    Amin = np.array([100., 100., 100., 100., 100.])
    Aj = jnp.asarray(Amin)

    def F(xv):
        wv = xv[12:17]
        hv = xv[17:22]
        # NaN outside the domain h > 0 (the reference returns None)
        safe = jnp.where(hv > 0, hv, jnp.nan)
        return -wv + Aj / safe

    c = np.zeros(22)
    c[0] = c[1] = 1.0
    G, h = build_linear()
    x0 = np.zeros(22)
    x0[17:] = 1.0
    sol = cpl(c, F, x0, G, h)
    assert sol["status"] == "optimal"
    xv = np.asarray(sol["x"])
    W, H = xv[0], xv[1]
    w, hgt = xv[12:17], xv[17:22]
    # areas achieved, aspect ratios within bounds, box consistent
    assert np.all(w * hgt >= Amin * (1 - 1e-4))
    assert np.all(w <= GAMMA * hgt + 1e-6)
    assert np.all(hgt / GAMMA <= w + 1e-6)
    assert W + H < 100.0
    # objective consistency
    assert abs(sol["primal objective"] - (W + H)) < 1e-5
    # no box smaller than the area lower bound sqrt(5*100) per side
    assert W + H >= 2 * np.sqrt(500.0) - 2.0
