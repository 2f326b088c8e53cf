"""MPS I/O tests (reference: tests/test_modeling.py:59-63 — the
boeing2.mps load-and-solve baseline named in BASELINE.json)."""

import io
import os

import numpy as np

from cvxopt_tpu.mpsio import mps_load, mps_write
from cvxopt_tpu import solvers

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_boeing2_load():
    d = mps_load(os.path.join(DATA, "boeing2.mps"))
    assert d.name == "BOEING2"
    assert len(d.var_names) == 143
    assert len(d.row_names) == 166


def test_boeing2_solve_optimal():
    """BASELINE config 1: boeing2.mps LP via conelp solves to 'optimal'
    and matches the known NETLIB objective -315.0187280."""
    d = mps_load(os.path.join(DATA, "boeing2.mps"))
    c, G, h, A, b = d.to_lp()
    sol = solvers.lp(c, G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    assert abs(sol["primal objective"] - (-315.0187280)) < 1e-3


def test_mps_roundtrip():
    d = mps_load(os.path.join(DATA, "boeing2.mps"))
    buf = io.StringIO()
    mps_write(buf, d)
    buf.seek(0)
    d2 = mps_load(buf)
    assert d2.var_names == d.var_names
    np.testing.assert_allclose(d2.c, d.c, rtol=1e-10)
    np.testing.assert_allclose(d2.Arows, d.Arows, rtol=1e-10)
    np.testing.assert_allclose(d2.rlo, d.rlo, rtol=1e-9)
    np.testing.assert_allclose(d2.rhi, d.rhi, rtol=1e-9)
    np.testing.assert_allclose(d2.lo, d.lo, rtol=1e-9)
    np.testing.assert_allclose(d2.hi, d.hi, rtol=1e-9)


def test_objsense_max():
    """OBJSENSE MAXIMIZE (both free-format one-line and sectioned
    forms) normalizes to minimize form with `maximize=True`."""
    mps = """NAME          MAXLP
OBJSENSE
    MAXIMIZE
ROWS
 N  COST
 L  LIM1
COLUMNS
    X1        COST      1.0        LIM1      1.0
    X2        COST      2.0        LIM1      1.0
RHS
    RHS       LIM1      4.0
BOUNDS
 UP BND       X1        3.0
 UP BND       X2        3.0
ENDATA
"""
    d = mps_load(io.StringIO(mps))
    assert d.maximize
    np.testing.assert_allclose(d.c, [-1.0, -2.0])
    c, G, h, A, b = d.to_lp()
    sol = solvers.lp(c, G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    # max x1+2x2 s.t. x1+x2<=4, 0<=x<=3 -> x=(1,3), obj 7
    assert abs(-sol["primal objective"] - 7.0) < 1e-5

    one_line = mps.replace("OBJSENSE\n    MAXIMIZE", "OBJSENSE MAX")
    d2 = mps_load(io.StringIO(one_line))
    assert d2.maximize
    np.testing.assert_allclose(d2.c, d.c)
