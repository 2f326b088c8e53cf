"""MOSEK bridge (cvxopt_tpu.msk) translation-layer tests.

MOSEK is a commercial package not present in CI — the reference's own
test suite skips without a license (tests/test_mosek.py).  Here the
bridge is exercised against a STUB `mosek` module that (a) captures
the task data the bridge submits, (b) interprets it under MOSEK's
documented conventions as the reference understands them
(msk.py:121-190: suc = inequality dual z, suc - slc = equality dual
y), and (c) solves the reconstructed problem with the native
cvxopt_tpu solvers.  A translation error in the bridge therefore
shows up as a wrong answer, not just a schema mismatch."""

import sys
import types

import numpy as np
import pytest


def _make_stub():
    mosek = types.ModuleType("mosek")

    class _Enum:
        def __init__(self, name):
            self.name = name

        def __repr__(self):
            return self.name

    for group, names in [
        ("boundkey", ["up", "lo", "fx", "fr", "ra"]),
        ("objsense", ["minimize", "maximize"]),
        ("solsta", ["optimal", "prim_infeas_cer", "dual_infeas_cer",
                    "unknown", "integer_optimal"]),
        ("soltype", ["bas", "itr", "itg"]),
        ("solitem", ["xx", "suc", "slc"]),
        ("conetype", ["quad", "rquad"]),
        ("variabletype", ["type_int", "type_cont"]),
        ("streamtype", ["log", "msg"]),
    ]:
        holder = types.SimpleNamespace(
            **{nm: _Enum(f"{group}.{nm}") for nm in names})
        setattr(mosek, group, holder)

    class Task:
        def __init__(self, env, *a):
            self.params = []
            self.cones = []
            self.ints = []
            self.Q = None
            self.data = None
            self.sol = None

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def set_Stream(self, *a):
            pass

        def putintparam(self, p, v):
            self.params.append((p, v))

        putdouparam = putstrparam = putintparam

        def inputdata(self, numcon, numvar, c, cfix, ptrb, ptre, sub,
                      val, bkc, blc, buc, bkx, blx, bux):
            self.data = dict(numcon=numcon, numvar=numvar,
                             c=np.asarray(c, float),
                             ptrb=list(ptrb), ptre=list(ptre),
                             sub=list(sub), val=list(val),
                             bkc=list(bkc), blc=list(blc),
                             buc=list(buc), bkx=list(bkx),
                             blx=list(blx), bux=list(bux))

        def putobjsense(self, s):
            self.sense = s

        def putqobj(self, rows, cols, vals):
            self.Q = (list(rows), list(cols), list(vals))

        def putvartype(self, i, t):
            self.ints.append(i)

        def appendcone(self, ct, par, idx):
            self.cones.append(list(idx))

        def writetask(self, f):
            pass

        def _matrix(self):
            d = self.data
            A = np.zeros((d["numcon"], d["numvar"]))
            for j in range(d["numvar"]):
                for k in range(d["ptrb"][j], d["ptre"][j]):
                    A[d["sub"][k], j] = d["val"][k]
            return A

        def optimize(self):
            from cvxopt_tpu import solvers, glpk
            bk = sys.modules["mosek"].boundkey
            d = self.data
            A = self._matrix()
            nv, nc = d["numvar"], d["numcon"]
            eq = [i for i in range(nc) if d["bkc"][i] is bk.fx]
            up = [i for i in range(nc) if d["bkc"][i] is bk.up]
            lo = [j for j in range(nv) if d["bkx"][j] is bk.lo]
            conev = sorted({j for cn in self.cones for j in cn})
            # rows: Gx <= h from 'up' constraints and -v_j <= -blx
            G = np.concatenate([A[up], -np.eye(nv)[lo]], axis=0) \
                if (up or lo) else np.zeros((0, nv))
            hv = np.concatenate(
                [np.asarray([d["buc"][i] for i in up]),
                 -np.asarray([d["blx"][j] for j in lo])]) \
                if (up or lo) else np.zeros((0,))
            Aeq = A[eq]
            beq = np.asarray([d["buc"][i] for i in eq])
            l = G.shape[0]
            Gq, hq = [], []
            for cn in self.cones:
                E = np.zeros((len(cn), nv))
                for r, j in enumerate(cn):
                    E[r, j] = -1.0
                Gq.append(E)
                hq.append(np.zeros(len(cn)))
            dims = {"l": l, "q": [len(cn) for cn in self.cones],
                    "s": []}
            Gfull = np.concatenate([G] + Gq, axis=0) if Gq else G
            hfull = np.concatenate([hv] + hq) if hq else hv
            c = d["c"]
            solsta = sys.modules["mosek"].solsta
            if self.ints:
                st, x = glpk.ilp(c, Gfull, hfull,
                                 Aeq if len(eq) else None,
                                 beq if len(eq) else None,
                                 I=set(self.ints))[:2]
                self.sol = dict(x=np.asarray(x) if x is not None
                                else None, z=None, y=None)
                self.solsta = (solsta.integer_optimal
                               if st == "optimal" else solsta.unknown)
                return
            if self.Q is not None:
                P = np.zeros((nv, nv))
                r, cc, v = self.Q
                for i, j, w in zip(r, cc, v):
                    P[i, j] = w
                    P[j, i] = w
                sol = solvers.qp(P, c, Gfull, hfull,
                                 A=Aeq if len(eq) else None,
                                 b=beq if len(eq) else None)
            else:
                sol = solvers.conelp(
                    c, Gfull, hfull, dims=dims,
                    A=Aeq if len(eq) else None,
                    b=beq if len(eq) else None)
            st = sol["status"]
            self.solsta = {"optimal": solsta.optimal,
                           "primal infeasible": solsta.prim_infeas_cer,
                           "dual infeasible": solsta.dual_infeas_cer,
                           }.get(st, solsta.unknown)
            if st != "optimal":
                self.sol = dict(x=None, z=None, y=None)
                return
            x = np.asarray(sol["x"]).reshape(-1)
            zfull = np.asarray(sol["z"]).reshape(-1)
            # constraint duals in MOSEK convention:
            #   'up' rows: suc = z >= 0;  'fx' rows: suc - slc = y
            suc = np.zeros(nc)
            slc = np.zeros(nc)
            for r, i in enumerate(up):
                suc[i] = zfull[r]
            y = (np.asarray(sol["y"]).reshape(-1)
                 if len(eq) else np.zeros(0))
            for r, i in enumerate(eq):
                suc[i] = max(y[r], 0.0)
                slc[i] = max(-y[r], 0.0)
            self.sol = dict(x=x, suc=suc, slc=slc)

        def getsolsta(self, st):
            return self.solsta

        def getsolutionslice(self, soltype, item, first, last, out):
            it = sys.modules["mosek"].solitem
            if self.sol["x"] is None:
                return
            if item is it.xx:
                src = self.sol["x"]
            elif item is it.suc:
                src = self.sol["suc"]
            else:
                src = self.sol["slc"]
            for k, i in enumerate(range(first, last)):
                out[k] = float(src[i]) if i < len(src) else 0.0

    class Env:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def Task(self, *a):
            return Task(self, *a)

    mosek.Env = Env
    mosek.Task = Task
    return mosek


@pytest.fixture()
def stub_mosek(monkeypatch):
    stub = _make_stub()
    monkeypatch.setitem(sys.modules, "mosek", stub)
    return stub


def test_msk_lp_roundtrip(stub_mosek):
    from cvxopt_tpu import msk
    c = np.array([-4.0, -5.0])
    G = np.array([[2.0, 1.0], [1.0, 2.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([3.0, 3.0, 0.0, 0.0])
    solsta, x, z, y = msk.lp(c, G, h)
    assert solsta is stub_mosek.solsta.optimal
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-6)
    # KKT: c + G'z = 0, z >= 0
    assert np.all(np.asarray(z) >= -1e-9)
    np.testing.assert_allclose(c + G.T @ z, 0.0, atol=1e-6)


def test_msk_lp_with_equalities(stub_mosek):
    from cvxopt_tpu import msk
    c = np.array([-4.0, -5.0])
    G = np.array([[2.0, 1.0], [1.0, 2.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([3.0, 3.0, 0.0, 0.0])
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    solsta, x, z, y = msk.lp(c, G, h, A, b)
    assert solsta is stub_mosek.solsta.optimal
    np.testing.assert_allclose(A @ x, b, atol=1e-6)
    np.testing.assert_allclose(c + G.T @ z + A.T @ y, 0.0, atol=1e-5)


def test_msk_conelp_socp(stub_mosek):
    from cvxopt_tpu import msk
    # min -x0 s.t. x0 <= 0.5, ||x1|| <= x0-ish via a q cone on slacks
    c = np.array([-1.0, 0.0])
    G = np.vstack([[1.0, 0.0],            # l row: x0 <= 0.5
                   [-1.0, 0.0],           # q rows: s = (x0, x1) in Q
                   [0.0, -1.0]])
    h = np.array([0.5, 0.0, 0.0])
    solsta, x, z = msk.conelp(c, G, h, {"l": 1, "q": [2], "s": []})
    assert solsta is stub_mosek.solsta.optimal
    assert abs(x[0] - 0.5) < 1e-5
    assert abs(x[1]) <= 0.5 + 1e-6


def test_msk_qp(stub_mosek):
    from cvxopt_tpu import msk
    P = np.array([[2.0, 0.0], [0.0, 2.0]])
    q = np.array([-2.0, -2.0])
    G = np.eye(2)
    h = np.array([0.5, 2.0])
    solsta, x, z, y = msk.qp(P, q, G, h)
    assert solsta is stub_mosek.solsta.optimal
    np.testing.assert_allclose(x, [0.5, 1.0], atol=1e-5)


def test_msk_ilp(stub_mosek):
    from cvxopt_tpu import msk
    c = np.array([-1.0, -1.0])
    G = np.array([[2.0, 1.0], [1.0, 2.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([3.2, 3.2, 0.0, 0.0])
    solsta, x = msk.ilp(c, G, h, I={0, 1})
    assert solsta is stub_mosek.solsta.integer_optimal
    np.testing.assert_allclose(x, np.round(x), atol=1e-6)


def test_solvers_lp_mosek_dispatch(stub_mosek):
    from cvxopt_tpu import solvers
    c = np.array([-4.0, -5.0])
    G = np.array([[2.0, 1.0], [1.0, 2.0], [-1.0, 0.0], [0.0, -1.0]])
    h = np.array([3.0, 3.0, 0.0, 0.0])
    sol = solvers.lp(c, G, h, solver="mosek")
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0],
                               atol=1e-6)
    assert sol["primal infeasibility"] < 1e-6
    assert sol["dual infeasibility"] < 1e-5


def test_solvers_lp_mosek_infeasible(stub_mosek):
    from cvxopt_tpu import solvers
    c = np.array([1.0])
    G = np.array([[1.0], [-1.0]])
    h = np.array([-1.0, -1.0])          # x <= -1 and x >= 1
    sol = solvers.lp(c, G, h, solver="mosek")
    assert sol["status"] == "primal infeasible"
    assert sol["x"] is None


def test_msk_missing_package_raises(monkeypatch):
    import importlib
    monkeypatch.setitem(sys.modules, "mosek", None)
    from cvxopt_tpu import msk
    with pytest.raises((ImportError, TypeError)):
        msk.lp(np.array([1.0]), np.array([[1.0]]), np.array([1.0]))
