"""Integration tests for conelp/coneqp and the lp/qp/socp/sdp
front-ends, mirroring the reference's example-based test strategy
(/root/reference/tests/test_examples.py): the documented example
problems with their known solutions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvxopt_tpu import solvers
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.coneqp import make_coneqp


def test_doc_lp():
    """examples/doc/chap8/lp.py: x ~ [1, 1]."""
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    sol = solvers.lp(c, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0],
                               atol=1e-5)


def test_doc_conelp():
    """examples/doc/chap8/conelp.py (l=2, q=[4,4], s=[3])."""
    cols = [
        [16., 7., 24., -8., 8., -1., 0., -1., 0., 0., 7., -5., 1., -5.,
         1., -7., 1., -7., -4.],
        [-14., 2., 7., -13., -18., 3., 0., 0., -1., 0., 3., 13., -6.,
         13., 12., -10., -6., -10., -28.],
        [5., 0., -15., 12., -6., 17., 0., 0., 0., -1., 9., 6., -6., 6.,
         -7., -7., -6., -7., -11.]]
    G = np.array(cols).T
    c = np.array([-6., -4., -5.])
    h = np.array([-3., 5., 12., -2., -14., -13., 10., 0., 0., 0., 68.,
                  -30., -19., -30., 99., 23., -19., 23., 10.])
    dims = {'l': 2, 'q': [4, 4], 's': [3]}
    sol = solvers.conelp(c, G, h, dims)
    assert sol["status"] == "optimal"
    # documented solution (CVXOPT user guide section 8.1)
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-1.220915, 0.096633, 3.577502],
                               atol=1e-4)


def test_doc_coneqp():
    """examples/doc/chap8/coneqp.py: x ~ [0.72558, 0.61806, 0.30254]
    (reference tests/test_examples.py:26-30, 5 places)."""
    A = np.array([[.3, .6, -.3],
                  [-.4, 1.2, .0],
                  [-.2, -1.7, .6],
                  [-.4, .3, -1.2],
                  [1.3, -.3, -2.0]])
    b = np.array([1.5, .0, -1.2, -.7, .0])
    m, n = A.shape
    I = np.eye(n)
    G = np.concatenate([-I, np.zeros((1, n)), I], axis=0)
    h = np.array(n * [0.0] + [1.0] + n * [0.0])
    dims = {'l': n, 'q': [n + 1], 's': []}
    sol = solvers.coneqp(A.T @ A, -A.T @ b, G, h, dims)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(
        np.asarray(sol["x"]), [0.72558319, 0.61806264, 0.30253528],
        atol=1e-5)


def test_doc_socp():
    """examples/doc/chap8/socp.py."""
    c = np.array([-2., 1., 5.])
    # cvxopt matrix(...) columns -> transpose
    G0 = np.array([[12., 13., 12.], [6., -3., -12.],
                   [-5., -5., 6.]]).T
    G1 = np.array([[3., 3., -1., 1.], [-6., -6., -9., 19.],
                   [10., -2., -2., -3.]]).T
    h0 = np.array([-12., -3., -2.])
    h1 = np.array([27., 0., 3., -42.])
    sol = solvers.socp(c, Gq=[G0, G1], hq=[h0, h1])
    assert sol["status"] == "optimal"
    # documented solution (user guide, 3 digits): x = [-5.02, -5.77, -8.52]
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-5.0147, -5.7669, -8.5218], atol=2e-3)
    assert len(sol["zq"]) == 2 and sol["zq"][0].shape == (3,)


def test_doc_sdp():
    """examples/doc/chap8/sdp.py."""
    c = np.array([1., -1., 1.])
    G0 = np.array([[-7., -11., -11., 3.],
                   [7., -18., -18., 8.],
                   [-2., -8., -8., 1.]]).T
    G1 = np.array([[-21., -11., 0., -11., 10., 8., 0., 8., 5.],
                   [0., 10., 16., 10., -10., -10., 16., -10., 3.],
                   [-5., 2., -17., 2., -6., 8., -17., -7., 6.]]).T
    h0 = np.array([[33., -9.], [-9., 26.]])
    h1 = np.array([[14., 9., 40.], [9., 91., 10.], [40., 10., 15.]])
    sol = solvers.sdp(c, Gs=[G0, G1], hs=[h0, h1])
    assert sol["status"] == "optimal"
    # documented solution (user guide, 3 digits): x = [-0.368, 1.90, -0.888]
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               [-0.3677, 1.8983, -0.8876], atol=2e-3)
    assert sol["zs"][0].shape == (2, 2) and sol["zs"][1].shape == (3, 3)


def test_lp_equality():
    c = np.array([-1., -1.])
    G = -np.eye(2)
    h = np.zeros(2)
    A = np.array([[1., 1.]])
    b = np.array([1.])
    sol = solvers.conelp(c, G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    assert abs(sol["primal objective"] + 1.0) < 1e-7


def test_primal_infeasible():
    c = np.array([1.0])
    G = np.array([[1.0], [-1.0]])
    h = np.array([-1.0, -1.0])
    sol = solvers.conelp(c, G, h)
    assert sol["status"] == "primal infeasible"
    assert sol["x"] is None
    assert sol["dual objective"] == 1.0
    assert sol["residual as primal infeasibility certificate"] < 1e-7


def test_dual_infeasible():
    c = np.array([-1.0])
    G = np.array([[-1.0]])
    h = np.array([0.0])
    sol = solvers.conelp(c, G, h)
    assert sol["status"] == "dual infeasible"
    assert sol["y"] is None
    assert sol["primal objective"] == -1.0


def test_maxiters_unknown():
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    sol = solvers.lp(c, G, h, options={"maxiters": 1})
    assert sol["status"] == "unknown"
    assert sol["iterations"] == 1


def test_qp_unconstrained_equality():
    """coneqp with cdim == 0 (coneprog.py:2002-2041 shortcut path)."""
    P = np.array([[2., 0.], [0., 2.]])
    q = np.array([-2., -4.])
    A = np.array([[1., 1.]])
    b = np.array([1.])
    sol = solvers.coneqp(P, q, A=A, b=b)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [0.0, 1.0],
                               atol=1e-6)


def test_qp_markowitz_small():
    """Small Markowitz portfolio QP (pattern of
    examples/doc/chap8/portfolio.py)."""
    rng = np.random.default_rng(3)
    n = 20
    F = rng.standard_normal((n, 2 * n)) / np.sqrt(2 * n)
    S = F @ F.T + 0.01 * np.eye(n)
    pbar = rng.uniform(0.0, 0.1, n)
    G = -np.eye(n)
    h = np.zeros(n)
    A = np.ones((1, n))
    b = np.array([1.0])
    mu = 1.0
    sol = solvers.coneqp(mu * S, -pbar, G, h, A=A, b=b)
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    assert abs(x.sum() - 1.0) < 1e-6
    assert x.min() > -1e-7
    # KKT optimality: projected gradient vanishes on the support
    g = mu * S @ x - pbar
    lam = -(g[x > 1e-6]).mean()
    assert np.max(np.abs(g[x > 1e-6] + lam)) < 1e-5


def test_batched_vmap_lp():
    """Batch-first design: vmap over stacked problem instances."""
    from cvxopt_tpu.conelp import make_conelp
    dims = ConeDims(l=4)
    fn = make_conelp(dims)
    c = jnp.array([-4., -5.])
    G = jnp.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    A = jnp.zeros((0, 2))
    b = jnp.zeros((0,))
    hs = jnp.stack([jnp.array([3., 3., 0., 0.]) * (1 + 0.1 * k)
                    for k in range(8)])
    out = jax.vmap(lambda h_: fn(c, G, h_, A, b))(hs)
    assert np.all(np.asarray(out["status"]) == 0)
    np.testing.assert_allclose(
        np.asarray(out["pcost"]),
        [-9.0 * (1 + 0.1 * k) for k in range(8)], rtol=1e-6)


def test_batched_vmap_qp():
    from cvxopt_tpu.coneqp import make_coneqp
    rng = np.random.default_rng(0)
    n, nb = 8, 16
    dims = ConeDims(l=n)
    fn = make_coneqp(dims)
    Fs = rng.standard_normal((nb, n, n))
    Ps = jnp.asarray(Fs @ Fs.transpose(0, 2, 1) + np.eye(n))
    qs = jnp.asarray(rng.standard_normal((nb, n)))
    G = jnp.asarray(-np.eye(n))
    h = jnp.zeros(n)
    A = jnp.zeros((0, n))
    b = jnp.zeros((0,))
    out = jax.vmap(lambda P, q: fn(P, q, G, h, A, b))(Ps, qs)
    assert np.all(np.asarray(out["status"]) == 0)
    # verify KKT conditions per instance
    for k in range(nb):
        x = np.asarray(out["x"][k])
        z = np.asarray(out["z"][k])
        g = np.asarray(Ps[k]) @ x + np.asarray(qs[k]) - z
        assert np.max(np.abs(g)) < 1e-6
        assert x.min() > -1e-7 and z.min() > -1e-7
        assert abs(x @ z) < 1e-6


def test_chol2_inv_matches_chol2():
    """'chol2_inv' (explicit-inverse factor, the TPU fast path) agrees
    with 'chol2' to machine precision."""
    rng = np.random.default_rng(9)
    n = 25
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    G = -np.eye(n)
    h = np.zeros(n)
    A = np.ones((1, n))
    b = np.array([1.0])
    s1 = solvers.coneqp(P, q, G, h, A=A, b=b, kktsolver="chol2")
    s2 = solvers.coneqp(P, q, G, h, A=A, b=b, kktsolver="chol2_inv")
    assert s1["status"] == s2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(s1["x"]), np.asarray(s2["x"]),
                               rtol=1e-9, atol=1e-12)


def test_mixed_precision_factor():
    """options['factor_dtype'] = 'float32' with refinement recovers
    f64-level KKT residuals (the TPU 1e-7 accuracy mode)."""
    rng = np.random.default_rng(11)
    n = 30
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    G = -np.eye(n)
    h = np.zeros(n)
    sol = solvers.coneqp(P, q, G, h, kktsolver="chol2_inv",
                         options={"factor_dtype": "float32",
                                  "refinement": 1})
    assert sol["status"] == "optimal"
    x = np.asarray(sol["x"])
    z = np.asarray(sol["z"])
    res = P @ x + q - z
    assert np.abs(res).max() < 1e-9


def test_soc_dimension_one():
    """Edge case: SOC blocks of dimension 1 (= nonnegative rays)."""
    # min -x0 - x1 s.t. x in SOC(1) x SOC(1) shifted: x <= 1 each
    c = np.array([-1.0, -1.0])
    G = np.concatenate([-np.eye(2), np.eye(2)])
    h = np.array([0.0, 0.0, 1.0, 1.0])
    sol = solvers.conelp(c, G, h,
                         dims={"l": 2, "q": [1, 1], "s": []})
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1.0, 1.0],
                               atol=1e-6)


def test_mixed_q_s_cone():
    """A problem with simultaneous l, q and multiple unequal s blocks
    (exercises multi-run bookkeeping)."""
    rng = np.random.default_rng(13)
    n = 4
    dims = {"l": 2, "q": [3, 4], "s": [2, 3]}
    cdim = 2 + 3 + 4 + 4 + 9
    # feasible by construction: pick interior s0, z0 and derive h, c
    from cvxopt_tpu.cones import ConeDims, cone_identity
    cd = ConeDims.from_dict(dims)
    G = rng.standard_normal((cdim, n))
    x0 = rng.standard_normal(n)
    e = np.asarray(cone_identity(cd))
    h = G @ x0 + 2.0 * e           # s = 2e interior
    z0 = e.copy()
    c = -G.T @ z0                  # dual feasible with y empty
    sol = solvers.conelp(c, G, h, dims)
    assert sol["status"] == "optimal"
    assert sol["gap"] < 1e-5


def test_chol_inv_matches_chol():
    """'chol_inv' (explicit-inverse reduced factor, the TPU fast path
    for q/s cones) agrees with 'chol' on a SOCP-with-equalities QP."""
    rng = np.random.default_rng(21)
    n = 8
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    # l-box plus one SOC(n+1) norm bound, one equality
    I = np.eye(n)
    G = np.concatenate([-I, np.zeros((1, n)), I], axis=0)
    h = np.array(n * [0.0] + [2.0] + n * [0.0])
    A = np.ones((1, n))
    b = np.array([1.0])
    dims = {"l": n, "q": [n + 1], "s": []}
    s1 = solvers.coneqp(P, q, G, h, dims, A=A, b=b, kktsolver="chol")
    s2 = solvers.coneqp(P, q, G, h, dims, A=A, b=b,
                        kktsolver="chol_inv")
    assert s1["status"] == s2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(s1["x"]), np.asarray(s2["x"]),
                               rtol=1e-8, atol=1e-10)


def test_qr_inv_matches_qr():
    """'qr_inv' agrees with 'qr' (conelp q/s default) on the doc
    conelp problem (l, 2 SOC blocks, 1 PSD block)."""
    cols = [
        [16., 7., 24., -8., 8., -1., 0., -1., 0., 0., 7., -5., 1., -5.,
         1., -7., 1., -7., -4.],
        [-14., 2., 7., -13., -18., 3., 0., 0., -1., 0., 3., 13., -6.,
         13., 12., -10., -6., -10., -28.],
        [5., 0., -15., 12., -6., 17., 0., 0., 0., -1., 9., 6., -6., 6.,
         -7., -7., -6., -7., -11.]]
    G = np.array(cols).T
    c = np.array([-6., -4., -5.])
    h = np.array([-3., 5., 12., -2., -14., -13., 10., 0., 0., 0., 68.,
                  -30., -19., -30., 99., 23., -19., 23., 10.])
    dims = {'l': 2, 'q': [4, 4], 's': [3]}
    s1 = solvers.conelp(c, G, h, dims, kktsolver="qr")
    s2 = solvers.conelp(c, G, h, dims, kktsolver="qr_inv")
    assert s1["status"] == s2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(s1["x"]), np.asarray(s2["x"]),
                               rtol=1e-7, atol=1e-9)


def test_qr_inv_equalities():
    """'qr_inv' with equality constraints (exercises the R1 inverse)."""
    c = np.array([-1., -1., 0.])
    G = np.concatenate([-np.eye(3), np.eye(3)])
    h = np.array([0., 0., 0., 1., 1., 1.])
    A = np.array([[1., 1., 1.]])
    b = np.array([1.5])
    # add a trivial SOC block so 'qr' stays the natural choice
    G = np.concatenate([G, np.zeros((2, 3))])
    G[-1, 2] = -1.0
    h = np.concatenate([h, [2.0, 0.0]])
    dims = {"l": 6, "q": [2], "s": []}
    s1 = solvers.conelp(c, G, h, dims, A=A, b=b, kktsolver="qr")
    s2 = solvers.conelp(c, G, h, dims, A=A, b=b, kktsolver="qr_inv")
    assert s1["status"] == s2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(s1["x"]), np.asarray(s2["x"]),
                               rtol=1e-7, atol=1e-8)


def test_chol_factor_dtype_refinement():
    """'chol' with factor_dtype='float32' + refinement keeps the q-cone
    QP accurate (the TPU mixed-precision mode on the q/s default
    path)."""
    rng = np.random.default_rng(23)
    n = 8
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    I = np.eye(n)
    G = np.concatenate([-I, np.zeros((1, n)), I], axis=0)
    h = np.array(n * [0.0] + [2.0] + n * [0.0])
    dims = {"l": n, "q": [n + 1], "s": []}
    ref = solvers.coneqp(P, q, G, h, dims, kktsolver="chol")
    mix = solvers.coneqp(P, q, G, h, dims, kktsolver="chol_inv",
                         options={"factor_dtype": "float32",
                                  "refinement": 1})
    assert ref["status"] == mix["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(ref["x"]),
                               np.asarray(mix["x"]), atol=1e-6)


def test_adaptive_mixed_precision():
    """factor_dtype='adaptive' (kkt_chol2): f32 equilibrated factors
    with an f64-probe fallback must solve problems where a FIXED f32
    factor diverges (kappa_eq(S) > 1/eps_f32 near convergence), while
    matching the full-f64 answer to 1e-6."""
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    sol = solvers.conelp(c, G, h, options={"factor_dtype": "adaptive",
                                           "refinement": 1})
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), [1, 1], atol=1e-6)

    # with equalities: the Schur-complement path
    P = np.array([[13., 12., -2.], [12., 17., 6.], [-2., 6., 12.]])
    q = np.array([-22., -14.5, 13.])
    Gq = np.vstack([np.eye(3), -np.eye(3)])
    hq = np.ones(6)
    A = np.ones((1, 3))
    b = np.array([1.0])
    s2 = solvers.coneqp(P, q, Gq, hq, A=A, b=b, kktsolver="chol2",
                        options={"factor_dtype": "adaptive",
                                 "refinement": 1})
    s2f = solvers.coneqp(P, q, Gq, hq, A=A, b=b, kktsolver="chol2")
    assert s2["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(s2["x"]), np.asarray(s2f["x"]),
                               atol=1e-6)


def test_kkt_ldl2_condensed():
    """'ldl2' is the condensed 2x2 strategy (reference misc.py:1128),
    distinct from 'ldl': same solutions on an equality-constrained
    cone QP with l and q blocks."""
    import numpy as np
    from cvxopt_tpu import solvers
    from cvxopt_tpu.cones import ConeDims

    rng = np.random.default_rng(11)
    n = 12
    F = rng.standard_normal((n, 4))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    # l=6 rows + one SOC(4): h strictly feasible at x=0
    G = 0.4 * rng.standard_normal((10, n))
    h = np.concatenate([rng.uniform(0.5, 1.0, 6), [2.0],
                        0.1 * rng.standard_normal(3)])
    A = rng.standard_normal((2, n))
    b = A @ np.zeros(n)
    dims = {"l": 6, "q": [4], "s": []}
    ref = solvers.coneqp(P, q, G, h, dims=dims, A=A, b=b,
                         kktsolver="ldl")
    sol = solvers.coneqp(P, q, G, h, dims=dims, A=A, b=b,
                         kktsolver="ldl2")
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol["y"]),
                               np.asarray(ref["y"]), atol=1e-5)

    # conelp path too (zero H block)
    c = rng.standard_normal(n) * 0.1
    ref2 = solvers.conelp(c, G, h, dims=dims, A=A, b=b,
                          kktsolver="ldl")
    sol2 = solvers.conelp(c, G, h, dims=dims, A=A, b=b,
                          kktsolver="ldl2")
    assert ref2["status"] == sol2["status"]
    if ref2["status"] == "optimal":
        np.testing.assert_allclose(np.asarray(sol2["x"]),
                                   np.asarray(ref2["x"]), atol=1e-5)


def _soc_qp_instance(n=24, nq=8, mq=4, seed=5, p=1):
    """A strictly feasible SOC-constrained QP (robls pattern,
    /root/reference/examples/doc/chap9/robls.py)."""
    rng = np.random.default_rng(seed)
    m = nq * mq
    F = rng.standard_normal((n, max(n // 4, 2))) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    q = -rng.uniform(0, 0.1, n)
    G = 0.3 * rng.standard_normal((m, n))
    h = (0.1 * rng.standard_normal(m)).reshape(nq, mq)
    h[:, 0] = 1.0
    A = np.ones((p, n))
    b = np.ones(p)
    return (jnp.asarray(P), jnp.asarray(q), jnp.asarray(G),
            jnp.asarray(h.reshape(-1)), jnp.asarray(A), jnp.asarray(b))


def test_cholqr_matches_chol():
    """kkt_cholqr solves the same KKT system as kkt_chol (it never
    forms S = P + G'W^{-2}G; cf. reference kkt_qr's
    no-normal-equations principle, misc.py:1570)."""
    args = _soc_qp_instance()
    dims = ConeDims(q=(4,) * 8)
    ref = make_coneqp(dims, kktsolver="chol", abstol=1e-7,
                      reltol=1e-7, feastol=1e-7)(*args)
    assert int(ref["status"]) == 0
    for ks in ("cholqr", "cholqr_inv"):
        out = make_coneqp(dims, kktsolver=ks, abstol=1e-7,
                          reltol=1e-7, feastol=1e-7)(*args)
        assert int(out["status"]) == 0
        np.testing.assert_allclose(np.asarray(out["x"]),
                                   np.asarray(ref["x"]), atol=1e-9)


def test_cholqr_f32_factor_soc_1e7():
    """The condition-halving property in action: at 1e-7 tolerances on
    an SOC QP, an f32 factor of the formed normal equations fails
    (kappa(S) ~ 1/mu^2 > 1/eps_f32, not diagonally equilibrable) while
    the f32 QR factor (kappa(R) = sqrt(kappa(S))) converges."""
    args = _soc_qp_instance(n=32, nq=16, seed=7, p=0)
    args = args[:4] + (jnp.zeros((0, 32)), jnp.zeros((0,)))
    dims = ConeDims(q=(4,) * 16)
    bad = make_coneqp(dims, kktsolver="chol2", abstol=1e-7,
                      reltol=1e-7, feastol=1e-7,
                      factor_dtype="float32", refinement=2,
                      maxiters=60)(*args)
    good = make_coneqp(dims, kktsolver="cholqr_inv", abstol=1e-7,
                       reltol=1e-7, feastol=1e-7,
                       factor_dtype="float32", refinement=2,
                       maxiters=60)(*args)
    assert int(good["status"]) == 0
    assert float(good["gap"]) <= 1e-7 * 1.01
    # the normal-equations f32 factor must NOT reach the contract
    # (if this ever starts passing, the cascade can drop cholqr)
    assert int(bad["status"]) != 0


def test_cholqr_equalities_f32():
    """cholqr's equality elimination (QR of A', as kkt_chol) under an
    f32 factor."""
    args = _soc_qp_instance(n=24, nq=8, seed=11, p=2)
    args = args[:4] + (jnp.asarray(np.vstack([np.ones(24),
                                              np.arange(24) / 24.])),
                       jnp.asarray(np.array([1.0, 0.3])))
    dims = ConeDims(q=(4,) * 8)
    ref = make_coneqp(dims, kktsolver="chol", abstol=1e-7,
                      reltol=1e-7, feastol=1e-7)(*args)
    out = make_coneqp(dims, kktsolver="cholqr_inv", abstol=1e-7,
                      reltol=1e-7, feastol=1e-7,
                      factor_dtype="float32", refinement=2,
                      maxiters=60)(*args)
    assert int(out["status"]) == 0
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.asarray(ref["x"]), atol=1e-6)


def test_solvers_namespace_exports_cp_cpl_gp():
    """Reference public API parity: cvxopt.solvers exports cp/cpl/gp
    (/root/reference/src/python/solvers.py:35-41)."""
    from cvxopt_tpu.cvxprog import cp as _cp, cpl as _cpl, gp as _gp
    assert solvers.cp is _cp
    assert solvers.cpl is _cpl
    assert solvers.gp is _gp
    for name in ("cp", "cpl", "gp"):
        assert name in solvers.__all__


def test_conelp_refresh_trigger_mode():
    """Trigger-driven refresh (VERDICT r04 #7): on CPU a healthy solve
    never restarts (refresh_rounds == 0) and costs exactly the plain
    core's iterations; certificates are preserved; the legacy
    open-loop segment mode still runs."""
    from cvxopt_tpu.conelp import (make_conelp, make_conelp_refresh,
                                   ConeDims)
    m = 12
    rng = np.random.default_rng(3)
    w = rng.standard_normal((m, m)); w = (w + w.T) / np.sqrt(m)
    G = np.zeros((m * m, m))
    for j in range(m):
        G[j * m + j, j] = -1.0
    c = jnp.ones((m,), jnp.float64)
    Gj = jnp.asarray(G); hj = jnp.asarray(w.reshape(-1, order="F"))
    A0 = jnp.zeros((0, m), jnp.float64); b0 = jnp.zeros((0,))
    dims = ConeDims(s=(m,))
    ref = make_conelp(dims, kktsolver="chol2", maxiters=50)(
        c, Gj, hj, A0, b0)
    out = make_conelp_refresh(dims, kktsolver="chol2", maxiters=50,
                              stall_exit=4, rounds=3)(
        c, Gj, hj, A0, b0)
    assert int(out["status"]) == 0
    assert out["refresh_rounds"] == 0
    assert int(out["iterations"]) == int(ref["iterations"])
    # legacy open-loop mode
    out2 = make_conelp_refresh(dims, kktsolver="chol2", maxiters=50,
                               segment=12, rounds=3)(
        c, Gj, hj, A0, b0)
    assert int(out2["status"]) == 0

    # infeasibility certificate must not be consumed by a refresh
    c1 = jnp.asarray([1.0])
    G1 = jnp.asarray([[1.0], [-1.0]])
    h1 = jnp.asarray([-1.0, -1.0])
    dl = ConeDims(l=2)
    o3 = make_conelp_refresh(dl, maxiters=50, stall_exit=4)(
        c1, G1, h1, jnp.zeros((0, 1)), jnp.zeros((0,)))
    assert int(o3["status"]) == 1          # primal infeasible
    assert o3["refresh_rounds"] == 0


def test_psqrt_factor_reduced_precision():
    """psqrt_factor(dtype=...) — the r05 cholqr fast path: Rt'Rt ~ P
    at f32 grade for PD input; semidefinite input takes the big-jitter
    retry lane instead of NaN."""
    from cvxopt_tpu.kkt import psqrt_factor
    rng = np.random.default_rng(0)
    F = rng.standard_normal((3, 8, 4))
    P = F @ np.swapaxes(F, -1, -2) + 0.1 * np.eye(8)
    Rt = np.asarray(psqrt_factor(jnp.asarray(P), dtype="float32").Rt)
    rel = np.linalg.norm(np.swapaxes(Rt, -1, -2) @ Rt - P) \
        / np.linalg.norm(P)
    assert rel < 1e-5                       # f32 + jitter grade
    # exactly singular PSD (rank 4 of 8): must stay finite
    P0 = F @ np.swapaxes(F, -1, -2)
    Rt0 = np.asarray(psqrt_factor(jnp.asarray(P0),
                                  dtype="float32").Rt)
    assert np.isfinite(Rt0).all()
    rel0 = np.linalg.norm(np.swapaxes(Rt0, -1, -2) @ Rt0 - P0) \
        / np.linalg.norm(P0)
    assert rel0 < 1e-2                      # preconditioner grade
    # default (no dtype) stays the eigh path: f64-exact
    Rt64 = np.asarray(psqrt_factor(jnp.asarray(P)).Rt)
    rel64 = np.linalg.norm(np.swapaxes(Rt64, -1, -2) @ Rt64 - P) \
        / np.linalg.norm(P)
    assert rel64 < 1e-12
