"""Progressive-precision cascades (coneqp.make_coneqp_cascade,
conelp.make_conelp_cascade): full 1e-7 accuracy via f32 phase +
warm-started mixed phase + per-instance f64 rescue."""

import numpy as np
import jax
import jax.numpy as jnp

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.coneqp import make_coneqp_cascade, make_coneqp
from cvxopt_tpu.conelp import make_conelp_cascade, make_conelp


def test_coneqp_cascade_matches_f64():
    n, nb = 32, 8
    rng = np.random.default_rng(0)
    F = rng.standard_normal((nb, n, n // 4)) / np.sqrt(n)
    P = F @ F.transpose(0, 2, 1) + 0.1 * np.eye(n)
    q = -rng.uniform(0, 0.1, (nb, n))
    I = np.eye(n)
    G = np.concatenate([-I, I], 0)
    h = np.concatenate([np.zeros(n), np.ones(n)])
    A = np.ones((1, n))
    b = np.ones(1)
    dims = ConeDims(l=2 * n)
    solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                                abstol=1e-7, reltol=1e-7, feastol=1e-7)
    out = solve(jnp.asarray(P), jnp.asarray(q), jnp.asarray(G),
                jnp.asarray(h), jnp.asarray(A), jnp.asarray(b))
    assert (np.asarray(out["status"]) == 0).all()
    assert float(jnp.max(out["gap"])) <= 1e-7 * 1.01
    ref = make_coneqp(dims, kktsolver="chol2", abstol=1e-7,
                      reltol=1e-7, feastol=1e-7)
    o2 = jax.vmap(lambda Pk, qk: ref(Pk, qk, jnp.asarray(G),
                                     jnp.asarray(h), jnp.asarray(A),
                                     jnp.asarray(b)))(
        jnp.asarray(P), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.asarray(o2["x"]), atol=1e-7)


def test_conelp_cascade_matches_f64():
    n, nb = 24, 8
    rng = np.random.default_rng(1)
    I = np.eye(n)
    G = np.concatenate([-I, I], 0)
    h = np.concatenate([np.zeros(n), np.ones(n)])
    A = np.ones((1, n))
    b = np.array([n / 3.0])
    c = rng.standard_normal((nb, n)) * 0.3
    dims = ConeDims(l=2 * n)
    solve = make_conelp_cascade(dims, abstol=1e-7, reltol=1e-7,
                                feastol=1e-7)
    out = solve(jnp.asarray(c), jnp.asarray(G), jnp.asarray(h),
                jnp.asarray(A), jnp.asarray(b))
    st = np.asarray(out["status"])
    assert (st == 0).all(), st
    ref = make_conelp(dims, abstol=1e-7, reltol=1e-7, feastol=1e-7)
    o2 = jax.vmap(lambda ck: ref(ck, jnp.asarray(G), jnp.asarray(h),
                                 jnp.asarray(A), jnp.asarray(b)))(
        jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(out["pcost"]),
                               np.asarray(o2["pcost"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.asarray(o2["x"]), atol=1e-5)


def test_conelp_cascade_detects_infeasible():
    # x <= -1 and x >= 1: primal infeasible at any tolerance
    n, nb = 1, 4
    G = np.array([[1.0], [-1.0]])
    h = np.array([-1.0, -1.0])
    A = np.zeros((0, n))
    b = np.zeros(0)
    c = np.ones((nb, n))
    dims = ConeDims(l=2)
    solve = make_conelp_cascade(dims, abstol=1e-7, reltol=1e-7,
                                feastol=1e-7)
    out = solve(jnp.asarray(c), jnp.asarray(G), jnp.asarray(h),
                jnp.asarray(A), jnp.asarray(b))
    assert (np.asarray(out["status"]) == 1).all(), out["status"]


def test_rescue_engages_per_instance_in_mixed_batch():
    """A vmapped batch mixing well-conditioned QPs with a degenerate
    instance: the rescue phase must engage ONLY for the degenerate one
    and every instance must meet the 1e-7 contract (the per-instance
    while_loop rescue design, conelp.RESCUE_*)."""
    n, nb = 16, 6
    rng = np.random.default_rng(3)
    I = np.eye(n)
    G = np.concatenate([-I, I], 0)
    h_clean = np.concatenate([np.zeros(n), np.ones(n)])
    A = np.ones((1, n))
    b = np.ones(1)
    dims = ConeDims(l=2 * n)

    P = np.zeros((nb, n, n))
    q = np.zeros((nb, n))
    h = np.tile(h_clean, (nb, 1))
    for i in range(nb):
        F = rng.standard_normal((n, n // 4)) / np.sqrt(n)
        P[i] = F @ F.T + 0.1 * I
        q[i] = -rng.uniform(0, 0.1, n)
    # instance 3: near-degenerate — almost-zero curvature along a
    # direction and an objective that activates many bounds at once
    P[3] = 1e-6 * np.eye(n)
    q[3] = -np.ones(n) * 0.5

    from cvxopt_tpu.coneqp import make_coneqp
    # force the two-phase machinery with an f32 phase-1 factor on CPU
    core = make_coneqp(dims, kktsolver="chol2_inv", maxiters=60,
                       abstol=1e-7, reltol=1e-7, feastol=1e-7,
                       refinement=1, factor_dtype="rescue")
    out = jax.vmap(lambda Pk, qk, hk: core(
        Pk, qk, jnp.asarray(G), hk, jnp.asarray(A), jnp.asarray(b)))(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(h))
    st = np.asarray(out["status"])
    assert (st == 0).all(), (st, np.asarray(out["dres"]))
    assert float(jnp.max(out["pres"])) <= 1e-7
    assert float(jnp.max(out["dres"])) <= 1e-7
    # solutions match the pure-f64 solver per instance
    ref = make_coneqp(dims, kktsolver="chol2", maxiters=60,
                      abstol=1e-7, reltol=1e-7, feastol=1e-7)
    o2 = jax.vmap(lambda Pk, qk, hk: ref(
        Pk, qk, jnp.asarray(G), hk, jnp.asarray(A), jnp.asarray(b)))(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.asarray(o2["x"]), atol=1e-5)


def test_coneqp_cascade_soc_stays_mixed():
    """The q-cone cascade's phase B factors in f32 via kkt_cholqr
    (condition-halving QR); on a generic strictly-feasible SOC batch
    no instance should need the f64 rescue phase, and instances whose
    f32 phase A fails restart from the cold point in phase B (the
    warm-start validation path) rather than handing NaN scalings on."""
    nb, n, nq, mq = 8, 32, 20, 4
    dims = ConeDims(q=(mq,) * nq)
    m = dims.cdim
    rng = np.random.default_rng(1)
    P = np.zeros((nb, n, n))
    q = np.zeros((nb, n))
    G = np.zeros((nb, m, n))
    h = np.zeros((nb, m))
    for i in range(nb):
        F = rng.standard_normal((n, n // 4)) / np.sqrt(n)
        P[i] = F @ F.T + 0.1 * np.eye(n)
        q[i] = -rng.uniform(0, .1, n)
        G[i] = 0.3 * rng.standard_normal((m, n))
        f = 0.1 * rng.standard_normal(m)
        hh = f.reshape(nq, mq)
        hh[:, 0] = 1.0
        h[i] = hh.reshape(-1)
    A = np.zeros((nb, 0, n))
    b = np.zeros((nb, 0))
    solve = make_coneqp_cascade(dims, kktsolver="chol2_inv",
                                maxiters=50, abstol=1e-7, reltol=1e-7,
                                feastol=1e-7, shared_GhAb=False)
    out = solve(*[jnp.asarray(a) for a in (P, q, G, h, A, b)])
    assert (np.asarray(out["status"]) == 0).all()
    assert float(jnp.max(out["gap"])) <= 1e-7 * 1.01
    assert float(jnp.max(out["pres"])) <= 1e-7
    assert float(jnp.max(out["dres"])) <= 1e-7
    # this batch is known to contain phase-A failures (seed 1:
    # instances 1-3); with cholqr phase B none should reach rescue
    assert int(jnp.sum(out["rescue_iterations"])) == 0
