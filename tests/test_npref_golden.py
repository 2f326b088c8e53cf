"""Golden cross-check: the single-core numpy reference solver
(cvxopt_tpu._npref) against the JAX coneqp — same algorithm,
independent implementations (the house verification style, SURVEY §4)."""

import numpy as np
import pytest

from cvxopt_tpu._npref import coneqp_np
from cvxopt_tpu import solvers


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coneqp_matches_npref(seed):
    rng = np.random.default_rng(seed)
    n, m, p = 15, 30, 2
    F = rng.standard_normal((n, n))
    P = F @ F.T + np.eye(n)
    q = rng.standard_normal(n)
    G = np.concatenate([-np.eye(n), rng.standard_normal((m - n, n))])
    h = np.concatenate([np.zeros(n), rng.uniform(1, 2, m - n)])
    A = rng.standard_normal((p, n))
    b = rng.standard_normal(p) * 0.1
    ra = coneqp_np(P, q, G, h, A, b)
    rb = solvers.coneqp(P, q, G, h, A=A, b=b)
    assert ra["status"] == "optimal"
    assert rb["status"] == "optimal"
    np.testing.assert_allclose(ra["x"], np.asarray(rb["x"]),
                               rtol=1e-4, atol=1e-5)
    # multipliers that are ~0 at the solution can differ by orders of
    # magnitude between runs converging at different gap levels;
    # compare with an absolute floor.
    np.testing.assert_allclose(ra["z"], np.asarray(rb["z"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_coneqp_cones_matches_npref_soc(seed):
    """The general-cone numpy reference vs the JAX coneqp on an SOC QP
    (independent implementations of coneprog.py:1440 + misc.py NT
    scaling; agreement validates both)."""
    from cvxopt_tpu._npref import coneqp_np_cones
    rng = np.random.default_rng(seed)
    n, nq, mq = 24, 8, 4
    m = nq * mq
    F = rng.standard_normal((n, 8)) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    q = -rng.uniform(0, .1, n)
    G = 0.3 * rng.standard_normal((m, n))
    hh = (0.1 * rng.standard_normal(m)).reshape(nq, mq)
    hh[:, 0] = 1.0
    h = hh.reshape(-1)
    A = np.ones((1, n))
    b = np.ones(1)
    ref = coneqp_np_cones(P, q, G, h, {"q": [mq] * nq}, A, b,
                          abstol=1e-7, reltol=1e-7, feastol=1e-7)
    assert ref["status"] == "optimal"
    sol = solvers.coneqp(P, q, G, h, dims={"l": 0, "q": [mq] * nq,
                                           "s": []}, A=A, b=b)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]), ref["x"],
                               atol=5e-6)


def test_coneqp_cones_matches_npref_sdp():
    """The numpy reference 's' path vs the JAX conelp on an mcsdp
    instance (P=0 coneqp vs HSD conelp: same optimum)."""
    from cvxopt_tpu._npref import coneqp_np_cones
    rng = np.random.default_rng(7)
    m = 10
    w = rng.standard_normal((m, m))
    w = (w + w.T) / np.sqrt(m)
    n = m
    G = np.zeros((m * m, n))
    for j in range(n):
        G[j * m + j, j] = -1.0
    ref = coneqp_np_cones(np.zeros((n, n)), np.ones(n), G,
                          w.reshape(-1), {"s": [m]},
                          abstol=1e-7, reltol=1e-6, feastol=1e-7)
    assert ref["status"] == "optimal"
    sol = solvers.conelp(np.ones(n), G, w.reshape(-1),
                         dims={"l": 0, "q": [], "s": [m]})
    assert sol["status"] == "optimal"
    # an SDP solution near a degenerate face is less sharply
    # determined than the optimal value: compare objectives tightly,
    # iterates loosely
    np.testing.assert_allclose(float(np.sum(np.asarray(sol["x"]))),
                               float(np.sum(ref["x"])), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sol["x"]), ref["x"],
                               atol=2e-3)


def test_fuzz_random_cone_mixes_vs_golden():
    """r05 randomized armor: random (l, q, s) cone mixes through the
    jitted coneqp core vs the numpy golden reference at 1e-7.
    Guards the round's scaling/eigh/kkt rewrites across arbitrary
    cone combinations, not just the benchmark shapes."""
    import jax.numpy as jnp
    from cvxopt_tpu._npref import coneqp_np_cones
    from cvxopt_tpu.coneqp import make_coneqp
    from cvxopt_tpu.cones import ConeDims

    rng = np.random.default_rng(20260821)
    configs = [
        dict(l=3, q=(3, 4), s=()),
        dict(l=0, q=(5,), s=(3,)),
        dict(l=4, q=(), s=(2, 3)),
        dict(l=2, q=(3, 3, 3), s=(2,)),
    ]
    compared = []
    for ci, cfg in enumerate(configs):
        dims = ConeDims(**cfg)
        m = dims.cdim
        n = 6
        for trial in range(2):
            F = rng.standard_normal((n, n)) / np.sqrt(n)
            P = F @ F.T + 0.5 * np.eye(n)
            qv = 0.3 * rng.standard_normal(n)
            G = 0.4 * rng.standard_normal((m, n))
            # the 's'-block rows of G must be (vectorized) SYMMETRIC
            # matrices — symmetrize each column's s-blocks
            soff = cfg["l"] + sum(cfg["q"])
            for ms in cfg["s"]:
                blk = G[soff:soff + ms * ms, :].reshape(ms, ms, n)
                G[soff:soff + ms * ms, :] = (
                    0.5 * (blk + blk.transpose(1, 0, 2))
                ).reshape(ms * ms, n)
                soff += ms * ms
            # strictly feasible h: h = G x0 + s0 with s0 interior
            x0 = 0.1 * rng.standard_normal(n)
            s0 = np.zeros(m)
            off = 0
            for _ in range(cfg["l"]):
                s0[off] = 1.0 + rng.uniform(0, 0.5)
                off += 1
            for mq in cfg["q"]:
                s0[off] = 2.0
                s0[off + 1:off + mq] = 0.2 * rng.standard_normal(
                    mq - 1)
                off += mq
            for ms in cfg["s"]:
                E = 0.2 * rng.standard_normal((ms, ms))
                S0 = E @ E.T + np.eye(ms)
                s0[off:off + ms * ms] = S0.reshape(-1)
                off += ms * ms
            h = G @ x0 + s0
            dref = {"l": cfg["l"], "q": list(cfg["q"]),
                    "s": list(cfg["s"])}
            ref = coneqp_np_cones(P, qv, G, h, dref, abstol=1e-7,
                                  reltol=1e-7, feastol=1e-7)
            if ref["status"] != "optimal":
                # a hard random instance the golden itself cannot
                # certify — nothing to compare against
                continue
            compared.append((ci, trial))
            core = make_coneqp(dims, maxiters=60, abstol=1e-7,
                               reltol=1e-7, feastol=1e-7)
            out = core(jnp.asarray(P), jnp.asarray(qv),
                       jnp.asarray(G), jnp.asarray(h),
                       jnp.zeros((0, n)), jnp.zeros((0,)))
            assert int(out["status"]) == 0, (ci, trial)
            np.testing.assert_allclose(
                np.asarray(out["x"]), np.asarray(ref["x"]),
                atol=2e-5, err_msg=f"cfg {ci} trial {trial}")
            xr = np.asarray(ref["x"])
            pref = 0.5 * xr @ P @ xr + qv @ xr
            assert abs(float(out["pcost"]) - pref) < 1e-6
    assert len(compared) >= 5, compared
