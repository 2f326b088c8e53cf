"""Distributed cone-sharded coneqp (parallel/conesolve.py): the
iteration loop itself runs under shard_map calling the cone-aware
collectives; results must match the single-device coneqp on the
equivalent global problem at full f64 tolerances."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P_

from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.coneqp import make_coneqp
from cvxopt_tpu.parallel import make_mesh
from cvxopt_tpu.parallel.conesolve import make_coneqp_sharded

ND = 8


def _problem(n=12, l=4, q=(3,), seed=0):
    """One global QP whose cone rows are laid out PER SHARD
    ([shard0: l,q | shard1: l,q | ...]); also returns the permutation
    into the grouped layout ([all l; all q]) the single-device
    ConeDims expects."""
    ldims = ConeDims(l=l, q=q)
    mk = ldims.cdim
    m = ND * mk
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + np.eye(n)
    qv = rng.standard_normal(n) * 0.1
    G = 0.3 * rng.standard_normal((m, n))
    h = 0.1 * rng.standard_normal(m)
    # strict interior for the q blocks: h leading entry positive
    for k in range(ND):
        h[k * mk + l] = 1.0
        # and generous 'l' bounds
        h[k * mk:k * mk + l] = 1.0 + np.abs(h[k * mk:k * mk + l])
    # permutation shard-layout -> grouped layout
    perm = np.concatenate(
        [np.concatenate([np.arange(k * mk, k * mk + l)
                         for k in range(ND)])] +
        [np.concatenate([np.arange(k * mk + l, (k + 1) * mk)
                         for k in range(ND)])])
    return ldims, P, qv, G, h, perm


def test_sharded_coneqp_matches_single_device():
    ldims, P, qv, G, h, perm = _problem()
    mesh = make_mesh(ND, axis="cone")
    solve = make_coneqp_sharded(ldims, mesh, axis="cone",
                                maxiters=50, abstol=1e-7,
                                reltol=1e-6, feastol=1e-7)
    shard = NamedSharding(mesh, P_("cone"))
    shard2 = NamedSharding(mesh, P_("cone", None))
    Gd = jax.device_put(jnp.asarray(G), shard2)
    hd = jax.device_put(jnp.asarray(h), shard)
    out = solve(jnp.asarray(P), jnp.asarray(qv), Gd, hd)
    assert int(out["status"]) == 0
    assert float(out["gap"]) <= 1e-7 or float(out["relgap"]) <= 1e-6
    assert float(out["pres"]) <= 1e-7
    assert float(out["dres"]) <= 1e-7

    # single-device reference on the grouped-layout problem
    gdims = ConeDims(l=ldims.l * ND, q=ldims.q * ND)
    core = make_coneqp(gdims, maxiters=50, abstol=1e-7, reltol=1e-6,
                       feastol=1e-7)
    ref = core(jnp.asarray(P), jnp.asarray(qv),
               jnp.asarray(G[perm]), jnp.asarray(h[perm]),
               jnp.zeros((0, P.shape[0])), jnp.zeros((0,)))
    assert int(ref["status"]) == 0
    np.testing.assert_allclose(np.asarray(out["x"]),
                               np.asarray(ref["x"]), atol=5e-6)
    # objective agreement to the gap tolerance
    assert abs(float(out["pcost"]) - float(ref["pcost"])) < 1e-6

    # the sharded cone iterates map back to the reference's
    sg = np.asarray(out["s"])[perm]
    np.testing.assert_allclose(sg, np.asarray(ref["s"]), atol=5e-5)


def test_sharded_coneqp_l_only():
    ldims = ConeDims(l=6)
    mesh = make_mesh(ND, axis="cone")
    rng = np.random.default_rng(3)
    n = 10
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + np.eye(n)
    qv = rng.standard_normal(n) * 0.2
    m = ND * 6
    G = rng.standard_normal((m, n)) * 0.4
    h = 1.0 + np.abs(rng.standard_normal(m))
    solve = make_coneqp_sharded(ldims, mesh, axis="cone")
    shard = NamedSharding(mesh, P_("cone"))
    shard2 = NamedSharding(mesh, P_("cone", None))
    out = solve(jnp.asarray(P), jnp.asarray(qv),
                jax.device_put(jnp.asarray(G), shard2),
                jax.device_put(jnp.asarray(h), shard))
    assert int(out["status"]) == 0
    # KKT check at the solution: P x + q + G'z = 0
    x = np.asarray(out["x"])
    z = np.asarray(out["z"])
    r = P @ x + qv + G.T @ z
    assert np.linalg.norm(r) < 1e-6


def test_sharded_coneqp_with_equalities():
    """Equality-constrained sharded solve (VERDICT r04 #8): A x = b via
    the replicated saddle elimination; must match single-device coneqp
    at 1e-7 (reference equality handling coneprog.py:1980-2041)."""
    ldims, P, qv, G, h, perm = _problem(seed=5)
    n = P.shape[0]
    rng = np.random.default_rng(11)
    p = 2
    A = rng.standard_normal((p, n))
    b = A @ (0.01 * rng.standard_normal(n))   # consistent RHS
    mesh = make_mesh(ND, axis="cone")
    solve = make_coneqp_sharded(ldims, mesh, axis="cone",
                                maxiters=50, abstol=1e-7,
                                reltol=1e-6, feastol=1e-7)
    shard = NamedSharding(mesh, P_("cone"))
    shard2 = NamedSharding(mesh, P_("cone", None))
    out = solve(jnp.asarray(P), jnp.asarray(qv),
                jax.device_put(jnp.asarray(G), shard2),
                jax.device_put(jnp.asarray(h), shard),
                jnp.asarray(A), jnp.asarray(b))
    assert int(out["status"]) == 0
    assert float(out["pres"]) <= 1e-7
    assert float(out["dres"]) <= 1e-7
    x = np.asarray(out["x"])
    np.testing.assert_allclose(A @ x, b, atol=1e-7)

    gdims = ConeDims(l=ldims.l * ND, q=ldims.q * ND)
    core = make_coneqp(gdims, maxiters=50, abstol=1e-7, reltol=1e-6,
                       feastol=1e-7)
    ref = core(jnp.asarray(P), jnp.asarray(qv),
               jnp.asarray(G[perm]), jnp.asarray(h[perm]),
               jnp.asarray(A), jnp.asarray(b))
    assert int(ref["status"]) == 0
    np.testing.assert_allclose(x, np.asarray(ref["x"]), atol=5e-6)
    np.testing.assert_allclose(np.asarray(out["y"]),
                               np.asarray(ref["y"]), atol=5e-5)


def test_sharded_coneqp_weak_scaling_iterations():
    """Weak-scaling sanity (VERDICT r04 #8): the SAME global problem
    sharded over 1/2/4/8 devices takes an identical iteration count —
    the collectives are algebraically transparent."""
    from cvxopt_tpu.parallel.conesolve import make_coneqp_sharded as mk
    iters = {}
    for nd in (1, 2, 4, 8):
        # global problem fixed: ND shards worth of rows; regroup into
        # nd shards of (ND // nd) * (l, q) blocks each
        ldims, P, qv, G, h, perm = _problem(seed=7)
        rep = ND // nd
        l, q = 4, (3,)
        ldims_nd = ConeDims(l=l * rep, q=q * rep)
        mk_ = ldims.cdim
        # rows regrouped: shard j gets blocks [j*rep, (j+1)*rep), each
        # reordered to [all l; all q] within the shard
        order = []
        for j in range(nd):
            base = [np.arange(k * mk_, k * mk_ + l)
                    for k in range(j * rep, (j + 1) * rep)]
            order += base
            order += [np.arange(k * mk_ + l, (k + 1) * mk_)
                      for k in range(j * rep, (j + 1) * rep)]
        order = np.concatenate(order)
        mesh = make_mesh(nd, axis="cone")
        solve = mk(ldims_nd, mesh, axis="cone", maxiters=50,
                   abstol=1e-7, reltol=1e-6, feastol=1e-7)
        shard = NamedSharding(mesh, P_("cone"))
        shard2 = NamedSharding(mesh, P_("cone", None))
        out = solve(jnp.asarray(P), jnp.asarray(qv),
                    jax.device_put(jnp.asarray(G[order]), shard2),
                    jax.device_put(jnp.asarray(h[order]), shard))
        assert int(out["status"]) == 0
        iters[nd] = int(out["iterations"])
    assert len(set(iters.values())) == 1, iters
