"""Generalized block-partitioned KKT (parallel/schur.py BlockQP):
local equalities + 'q' cones, single-device vs dense oracle and
shard_map vs single-device (SURVEY.md §7.7; the distributed analogue
of the 3x3 KKT contract, /root/reference/src/python/misc.py:1069-1071).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvxopt_tpu.parallel.schur import (
    BlockQP, make_block_kktsolver, random_block_qp, global_dims,
    split_cone_vec, merge_cone_vec,
)
from cvxopt_tpu.coneqp import coneqp
from cvxopt_tpu.cones import ConeDims


def _solve_dense(qp, **kw):
    return coneqp(qp.flat_P(), qp.flat_q(), qp.flat_G(), qp.flat_h(),
                  dims=qp.dims, A=qp.flat_A(), b=qp.flat_b(), **kw)


def _solve_block(qp, mesh=None, **kw):
    kkt = make_block_kktsolver(qp, mesh=mesh)
    return coneqp(qp.flat_P(), qp.flat_q(), qp.flat_G(), qp.flat_h(),
                  dims=qp.dims, A=qp.flat_A(), b=qp.flat_b(),
                  kktsolver=kkt, **kw)


def test_split_merge_roundtrip():
    dl = ConeDims(l=3, q=(3, 4))
    K = 5
    v = jnp.arange(K * dl.cdim, dtype=jnp.float64)
    vk = split_cone_vec(v, dl, K)
    assert vk.shape == (K, dl.cdim)
    v2 = merge_cone_vec(vk, dl, K)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_block_orthant_equalities_matches_dense():
    qp = random_block_qp(K=4, nk=8, n0=4, l=8, q=(), pk=2, seed=1)
    ref = _solve_dense(qp)
    sol = _solve_block(qp)
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sol["y"]),
                               np.asarray(ref["y"]), atol=1e-5)


def test_block_q_cones_matches_dense():
    qp = random_block_qp(K=4, nk=8, n0=4, l=5, q=(3,), pk=2, seed=2)
    ref = _solve_dense(qp)
    sol = _solve_block(qp)
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)


def test_block_shared_equalities():
    qp = random_block_qp(K=4, nk=8, n0=6, l=8, q=(3,), pk=2, p0=2,
                         seed=3)
    ref = _solve_dense(qp)
    sol = _solve_block(qp)
    assert ref["status"] == "optimal"
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol["x"]),
                               np.asarray(ref["x"]), atol=1e-6)


def test_block_sharded_matches_single_device():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(devs[:8]), ("batch",))
    qp = random_block_qp(K=8, nk=8, n0=4, l=6, q=(3,), pk=2, seed=4)
    sol1 = _solve_block(qp)
    sol8 = _solve_block(qp, mesh=mesh)
    assert sol1["status"] == "optimal"
    assert sol8["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol8["x"]),
                               np.asarray(sol1["x"]), atol=1e-7)


def test_sharded_kkt_n10240_factor_solve():
    """BASELINE primary-metric row at n=10k for the SHARDED path: a
    10240-variable block QP's KKT factors and solves over the
    8-device virtual mesh (K=8 scenario blocks of nk=1248 + n0=256
    coupling variables, local equalities included).  Hardware note:
    real multi-chip is unavailable in this environment; this runs the
    full shard_map + psum code path on the virtual CPU mesh and
    records wall time (the algorithmic cost is 8 parallel 1248^3
    factors + one 256^3 reduced factor instead of one 10240^3)."""
    import time
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    mesh = Mesh(np.array(devs[:8]), ("batch",))
    K, nk, n0 = 8, 1248, 256
    assert K * nk + n0 == 10240
    qp = random_block_qp(K=K, nk=nk, n0=n0, l=nk, q=(), pk=4, seed=0)
    kkt = make_block_kktsolver(qp, mesh=mesh)
    from cvxopt_tpu.scaling import identity_scaling
    W = identity_scaling(qp.dims, dtype=jnp.float64)

    @jax.jit
    def factor_solve(d):
        W2 = dict(W)
        W2["d"] = W["d"] * d
        W2["di"] = W["di"] / d
        solve = kkt(W2)
        bx = jnp.ones((K * nk + n0,))
        by = jnp.zeros((K * qp.pk + qp.p0,))
        bz = jnp.ones((qp.dims.cdim,))
        ux, uy, Wuz = solve(bx, by, bz)
        return ux.sum() + uy.sum() + Wuz.sum()

    float(factor_solve(jnp.asarray(1.0)))        # compile
    t0 = time.time()
    float(factor_solve(jnp.asarray(1.1)))
    dt = (time.time() - t0) * 1e3
    print(f"\nsharded n=10240 KKT factor+solve: {dt:.0f} ms "
          f"(8-device virtual CPU mesh)")
    assert np.isfinite(dt)
