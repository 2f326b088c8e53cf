"""Distributed block-arrow KKT tests (cvxopt_tpu.parallel.schur):
the model-parallel path for one large problem, validated against the
dense solver on the flattened problem — the single-chip vs sharded
equivalence pattern (SURVEY.md §4 house style)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvxopt_tpu import solvers
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu.parallel.schur import (
    ArrowQP, make_arrow_kktsolver, random_arrow_qp,
)
from cvxopt_tpu.parallel import make_mesh
from cvxopt_tpu.scaling import identity_scaling


def test_arrow_kkt_solve_matches_dense():
    """factor/solve of the arrow KKT equals the dense 3x3 solve."""
    K, nk, n0, mk = 6, 5, 4, 5
    qp = random_arrow_qp(K, nk, n0, mk)
    n = K * nk + n0
    m = K * mk
    dims = ConeDims(l=m)
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.uniform(0.5, 2.0, m))
    W = identity_scaling(dims)
    W["d"] = d
    W["di"] = 1.0 / d

    kkt = make_arrow_kktsolver(qp)
    solve = kkt(W)
    bx = jnp.asarray(rng.standard_normal(n))
    bz = jnp.asarray(rng.standard_normal(m))
    ux, _, Wuz = solve(bx, jnp.zeros(0), bz)

    # dense check: S ux = bx + G' W^{-2} bz; Wuz = (G ux - bz)/d
    P = np.asarray(qp.flat_P())
    G = np.asarray(qp.flat_G())
    D = np.asarray(1.0 / (d * d))
    S = P + (G.T * D) @ G
    rhs = np.asarray(bx) + G.T @ (D * np.asarray(bz))
    ux_ref = np.linalg.solve(S, rhs)
    np.testing.assert_allclose(np.asarray(ux), ux_ref, rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(Wuz), (G @ ux_ref - np.asarray(bz)) / np.asarray(d),
        rtol=1e-8, atol=1e-10)


def test_arrow_qp_via_custom_kkt():
    """Full coneqp solve with the arrow custom kktsolver == dense."""
    K, nk, n0, mk = 4, 6, 3, 6
    qp = random_arrow_qp(K, nk, n0, mk, seed=3)
    P, q = qp.flat_P(), qp.flat_q()
    G, h = qp.flat_G(), qp.flat_h()
    sol_dense = solvers.coneqp(P, q, G, h)
    assert sol_dense["status"] == "optimal"

    kkt = make_arrow_kktsolver(qp)
    sol_arrow = solvers.coneqp(P, q, G, h, kktsolver=kkt)
    assert sol_arrow["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_arrow["x"]),
                               np.asarray(sol_dense["x"]),
                               rtol=1e-6, atol=1e-7)


def test_arrow_qp_sharded_full_solve():
    """Full IPM with the SHARDED arrow kktsolver over the CPU mesh."""
    ndev = min(8, len(jax.devices()))
    K, nk, n0, mk = 2 * ndev, 4, 3, 4
    qp = random_arrow_qp(K, nk, n0, mk, seed=7)
    P, q = qp.flat_P(), qp.flat_q()
    G, h = qp.flat_G(), qp.flat_h()
    sol_dense = solvers.coneqp(P, q, G, h)
    mesh = make_mesh(ndev)
    kkt = make_arrow_kktsolver(qp, mesh=mesh)
    sol_arrow = solvers.coneqp(P, q, G, h, kktsolver=kkt)
    assert sol_arrow["status"] == "optimal"
    np.testing.assert_allclose(np.asarray(sol_arrow["x"]),
                               np.asarray(sol_dense["x"]),
                               rtol=1e-6, atol=1e-7)


def test_arrow_sharded_matches_unsharded():
    """shard_map path over the 8-device CPU mesh == single-device."""
    ndev = min(8, len(jax.devices()))
    K, nk, n0, mk = 2 * ndev, 4, 3, 4
    qp = random_arrow_qp(K, nk, n0, mk, seed=5)
    m = K * mk
    dims = ConeDims(l=m)
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.uniform(0.5, 2.0, m))
    W = identity_scaling(dims)
    W["d"] = d
    W["di"] = 1.0 / d

    mesh = make_mesh(ndev)
    solve_1 = make_arrow_kktsolver(qp)(W)
    solve_n = make_arrow_kktsolver(qp, mesh=mesh)(W)

    n = K * nk + n0
    bx = jnp.asarray(rng.standard_normal(n))
    bz = jnp.asarray(rng.standard_normal(m))
    ux1, _, Wuz1 = solve_1(bx, jnp.zeros(0), bz)
    uxn, _, Wuzn = jax.jit(
        lambda bx_, bz_: solve_n(bx_, jnp.zeros(0), bz_))(bx, bz)
    np.testing.assert_allclose(np.asarray(uxn), np.asarray(ux1),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Wuzn), np.asarray(Wuz1),
                               rtol=1e-9, atol=1e-11)
