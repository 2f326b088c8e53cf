"""ops/matvec: the f64 fast-path matvec must equal `@` on every
backend (the mulsum form is the TPU lowering workaround — see the
module docstring and scripts/tpu_f64_matvec.py measurements)."""

import numpy as np
import jax
import jax.numpy as jnp

from cvxopt_tpu.ops.matvec import mv, mvt


def test_mv_matches_dot():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((7, 5)))
    x = jnp.asarray(rng.standard_normal(5))
    z = jnp.asarray(rng.standard_normal(7))
    np.testing.assert_allclose(np.asarray(mv(A, x)),
                               np.asarray(A) @ np.asarray(x),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(mvt(A, z)),
                               np.asarray(A).T @ np.asarray(z),
                               rtol=1e-13)


def test_mv_mulsum_form_matches_dot():
    # force the mulsum expression itself (backend-independent check of
    # the formula the TPU path uses)
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((64, 33)))
    x = jnp.asarray(rng.standard_normal(33))
    z = jnp.asarray(rng.standard_normal(64))
    ms = jnp.sum(A * x[None, :], axis=-1)
    mst = jnp.sum(A * z[:, None], axis=-2)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(A @ x),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mst), np.asarray(A.T @ z),
                               rtol=1e-12)


def test_mv_vmap_and_empty():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.standard_normal((4, 7, 5)))
    x = jnp.asarray(rng.standard_normal((4, 5)))
    out = jax.vmap(mv)(A, x)
    np.testing.assert_allclose(
        np.asarray(out), np.einsum('bij,bj->bi', np.asarray(A),
                                   np.asarray(x)), rtol=1e-12)
    E = jnp.zeros((0, 5))
    assert mv(E, x[0]).shape == (0,)
    assert mvt(E, jnp.zeros((0,))).shape == (5,)


def test_mv_matrix_rhs_keeps_dot():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((6, 4)))
    X = jnp.asarray(rng.standard_normal((4, 3)))
    np.testing.assert_allclose(np.asarray(mv(A, X)),
                               np.asarray(A) @ np.asarray(X),
                               rtol=1e-13)
