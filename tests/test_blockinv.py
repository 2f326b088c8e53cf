"""Block-recursive SPD inverse (ops/blockinv.py) — the explicit-inverse
KKT factor's TPU-shaped replacement for potrf+potri
(/root/reference/src/C/lapack.c)."""

import numpy as np
import jax
import jax.numpy as jnp

from cvxopt_tpu.ops.blockinv import spd_inverse


def _spd(n, b=None, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    shape = (b, n, n) if b else (n, n)
    F = rng.standard_normal(shape) / np.sqrt(n)
    S = F @ np.swapaxes(F, -1, -2) + np.eye(n)
    return jnp.asarray(S, dtype=dtype)


def test_matches_inv_various_sizes():
    for n in (8, 32, 48, 96, 256):
        S = _spd(n, seed=n)
        X = spd_inverse(S)
        np.testing.assert_allclose(np.asarray(X @ S),
                                   np.eye(n), atol=1e-8)
        # symmetric output
        np.testing.assert_allclose(np.asarray(X), np.asarray(X).T,
                                   atol=1e-12)


def test_batched():
    S = _spd(64, b=5, seed=3)
    X = jax.vmap(spd_inverse)(S)
    np.testing.assert_allclose(
        np.asarray(X @ S), np.broadcast_to(np.eye(64), (5, 64, 64)),
        atol=1e-8)


def test_non_pd_gives_nan():
    S = np.eye(64)
    S[40, 40] = -1.0
    X = spd_inverse(jnp.asarray(S))
    assert np.isnan(np.asarray(X)).any()


def test_ill_conditioned_f32_with_equilibration_class():
    # kappa ~ 1e5 in f32: error should stay ~eps32*kappa
    rng = np.random.default_rng(1)
    n = 128
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, 5, n)
    S = (Q * d) @ Q.T
    X = spd_inverse(jnp.asarray(S, jnp.float32))
    err = np.abs(np.asarray(X, np.float64) @ S - np.eye(n)).max()
    assert err < 1e5 * 1.2e-7 * 50, err


def test_blocked_cholesky_matches():
    from cvxopt_tpu.ops.blockinv import blocked_cholesky
    for n in (64, 200, 1030):
        S = _spd(n, seed=n + 1)
        L = blocked_cholesky(S, block=128)
        np.testing.assert_allclose(
            np.asarray(L @ L.T), np.asarray(S), atol=1e-9)
        # lower triangular
        assert np.allclose(np.triu(np.asarray(L), 1), 0.0)


def test_blocked_cholesky_nan_on_non_pd():
    from cvxopt_tpu.ops.blockinv import blocked_cholesky
    S = np.eye(300)
    S[200, 200] = -1.0
    L = blocked_cholesky(jnp.asarray(S), block=128)
    assert np.isnan(np.asarray(L)).any()


def test_panel_cholesky_matches_numpy():
    """Right-looking block-panel Cholesky (VERDICT r04 #3)."""
    from cvxopt_tpu.ops.blockinv import panel_cholesky
    rng = np.random.default_rng(3)
    n = 768
    A = rng.standard_normal((n, n))
    S = A @ A.T + n * np.eye(n)
    L = np.asarray(panel_cholesky(jnp.asarray(S), panel=256))
    ref = np.linalg.cholesky(S)
    np.testing.assert_allclose(L, ref, atol=1e-8 * n)
    # NaN on non-PD input (solver singularity contract)
    Sneg = S - 10 * n * np.eye(n)
    Lb = np.asarray(panel_cholesky(jnp.asarray(Sneg), panel=256))
    assert np.isnan(Lb).any()


def test_tri_inverse_lower():
    from cvxopt_tpu.ops.blockinv import tri_inverse_lower
    rng = np.random.default_rng(4)
    L = np.tril(rng.standard_normal((200, 200))) + 5 * np.eye(200)
    Li = np.asarray(tri_inverse_lower(jnp.asarray(L), base=64))
    np.testing.assert_allclose(Li @ L, np.eye(200), atol=1e-10)
