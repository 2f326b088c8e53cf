"""Pallas fused-Cholesky kernel tests (interpret mode on CPU; the
compiled TPU path is exercised by bench.py).  Cross-checks against the
pure-jnp reference implementations — the jnp-vs-Pallas twin pattern
(SURVEY.md §4 house style)."""

from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl


@pytest.fixture()
def pallas_interpret():
    """Force interpret mode (CPU) for pallas_call."""
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        import importlib
        import cvxopt_tpu.ops.pallas_chol as pc
        importlib.reload(pc)
        yield pc
    import importlib
    import cvxopt_tpu.ops.pallas_chol as pc
    importlib.reload(pc)


def _data(n, m, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, n)).astype(np.float32)
    P = (F @ F.T + n * np.eye(n)).astype(np.float32)
    Gt = rng.standard_normal((n, m)).astype(np.float32)
    dinv2 = rng.uniform(0.5, 2.0, m).astype(np.float32)
    B = rng.standard_normal((8, n)).astype(np.float32)
    return (jnp.asarray(P), jnp.asarray(Gt), jnp.asarray(dinv2),
            jnp.asarray(B))


@pytest.mark.parametrize("n,m", [(64, 96), (128, 192), (192, 128)])
def test_fused_chol_matches_reference(pallas_interpret, n, m):
    pc = pallas_interpret
    P, Gt, dinv2, B = _data(n, m)
    L, Dinv = pc.fused_schur_cholesky(P, Gt, dinv2)
    Lr, Dr = pc.fused_schur_cholesky_ref(P, Gt, dinv2)
    scale = float(jnp.max(jnp.abs(Lr)))
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lr),
                               atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(Dinv), np.asarray(Dr),
                               atol=1e-5)
    x = pc.fused_cholesky_solve(L, Dinv, B)
    xr = pc.fused_cholesky_solve_ref(Lr, Dr, B)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr),
                               atol=1e-5)


def test_fused_chol_rejects_bad_n(pallas_interpret):
    pc = pallas_interpret
    with pytest.raises(ValueError):
        pc.fused_schur_cholesky(jnp.eye(100), jnp.ones((100, 8)),
                                jnp.ones(8))


def test_batched_variants_match_reference(pallas_interpret):
    """Batch-tiled kernels (experimental on TPU) are correct in
    interpret mode."""
    pc = pallas_interpret
    rng = np.random.default_rng(1)
    B, n, m, tb = 4, 128, 160, 2
    F = rng.standard_normal((B, n, n)).astype(np.float32)
    P = jnp.asarray(F @ F.transpose(0, 2, 1) + n * np.eye(n),
                    dtype=jnp.float32)
    Gt = jnp.asarray(rng.standard_normal((n, m)), dtype=jnp.float32)
    dinv2 = jnp.asarray(rng.uniform(0.5, 2.0, (B, m)),
                        dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((B, 4, n)),
                      dtype=jnp.float32)
    L, Dinv = pc.fused_schur_cholesky_batched(P, Gt, dinv2, tb=tb)
    x = pc.fused_cholesky_solve_batched(L, Dinv, rhs, tb=tb)
    for k in range(B):
        Lr, Dr = pc.fused_schur_cholesky_ref(P[k], Gt, dinv2[k])
        scale = float(jnp.max(jnp.abs(Lr)))
        np.testing.assert_allclose(np.asarray(L[k]), np.asarray(Lr),
                                   atol=5e-6 * scale)
        xr = pc.fused_cholesky_solve_ref(Lr, Dr, rhs[k])
        np.testing.assert_allclose(np.asarray(x[k]), np.asarray(xr),
                                   atol=2e-5)
