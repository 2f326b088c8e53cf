"""Batched parallel-ordered Jacobi eigh (ops/jacobi) vs XLA eigh."""

import numpy as np
import jax.numpy as jnp

from cvxopt_tpu.ops.jacobi import eigh_jacobi


def test_eigh_jacobi_matches_xla():
    rng = np.random.default_rng(0)
    for b, m in ((16, 8), (16, 50), (4, 64), (100, 4), (1, 33)):
        X = rng.standard_normal((b, m, m))
        A = (X + X.transpose(0, 2, 1)) / 2
        w, V = eigh_jacobi(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        wref = np.linalg.eigvalsh(A)
        assert np.abs(w - wref).max() < 1e-11 * max(
            1, np.abs(wref).max())
        recon = np.einsum("bij,bj,bkj->bik", V, w, V)
        assert np.abs(recon - A).max() < 1e-11
        orth = np.einsum("bij,bik->bjk", V, V)
        assert np.abs(orth - np.eye(m)).max() < 1e-11


def test_eigh_jacobi_relative_accuracy_spd():
    """Jacobi's small-eigenvalue relative accuracy on graded SPD
    matrices (the NT-scaling regime: lambda spread ~ 1/mu^2)."""
    rng = np.random.default_rng(1)
    m = 12
    d = 10.0 ** np.linspace(-8, 0, m)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    A = (Q * d) @ Q.T
    A = (A + A.T) / 2
    w, _ = eigh_jacobi(jnp.asarray(A), sweeps=16)
    w = np.sort(np.asarray(w))
    ref = np.sort(d)
    rel = np.abs(w - ref) / ref
    assert rel.max() < 1e-6, rel.max()
