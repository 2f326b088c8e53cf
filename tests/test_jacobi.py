"""ops/jacobi: batched Jacobi eigh + the accurate-eigh polish wrappers
(the TPU-backend fix for the f32-grade emulated-f64 eigh — see the
block comment in ops/jacobi.py)."""

import numpy as np
import jax.numpy as jnp

from cvxopt_tpu.ops.jacobi import (
    eigh_jacobi, eigh_accurate, gram_eigh_accurate,
)


def _spd(m, kappa, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = np.logspace(0.0, -np.log10(kappa), m)
    S = (Q * lam) @ Q.T
    return (S + S.T) / 2, lam


def test_eigh_jacobi_matches_numpy():
    S, _ = _spd(24, 1e6, seed=1)
    w, V = eigh_jacobi(jnp.asarray(S))
    wn = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(np.asarray(w), wn,
                               rtol=1e-9, atol=1e-12)
    R = np.asarray(V) * np.asarray(w) @ np.asarray(V).T - S
    assert np.abs(R).max() < 1e-12


def test_eigh_accurate_polish_forced():
    # force the polish path on CPU: result must still match numpy.
    # From an f32-grade seed, 6 two-sided sweeps reach f64 absolute
    # accuracy at kappa=1e10 (measured; defaults use 3 — enough for
    # the max_step/scaling absolute-accuracy consumers)
    S, _ = _spd(32, 1e10, seed=2)
    w, V = eigh_accurate(jnp.asarray(S), sweeps=6, force=True)
    wn = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(np.asarray(w), wn, rtol=1e-7,
                               atol=1e-13)
    Vn = np.asarray(V)
    assert np.abs(Vn.T @ Vn - np.eye(32)).max() < 1e-12


def test_gram_eigh_accurate_relative_small_eigs():
    """One-sided Jacobi must deliver RELATIVE accuracy on the small
    eigenvalues of M'M (the NT-scaling requirement; Demmel-Veselic) —
    including when warm-started from a PERTURBED eigenbasis, which is
    the TPU situation (f32-grade initial eigh)."""
    m = 24
    rng = np.random.default_rng(3)
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    Vt, _ = np.linalg.qr(rng.standard_normal((m, m)))
    sig = np.logspace(0.0, -6.0, m)              # kappa(M'M) = 1e12
    M = (U * sig) @ Vt.T
    # f32-grade seeds (the TPU reality) need ~6 one-sided sweeps
    # to recover relative accuracy at kappa = 1e12 (measured:
    # 4 sweeps -> 1.4e-8, 6 sweeps -> 6e-12)
    w, V = gram_eigh_accurate(jnp.asarray(M), sweeps=6, force=True)
    w = np.asarray(w)
    wn = np.sort(sig**2)
    rel = np.abs(w - wn) / wn
    assert rel.max() < 1e-9, rel.max()
    # eigenvectors diagonalize M'M
    G = M.T @ M
    Vn = np.asarray(V)
    off = Vn.T @ G @ Vn - np.diag(w)
    assert np.abs(off).max() < 1e-10 * np.abs(G).max() + 1e-12


def test_gram_eigh_accurate_batched():
    rng = np.random.default_rng(4)
    Ms = []
    for k in range(3):
        U, _ = np.linalg.qr(rng.standard_normal((8, 8)))
        sig = np.logspace(0, -4, 8)
        Ms.append((U * sig) @ U.T)
    M = jnp.asarray(np.stack(Ms))
    w, V = gram_eigh_accurate(M, sweeps=6, force=True)
    for k in range(3):
        wn = np.linalg.eigvalsh(Ms[k].T @ Ms[k])
        np.testing.assert_allclose(np.asarray(w)[k], wn,
                                   rtol=1e-8, atol=1e-15)


def test_cpu_passthrough_identity():
    # on CPU without force, the wrappers are exactly jnp.linalg.eigh
    S, _ = _spd(16, 1e4, seed=5)
    w1, V1 = eigh_accurate(jnp.asarray(S))
    w2, V2 = jnp.linalg.eigh(jnp.asarray(S))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(V1), np.asarray(V2))


def test_eigh_jacobi_matches_xla_shapes():
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
