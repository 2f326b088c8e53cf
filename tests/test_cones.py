"""Unit tests for the cone algebra layer (cvxopt_tpu.cones).

Verification style mirrors the reference's house pattern (SURVEY.md §4):
the pure-Python kernels in misc.py define the semantics; here we verify
the same algebraic identities (NT scaling contracts, Jordan-algebra
inverses, pack isometry) numerically.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cvxopt_tpu import cones
from cvxopt_tpu.cones import ConeDims
from cvxopt_tpu import scaling


DIMS = [
    ConeDims(l=5),
    ConeDims(l=3, q=(4, 4, 3)),
    ConeDims(l=2, q=(3,), s=(3, 3, 2)),
    ConeDims(l=0, q=(5, 5)),
    ConeDims(l=0, q=(), s=(4,)),
    ConeDims(l=4, q=(3, 3, 3), s=(2, 5)),
]


def interior_point(dims, rng, shift=2.0):
    """Random point in the interior of the cone."""
    x = np.zeros(dims.cdim)
    nl = dims.lnl
    x[:nl] = rng.uniform(0.5, 2.0, nl)
    for off, cnt, m in dims.q_runs:
        blk = rng.standard_normal((cnt, m))
        blk[:, 0] = np.linalg.norm(blk[:, 1:], axis=1) + \
            rng.uniform(0.5, 2.0, cnt)
        x[off:off + cnt * m] = blk.reshape(-1)
    for off, _, cnt, m in dims.s_runs:
        A = rng.standard_normal((cnt, m, m))
        S = A @ np.swapaxes(A, 1, 2) + shift * np.eye(m)
        x[off:off + cnt * m * m] = S.reshape(-1)
    return jnp.asarray(x)


def sym_point(dims, rng):
    """Random symmetric (not necessarily PSD) cone-space vector."""
    x = rng.standard_normal(dims.cdim)
    return cones.symmetrize(jnp.asarray(x), dims)


@pytest.mark.parametrize("dims", DIMS)
def test_compute_scaling_contract(dims):
    """W z = W^{-T} s = lambda (misc.py:250-256)."""
    rng = np.random.default_rng(0)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    W, lmbda = scaling.compute_scaling(s, z, dims)
    lam_full = cones.diag_embed(lmbda, dims)
    Wz = scaling.scale(z, W, dims, trans="N", inverse="N")
    Wts = scaling.scale(s, W, dims, trans="T", inverse="I")
    np.testing.assert_allclose(np.asarray(Wz), np.asarray(lam_full),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Wts), np.asarray(lam_full),
                               rtol=1e-7, atol=1e-8)
    # lambda is in the cone interior
    assert float(cones.max_step(lam_full, dims)) < 0


@pytest.mark.parametrize("dims", DIMS)
@pytest.mark.parametrize("trans", ["N", "T"])
def test_scale_roundtrip(dims, trans):
    rng = np.random.default_rng(1)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    W, _ = scaling.compute_scaling(s, z, dims)
    x = sym_point(dims, rng)
    y = scaling.scale(x, W, dims, trans=trans, inverse="N")
    x2 = scaling.scale(y, W, dims, trans=trans, inverse="I")
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_scale2_maps_lambda_to_identity(dims):
    """H(lambda^{-1/2}) e = lambda and H(lambda^{1/2}) lambda = e."""
    rng = np.random.default_rng(2)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    _, lmbda = scaling.compute_scaling(s, z, dims)
    e = cones.cone_identity(dims, dtype=lmbda.dtype)
    lam_full = cones.diag_embed(lmbda, dims)
    out = scaling.scale2(lmbda, lam_full, dims, inverse="N")
    np.testing.assert_allclose(np.asarray(out), np.asarray(e),
                               rtol=1e-7, atol=1e-8)
    out2 = scaling.scale2(lmbda, e, dims, inverse="I")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(lam_full),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_scale2_roundtrip(dims):
    rng = np.random.default_rng(3)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    _, lmbda = scaling.compute_scaling(s, z, dims)
    x = sym_point(dims, rng)
    y = scaling.scale2(lmbda, x, dims, inverse="N")
    x2 = scaling.scale2(lmbda, y, dims, inverse="I")
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_sprod_sinv_roundtrip(dims):
    rng = np.random.default_rng(4)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    _, lmbda = scaling.compute_scaling(s, z, dims)
    x = sym_point(dims, rng)
    y = cones.sprod_diag(x, lmbda, dims)
    x2 = cones.sinv(y, lmbda, dims)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_sprod_diag_matches_full(dims):
    rng = np.random.default_rng(5)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    _, lmbda = scaling.compute_scaling(s, z, dims)
    x = sym_point(dims, rng)
    full = cones.sprod(x, cones.diag_embed(lmbda, dims), dims)
    diag = cones.sprod_diag(x, lmbda, dims)
    np.testing.assert_allclose(np.asarray(full), np.asarray(diag),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_ssqr(dims):
    rng = np.random.default_rng(6)
    s = interior_point(dims, rng)
    z = interior_point(dims, rng)
    _, lmbda = scaling.compute_scaling(s, z, dims)
    lam_full = cones.diag_embed(lmbda, dims)
    sq_full = cones.sprod(lam_full, lam_full, dims)
    sq = cones.ssqr(lmbda, dims)
    np.testing.assert_allclose(np.asarray(cones.diag_part(sq_full, dims)),
                               np.asarray(sq), rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_max_step(dims):
    rng = np.random.default_rng(7)
    x = interior_point(dims, rng)
    t = cones.max_step(x, dims)
    assert float(t) < 0  # interior
    e = cones.cone_identity(dims, dtype=x.dtype)
    # x + t*e is on the boundary
    t2 = cones.max_step(x + t * e, dims)
    assert abs(float(t2)) < 1e-8
    # sym (non-PSD) point gives positive step
    y = sym_point(dims, rng) - 10.0 * e
    assert float(cones.max_step(y, dims)) > 0


@pytest.mark.parametrize("dims", DIMS)
def test_max_step_eig_consistent(dims):
    rng = np.random.default_rng(8)
    x = sym_point(dims, rng)
    t1 = cones.max_step(x, dims)
    t2, sig, Q = cones.max_step_eig(x, dims)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-10)
    # eigendecomposition reconstructs the 's' blocks
    for run in dims.s_runs:
        off, doff, cnt, m = run
        V = np.asarray(cones.sview(Q, run))
        w = np.asarray(sig)[doff - dims.lnl - dims.qdim:]
        w = w[:cnt * m].reshape(cnt, m)
        X = np.asarray(cones.sview(x, run))
        R = np.einsum("kij,kj,klj->kil", V, w, V)
        np.testing.assert_allclose(R, X, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_pack_isometry(dims):
    rng = np.random.default_rng(9)
    x = sym_point(dims, rng)
    y = sym_point(dims, rng)
    px, py = cones.pack(x, dims), cones.pack(y, dims)
    assert px.shape[-1] == dims.cdim_packed
    np.testing.assert_allclose(float(jnp.dot(px, py)),
                               float(cones.sdot(x, y, dims)), rtol=1e-10)
    x2 = cones.unpack(px, dims)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("dims", DIMS)
def test_update_scaling_contract(dims):
    """After update_scaling, W_new z_t = W_new^{-T} s_t = lambda_new for
    the new iterates s_t, z_t (misc.py:422-436)."""
    rng = np.random.default_rng(10)
    s0 = interior_point(dims, rng)
    z0 = interior_point(dims, rng)
    W, lmbda = scaling.compute_scaling(s0, z0, dims)

    st = interior_point(dims, rng)
    zt = interior_point(dims, rng)
    # scaled iterates: l/q parts W^{-T} st and W zt; 's' parts factors
    s_arg = scaling.scale(st, W, dims, trans="T", inverse="I")
    z_arg = scaling.scale(zt, W, dims, trans="N", inverse="N")
    for run in dims.s_runs:
        off, _, cnt, m = run
        Ss = cones.sview(s_arg, run)
        Sz = cones.sview(z_arg, run)
        Ls = jnp.linalg.cholesky(Ss)
        Lz = jnp.linalg.cholesky(Sz)
        s_arg = s_arg.at[off:off + cnt * m * m].set(Ls.reshape(-1))
        z_arg = z_arg.at[off:off + cnt * m * m].set(Lz.reshape(-1))

    Wn, ln = scaling.update_scaling(W, lmbda, s_arg, z_arg, dims)
    lam_full = cones.diag_embed(ln, dims)
    np.testing.assert_allclose(
        np.asarray(scaling.scale(zt, Wn, dims)), np.asarray(lam_full),
        rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(scaling.scale(st, Wn, dims, trans="T", inverse="I")),
        np.asarray(lam_full), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("dims", DIMS)
def test_identity_scaling(dims):
    rng = np.random.default_rng(11)
    x = sym_point(dims, rng)
    W = scaling.identity_scaling(dims, dtype=x.dtype)
    for trans in ("N", "T"):
        for inv in ("N", "I"):
            y = scaling.scale(x, W, dims, trans=trans, inverse=inv)
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-12)


def test_dims_properties():
    d = ConeDims(l=3, q=(4, 4, 3), s=(2, 2, 5))
    assert d.cdim == 3 + 11 + 4 + 4 + 25
    assert d.cdim_packed == 3 + 11 + 3 + 3 + 15
    assert d.cdim_diag == 3 + 11 + 2 + 2 + 5
    assert d.q_runs == ((3, 2, 4), (11, 1, 3))
    assert d.s_runs == ((14, 14, 2, 2), (22, 18, 1, 5))
    # hashable / usable as static arg
    assert hash(d) == hash(ConeDims(l=3, q=(4, 4, 3), s=(2, 2, 5)))
