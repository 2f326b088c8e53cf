"""Nesterov–Todd scaling for the symmetric cone R^l_+ x SOC x PSD.

TPU-native functional equivalents of the reference's scaling kernels
(/root/reference/src/python/misc.py:30-634; C twin misc_solvers.c:85-400):

  scale            W*x, W'*x, W^{-1}*x, W^{-T}*x        (misc.py:30)
  scale2           H(lambda^{1/2})*x, H(lambda^{-1/2})*x (misc.py:170)
  compute_scaling  initial W with W*z = W^{-T}*s = lambda (misc.py:250)
  update_scaling   rank-preserving NT update             (misc.py:422)
  identity_scaling W = I (solver cold start, coneprog.py:670-679)

The scaling W is a pytree dict:

  W['dnl'], W['dnli'] : (mnl,) arrays (only when dims.mnl > 0)
  W['d'], W['di']     : (l,) arrays
  W['beta']           : list over q-runs of (count,) arrays
  W['v']              : list over q-runs of (count, m) arrays
  W['r'], W['rti']    : list over s-runs of (count, m, m) arrays

This mirrors the reference's public W dict (coneprog.py:323-339) except
that per-block lists are stacked per run of equal-size blocks — the
TPU-native layout that turns e.g. 100 SOC blocks into one batched op.
All functions are pure, broadcast over leading batch axes, and are
jit/vmap-compatible with `dims` static.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from cvxopt_tpu.ops.jacobi import gram_eigh_accurate
from cvxopt_tpu.cones import (
    Array, ConeDims, jdot, jnrm2, qview, sview, sdiagview, _set,
)


def _floor_eigs(w: Array) -> Array:
    """Floor Gram eigenvalues away from <=0 before 1/sqrt.

    The floor must survive the emulated-f64 TPU backend, which
    inherits the f32 exponent range (ops/jacobi.py) — a denormal-f64
    constant like 1e-300 flushes to exactly 0 there.  Use a
    scale-relative floor (eps^2 * max eigenvalue per block) with an
    absolute ~1e-30 backstop, both representable in f32 range."""
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    floor = jnp.maximum(1e-28 * scale, 1e-30)
    return jnp.maximum(w, floor)


def identity_scaling(dims: ConeDims, dtype=None) -> Dict:
    """W = identity (cold-start scaling, coneprog.py:670-679)."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    W = {
        "d": jnp.ones((dims.l,), dtype=dtype),
        "di": jnp.ones((dims.l,), dtype=dtype),
        "beta": [], "v": [], "r": [], "rti": [],
    }
    if dims.mnl:
        W["dnl"] = jnp.ones((dims.mnl,), dtype=dtype)
        W["dnli"] = jnp.ones((dims.mnl,), dtype=dtype)
    for (_, cnt, m) in dims.q_runs:
        W["beta"].append(jnp.ones((cnt,), dtype=dtype))
        v = jnp.zeros((cnt, m), dtype=dtype).at[:, 0].set(1.0)
        W["v"].append(v)
    for (_, _, cnt, m) in dims.s_runs:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=dtype), (cnt, m, m))
        W["r"].append(eye)
        W["rti"].append(eye)
    return W


def _dfull(W: Dict) -> Array:
    """Concatenated elementwise scaling for the (mnl + l) region."""
    if "dnl" in W:
        return jnp.concatenate([W["dnl"], W["d"]], axis=-1)
    return W["d"]


def _difull(W: Dict) -> Array:
    if "dnli" in W:
        return jnp.concatenate([W["dnli"], W["di"]], axis=-1)
    return W["di"]


def scale(x: Array, W: Dict, dims: ConeDims, trans: str = "N",
          inverse: str = "N") -> Array:
    """Apply the NT scaling (misc.py:30-164):

        x := W x       (trans 'N', inverse 'N')
        x := W' x      (trans 'T', inverse 'N')
        x := W^{-1} x  (trans 'N', inverse 'I')
        x := W^{-T} x  (trans 'T', inverse 'I')

    Broadcasts over leading axes of x (so a (n, cdim) stack of rows is
    scaled in one call — replaces the reference's per-column loops).
    """
    out = x
    nl = dims.lnl
    if nl:
        d = _dfull(W) if inverse == "N" else _difull(W)
        out = _set(out, slice(0, nl), x[..., :nl] * d)

    for i, run in enumerate(dims.q_runs):
        off, cnt, m = run
        v = W["v"][i]                       # (cnt, m)
        beta = W["beta"][i]                 # (cnt,)
        xk = qview(x, run)                  # (..., cnt, m)
        if inverse == "N":
            # beta * (2 v (v'x) - J x)
            w = jnp.sum(v * xk, axis=-1, keepdims=True)
            Jx = jnp.concatenate([xk[..., :1], -xk[..., 1:]], axis=-1)
            new = beta[..., :, None] * (2.0 * v * w - Jx)
        else:
            # (1/beta) * J (2 v (v'Jx) - x)
            t = jdot(v, xk)[..., None]
            y = 2.0 * v * t - xk
            Jy = jnp.concatenate([y[..., :1], -y[..., 1:]], axis=-1)
            new = Jy / beta[..., :, None]
        out = _set(out, slice(off, off + cnt * m), new)

    for i, run in enumerate(dims.s_runs):
        off, _, cnt, m = run
        X = sview(x, run)                   # (..., cnt, m, m)
        if inverse == "N":
            r = W["r"][i]
            if trans == "N":
                new = jnp.swapaxes(r, -1, -2) @ X @ r       # r' X r
            else:
                new = r @ X @ jnp.swapaxes(r, -1, -2)       # r X r'
        else:
            rti = W["rti"][i]
            if trans == "N":
                new = rti @ X @ jnp.swapaxes(rti, -1, -2)   # rti X rti'
            else:
                new = jnp.swapaxes(rti, -1, -2) @ X @ rti   # rti' X rti
        out = _set(out, slice(off, off + cnt * m * m), new)
    return out


def scale_w2inv(x: Array, W: Dict, dims: ConeDims) -> Array:
    """Fused x := W^{-1} W^{-T} x (one pass; equals
    scale(scale(x, W, trans='T', inverse='I'), W, inverse='I')).

    The KKT solve paths apply this to every right-hand side
    (misc.py:1404: "bz := W^{-1}W^{-T} bz"); fusing the two scale
    passes halves the cone-kernel work there — for 's' runs one
    R2-conjugation (R2 = rti rti') replaces two rti-conjugations
    (2 batched matmuls instead of 4), for 'q' runs two dot products
    replace four.
    """
    out = x
    nl = dims.lnl
    if nl:
        di = _difull(W)
        out = _set(out, slice(0, nl), x[..., :nl] * (di * di))

    for i, run in enumerate(dims.q_runs):
        off, cnt, m = run
        v = W["v"][i]                        # (cnt, m)
        beta = W["beta"][i]                  # (cnt,)
        xk = qview(x, run)
        # W^{-2} x = (x + 2 Jv a - 2 v (v'Jx)) / beta^2 with
        # a = 2 (v'v)(v'Jx) - v'x  (derived from two W^{-1} passes
        # using v'Jv = 1)
        vJx = jdot(v, xk)[..., None]
        vx = jnp.sum(v * xk, axis=-1, keepdims=True)
        vv = jnp.sum(v * v, axis=-1, keepdims=True)
        a = 2.0 * vv * vJx - vx
        Jv = jnp.concatenate([v[..., :1], -v[..., 1:]], axis=-1)
        new = (xk + 2.0 * Jv * a - 2.0 * v * vJx) \
            / (beta * beta)[..., :, None]
        out = _set(out, slice(off, off + cnt * m), new)

    for i, run in enumerate(dims.s_runs):
        off, _, cnt, m = run
        X = sview(x, run)
        rti = W["rti"][i]
        R2 = rti @ jnp.swapaxes(rti, -1, -2)
        new = R2 @ X @ R2                    # R2 symmetric
        out = _set(out, slice(off, off + cnt * m * m), new)
    return out


def scale_rows(M: Array, W: Dict, dims: ConeDims, trans: str = "N",
               inverse: str = "N") -> Array:
    """Apply `scale` to every column of a (cdim, n) matrix; returns the
    scaled (cdim, n) matrix.  Replaces the per-column loop in the
    reference KKT factor routines (misc.py:1162-1171, 1614-1627)."""
    return jnp.swapaxes(
        scale(jnp.swapaxes(M, -1, -2), W, dims, trans=trans,
              inverse=inverse), -1, -2)


def scale2(lmbda: Array, x: Array, dims: ConeDims,
           inverse: str = "N") -> Array:
    """x := H(lambda^{1/2}) x (inverse 'N') or H(lambda^{-1/2}) x
    (inverse 'I'), H the Hessian of the log barrier (misc.py:170-247).

    lmbda is in diagonal storage (cdim_diag)."""
    out = x
    nl = dims.lnl
    if nl:
        if inverse == "N":
            out = _set(out, slice(0, nl), x[..., :nl] / lmbda[..., :nl])
        else:
            out = _set(out, slice(0, nl), x[..., :nl] * lmbda[..., :nl])

    for run in dims.q_runs:
        off, cnt, m = run
        xk = qview(x, run)
        lk = lmbda[..., off:off + cnt * m].reshape(
            lmbda.shape[:-1] + (cnt, m))
        a = jnrm2(lk)[..., None]
        lbar = lk / a
        if inverse == "N":
            lx = jdot(lbar, xk)[..., None]
            c = (lx + xk[..., :1]) / (lbar[..., :1] + 1.0)
            new = jnp.concatenate(
                [lx, xk[..., 1:] - c * lbar[..., 1:]], axis=-1) / a
        else:
            lx = jnp.sum(lbar * xk, axis=-1, keepdims=True)
            c = (lx + xk[..., :1]) / (lbar[..., :1] + 1.0)
            new = jnp.concatenate(
                [lx, xk[..., 1:] + c * lbar[..., 1:]], axis=-1) * a
        out = _set(out, slice(off, off + cnt * m), new)

    for run in dims.s_runs:
        off, _, cnt, m = run
        X = sview(x, run)
        lk = sdiagview(lmbda, run)          # (cnt, m)
        f = jnp.sqrt(lk[..., :, None] * lk[..., None, :])
        new = X / f if inverse == "N" else X * f
        out = _set(out, slice(off, off + cnt * m * m), new)
    return out


def compute_scaling(s: Array, z: Array, dims: ConeDims):
    """Initial NT scaling W with W z = W^{-T} s = lambda
    (misc.py:250-419).  Returns (W, lmbda) with lmbda in diagonal
    storage (cdim_diag)."""
    W: Dict = {}
    lparts: List[Array] = []

    nl = dims.lnl
    sl, zl = s[..., :nl], z[..., :nl]
    d = jnp.sqrt(sl / zl)
    if dims.mnl:
        W["dnl"] = d[..., :dims.mnl]
        W["dnli"] = 1.0 / W["dnl"]
        W["d"] = d[..., dims.mnl:]
    else:
        W["d"] = d
    W["di"] = 1.0 / W["d"]
    if nl:
        lparts.append(jnp.sqrt(sl * zl))

    W["beta"], W["v"] = [], []
    for run in dims.q_runs:
        sk, zk = qview(s, run), qview(z, run)     # (cnt, m)
        aa = jnrm2(sk)[..., None]
        bb = jnrm2(zk)[..., None]
        W["beta"].append(jnp.sqrt(aa / bb)[..., 0])
        sz = jnp.sum(sk * zk, axis=-1, keepdims=True)
        cc = jnp.sqrt((sz / (aa * bb) + 1.0) / 2.0)
        sbar, zbar = sk / aa, zk / bb
        Jzbar = jnp.concatenate([zbar[..., :1], -zbar[..., 1:]], axis=-1)
        v = (sbar + Jzbar) / (2.0 * cc)
        v = v.at[..., 0].add(1.0)
        v = v / jnp.sqrt(2.0 * v[..., :1])
        W["v"].append(v)
        # lambda_k (misc.py:339-352)
        dd = 2.0 * cc + sbar[..., :1] + zbar[..., :1]
        l1 = ((cc + zbar[..., :1]) / dd) * sbar[..., 1:] + \
             ((cc + sbar[..., :1]) / dd) * zbar[..., 1:]
        lk = jnp.concatenate([cc, l1], axis=-1) * jnp.sqrt(aa * bb)
        lparts.append(lk.reshape(lk.shape[:-2] + (-1,)))

    W["r"], W["rti"] = [], []
    for run in dims.s_runs:
        sk, zk = sview(s, run), sview(z, run)     # (cnt, m, m)
        Ls = jnp.linalg.cholesky(sk)
        Lz = jnp.linalg.cholesky(zk)
        # The reference uses gesvd on Lz'Ls (misc.py:393-414).  Here we
        # use the eigh-based equivalent (XLA's batched SVD compiles
        # orders of magnitude slower and eigh maps better to TPU):
        # with eigh(Ls' z Ls) = V diag(lam^2) V',
        #   r   = Ls V diag(lam)^{-1/2}
        #   rti = Ls^{-T} V diag(lam)^{1/2}
        # satisfy the defining NT relations r' z r = diag(lam),
        # r' s^{-1} r = diag(lam)^{-1}, rti = r^{-T}.
        M = jnp.swapaxes(Lz, -1, -2) @ Ls
        # gram_eigh_accurate == eigh(M'M) on CPU; on the TPU backend it
        # adds the one-sided-Jacobi polish that restores the RELATIVE
        # small-eigenvalue accuracy the emulated-f64 eigh loses — the
        # property the reference gets from gesvd (misc.py:393-414)
        w, V = gram_eigh_accurate(M)
        # eigh is ascending; NT lambda order is a free choice — flip to
        # descending to match the reference's SVD ordering.
        # floor the eigenvalues away from 0: a drifted numerically
        # rank-deficient M yields w <= 0, and an exactly-zero lambda
        # would turn the 1/lam factors into inf -> NaN (the reference's
        # gesvd returns tiny positive singular values and divides
        # regardless; the stall detectors handle the non-progress).
        # The floor must be REPRESENTABLE on the emulated-f64 TPU
        # backend (f32 exponent range — 1e-300 underflows to exactly 0
        # there), so use a scale-relative floor per block with a ~1e-30
        # absolute backstop.
        lam = jnp.sqrt(_floor_eigs(w[..., ::-1]))
        V = V[..., ::-1]
        LsV = Ls @ V
        r = LsV / jnp.sqrt(lam)[..., None, :]
        rti = jsl.solve_triangular(
            jnp.swapaxes(Ls, -1, -2), V, lower=False) * \
            jnp.sqrt(lam)[..., None, :]
        W["r"].append(r)
        W["rti"].append(rti)
        lparts.append(lam.reshape(lam.shape[:-2] + (-1,)))

    lmbda = (jnp.concatenate(lparts, axis=-1) if lparts
             else jnp.zeros(s.shape[:-1] + (0,), dtype=s.dtype))
    return W, lmbda


def update_scaling(W: Dict, lmbda: Array, s: Array, z: Array,
                   dims: ConeDims):
    """Rank-preserving NT scaling update (misc.py:422-634).

    On entry the nonlinear/'l'/'q' components of s, z contain the new
    iterates in the CURRENT scaling (W^{-T} s_new, W z_new); the 's'
    components contain square factors Ls, Lz with Ls Ls' = W^{-T} s_new,
    Lz Lz' = W z_new (not necessarily triangular).  Returns updated
    (W, lmbda)."""
    Wn = dict(W)
    lnew = lmbda

    nl = dims.lnl
    if nl:
        rs = jnp.sqrt(s[..., :nl])
        rz = jnp.sqrt(z[..., :nl])
        dl = _dfull(W) * rs / rz
        if dims.mnl:
            Wn["dnl"] = dl[..., :dims.mnl]
            Wn["dnli"] = 1.0 / Wn["dnl"]
            Wn["d"] = dl[..., dims.mnl:]
        else:
            Wn["d"] = dl
        Wn["di"] = 1.0 / Wn["d"]
        lnew = _set(lnew, slice(0, nl), rs * rz)

    Wn["beta"], Wn["v"] = [], []
    for i, run in enumerate(dims.q_runs):
        off, cnt, m = run
        v, beta = W["v"][i], W["beta"][i]
        sk, zk = qview(s, run), qview(z, run)
        aa = jnrm2(sk)[..., None]
        bb = jnrm2(zk)[..., None]
        sbar, zbar = sk / aa, zk / bb
        cc = jnp.sqrt((1.0 + jnp.sum(sbar * zbar, axis=-1,
                                     keepdims=True)) / 2.0)
        vs = jnp.sum(v * sbar, axis=-1, keepdims=True)
        vz = jdot(v, zbar)[..., None]
        vq = (vs + vz) / (2.0 * cc)
        vu = vs - vz
        w0 = 2.0 * v[..., :1] * vq - (sbar[..., :1] + zbar[..., :1]) / \
            (2.0 * cc)
        dd = (v[..., :1] * vu - sbar[..., :1] / 2.0 +
              zbar[..., :1] / 2.0) / (w0 + 1.0)
        # lambda_k (misc.py:539-557)
        l1 = v[..., 1:] * (2.0 * (-dd * vq + 0.5 * vu)) + \
            0.5 * (1.0 - dd / cc) * sbar[..., 1:] + \
            0.5 * (1.0 + dd / cc) * zbar[..., 1:]
        lk = jnp.concatenate([cc, l1], axis=-1) * jnp.sqrt(aa * bb)
        lnew = _set(lnew, slice(off, off + cnt * m),
                    lk.reshape(lk.shape[:-2] + (-1,)))
        # v := (2 v v' - J) q, then v := (v + e)/sqrt(2 (v0+1))
        Jsbar = jnp.concatenate([sbar[..., :1], -sbar[..., 1:]], axis=-1)
        vn = 2.0 * vq * v - (Jsbar + zbar) / (2.0 * cc)
        vn = vn.at[..., 0].add(1.0)
        vn = vn / jnp.sqrt(2.0 * vn[..., :1])
        Wn["v"].append(vn)
        Wn["beta"].append(beta * jnp.sqrt(aa / bb)[..., 0])

    Wn["r"], Wn["rti"] = [], []
    for i, run in enumerate(dims.s_runs):
        off, _, cnt, m = run
        r, rti = W["r"][i], W["rti"][i]
        Ls, Lz = sview(s, run), sview(z, run)
        # eigh-based equivalent of the reference's SVD update
        # (misc.py:592-634): with M = Lz'Ls and eigh(M'M) = V lam^2 V',
        # U = M V diag(lam)^{-1}, the update is
        #   r   := r Ls V diag(lam)^{-1/2}
        #   rti := rti Lz U diag(lam)^{-1/2}
        M = jnp.swapaxes(Lz, -1, -2) @ Ls
        w, V = gram_eigh_accurate(M)      # see compute_scaling note
        # scale-relative floor, representable under emulated f64 —
        # see the compute_scaling note above.
        lam = jnp.sqrt(_floor_eigs(w[..., ::-1]))
        V = V[..., ::-1]
        U = (M @ V) / lam[..., None, :]
        inv_sqrt = 1.0 / jnp.sqrt(lam)
        rn = (r @ (Ls @ V)) * inv_sqrt[..., None, :]
        rtin = (rti @ (Lz @ U)) * inv_sqrt[..., None, :]
        Wn["r"].append(rn)
        Wn["rti"].append(rtin)
        lnew = _set(lnew, slice(run[1], run[1] + cnt * m),
                    lam.reshape(lam.shape[:-2] + (-1,)))
    return Wn, lnew
