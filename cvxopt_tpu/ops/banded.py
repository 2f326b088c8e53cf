"""Banded and tridiagonal factorizations — `lax.scan` recurrences.

TPU-native equivalents of the reference's banded/tridiagonal LAPACK
wrappers (/root/reference/src/C/lapack.c:7341-7400: gbsv/gbtrf/gbtrs,
gtsv/gttrf/gttrs, pbsv/pbtrf/pbtrs, ptsv/pttrf/pttrs, tbtrs).

Design: a banded factorization is a length-n recurrence over a
fixed-size working window — exactly what `lax.scan` compiles well on
TPU (static shapes, no dynamic slicing of the band).  Cost scales as
O(n * kd^2) for the factor and O(n * kd) per solve, which is what
makes the sparse direct path (ops/spsolve.py) scale to 1e5-variable
problems after a bandwidth-reducing ordering.

Storage conventions (matching LAPACK band storage as used by the
reference):
  - symmetric positive definite band, LOWER: `AB[j, i] = A[i+j, i]`,
    shape (kd+1, n) — AB[0] is the diagonal;
  - general tridiagonal: vectors (dl, d, du) of lengths n-1, n, n-1.

All functions are jit-compatible; leading batch axes are supported via
`jax.vmap`.  Non-PD pivots surface as NaN (rsqrt of a negative), the
solvers' jit-compatible analogue of LAPACK's info != 0.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

__all__ = [
    "pbtrf", "pbtrs", "pbsv", "pbtrf_blocked", "pbtrs_blocked",
    "pttrf", "pttrs", "ptsv",
    "gtsv", "gttrf", "gttrs", "tbtrs", "gbsv", "gbtrf", "gbtrs",
    "band_to_dense", "dense_to_band",
]


def band_to_dense(AB, uplo="L"):
    """Symmetric band (kd+1, n) lower storage -> dense (n, n)."""
    kdp1, n = AB.shape
    kd = kdp1 - 1
    A = jnp.zeros((n, n), AB.dtype)
    for j in range(kd + 1):
        d = AB[j, : n - j]
        A = A + jnp.diag(d, -j)
        if j:
            A = A + jnp.diag(d, j)
    return A


def dense_to_band(A, kd, uplo="L"):
    """Dense symmetric (n, n) -> lower band storage (kd+1, n)."""
    n = A.shape[-1]
    rows = []
    for j in range(kd + 1):
        d = jnp.diagonal(A, -j)
        rows.append(jnp.pad(d, (0, j)))
    return jnp.stack(rows)


def _band_rows(AB):
    """(kd+1, n) lower band -> row-window layout (n, kd+1) where
    R[r, j] = A[r, r-kd+j]  (zero where out of range; R[r, kd] is the
    diagonal)."""
    kdp1, n = AB.shape
    kd = kdp1 - 1
    # A[r, c] with c = r-kd+j lives at AB[r-c, c] = AB[kd-j, r-kd+j]
    r = jnp.arange(n)[:, None]
    j = jnp.arange(kd + 1)[None, :]
    col = r - kd + j
    valid = col >= 0
    col_c = jnp.clip(col, 0, n - 1)
    vals = AB[kd - j, col_c]
    return jnp.where(valid, vals, 0.0)


def pbtrf(AB, dbound: float = 0.0):
    """Banded Cholesky (lower): AB (kd+1, n) -> LB (kd+1, n) with
    LB[0] = diag(L), LB[j, i] = L[i+j, i].  NaN on non-PD pivots
    (reference pbtrf, lapack.c).  `dbound` > 0 clamps pivots during
    elimination (CHOLMOD's dbound semantics, cholmod.c:84-140) so
    semi-definite matrices factor with a regularized diagonal."""
    kdp1, n = AB.shape
    kd = kdp1 - 1
    if kd == 0:
        A0 = jnp.maximum(AB, dbound) if dbound > 0 else AB
        return jnp.sqrt(A0)
    R = _band_rows(AB)                     # (n, kd+1)

    # initial window: A[0:kd+1, 0:kd+1]
    W0 = band_to_dense(AB[:, : kd + 1]) if n >= kd + 1 else None
    if n < kd + 1:
        raise ValueError("n must be >= kd+1")
    # rows that stream in: r = kd+1 .. n-1, then kd pad rows
    Rin = jnp.concatenate(
        [R[kd + 1:], jnp.zeros((kd + 1, kd + 1), AB.dtype)], axis=0)
    # pad diag = 1 keeps the padded window PD
    Rin = Rin.at[n - kd - 1:, kd].set(1.0) if n - kd - 1 >= 0 else Rin

    def step(W, rnew):
        d2 = W[0, 0]
        if dbound > 0:
            d2 = jnp.maximum(d2, dbound)
        dinv = lax.rsqrt(d2)               # NaN for d2 < 0
        dinv = jnp.where(d2 > 0, dinv, jnp.nan)
        col = W[1:, 0] * dinv
        core = W[1:, 1:] - jnp.outer(col, col)
        Wn = jnp.zeros_like(W)
        Wn = Wn.at[:kd, :kd].set(core)
        Wn = Wn.at[kd, :kd].set(rnew[:kd])
        Wn = Wn.at[:kd, kd].set(rnew[:kd])
        Wn = Wn.at[kd, kd].set(rnew[kd])
        return Wn, jnp.concatenate([1.0 / dinv[None], col])

    _, cols = lax.scan(step, W0, Rin[:n])
    return cols.T                          # (kd+1, n)


def _band_blocks(AB, cb):
    """Band (kd+1, n) lower storage -> block-tridiagonal dense blocks:
    D (nb, cb, cb) symmetric diagonal blocks and E (nb, cb, cb)
    subdiagonal blocks (E[i] couples block i+1 to block i; E[nb-1] is
    zero).  n is padded to nb*cb with unit diagonal."""
    kdp1, n = AB.shape
    kd = kdp1 - 1
    nb = -(-n // cb)
    npad = nb * cb
    # padded flat accessor: A[p, q] = AB[p-q, q] for 0 <= p-q <= kd
    ABp = jnp.pad(AB, ((0, 0), (0, npad - n)))
    # unit diagonal on the padding keeps the padded matrix PD
    if npad > n:
        ABp = ABp.at[0, n:].set(1.0)

    i = jnp.arange(nb)[:, None, None]
    r = jnp.arange(cb)[None, :, None]
    c = jnp.arange(cb)[None, None, :]
    # D[i][r, c] = A[i*cb + r, i*cb + c]  (lower: d = r - c in [0, kd])
    d = r - c
    q = i * cb + c
    Dl = jnp.where((d >= 0) & (d <= kd),
                   ABp[jnp.clip(d, 0, kd), q], 0.0)
    D = Dl + jnp.swapaxes(jnp.tril(Dl, -1), -1, -2)
    # E[i][r, c] = A[(i+1)*cb + r, i*cb + c]  (d = cb + r - c)
    dE = cb + r - c
    E = jnp.where((dE >= 0) & (dE <= kd),
                  ABp[jnp.clip(dE, 0, kd), q], 0.0)
    E = E.at[nb - 1].set(0.0)
    return D, E


def pbtrf_blocked(AB, cb: int = 128, dbound: float = 0.0):
    """Block-panel banded Cholesky for TPU: the band is viewed as a
    block-tridiagonal matrix with cb >= kd dense (cb, cb) blocks, and
    factored by a `lax.scan` over n/cb panels of dense MXU work
    (cholesky + triangular solve + syrk per panel) instead of the n
    scalar-window steps of `pbtrf`.  Same O(n) scan depth reduction
    that makes CHOLMOD supernodal (reference cholmod.c:364): n/cb
    sequential steps instead of n.

    Returns (Ls, Cs): the block-bidiagonal Cholesky factor with
    diagonal blocks Ls (nb, cb, cb) lower-triangular and subdiagonal
    blocks Cs (nb, cb, cb) (Cs[i] couples block i+1; Cs[nb-1] unused).
    Solve with `pbtrs_blocked`.  NaN blocks signal a non-PD pivot."""
    kdp1, n = AB.shape
    kd = kdp1 - 1
    if cb < kd:
        raise ValueError(f"cb ({cb}) must be >= bandwidth kd ({kd})")
    D, E = _band_blocks(AB, cb)
    if dbound > 0:
        idx = jnp.arange(cb)
        D = D.at[:, idx, idx].set(
            jnp.maximum(D[:, idx, idx], dbound))

    def step(Cprev, DE):
        Di, Ei = DE
        S = Di - Cprev @ Cprev.T
        L = jnp.linalg.cholesky(S)
        # C_i = E_i L_i^{-T} = (L_i^{-1} E_i')'
        C = jsl.solve_triangular(L, Ei.T, lower=True).T
        return C, (L, C)

    C0 = jnp.zeros((cb, cb), AB.dtype)
    _, (Ls, Cs) = lax.scan(step, C0, (D, E))
    return Ls, Cs


def pbtrs_blocked(fac, B):
    """Solve L L' x = B with (Ls, Cs) from `pbtrf_blocked`.
    B: (n,) or (n, nrhs) — n may be shorter than nb*cb (padded)."""
    Ls, Cs = fac
    nb, cb, _ = Ls.shape
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    n, nrhs = Bm.shape
    npad = nb * cb
    Bp = jnp.pad(Bm, ((0, npad - n), (0, 0))).reshape(nb, cb, nrhs)

    # forward: y_i = L_i^{-1} (b_i - C_{i-1} y_{i-1})
    def fwd(carry, x):
        yprev, Cprev = carry
        Li, Ci, bi = x
        yi = jsl.solve_triangular(Li, bi - Cprev @ yprev, lower=True)
        return (yi, Ci), yi

    z = jnp.zeros((cb, nrhs), Bm.dtype)
    _, y = lax.scan(fwd, (z, jnp.zeros((cb, cb), Bm.dtype)),
                    (Ls, Cs, Bp))

    # backward: x_i = L_i^{-T} (y_i - C_i' x_{i+1})
    def bwd(xnext, x):
        Li, Ci, yi = x
        xi = jsl.solve_triangular(Li.T, yi - Ci.T @ xnext,
                                  lower=False)
        return xi, xi

    _, xr = lax.scan(bwd, z, (Ls[::-1], Cs[::-1], y[::-1]))
    x = xr[::-1].reshape(npad, nrhs)[:n]
    return x[:, 0] if vec else x


def pbtrs(LB, B):
    """Solve L L' x = B with LB from pbtrf.  B: (n,) or (n, nrhs)."""
    kdp1, n = LB.shape
    kd = kdp1 - 1
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    nrhs = Bm.shape[1]
    # forward: y_i = (b_i - sum_j L[i, i-kd+j] y_{i-kd+j}) / L[i,i]
    Lr = _band_rows(LB)                    # (n, kd+1): row windows of L
    # note _band_rows of LB gives L[r, r-kd+j]; diag at j=kd

    def fwd(carry, x):
        lrow, b = x                        # (kd+1,), (nrhs,)
        yprev = carry                      # (kd, nrhs) — y_{i-kd..i-1}
        yi = (b - lrow[:kd] @ yprev) / lrow[kd]
        # [..][1:] (not yprev[1:] first) so the carry keeps kd rows
        # even when kd == 0 (diagonal-only band)
        carry = jnp.concatenate([yprev, yi[None]], axis=0)[1:]
        return carry, yi

    c0 = jnp.zeros((kd, nrhs), Bm.dtype)
    _, y = lax.scan(fwd, c0, (Lr, Bm))
    # backward: x_i = (y_i - sum_{j=1..kd} L[i+j, i] x_{i+j}) / L[i,i]
    # L[i+j, i] = LB[j, i]
    LBc = LB.T                             # (n, kd+1): column windows

    def bwd(carry, x):
        lcol, yi = x                       # (kd+1,), (nrhs,)
        xnext = carry                      # (kd, nrhs) — x_{i+1..i+kd}
        xi = (yi - lcol[1:] @ xnext) / lcol[0]
        carry = jnp.concatenate([xi[None], xnext], axis=0)[:kd]
        return carry, xi

    _, xr = lax.scan(bwd, c0, (LBc[::-1], y[::-1]))
    x = xr[::-1]
    return x[:, 0] if vec else x


def pbsv(AB, B):
    LB = pbtrf(AB)
    return LB, pbtrs(LB, B)


# ---- tridiagonal PD (pt*) ---------------------------------------------

def pttrf(d, e):
    """LDL' of a symmetric PD tridiagonal: returns (dfac, efac) with
    D = diag(dfac), L unit-lower-bidiagonal with subdiag efac
    (reference pttrf)."""
    def step(dprev_lprev, x):
        di, ei = x
        dprev, lprev = dprev_lprev
        dcur = di - lprev * lprev * dprev
        lcur = ei / dcur                   # l_i = e_i / d_i (next row)
        return (dcur, lcur), (dcur, lcur)

    e_in = jnp.concatenate([e, jnp.zeros((1,), d.dtype)])
    (_, _), (df, lf) = lax.scan(step, (jnp.ones((), d.dtype),
                                       jnp.zeros((), d.dtype)),
                                (d, e_in))
    return df, lf[:-1]


def pttrs(df, ef, B):
    """Solve L D L' x = B with (df, ef) from pttrf."""
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    nrhs = Bm.shape[1]
    l_in = jnp.concatenate([jnp.zeros((1,), df.dtype), ef])

    def fwd(yprev, x):
        li, b = x
        yi = b - li * yprev
        return yi, yi

    _, y = lax.scan(fwd, jnp.zeros((nrhs,), Bm.dtype), (l_in, Bm))
    y = y / df[:, None]
    l_bwd = jnp.concatenate([ef, jnp.zeros((1,), df.dtype)])

    def bwd(xnext, x):
        li, yi = x
        xi = yi - li * xnext
        return xi, xi

    _, xr = lax.scan(bwd, jnp.zeros((nrhs,), Bm.dtype),
                     (l_bwd[::-1], y[::-1]))
    x = xr[::-1]
    return x[:, 0] if vec else x


def ptsv(d, e, B):
    df, ef = pttrf(d, e)
    return (df, ef), pttrs(df, ef, B)


# ---- general tridiagonal with partial pivoting (gt*) -------------------

def gtsv(dl, d, du, B):
    """Solve a general tridiagonal system with partial pivoting
    (reference gtsv).  dl/du length n-1, d length n; B (n,) or
    (n, nrhs)."""
    n = d.shape[0]
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    nrhs = Bm.shape[1]
    dl_in = jnp.concatenate([dl, jnp.zeros((1,), d.dtype)])
    du_in = jnp.concatenate([du, jnp.zeros((1,), d.dtype)])
    d_next = jnp.concatenate([d[1:], jnp.zeros((1,), d.dtype)])
    du_next = jnp.concatenate([du[1:], jnp.zeros((2,), d.dtype)])[:n]

    def step(carry, x):
        # carry: current row (p, u1, u2, rhs); x: next raw row
        p, u1, u2, r = carry
        a, dn, dun, bn = x                 # subdiag a = A[i+1, i]
        swap = jnp.abs(a) > jnp.abs(p)
        # candidate rows: cur = (p, u1, u2 | r), nxt = (a, dn, dun | bn)
        top = jnp.where(swap, a, p)
        tu1 = jnp.where(swap, dn, u1)
        tu2 = jnp.where(swap, dun, u2)
        tr = jnp.where(swap, bn, r)
        bo = jnp.where(swap, p, a)
        bu1 = jnp.where(swap, u1, dn)
        bu2 = jnp.where(swap, u2, dun)
        br = jnp.where(swap, r, bn)
        m = bo / top
        nu1 = bu1 - m * tu1
        nu2 = bu2 - m * tu2
        nr = br - m * tr
        return (nu1, nu2, jnp.zeros_like(nu2), nr), (top, tu1, tu2, tr)

    carry0 = (d[0], du_in[0], jnp.zeros((), d.dtype), Bm[0])
    xs = (dl_in[:n - 1], d_next[:n - 1], du_next[:n - 1], Bm[1:])
    (p, u1, u2, r), rows = lax.scan(step, carry0, xs)
    U0 = jnp.concatenate([rows[0], p[None]])
    U1 = jnp.concatenate([rows[1], u1[None]])
    U2 = jnp.concatenate([rows[2], u2[None]])
    R = jnp.concatenate([rows[3], r[None, :]], axis=0)

    def bwd(carry, x):
        x1, x2 = carry                     # x_{i+1}, x_{i+2}
        u0, v1, v2, ri = x
        xi = (ri - v1 * x1 - v2 * x2) / u0
        return (xi, x1), xi

    z = jnp.zeros((nrhs,), Bm.dtype)
    _, xr = lax.scan(bwd, (z, z), (U0[::-1], U1[::-1], U2[::-1],
                                   R[::-1]))
    x = xr[::-1]
    return x[:, 0] if vec else x


def gttrf(dl, d, du):
    """Factor handle for gttrs — stores the inputs (the pivoted
    elimination is fused into the solve, which XLA re-uses across
    calls with the same shapes)."""
    return (dl, d, du)


def gttrs(fac, B, trans="N"):
    dl, d, du = fac
    if trans == "N":
        return gtsv(dl, d, du, B)
    return gtsv(du, d, dl, B)              # A' is tridiagonal too


# ---- scan-based pivoted banded LU (gbtrf_scan / gbtrs_scan) ------------

def _gb_entry(AB, kl, ku, r, c, n):
    """A[r, c] from LAPACK general band storage AB[ku+r-c, c], with 0
    outside the band / matrix and unit diagonal on pad rows r >= n."""
    d = r - c
    inband = (d >= -ku) & (d <= kl) & (c >= 0) & (c < n) & (r >= 0)
    vals = AB[jnp.clip(ku + d, 0, kl + ku), jnp.clip(c, 0, n - 1)]
    vals = jnp.where(inband & (r < n), vals, 0.0)
    return jnp.where((r >= n) & (r == c), 1.0, vals)


def gbtrf_scan(AB, kl, ku):
    """Banded LU with partial pivoting as a `lax.scan` over columns —
    the O(n (kl+ku)^2) structured path behind the umfpack API for
    banded (after-RCM) patterns (reference gbtrf, lapack.c; the dense
    fallback lives in `gbtrf`).  Pivoting is LAPACK's: restricted to
    the kl+1 candidate rows of each column, U's bandwidth grows to
    kl+ku.

    AB: (kl+ku+1, n) general band storage, AB[ku + i - j, j] = A[i,j].
    Returns (Urows, Lcols, piv): U[j, j:j+kl+ku+1] per row, the kl
    multipliers L[j+1:j+kl+1, j], and the chosen pivot offset in
    [0, kl] per column.  Zero pivots surface as inf/NaN."""
    n = AB.shape[1]
    w = kl + ku + 1
    r = jnp.arange(kl + 1)[:, None]
    c = jnp.arange(w)[None, :]
    W0 = _gb_entry(AB, kl, ku, r, c, n)          # rows 0..kl, cols 0..w-1

    # incoming rows: step j appends row j+kl+1 over cols j+1..j+w
    j = jnp.arange(n)[:, None]
    cc = jnp.arange(w)[None, :]
    Rin = _gb_entry(AB, kl, ku, j + kl + 1, j + 1 + cc, n)   # (n, w)

    def step(W, rnew):
        p = jnp.argmax(jnp.abs(W[:, 0]))
        Wp = W[p]
        W = W.at[p].set(W[0]).at[0].set(Wp)      # swap rows 0 <-> p
        m = W[1:, 0] / W[0, 0]
        Wn = W[1:, :] - m[:, None] * W[0:1, :]
        Wn = jnp.concatenate([Wn[:, 1:],
                              jnp.zeros((kl, 1), W.dtype)], axis=1)
        Wn = jnp.concatenate([Wn, rnew[None, :]], axis=0)
        return Wn, (W[0], m, p.astype(jnp.int32))

    _, (Urows, Lcols, piv) = lax.scan(step, W0, Rin)
    return Urows, Lcols, piv


def gbtrs_scan(fac, B, kl, ku):
    """Solve with a `gbtrf_scan` factor.  B: (n,) or (n, nrhs)."""
    Urows, Lcols, piv = fac
    n = Urows.shape[0]
    w = kl + ku + 1
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    nrhs = Bm.shape[1]

    # forward: replay swaps + eliminations on a sliding (kl+1) window
    Bpad = jnp.concatenate(
        [Bm, jnp.zeros((kl + 1, nrhs), Bm.dtype)], axis=0)

    def fwd(carry, x):
        v = carry                                # (kl+1, nrhs)
        m, p, bnew = x
        vp = v[p]
        v = v.at[p].set(v[0]).at[0].set(vp)
        y = v[0]
        vn = v[1:] - m[:, None] * y[None, :]
        vn = jnp.concatenate([vn, bnew[None, :]], axis=0)
        return vn, y

    v0 = Bpad[: kl + 1]
    _, y = lax.scan(fwd, v0, (Lcols, piv, Bpad[kl + 1: kl + 1 + n]))

    # backward: x_j = (y_j - U[j, j+1:] x) / U[j, j]
    def bwd(carry, x):
        xs = carry                               # (w-1, nrhs): x_{j+1..}
        urow, yj = x
        xj = (yj - urow[1:] @ xs) / urow[0]
        return jnp.concatenate([xj[None], xs[:-1]], axis=0), xj

    c0 = jnp.zeros((w - 1, nrhs), Bm.dtype)
    _, xr = lax.scan(bwd, c0, (Urows[::-1], y[::-1]))
    x = xr[::-1]
    return x[:, 0] if vec else x


# ---- banded triangular / general band (tb*, gb*) -----------------------

def tbtrs(AB, B, uplo="L", trans="N"):
    """Triangular banded solve.  AB (kd+1, n): banded storage of a
    triangular matrix — lower storage (AB[0] = diagonal,
    AB[j, i] = A[i+j, i]) for uplo='L', LAPACK upper storage
    (AB[kd] = diagonal, AB[kd-d, j] = A[j-d, j]) for uplo='U'.
    Scan-based (O(n kd) per RHS)."""
    if uplo == "U":
        # U in upper storage == U' in lower storage: LB[d, i] =
        # U'[i+d, i] = U[i, i+d] = AB[kd-d, i+d]; solving U x = b is
        # the transpose-solve of U' and vice versa
        kdp1, n = AB.shape
        kd = kdp1 - 1
        LB = jnp.stack([
            jnp.concatenate([AB[kd - d, d:],
                             jnp.zeros((d,), AB.dtype)])
            for d in range(kd + 1)])
        return tbtrs(LB, B, uplo="L",
                     trans="T" if trans == "N" else "N")
    kdp1, n = AB.shape
    kd = kdp1 - 1
    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    nrhs = Bm.shape[1]
    c0 = jnp.zeros((kd, nrhs), Bm.dtype)
    if trans == "N":
        Lr = _band_rows(AB)

        def fwd(carry, x):
            lrow, b = x
            yi = (b - lrow[:kd] @ carry) / lrow[kd]
            return jnp.concatenate([carry[1:], yi[None]], axis=0), yi

        _, y = lax.scan(fwd, c0, (Lr, Bm))
        return y[:, 0] if vec else y
    LBc = AB.T

    def bwd(carry, x):
        lcol, b = x
        xi = (b - lcol[1:] @ carry) / lcol[0]
        return jnp.concatenate([xi[None], carry[:-1]], axis=0), xi

    _, xr = lax.scan(bwd, c0, (LBc[::-1], Bm[::-1]))
    x = xr[::-1]
    return x[:, 0] if vec else x


def gbtrf(AB, kl, ku):
    """General band LU.  Implemented by dense expansion + LU with
    partial pivoting (XLA) — the general-band pivoted factorization
    has no scan-friendly fixed window (pivoting introduces fill up to
    kl+ku); the scalable structured paths are pb*/pt*/tb* above.
    AB: (kl+ku+1, n) general band storage, AB[ku + i - j, j] = A[i,j].
    """
    import jax.scipy.linalg as jsl
    n = AB.shape[1]
    A = jnp.zeros((n, n), AB.dtype)
    for k in range(-kl, ku + 1):
        dlen = n - abs(k)
        if k >= 0:
            A = A + jnp.diag(AB[ku - k, k:k + dlen], k)
        else:
            A = A + jnp.diag(AB[ku - k, :dlen], k)
    return jsl.lu_factor(A)


def gbtrs(fac, B, trans="N"):
    import jax.scipy.linalg as jsl
    t = {"N": 0, "T": 1, "C": 2}[trans]
    return jsl.lu_solve(fac, B, trans=t)


def gbsv(AB, kl, ku, B):
    fac = gbtrf(AB, kl, ku)
    return fac, gbtrs(fac, B)
