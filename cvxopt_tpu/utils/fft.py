"""Discrete transforms — cvxopt.fftw equivalents
(reference: src/C/fftw.c:1214-1225: dft/idft, dftn/idftn, dct/idct,
dctn/idctn, dst/idst, dstn/idstn), implemented on jnp.fft /
jax.scipy.fft so they run on TPU.

All four DCT/DST types the reference's FFTW flags expose
(REDFT00/10/01/11, RODFT00/10/01/11 = types 1/2/3/4) are supported:
  * DCT-I / DST-I via the even/odd-extension FFT identities;
  * DCT-II natively (jax.scipy.fft.dct);
  * DCT-III through the unnormalized-inverse relation to DCT-II;
  * DST-II/III through exact index/sign mappings onto DCT-II/III
    (sin(pi(k+1)(2n+1)/2N) = (-1)^n cos(pi(N-1-k)(2n+1)/2N));
  * type IV as one dense cosine/sine matmul — O(n^2), but a single
    MXU matmul on TPU, which beats a scalar FFT twiddle chain for the
    sizes these utility transforms see.

Conventions match scipy.fft with norm=None (the same unnormalized
sums FFTW computes); inverses follow scipy's unnormalized
`idct`/`idst`: idct2 = dct3/2N, idct3 = dct2/2N, idct1 = dct1/2(N-1),
idct4 = dct4/2N (and likewise for DST, with idst1 = dst1/2(N+1)).

The reference operates column-wise on matrices; these functions
transform along `axis` (default 0, the reference's column direction)
or all axes for the *n variants.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.fft as jfft


def dft(x, axis=0):
    return jnp.fft.fft(x, axis=axis)


def idft(x, axis=0):
    return jnp.fft.ifft(x, axis=axis)


def dftn(x, axes=None):
    return jnp.fft.fftn(x, axes=axes)


def idftn(x, axes=None):
    return jnp.fft.ifftn(x, axes=axes)


def _axis0(fn):
    """Apply a leading-axis transform along `axis`."""
    def wrapped(x, axis=0):
        x = jnp.moveaxis(jnp.asarray(x), axis, 0)
        return jnp.moveaxis(fn(x), 0, axis)

    return wrapped


@_axis0
def _dct1(x):
    # even extension [x0..x_{N-1}, x_{N-2}..x1], length 2N-2:
    # DCT-I(x)_k = Re FFT(ext)_k
    ext = jnp.concatenate([x, x[-2:0:-1]], axis=0)
    return jnp.real(jnp.fft.fft(ext, axis=0))[: x.shape[0]]


@_axis0
def _dct3(x):
    # scipy: idct(x, 2, norm=None) = dct(x, 3) / (2N)
    n = x.shape[0]
    return jfft.idct(x, type=2, axis=0, norm=None) * (2.0 * n)


def _cosine4_matrix(n, dtype):
    k = np.arange(n)
    M = 2.0 * np.cos(np.pi * (2 * k[:, None] + 1)
                     * (2 * k[None, :] + 1) / (4.0 * n))
    return jnp.asarray(M, dtype)


@_axis0
def _dct4(x):
    M = _cosine4_matrix(x.shape[0], x.dtype)
    return jnp.tensordot(M, x, axes=(1, 0))


def dct(x, type=2, axis=0):
    if type == 1:
        return _dct1(x, axis=axis)
    if type == 2:
        return jfft.dct(x, type=2, axis=axis)
    if type == 3:
        return _dct3(x, axis=axis)
    if type == 4:
        return _dct4(x, axis=axis)
    raise ValueError(f"invalid DCT type {type}")


def idct(x, type=2, axis=0):
    """Unnormalized inverse (scipy norm=None semantics)."""
    n = jnp.asarray(x).shape[axis]
    if type == 1:
        return dct(x, 1, axis) / (2.0 * (n - 1))
    if type == 2:
        return dct(x, 3, axis) / (2.0 * n)
    if type == 3:
        return dct(x, 2, axis) / (2.0 * n)
    if type == 4:
        return dct(x, 4, axis) / (2.0 * n)
    raise ValueError(f"invalid DCT type {type}")


def dctn(x, type=2, axes=None):
    x = jnp.asarray(x)
    axes = range(x.ndim) if axes is None else axes
    for ax in axes:
        x = dct(x, type=type, axis=ax)
    return x


def idctn(x, type=2, axes=None):
    x = jnp.asarray(x)
    axes = range(x.ndim) if axes is None else axes
    for ax in axes:
        x = idct(x, type=type, axis=ax)
    return x


@_axis0
def _dst1(x):
    # odd extension [0, x, 0, -rev(x)], length 2N+2:
    # DST-I(x)_k = -Im FFT(ext)_{k+1}
    n = x.shape[0]
    z = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
    ext = jnp.concatenate([z, x, z, -x[::-1]], axis=0)
    F = jnp.fft.fft(ext, axis=0)
    return -F.imag[1:n + 1]


@_axis0
def _dst2(x):
    # DST-II(x)_k = DCT-II((-1)^n x_n)_{N-1-k}
    n = x.shape[0]
    sgn = jnp.asarray((-1.0) ** np.arange(n), x.dtype)
    shape = (n,) + (1,) * (x.ndim - 1)
    y = jfft.dct(x * sgn.reshape(shape), type=2, axis=0)
    return y[::-1]


@_axis0
def _dst3(x):
    # transpose of the DST-II mapping: DST-III(x) =
    # (-1)^n * DCT-III(reversed x)  (derived from DST2 = R.DCT2.D:
    # DST2^T with the scipy type-3 first/last coefficient convention
    # matches exactly — verified against scipy.fft.dst type 3)
    n = x.shape[0]
    sgn = jnp.asarray((-1.0) ** np.arange(n), x.dtype)
    shape = (n,) + (1,) * (x.ndim - 1)
    y = _dct3(x[::-1], axis=0)
    return y * sgn.reshape(shape)


def _sine4_matrix(n, dtype):
    k = np.arange(n)
    M = 2.0 * np.sin(np.pi * (2 * k[:, None] + 1)
                     * (2 * k[None, :] + 1) / (4.0 * n))
    return jnp.asarray(M, dtype)


@_axis0
def _dst4(x):
    M = _sine4_matrix(x.shape[0], x.dtype)
    return jnp.tensordot(M, x, axes=(1, 0))


def dst(x, type=1, axis=0):
    if type == 1:
        return _dst1(x, axis=axis)
    if type == 2:
        return _dst2(x, axis=axis)
    if type == 3:
        return _dst3(x, axis=axis)
    if type == 4:
        return _dst4(x, axis=axis)
    raise ValueError(f"invalid DST type {type}")


def idst(x, type=1, axis=0):
    """Unnormalized inverse (scipy norm=None semantics)."""
    n = jnp.asarray(x).shape[axis]
    if type == 1:
        return dst(x, 1, axis) / (2.0 * (n + 1))
    if type == 2:
        return dst(x, 3, axis) / (2.0 * n)
    if type == 3:
        return dst(x, 2, axis) / (2.0 * n)
    if type == 4:
        return dst(x, 4, axis) / (2.0 * n)
    raise ValueError(f"invalid DST type {type}")


def dstn(x, type=1, axes=None):
    x = jnp.asarray(x)
    axes = range(x.ndim) if axes is None else axes
    for ax in axes:
        x = dst(x, type=type, axis=ax)
    return x


def idstn(x, type=1, axes=None):
    x = jnp.asarray(x)
    axes = range(x.ndim) if axes is None else axes
    for ax in axes:
        x = idst(x, type=type, axis=ax)
    return x
