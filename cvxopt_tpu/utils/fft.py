"""Discrete transforms — cvxopt.fftw equivalents
(reference: src/C/fftw.c:1214-1225: dft/idft, dftn/idftn, dct/idct,
dctn/idctn, dst/idst, dstn/idstn), implemented on jnp.fft /
jax.scipy.fft so they run on TPU.

The reference operates column-wise on matrices; these functions
transform along `axis` (default 0, the reference's column direction)
or all axes for the *n variants.
"""

from __future__ import annotations

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


def dct(x, type=2, axis=0):
    return jfft.dct(x, type=type, axis=axis)


def idct(x, type=2, axis=0):
    return jfft.idct(x, type=type, axis=axis)


def dctn(x, type=2, axes=None):
    return jfft.dctn(x, type=type, axes=axes)


def idctn(x, type=2, axes=None):
    return jfft.idctn(x, type=type, axes=axes)


def dst(x, type=1, axis=0):
    """DST-I via the odd-extension FFT identity (the default type the
    reference's fftw.dst exposes)."""
    if type != 1:
        raise NotImplementedError("only DST-I is implemented")
    x = jnp.moveaxis(jnp.asarray(x), axis, 0)
    n = x.shape[0]
    z = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
    ext = jnp.concatenate([z, x, z, -x[::-1]], axis=0)  # length 2n+2
    F = jnp.fft.fft(ext, axis=0)
    out = (-F.imag[1:n + 1] / 2.0) * 2.0
    return jnp.moveaxis(out, 0, axis)


def idst(x, type=1, axis=0):
    """Inverse DST-I: dst(dst(x)) = 2(n+1) x."""
    n = jnp.asarray(x).shape[axis]
    return dst(x, type=type, axis=axis) / (2.0 * (n + 1))


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
