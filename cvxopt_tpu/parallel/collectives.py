"""Collectives layer over ICI/DCN (SURVEY.md §5.8).

The reference has no distributed communication (§2.9); these helpers
are the comm-backend analogue the north star mandates: reductions for
residual norms, duality gaps, global step lengths, and Schur-complement
assembly, expressed as XLA collectives usable inside `shard_map`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def psum(x, axis: str):
    """Sum across mesh axis (gap, s'z, Schur terms)."""
    return lax.psum(x, axis_name=axis)


def pmax(x, axis: str):
    """Max across mesh axis (max_step aggregation: the global
    min{t : x + t e >= 0} is the max of per-shard values)."""
    return lax.pmax(x, axis_name=axis)


def pmin(x, axis: str):
    return lax.pmin(x, axis_name=axis)


def pnorm2(x, axis: str):
    """Global 2-norm of a sharded vector."""
    return jnp.sqrt(lax.psum(jnp.sum(x * x), axis_name=axis))


def pdot(x, y, axis: str):
    """Global inner product of sharded vectors."""
    return lax.psum(jnp.sum(x * y), axis_name=axis)


def all_gather(x, axis: str, tiled: bool = False):
    return lax.all_gather(x, axis_name=axis, tiled=tiled)


def ppermute_ring(x, axis: str, n: int, shift: int = 1):
    """Ring permutation (neighbor exchange over ICI)."""
    perm = [(i, (i + shift) % n) for i in range(n)]
    return lax.ppermute(x, axis_name=axis, perm=perm)
