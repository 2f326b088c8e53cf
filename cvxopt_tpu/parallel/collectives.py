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


# ---------------------------------------------------------------------
# Cone-aware distributed reductions (block-sharded cone vectors)
#
# For a single LARGE cone program sharded so that each device holds
# whole cone blocks (a shard-local ConeDims describing its slice —
# the natural layout: 'l' entries split anywhere, 'q'/'s' blocks kept
# whole per shard), every quantity the IPM outer loop needs reduces to
# one scalar collective per iteration; the NT scaling itself is
# blockwise and therefore embarrassingly local (scaling.scale needs NO
# communication under this layout).  These are the reductions
# conelp/coneqp's residual tests, gap, and step-length computations
# call — used from inside `shard_map` over the mesh.
# ---------------------------------------------------------------------

def psdot(x_local, y_local, local_dims, axis: str):
    """Global cone inner product <x, y> of a block-sharded pair
    (cones.sdot per shard + psum): the distributed duality gap."""
    from cvxopt_tpu import cones
    return lax.psum(cones.sdot(x_local, y_local, local_dims),
                    axis_name=axis)


def psnrm2(x_local, local_dims, axis: str):
    """Global cone norm of a block-sharded vector (distributed
    residual norms resx/resz)."""
    from cvxopt_tpu import cones
    s = lax.psum(cones.sdot(x_local, x_local, local_dims),
                 axis_name=axis)
    return jnp.sqrt(jnp.maximum(s, 0.0))


def pmax_step(x_local, local_dims, axis: str):
    """Global min{t : x + t e >=_K 0} of a block-sharded cone vector:
    the per-shard `cones.max_step` (eigh over local 's' blocks only)
    followed by one pmax — the distributed step-length computation."""
    from cvxopt_tpu import cones
    return lax.pmax(cones.max_step(x_local, local_dims),
                    axis_name=axis)


def pstep_length(ds_local, dz_local, local_dims, axis: str,
                 step: float = 0.99):
    """Global IPM step length for sharded scaled directions
    (coneprog.py:2459 semantics): min(1, step / max(ts, tz, 0))."""
    ts = pmax_step(ds_local, local_dims, axis)
    tz = pmax_step(dz_local, local_dims, axis)
    t = jnp.maximum(jnp.maximum(ts, tz), 0.0)
    return jnp.where(t == 0.0, 1.0, jnp.minimum(1.0, step / t))
