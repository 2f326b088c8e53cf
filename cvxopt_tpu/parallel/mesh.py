"""Device meshes and sharded batch solving.

Data-parallel layer: vmap a solver core over a stacked batch of problem
instances and shard the batch axis across a `jax.sharding.Mesh`.  Each
device solves its shard independently (an embarrassingly parallel
fan-out — XLA inserts no collectives on this path); aggregate statistics
(iteration counts, convergence masks) are small replicated outputs.

No reference counterpart (SURVEY.md §2.9): CVXOPT has no parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch",
              devices=None) -> Mesh:
    """A 1-D mesh over the first `n_devices` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every array in `tree` with its leading axis sharded over
    `mesh`; arrays whose leading dimension is not divisible by the mesh
    size are replicated."""
    nd = mesh.shape[axis]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % nd == 0 and x.shape[0] > 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def sharded_batch_solve(solver_fn, batched_args: Sequence,
                        static_args: Sequence = (),
                        mesh: Optional[Mesh] = None,
                        axis: str = "batch"):
    """Solve a batch of independent problems, sharded across a mesh.

    `solver_fn(*static_args_i, *batched_args_i)` solves one instance;
    it is vmapped over the leading axis of each element of
    `batched_args` (with `static_args` broadcast), jitted, and the
    batch axis is sharded over `mesh`.

    Returns the solver output tree with leading batch axes, still
    device-sharded.
    """
    if mesh is None:
        mesh = make_mesh(axis=axis)

    def one(*b):
        return solver_fn(*static_args, *b)

    vf = jax.vmap(one)
    sharded = shard_batch(list(batched_args), mesh, axis=axis)
    return jax.jit(vf)(*sharded)
