"""Parallel / distributed execution layer.

The reference is single-process, single-thread (SURVEY.md §2.9 — no
threading, MPI, or GPU code anywhere).  This subpackage is the
new-capability layer mandated by the north star:

  - mesh.py: device meshes and sharded batch solving (data parallelism
    over independent problem instances — the "10k scenario QPs" path)
  - collectives.py: reductions used by distributed solves (residual
    norms, step lengths, Schur assembly) over ICI/DCN
"""

from cvxopt_tpu.parallel.mesh import (
    make_mesh, shard_batch, sharded_batch_solve,
)
from cvxopt_tpu.parallel import collectives

__all__ = ["make_mesh", "shard_batch", "sharded_batch_solve",
           "collectives"]
